package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary training at corpus scale — the
  * tokenizer-training half of an LLM data pipeline (Sennrich et al.
  * 2016; the word-count + merge-loop shape production tokenizer
  * trainers use).
  *
  * Scale design: the corpus is scanned ONCE, into a word-frequency
  * table (vocabulary-bounded — millions of rows for a 100 TB corpus,
  * not trillions); every merge iteration then runs on that table
  * alone: one pair-count aggregate (map-side combined) + one 1-row
  * argmax collect + one map-side `replace`, with a localCheckpoint
  * pinning each round's result so lineage stays flat (the k-means
  * trainer precedent). Driver state is one (left, right, count) row
  * per iteration.
  *
  * Determinism/portability: pair argmax ties break lexicographically
  * on (left, right); the merge application is a plain leftmost
  * non-overlapping string `replace` on a double-space-separated
  * symbol string — both engines (and the BPE reference algorithm)
  * agree on that greedy semantics, which is what makes the trainer
  * DuckDB-oracle-checkable (`text_bpe_merges`).
  */
object Bpe {

  /** Separator invariant: symbols joined by TWO spaces, two spaces at
    * both ends. A merge replaces ` a··b ` (single-space boundaries)
    * with ` ab `, consuming one boundary space on each side and
    * reinstating it — so separators stay exactly two spaces and
    * leftmost non-overlapping `replace` IS the BPE greedy merge.
    */
  private def symInit(w: Column): Column =
    concat(lit("  "),
      array_join(filter(split(w, ""), c => length(c) > 0), "  "),
      lit("  "))

  /** Corpus word-frequency table: (w, freq) — the single corpus scan. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Train `numMerges` BPE merges; returns (merge_rank, lhs, rhs,
    * merged, pair_count) ordered by rank. Stops early when no pair
    * reaches `minPairCount`.
    */
  def trainMerges(df: DataFrame, textCol: String, numMerges: Int,
                  minPairCount: Long = 2L): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1: $numMerges")
    val spark = df.sparkSession
    import spark.implicits._
    var cur = wordCounts(df, textCol)
      .select(col("freq"), symInit(col("w")).as("s"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
    var r = 0
    var exhausted = false
    while (r < numMerges && !exhausted) {
      val syms = split(trim(col("s")), "  ")
      val top = cur
        .select(col("freq"), syms.as("syms"))
        .select(col("freq"), explode(transform(col("syms"), (x, i) =>
          struct(x.as("a"), get(col("syms"), i + 1).as("b")))).as("p"))
        .where(col("p.b").isNotNull)
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("c"))
        .where(col("c") >= minPairCount)
        .orderBy(desc("c"), col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, c) = (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
        merges += ((r.toLong, a, b, a + b, c))
        cur = cur
          .withColumn("s", replace(col("s"), lit(s" $a  $b "), lit(s" $a$b ")))
          .localCheckpoint(true)
        r += 1
      }
    }
    merges.toSeq.toDF("merge_rank", "lhs", "rhs", "merged", "pair_count")
  }

  /** Apply a trained merge list to a text column: tokenize, segment
    * each word by replaying the merges in rank order, and return the
    * flat subword array. Runs as the native `BpeEncodeExpr` kernel —
    * one pass over the string, a symbol-array scan per merge rule —
    * map-side, no shuffle; the declarative chained-`replace` form
    * below is the parity reference (it rebuilds and re-scans the
    * separator string once per merge per token, which dominated the
    * encode query's CPU).
    */
  def encodeSubwords(text: Column, merges: Seq[(String, String)]): Column =
    graft.functions.TextExpressions.bpe_encode(text, merges)

  /** The declarative formulation encodeSubwords replaced — kept as the
    * parity reference for the property suite; semantics contract:
    * each merge is one leftmost non-overlapping `replace` on the
    * double-space symbol string, applied in rank order.
    */
  private[graft] def encodeSubwordsDeclarative(text: Column,
                                               merges: Seq[(String, String)]): Column =
    flatten(transform(TextAnalysis.tokens(text), w => {
      val segmented = merges.foldLeft(symInit(w)) { case (acc, (a, b)) =>
        replace(acc, lit(s" $a  $b "), lit(s" $a$b "))
      }
      split(trim(segmented), "  ")
    }))
}
