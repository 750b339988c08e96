package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: flag (or drop)
  * training documents that share word n-grams with an evaluation /
  * benchmark set, so the eval data cannot leak into training. This is
  * the GPT-3/Llama-style n-gram overlap test, expressed as an
  * inverted-index equi-join.
  *
  * 100 TB design: the benchmark side of the join is an eval corpus —
  * megabytes, not terabytes — so after the per-row shingle explode and
  * `distinct` it collapses to a small gram set that AQE broadcasts;
  * the corpus side then never shuffles its token stream (the gram
  * explode is map-side, the hit count partial-aggregates on doc id,
  * and only matching grams — a tiny fraction — reach the exchange).
  * The final annotate join is corpus ⋈ hit-counts with the hit side
  * orders of magnitude smaller, again an AQE broadcast.
  */
object Decontaminate {

  /** Annotate `docs` with `n_hits` (distinct word `n`-grams shared
    * with any `bench` document) and `contaminated` (n_hits >=
    * minHits). Shingle semantics follow [[Dedup.shingles]]: a document
    * with fewer than `n` tokens contributes its whole token run as one
    * gram, so short eval questions still match verbatim copies.
    */
  def overlap(docs: DataFrame, bench: DataFrame, idCol: String,
              textCol: String, n: Int = 3, minHits: Int = 1): DataFrame = {
    // the eval set usually arrives as ONE file = one partition; its
    // shingle explode would serialize on a single core (guarded:
    // an already-wide bench passes through)
    val benchGrams = Spread.ifNarrow(bench)
      .select(explode(Dedup.shingles(col(textCol), n)).as("_gram"))
      .distinct()
    // shingleRows emits per-doc DISTINCT grams and benchGrams is
    // distinct, so count(*) after the join IS the distinct-hit count.
    val hits = Dedup.shingleRows(docs, idCol, textCol, Nil, n)
      .join(benchGrams, col("_s") === col("_gram"))
      .groupBy(col("_id"))
      .agg(count(lit(1)).as("n_hits"))
    docs.join(hits, docs(idCol) === hits("_id"), "left")
      .drop("_id")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("contaminated", col("n_hits") >= minHits)
  }

  /** Keep only uncontaminated documents (the apply step). */
  def drop(docs: DataFrame, bench: DataFrame, idCol: String,
           textCol: String, n: Int = 3, minHits: Int = 1): DataFrame =
    overlap(docs, bench, idCol, textCol, n, minHits)
      .where(!col("contaminated"))
      .drop("n_hits", "contaminated")

  /** The eval set collapsed to a ONE-ROW distinct-gram array — the
    * broadcastable model form (same pattern as the streaming LM's
    * one-row model: an eval corpus is megabytes, so the array is
    * dimension-table-sized). Train once offline, reuse across batches
    * and streams.
    */
  def benchGramRow(bench: DataFrame, textCol: String, n: Int = 3): DataFrame =
    Spread.ifNarrow(bench)
      .select(explode(Dedup.shingles(col(textCol), n)).as("_g"))
      .agg(collect_set(col("_g")).as("bench_grams"))

  /** [[overlap]] against a pre-collapsed [[benchGramRow]]: a pure
    * map-side projection after the one-row broadcast crossJoin —
    * stateless, so the SAME call compiles into a streaming ingest plan
    * (Append mode, no watermark, no state store), where the join form
    * would need a per-doc aggregation. Annotates, never filters.
    * Distinct-gram hit counts are identical to [[overlap]]'s
    * (`array_intersect` of the doc's distinct shingles with the
    * distinct eval set).
    */
  def overlapWithGramRow(docs: DataFrame, gramRow: DataFrame,
                         textCol: String, n: Int = 3,
                         minHits: Int = 1): DataFrame =
    docs.crossJoin(broadcast(gramRow))
      .withColumn("n_hits",
        size(array_intersect(Dedup.shingles(col(textCol), n),
          col("bench_grams"))).cast("long"))
      .withColumn("contaminated", col("n_hits") >= minHits)
      .drop("bench_grams")
}
