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
    // size-gated eval-side spread: a small eval set's one-partition
    // explode is cheaper than an exchange, but once the benchmark
    // slice reaches tens of MB the single-task explode dominates the
    // query (see Spread.ifNarrowAndBig)
    val benchGrams = Spread.ifNarrowAndBig(bench)
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

  /** Contamination matrix: one row per (corpus slice × benchmark
    * slice) with `n_docs` (corpus slice size), `n_contaminated`
    * (docs sharing >= `minHits` distinct `n`-grams with THAT
    * benchmark slice) and `contamination_rate` — the per-benchmark
    * breakdown an eval-integrity review wants before trusting scores
    * (a single pooled rate hides which benchmark leaked into which
    * source).
    *
    * Scale shape: same inverted-index equi-join as [[overlap]], with
    * the benchmark key riding the gram rows — the corpus token
    * stream never shuffles (only matching grams reach the exchange),
    * the (doc × benchKey) hit table is a partial-aggregated
    * equi-join output, and the final matrix is (#slices ×
    * #benchmarks)-sized. Slice totals attach by broadcast.
    */
  def reportBySlice(docs: DataFrame, bench: DataFrame, idCol: String,
                    docKeyCol: String, benchKeyCol: String,
                    textCol: String, n: Int = 3,
                    minHits: Int = 1): DataFrame = {
    val benchGrams = Spread.ifNarrowAndBig(bench)
      .select(col(benchKeyCol).as("_bk"),
        explode(Dedup.shingles(col(textCol), n)).as("_gram"))
      .distinct()
    // per-doc distinct grams ⋈ per-slice distinct grams → the
    // distinct-hit count per (doc, benchmark slice)
    val hits = Dedup.shingleRows(docs, idCol, textCol, Seq(docKeyCol), n)
      .join(benchGrams, col("_s") === col("_gram"))
      .groupBy(col("_id"), col(docKeyCol), col("_bk"))
      .agg(count(lit(1)).as("_nh"))
      .where(col("_nh") >= minHits)
      .groupBy(col(docKeyCol), col("_bk"))
      .agg(count(lit(1)).as("n_contaminated"))
    val slices = docs.groupBy(col(docKeyCol)).agg(count(lit(1)).as("n_docs"))
    // bounded collect: #benchmarks is an eval-suite count (dozens) —
    // the same class as the classifier's ≤dims collects; exploding
    // literals keeps the zero-cell enumeration off the BNLJ path the
    // plan gate forbids
    val benchKeys = bench.select(col(benchKeyCol)).distinct()
      .collect().map(_.get(0))
    slices
      .select(col(docKeyCol), col("n_docs"),
        explode(array(benchKeys.map(lit).toIndexedSeq: _*)).as("_bk"))
      .join(hits, Seq(docKeyCol, "_bk"), "left")
      .select(col(docKeyCol), col("_bk").as(benchKeyCol + "_bench"),
        col("n_docs"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
      .withColumn("contamination_rate",
        round(col("n_contaminated").cast("double") / col("n_docs"), 6))
  }

  /** Keep only uncontaminated documents (the apply step). */
  def drop(docs: DataFrame, bench: DataFrame, idCol: String,
           textCol: String, n: Int = 3, minHits: Int = 1): DataFrame =
    overlap(docs, bench, idCol, textCol, n, minHits)
      .where(!col("contaminated"))
      .drop("n_hits", "contaminated")

  /** [[overlap]] with a Bloom-filter candidate stage — the scale arm
    * for eval suites whose distinct-gram set outgrows the
    * broadcast-hash-join envelope. The gram set sketches into one
    * Bloom bitset (Spark's own `BloomFilterAggregate` over
    * `xxhash64(gram)`, merged distributedly; ~0.9 MB per million
    * grams at 3% fpp — an order of magnitude under the equivalent
    * join hash relation of gram strings), which rides the corpus
    * scan as a plan literal: the corpus gram stream prefilters
    * MAP-SIDE with `BloomFilterMightContain` (codegen'd, the
    * expression pair Spark's runtime row-level filtering uses), so
    * only true hits plus an `fpp` sliver ever reach the exchange.
    * The exact equi-join against the gram table then kills every
    * false positive — Bloom fpp AND 64-bit hash collisions alike —
    * so the output is EXACTLY [[overlap]]'s (oracle row
    * `decontaminate_bloom` shares overlap's SQL; equivalence
    * spec-proven in OpsSpec, including under a forced-high fpp).
    *
    * The sketch collect is one binary of `optimalNumOfBits/8` bytes
    * — configuration-sized by construction, like every plan-literal
    * model in this library. Size `expectedGrams` at or above the
    * true distinct-gram count; undersizing only raises the false-
    * positive sliver (more exact-join work), never changes results.
    */
  def overlapBloom(docs: DataFrame, bench: DataFrame, idCol: String,
                   textCol: String, n: Int = 3, minHits: Int = 1,
                   expectedGrams: Long = 1L << 20,
                   fpp: Double = 0.03): DataFrame =
    overlapBloomPrepared(docs,
      prepareBloom(bench, textCol, n, expectedGrams, fpp),
      idCol, textCol, n, minHits)

  /** The benchmark-side half of [[overlapBloom]] — the pinned distinct
    * gram set plus the collected Bloom bitset (`bf == null` ⇔ empty
    * benchmark). Split out (r15) so a composed pipeline can build it
    * CONCURRENTLY with its upstream stages: the two bench-side jobs
    * (gram checkpoint + sketch collect) depend only on `bench`, never
    * on the shard chain.
    */
  final case class PreparedBloom(benchGrams: DataFrame, bf: Array[Byte])

  def prepareBloom(bench: DataFrame, textCol: String, n: Int = 3,
                   expectedGrams: Long = 1L << 20,
                   fpp: Double = 0.03): PreparedBloom = {
    import org.apache.spark.sql.graft.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    // eager pin: the gram set has two consumers (the sketch aggregate
    // and the exact-verify join) — unpinned, the shingle explode +
    // distinct would run twice, in exactly the large-eval-set regime
    // this arm exists for
    val benchGrams = Spread.ifNarrowAndBig(bench)
      .select(explode(Dedup.shingles(col(textCol), n)).as("_gram"))
      .distinct()
      .localCheckpoint(true)
    val numBits =
      org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(expectedGrams, fpp)
    val bfAgg = ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(col("_gram"))),
      Literal(expectedGrams), Literal(numBits)).toAggregateExpression())
    PreparedBloom(benchGrams,
      benchGrams.agg(bfAgg.as("_bf")).head().getAs[Array[Byte]]("_bf"))
  }

  /** The corpus-side half of [[overlapBloom]] over a pre-built
    * [[PreparedBloom]] — identical output by construction (the
    * delegating overload IS the r14 body, split at the bitset).
    */
  def overlapBloomPrepared(docs: DataFrame, prepared: PreparedBloom,
                           idCol: String, textCol: String,
                           n: Int = 3, minHits: Int = 1): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    // empty benchmark (the aggregate yields NULL) → zero hits, with
    // the verdict still computed as n_hits >= minHits so the
    // degenerate minHits <= 0 case (overlap flags every doc) keeps
    // the "output is EXACTLY overlap's" contract
    if (prepared.bf == null)
      return docs.withColumn("n_hits", lit(0L))
        .withColumn("contaminated", lit(0L) >= lit(minHits.toLong))
    val mightHit = ColumnBridge.column(BloomFilterMightContain(
      Literal(prepared.bf, org.apache.spark.sql.types.BinaryType),
      ColumnBridge.expression(xxhash64(col("_s")))))
    val hits = Dedup.shingleRows(docs, idCol, textCol, Nil, n)
      .where(mightHit)
      .join(prepared.benchGrams, col("_s") === col("_gram"))
      .groupBy(col("_id"))
      .agg(count(lit(1)).as("n_hits"))
    docs.join(hits, docs(idCol) === hits("_id"), "left")
      .drop("_id")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("contaminated", col("n_hits") >= minHits)
  }

  /** Keep only uncontaminated documents via the Bloom candidate
    * stage (the apply step of [[overlapBloom]]).
    */
  def dropBloom(docs: DataFrame, bench: DataFrame, idCol: String,
                textCol: String, n: Int = 3, minHits: Int = 1,
                expectedGrams: Long = 1L << 20,
                fpp: Double = 0.03): DataFrame =
    overlapBloom(docs, bench, idCol, textCol, n, minHits, expectedGrams, fpp)
      .where(!col("contaminated"))
      .drop("n_hits", "contaminated")

  /** Embedding-space (semantic) decontamination: annotate `docs`
    * with the nearest BENCHMARK vector (`bench_id`, `bench_cosine`)
    * and `contaminated` = cosine ≥ threshold — catching the
    * paraphrased eval leakage an n-gram [[overlap]] test misses
    * (same motivation as SemDeDup's cosine criterion, applied
    * corpus-vs-benchmark instead of corpus-vs-itself).
    *
    * Scale shape mirrors [[graft.ops.Similarity.assignClusters]]: the
    * benchmark set is an eval suite — bounded by construction — so
    * its vectors collect once and ship as plan literals; the argmax
    * is then a pure per-row projection over the corpus scan: no join,
    * no shuffle, no exchange of the corpus at any size. Ties on
    * cosine break to the LARGEST bench id (greatest-struct
    * semantics, mirrored in the oracle). For benchmark sets beyond
    * the plan-literal envelope (≫ a few thousand vectors), block the
    * comparison through [[graft.ops.Dedup.embeddingNearDupPairs]]'s
    * LSH-bucket join instead.
    */
  def semanticOverlap(docs: DataFrame, bench: DataFrame, idCol: String,
                      vecCol: String, threshold: Double): DataFrame = {
    val clash = Seq("_best", "bench_id", "bench_cosine", "contaminated")
      .filter(docs.columns.contains)
    require(clash.isEmpty, s"semanticOverlap: input columns collide with outputs: $clash")
    val refs = bench
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
    // empty benchmark → nothing can leak: everything uncontaminated
    if (refs.isEmpty)
      return docs.withColumn("bench_id", lit(null).cast("long"))
        .withColumn("bench_cosine", lit(null).cast("double"))
        .withColumn("contaminated", lit(false))
    val v = col(vecCol).cast("array<double>")
    val scored = refs.map { case (bi, bv) =>
      struct(Similarity.cosine(v, array(bv.map(lit).toIndexedSeq: _*)).as("c"),
        lit(bi).as("bi"))
    }
    val best = if (scored.length == 1) scored.head
               else greatest(scored.toIndexedSeq: _*)
    docs.withColumn("_best", best)
      .withColumn("bench_id", col("_best.bi"))
      .withColumn("bench_cosine", col("_best.c"))
      .withColumn("contaminated", col("_best.c") >= threshold)
      .drop("_best")
  }

  /** Keep only semantically-uncontaminated documents (the apply
    * step of [[semanticOverlap]]).
    */
  def semanticDrop(docs: DataFrame, bench: DataFrame, idCol: String,
                   vecCol: String, threshold: Double): DataFrame =
    semanticOverlap(docs, bench, idCol, vecCol, threshold)
      .where(!col("contaminated"))
      .drop("bench_id", "bench_cosine", "contaminated")

  /** The eval set collapsed to a ONE-ROW distinct-gram array — the
    * broadcastable model form (same pattern as the streaming LM's
    * one-row model: an eval corpus is megabytes, so the array is
    * dimension-table-sized). Train once offline, reuse across batches
    * and streams.
    */
  def benchGramRow(bench: DataFrame, textCol: String, n: Int = 3): DataFrame =
    Spread.ifNarrowAndBig(bench)
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
