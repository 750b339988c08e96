package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `rand()`-based sampling is non-reproducible across runs, retries
  * and engines; these operators derive the keep/drop decision from an
  * md5 hash of the row's id, so a sample is a pure map-side filter —
  * no shuffle, no state, bit-identical on every engine and every
  * re-run, and stable under repartitioning (the properties a 100 TB
  * dataset-curation pipeline needs for auditable subsets).
  *
  * Portability trick: rather than converting the hash to a number
  * (hex→int builtins differ across engines), the fraction is converted
  * ONCE to a fixed-width 15-hex-char threshold and compared as a
  * string — lexicographic order on fixed-width lowercase hex equals
  * numeric order, and md5 hex is identical everywhere.
  */
object Sampling {

  /** 60-bit uniform hash of the id as a fixed-width hex string. */
  def hashKey(id: Column): Column = substring(md5(id.cast("string")), 1, 15)

  /** `fraction` ∈ [0,1] as the equivalent 15-hex-char cutoff. */
  def thresholdHex(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction out of [0,1]: $fraction")
    val max = 1L << 60 // 16^15
    val cut = math.min(max, math.round(fraction * max.toDouble))
    if (cut >= max) "g" // > every hex char — keep all
    else f"$cut%015x"
  }

  /** Keep each row independently with probability `fraction`,
    * deterministically in its id.
    */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.where(hashKey(col(idCol)) < lit(thresholdHex(fraction)))

  /** Per-stratum sampling rates (e.g. downsample boilerplate-heavy
    * sources, keep rare languages whole): rows in strata missing from
    * `fractions` keep `defaultFraction`.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 1.0): DataFrame = {
    val cutoff = fractions.foldLeft(lit(thresholdHex(defaultFraction))) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit(thresholdHex(f))).otherwise(acc)
    }
    df.where(hashKey(col(idCol)) < cutoff)
  }

  /** Disjoint deterministic train/val/test assignment: `splits` are
    * (label, fraction) pairs partitioning [0,1] by cumulative hash
    * threshold; any remainder falls to `restLabel`. Every row gets
    * exactly one label, stable across runs/engines/repartitions —
    * a pure map-side CASE, no shuffle, so splitting a 100 TB corpus
    * costs one scan and the split column prunes like any other.
    */
  def splitAssign(df: DataFrame, idCol: String,
                  splits: Seq[(String, Double)] = Seq("train" -> 0.8, "val" -> 0.1),
                  restLabel: String = "test",
                  splitCol: String = "split"): DataFrame = {
    val total = splits.map(_._2).sum
    require(total <= 1.0 + 1e-12, s"split fractions sum to $total > 1")
    val key = hashKey(col(idCol))
    // CASE over cumulative upper cutoffs, narrowest first — the first
    // matching WHEN wins, which is exactly the [0,c1),[c1,c2),… bands
    val cums = splits.scanLeft(0.0) { case (c, (_, f)) => c + f }.tail
    val cased = splits.zip(cums).foldRight(lit(restLabel): Column) {
      case (((label, _), hi), els) =>
        when(key < lit(thresholdHex(hi)), lit(label)).otherwise(els)
    }
    df.withColumn(splitCol, cased)
  }

  /** Frequency capping: keep at most `maxPerKey` rows per `keyCol`
    * (the per-domain / per-source cap every crawl-curation pipeline
    * applies so one hot domain cannot dominate the corpus). The kept
    * subset is the `maxPerKey` SMALLEST id-hashes within the key —
    * deterministic across runs/engines/repartitioning and unbiased by
    * input order, consistent with the hash-threshold samplers above.
    *
    * 100 TB design: a naive per-key window sorts every row of a hot
    * key in one task (a 50%-of-corpus domain = an unbounded
    * partition). Instead, stage 1 windows over (key, salt) — each of
    * the `saltBuckets` sub-partitions keeps its own `maxPerKey`
    * smallest, bounding any task at bucket size — and stage 2 re-ranks
    * the ≤ saltBuckets×maxPerKey survivors per key. The N smallest
    * per bucket are a superset of the N smallest overall, so the
    * result is identical to the single-window form (OpsSpec pins the
    * equivalence).
    */
  def capPerKey(df: DataFrame, keyCol: String, idCol: String,
                maxPerKey: Int, saltBuckets: Int = 16): DataFrame = {
    require(maxPerKey > 0, s"maxPerKey must be positive: $maxPerKey")
    require(saltBuckets > 0, s"saltBuckets must be positive: $saltBuckets")
    import org.apache.spark.sql.expressions.Window
    val h = hashKey(col(idCol))
    val pruned = df
      .withColumn("_salt", pmod(crc32(col(idCol).cast("string")), lit(saltBuckets)))
      .withColumn("_rn1", row_number().over(
        Window.partitionBy(col(keyCol), col("_salt")).orderBy(h, col(idCol))))
      .where(col("_rn1") <= maxPerKey)
      .drop("_salt", "_rn1")
    pruned
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col(keyCol)).orderBy(h, col(idCol))))
      .where(col("_rn") <= maxPerKey)
      .drop("_rn")
  }
}
