package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact per-key quantiles and quantile filtering at corpus scale —
  * the "drop everything above the 90th-percentile perplexity per
  * language" selection rule of quality-filtered pretraining corpora
  * (CCNet-style perplexity bucketing, Wenzek et al. 2020), computed
  * WITHOUT a global sort.
  *
  * Distributed shape: the corpus first collapses to a (key, value,
  * count) table — one hash aggregate with map-side combine, bounded
  * by #distinct values, not rows (token counts, rounded scores and
  * integer features compact by orders of magnitude). The quantile is
  * then a running-count scan of that table: value v is the
  * q-quantile iff it is the smallest v whose cumulative count
  * reaches rank max(1, ceil(q·n)) — the PERCENTILE_DISC definition
  * (smallest value whose CDF reaches q), verified against DuckDB
  * `quantile_disc` on real data including tie cases. The per-key window runs over the COMPACTED
  * table, so the one ordered scan is #distinct-sized; for continuous
  * scores callers round to a fixed precision first (the standard
  * bucketing trade — 6 dp keeps 10⁶ buckets per unit range).
  *
  * Float parity: ranks are computed as ceil(q·n) in IEEE double in
  * both engines; values never interpolate (disc), so outputs are
  * exact input values.
  */
object Quantiles {

  /** One row per (key, q): (key, q, quantile, n) where `quantile` is
    * the discrete q-quantile of `valueCol` within the key group and
    * `n` the group's row count. `qs` must be in [0, 1].
    *
    * NULL values are ignored (the SQL-aggregate convention DuckDB's
    * `quantile_disc` follows): they count into neither `n` nor any
    * threshold, and a key whose values are all NULL emits no row.
    */
  def quantileByKey(df: DataFrame, keyCol: String, valueCol: String,
                    qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty, "qs must be non-empty")
    require(qs.forall(q => q >= 0.0 && q <= 1.0), s"qs must be in [0,1]: $qs")
    require(qs.distinct.size == qs.size, s"duplicate qs: $qs")
    import org.apache.spark.sql.expressions.Window
    val wCum = Window.partitionBy(col(keyCol)).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(keyCol))
    // compacted (key, value, count) + running/total counts in one
    // window pass over the #distinct-sized table
    val vc = df.where(col(valueCol).isNotNull)
      .groupBy(col(keyCol), col(valueCol).as("_v"))
      .agg(count(lit(1)).as("_c"))
      .withColumn("_cum", sum(col("_c")).over(wCum))
      .withColumn("_n", sum(col("_c")).over(wAll))
    // the target 1-based rank per q; the quantile is the smallest
    // value whose cumulative count reaches it
    val qCol = explode(array(qs.map(lit): _*)).as("q")
    vc.select(col(keyCol), col("_v"), col("_c"), col("_cum"), col("_n"), qCol)
      .withColumn("_rank",
        greatest(ceil(col("_n").cast("double") * col("q")), lit(1L)).cast("long"))
      .where(col("_cum") >= col("_rank") &&
        (col("_cum") - col("_c")) < col("_rank"))
      .select(col(keyCol), col("q"), col("_v").as("quantile"), col("_n").as("n"))
  }

  /** Per-key quantile bucketing — the CCNet head/middle/tail split
    * (Wenzek et al. 2020): appends `bucketCol` where bucket `i` means
    * the row's value is ≤ the key's `qs(i)` discrete quantile (first
    * matching threshold wins; values above every threshold land in
    * bucket `qs.length`). With qs = (1/3, 2/3): 0 = head, 1 = middle,
    * 2 = tail. Because the thresholds are PERCENTILE_DISC values
    * (actual data values) and the comparison is ≤, every key's rows
    * split so bucket 0 holds at least ceil(n/3) rows — the CCNet
    * convention.
    *
    * Scale: thresholds come from [[quantileByKey]]'s compacted-table
    * scan, pivot to one #keys-sized wide row each, and broadcast-join
    * back; the corpus itself never shuffles and the bucket label is a
    * per-row CASE over plan columns.
    */
  def bucketByKey(df: DataFrame, keyCol: String, valueCol: String,
                  qs: Seq[Double], bucketCol: String = "bucket"): DataFrame = {
    require(qs == qs.sorted, s"qs must be ascending: $qs")
    require(!df.columns.contains(bucketCol),
      s"bucketByKey: input already has a '$bucketCol' column")
    val internal = "_qk" +: qs.indices.map(i => s"_t$i")
    val clash = internal.filter(df.columns.contains)
    require(clash.isEmpty, s"bucketByKey: input columns collide with internals: $clash")
    val aggs = qs.zipWithIndex.map { case (q, i) =>
      max(when(col("q") === q, col("quantile"))).as(s"_t$i")
    }
    val thr = quantileByKey(df, keyCol, valueCol, qs)
      .groupBy(col(keyCol).as("_qk"))
      .agg(aggs.head, aggs.tail: _*)
    val bucket = qs.indices.foldRight(lit(qs.length)) { (i, acc) =>
      when(col(valueCol) <= col(s"_t$i"), lit(i)).otherwise(acc)
    }
    // a NULL value compares UNKNOWN against every threshold — label
    // it NULL explicitly rather than letting it fall through to the
    // top bucket (thresholds themselves ignore NULLs; quantileByKey).
    // LEFT join: a key whose values are ALL NULL gets no threshold
    // row at all (and a NULL key never equi-joins) — those rows pass
    // through with a NULL bucket instead of silently dropping, which
    // the `_qk.isNull` guard also keeps off the top-bucket fallthrough
    df.join(broadcast(thr), col(keyCol) === col("_qk"), "left")
      .withColumn(bucketCol,
        when(col(valueCol).isNull || col("_qk").isNull, lit(null))
          .otherwise(bucket).cast("long"))
      .drop("_qk" +: qs.indices.map(i => s"_t$i"): _*)
  }

  /** Keep rows at or below (`keepBelow`, the perplexity-filter
    * direction) or at or above their key's discrete q-quantile of
    * `valueCol`. The #keys-sized threshold table broadcast-joins
    * back; the corpus itself never shuffles.
    */
  def quantileFilter(df: DataFrame, keyCol: String, valueCol: String,
                     q: Double, keepBelow: Boolean = true): DataFrame = {
    val thr = quantileByKey(df, keyCol, valueCol, Seq(q))
      .select(col(keyCol).as("_qk"), col("quantile").as("_thr"))
    val cond =
      if (keepBelow) col(valueCol) <= col("_thr") else col(valueCol) >= col("_thr")
    df.join(broadcast(thr), col(keyCol) === col("_qk"))
      .where(cond)
      .drop("_qk", "_thr")
  }
}
