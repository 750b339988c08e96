package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap join: pairs of rows whose [start, end] ranges
  * intersect (inclusive ends), optionally also matching on equi keys.
  * DuckDB plans the raw inequality predicate with its IEJoin; Spark
  * would fall back to BroadcastNestedLoopJoin — so the ranges are
  * bucketized instead: each interval explodes to the coarse buckets it
  * covers, buckets equi-join (hash, shuffled on the bucket and keys),
  * the true overlap predicate refines, and a DISTINCT collapses the
  * multi-bucket duplicates. The same grid-prefilter shape as the
  * spatial GridJoin, in one dimension.
  *
  * 100 TB design: the shuffle carries (bucket, keys) hash partitions —
  * no pair enumeration beyond co-bucketed candidates. `bucket` trades
  * replication (intervals spanning many buckets) against candidate
  * density (too-coarse buckets co-locate non-overlapping intervals);
  * set it near the typical interval length. A bucket holding a hot
  * spot splits under AQE skew handling like any hash join.
  */
object IntervalJoin {

  /** Explode an interval to the bucket ids it covers. */
  private def buckets(start: Column, end: Column, bucket: Long): Column =
    sequence(floor(start / bucket).cast("long"), floor(end / bucket).cast("long"))

  def overlapJoin(left: DataFrame, right: DataFrame,
                  lStart: String, lEnd: String,
                  rStart: String, rEnd: String,
                  keys: Seq[String] = Nil,
                  bucket: Long = 3600000000L): DataFrame = {
    require(bucket > 0, "bucket width must be positive")
    val overlapCols = left.columns.toSet.intersect(right.columns.toSet) -- keys
    require(overlapCols.isEmpty,
      s"overlapJoin: non-key columns present on both sides: ${overlapCols.mkString(", ")}")
    val l = left.withColumn("__bkt",
      explode(buckets(col(lStart), col(lEnd), bucket)))
    val r = right.withColumn("__bkt",
      explode(buckets(col(rStart), col(rEnd), bucket)))
    l.join(r, Seq("__bkt") ++ keys)
      .where(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .drop("__bkt")
      .distinct()
  }
}
