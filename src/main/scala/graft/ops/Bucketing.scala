package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table utilities: pre-shuffling fact tables once at write
  * time so repeated equi-joins/aggregations on the bucket key run
  * with NO exchange — at 100 TB the shuffle is the dominant cost of a
  * fact-fact join, and bucketing amortizes it across every downstream
  * query.
  *
  * Uses Spark's native bucketing (`bucketBy` + `saveAsTable`); both
  * sides bucketed by the same key and count join shuffle-free
  * (`spark.sql.sources.bucketing.enabled`, on by default).
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (sorted within buckets so
    * merge-friendly reads come free).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    buckets: Int, sortCols: Seq[String] = Seq.empty): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    val sorted =
      if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.saveAsTable(table)
  }

  /** Co-locate two DataFrames on a shared key at matching partition
    * counts — the transient (per-session) alternative to bucketing
    * when the data is not worth persisting. Note: unlike bucketing,
    * exchange reuse is planner-discretionary (Catalyst may re-shuffle
    * if the join's required distribution differs); bucketed tables are
    * the guaranteed-shuffle-free path.
    *
    * The repartition here is deliberately UNGUARDED (no [[Spread]]
    * width check): co-location is only guaranteed when both sides
    * carry the identical HashPartitioning(key, partitions), so
    * skipping the exchange on an already-wide side would silently
    * break the contract callers opt into. A side that already has
    * exactly this partitioning costs Catalyst nothing extra anyway.
    */
  def colocate(a: DataFrame, b: DataFrame, key: String, partitions: Int): (DataFrame, DataFrame) =
    (a.repartition(partitions, a(key)), b.repartition(partitions, b(key)))

  def dropTable(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
}
