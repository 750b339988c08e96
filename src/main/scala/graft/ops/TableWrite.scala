package graft.ops

import org.apache.spark.sql.DataFrame

/** Shared parquet-write helpers for the persisted-index operators. */
object TableWrite {

  /** Parquet write that always leaves a schema-carrying file, even
    * for a zero-row table: one explicit empty partition is unioned
    * in, and an empty-partition task still writes a footer with the
    * schema — so a read-back of a fresh/empty index never fails
    * schema inference. Used by [[Dedup.writeMinhashIndex]] and
    * [[AnnIndex]].
    */
  def withSchemaAnchor(df: DataFrame, path: String,
                       mode: String = "overwrite"): Unit = {
    val spark = df.sparkSession
    val anchor = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq.empty[org.apache.spark.sql.Row], 1),
      df.schema)
    df.union(anchor).write.mode(mode).parquet(path)
  }

  /** Compact an index directory accumulated by per-shard appends
    * into `parts` files — the small-files maintenance every
    * append-per-ingest table eventually needs (a year of hourly
    * shards is ~9k append batches; unmaintained, every future join
    * pays 9k × tasks of open-file overhead). The rewrite lands in a
    * sibling `.compact_tmp` directory first and swaps in via two
    * renames, so a crash mid-rewrite leaves the live index intact;
    * `transform` lets index owners fold rows while rewriting (e.g.
    * the span-gram index re-aggregates per-gram minima — see
    * [[Dedup.compactSpanGramIndex]]).
    *
    * Single-writer contract: quiesce ingests for the swap window —
    * an append landing between the two renames would be lost, and
    * directory rename is only atomic on rename-capable filesystems
    * (HDFS, POSIX); on object stores route through a transactional
    * table format instead.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              parts: Int,
              transform: DataFrame => DataFrame = identity): Unit = {
    val tmp = path.stripSuffix("/") + ".compact_tmp"
    val old = path.stripSuffix("/") + ".compact_old"
    transform(spark.read.parquet(path))
      .repartition(parts).write.mode("overwrite").parquet(tmp)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    fs.delete(p(old), true)
    if (!fs.rename(p(path), p(old)) || !fs.rename(p(tmp), p(path)))
      throw new java.io.IOException(
        s"compact: rename swap failed for $path (live data is in $old or $tmp)")
    fs.delete(p(old), true)
  }

  /** A scratch directory that a JVM shutdown hook deletes
    * recursively — for bench/verify queries that must materialize a
    * side artifact (e.g. a signature index) per execution without
    * accumulating orphaned trees across a multi-sweep run.
    */
  def scratchDir(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    sys.addShutdownHook {
      def rm(p: java.nio.file.Path): Unit = {
        if (java.nio.file.Files.isDirectory(p)) {
          val s = java.nio.file.Files.list(p)
          try s.forEach(rm(_)) finally s.close()
        }
        java.nio.file.Files.deleteIfExists(p)
      }
      try rm(dir) catch { case _: Throwable => () }
    }
    dir.toString
  }
}
