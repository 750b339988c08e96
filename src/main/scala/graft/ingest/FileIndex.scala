package graft.ingest

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

/** File-level spatial pruning: a bbox manifest built from parquet
  * footer statistics, used to cut the path list before the scan even
  * starts.
  *
  * This mirrors the reference's Worker-side file index
  * (/root/reference/worker/index.js:193-213 build, 276-309 stats
  * extraction, 133-191 serve): it reads each footer's row-group column
  * stats for `bbox.xmin/xmax/ymin/ymax` and keeps only files whose
  * aggregate bbox intersects the query window. Row-group-level pruning
  * inside surviving files then comes free from Spark's parquet filter
  * pushdown on the same columns.
  *
  * Scale design: footer reads are distributed over executors (one
  * footer is a few KB of IO — at 100 TB / ~100k files this is a
  * seconds-long parallel job, not a driver loop), and the manifest is
  * tiny (4 doubles per file) so it broadcasts/caches trivially.
  */
object FileIndex {

  final case class FileBBox(path: String, xmin: Double, ymin: Double, xmax: Double, ymax: Double) {
    def intersects(qxmin: Double, qymin: Double, qxmax: Double, qymax: Double): Boolean =
      xmax >= qxmin && xmin <= qxmax && ymax >= qymin && ymin <= qymax
  }

  /** Read one footer's aggregate bbox (None when the file carries no
    * usable bbox stats — treated as always-matching, like the
    * reference does for unknown files).
    */
  def footerBBox(path: String, conf: Configuration): Option[FileBBox] = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(path), conf))
    try {
      var xmin = Double.PositiveInfinity; var ymin = Double.PositiveInfinity
      var xmax = Double.NegativeInfinity; var ymax = Double.NegativeInfinity
      var seen = false
      val blocks = reader.getFooter.getBlocks
      val it = blocks.iterator()
      while (it.hasNext) {
        val block = it.next()
        val cit = block.getColumns.iterator()
        while (cit.hasNext) {
          val col = cit.next()
          val p = col.getPath.toDotString
          val st = col.getStatistics
          if (st != null && !st.isEmpty) {
            def mn = st.genericGetMin match { case d: java.lang.Double => d.doubleValue(); case _ => Double.NaN }
            def mx = st.genericGetMax match { case d: java.lang.Double => d.doubleValue(); case _ => Double.NaN }
            p match {
              case "bbox.xmin" => if (!mn.isNaN) { xmin = math.min(xmin, mn); seen = true }
              case "bbox.xmax" => if (!mx.isNaN) { xmax = math.max(xmax, mx); seen = true }
              case "bbox.ymin" => if (!mn.isNaN) { ymin = math.min(ymin, mn); seen = true }
              case "bbox.ymax" => if (!mx.isNaN) { ymax = math.max(ymax, mx); seen = true }
              case _ => ()
            }
          }
        }
      }
      if (seen && xmin.isFinite && xmax.isFinite && ymin.isFinite && ymax.isFinite)
        Some(FileBBox(path, xmin, ymin, xmax, ymax))
      else None
    } finally reader.close()
  }

  /** Build the manifest for a list of files, distributed over the
    * cluster.
    */
  def build(spark: SparkSession, paths: Seq[String]): Map[String, FileBBox] = {
    if (paths.isEmpty) return Map.empty
    val n = math.min(paths.length, spark.sparkContext.defaultParallelism * 2)
    spark.sparkContext
      .parallelize(paths, math.max(1, n))
      .mapPartitions { it =>
        val conf = new Configuration()
        it.flatMap(p => footerBBox(p, conf).map(b => p -> b))
      }
      .collect()
      .toMap
  }

  /** List the parquet files of a dataset directory.
    *
    * Bare local paths keep returning plain absolute paths (the round-1
    * contract); any URI with a scheme — `file:`, `hdfs:`, `s3a:`,
    * `abfs:`, ... — goes through the Hadoop FileSystem for that
    * scheme, which is the object-store listing boundary a 100 TB
    * deployment needs (the reference lists S3 and serves ranges over
    * HTTP in worker/index.js:133-191,245-260; here Hadoop-FS supplies
    * both listing and range reads).
    */
  def listParquet(dir: String): Seq[String] = listParquet(dir, new Configuration())

  def listParquet(dir: String, conf: Configuration): Seq[String] = {
    val hasScheme = java.net.URI.create(
      // Path can't parse spaces etc.; only the scheme sniff needs URI form
      dir.replace(" ", "%20")).getScheme != null
    if (!hasScheme) {
      val d = new java.io.File(dir)
      if (!d.isDirectory) Seq.empty
      else d.listFiles().toSeq
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .map(_.getAbsolutePath).sorted
    } else {
      val p = new Path(dir)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.toString).sorted
    }
  }

  /** Prune a path list to those possibly intersecting the query bbox.
    * Files without stats are conservatively kept.
    */
  def prune(manifest: Map[String, FileBBox], paths: Seq[String],
            xmin: Double, ymin: Double, xmax: Double, ymax: Double): Seq[String] =
    paths.filter { p =>
      manifest.get(p).forall(_.intersects(xmin, ymin, xmax, ymax))
    }
}
