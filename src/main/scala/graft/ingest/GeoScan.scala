package graft.ingest

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileStatusWithMetadata, PartitionDirectory, HadoopFsRelation, LogicalRelation, FileIndex => SparkFileIndex}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.graft.DatasetBridge
import org.apache.spark.sql.types.StructType

/** Transparent file-level bbox pruning for plain `spark.sql` users:
  * the footer-stats manifest of [[FileIndex]] plugged into Spark's own
  * scan machinery as a custom
  * `execution.datasources.FileIndex` — the planner hands `listFiles`
  * the pushed data filters, matching bbox predicates cut the file list
  * BEFORE the scan starts, and everything downstream (vectorized
  * parquet reader, row-group pushdown on the same columns, codegen) is
  * stock Spark. This is the Spark-native analogue of the reference's
  * worker-side spatial index serving ranged reads
  * (/root/reference/worker/index.js:133-213): same pruning decision,
  * but expressed inside the planner so ad-hoc SQL gets it without
  * calling Ingest APIs.
  *
  * (A DataSourceV2 `SupportsPushDownFilters` table would duplicate the
  * parquet read path to achieve the same listing cut; implementing the
  * V1 FileIndex seam instead reuses Spark's reader wholesale — the
  * same choice Delta Lake makes for its file skipping.)
  *
  * Scale: the manifest is built once, distributed (footer reads run on
  * executors), and holds 4 doubles + a path per file — ~100k files at
  * 100 TB is a few MB on the driver. Files without bbox stats are
  * conservatively kept.
  */
object GeoScan {

  /** Pruning-relevant file-level test for one pushed conjunct, or None
    * when the predicate doesn't constrain the file list.
    *
    * Soundness: the manifest stores the file's aggregate
    * [xmin..xmax]×[ymin..ymax]. For every row, xmin ≤ xmax within
    * [file.xmin, file.xmax] (same for y), so
    *  - `col >= v` is unsatisfiable when file.xmax < v,
    *  - `col <= v` is unsatisfiable when file.xmin > v,
    * for col ∈ {xmin, xmax} (y alike) — covering both the canonical
    * intersects pattern and within-window queries. Anything else keeps
    * the file (row-group and row filters still apply downstream).
    */
  private[ingest] def fileTest(e: Expression): Option[FileIndex.FileBBox => Boolean] = {
    def colName(c: Expression): Option[String] = c match {
      case a: Attribute => Some(a.name.toLowerCase)
      // the analyzer leaves GetStructField.name as None — resolve the
      // field through the child's struct schema by ordinal
      case g: GetStructField => g.child match {
        case a: Attribute if a.name.equalsIgnoreCase("bbox") =>
          a.dataType match {
            case st: StructType if g.ordinal < st.fields.length =>
              Some(g.name.getOrElse(st.fields(g.ordinal).name).toLowerCase)
            case _ => None
          }
        case _ => None
      }
      case Cast(inner, _, _, _) => colName(inner)
      case _ => None
    }
    def litD(l: Expression): Option[Double] = l match {
      case lit: Literal if lit.foldable => lit.eval() match {
        case d: java.lang.Double  => Some(d.doubleValue())
        case f: java.lang.Float   => Some(f.doubleValue())
        case i: java.lang.Integer => Some(i.doubleValue())
        case l2: java.lang.Long   => Some(l2.doubleValue())
        case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
        case _                    => None
      }
      case _ => None
    }
    val known = Set("xmin", "xmax", "ymin", "ymax")
    def hi(n: String)(b: FileIndex.FileBBox): Double = if (n.startsWith("x")) b.xmax else b.ymax
    def lo(n: String)(b: FileIndex.FileBBox): Double = if (n.startsWith("x")) b.xmin else b.ymin
    def ge(c: Expression, l: Expression): Option[FileIndex.FileBBox => Boolean] =
      for { n <- colName(c) if known(n); v <- litD(l) } yield (b => hi(n)(b) >= v)
    def le(c: Expression, l: Expression): Option[FileIndex.FileBBox => Boolean] =
      for { n <- colName(c) if known(n); v <- litD(l) } yield (b => lo(n)(b) <= v)

    e match {
      case GreaterThanOrEqual(c, l) => ge(c, l)
      case GreaterThan(c, l)        => ge(c, l)
      case LessThanOrEqual(c, l)    => le(c, l)
      case LessThan(c, l)           => le(c, l)
      // flipped literal-first forms
      case GreaterThanOrEqual(l: Literal, c) => le(c, l)
      case GreaterThan(l: Literal, c)        => le(c, l)
      case LessThanOrEqual(l: Literal, c)    => ge(c, l)
      case LessThan(l: Literal, c)           => ge(c, l)
      case EqualTo(c, l) =>
        for { g <- ge(c, l); lt <- le(c, l) } yield (b => g(b) && lt(b))
      case And(a, b2) =>
        (fileTest(a), fileTest(b2)) match {
          case (Some(fa), Some(fb)) => Some(b => fa(b) && fb(b))
          case (one, other)         => one.orElse(other)
        }
      case _ => None
    }
  }

  /** Immutable listing snapshot: one directory listing (never a
    * per-file getFileStatus loop — 100k serial RPCs on an object
    * store) + the distributed footer-bbox manifest, keyed scheme-less
    * (manifest keys and FileStatus paths may differ in scheme:
    * "/a/b.parquet" vs "file:/a/b.parquet").
    */
  private final case class Snapshot(statuses: Seq[FileStatus],
                                    byPath: Map[String, FileIndex.FileBBox])

  private def takeSnapshot(spark: SparkSession, dir: String, conf: Configuration): Snapshot = {
    val paths = FileIndex.listParquet(dir, conf)
    require(paths.nonEmpty, s"no parquet files under $dir")
    val manifest = FileIndex.build(spark, paths)
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(conf)
    val wanted = paths.map(p => new Path(p).toUri.getPath).toSet
    val statuses = fs.listStatus(dirPath).toSeq
      .filter(st => st.isFile && wanted(st.getPath.toUri.getPath))
      .sortBy(_.getPath.toString)
    Snapshot(statuses,
      manifest.map { case (k, v) => new Path(k).toUri.getPath -> v })
  }

  /** Spark FileIndex over a directory snapshot + bbox manifest;
    * `refresh()` re-lists and re-reads footers (the contract Spark's
    * REFRESH TABLE path expects), picking up appended files.
    */
  final class BBoxFileIndex(
      spark: SparkSession, dir: String,
      @volatile private var snapshot: Snapshot) extends SparkFileIndex {

    override def rootPaths: Seq[Path] = Seq(new Path(dir))
    override def partitionSchema: StructType = new StructType()
    override def inputFiles: Array[String] = snapshot.statuses.map(_.getPath.toString).toArray
    override def refresh(): Unit =
      snapshot = takeSnapshot(spark, dir,
        new Configuration(spark.sparkContext.hadoopConfiguration))
    override def sizeInBytes: Long = snapshot.statuses.map(_.getLen).sum

    override def listFiles(partitionFilters: Seq[Expression],
                           dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
      val snap = snapshot
      val tests = dataFilters.flatMap(fileTest)
      val kept = snap.statuses.filter { st =>
        snap.byPath.get(st.getPath.toUri.getPath)
          .forall(b => tests.forall(t => t(b))) // no stats → keep
      }
      Seq(PartitionDirectory(InternalRow.empty, kept.map(s => FileStatusWithMetadata(s))))
    }
  }

  /** A DataFrame over `dir`'s parquet files with transparent bbox file
    * pruning — register it as a view and plain `spark.sql` predicates
    * on bbox columns cut the file list at planning time.
    */
  def bboxPrunedTable(spark: SparkSession, dir: String): DataFrame = {
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    val snap = takeSnapshot(spark, dir, conf)
    val schema = spark.read.parquet(snap.statuses.head.getPath.toString).schema
    val index = new BBoxFileIndex(spark, dir, snap)
    val relation = HadoopFsRelation(
      index, new StructType(), schema, None, new ParquetFileFormat(), Map.empty)(spark)
    DatasetBridge.ofRows(spark, LogicalRelation(relation))
  }
}
