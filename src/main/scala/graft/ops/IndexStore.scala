package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.hadoop.fs.{FileSystem, Path}

/** Manifest-committed storage for the persisted-index families
  * (digest / MinHash-signature / span-gram). The index directory is
  * append-only data plus a tiny commit log:
  *
  * {{{
  *   <path>/manifest/v00000001, v00000002, ...   one small text file per commit
  *   <path>/data-<uuid>/_pfx=<p>/part-*.parquet  a commit's rows, hash-prefix partitioned
  *   <path>/anchor-<uuid>/part-*.parquet         zero-row schema anchor (empty index)
  * }}}
  *
  * The CURRENT state of the index is defined by the highest complete
  * manifest version: a manifest lists the data directories that are
  * live, carries every idempotence tag ever committed, and ends with
  * a terminator line so a crash mid-write is detectable (readers skip
  * incomplete versions). Appends and compaction both commit by
  * writing the NEXT manifest version — never by renaming data
  * directories — which closes the two windows the rename-swap
  * maintenance had:
  *
  *   - '''crash-safety''': a compaction that dies before its manifest
  *     commit leaves the previous manifest (and every byte it points
  *     to) untouched; the rewritten files are an orphan directory a
  *     later [[vacuum]] reclaims. There is no instant at which the
  *     index path is missing or half-swapped.
  *   - '''append/compact interleave''': compaction snapshots version
  *     `k`, rewrites `k`'s leaves, then commits against the LATEST
  *     version — any append that landed after `k` is carried forward
  *     (its leaves are not in the rewritten set), so neither writer
  *     loses rows and no quiesce window is required.
  *
  * '''Idempotence tags''' make appends replay-safe: a commit carrying
  * `tag` is skipped when any prior manifest already recorded that tag
  * — the mechanism the streaming foreachBatch sinks use to turn
  * at-least-once micro-batch delivery into exactly-once index
  * mutation (tag = the batchId).
  *
  * '''Layout''': each commit's rows land hash-prefix partitioned
  * (`_pfx=` directory partitioning on a caller-supplied derivation of
  * the index key, e.g. `substr(digest, 1, 1)`), so [[compact]]
  * touches ONLY partitions that accumulated more than one leaf —
  * at a steady ingest cadence most of a mature index is already
  * compacted and each maintenance pass rewrites the dirty fraction,
  * not the corpus-sized whole.
  *
  * '''Concurrency contract''': manifest versions are claimed by
  * exclusive create (`fs.create(..., overwrite = false)`), the
  * put-if-absent HDFS and POSIX honor; within a JVM the claim window
  * is additionally serialized per path, so a streaming query and a
  * maintenance thread interleave safely. Multi-JVM writers need a
  * filesystem whose exclusive create is atomic (HDFS, POSIX) — on an
  * object store, front the manifest directory with a conditional-put
  * (the same requirement every file-listing table format has).
  *
  * '''Scale''': reading the index is one small-manifest read plus a
  * parquet scan over the listed directories — file listing stays
  * distributed, nothing is collected; the manifest itself is
  * O(#uncompacted commits + #tags) lines of text.
  */
object IndexStore {

  private val Header = "#graft-index-manifest 1"
  private val End = "#END"
  private val VersionRe = "^v(\\d{8,})$".r

  /** Per-path JVM lock striping for the claim window. */
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(path: String): Object =
    locks.computeIfAbsent(path, _ => new Object)

  /** A complete manifest version: live data directories (relative to
    * the index path) and every idempotence tag ever committed.
    */
  final case class Snapshot(version: Long, entries: Seq[String], tags: Set[String])

  private def fsFor(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  private def manifestDir(path: String) = new Path(path, "manifest")

  /** True iff `path` holds an index with at least one complete
    * manifest version.
    */
  def exists(spark: SparkSession, path: String): Boolean =
    currentOpt(fsFor(spark, path), path).isDefined

  /** Highest COMPLETE manifest version, or None for a fresh path.
    * Incomplete files (a crashed committer) are skipped for reading
    * but their version numbers stay burned — the next commit claims
    * a strictly higher one.
    */
  private def currentOpt(fs: FileSystem, path: String): Option[Snapshot] = {
    val dir = manifestDir(path)
    if (!fs.exists(dir)) return None
    val versions = fs.listStatus(dir).toSeq
      .flatMap(st => st.getPath.getName match {
        case VersionRe(v) => Some(v.toLong -> st.getPath)
        case _ => None
      })
      .sortBy(-_._1)
    versions.iterator.flatMap { case (v, p) => readManifest(fs, p, v) }
      .nextOption()
  }

  /** Highest burned version number, complete or not — the floor for
    * the next claim.
    */
  private def maxBurned(fs: FileSystem, path: String): Long = {
    val dir = manifestDir(path)
    if (!fs.exists(dir)) 0L
    else fs.listStatus(dir).toSeq.flatMap(_.getPath.getName match {
      case VersionRe(v) => Some(v.toLong)
      case _ => None
    }).maxOption.getOrElse(0L)
  }

  private def readManifest(fs: FileSystem, p: Path, v: Long): Option[Snapshot] = {
    val in = fs.open(p)
    val text =
      try {
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
        new String(bos.toByteArray, "UTF-8")
      } finally in.close()
    val lines = text.split("\n", -1).toSeq
    if (lines.headOption.getOrElse("") != Header || !lines.contains(End)) None
    else {
      val body = lines.drop(1).takeWhile(_ != End)
      Some(Snapshot(v,
        body.collect { case l if l.startsWith("e ") => l.drop(2) },
        body.collect { case l if l.startsWith("t ") => l.drop(2) }.toSet))
    }
  }

  /** Claim-and-write the next manifest version. `build` receives the
    * latest snapshot (None on a fresh path) and returns the new entry
    * list + tag set, or None to abort (e.g. tag already present).
    * Returns true iff a new version was committed.
    */
  private def commit(fs: FileSystem, path: String)
                    (build: Option[Snapshot] => Option[(Seq[String], Set[String])]): Boolean =
    lockFor(new Path(path).toUri.toString).synchronized {
      val dir = manifestDir(path)
      if (!fs.exists(dir)) fs.mkdirs(dir)
      var committed = false
      var done = false
      while (!done) {
        val snap = currentOpt(fs, path)
        build(snap) match {
          case None => done = true
          case Some((entries, tags)) =>
            val next = math.max(maxBurned(fs, path), snap.map(_.version).getOrElse(0L)) + 1
            val target = new Path(dir, f"v$next%08d")
            val claimed =
              try {
                val out = fs.create(target, false)
                try {
                  val sb = new StringBuilder(Header).append('\n')
                  tags.toSeq.sorted.foreach(t => sb.append("t ").append(t).append('\n'))
                  entries.foreach(e => sb.append("e ").append(e).append('\n'))
                  sb.append(End).append('\n')
                  out.write(sb.toString.getBytes("UTF-8"))
                } finally out.close()
                true
              } catch { case _: java.io.IOException => false } // version taken — retry
            if (claimed) { committed = true; done = true }
        }
      }
      committed
    }

  /** Read the live index as one DataFrame. Fails loudly on a path
    * with no complete manifest — callers that tolerate a fresh index
    * gate on [[exists]] and [[init]] first.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val snap = currentOpt(fsFor(spark, path), path).getOrElse(
      throw new java.io.FileNotFoundException(
        s"IndexStore.read: no complete manifest under $path/manifest — not an index " +
          "(initialize with IndexStore.init or an append)"))
    if (snap.entries.isEmpty)
      throw new IllegalStateException(
        s"IndexStore.read: manifest v${snap.version} at $path lists no data directories")
    spark.read.parquet(snap.entries.map(e => s"$path/$e"): _*)
  }

  /** Initialize an EMPTY index: one zero-row schema-carrying anchor
    * file (an empty-partition parquet task still writes a footer), so
    * the first [[read]] never fails schema inference. No-op if the
    * index already exists.
    */
  def init(spark: SparkSession, path: String, schema: StructType): Unit = {
    val fs = fsFor(spark, path)
    commit(fs, path) {
      case Some(_) => None // already initialized
      case None =>
        val anchor = writeAnchor(spark, path, schema)
        Some(Seq(anchor) -> Set.empty)
    }
  }

  private def writeAnchor(spark: SparkSession, path: String, schema: StructType): String = {
    val name = s"anchor-${java.util.UUID.randomUUID().toString.take(12)}"
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq.empty[org.apache.spark.sql.Row], 1), schema)
      .write.mode("overwrite").parquet(s"$path/$name")
    name
  }

  /** Commit `df` as a new append. Rows land under a fresh
    * `data-<uuid>` directory, hash-prefix partitioned by `pfx`
    * (a derivation of the index key — rows with equal keys must map
    * to equal prefixes, so per-partition compaction folds globally).
    * A `tag` makes the commit idempotent: if any prior manifest
    * recorded it, nothing is written and false returns. An absent
    * manifest initializes implicitly with this commit's rows.
    * Rows shuffle once on the prefix (`parts` targets, default = one
    * writer per prefix group) so each append lands ONE file per
    * touched prefix — an unshuffled partitionBy write would emit
    * #tasks × #prefixes tiny files and every future index read would
    * pay their footers. Returns true iff a new version committed.
    */
  def append(df: DataFrame, path: String, pfx: Column,
             tag: Option[String] = None, parts: Int = 16): Boolean = {
    val spark = df.sparkSession
    val fs = fsFor(spark, path)
    // cheap pre-check outside the write: a replayed batch skips the
    // data write entirely, not just the manifest line
    if (tag.exists(t => currentOpt(fs, path).exists(_.tags.contains(t))))
      return false
    val name = s"data-${java.util.UUID.randomUUID().toString.take(12)}"
    df.withColumn("_pfx", pfx.cast("string"))
      .repartition(parts, col("_pfx"))
      .write.partitionBy("_pfx").mode("overwrite").parquet(s"$path/$name")
    // a zero-row frame writes no partition directories — the commit
    // then records only the tag (and an anchor on a fresh path)
    val leaves = leafDirs(fs, path, name)
    commit(fs, path) { snapOpt =>
      if (tag.exists(t => snapOpt.exists(_.tags.contains(t)))) None
      else {
        val prior = snapOpt.map(_.entries).getOrElse(Seq.empty)
        val entries =
          if (prior.isEmpty && leaves.isEmpty)
            Seq(writeAnchor(spark, path, df.schema))
          else prior ++ leaves
        Some(entries -> (snapOpt.map(_.tags).getOrElse(Set.empty) ++ tag))
      }
    }
  }

  private def leafDirs(fs: FileSystem, path: String, dataDir: String): Seq[String] = {
    val p = new Path(s"$path/$dataDir")
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("_pfx="))
      .map(st => s"$dataDir/${st.getPath.getName}")
      .sorted
  }

  private def pfxOf(entry: String): String = {
    val base = entry.substring(entry.lastIndexOf('/') + 1)
    if (base.startsWith("_pfx=")) base.drop(5) else ""
  }

  /** Rewrite the index's DIRTY partitions — prefix groups holding
    * more than one leaf directory (touched by several commits since
    * the last maintenance) — folding rows through `transform` (e.g.
    * the per-gram minima merge) and landing the result as one fresh
    * partitioned data directory. Clean partitions are not read, not
    * rewritten, and keep their manifest entries — the property that
    * keeps maintenance proportional to the uncompacted fraction
    * instead of the corpus. With `dirtyOnly = false` every partition
    * rewrites (full defrag). Anchors survive only while the index
    * has no data. Commits against the LATEST manifest, so appends
    * landing mid-compaction are carried forward untouched.
    */
  def compact(spark: SparkSession, path: String, pfx: Column,
              transform: DataFrame => DataFrame = identity,
              parts: Int = 32, dirtyOnly: Boolean = true): Unit = {
    val fs = fsFor(spark, path)
    val snap = currentOpt(fs, path).getOrElse(return)
    val dataLeaves = snap.entries.filter(_.contains("_pfx="))
    val byPfx = dataLeaves.groupBy(pfxOf)
    val victim = byPfx.filter { case (_, ls) => !dirtyOnly || ls.size > 1 }
      .values.flatten.toSeq.sorted
    if (victim.isEmpty) return
    val name = s"data-${java.util.UUID.randomUUID().toString.take(12)}"
    val folded = transform(spark.read.parquet(victim.map(e => s"$path/$e"): _*))
    folded
      .withColumn("_pfx", pfx.cast("string"))
      .repartition(parts, col("_pfx"))
      .write.partitionBy("_pfx").mode("overwrite").parquet(s"$path/$name")
    val leaves = leafDirs(fs, path, name)
    val victimSet = victim.toSet
    commit(fs, path) { snapOpt =>
      val latest = snapOpt.getOrElse(Snapshot(0L, Seq.empty, Set.empty))
      val all = latest.entries.filterNot(victimSet) ++ leaves
      val (anch, data) = all.partition(e => !e.contains("_pfx="))
      // anchors are redundant once real data exists; an index whose
      // every row folded away keeps (or mints) one to stay readable
      val entries =
        if (data.nonEmpty) data
        else if (anch.nonEmpty) anch
        else Seq(writeAnchor(spark, path, folded.schema))
      Some(entries -> latest.tags)
    }
  }

  /** Delete data directories no longer referenced by the CURRENT
    * manifest — compaction victims and crashed commits. Run from a
    * maintenance window: an append IN FLIGHT (data written, manifest
    * not yet committed) is indistinguishable from an orphan, the same
    * single-vacuumer contract every file-listing table format has.
    */
  def vacuum(spark: SparkSession, path: String): Unit = {
    val fs = fsFor(spark, path)
    val snap = currentOpt(fs, path).getOrElse(return)
    val liveRoots = snap.entries.map(e => e.split("/", 2)(0)).toSet
    fs.listStatus(new Path(path)).toSeq
      .filter(st => st.isDirectory &&
        (st.getPath.getName.startsWith("data-") || st.getPath.getName.startsWith("anchor-")) &&
        !liveRoots.contains(st.getPath.getName))
      .foreach(st => fs.delete(st.getPath, true))
  }

  /** Leaf directories of the current manifest, relative to `path` —
    * the observable layout (specs assert dirty-partition rewrites
    * against it).
    */
  def liveEntries(spark: SparkSession, path: String): Seq[String] =
    currentOpt(fsFor(spark, path), path).map(_.entries).getOrElse(Seq.empty)

  /** True iff `tag` was recorded by any committed version. */
  def hasTag(spark: SparkSession, path: String, tag: String): Boolean =
    currentOpt(fsFor(spark, path), path).exists(_.tags.contains(tag))

  /** Health summary of the current manifest — the numbers a
    * maintenance scheduler needs: how fragmented each prefix group is
    * (leaves accumulate one per append until a compaction folds
    * them), how many groups [[compact]] would rewrite, and how many
    * idempotence tags the manifest carries (each a completed ingest
    * batch). Manifest-only: no data file is opened, so the check is
    * safe to run on every ingest tick.
    */
  final case class Stats(version: Long, nDataLeaves: Int, nAnchors: Int,
                         nTags: Int, nPrefixes: Int, nDirtyPrefixes: Int,
                         maxLeavesPerPrefix: Int) {
    /** The fraction of prefix groups a dirty-only [[compact]] would
      * rewrite — the index's fragmentation measure. */
    def dirtyFraction: Double =
      if (nPrefixes == 0) 0.0 else nDirtyPrefixes.toDouble / nPrefixes
  }

  /** [[Stats]] for the index at `path`, or None for a fresh path. */
  def stats(spark: SparkSession, path: String): Option[Stats] =
    currentOpt(fsFor(spark, path), path).map { snap =>
      val (anchors, data) = snap.entries.partition(e => !e.contains("_pfx="))
      val byPfx = data.groupBy(pfxOf)
      Stats(snap.version, data.size, anchors.size, snap.tags.size,
        byPfx.size, byPfx.count(_._2.size > 1),
        if (byPfx.isEmpty) 0 else byPfx.valuesIterator.map(_.size).max)
    }

  /** Destroy the index directory (the `append = false` reset path of
    * the write helpers).
    */
  def reset(spark: SparkSession, path: String): Unit = {
    val fs = fsFor(spark, path)
    val p = new Path(path)
    if (fs.exists(p)) fs.delete(p, true)
  }
}
