package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The manifest-committed index store: tag idempotence, hash-prefix
  * layout, dirty-partition-only compaction, append/compact
  * interleave, and crash recovery (orphan data dirs, incomplete
  * manifests).
  */
class IndexStoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  private def pfx = pmod(col("gh"), lit(4)).cast("string")
  private def tmp() = java.nio.file.Files.createTempDirectory("graft_idx").toString

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("init/append/read: anchors carry schema, tags are idempotent, _pfx never leaks") {
    val path = tmp()
    val shard = Seq((0L, 10L), (1L, 11L), (5L, 12L)).toDF("gh", "min_doc")
    IndexStore.init(spark, path, shard.schema)
    // a fresh index reads as zero rows with the right schema
    val fresh = IndexStore.read(spark, path)
    assert(fresh.columns.toSeq == Seq("gh", "min_doc") && fresh.count() == 0)

    assert(IndexStore.append(shard, path, pfx, Some("s1")))
    // replayed tag: nothing written, nothing duplicated
    assert(!IndexStore.append(shard, path, pfx, Some("s1")))
    val got = IndexStore.read(spark, path)
    assert(got.columns.toSeq == Seq("gh", "min_doc"), "layout column must not leak")
    assert(rows(got) == rows(shard))
    assert(IndexStore.hasTag(spark, path, "s1") && !IndexStore.hasTag(spark, path, "s2"))

    // a zero-row tagged append still records its tag (an empty shard
    // is a completed shard)
    assert(IndexStore.append(shard.where(lit(false)), path, pfx, Some("s2")))
    assert(IndexStore.hasTag(spark, path, "s2"))
    assert(rows(IndexStore.read(spark, path)) == rows(shard))
  }

  test("compaction rewrites ONLY dirty partitions and folds per key") {
    val path = tmp()
    // shard 1 touches prefixes 0..3; shard 2 only prefixes 0 and 1
    val s1 = (0L until 16L).map(g => (g, 100L + g)).toDF("gh", "min_doc")
    val s2 = Seq((0L, 90L), (4L, 95L), (1L, 201L), (5L, 202L)).toDF("gh", "min_doc")
    IndexStore.append(s1, path, pfx)
    IndexStore.append(s2, path, pfx)
    val before = IndexStore.liveEntries(spark, path)
    def ofPfx(entries: Seq[String], p: String) =
      entries.filter(_.endsWith(s"_pfx=$p")).toSet
    assert(ofPfx(before, "0").size == 2 && ofPfx(before, "1").size == 2)
    assert(ofPfx(before, "2").size == 1 && ofPfx(before, "3").size == 1)

    IndexStore.compact(spark, path, pfx,
      _.groupBy(col("gh")).agg(min(col("min_doc")).as("min_doc")), parts = 8)
    val after = IndexStore.liveEntries(spark, path)
    // untouched partitions keep their ORIGINAL leaf directories —
    // compaction never read or rewrote them
    assert(ofPfx(after, "2") == ofPfx(before, "2"))
    assert(ofPfx(after, "3") == ofPfx(before, "3"))
    // dirty partitions collapsed to fresh single leaves
    assert(ofPfx(after, "0").size == 1 && (ofPfx(after, "0") & ofPfx(before, "0")).isEmpty)
    assert(ofPfx(after, "1").size == 1 && (ofPfx(after, "1") & ofPfx(before, "1")).isEmpty)
    // content: global per-gram minima over both shards, one row per gh
    val got = IndexStore.read(spark, path)
    val want = s1.union(s2).groupBy(col("gh")).agg(min(col("min_doc")).as("min_doc"))
    assert(rows(got) == rows(want))
    assert(got.count() == got.select("gh").distinct().count())
  }

  test("an append landing MID-compaction is carried forward, not lost") {
    val path = tmp()
    val s1 = (0L until 8L).map(g => (g, 100L + g)).toDF("gh", "min_doc")
    val s2 = (0L until 8L).map(g => (g, 200L + g)).toDF("gh", "min_doc")
    val late = Seq((0L, 50L), (99L, 51L)).toDF("gh", "min_doc")
    IndexStore.append(s1, path, pfx)
    IndexStore.append(s2, path, pfx)
    // the transform hook runs after compaction snapshots its victims
    // and before its manifest commit — exactly the window the old
    // rename-swap maintenance lost appends in
    IndexStore.compact(spark, path, pfx, { df =>
      IndexStore.append(late, path, pfx, Some("late"))
      df.groupBy(col("gh")).agg(min(col("min_doc")).as("min_doc"))
    }, parts = 4)
    val got = IndexStore.read(spark, path)
    // the late append survives un-compacted; the victims folded
    val want = s1.union(s2).groupBy(col("gh")).agg(min(col("min_doc")).as("min_doc"))
      .union(late)
    assert(rows(got) == rows(want))
    assert(IndexStore.hasTag(spark, path, "late"))
  }

  test("a crashed compaction (or append) leaves the manifest pointing at the old files") {
    val path = tmp()
    val s1 = (0L until 8L).map(g => (g, 100L + g)).toDF("gh", "min_doc")
    IndexStore.append(s1, path, pfx)
    val before = rows(IndexStore.read(spark, path))
    val entriesBefore = IndexStore.liveEntries(spark, path)

    // a compaction that died after its data rewrite but before its
    // manifest commit = an orphan data directory
    Seq((0L, 1L)).toDF("gh", "min_doc")
      .withColumn("_pfx", pfx.cast("string"))
      .write.partitionBy("_pfx").parquet(s"$path/data-orphancrash")
    assert(rows(IndexStore.read(spark, path)) == before)
    assert(IndexStore.liveEntries(spark, path) == entriesBefore)

    // a committer that died mid-manifest-write = a version file with
    // no terminator: readers skip it, the next commit claims a
    // strictly higher version
    val burned = new java.io.FileOutputStream(s"$path/manifest/v00009999")
    burned.write("#graft-index-manifest 1\ne data-orphancrash/_pfx=0\n".getBytes("UTF-8"))
    burned.close()
    assert(rows(IndexStore.read(spark, path)) == before)
    val s2 = Seq((1L, 7L)).toDF("gh", "min_doc")
    IndexStore.append(s2, path, pfx)
    assert(rows(IndexStore.read(spark, path)) == before ++ rows(s2))
    assert(new java.io.File(s"$path/manifest").list()
      .exists(_ > "v00009999"), "the next commit claims a version above the burned one")

    // vacuum reclaims the orphan, never the live leaves
    IndexStore.vacuum(spark, path)
    assert(!new java.io.File(s"$path/data-orphancrash").exists())
    assert(rows(IndexStore.read(spark, path)) == before ++ rows(s2))
  }

  test("concurrent tagged appenders racing a compactor: no lost rows, no lost tags, reads stay serveable") {
    val path = tmp()
    IndexStore.init(spark, path,
      Seq((0L, 0L)).toDF("gh", "min_doc").schema)
    val nWriters = 4
    val shardsPer = 3
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val writers = (0 until nWriters).map { w =>
      new Thread(() => {
        try {
          (0 until shardsPer).foreach { s =>
            val shard = (0L until 8L)
              .map(g => (g, (w * 100 + s * 10) + g)).toDF("gh", "min_doc")
            // replay every append once — exactly-once must hold under
            // interleaving with OTHER writers' commits in between
            assert(IndexStore.append(shard, path, pfx, Some(s"w$w-s$s")))
            assert(!IndexStore.append(shard, path, pfx, Some(s"w$w-s$s")))
          }
        } catch { case t: Throwable => errors.add(t) }
      })
    }
    val compactor = new Thread(() => {
      try {
        (0 until 3).foreach { _ =>
          IndexStore.compact(spark, path, pfx,
            _.groupBy(col("gh")).agg(min(col("min_doc")).as("min_doc")), parts = 4)
          // the index must be READABLE at every instant of maintenance
          IndexStore.read(spark, path).count()
        }
      } catch { case t: Throwable => errors.add(t) }
    })
    (writers :+ compactor).foreach(_.start())
    (writers :+ compactor).foreach(_.join(120000))
    // a hung thread must fail HERE with a timeout diagnosis, not as a
    // confusing downstream tag/content assertion
    (writers :+ compactor).foreach(t =>
      assert(!t.isAlive, s"thread ${t.getName} timed out after 120s"))
    assert(errors.isEmpty, s"concurrent writer/compactor failed: ${errors.peek()}")
    // every tag recorded exactly once; content = the global fold of
    // every shard ever appended (fold at read time absorbs whatever
    // compaction state the race ended in)
    for (w <- 0 until nWriters; s <- 0 until shardsPer)
      assert(IndexStore.hasTag(spark, path, s"w$w-s$s"))
    val got = IndexStore.read(spark, path)
      .groupBy(col("gh")).agg(min(col("min_doc")).as("min_doc"))
    val want = (0L until 8L).map(g => (g, g)).toDF("gh", "min_doc") // w=0,s=0 minima
    assert(rows(got) == rows(want))
  }

  test("stats track fragmentation across appends and reset after compaction") {
    val path = tmp()
    assert(IndexStore.stats(spark, path).isEmpty, "fresh path has no stats")
    val s1 = (0L until 16L).map(g => (g, 100L + g)).toDF("gh", "min_doc")
    val s2 = Seq((0L, 90L), (1L, 91L)).toDF("gh", "min_doc") // prefixes 0,1 only
    IndexStore.append(s1, path, pfx, Some("t1"))
    val one = IndexStore.stats(spark, path).get
    assert(one.nPrefixes == 4 && one.nDirtyPrefixes == 0 &&
      one.maxLeavesPerPrefix == 1 && one.nTags == 1 && one.dirtyFraction == 0.0)
    IndexStore.append(s2, path, pfx, Some("t2"))
    val two = IndexStore.stats(spark, path).get
    assert(two.nDataLeaves == 6 && two.nDirtyPrefixes == 2 &&
      two.maxLeavesPerPrefix == 2 && two.dirtyFraction == 0.5 && two.nTags == 2)
    IndexStore.compact(spark, path, pfx,
      _.groupBy(col("gh")).agg(min(col("min_doc")).as("min_doc")), parts = 4)
    val post = IndexStore.stats(spark, path).get
    assert(post.nDirtyPrefixes == 0 && post.maxLeavesPerPrefix == 1 &&
      post.nTags == 2, "compaction defragments but keeps the tag history")
  }

  test("tag retirement: the manifest stays bounded, replays still skip at every window position") {
    val path = tmp()
    val keep = 4
    // 20 micro-batches at streaming cadence, two sink suffixes per
    // batch (the AnnIndex shape) — without retirement that is 40 tag
    // lines and counting
    (0 until 20).foreach { b =>
      val shard = Seq((b.toLong, 100L + b)).toDF("gh", "min_doc")
      assert(IndexStore.append(shard, path, pfx, Some(s"$b:codes")))
      assert(IndexStore.append(shard, path, pfx, Some(s"$b:buckets")))
    }
    IndexStore.retireTags(spark, path, keepLast = keep)
    val st = IndexStore.stats(spark, path).get
    // per suffix: heads ≤ 19-4=15 retired → verbatim tags 16..19 only
    assert(st.nTags == 2 * keep, s"expected ${2 * keep} verbatim tags, got ${st.nTags}")
    assert(st.nTagMarks == 2)
    // the manifest FILE is bounded: entries + retained tags + 2 marks
    val manifest = new java.io.File(s"$path/manifest").listFiles().map(_.getName).max
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(s"$path/manifest/$manifest")).size()
    assert(lines <= st.nDataLeaves + st.nAnchors + st.nTags + st.nTagMarks + 2,
      s"manifest has $lines lines")

    // an IN-window replay skips via its verbatim tag
    val before = rows(IndexStore.read(spark, path))
    assert(!IndexStore.append(Seq((99L, 1L)).toDF("gh", "min_doc"), path, pfx, Some("18:codes")))
    // an OUT-of-window replay of a retired batchId skips via the watermark
    assert(!IndexStore.append(Seq((99L, 1L)).toDF("gh", "min_doc"), path, pfx, Some("3:buckets")))
    assert(IndexStore.hasTag(spark, path, "3:buckets") && IndexStore.hasTag(spark, path, "18:codes"))
    assert(rows(IndexStore.read(spark, path)) == before, "replays must mutate nothing")
    // a genuinely NEW batch above the window still commits
    assert(IndexStore.append(Seq((77L, 7L)).toDF("gh", "min_doc"), path, pfx, Some("20:codes")))

    // non-numeric tags never retire
    assert(IndexStore.append(Seq((78L, 8L)).toDF("gh", "min_doc"), path, pfx, Some("manual-backfill")))
    IndexStore.retireTags(spark, path, keepLast = 0)
    assert(IndexStore.hasTag(spark, path, "manual-backfill"))
    // keepLast=0 retires everything numeric; watermark still covers them
    assert(!IndexStore.append(Seq((99L, 1L)).toDF("gh", "min_doc"), path, pfx, Some("20:codes")))
    assert(IndexStore.stats(spark, path).get.nTags == 1)

    // compaction runs the checkpoint as part of maintenance
    val path2 = tmp()
    (0 until 10).foreach { b =>
      IndexStore.append(Seq((b.toLong % 4, b.toLong)).toDF("gh", "min_doc"),
        path2, pfx, Some(b.toString))
    }
    IndexStore.compact(spark, path2, pfx,
      _.groupBy(col("gh")).agg(min(col("min_doc")).as("min_doc")),
      parts = 4, tagRetention = 2)
    val st2 = IndexStore.stats(spark, path2).get
    assert(st2.nTags == 2 && st2.nTagMarks == 1)
    assert(IndexStore.hasTag(spark, path2, "0") && IndexStore.hasTag(spark, path2, "9"))
  }

  test("NULL layout keys land in the default partition and survive round trips") {
    val path = tmp()
    val s = Seq((Some("ab12"), 1L), (None, 2L), (None, 3L))
      .toDF("digest", "min_doc")
    val dpfx = substring(col("digest"), 1, 1)
    IndexStore.append(s, path, dpfx)
    assert(rows(IndexStore.read(spark, path)) == rows(s))
    IndexStore.append(s.withColumn("min_doc", col("min_doc") + 10), path, dpfx)
    IndexStore.compact(spark, path, dpfx,
      _.groupBy(col("digest")).agg(min(col("min_doc")).as("min_doc")), parts = 4)
    val want = s.union(s.withColumn("min_doc", col("min_doc") + 10))
      .groupBy(col("digest")).agg(min(col("min_doc")).as("min_doc"))
    assert(rows(IndexStore.read(spark, path)) == rows(want))
  }

  test("a barrier-deferred append never changes an already-pinned read " +
      "(the ingest pipeline's manifest-snapshot contract)") {
    // the AppendBarrier safety argument, pinned as a spec instead of a
    // comment: IndexStore.read resolves the manifest snapshot AT CALL
    // TIME, so an append that lands afterwards — even before the read's
    // plan ever executes — cannot leak into it; a FRESH read sees it.
    // Per-path awaits (awaitFor) join only that path's appends.
    val path = tmp()
    val other = tmp()
    IndexStore.append(Seq((1L, 10L)).toDF("gh", "min_doc"), path, pfx)
    IndexStore.init(spark, other,
      Seq((0L, 0L)).toDF("gh", "min_doc").schema)
    val pinned = IndexStore.read(spark, path) // snapshot taken HERE
    val barrier = new AppendBarrier
    val started = new java.util.concurrent.CountDownLatch(1)
    barrier.submitFor(path) {
      started.await()
      IndexStore.append(Seq((2L, 20L)).toDF("gh", "min_doc"), path, pfx)
    }
    barrier.submitFor(other) {
      IndexStore.append(Seq((3L, 30L)).toDF("gh", "min_doc"), other, pfx)
    }
    // awaitFor joins ONLY the named path's appends: `other` completes
    // here while `path`'s append is still gated on the latch
    barrier.awaitFor(other)
    assert(rows(IndexStore.read(spark, other)).contains(Seq(3L, 30L)))
    started.countDown()
    barrier.await()
    // the pinned read still serves the pre-append snapshot — executed
    // only now, AFTER the append committed
    assert(rows(pinned) == Set(Seq(1L, 10L)))
    // a fresh read (the next shard's stage) sees the appended state
    assert(rows(IndexStore.read(spark, path)) == Set(Seq(1L, 10L), Seq(2L, 20L)))
  }
}
