package graft.runtime

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.compile.PipelineCompiler.PipelineNode
import graft.ingest.{Ingest, OvertureFixtures}
import graft.session.{LoadHistory, SessionState}

class RuntimeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val dir = java.nio.file.Files.createTempDirectory("graft_rt").toString
    OvertureFixtures.write(s, dir, n = 60, files = 2)
    Ingest.loadTheme(s, dir, "places/place")
    s
  }

  test("session state round-trips, upserts, deletes, survives reload") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sess").toString
    val st = new SessionState(spark, dir)
    st.set("pipeline", """[{"id":"p1"}]""")
    st.set("pipelineSearch", "cafe")
    st.set("pipelineSearch", "bar") // upsert
    st.set("bad", "not valid json{{{")
    assert(st.get("pipelineSearch").contains("bar"))
    st.delete("pipeline")
    assert(st.get("pipeline").isEmpty)

    st.sync() // flush the debounced buffer before handing the dir over
    val st2 = new SessionState(spark, dir) // fresh load from disk
    assert(st2.get("pipelineSearch").contains("bar"))
    // corrupt entries skipped by parsed load
    val parsed = st2.loadParsed { v => if (v.contains("{{{")) throw new Exception("bad") else v }
    assert(!parsed.contains("bad") && parsed.contains("pipelineSearch"))
  }

  test("session state debounces: burst of sets → one deferred flush, sync forces it") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sess_db").toString
    val st = new SessionState(spark, dir)
    (1 to 5).foreach(i => st.set(s"k$i", s"v$i"))
    // nothing on disk yet — mutations buffer for the debounce window
    assert(new SessionState(spark, dir).all.isEmpty)
    st.sync()
    assert(new SessionState(spark, dir).all.size == 5)
    // the deferred flush also lands on its own after the window
    st.set("late", "x")
    Thread.sleep(SessionState.DebounceMs + 300)
    assert(new SessionState(spark, dir).all.size == 6)
  }

  test("load history appends with timestamps") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hist").toString
    LoadHistory.append(spark, dir, LoadHistory.Entry(
      "places/place", "local", "[-2,-1,2,1]", 33000, cached = false, 60, 2, 123))
    LoadHistory.append(spark, dir, LoadHistory.Entry(
      "buildings/building", "local", "", 33000, cached = true, 10, 2, 45))
    val df = LoadHistory.read(spark, dir)
    assert(df.count() == 2)
    assert(df.columns.contains("ts"))
  }

  test("query runner records ring with preview, duration, errors") {
    val r = new QueryRunner
    val out = r.run("q1", "SELECT 1")(42)
    assert(out == 42)
    intercept[RuntimeException] {
      r.run("q2", "SELECT broken FROM nowhere " + "x" * 300)(throw new RuntimeException("boom"))
    }
    val h = r.history
    assert(h.length == 2)
    assert(h.head.label == "q2" && !h.head.ok && h.head.error.contains("boom"))
    assert(h.head.sqlPreview.length <= 140)
    assert(h(1).ok && h(1).durationMs >= 0)
    assert(r.formatDuration(900) == "900ms")
    assert(r.formatDuration(2340) == "2.3s")
  }

  test("pipeline session: debounced reactive execution + memoization") {
    var runs = 0
    val sess = new PipelineSession(spark, debounceMs = 50,
      onResult = (_, _) => runs += 1)
    val src = PipelineNode("p1", "source", "", "places_place", "places/place")
    // rapid-fire updates collapse into one run
    sess.update(nodes = Seq(src), limit = 10)
    sess.update(nodes = Seq(src), limit = 20)
    sess.update(nodes = Seq(src), limit = 30)
    Thread.sleep(1500)
    assert(runs == 1, s"expected 1 debounced run, got $runs")
    // identical signature → memoized, no second run
    val df = sess.executeNow()
    assert(df.isDefined && runs == 1)
    // changed signature → new run
    sess.update(search = "cafe")
    Thread.sleep(1500)
    assert(runs == 2)
    sess.close()
  }

  test("pipeline session: concurrent update/executeNow never caches a stale result") {
    val sess = new PipelineSession(spark, debounceMs = 5)
    val src = PipelineNode("p1", "source", "", "places_place", "places/place")
    val errors = new java.util.concurrent.atomic.AtomicInteger(0)
    val t = new Thread(() => {
      var i = 0
      while (i < 40) {
        try sess.update(nodes = Seq(src),
          sqlOverride = Some(s"SELECT ${i % 7} AS v FROM places_place LIMIT 1"))
        catch { case _: Throwable => errors.incrementAndGet() }
        i += 1
      }
    })
    t.start()
    (0 until 40).foreach { _ =>
      try sess.executeNow() catch { case _: Throwable => errors.incrementAndGet() }
    }
    t.join()
    Thread.sleep(300)
    assert(errors.get() == 0)
    // quiesced: a final executeNow must reflect the FINAL override, not
    // any result cached under a stale signature mid-race
    sess.update(nodes = Seq(src), sqlOverride = Some("SELECT 99 AS v FROM places_place LIMIT 1"))
    val v = sess.executeNow().get.head().getInt(0)
    assert(v == 99, s"stale cached result surfaced: v=$v")
    sess.close()
  }

  test("pipeline session: sqlOverride replaces compiled SQL") {
    val sess = new PipelineSession(spark, debounceMs = 10)
    sess.update(
      nodes = Seq(PipelineNode("p1", "source", "", "places_place", "places/place")),
      sqlOverride = Some("SELECT COUNT(*) AS n FROM places_place"))
    val df = sess.executeNow()
    assert(df.get.columns.sameElements(Array("n")))
    sess.close()
  }
}
