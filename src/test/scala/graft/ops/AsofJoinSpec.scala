package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** As-of join semantics on hand-computed fixtures (backward/forward,
  * inclusive equal timestamps, tolerance, inner vs outer), plus the
  * plan-shape claim: the union + tagged-sort + running-last rewrite
  * must contain NO join node — that is the whole point of the design.
  */
class AsofJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def events = Seq(
    // (key, event time, label)
    (1, 5L, "e1"), (1, 9L, "e2"), (1, 2L, "e0"), (2, 4L, "f1"), (3, 7L, "g1"))
    .toDF("k", "t", "ev")

  private def quotes = Seq(
    // (key, quote time, value) — key 3 has no quote at-or-before 7
    (1, 3L, "a"), (1, 7L, "b"), (2, 4L, "c"), (3, 9L, "d"))
    .toDF("k", "qt", "v")

  test("backward asof picks the latest right row at-or-before, per key") {
    val r = AsofJoin.asof(events, quotes, Seq("k"), "t", "qt")
      .orderBy("k", "t").collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getString(2), x.getLong(3), x.getString(4)))
    assert(r.toSeq == Seq(
      (1, 5L, "e1", 3L, "a"),   // 5 >= 3, not yet 7
      (1, 9L, "e2", 7L, "b"),   // latest of {3, 7}
      (2, 4L, "f1", 4L, "c")))  // equal timestamps match (inclusive)
    // inner: (1, 2, e0) has no quote <= 2; key 3's only quote is later
  }

  test("outer keeps unmatched left rows with NULL right payload") {
    val r = AsofJoin.asof(events, quotes, Seq("k"), "t", "qt", inner = false)
      .orderBy("k", "t").collect()
    assert(r.length == 5)
    val unmatched = r.filter(_.isNullAt(4)).map(x => (x.getInt(0), x.getLong(1))).toSeq
    assert(unmatched == Seq((1, 2L), (3, 7L)))
  }

  test("forward asof picks the earliest right row at-or-after") {
    val r = AsofJoin.asof(events, quotes, Seq("k"), "t", "qt", forward = true)
      .orderBy("k", "t").collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getLong(3), x.getString(4)))
    assert(r.toSeq == Seq(
      (1, 2L, 3L, "a"), (1, 5L, 7L, "b"),
      (2, 4L, 4L, "c"),           // inclusive
      (3, 7L, 9L, "d")))          // (1, 9) has nothing later -> dropped
  }

  test("tolerance bounds the gap") {
    val r = AsofJoin.asof(events, quotes, Seq("k"), "t", "qt",
      tolerance = Some(lit(2L)))
      .orderBy("k", "t").collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getLong(3)))
    // (1, 5) -> quote 3 gap 2 kept; (1, 9) -> quote 7 gap 2 kept;
    // (2, 4) gap 0
    assert(r.toSeq == Seq((1, 5L, 3L), (1, 9L, 7L), (2, 4L, 4L)))
    val tight = AsofJoin.asof(events, quotes, Seq("k"), "t", "qt",
      tolerance = Some(lit(1L))).collect()
    assert(tight.map(_.getLong(1)).toSeq.sorted == Seq(4L)) // only the gap-0 row
  }

  test("NULL keys and NULL right timestamps never match (equi semantics)") {
    val lNull = Seq((Option(1), 5L, "e1"), (Option.empty[Int], 5L, "eN"))
      .toDF("k", "t", "ev")
    val rNull = Seq((Option(1), Option(3L), "a"),
      (Option.empty[Int], Option(1L), "nullkey"),
      (Option(1), Option.empty[Long], "nullts"))
      .toDF("k", "qt", "v")
    val inner = AsofJoin.asof(lNull, rNull, Seq("k"), "t", "qt").collect()
    assert(inner.map(x => (x.getInt(0), x.getString(4))).toSeq == Seq((1, "a")))
    val outer = AsofJoin.asof(lNull, rNull, Seq("k"), "t", "qt", inner = false)
      .collect()
    assert(outer.length == 2)
    assert(outer.count(_.isNullAt(4)) == 1) // the NULL-key left row, unmatched
  }

  test("NULL left probe timestamps never match, in either direction") {
    val lNull = Seq((Option(1), Option(5L), "e1"), (Option(1), Option.empty[Long], "eN"))
      .toDF("k", "t", "ev")
    val rOk = Seq((1, 3L, "a"), (1, 9L, "b")).toDF("k", "qt", "v")
    // forward: desc ordering must put NULL __t FIRST — with Spark's
    // default nulls-last the NULL probe row would sort after every
    // right row and inherit the partition's running last() match
    val fwd = AsofJoin.asof(lNull, rOk, Seq("k"), "t", "qt", forward = true)
      .collect()
    assert(fwd.map(x => (x.getLong(1), x.getString(4))).toSeq == Seq((5L, "b")))
    val bwd = AsofJoin.asof(lNull, rOk, Seq("k"), "t", "qt").collect()
    assert(bwd.map(x => (x.getLong(1), x.getString(4))).toSeq == Seq((5L, "a")))
    // outer keeps the NULL-timestamp row, unmatched
    val outer = AsofJoin.asof(lNull, rOk, Seq("k"), "t", "qt",
      forward = true, inner = false).collect()
    assert(outer.length == 2)
    assert(outer.filter(_.isNullAt(1)).forall(_.isNullAt(4)))
  }

  test("duplicate-name collision outside keys is rejected") {
    val bad = quotes.withColumnRenamed("v", "ev")
    val e = intercept[IllegalArgumentException](
      AsofJoin.asof(events, bad, Seq("k"), "t", "qt"))
    assert(e.getMessage.contains("ev"))
  }

  test("randomized trials agree with a brute-force reference") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 5) {
      val nl = 5 + rnd.nextInt(30)
      val nr = 3 + rnd.nextInt(20)
      val lrows = (0 until nl).map(i => (rnd.nextInt(4), rnd.nextInt(40).toLong, i))
      val rrows = (0 until nr).map(i => (rnd.nextInt(4), rnd.nextInt(40).toLong, i))
        // contract: unique (key, ts) on the right — ties are arbitrary
        .groupBy(t => (t._1, t._2)).map(_._2.head).toSeq
      val forward = rnd.nextBoolean()
      val l = lrows.toDF("k", "t", "lid")
      val r = rrows.toDF("k", "qt", "rid")
      val got = AsofJoin.asof(l, r, Seq("k"), "t", "qt", forward = forward)
        .select("lid", "rid").collect().map(x => (x.getInt(0), x.getInt(1)))
        .toSeq.sorted
      val expected = lrows.flatMap { case (k, t, lid) =>
        val cands =
          if (forward) rrows.filter(rr => rr._1 == k && rr._2 >= t)
          else rrows.filter(rr => rr._1 == k && rr._2 <= t)
        if (cands.isEmpty) None
        else {
          val best = if (forward) cands.minBy(_._2) else cands.maxBy(_._2)
          Some((lid, best._3))
        }
      }.sorted
      assert(got == expected, s"trial $trial forward=$forward: $lrows vs $rrows")
    }
  }

  test("the plan has no join node and one shuffle of the union") {
    val df = AsofJoin.asof(events, quotes, Seq("k"), "t", "qt")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join in:\n$plan")
    assert(plan.contains("Window"), "expected the running-last window")
  }
}
