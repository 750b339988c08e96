package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Interval-overlap join on hand-computed fixtures — inclusive ends,
  * multi-bucket spans deduped, equi keys compose — plus the plan
  * claims: no BroadcastNestedLoopJoin/CartesianProduct (the raw
  * inequality predicate would be one), candidates only via the
  * bucket hash join.
  */
class IntervalJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def a = Seq(
    (1, 0L, 15L),    // spans buckets 0 and 1 at width 10
    (2, 20L, 25L),
    (3, 40L, 41L))
    .toDF("aid", "s_start", "s_end")

  private def b = Seq(
    (10, 14L, 22L),  // overlaps intervals 1 and 2
    (11, 25L, 30L),  // touches interval 2 at its end (inclusive)
    (12, 16L, 19L),  // between 1 and 2 — no overlap
    (13, 60L, 70L))
    .toDF("bid", "w_start", "w_end")

  test("overlap pairs are exact, inclusive, and deduped across buckets") {
    val r = IntervalJoin.overlapJoin(a, b, "s_start", "s_end", "w_start", "w_end",
      bucket = 10L)
      .select("aid", "bid").orderBy("aid", "bid").collect()
      .map(x => (x.getInt(0), x.getInt(1)))
    assert(r.toSeq == Seq((1, 10), (2, 10), (2, 11)))
  }

  test("equi keys restrict the candidates") {
    val ak = a.withColumn("g", org.apache.spark.sql.functions.lit("x"))
    val bk = b.withColumn("g", org.apache.spark.sql.functions
      .when($"bid" === 10, "x").otherwise("y"))
    val r = IntervalJoin.overlapJoin(ak, bk, "s_start", "s_end", "w_start", "w_end",
      keys = Seq("g"), bucket = 10L)
      .select("aid", "bid").orderBy("aid", "bid").collect()
      .map(x => (x.getInt(0), x.getInt(1)))
    assert(r.toSeq == Seq((1, 10), (2, 10))) // (2, 11) now keyed apart
  }

  test("bucket width does not change the result, only the plan") {
    for (w <- Seq(1L, 3L, 100L)) {
      val r = IntervalJoin.overlapJoin(a, b, "s_start", "s_end", "w_start", "w_end",
        bucket = w).select("aid", "bid").orderBy("aid", "bid").collect()
        .map(x => (x.getInt(0), x.getInt(1)))
      assert(r.toSeq == Seq((1, 10), (2, 10), (2, 11)), s"bucket=$w")
    }
  }

  test("duplicate input rows keep their join multiplicity") {
    // IEJoin emits one output row per duplicate input pair; a distinct
    // over all columns would collapse them along with the bucket
    // replicas — the row-id dedup must collapse ONLY the replicas
    val aDup = a.union(a.where($"aid" === 1)) // interval 1 twice
    val r = IntervalJoin.overlapJoin(aDup, b, "s_start", "s_end", "w_start", "w_end",
      bucket = 10L)
      .select("aid", "bid").orderBy("aid", "bid").collect()
      .map(x => (x.getInt(0), x.getInt(1)))
    assert(r.toSeq == Seq((1, 10), (1, 10), (2, 10), (2, 11)))
  }

  test("non-orderable payload columns (MAP) survive the dedup") {
    val aMap = a.withColumn("meta",
      org.apache.spark.sql.functions.map(
        org.apache.spark.sql.functions.lit("k"), $"aid"))
    val r = IntervalJoin.overlapJoin(aMap, b, "s_start", "s_end", "w_start", "w_end",
      bucket = 10L)
      .select("aid", "bid").orderBy("aid", "bid").collect()
      .map(x => (x.getInt(0), x.getInt(1)))
    assert(r.toSeq == Seq((1, 10), (2, 10), (2, 11)))
  }

  test("the plan is a hash join on buckets — no BNLJ/cartesian") {
    val plan = IntervalJoin.overlapJoin(a, b, "s_start", "s_end", "w_start", "w_end",
      bucket = 10L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("colliding non-key columns are rejected") {
    val bad = b.withColumnRenamed("bid", "aid")
    val e = intercept[IllegalArgumentException](
      IntervalJoin.overlapJoin(a, bad, "s_start", "s_end", "w_start", "w_end"))
    assert(e.getMessage.contains("aid"))
  }
}
