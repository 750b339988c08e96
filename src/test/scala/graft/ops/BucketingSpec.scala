package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Proves the bucketing contract at the plan level: a join of two
  * tables bucketed on the join key runs with ZERO shuffle exchanges.
  */
class BucketingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  /** Disable broadcast within a block only — builder-time configs leak
    * into the JVM-shared session and would poison other suites' plans.
    */
  private def withNoBroadcast[T](f: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed fact-fact join plans with no shuffle exchange") {
    graft.core.Tables.registerAll(spark, dir)
    withNoBroadcast {
    Bucketing.writeBucketed(spark.table("lineitem"), "li_bkt", Seq("l_orderkey"), 4,
      sortCols = Seq("l_orderkey"))
    Bucketing.writeBucketed(spark.table("orders"), "ord_bkt", Seq("o_orderkey"), 4,
      sortCols = Seq("o_orderkey"))

    val joined = spark.table("li_bkt")
      .join(spark.table("ord_bkt"),
        spark.table("li_bkt")("l_orderkey") === spark.table("ord_bkt")("o_orderkey"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n${plan.take(1500)}")

    // and the result matches the unbucketed join
    val expected = spark.table("lineitem")
      .join(spark.table("orders"),
        spark.table("lineitem")("l_orderkey") === spark.table("orders")("o_orderkey"))
      .count()
    assert(joined.count() == expected)

    Bucketing.dropTable(spark, "li_bkt")
    Bucketing.dropTable(spark, "ord_bkt")
    }
  }

  test("colocate: repartitioned sides join correctly on the shared key") {
    graft.core.Tables.registerAll(spark, dir)
    val (li, ord) = Bucketing.colocate(
      spark.table("lineitem"), spark.table("orders").withColumnRenamed("o_orderkey", "l_orderkey"),
      "l_orderkey", 4)
    val j = li.join(ord, "l_orderkey")
    assert(j.count() == spark.table("lineitem").join(spark.table("orders"),
      spark.table("lineitem")("l_orderkey") === spark.table("orders")("o_orderkey")).count())
    assert(li.rdd.getNumPartitions == 4 && ord.rdd.getNumPartitions == 4)
  }
}
