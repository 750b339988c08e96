package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every declared query runs end-to-end at sf0.001 and the
  * flagship entry returns rows. Oracle hash-parity is checked by the
  * driver (and locally via tools/check_oracle.py) at sf0.01.
  */
class QueriesSmokeSpec extends AnyFunSuite {

  // scale runs (sf1/sf10 smoke dirs) override the default 4-way local
  // parallelism — the plan gates are identical, only wall-clock changes
  private val cpus = sys.env.getOrElse("SPARK_GRAFT_SMOKE_CPUS", "4")

  lazy val spark: SparkSession = SparkSession.builder()
    .master(s"local[$cpus]")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  // SPARK_GRAFT_SMOKE_DIR overrides for scale runs (e.g. the sf1 dir
  // synthesized by tools/ScaleUp) — gates must hold at every SF
  private val dir = sys.env.getOrElse("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs") {
      val df = fn(spark, dir)
      assert(df.count() >= 0)
    }
  }

  test("every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  // The gate itself lives in graft.plans.PlanGate (shared with the
  // detachable tools.SmokeGate CLI used for the sf10 scale run, so
  // the test gate and the scale gate cannot drift): no
  // CartesianProduct with a multi-row side, no BroadcastNestedLoopJoin
  // whose build side is not a provably-1-row global aggregate —
  // a regression can't hide behind a blanket exemption.
  test("no query accidentally plans a cartesian or nested-loop join") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!graft.plans.PlanGate.intentionalLinearScan(name)) {
        val bad = graft.plans.PlanGate.violations(fn(spark, dir))
        assert(bad.isEmpty, s"$name: ${bad.mkString("\n")}")
      }
    }
  }
}
