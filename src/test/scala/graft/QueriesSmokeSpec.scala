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

  /** Queries whose plan legitimately contains a DELIBERATE broadcast
    * linear scan with a bounded multi-row build side (brute-force ANN
    * baseline, centroid assignment against a broadcast centroid set).
    * Everything else is held to: no CartesianProduct ever, and a
    * BroadcastNestedLoopJoin only when its build side reduces to a
    * single-row global aggregate (the "attach corpus totals" shape) —
    * so a regression in those queries can't hide behind a blanket
    * exemption.
    */
  private val intentionalLinearScan = Set(
    "ann_bruteforce_topk",     // exact baseline: broadcast queries × corpus scan
    "ann_ivf_topk",            // corpus × broadcast centroid set (k rows)
    "ann_ivf_train_centroids") // same, inside the trainer

  import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode, GenerateExec, ExpandExec}
  import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
  import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
  import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
  import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
  import org.apache.spark.sql.catalyst.optimizer.BuildLeft

  /** True when the subtree's cardinality provably collapses to one
    * row: descending through cardinality-preserving unary nodes, the
    * first cardinality-defining node is a global (no grouping keys)
    * aggregate. Generate/Expand multiply rows → not one-row.
    */
  private def oneRowSubtree(p: SparkPlan): Boolean = p match {
    case a: BaseAggregateExec => a.groupingExpressions.isEmpty
    case r: ReusedExchangeExec => oneRowSubtree(r.child)
    case _: GenerateExec | _: ExpandExec => false
    case u: UnaryExecNode => oneRowSubtree(u.child)
    case _ => false
  }

  test("no query accidentally plans a cartesian or nested-loop join") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!intentionalLinearScan(name)) {
        val root = fn(spark, dir).queryExecution.executedPlan
        val plan = root match {
          case a: AdaptiveSparkPlanExec => a.executedPlan
          case p => p
        }
        // a cartesian of two provably-1-row subtrees is a scalar
        // attach (the "corpus totals × fingerprint totals" shape),
        // not a scale risk; anything wider fails
        plan.collectWithSubqueries { case c: CartesianProductExec => c }
          .foreach { c =>
            assert(oneRowSubtree(c.left) && oneRowSubtree(c.right),
              s"$name plans a CartesianProduct with a multi-row side:\n" +
                c.toString.take(2000))
          }
        plan.collectWithSubqueries { case j: BroadcastNestedLoopJoinExec => j }
          .foreach { j =>
            val build = if (j.buildSide == BuildLeft) j.left else j.right
            assert(oneRowSubtree(build),
              s"$name plans a BroadcastNestedLoopJoin whose build side is " +
                s"not a 1-row global aggregate:\n${j.toString.take(2000)}")
          }
      }
    }
  }
}
