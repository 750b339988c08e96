package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode, GenerateExec, ExpandExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.catalyst.optimizer.BuildLeft

/** The scale plan gate: no CartesianProduct with a multi-row side, no
  * BroadcastNestedLoopJoin whose build side is not a provably-1-row
  * global aggregate. Shared by QueriesSmokeSpec (per-SF test gate) and
  * tools.SmokeGate (the detachable scale-run CLI) so the two cannot
  * drift.
  */
object PlanGate {

  /** True when the subtree's cardinality provably collapses to one
    * row: descending through cardinality-preserving unary nodes, the
    * first cardinality-defining node is a global (no grouping keys)
    * aggregate or a LIMIT ≤ 1. Generate/Expand multiply rows → not
    * one-row.
    */
  def oneRowSubtree(p: SparkPlan): Boolean = p match {
    case a: BaseAggregateExec => a.groupingExpressions.isEmpty
    case l: org.apache.spark.sql.execution.GlobalLimitExec => l.limit <= 1
    case l: org.apache.spark.sql.execution.LocalTableScanExec => l.rows.length <= 1
    case r: ReusedExchangeExec => oneRowSubtree(r.child)
    case _: GenerateExec | _: ExpandExec => false
    case u: UnaryExecNode => oneRowSubtree(u.child)
    case _ => false
  }

  /** Violation messages for `df`'s executed plan (empty = gate holds). */
  def violations(df: DataFrame): Seq[String] = {
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val cart = plan.collectWithSubqueries { case c: CartesianProductExec => c }
      .filterNot(c => oneRowSubtree(c.left) && oneRowSubtree(c.right))
      .map(c => s"CartesianProduct with a multi-row side:\n${c.toString.take(2000)}")
    val bnlj = plan.collectWithSubqueries { case j: BroadcastNestedLoopJoinExec => j }
      .filterNot { j =>
        oneRowSubtree(if (j.buildSide == BuildLeft) j.left else j.right)
      }
      .map(j => s"BroadcastNestedLoopJoin build side not a 1-row global aggregate:\n${j.toString.take(2000)}")
    cart ++ bnlj
  }

  /** Queries whose plan legitimately contains a DELIBERATE broadcast
    * linear scan with a bounded multi-row build side (brute-force ANN
    * baseline, centroid assignment against a broadcast centroid set).
    */
  val intentionalLinearScan: Set[String] = Set(
    "ann_bruteforce_topk",     // exact baseline: broadcast queries × corpus scan
    "ann_ivf_topk",            // corpus × broadcast centroid set (k rows)
    "ann_ivf_train_centroids", // same, inside the trainer
    "mine_hard_negatives",     // broadcast query batch × corpus scan (exact mining)
    "report_knn_purity",       // broadcast probe sample × corpus scan (exact kNN)
    "report_ann_recall",       // IVF + exact baseline over the broadcast query set
    "report_ann_recall_arms")  // every serving arm + the same exact baseline
}
