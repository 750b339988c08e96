package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every declared query runs end-to-end at sf0.001 and the
  * flagship entry returns rows. Oracle hash-parity is checked by the
  * driver (and locally via tools/check_oracle.py) at sf0.01.
  */
class QueriesSmokeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
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

  /** Queries whose plan legitimately contains an unconditioned join:
    * deliberate broadcast linear scans (brute-force ANN, centroid
    * assignment against a broadcast centroid set) and crossJoins of
    * single-row aggregates.
    */
  private val intentionalCross = Set(
    "ann_bruteforce_topk", // exact baseline: broadcast queries × corpus scan
    "ann_ivf_topk",        // corpus × broadcast centroid set (k rows)
    "ann_ivf_train_centroids", // same, inside the trainer
    "dedup_exact_stats",   // crossJoin of two 1-row aggregate results
    "text_tfidf_topk",     // corpus-size N attaches as a 1-row broadcast crossJoin
    "text_lm_perplexity",  // corpus totals attach as a 1-row broadcast crossJoin
    "text_bigram_perplexity", // same 1-row totals crossJoin
    "text_dsir_weights",   // corpus totals attach as a 1-row broadcast crossJoin
    "sample_dsir_resample") // same chain + Gumbel top-k tail

  test("no query accidentally plans a cartesian or nested-loop join") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!intentionalCross(name)) {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct"),
          s"$name plans a CartesianProduct:\n${plan.take(2000)}")
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a BroadcastNestedLoopJoin:\n${plan.take(2000)}")
      }
    }
  }
}
