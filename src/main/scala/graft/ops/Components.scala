package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair (edge) DataFrame — the transitive
  * closure step that turns pairwise near-duplicate DETECTION into
  * corpus-level duplicate CLUSTERS. Dropping only the `id_b` side of
  * each pair under-deletes (A~B, B~C leaves C) and over-deletes
  * (chains keep no canonical representative); a training-data dedup
  * wants one surviving document per component, which is exactly the
  * min-id label this computes.
  *
  * Algorithm: iterative min-label propagation with pointer jumping.
  * Each round every node takes the minimum label over itself and its
  * neighbors (one hop), then labels chase their own label's label
  * (path halving) — the combination converges in O(log n) rounds on
  * any graph (cf. the large-star/small-star MapReduce bound of
  * Kiveris et al., "Connected Components in MapReduce and Beyond"),
  * and in 2–3 rounds on the short-diameter clusters dedup pair sets
  * actually produce.
  *
  * 100 TB design: every round is two hash joins + a groupBy on the
  * node key — shuffle-partitioned by node id, no driver-side graph,
  * no pair enumeration beyond the input edges. Labels are
  * localCheckpoint'd each round so the loop's lineage stays flat
  * (iteration k would otherwise re-plan all k−1 predecessors), and
  * the convergence check rides the same materialization (a count per
  * round, not a second pass). A pathological hot node (one doc near-
  * equal to millions) concentrates its edges in one partition's
  * groupBy — the map-side partial min bounds that to one long per
  * partition, so the hot key reduces, not collects.
  */
object Components {

  /** (node, cluster) for every node appearing in `pairs`; `cluster`
    * is the component's minimum node id. Self-pairs are tolerated,
    * NULL endpoints are dropped (a NULL id can't name a document).
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 30): DataFrame = {
    val p = pairs.where(col(aCol).isNotNull && col(bCol).isNotNull)
    val edges = p.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(p.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint()

    // labels only ever DECREASE (both steps take a least()), so the
    // label sum is a strictly monotone convergence witness: equal sum
    // ⇔ fixpoint. The sum rides each round's checkpoint job as an
    // `observe()` metric (a CollectMetrics node the materialized rows
    // pass through anyway) — r15: the standalone per-round sum job the
    // r14 shape paid was pure job-floor latency, half the loop's
    // driver rounds. CollectMetrics accumulators can double-count rows
    // under task retries / speculative execution — exact in local mode
    // (the bench/oracle harness) and on clusters with speculation off;
    // a speculative cluster should disable speculation for this loop's
    // job group (the convergence test tolerates no perturbation).
    def observedSum(df: DataFrame, name: String): (DataFrame, org.apache.spark.sql.Observation) = {
      val obs = org.apache.spark.sql.Observation(name)
      (df.observe(obs, sum(col("lbl").cast("decimal(38,0)")).as("s")), obs)
    }
    // a plan the optimizer collapses to an empty relation loses its
    // CollectMetrics node (empty metrics map) — same meaning as a
    // NULL sum over zero rows
    def metricSum(obs: org.apache.spark.sql.Observation): java.math.BigDecimal =
      obs.get.get("s").map(_.asInstanceOf[java.math.BigDecimal]).orNull
    // round 1's hop over identity labels IS `min(self ∪ neighbors)` —
    // computable straight off the edge list, so the separate
    // identity-label init (a distinct + checkpoint + its own job in
    // the r14 shape) folds into the first round (r15). prevSum starts
    // null: an empty edge set converges on round 1 (null == null),
    // and any non-empty graph strictly decreases some label in round
    // 1, so a false round-1 convergence is impossible.
    var labels: DataFrame = null
    var prevSum: java.math.BigDecimal = null
    var iter      = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // min label over the 1-hop neighborhood (self included)
      val hop =
        if (labels == null)
          edges.groupBy("src")
            .agg(least(col("src"), min(col("dst"))).as("lbl"))
            .withColumnRenamed("src", "node")
        else {
          val nbrMin = edges
            .join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src").agg(min("lbl").as("nmin"))
            .withColumnRenamed("src", "node")
          labels.join(nbrMin, Seq("node"), "left")
            .select(col("node"),
              least(col("lbl"), coalesce(col("nmin"), col("lbl"))).as("lbl"))
        }
      // pointer jump: follow my label to ITS label (path halving) —
      // this is what turns O(diameter) propagation into O(log n)
      val (jumpObs, obs) = observedSum(hop.alias("x")
        .join(hop.select(col("node").as("lbl"), col("lbl").as("plbl")).alias("p"),
          Seq("lbl"), "left")
        .select(col("node"),
          least(col("lbl"), coalesce(col("plbl"), col("lbl"))).as("lbl")),
        s"cc_round_${iter}_${System.nanoTime()}")
      val jump = jumpObs.localCheckpoint()
      val newSum = metricSum(obs)
      labels = jump
      converged = (newSum == null && prevSum == null) ||
        (newSum != null && prevSum != null && newSum.compareTo(prevSum) == 0)
      prevSum = newSum
      iter += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    labels.select(col("node"), col("lbl").as("cluster"))
  }
}
