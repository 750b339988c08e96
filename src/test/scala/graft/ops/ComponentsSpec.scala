package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Connected components on hand fixtures (chains, multiple
  * components, self-pairs, NULLs) plus a randomized cross-check
  * against a driver-side union-find and the convergence claim: a long
  * chain must close in O(log n) rounds, not O(n) — that is the
  * pointer-jumping design promise.
  */
class ComponentsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def cc(pairs: Seq[(Long, Long)], maxIter: Int = 30): Map[Long, Long] =
    Components.connectedComponents(pairs.toDF("a", "b"), "a", "b", maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chains, separate components and self-pairs label by component min") {
    val got = cc(Seq((1L, 2L), (2L, 3L), (5L, 6L), (7L, 7L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("NULL endpoints are dropped") {
    val pairs = Seq((Option(1L), Option(2L)), (Option.empty[Long], Option(3L)),
      (Option(4L), Option.empty[Long])).toDF("a", "b")
    val got = Components.connectedComponents(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }

  test("a 64-node chain converges well inside the O(log n) budget") {
    // O(diameter) propagation would need 63 rounds; pointer jumping
    // halves paths, so 10 rounds (≫ log2 64 + slack) must suffice
    val got = cc((1L until 64L).map(i => (i, i + 1)), maxIter = 10)
    assert(got.values.toSet == Set(1L))
    assert(got.size == 64)
  }

  test("randomized graphs agree with a driver-side union-find") {
    val rnd = new scala.util.Random(19)
    for (trial <- 1 to 5) {
      val n     = 10 + rnd.nextInt(40)
      val pairs = Seq.fill(n)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      for ((a, b) <- pairs) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = parent.keys.map(k => k -> find(k)).toMap
      assert(cc(pairs) == expected, s"trial $trial: $pairs")
    }
  }

  test("the per-round plan is hash joins — no BNLJ/cartesian") {
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
    val plan = Components.connectedComponents(pairs, "a", "b")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
