package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The optimizer rule must rewrite naive user spatial SQL into a grid
  * equi-join with identical results.
  */
class GridJoinRuleSpec extends AnyFunSuite {

  // a dedicated session: extensions are builder-time
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("gridjoin-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    graft.queries.GeoViews.register(s, "/root/testdata/sf0.001")
    s
  }

  private val naiveSql =
    """SELECT a.id AS id_a, b.id AS id_b
      |FROM geo_places a JOIN geo_buildings b
      |  ON ABS(a.centroid_lon - b.centroid_lon) < CAST(0.2 AS DOUBLE)
      | AND ABS(a.centroid_lat - b.centroid_lat) < CAST(0.2 AS DOUBLE)
      | AND st_intersects(a.geometry, b.geometry)
      |ORDER BY id_a, id_b""".stripMargin

  test("naive spatial join is rewritten to a grid equi-join") {
    val df = spark.sql(naiveSql)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("_graft_gx") && optimized.contains("_graft_gy"),
      s"rule did not fire:\n${optimized.take(1500)}")
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct"))
  }

  test("rewritten join returns exactly the naive results") {
    val got = spark.sql(naiveSql).collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // recompute without the spatial predicate path: point-in-box arithmetic
    val want = spark.sql(
      """SELECT a.id AS id_a, b.id AS id_b
        |FROM geo_places a JOIN geo_buildings b
        |  ON ABS(a.centroid_lon - b.centroid_lon) < CAST(0.2 AS DOUBLE)
        | AND ABS(a.centroid_lat - b.centroid_lat) < CAST(0.2 AS DOUBLE)
        | AND a.centroid_lon BETWEEN b.bbox.xmin AND b.bbox.xmax
        | AND a.centroid_lat BETWEEN b.bbox.ymin AND b.bbox.ymax
        |ORDER BY id_a, id_b""".stripMargin).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("distance predicate form also triggers the rewrite") {
    val df = spark.sql(
      """SELECT COUNT(*) FROM geo_places a JOIN geo_places b
        |  ON a.id < b.id
        | AND ABS(a.centroid_lon - b.centroid_lon) < CAST(0.2 AS DOUBLE)
        | AND ABS(a.centroid_lat - b.centroid_lat) < CAST(0.2 AS DOUBLE)
        | AND st_distance(a.geometry, b.geometry) < CAST(0.1 AS DOUBLE)""".stripMargin)
    assert(df.queryExecution.optimizedPlan.toString.contains("_graft_gx"))
    assert(df.head().getLong(0) > 0)
  }

  test("joins without the pre-filter pattern are left untouched") {
    val df = spark.sql(
      "SELECT COUNT(*) FROM geo_places a JOIN geo_buildings b ON a.id != b.id")
    assert(!df.queryExecution.optimizedPlan.toString.contains("_graft_gx"))
  }
}
