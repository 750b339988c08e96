package graft.geo

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GeoFunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("ST_ functions work through SQL") {
    GeoFunctions.register(spark)
    val row = spark.sql(
      """SELECT
        |  st_geometrytype(st_point(1.5d, 2.5d)) AS t,
        |  st_x(st_point(1.5d, 2.5d)) AS x,
        |  st_y(st_point(1.5d, 2.5d)) AS y,
        |  st_asgeojson(st_point(1.5d, 2.5d)) AS gj,
        |  st_distance(st_point(0d, 0d), st_point(3d, 4d)) AS d,
        |  st_intersects(
        |    st_geomfromtext('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))'),
        |    st_point(5d, 5d)) AS inter,
        |  st_area(st_geomfromtext('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))')) AS a,
        |  st_astext(st_centroid(st_geomfromtext('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))'))) AS c,
        |  st_xmin(st_geomfromtext('LINESTRING (3 4, 7 9)')) AS xmin,
        |  st_ymax(st_geomfromtext('LINESTRING (3 4, 7 9)')) AS ymax
        |""".stripMargin).head()
    assert(row.getAs[String]("t") == "POINT")
    assert(row.getAs[Double]("x") == 1.5)
    assert(row.getAs[Double]("y") == 2.5)
    assert(row.getAs[String]("gj") == """{"type":"Point","coordinates":[1.5,2.5]}""")
    assert(row.getAs[Double]("d") == 5.0)
    assert(row.getAs[Boolean]("inter"))
    assert(row.getAs[Double]("a") == 16.0)
    assert(row.getAs[String]("c") == "POINT (2 2)")
    assert(row.getAs[Double]("xmin") == 3.0)
    assert(row.getAs[Double]("ymax") == 9.0)
  }

  test("st_intersects/st_distance are codegen'd (not CodegenFallback) and agree with eval") {
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    import org.apache.spark.sql.catalyst.expressions.Literal
    val p = Literal(Wkb.write(Point(Pt(0, 0))))
    val q = Literal(Wkb.write(Point(Pt(3, 4))))
    assert(!GeoExpressions.StIntersects(p, q).isInstanceOf[CodegenFallback])
    assert(!GeoExpressions.StDistance(p, q).isInstanceOf[CodegenFallback])
    // a wide filter over the predicates exercises the generated code
    // path (whole-stage codegen over range → filter); values must match
    // the interpreted result from the SQL-on-literals test above
    GeoFunctions.register(spark)
    val n = spark.sql(
      """SELECT COUNT(*) AS n FROM (SELECT id FROM range(1000))
        |WHERE st_distance(st_point(CAST(id AS DOUBLE), 0d), st_point(0d, 0d)) < 10d
        |  AND st_intersects(
        |    st_geomfromtext('POLYGON ((0 0, 100 0, 100 100, 0 100, 0 0))'),
        |    st_point(CAST(id AS DOUBLE), 1d))""".stripMargin).head().getLong(0)
    assert(n == 10)
  }

  test("graft_zorder and text kernels are callable from SQL") {
    GeoFunctions.register(spark)
    graft.functions.TextExpressions.register(spark)
    val r = spark.sql(
      """SELECT graft_zorder(CAST(-180 AS DOUBLE), CAST(-90 AS DOUBLE)) AS z0,
        |       graft_zorder(CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), 4) AS zc,
        |       word_shingles('a b c d', 3) AS sh,
        |       size(shingle_hashes('a b c d', 3)) AS nh""".stripMargin).head()
    assert(r.getAs[Long]("z0") == 0L)
    // center cell (8, 8) at 4 bits → interleave = 0b11000000 = 192
    assert(r.getAs[Long]("zc") == 192L)
    assert(r.getSeq[String](r.fieldIndex("sh")) == Seq("a b c", "b c d"))
    assert(r.getAs[Int]("nh") == 2)
  }

  test("ST_ functions null-propagate") {
    GeoFunctions.register(spark)
    val row = spark.sql(
      "SELECT st_x(CAST(NULL AS BINARY)) AS x, st_intersects(CAST(NULL AS BINARY), st_point(1d,1d)) AS i").head()
    assert(row.isNullAt(0) && row.isNullAt(1))
  }

  test("st_intersection via Column API") {
    import GeoFunctions._
    import spark.implicits._
    val df = Seq(
      ("a", "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))")
    ).toDF("id", "wa", "wb")
    val r = df.select(
      st_area(st_intersection(st_geomfromtext($"wa"), st_geomfromtext($"wb"))).as("a")).head()
    assert(r.getAs[Double]("a") == 4.0)
  }
}
