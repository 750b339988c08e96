package graft.queries

import org.apache.spark.sql.SparkSession
import graft.core.Tables

/** Canonical Overture-shaped views synthesized deterministically from
  * the driver's TPC-H tables, used to oracle-verify every spatial
  * operator (SURVEY §2.2/2.3/2.8).
  *
  * Coordinates live on a dyadic lattice (quanta 2^-4 lon / 2^-5 lat,
  * box half-size 0.125, 3-4-5 segments scaled by 0.0625 so lengths are
  * exact) — every centroid/area/distance either is exactly
  * representable or is computed by the identical sequence of correctly
  * rounded IEEE ops on both engines, giving bit-exact double parity
  * between our WKB geometry math and the DuckDB oracle's plain
  * arithmetic.
  *
  * - geo_places     — POINT per customer     (canonical schema, _f0)
  * - geo_buildings  — 0.25°x0.25° POLYGON per supplier + bbox struct
  * - geo_segments   — 3-4-5 LINESTRING per part
  */
object GeoViews {

  // lattice parameters (shared by Spark views and DuckDB oracle CTEs)
  private val lonQ = "CAST(0.0625 AS DOUBLE)"
  private val latQ = "CAST(0.03125 AS DOUBLE)"
  private val lonOff = "CAST(4.0 AS DOUBLE)"
  private val latOff = "CAST(2.0 AS DOUBLE)"
  private val half = "CAST(0.125 AS DOUBLE)"

  def placeLon(k: String) = s"($k % 128) * $lonQ - $lonOff"
  def placeLat(k: String) = s"(($k * 7) % 128) * $latQ - $latOff"
  // coarser lattice (%32) so building boxes overlap each other —
  // exercises polygon∩polygon (J8) with non-empty results
  def bldLon(k: String) = s"(($k * 13) % 32) * $lonQ - $lonOff"
  def bldLat(k: String) = s"(($k * 29) % 32) * $latQ - $latOff"
  def segX(k: String) = s"(($k * 3) % 128) * $lonQ - $lonOff"
  def segY(k: String) = s"(($k * 11) % 128) * $latQ - $latOff"
  val segDx = "CAST(0.1875 AS DOUBLE)" // 3 * 2^-4
  val segDy = "CAST(0.25 AS DOUBLE)"   // 4 * 2^-4  → length exactly 0.3125

  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Register geo views on the session (idempotent, memoized). */
  def register(spark: SparkSession, dir: String): Unit = {
    Tables.registerAll(spark, dir)
    val key = System.identityHashCode(spark) + "|" + dir
    if (registered.contains(key)) return
    registered.add(key)

    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY VIEW geo_places AS
         |WITH src AS (
         |  SELECT c_custkey, c_name, c_mktsegment,
         |         ${placeLon("c_custkey")} AS lon,
         |         ${placeLat("c_custkey")} AS lat
         |  FROM customer)
         |SELECT concat('c', c_custkey) AS id,
         |       c_name AS display_name,
         |       concat_ws(' ', c_name, c_mktsegment) AS search_name,
         |       st_point(lon, lat) AS geometry,
         |       st_geometrytype(st_point(lon, lat)) AS geom_type,
         |       st_x(st_centroid(st_point(lon, lat))) AS centroid_lon,
         |       st_y(st_centroid(st_point(lon, lat))) AS centroid_lat,
         |       c_mktsegment AS _f0
         |FROM src""".stripMargin)

    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY VIEW geo_buildings AS
         |WITH src AS (
         |  SELECT s_suppkey, s_name,
         |         ${bldLon("s_suppkey")} AS cx,
         |         ${bldLat("s_suppkey")} AS cy
         |  FROM supplier),
         |geo AS (
         |  SELECT *, st_makeenvelope(cx - $half, cy - $half, cx + $half, cy + $half) AS g
         |  FROM src)
         |SELECT concat('s', s_suppkey) AS id,
         |       s_name AS display_name,
         |       s_name AS search_name,
         |       g AS geometry,
         |       st_geometrytype(g) AS geom_type,
         |       st_x(st_centroid(g)) AS centroid_lon,
         |       st_y(st_centroid(g)) AS centroid_lat,
         |       named_struct('xmin', st_xmin(g), 'xmax', st_xmax(g),
         |                    'ymin', st_ymin(g), 'ymax', st_ymax(g)) AS bbox
         |FROM geo""".stripMargin)

    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY VIEW geo_segments AS
         |WITH src AS (
         |  SELECT p_partkey, p_name,
         |         ${segX("p_partkey")} AS x0,
         |         ${segY("p_partkey")} AS y0
         |  FROM part),
         |geo AS (
         |  SELECT *, st_makeline(st_point(x0, y0), st_point(x0 + $segDx, y0 + $segDy)) AS g
         |  FROM src)
         |SELECT concat('p', p_partkey) AS id,
         |       p_name AS display_name,
         |       p_name AS search_name,
         |       g AS geometry,
         |       st_geometrytype(g) AS geom_type,
         |       st_x(st_centroid(g)) AS centroid_lon,
         |       st_y(st_centroid(g)) AS centroid_lat
         |FROM geo""".stripMargin)

    // guarded-wide twin of geo_segments (r15): the single-file local
    // fixture plans the segments scan as ONE partition, which
    // serialized j9's whole candidate-pair distance evaluation into
    // one 1.25 s task (StageProfile). Spread.ifNarrow is identity on
    // a wide real scan, so the twin IS geo_segments at scale; rows
    // are unchanged either way (a repartition), so every consumer's
    // results are too.
    graft.ops.Spread.ifNarrow(spark.table("geo_segments"),
        org.apache.spark.sql.functions.col("id"))
      .createOrReplaceTempView("geo_segments_wide")
  }

  // ── DuckDB oracle CTE equivalents (no geometry; pure arithmetic) ──

  val oraclePlaces: String =
    s"""geo_places AS (
       |  SELECT concat('c', c_custkey) AS id,
       |         c_name AS display_name,
       |         concat_ws(' ', c_name, c_mktsegment) AS search_name,
       |         'POINT' AS geom_type,
       |         ${placeLon("c_custkey")} AS centroid_lon,
       |         ${placeLat("c_custkey")} AS centroid_lat,
       |         c_mktsegment AS _f0
       |  FROM customer)""".stripMargin

  val oracleBuildings: String =
    s"""geo_buildings AS (
       |  SELECT concat('s', s_suppkey) AS id,
       |         s_name AS display_name,
       |         s_name AS search_name,
       |         'POLYGON' AS geom_type,
       |         cx AS centroid_lon, cy AS centroid_lat,
       |         cx - $half AS xmin, cx + $half AS xmax,
       |         cy - $half AS ymin, cy + $half AS ymax
       |  FROM (SELECT s_suppkey, s_name,
       |               ${bldLon("s_suppkey")} AS cx,
       |               ${bldLat("s_suppkey")} AS cy
       |        FROM supplier))""".stripMargin

  val oracleSegments: String =
    s"""geo_segments AS (
       |  SELECT concat('p', p_partkey) AS id,
       |         p_name AS display_name,
       |         p_name AS search_name,
       |         'LINESTRING' AS geom_type,
       |         x0, y0, x0 + $segDx AS x1, y0 + $segDy AS y1,
       |         x0 + CAST(0.09375 AS DOUBLE) AS centroid_lon,
       |         y0 + $half AS centroid_lat
       |  FROM (SELECT p_partkey, p_name,
       |               ${segX("p_partkey")} AS x0,
       |               ${segY("p_partkey")} AS y0
       |        FROM part))""".stripMargin
}
