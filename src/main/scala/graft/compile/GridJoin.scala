package graft.compile

/** Grid-cell equi-join rewrite for spatial predicates (SURVEY R8).
  *
  * Every spatial join in the reference carries the cheap pre-filter
  * `|Δlon| < 0.2 AND |Δlat| < 0.2` (pipeline.js:129-132). As a pure
  * theta predicate that plans as a BroadcastNestedLoopJoin — O(n·m)
  * pairings regardless of selectivity, which is the single biggest
  * scale hazard in the engine. Bucketing both sides into a 0.2° grid
  * turns it into an equi-join: one side is expanded to its 3×3 cell
  * neighborhood (9 rows), the other keyed by its own cell, and the
  * exact predicate (pre-filter + ST_*) is re-applied after the hash
  * join. Any pair passing |Δ| < cell necessarily lands in a
  * neighboring cell, so the rewrite is result-identical.
  *
  * At 100 TB this is the difference between a shuffle hash join keyed
  * on (gx, gy) — linear in matching cells — and a quadratic
  * nested-loop.
  */
object GridJoin {

  /** Cell size in degrees — equal to the pre-filter window, the
    * largest size that keeps the 3×3 neighborhood sufficient.
    */
  val CellDeg = "0.2"

  def cellOf(expr: String): String = s"CAST(FLOOR(($expr) / $CellDeg) AS BIGINT)"

  /** CTE expanding `source` (a quoted table or CTE name) into its 3×3
    * grid-neighborhood copies keyed (_gx, _gy).
    */
  def gridCte(name: String, source: String): String =
    s"""$name AS (
       |  SELECT b.*, ${cellOf("b.centroid_lon")} + dx AS _gx,
       |         ${cellOf("b.centroid_lat")} + dy AS _gy
       |  FROM $source b
       |  LATERAL VIEW explode(array(-1, 0, 1)) _dxs AS dx
       |  LATERAL VIEW explode(array(-1, 0, 1)) _dys AS dy
       |)""".stripMargin

  /** Equality predicate pairing a grid-expanded alias against the
    * probe row's own cell — the equi keys Catalyst hash-joins on.
    */
  def probeKeys(gridAlias: String, probeLonExpr: String, probeLatExpr: String): String =
    s"$gridAlias._gx = ${cellOf(probeLonExpr)} AND $gridAlias._gy = ${cellOf(probeLatExpr)}"
}
