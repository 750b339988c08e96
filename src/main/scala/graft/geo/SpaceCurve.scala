package graft.geo

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) spatial clustering for write layout.
  *
  * At corpus scale the dominant cost of a bbox query is how many
  * row-groups survive stats pruning, and that is decided at WRITE
  * time: files sorted by a space-filling curve hold spatially compact
  * tiles, so their parquet min/max stats on lon/lat (and the
  * FileIndex footer manifest) become tight boxes instead of
  * world-spanning ones. This is the layout the reference's
  * pre-partitioned GeoParquet releases arrive in; `clusterForWrite`
  * reproduces it for our own sinks.
  *
  * The curve key is pure column arithmetic (quantize + bit
  * interleave) — whole-stage-codegen'd, no UDF, and bit-reproducible
  * in any engine (the DuckDB oracle recomputes it exactly).
  */
object SpaceCurve {

  /** Quantize `v` from [min, max) onto a `bits`-bit integer lattice,
    * clamped at the edges.
    */
  def quantize(v: Column, min: Double, max: Double, bits: Int): Column =
    least(lit((1L << bits) - 1), greatest(lit(0L),
      floor((v - lit(min)) / lit(max - min) * lit((1L << bits).toDouble)).cast("long")))

  /** Morton key: lon/lat quantized to `bits` each, bits interleaved
    * (lon in the even positions). 2·bits significant bits; bits ≤ 31.
    */
  def zorderKey(lon: Column, lat: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val ix = quantize(lon, -180.0, 180.0, bits)
    val iy = quantize(lat, -90.0, 90.0, bits)
    (0 until bits).map { b =>
      shiftright(ix, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b)) +
        shiftright(iy, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b + 1))
    }.reduce(_ + _)
  }

  /** Range-partition + sort by the curve key, for writing spatially
    * clustered files: each output partition covers one compact
    * z-range (≈ a spatial tile), and rows inside it are curve-ordered
    * so row-group stats stay tight too.
    */
  def clusterForWrite(df: DataFrame, lonCol: String, latCol: String,
                      partitions: Int, bits: Int = 16): DataFrame =
    df.withColumn("_zorder", zorderKey(col(lonCol), col(latCol), bits))
      .repartitionByRange(partitions, col("_zorder"))
      .sortWithinPartitions("_zorder")
      .drop("_zorder")
}
