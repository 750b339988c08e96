package graft.geo

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class SpaceCurveSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def mortonRef(ix: Long, iy: Long, bits: Int): Long =
    (0 until bits).map(b => (((ix >> b) & 1L) << (2 * b)) | (((iy >> b) & 1L) << (2 * b + 1))).sum

  test("zorder key: corners and interleave match a reference Morton encoding") {
    val bits = 16
    val r = new Random(7L)
    val cells = Seq((0L, 0L), (65535L, 65535L), (65535L, 0L), (0L, 65535L)) ++
      Seq.fill(200)((r.nextInt(1 << bits).toLong, r.nextInt(1 << bits).toLong))
    // place each sample at its cell center so quantization is exact
    val pts = cells.map { case (ix, iy) =>
      (ix, iy, -180.0 + (ix + 0.5) * 360.0 / 65536.0, -90.0 + (iy + 0.5) * 180.0 / 65536.0)
    }.toDF("ix", "iy", "lon", "lat")
    val rows = pts.select($"ix", $"iy",
      SpaceCurve.zorderKey($"lon", $"lat", bits).as("z")).collect()
    rows.foreach { row =>
      val expect = mortonRef(row.getLong(0), row.getLong(1), bits)
      assert(row.getLong(2) == expect, s"cell (${row.getLong(0)}, ${row.getLong(1)})")
    }
    // out-of-range clamps, never throws or goes negative
    val edge = Seq((-200.0, -95.0), (200.0, 95.0)).toDF("lon", "lat")
      .select(SpaceCurve.zorderKey($"lon", $"lat", bits).as("z")).collect().map(_.getLong(0))
    assert(edge(0) == 0L && edge(1) == (1L << 32) - 1)
  }

  test("clusterForWrite yields compact spatial tiles, not world-spanning partitions") {
    val pts = (for (i <- 0 until 64; j <- 0 until 64)
      yield (-180.0 + i * 5.6, -90.0 + j * 2.8)).toDF("lon", "lat")
    val clustered = SpaceCurve.clusterForWrite(pts, "lon", "lat", partitions = 4)
    val tiles = clustered.withColumn("pid", spark_partition_id())
      .groupBy($"pid")
      .agg(min($"lon").as("x0"), max($"lon").as("x1"),
        min($"lat").as("y0"), max($"lat").as("y1"), count(lit(1)).as("n"))
      .collect()
    assert(tiles.length == 4 && tiles.forall(_.getAs[Long]("n") > 0))
    val globalArea = 360.0 * 180.0
    val tileAreaSum = tiles.map(t =>
      (t.getAs[Double]("x1") - t.getAs[Double]("x0")) *
        (t.getAs[Double]("y1") - t.getAs[Double]("y0"))).sum
    // random partitioning would give ~4x the global area; z-range
    // tiles cover it roughly once (range-sampling can split a tile
    // mid-quadrant, so allow up to 2.5x — still far from unclustered)
    assert(tileAreaSum < globalArea * 2.5,
      s"tiles span $tileAreaSum vs global $globalArea — not spatially clustered")
  }
}
