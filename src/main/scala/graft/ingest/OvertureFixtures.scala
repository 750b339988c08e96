package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.geo.{Pt, Point, Polygon, Wkb}

/** Deterministic Overture-GeoParquet-shaped fixtures (FIXTURES.md §2)
  * for exercising the full nested-type ingest surface: struct, struct-
  * of-struct, list, list-of-struct, bbox struct, WKB geometry.
  */
object OvertureFixtures {

  final case class Names(primary: String)
  final case class Cat(primary: String)
  final case class Brand(names: Names)
  final case class Addr(freeform: String)
  final case class BBox(xmin: Double, xmax: Double, ymin: Double, ymax: Double)

  final case class PlaceRow(
      id: String,
      names: Names,
      categories: Cat,
      confidence: Double,
      websites: Seq[String],
      phones: Seq[String],
      brand: Brand,
      addresses: Seq[Addr],
      bbox: BBox,
      geometry: Array[Byte])

  final case class BuildingRow(
      id: String,
      names: Names,
      subtype: String,
      clazz: String, // renamed to "class" at DataFrame level (invalid Java identifier for encoders)
      height: Double,
      num_floors: Int,
      bbox: BBox,
      geometry: Array[Byte])

  private def lon(i: Int): Double = (i % 64) * 0.0625 - 2.0
  private def lat(i: Int): Double = ((i * 7) % 64) * 0.03125 - 1.0

  def placesDf(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val x = lon(i); val y = lat(i)
      PlaceRow(
        id = f"pl$i%05d",
        names = Names(s"Place $i"),
        categories = Cat(if (i % 3 == 0) "cafe" else "shop"),
        confidence = (i % 100) / 100.0,
        websites = Seq(s"https://example.com/$i", "https://alt.example"),
        phones = Seq(s"+1-555-$i"),
        brand = Brand(Names(if (i % 5 == 0) "BrandX" else s"Brand$i")),
        addresses = Seq(Addr(s"$i Main St")),
        bbox = BBox(x, x, y, y),
        geometry = Wkb.write(Point(Pt(x, y))))
    }.toDF()
  }

  def buildingsDf(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val x = lon(i * 3); val y = lat(i * 3)
      val h = 0.125
      BuildingRow(
        id = f"bl$i%05d",
        names = Names(s"Building $i"),
        subtype = if (i % 2 == 0) "residential" else "commercial",
        clazz = "building",
        height = (i % 30) + 3.0,
        num_floors = (i % 10) + 1,
        bbox = BBox(x - h, x + h, y - h, y + h),
        geometry = Wkb.write(Polygon(IndexedSeq(IndexedSeq(
          Pt(x - h, y - h), Pt(x + h, y - h), Pt(x + h, y + h), Pt(x - h, y + h), Pt(x - h, y - h))))))
    }.toDF().withColumnRenamed("clazz", "class")
  }

  /** Write both fixture tables as multi-file parquet datasets (several
    * files so file-level bbox pruning has something to prune).
    */
  def write(spark: SparkSession, dir: String, n: Int = 200, files: Int = 4): Unit = {
    // range-partition by xmin so each file covers a distinct lon band —
    // gives file-level bbox pruning real work in tests
    placesDf(spark, n).repartitionByRange(files, org.apache.spark.sql.functions.col("bbox.xmin"))
      .write.mode("overwrite").parquet(s"$dir/places_place")
    buildingsDf(spark, n).repartitionByRange(files, org.apache.spark.sql.functions.col("bbox.xmin"))
      .write.mode("overwrite").parquet(s"$dir/buildings_building")
  }
}
