package graft.ingest

import graft.model.{ThemeField, ThemeMeta}

/** Builds the canonical cache projection for a theme given the columns
  * actually present in the source parquet (different Overture releases
  * carry different columns — the projection is schema-adaptive).
  *
  * Port of buildCacheSelect (/root/reference/src/lib/query.js:10-45)
  * into Spark SQL dialect; the geometry stays WKB at cache time and
  * GeoJSON conversion is deferred to output projections (query.js:7-9).
  */
object CacheSelect {

  /** bbox overlap predicate on the source `bbox` struct — pushes down
    * to parquet row-group stats (query.js:3-5).
    */
  def bboxFilter(xmin: Double, ymin: Double, xmax: Double, ymax: Double): String =
    s"bbox.xmax >= $xmin AND bbox.xmin <= $xmax AND bbox.ymax >= $ymin AND bbox.ymin <= $ymax"

  /** Numeric/noise fields excluded from search_name composition
    * (query.js:50-59).
    */
  val ExcludeLabels: Set[String] = Set(
    "Height (m)", "Floors", "Min height", "Elevation", "Depth",
    "Min depth", "Max depth", "Confidence", "Min zoom", "Max zoom",
    "Speed limit", "Population", "Salt", "Intermittent",
    "Address", "Website", "Phone")

  def isSearchableField(f: ThemeField): Boolean = !ExcludeLabels.contains(f.label)

  /** The canonical SELECT expression list (Spark SQL dialect).
    *
    * @param parquetCols columns present in the source file
    * @param key         theme/type key, e.g. "places/place"
    */
  def buildCacheSelect(parquetCols: Set[String], key: String): Seq[String] = {
    val nameExpr =
      if (parquetCols.contains("names")) "COALESCE(CAST(names.primary AS STRING), '')"
      else if (parquetCols.contains("name")) "COALESCE(CAST(name AS STRING), '')"
      else "''"

    val defs = ThemeMeta.themeFields.getOrElse(key, Seq.empty)
    val extraCols = scala.collection.mutable.ArrayBuffer[String]()
    val searchableParts = scala.collection.mutable.ArrayBuffer[String](nameExpr)

    defs.zipWithIndex.foreach { case (d, i) =>
      if (parquetCols.contains(d.col)) {
        val castExpr = s"CAST(${d.sql} AS STRING)"
        extraCols += s"$castExpr AS _f$i"
        if (isSearchableField(d)) searchableParts += s"COALESCE($castExpr, '')"
      }
    }

    val searchNameExpr =
      if (searchableParts.length > 1) s"CONCAT_WS(' ', ${searchableParts.mkString(", ")})"
      else nameExpr

    Seq(
      "id",
      s"$nameExpr AS display_name",
      s"$searchNameExpr AS search_name",
      "geometry", // native WKB — GeoJSON only at render time
      "st_geometrytype(geometry) AS geom_type",
      "st_x(st_centroid(geometry)) AS centroid_lon",
      "st_y(st_centroid(geometry)) AS centroid_lat",
    ) ++ extraCols
  }

  /** Output projection for rendering: `_f*` columns re-packed densely,
    * geometry converted to GeoJSON here and only here
    * (getFieldsForTable — query.js:61-87).
    */
  def renderSelect(tableCols: Set[String], key: String): (Seq[String], Seq[ThemeField]) = {
    val defs = ThemeMeta.themeFields.getOrElse(key, Seq.empty)
    val extraFields = scala.collection.mutable.ArrayBuffer[ThemeField]()
    val extraSelect = scala.collection.mutable.ArrayBuffer[String]()
    defs.zipWithIndex.foreach { case (d, i) =>
      if (tableCols.contains(s"_f$i")) {
        extraSelect += s"_f$i AS _f${extraFields.length}"
        extraFields += d
      }
    }
    val selectParts = Seq(
      "id", "display_name",
      "st_asgeojson(geometry) AS geojson",
      "geom_type", "centroid_lon", "centroid_lat") ++ extraSelect
    (selectParts, extraFields.toSeq)
  }
}
