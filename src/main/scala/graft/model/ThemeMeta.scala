package graft.model

/** Per-theme field derivations and metadata — the engine's static data
  * contract for Overture theme/type tables.
  *
  * Semantics ported from the reference's THEME_FIELDS / THEME_META
  * tables (/root/reference/src/lib/constants.js:24-229), re-expressed
  * in Spark SQL dialect: DuckDB's 1-based `arr[1]` becomes
  * `element_at(arr, 1)` (also 1-based — identical semantics), struct
  * access is unchanged.
  */
final case class ThemeField(col: String, sql: String, label: String)

final case class ThemeInfo(
    geometry: String,
    nameCol: Option[String],
    searchable: Boolean,
    size: String,
    description: String)

object ThemeMeta {

  /** `theme/type` key → cached-table name (themes.js:214). */
  def tableName(key: String): String = key.replace('/', '_')

  val themeFields: Map[String, Seq[ThemeField]] = Map(
    "places/place" -> Seq(
      ThemeField("categories", "categories.primary", "Category"),
      ThemeField("confidence", "ROUND(confidence, 2)", "Confidence"),
      ThemeField("websites", "element_at(websites, 1)", "Website"),
      ThemeField("phones", "element_at(phones, 1)", "Phone"),
      ThemeField("brand", "brand.names.primary", "Brand"),
      ThemeField("addresses", "element_at(addresses, 1).freeform", "Address")),
    "buildings/building" -> Seq(
      ThemeField("subtype", "subtype", "Subtype"),
      ThemeField("class", "class", "Class"),
      ThemeField("height", "ROUND(height, 1)", "Height (m)"),
      ThemeField("num_floors", "num_floors", "Floors"),
      ThemeField("facade_color", "facade_color", "Facade color"),
      ThemeField("roof_shape", "roof_shape", "Roof shape")),
    "buildings/building_part" -> Seq(
      ThemeField("height", "ROUND(height, 1)", "Height (m)"),
      ThemeField("num_floors", "num_floors", "Floors"),
      ThemeField("min_height", "ROUND(min_height, 1)", "Min height"),
      ThemeField("facade_color", "facade_color", "Facade color"),
      ThemeField("roof_shape", "roof_shape", "Roof shape")),
    "addresses/address" -> Seq(
      ThemeField("number", "number", "Number"),
      ThemeField("street", "street", "Street"),
      ThemeField("postcode", "postcode", "Postcode"),
      ThemeField("country", "country", "Country")),
    "transportation/segment" -> Seq(
      ThemeField("subtype", "subtype", "Subtype"),
      ThemeField("class", "class", "Class"),
      ThemeField("subclass", "subclass", "Subclass"),
      ThemeField("road_surface", "element_at(road_surface, 1).value", "Surface"),
      ThemeField("speed_limits", "element_at(speed_limits, 1).max_speed.value", "Speed limit")),
    "transportation/connector" -> Seq.empty,
    "base/infrastructure" -> Seq(
      ThemeField("subtype", "subtype", "Subtype"),
      ThemeField("class", "class", "Class"),
      ThemeField("surface", "surface", "Surface")),
    "base/land" -> Seq(
      ThemeField("subtype", "subtype", "Subtype"),
      ThemeField("class", "class", "Class"),
      ThemeField("elevation", "elevation", "Elevation"),
      ThemeField("surface", "surface", "Surface")),
    "base/land_cover" -> Seq(
      ThemeField("subtype", "subtype", "Subtype"),
      ThemeField("cartography", "cartography.min_zoom", "Min zoom"),
      ThemeField("cartography", "cartography.max_zoom", "Max zoom")),
    "base/land_use" -> Seq(
      ThemeField("subtype", "subtype", "Subtype"),
      ThemeField("class", "class", "Class"),
      ThemeField("surface", "surface", "Surface")),
    "base/water" -> Seq(
      ThemeField("subtype", "subtype", "Subtype"),
      ThemeField("class", "class", "Class"),
      ThemeField("is_salt", "is_salt", "Salt"),
      ThemeField("is_intermittent", "is_intermittent", "Intermittent")),
    "base/bathymetry" -> Seq(
      ThemeField("depth", "depth", "Depth"),
      ThemeField("min_depth", "min_depth", "Min depth"),
      ThemeField("max_depth", "max_depth", "Max depth")),
    "divisions/division" -> Seq(
      ThemeField("subtype", "subtype", "Subtype"),
      ThemeField("country", "country", "Country"),
      ThemeField("region", "region", "Region"),
      ThemeField("population", "population", "Population"),
      ThemeField("capital_type", "capital_type", "Capital"),
      ThemeField("sources", "regexp_replace(element_at(sources, 1).record_id, '@.*', '')", "OSM id")),
    "divisions/division_area" -> Seq(
      ThemeField("subtype", "subtype", "Subtype"),
      ThemeField("country", "country", "Country"),
      ThemeField("region", "region", "Region"),
      ThemeField("sources", "regexp_replace(element_at(sources, 1).record_id, '@.*', '')", "OSM id")),
    "divisions/division_boundary" -> Seq(
      ThemeField("subtype", "subtype", "Subtype"),
      ThemeField("class", "class", "Class")),
  )

  val themeMeta: Map[String, ThemeInfo] = Map(
    "places/place" -> ThemeInfo("Point", Some("names.primary"), searchable = true, "huge",
      "Points of interest – restaurants, shops, landmarks, etc."),
    "buildings/building" -> ThemeInfo("Polygon", Some("names.primary"), searchable = true, "huge",
      "Building footprints with optional height/floor data."),
    "buildings/building_part" -> ThemeInfo("Polygon", Some("names.primary"), searchable = false, "medium",
      "3-D sub-parts of buildings (wings, towers, etc.)."),
    "addresses/address" -> ThemeInfo("Point", Some("address"), searchable = true, "huge",
      "Geocoded address points with street/number/postcode."),
    "transportation/segment" -> ThemeInfo("LineString", Some("names.primary"), searchable = true, "huge",
      "Road, path, and rail segments with classification."),
    "transportation/connector" -> ThemeInfo("Point", None, searchable = false, "large",
      "Junction points linking transportation segments."),
    "base/infrastructure" -> ThemeInfo("Point | Line | Polygon", Some("names.primary"), searchable = true, "medium",
      "Human-made structures – bridges, dams, piers, towers."),
    "base/land" -> ThemeInfo("Polygon | Line | Point", Some("names.primary"), searchable = true, "large",
      "Natural land features – mountains, cliffs, glaciers."),
    "base/land_cover" -> ThemeInfo("Polygon", None, searchable = false, "large",
      "Land cover polygons – forest, grassland, bare rock."),
    "base/land_use" -> ThemeInfo("Polygon", Some("names.primary"), searchable = true, "large",
      "Human land use zones – residential, commercial, industrial."),
    "base/water" -> ThemeInfo("Polygon | Line | Point", Some("names.primary"), searchable = true, "large",
      "Water bodies and waterways – lakes, rivers, oceans."),
    "base/bathymetry" -> ThemeInfo("Polygon", None, searchable = false, "small",
      "Ocean/sea depth contour polygons."),
    "divisions/division" -> ThemeInfo("Point", Some("names.primary"), searchable = true, "medium",
      "Administrative division points (countries, states, cities)."),
    "divisions/division_area" -> ThemeInfo("Polygon | MultiPolygon", Some("names.primary"), searchable = true, "medium",
      "Administrative boundary areas."),
    "divisions/division_boundary" -> ThemeInfo("LineString", None, searchable = false, "medium",
      "Administrative boundary lines between divisions."),
  )

  val allKeys: Seq[String] = themeMeta.keys.toSeq.sorted
}
