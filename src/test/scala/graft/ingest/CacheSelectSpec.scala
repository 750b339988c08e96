package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the canonical cache projection — the assertions
  * port the reference's query.test.js cases (name fallback chain,
  * schema-adaptive _f columns, geometry/centroid invariants,
  * search_name composition and exclusions, bbox filter shape).
  */
class CacheSelectSpec extends AnyFunSuite {

  test("bboxFilter emits the interval-overlap predicate") {
    assert(CacheSelect.bboxFilter(-118.3, 34.0, -118.2, 34.1) ==
      "bbox.xmax >= -118.3 AND bbox.xmin <= -118.2 AND bbox.ymax >= 34.0 AND bbox.ymin <= 34.1")
  }

  test("display_name falls back names.primary → name → ''") {
    val withNames = CacheSelect.buildCacheSelect(Set("id", "names", "geometry"), "places/place")
    assert(withNames.exists(_ == "COALESCE(CAST(names.primary AS STRING), '') AS display_name"))

    val withName = CacheSelect.buildCacheSelect(Set("id", "name", "geometry"), "places/place")
    assert(withName.exists(_ == "COALESCE(CAST(name AS STRING), '') AS display_name"))

    val bare = CacheSelect.buildCacheSelect(Set("id", "geometry"), "addresses/address")
    assert(bare.exists(_ == "'' AS display_name"))
  }

  test("theme fields project only when the source column exists") {
    val cols = Set("id", "names", "geometry", "categories", "websites")
    val sel = CacheSelect.buildCacheSelect(cols, "places/place")
    assert(sel.exists(_ == "CAST(categories.primary AS STRING) AS _f0"))
    assert(sel.exists(_ == "CAST(element_at(websites, 1) AS STRING) AS _f2"))
    // confidence column absent → no _f1
    assert(!sel.exists(_.contains("_f1")))
    assert(!sel.exists(_.contains("phones")))
  }

  test("geometry stays WKB and centroid/type are derived") {
    val sel = CacheSelect.buildCacheSelect(Set("id", "geometry"), "places/place")
    assert(sel.contains("geometry"))
    assert(sel.exists(_ == "st_geometrytype(geometry) AS geom_type"))
    assert(sel.exists(_ == "st_x(st_centroid(geometry)) AS centroid_lon"))
    assert(sel.exists(_ == "st_y(st_centroid(geometry)) AS centroid_lat"))
    assert(!sel.exists(_.contains("st_asgeojson"))) // GeoJSON only at render
  }

  test("search_name includes searchable fields, excludes noise labels") {
    val cols = Set("id", "names", "geometry", "categories", "confidence", "websites", "brand")
    val sel = CacheSelect.buildCacheSelect(cols, "places/place")
    val searchName = sel.find(_.endsWith("AS search_name")).get
    assert(searchName.startsWith("CONCAT_WS(' ',"))
    assert(searchName.contains("categories.primary")) // Category searchable
    assert(searchName.contains("brand.names.primary"))
    assert(!searchName.contains("confidence")) // Confidence excluded
    assert(!searchName.contains("websites"))   // Website excluded
  }

  test("search_name is bare name expr when no searchable fields") {
    val sel = CacheSelect.buildCacheSelect(Set("id", "names", "geometry", "height"), "buildings/building")
    val searchName = sel.find(_.endsWith("AS search_name")).get
    // Height (m) is excluded → only the name expr
    assert(searchName == "COALESCE(CAST(names.primary AS STRING), '') AS search_name")
  }

  test("renderSelect repacks _f columns densely and converts GeoJSON") {
    val (parts, fields) = CacheSelect.renderSelect(Set("id", "_f0", "_f2"), "places/place")
    assert(parts.contains("st_asgeojson(geometry) AS geojson"))
    assert(parts.contains("_f0 AS _f0"))
    assert(parts.contains("_f2 AS _f1")) // repacked densely
    assert(fields.map(_.label) == Seq("Category", "Website"))
  }
}
