package graft.geo

import org.scalatest.funsuite.AnyFunSuite

class GeoOpsSpec extends AnyFunSuite {

  private def rect(x0: Double, y0: Double, x1: Double, y1: Double): Polygon =
    Polygon(IndexedSeq(IndexedSeq(Pt(x0, y0), Pt(x1, y0), Pt(x1, y1), Pt(x0, y1), Pt(x0, y0))))

  test("centroid of rectangle is exact midpoint") {
    val r = rect(2.0, 4.0, 6.0, 8.0)
    assert(GeoOps.centroid(r) == Pt(4.0, 6.0))
  }

  test("centroid of point is itself; of segment is midpoint") {
    assert(GeoOps.centroid(Point(Pt(3, 4))) == Pt(3, 4))
    assert(GeoOps.centroid(LineString(IndexedSeq(Pt(0, 0), Pt(2, 2)))) == Pt(1, 1))
  }

  test("centroid of polygon with hole shifts away from hole") {
    val withHole = Polygon(IndexedSeq(
      IndexedSeq(Pt(0, 0), Pt(10, 0), Pt(10, 10), Pt(0, 10), Pt(0, 0)),
      IndexedSeq(Pt(6, 4), Pt(8, 4), Pt(8, 6), Pt(6, 6), Pt(6, 4))))
    val c = GeoOps.centroid(withHole)
    assert(c.x < 5.0 && math.abs(c.y - 5.0) < 1e-12)
  }

  test("area: rectangle, with hole, multipolygon") {
    assert(GeoOps.area(rect(0, 0, 10, 10)) == 100.0)
    val withHole = Polygon(IndexedSeq(
      IndexedSeq(Pt(0, 0), Pt(10, 0), Pt(10, 10), Pt(0, 10), Pt(0, 0)),
      IndexedSeq(Pt(4, 4), Pt(6, 4), Pt(6, 6), Pt(4, 6), Pt(4, 4))))
    assert(GeoOps.area(withHole) == 96.0)
    assert(GeoOps.area(MultiPolygon(IndexedSeq(rect(0, 0, 1, 1), rect(5, 5, 7, 7)))) == 5.0)
  }

  test("point in polygon: inside, outside, on edge, in hole") {
    val r = rect(0, 0, 10, 10)
    assert(GeoOps.pointInPolygon(Pt(5, 5), r))
    assert(!GeoOps.pointInPolygon(Pt(15, 5), r))
    assert(GeoOps.pointInPolygon(Pt(0, 5), r))   // on edge
    assert(GeoOps.pointInPolygon(Pt(10, 10), r)) // on corner
    val withHole = Polygon(r.rings :+ IndexedSeq(Pt(4, 4), Pt(6, 4), Pt(6, 6), Pt(4, 6), Pt(4, 4)))
    assert(!GeoOps.pointInPolygon(Pt(5, 5), withHole)) // inside the hole
    assert(GeoOps.pointInPolygon(Pt(2, 2), withHole))
  }

  test("intersects: disjoint, overlapping, touching, containment") {
    assert(!GeoOps.intersects(rect(0, 0, 1, 1), rect(2, 2, 3, 3)))
    assert(GeoOps.intersects(rect(0, 0, 2, 2), rect(1, 1, 3, 3)))
    assert(GeoOps.intersects(rect(0, 0, 1, 1), rect(1, 0, 2, 1))) // share edge
    assert(GeoOps.intersects(rect(0, 0, 10, 10), rect(3, 3, 4, 4))) // contains
    assert(GeoOps.intersects(rect(3, 3, 4, 4), rect(0, 0, 10, 10))) // contained
  }

  test("intersects: point/polygon, line/polygon, line/line, point/point") {
    val r = rect(0, 0, 10, 10)
    assert(GeoOps.intersects(Point(Pt(5, 5)), r))
    assert(!GeoOps.intersects(Point(Pt(50, 5)), r))
    val crossing = LineString(IndexedSeq(Pt(-5, 5), Pt(15, 5)))
    assert(GeoOps.intersects(crossing, r))
    val inside = LineString(IndexedSeq(Pt(2, 2), Pt(3, 3)))
    assert(GeoOps.intersects(inside, r)) // fully inside, no edge crossing
    val outside = LineString(IndexedSeq(Pt(20, 20), Pt(30, 30)))
    assert(!GeoOps.intersects(outside, r))
    assert(GeoOps.intersects(
      LineString(IndexedSeq(Pt(0, 0), Pt(2, 2))),
      LineString(IndexedSeq(Pt(0, 2), Pt(2, 0)))))
    assert(GeoOps.intersects(Point(Pt(1, 1)), Point(Pt(1, 1))))
    assert(!GeoOps.intersects(Point(Pt(1, 1)), Point(Pt(1, 2))))
  }

  test("distance: points, point-polygon, polygon-polygon, intersecting = 0") {
    assert(GeoOps.distance(Point(Pt(0, 0)), Point(Pt(3, 4))) == 5.0)
    assert(GeoOps.distance(Point(Pt(15, 0)), rect(0, 0, 10, 10)) == 5.0)
    assert(GeoOps.distance(rect(0, 0, 1, 1), rect(4, 0, 5, 1)) == 3.0)
    assert(GeoOps.distance(rect(0, 0, 2, 2), rect(1, 1, 3, 3)) == 0.0)
    // contained polygon: distance 0
    assert(GeoOps.distance(rect(3, 3, 4, 4), rect(0, 0, 10, 10)) == 0.0)
    // diagonal separation
    assert(GeoOps.distance(rect(0, 0, 1, 1), rect(4, 5, 6, 7)) == 5.0)
  }

  test("intersection of overlapping rectangles") {
    val g = GeoOps.intersection(rect(0, 0, 4, 4), rect(2, 2, 6, 6))
    assert(GeoOps.area(g) == 4.0)
    val env = g.envelope
    assert(env == Envelope(2, 2, 4, 4))
  }

  test("intersection of disjoint rectangles is empty") {
    val g = GeoOps.intersection(rect(0, 0, 1, 1), rect(5, 5, 6, 6))
    assert(g.isEmpty)
  }

  test("intersection with a CONCAVE clip polygon is area-exact") {
    // L-shape: 4x4 square minus its top-right 2x2 quadrant
    val ell = Polygon(IndexedSeq(IndexedSeq(
      Pt(0, 0), Pt(4, 0), Pt(4, 2), Pt(2, 2), Pt(2, 4), Pt(0, 4), Pt(0, 0))))
    assert(!GeoOps.isConvexRing(ell.shell))
    assert(GeoOps.area(ell) == 12.0)
    // clip a 4x4 square by the L: intersection is the L itself (area 12)
    val sq = rect(0, 0, 4, 4)
    assert(GeoOps.area(GeoOps.intersection(sq, ell)) == 12.0)
    // clip the top-right quadrant (outside the L except edges): area 0
    assert(GeoOps.area(GeoOps.intersection(rect(2.5, 2.5, 4, 4), ell)) == 0.0)
    // a box straddling the notch: only the parts inside the L survive
    val straddle = rect(1, 1, 3, 3)
    // inside-L area = 2x2 box minus its top-right 1x1 corner = 3
    assert(GeoOps.area(GeoOps.intersection(straddle, ell)) == 3.0)
  }

  test("intersection: line/line crossings, touches, collinear overlap") {
    // X crossing at (2, 2)
    val a = LineString(IndexedSeq(Pt(0, 0), Pt(4, 4)))
    val b = LineString(IndexedSeq(Pt(0, 4), Pt(4, 0)))
    assert(GeoOps.intersection(a, b) == Point(Pt(2, 2)))
    // T-touch at an endpoint
    val t = LineString(IndexedSeq(Pt(2, 2), Pt(2, 5)))
    assert(GeoOps.intersection(a, t) == Point(Pt(2, 2)))
    // collinear overlap → the shared sub-segment
    val c = LineString(IndexedSeq(Pt(1, 1), Pt(6, 6)))
    assert(GeoOps.intersection(a, c) == LineString(IndexedSeq(Pt(1, 1), Pt(4, 4))))
    // disjoint parallels → empty
    val p = LineString(IndexedSeq(Pt(0, 1), Pt(4, 5)))
    assert(GeoOps.intersection(a, p).isEmpty)
    // polyline crossing a line twice → MultiPoint in (x, y) order
    val zig = LineString(IndexedSeq(Pt(0, 1), Pt(2, -1), Pt(4, 1)))
    val flat = LineString(IndexedSeq(Pt(-1, 0), Pt(5, 0)))
    assert(GeoOps.intersection(zig, flat) ==
      MultiPoint(IndexedSeq(Point(Pt(1, 0)), Point(Pt(3, 0)))))
  }

  test("intersection: multipoint vs polygon/line keeps covered points") {
    val mp = MultiPoint(IndexedSeq(
      Point(Pt(0.5, 0.5)), Point(Pt(2, 2)), Point(Pt(1, 0)), Point(Pt(0.5, 0.5))))
    val r = rect(0, 0, 1, 1)
    // inside + boundary survive, outside dropped, duplicate collapsed
    assert(GeoOps.intersection(mp, r) ==
      MultiPoint(IndexedSeq(Point(Pt(0.5, 0.5)), Point(Pt(1, 0)))))
    // (0.5, 0.5) and (2, 2) both lie on y = x; (1, 0) does not
    val line = LineString(IndexedSeq(Pt(0, 0), Pt(4, 4)))
    assert(GeoOps.intersection(line, mp) ==
      MultiPoint(IndexedSeq(Point(Pt(0.5, 0.5)), Point(Pt(2, 2)))))
    assert(GeoOps.intersection(mp, LineString(IndexedSeq(Pt(9, 9), Pt(10, 10)))).isEmpty)
  }

  test("triangulation partitions concave polygons") {
    val ell = IndexedSeq(Pt(0, 0), Pt(4, 0), Pt(4, 2), Pt(2, 2), Pt(2, 4), Pt(0, 4), Pt(0, 0))
    val tris = GeoOps.triangulate(ell)
    assert(tris.length == 4) // n-2 triangles for n=6 vertices
    val total = tris.map(t => GeoOps.area(Polygon(IndexedSeq(IndexedSeq(t._1, t._2, t._3, t._1))))).sum
    assert(total == 12.0)
  }

  test("geojson serialization") {
    assert(GeoOps.toGeoJson(Point(Pt(-118.25, 34.05))) ==
      """{"type":"Point","coordinates":[-118.25,34.05]}""")
    assert(GeoOps.toGeoJson(Point(Pt(1.0, 2.0))) ==
      """{"type":"Point","coordinates":[1,2]}""")
    assert(GeoOps.toGeoJson(rect(0, 0, 1, 1)) ==
      """{"type":"Polygon","coordinates":[[[0,0],[1,0],[1,1],[0,1],[0,0]]]}""")
  }
}
