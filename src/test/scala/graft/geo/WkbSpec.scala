package graft.geo

import org.scalatest.funsuite.AnyFunSuite

class WkbSpec extends AnyFunSuite {

  private def rt(g: Geometry): Geometry = Wkb.read(Wkb.write(g))

  test("point round-trip") {
    val p = Point(Pt(-118.25, 34.05))
    assert(rt(p) == p)
  }

  test("linestring round-trip") {
    val l = LineString(IndexedSeq(Pt(0, 0), Pt(1, 1), Pt(2, 0.5)))
    assert(rt(l) == l)
  }

  test("polygon with hole round-trip") {
    val poly = Polygon(IndexedSeq(
      IndexedSeq(Pt(0, 0), Pt(10, 0), Pt(10, 10), Pt(0, 10), Pt(0, 0)),
      IndexedSeq(Pt(4, 4), Pt(6, 4), Pt(6, 6), Pt(4, 6), Pt(4, 4))))
    assert(rt(poly) == poly)
  }

  test("multipolygon round-trip") {
    val mp = MultiPolygon(IndexedSeq(
      Polygon(IndexedSeq(IndexedSeq(Pt(0, 0), Pt(1, 0), Pt(1, 1), Pt(0, 0)))),
      Polygon(IndexedSeq(IndexedSeq(Pt(5, 5), Pt(6, 5), Pt(6, 6), Pt(5, 5))))))
    assert(rt(mp) == mp)
  }

  test("geometry collection round-trip") {
    val gc = GeometryCollection(IndexedSeq(
      Point(Pt(1, 2)), LineString(IndexedSeq(Pt(0, 0), Pt(1, 1)))))
    assert(rt(gc) == gc)
  }

  test("big-endian WKB point reads") {
    val buf = java.nio.ByteBuffer.allocate(21)
    buf.put(0.toByte).putInt(1).putDouble(3.5).putDouble(-7.25)
    assert(Wkb.read(buf.array()) == Point(Pt(3.5, -7.25)))
  }

  test("EWKB point with SRID flag reads") {
    val buf = java.nio.ByteBuffer.allocate(25).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(1.toByte).putInt(1 | 0x20000000).putInt(4326).putDouble(1.0).putDouble(2.0)
    assert(Wkb.read(buf.array()) == Point(Pt(1.0, 2.0)))
  }

  test("ISO wkb Z point (type 1001) drops Z") {
    val buf = java.nio.ByteBuffer.allocate(29).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(1.toByte).putInt(1001).putDouble(1.0).putDouble(2.0).putDouble(99.0)
    assert(Wkb.read(buf.array()) == Point(Pt(1.0, 2.0)))
  }

  test("WKT round-trip") {
    val g = GeoOps.fromWkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")
    assert(g.isInstanceOf[Polygon])
    assert(GeoOps.fromWkt(GeoOps.toWkt(g)) == g)
    val mp = GeoOps.fromWkt("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))")
    assert(GeoOps.fromWkt(GeoOps.toWkt(mp)) == mp)
  }
}
