package graft.geo

/** Planar geometry model backing the engine's ST_* functions.
  *
  * Coordinates are lon/lat degrees treated as a flat plane — this
  * matches the reference engine's semantics, which compares planar
  * degree-space distances (meters are converted via d/111320, see
  * /root/reference/src/lib/pipeline.js:128) and never uses geodesic
  * math.
  *
  * The model is deliberately minimal: the 7 WKB geometry types, an
  * envelope, and the predicates/measures the query surface needs
  * (centroid, distance, intersects, intersection, area).
  */
final case class Pt(x: Double, y: Double)

final case class Envelope(xmin: Double, ymin: Double, xmax: Double, ymax: Double) {
  def intersects(o: Envelope): Boolean =
    xmax >= o.xmin && xmin <= o.xmax && ymax >= o.ymin && ymin <= o.ymax
  def contains(p: Pt): Boolean =
    p.x >= xmin && p.x <= xmax && p.y >= ymin && p.y <= ymax
  def expand(o: Envelope): Envelope =
    Envelope(math.min(xmin, o.xmin), math.min(ymin, o.ymin),
             math.max(xmax, o.xmax), math.max(ymax, o.ymax))
}

sealed trait Geometry {
  def typeName: String
  def envelope: Envelope
  def isEmpty: Boolean
}

final case class Point(p: Pt) extends Geometry {
  def typeName = "POINT"
  def envelope = Envelope(p.x, p.y, p.x, p.y)
  def isEmpty = false
}

final case class LineString(pts: IndexedSeq[Pt]) extends Geometry {
  require(pts.isEmpty || pts.length >= 2, "LineString needs 0 or >=2 points")
  def typeName = "LINESTRING"
  def envelope = Geometry.envelopeOf(pts)
  def isEmpty = pts.isEmpty
}

/** First ring is the shell, the rest are holes. Rings are closed
  * (first point == last point) in WKB; we keep them as stored.
  */
final case class Polygon(rings: IndexedSeq[IndexedSeq[Pt]]) extends Geometry {
  def typeName = "POLYGON"
  def shell: IndexedSeq[Pt] = rings.head
  def holes: IndexedSeq[IndexedSeq[Pt]] = rings.tail
  def envelope = if (isEmpty) Envelope(0, 0, 0, 0) else Geometry.envelopeOf(rings.head)
  def isEmpty = rings.isEmpty || rings.head.isEmpty
}

final case class MultiPoint(points: IndexedSeq[Point]) extends Geometry {
  def typeName = "MULTIPOINT"
  def envelope = Geometry.envelopeOfGeoms(points)
  def isEmpty = points.isEmpty
}

final case class MultiLineString(lines: IndexedSeq[LineString]) extends Geometry {
  def typeName = "MULTILINESTRING"
  def envelope = Geometry.envelopeOfGeoms(lines)
  def isEmpty = lines.isEmpty
}

final case class MultiPolygon(polygons: IndexedSeq[Polygon]) extends Geometry {
  def typeName = "MULTIPOLYGON"
  def envelope = Geometry.envelopeOfGeoms(polygons)
  def isEmpty = polygons.isEmpty
}

final case class GeometryCollection(geoms: IndexedSeq[Geometry]) extends Geometry {
  def typeName = "GEOMETRYCOLLECTION"
  def envelope = Geometry.envelopeOfGeoms(geoms)
  def isEmpty = geoms.isEmpty
}

object Geometry {
  private[geo] def envelopeOf(pts: Iterable[Pt]): Envelope = {
    var xmin = Double.PositiveInfinity; var ymin = Double.PositiveInfinity
    var xmax = Double.NegativeInfinity; var ymax = Double.NegativeInfinity
    pts.foreach { p =>
      if (p.x < xmin) xmin = p.x; if (p.x > xmax) xmax = p.x
      if (p.y < ymin) ymin = p.y; if (p.y > ymax) ymax = p.y
    }
    Envelope(xmin, ymin, xmax, ymax)
  }

  private[geo] def envelopeOfGeoms(gs: Iterable[Geometry]): Envelope =
    gs.map(_.envelope).reduceOption(_ expand _).getOrElse(Envelope(0, 0, 0, 0))
}
