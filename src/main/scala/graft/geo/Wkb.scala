package graft.geo

import java.nio.{ByteBuffer, ByteOrder}

/** Well-Known-Binary reader/writer (ISO WKB + the EWKB extensions the
  * wild produces: Z/M ordinate flags and embedded SRID). Z/M ordinates
  * are read and dropped — the engine is 2-D, like the reference's
  * query surface (/root/reference/src/lib/query.js:39-42 only ever
  * consumes X/Y).
  *
  * Writer always emits little-endian 2-D ISO WKB.
  */
object Wkb {

  // geometry type codes (ISO)
  private final val TPoint = 1
  private final val TLineString = 2
  private final val TPolygon = 3
  private final val TMultiPoint = 4
  private final val TMultiLineString = 5
  private final val TMultiPolygon = 6
  private final val TGeometryCollection = 7

  // EWKB flag bits
  private final val ZFlag = 0x80000000
  private final val MFlag = 0x40000000
  private final val SridFlag = 0x20000000

  def read(bytes: Array[Byte]): Geometry = {
    val buf = ByteBuffer.wrap(bytes)
    readGeom(buf)
  }

  private def readGeom(buf: ByteBuffer): Geometry = {
    val bo = buf.get()
    buf.order(if (bo == 0) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    val rawType = buf.getInt
    var hasZ = (rawType & ZFlag) != 0
    var hasM = (rawType & MFlag) != 0
    val hasSrid = (rawType & SridFlag) != 0
    var baseType = rawType & 0x0fffffff
    // ISO encodes Z/M as +1000/+2000/+3000
    if (baseType >= 3000) { hasZ = true; hasM = true; baseType -= 3000 }
    else if (baseType >= 2000) { hasM = true; baseType -= 2000 }
    else if (baseType >= 1000) { hasZ = true; baseType -= 1000 }
    if (hasSrid) buf.getInt // skip SRID
    val extra = (if (hasZ) 1 else 0) + (if (hasM) 1 else 0)

    def readPt(): Pt = {
      val x = buf.getDouble; val y = buf.getDouble
      var i = 0
      while (i < extra) { buf.getDouble; i += 1 }
      Pt(x, y)
    }
    def readRing(): IndexedSeq[Pt] = {
      val n = buf.getInt
      val arr = new Array[Pt](n)
      var i = 0
      while (i < n) { arr(i) = readPt(); i += 1 }
      scala.collection.immutable.ArraySeq.unsafeWrapArray(arr)
    }

    baseType match {
      case TPoint =>
        val p = readPt()
        Point(p)
      case TLineString => LineString(readRing())
      case TPolygon =>
        val n = buf.getInt
        Polygon(IndexedSeq.tabulate(n)(_ => readRing()))
      case TMultiPoint =>
        val n = buf.getInt
        MultiPoint(IndexedSeq.tabulate(n)(_ => readGeom(buf).asInstanceOf[Point]))
      case TMultiLineString =>
        val n = buf.getInt
        MultiLineString(IndexedSeq.tabulate(n)(_ => readGeom(buf).asInstanceOf[LineString]))
      case TMultiPolygon =>
        val n = buf.getInt
        MultiPolygon(IndexedSeq.tabulate(n)(_ => readGeom(buf).asInstanceOf[Polygon]))
      case TGeometryCollection =>
        val n = buf.getInt
        GeometryCollection(IndexedSeq.tabulate(n)(_ => readGeom(buf)))
      case t =>
        throw new IllegalArgumentException(s"unsupported WKB geometry type $t")
    }
  }

  def write(g: Geometry): Array[Byte] = {
    val buf = ByteBuffer.allocate(size(g)).order(ByteOrder.LITTLE_ENDIAN)
    writeGeom(buf, g)
    buf.array()
  }

  private def size(g: Geometry): Int = g match {
    case _: Point            => 1 + 4 + 16
    case LineString(pts)     => 1 + 4 + 4 + 16 * pts.length
    case Polygon(rings)      => 1 + 4 + 4 + rings.map(r => 4 + 16 * r.length).sum
    case MultiPoint(ps)      => 1 + 4 + 4 + ps.map(size).sum
    case MultiLineString(ls) => 1 + 4 + 4 + ls.map(size).sum
    case MultiPolygon(ps)    => 1 + 4 + 4 + ps.map(size).sum
    case GeometryCollection(gs) => 1 + 4 + 4 + gs.map(size).sum
  }

  private def writeGeom(buf: ByteBuffer, g: Geometry): Unit = {
    buf.put(1.toByte) // little-endian
    g match {
      case Point(p) =>
        buf.putInt(TPoint); buf.putDouble(p.x); buf.putDouble(p.y)
      case LineString(pts) =>
        buf.putInt(TLineString); buf.putInt(pts.length)
        pts.foreach { p => buf.putDouble(p.x); buf.putDouble(p.y) }
      case Polygon(rings) =>
        buf.putInt(TPolygon); buf.putInt(rings.length)
        rings.foreach { r =>
          buf.putInt(r.length)
          r.foreach { p => buf.putDouble(p.x); buf.putDouble(p.y) }
        }
      case MultiPoint(ps) =>
        buf.putInt(TMultiPoint); buf.putInt(ps.length); ps.foreach(writeGeom(buf, _))
      case MultiLineString(ls) =>
        buf.putInt(TMultiLineString); buf.putInt(ls.length); ls.foreach(writeGeom(buf, _))
      case MultiPolygon(ps) =>
        buf.putInt(TMultiPolygon); buf.putInt(ps.length); ps.foreach(writeGeom(buf, _))
      case GeometryCollection(gs) =>
        buf.putInt(TGeometryCollection); buf.putInt(gs.length); gs.foreach(writeGeom(buf, _))
    }
  }
}
