package graft.geo

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ST_* spatial functions as native Catalyst expressions over
  * BinaryType WKB columns.
  *
  * The surface mirrors the 8 spatial functions the reference's query
  * layer generates (/root/reference/src/lib/query.js:40-42,
  * analysisQueries.js:33-52, AnalysisPanel.jsx:44) plus the helpers a
  * scale-out engine needs (st_point/st_area/st_xmin.. for grid
  * bucketing and bbox manifests).
  *
  * Implemented as `Expression` (not Scala UDFs) so Catalyst sees real
  * nullability/type info and the expressions participate in constant
  * folding; evaluation uses CodegenFallback — the per-row cost is
  * dominated by WKB parsing, not the virtual call.
  */
object GeoExpressions {

  private def geom(v: Any): Geometry = Wkb.read(v.asInstanceOf[Array[Byte]])

  abstract class GeoUnary extends UnaryExpression with CodegenFallback {
    override def nullIntolerant: Boolean = true
  }

  abstract class GeoBinary extends BinaryExpression with CodegenFallback {
    override def nullIntolerant: Boolean = true
  }

  /** ST_Point(lon, lat) → WKB point. */
  case class StPoint(left: Expression, right: Expression) extends GeoBinary {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "st_point"
    override protected def nullSafeEval(x: Any, y: Any): Any =
      Wkb.write(Point(Pt(x.asInstanceOf[Double], y.asInstanceOf[Double])))
    override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  }

  /** ST_GeometryType(g) → 'POINT' | 'LINESTRING' | ... */
  case class StGeometryType(child: Expression) extends GeoUnary {
    override def dataType: DataType = StringType
    override def prettyName: String = "st_geometrytype"
    override protected def nullSafeEval(g: Any): Any = UTF8String.fromString(geom(g).typeName)
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** ST_X(point) → x; null for non-points (DuckDB errors; null is the
    * Spark-idiomatic defensive variant).
    */
  case class StX(child: Expression) extends GeoUnary {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "st_x"
    override protected def nullSafeEval(g: Any): Any = geom(g) match {
      case Point(p) => p.x
      case _        => null
    }
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  case class StY(child: Expression) extends GeoUnary {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "st_y"
    override protected def nullSafeEval(g: Any): Any = geom(g) match {
      case Point(p) => p.y
      case _        => null
    }
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  case class StCentroid(child: Expression) extends GeoUnary {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "st_centroid"
    override protected def nullSafeEval(g: Any): Any =
      Wkb.write(Point(GeoOps.centroid(geom(g))))
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  case class StAsGeoJson(child: Expression) extends GeoUnary {
    override def dataType: DataType = StringType
    override def prettyName: String = "st_asgeojson"
    override protected def nullSafeEval(g: Any): Any =
      UTF8String.fromString(GeoOps.toGeoJson(geom(g)))
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  case class StAsText(child: Expression) extends GeoUnary {
    override def dataType: DataType = StringType
    override def prettyName: String = "st_astext"
    override protected def nullSafeEval(g: Any): Any =
      UTF8String.fromString(GeoOps.toWkt(geom(g)))
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  case class StGeomFromText(child: Expression) extends GeoUnary {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "st_geomfromtext"
    override protected def nullSafeEval(s: Any): Any =
      Wkb.write(GeoOps.fromWkt(s.toString))
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** The two join-predicate hot spots carry real `doGenCode` (a static
    * call into GeoKernels) instead of CodegenFallback: the surrounding
    * filter/join stage stays one whole-stage-codegen span, and repeated
    * probes hit GeoKernels' per-thread decoded-WKB cache.
    */
  case class StIntersects(left: Expression, right: Expression) extends BinaryExpression {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = BooleanType
    override def prettyName: String = "st_intersects"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      GeoKernels.intersects(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
      defineCodeGen(ctx, ev, (a, b) => s"graft.geo.GeoKernels.intersects($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  }

  case class StDistance(left: Expression, right: Expression) extends BinaryExpression {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = DoubleType
    override def prettyName: String = "st_distance"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      GeoKernels.distance(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
      defineCodeGen(ctx, ev, (a, b) => s"graft.geo.GeoKernels.distance($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  }

  case class StIntersection(left: Expression, right: Expression) extends GeoBinary {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "st_intersection"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      GeoKernels.intersection(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  }

  case class StArea(child: Expression) extends GeoUnary {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "st_area"
    override protected def nullSafeEval(g: Any): Any = GeoOps.area(geom(g))
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** ST_MakeEnvelope(xmin, ymin, xmax, ymax) → WKB rectangle polygon
    * (PostGIS-style constructor; used for bbox→geometry promotion).
    */
  case class StMakeEnvelope(children: Seq[Expression]) extends Expression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = children.exists(_.nullable)
    override def prettyName: String = "st_makeenvelope"
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val vs = children.map(_.eval(input))
      if (vs.contains(null)) return null
      val Seq(x0, y0, x1, y1) = vs.map(_.asInstanceOf[Double])
      Wkb.write(Polygon(IndexedSeq(IndexedSeq(
        Pt(x0, y0), Pt(x1, y0), Pt(x1, y1), Pt(x0, y1), Pt(x0, y0)))))
    }
    override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) = copy(cs)
  }

  /** ST_MakeLine(a, b) → WKB 2-point LineString from two WKB points. */
  case class StMakeLine(left: Expression, right: Expression) extends GeoBinary {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "st_makeline"
    // returns null for non-point inputs even when children are
    // non-nullable — without this the optimizer may fold IsNotNull away
    override def nullable: Boolean = true
    override protected def nullSafeEval(a: Any, b: Any): Any = (geom(a), geom(b)) match {
      case (Point(p1), Point(p2)) => Wkb.write(LineString(IndexedSeq(p1, p2)))
      case _ => null
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  }

  abstract class EnvSide extends GeoUnary {
    override def dataType: DataType = DoubleType
    protected def pick(e: Envelope): Double
    override protected def nullSafeEval(g: Any): Any = pick(geom(g).envelope)
  }
  case class StXMin(child: Expression) extends EnvSide {
    override def prettyName: String = "st_xmin"
    protected def pick(e: Envelope): Double = e.xmin
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }
  case class StXMax(child: Expression) extends EnvSide {
    override def prettyName: String = "st_xmax"
    protected def pick(e: Envelope): Double = e.xmax
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }
  case class StYMin(child: Expression) extends EnvSide {
    override def prettyName: String = "st_ymin"
    protected def pick(e: Envelope): Double = e.ymin
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }
  case class StYMax(child: Expression) extends EnvSide {
    override def prettyName: String = "st_ymax"
    protected def pick(e: Envelope): Double = e.ymax
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }
}

/** Column-API wrappers + SQL registration. */
object GeoFunctions {
  import GeoExpressions._

  private def col(e: Expression): Column = ColumnBridge.column(e)
  private def ex(c: Column): Expression = ColumnBridge.expression(c)

  def st_point(x: Column, y: Column): Column = col(StPoint(ex(x), ex(y)))
  def st_geometrytype(g: Column): Column = col(StGeometryType(ex(g)))
  def st_x(g: Column): Column = col(StX(ex(g)))
  def st_y(g: Column): Column = col(StY(ex(g)))
  def st_centroid(g: Column): Column = col(StCentroid(ex(g)))
  def st_asgeojson(g: Column): Column = col(StAsGeoJson(ex(g)))
  def st_astext(g: Column): Column = col(StAsText(ex(g)))
  def st_geomfromtext(s: Column): Column = col(StGeomFromText(ex(s)))
  def st_intersects(a: Column, b: Column): Column = col(StIntersects(ex(a), ex(b)))
  def st_distance(a: Column, b: Column): Column = col(StDistance(ex(a), ex(b)))
  def st_intersection(a: Column, b: Column): Column = col(StIntersection(ex(a), ex(b)))
  def st_area(g: Column): Column = col(StArea(ex(g)))
  def st_makeenvelope(x0: Column, y0: Column, x1: Column, y1: Column): Column =
    col(StMakeEnvelope(Seq(ex(x0), ex(y0), ex(x1), ex(y1))))
  def st_makeline(a: Column, b: Column): Column = col(StMakeLine(ex(a), ex(b)))
  def st_xmin(g: Column): Column = col(StXMin(ex(g)))
  def st_xmax(g: Column): Column = col(StXMax(ex(g)))
  def st_ymin(g: Column): Column = col(StYMin(ex(g)))
  def st_ymax(g: Column): Column = col(StYMax(ex(g)))

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "st_point" -> { es => StPoint(es(0), es(1)) },
    "st_geometrytype" -> { es => StGeometryType(es.head) },
    "st_x" -> { es => StX(es.head) },
    "st_y" -> { es => StY(es.head) },
    "st_centroid" -> { es => StCentroid(es.head) },
    "st_asgeojson" -> { es => StAsGeoJson(es.head) },
    "st_astext" -> { es => StAsText(es.head) },
    "st_geomfromtext" -> { es => StGeomFromText(es.head) },
    "st_intersects" -> { es => StIntersects(es(0), es(1)) },
    "st_distance" -> { es => StDistance(es(0), es(1)) },
    "st_intersection" -> { es => StIntersection(es(0), es(1)) },
    "st_area" -> { es => StArea(es.head) },
    "st_makeenvelope" -> { es => StMakeEnvelope(es) },
    "st_makeline" -> { es => StMakeLine(es(0), es(1)) },
    "st_xmin" -> { es => StXMin(es.head) },
    "st_xmax" -> { es => StXMax(es.head) },
    "st_ymin" -> { es => StYMin(es.head) },
    "st_ymax" -> { es => StYMax(es.head) },
    // write-clustering key for sqlOverride users: graft_zorder(lon, lat[, bits])
    "graft_zorder" -> { es =>
      SpaceCurve.zorderKeyExpr(es(0), es(1), es.lift(2).map(litToInt).getOrElse(16))
    },
  )

  private def litToInt(e: Expression): Int = e.eval() match {
    case i: Int  => i
    case l: Long => l.toInt
    case other   => throw new IllegalArgumentException(s"expected integer literal, got $other")
  }

  /** Register every ST_ function for SQL use on this session. Idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "built-in")
    }
  }
}
