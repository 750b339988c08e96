package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, Cross}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{DoubleType, LongType}
import graft.geo.GeoExpressions.{StDistance, StIntersects}

/** Catalyst optimizer rule: rewrites naive spatial theta-joins into
  * grid-cell equi-joins automatically.
  *
  * A user (or the reference's sqlOverride editor) writing
  *
  * {{{ SELECT ... FROM a JOIN b
  *     ON ABS(a.centroid_lon - b.centroid_lon) < 0.2
  *    AND ABS(a.centroid_lat - b.centroid_lat) < 0.2
  *    AND st_intersects(a.geometry, b.geometry) }}}
  *
  * gets a BroadcastNestedLoopJoin from the stock planner — O(n·m)
  * pairings. This rule detects the coordinate pre-filter pattern
  * (|Δlon| < w ∧ |Δlat| < w with w ≤ 0.2) guarding a spatial
  * predicate, expands the right side to its 3×3 grid-cell
  * neighborhood (cell = 0.2°), and adds (gx, gy) equalities to the
  * join condition — Catalyst then plans a hash join keyed on the
  * cells. The original condition is kept verbatim, so results are
  * identical; a pair passing |Δ| < cell always lands in a neighboring
  * cell.
  *
  * The compiler already emits grid SQL for its own pipelines
  * (compile.GridJoin); this rule extends the same protection to
  * arbitrary user SQL. Registered via [[GraftExtensions]]:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object GridJoinRule extends Rule[LogicalPlan] {

  val CellDeg = 0.2
  private val rewritten = TreeNodeTag[Boolean]("graft.gridJoin.rewritten")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if j.resolved && j.getTagValue(rewritten).isEmpty && eligible(left, right, cond) =>
      val newJoin = rewrite(left, right, cond, hint)
      newJoin.setTagValue(rewritten, true)
      // preserve the original output attribute list
      Project(j.output.map(a => a: NamedExpression), newJoin)
  }

  /** The |Δ| pre-filter bounds on both axes, with windows ≤ cell, and
    * a spatial predicate across the two sides.
    */
  private def eligible(left: LogicalPlan, right: LogicalPlan, cond: Expression): Boolean = {
    val conjuncts = splitConjuncts(cond)
    val hasSpatial = conjuncts.exists {
      case _: StIntersects => true
      case LessThan(_: StDistance, Literal(_, _)) => true
      case GreaterThan(Literal(_, _), _: StDistance) => true
      case _ => false
    }
    // already grid-keyed (our compiler's SQL, or a prior application
    // of this rule) → leave alone, a second 9× expansion is waste
    val alreadyGridded = cond.exists {
      case a: Attribute => a.name == "_gx" || a.name == "_gy" ||
        a.name == "_graft_gx" || a.name == "_graft_gy"
      case _ => false
    }
    hasSpatial && !alreadyGridded &&
      prefilterPair(conjuncts, left, right, "centroid_lon").isDefined &&
      prefilterPair(conjuncts, left, right, "centroid_lat").isDefined
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** Finds ABS(l.col - r.col) < w (either operand order) with
    * w ≤ CellDeg; returns the (left attr, right attr) pair.
    */
  private def prefilterPair(conjuncts: Seq[Expression], left: LogicalPlan,
                            right: LogicalPlan, colName: String): Option[(Attribute, Attribute)] = {
    def attrOf(e: Expression, side: LogicalPlan): Option[Attribute] = e match {
      case a: Attribute if a.name == colName && side.outputSet.contains(a) => Some(a)
      case Cast(inner, _, _, _) => attrOf(inner, side)
      case _ => None
    }
    conjuncts.collectFirst {
      case LessThan(Abs(Subtract(x, y, _), _), lit)
          if literalLe(lit, CellDeg) &&
            ((attrOf(x, left).isDefined && attrOf(y, right).isDefined) ||
             (attrOf(x, right).isDefined && attrOf(y, left).isDefined)) =>
        val la = attrOf(x, left).orElse(attrOf(y, left)).get
        val ra = attrOf(x, right).orElse(attrOf(y, right)).get
        (la, ra)
    }
  }

  private def literalLe(e: Expression, bound: Double): Boolean = e match {
    case Literal(v: Double, DoubleType) => v <= bound
    case Literal(d: org.apache.spark.sql.types.Decimal, _) => d.toDouble <= bound
    case Cast(inner, _, _, _) => literalLe(inner, bound)
    case _ => false
  }

  private def cellOf(a: Expression): Expression =
    Cast(Floor(Divide(Cast(a, DoubleType), Literal(CellDeg, DoubleType))), LongType)

  private def rewrite(left: LogicalPlan, right: LogicalPlan,
                      cond: Expression, hint: JoinHint): Join = {
    val conjuncts = splitConjuncts(cond)
    val (lLon, rLon) = prefilterPair(conjuncts, left, right, "centroid_lon").get
    val (lLat, rLat) = prefilterPair(conjuncts, left, right, "centroid_lat").get

    // 9-way neighbor expansion as a Generate (inline of 9 literal
    // (dx, dy) structs) — pipelined row multiplication inside the
    // stage, no join node, so the expansion can never plan as a
    // nested-loop join
    val dxAttr = AttributeReference("_graft_dx", LongType, nullable = false)()
    val dyAttr = AttributeReference("_graft_dy", LongType, nullable = false)()
    val deltaStructs = for (dx <- -1L to 1L; dy <- -1L to 1L)
      yield CreateStruct(Seq(Literal(dx, LongType), Literal(dy, LongType)))
    val generate = Generate(
      Inline(CreateArray(deltaStructs)),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(dxAttr, dyAttr), child = right)

    // expanded right side with the cell keys projected
    val gxAttr = Alias(Add(cellOf(rLon), dxAttr), "_graft_gx")()
    val gyAttr = Alias(Add(cellOf(rLat), dyAttr), "_graft_gy")()
    val expanded = Project(
      right.output.map(a => a: NamedExpression) ++ Seq(gxAttr, gyAttr),
      generate)

    val keyCond = And(
      EqualTo(gxAttr.toAttribute, cellOf(lLon)),
      EqualTo(gyAttr.toAttribute, cellOf(lLat)))
    Join(left, expanded, Inner, Some(And(keyCond, cond)), hint)
  }
}

/** Session extension registering the grid-join rewrite. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => GridJoinRule)
  }
}
