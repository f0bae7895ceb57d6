package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule (custom-operator route (c): `Rule[LogicalPlan]` via
  * `SparkSessionExtensions.injectOptimizerRule`): rewrites a
  * CONSTANT-WIDTH pure range join into the bucket-grid equi-join that
  * `operators.Intervals.rangeJoin` builds by hand.
  *
  * An inner join whose only condition is
  * {{{ t >= lo AND t < lo + W }}}  (W a positive integer literal)
  * has no equi-conjunct, so Spark can only plan it as a broadcast
  * nested-loop / cartesian — O(|points|·|intervals|) comparisons, the
  * canonical 100-TB scale-killer. Because the window width is the
  * constant W, every interval [lo, lo+W) overlaps exactly the two
  * W-wide grid cells ⌊lo/W⌋ and ⌊lo/W⌋+1, and a point lives in exactly
  * one cell ⌊t/W⌋ — so the join is equivalent to an EQUI-join on the
  * cell id followed by the original predicate as a filter (each
  * qualifying pair meets on exactly one cell: the interval's two cell
  * ids are distinct, the point has one). The rewrite:
  *
  * {{{
  *   Join(P, I, Inner, t >= lo && t < lo + W)
  * =>
  *   Project(original output,
  *     Filter(t >= lo && t < lo + W,            // exact semantics
  *       Join(P + [_pb = floor(t/W)],
  *            Generate(explode([floor(lo/W), floor(lo/W)+1]), I),
  *            Inner, _pb = _ib)))               // now an equi-join
  * }}}
  *
  * Deliberately narrow: fires only on Inner joins whose ENTIRE condition
  * is that two-conjunct shape over int/long columns, with `t` and `lo`
  * on opposite sides (either arrangement). Joins that already carry an
  * equi-conjunct are left alone — they hash-join fine without help, and
  * the grid would only add explode overhead. Cell ids use exact integer
  * floor-division (see [[cell]]), so the two-cell cover holds over the
  * full long range, negative domains included.
  */
object RangeJoinRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      detect(cond, left, right) match {
        case Some((t, lo, w)) =>
          val (pointSide, intervalSide, pointIsLeft) =
            if (t.references.subsetOf(left.outputSet)) (left, right, true)
            else (right, left, false)
          val pb = Alias(cell(t, w), "_graft_pb")()
          val points = Project(pointSide.output :+ pb, pointSide)
          val c0 = cell(lo, w)
          val ib = AttributeReference("_graft_ib", LongType)()
          val intervals = Generate(
            Explode(CreateArray(Seq(c0, Add(c0, Literal(1L))))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(ib), child = intervalSide)
          val (l2, r2) =
            if (pointIsLeft) (points, intervals) else (intervals, points)
          val equi = Join(l2, r2, Inner,
            Some(EqualTo(pb.toAttribute, ib)), hint)
          Project(j.output, Filter(cond, equi))
        case None => j
      }
  }

  /** Match `t >= lo && t < lo + W` (or the commuted comparisons) with
    * `t`/`lo` integral columns referencing opposite join sides and W a
    * positive int/long literal. Returns (t, lo, W). */
  private def detect(cond: Expression, left: LogicalPlan,
                     right: LogicalPlan): Option[(Expression, Expression, Long)] = {
    def integral(e: Expression): Boolean =
      e.dataType == LongType || e.dataType == IntegerType
    // one side only, and deterministic — a rand() bound must not rewrite
    def oneSide(e: Expression): Boolean =
      e.deterministic && e.references.nonEmpty &&
        (e.references.subsetOf(left.outputSet) ||
         e.references.subsetOf(right.outputSet))
    def opposite(a: Expression, b: Expression): Boolean =
      (a.references.subsetOf(left.outputSet) &&
        b.references.subsetOf(right.outputSet)) ||
      (a.references.subsetOf(right.outputSet) &&
        b.references.subsetOf(left.outputSet))
    val ge: PartialFunction[Expression, (Expression, Expression)] = {
      case GreaterThanOrEqual(t, lo) => (t, lo)
      case LessThanOrEqual(lo, t) => (t, lo)
    }
    // upper bound: open (t < lo + W) or closed/BETWEEN (t <= lo + W) —
    // both fit the two-cell cover, since floor((lo+W)/W) = floor(lo/W)+1
    // exactly when W divides the grid (it does: the grid IS W-wide)
    val lt: PartialFunction[Expression, (Expression, Expression, Long)] = {
      case LessThan(t, Add(lo, Literal(w: Long, _), _)) => (t, lo, w)
      case LessThan(t, Add(Literal(w: Long, _), lo, _)) => (t, lo, w)
      case LessThan(t, Add(lo, Literal(w: Int, _), _)) => (t, lo, w.toLong)
      case LessThan(t, Add(Literal(w: Int, _), lo, _)) => (t, lo, w.toLong)
      case GreaterThan(Add(lo, Literal(w: Long, _), _), t) => (t, lo, w)
      case GreaterThan(Add(Literal(w: Long, _), lo, _), t) => (t, lo, w)
      case GreaterThan(Add(lo, Literal(w: Int, _), _), t) => (t, lo, w.toLong)
      case GreaterThan(Add(Literal(w: Int, _), lo, _), t) => (t, lo, w.toLong)
      case LessThanOrEqual(t, Add(lo, Literal(w: Long, _), _)) => (t, lo, w)
      case LessThanOrEqual(t, Add(Literal(w: Long, _), lo, _)) => (t, lo, w)
      case LessThanOrEqual(t, Add(lo, Literal(w: Int, _), _)) => (t, lo, w.toLong)
      case LessThanOrEqual(t, Add(Literal(w: Int, _), lo, _)) => (t, lo, w.toLong)
      case GreaterThanOrEqual(Add(lo, Literal(w: Long, _), _), t) => (t, lo, w)
      case GreaterThanOrEqual(Add(Literal(w: Long, _), lo, _), t) => (t, lo, w)
      case GreaterThanOrEqual(Add(lo, Literal(w: Int, _), _), t) => (t, lo, w.toLong)
      case GreaterThanOrEqual(Add(Literal(w: Int, _), lo, _), t) => (t, lo, w.toLong)
    }
    cond match {
      case And(a, b) =>
        val parts = Seq((a, b), (b, a))
        parts.collectFirst {
          case (geP, ltP) if ge.isDefinedAt(geP) && lt.isDefinedAt(ltP) &&
              {
                val (t1, lo1) = ge(geP)
                val (t2, lo2, w) = lt(ltP)
                w > 0 && t1.semanticEquals(t2) && lo1.semanticEquals(lo2) &&
                  integral(t1) && integral(lo1) &&
                  oneSide(t1) && oneSide(lo1) && opposite(t1, lo1)
              } =>
            val (t1, lo1) = ge(geP)
            val (_, _, w) = lt(ltP)
            (t1, lo1, w)
        }
      case _ => None
    }
  }

  /** ⌊x / W⌋ as a long, in EXACT integer arithmetic:
    * (x − pmod(x, W)) div W. pmod is non-negative for W > 0, x − pmod
    * is exactly divisible, so truncating division IS floor division —
    * valid over the full long range (a double-based floor would round
    * t and lo independently above 2^52 and silently drop join rows). */
  private def cell(x: Expression, w: Long): Expression = {
    val xl = Cast(x, LongType)
    val wl = Literal(w)
    IntegralDivide(Subtract(xl, Pmod(xl, wl)), wl)
  }
}
