package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DateType, DayTimeIntervalType, IntegerType, LongType, TimestampType}

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
  * is that two-conjunct shape, with `t` and `lo` on opposite sides
  * (either arrangement). Joins that already carry an equi-conjunct are
  * left alone — they hash-join fine without help, and the grid would
  * only add explode overhead. Cell ids use exact integer floor-division
  * (see [[cell]]), negative domains included.
  *
  * Three column domains are recognized, all reduced to an exact long
  * axis before gridding:
  *   - int/long columns with `W` an integer literal (`t < lo + 60L`)
  *   - timestamp columns with `W` an ANSI day-time INTERVAL literal
  *     (`t < lo + INTERVAL '10' MINUTE`) — gridded on `unix_micros`,
  *     W in microseconds; a DayTimeInterval is a fixed micros count, so
  *     constant width is guaranteed (legacy CalendarInterval literals
  *     are NOT matched: their day component is DST-dependent under the
  *     session timezone, i.e. not constant-width)
  *   - date columns with `date_add(lo, k)` — gridded on `unix_date`,
  *     W in days
  */
object RangeJoinRule extends Rule[LogicalPlan] {

  /** Which exact-long axis a matched column pair grids on. */
  private sealed trait Domain
  private case object IntegralDom extends Domain
  private case object TimestampDom extends Domain
  private case object DateDom extends Domain

  /** Matches `lo + W` in every analyzer spelling: integral Add with an
    * int/long literal, TimeAdd with an ANSI day-time interval literal
    * (W normalized to microseconds), date_add with an int literal
    * (W in days). */
  private object LoPlusW {
    def unapply(e: Expression): Option[(Expression, Long, Domain)] = e match {
      case Add(lo, Literal(w: Long, LongType), _)    => Some((lo, w, IntegralDom))
      case Add(Literal(w: Long, LongType), lo, _)    => Some((lo, w, IntegralDom))
      case Add(lo, Literal(w: Int, IntegerType), _)  => Some((lo, w.toLong, IntegralDom))
      case Add(Literal(w: Int, IntegerType), lo, _)  => Some((lo, w.toLong, IntegralDom))
      case TimestampAddInterval(lo, Literal(w: Long, _: DayTimeIntervalType), _) =>
        Some((lo, w, TimestampDom))
      case DateAdd(lo, Literal(w: Int, IntegerType)) => Some((lo, w.toLong, DateDom))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      detect(cond, left, right) match {
        case Some((t, lo, w, dom)) =>
          val (pointSide, intervalSide, pointIsLeft) =
            if (t.references.subsetOf(left.outputSet)) (left, right, true)
            else (right, left, false)
          val pb = Alias(cell(t, w, dom), "_graft_pb")()
          val points = Project(pointSide.output :+ pb, pointSide)
          val c0 = cell(lo, w, dom)
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
    * `t`/`lo` same-domain columns referencing opposite join sides and W
    * a positive constant width. Returns (t, lo, W-in-grid-units, domain). */
  private def detect(cond: Expression, left: LogicalPlan,
                     right: LogicalPlan): Option[(Expression, Expression, Long, Domain)] = {
    def domOk(e: Expression, d: Domain): Boolean = d match {
      case IntegralDom  => e.dataType == LongType || e.dataType == IntegerType
      case TimestampDom => e.dataType == TimestampType
      case DateDom      => e.dataType == DateType
    }
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
    val lt: PartialFunction[Expression, (Expression, Expression, Long, Domain)] = {
      case LessThan(t, LoPlusW(lo, w, d))            => (t, lo, w, d)
      case GreaterThan(LoPlusW(lo, w, d), t)         => (t, lo, w, d)
      case LessThanOrEqual(t, LoPlusW(lo, w, d))     => (t, lo, w, d)
      case GreaterThanOrEqual(LoPlusW(lo, w, d), t)  => (t, lo, w, d)
    }
    cond match {
      case And(a, b) =>
        val parts = Seq((a, b), (b, a))
        parts.collectFirst {
          case (geP, ltP) if ge.isDefinedAt(geP) && lt.isDefinedAt(ltP) &&
              {
                val (t1, lo1) = ge(geP)
                val (t2, lo2, w, d) = lt(ltP)
                w > 0 && t1.semanticEquals(t2) && lo1.semanticEquals(lo2) &&
                  domOk(t1, d) && domOk(lo1, d) &&
                  oneSide(t1) && oneSide(lo1) && opposite(t1, lo1)
              } =>
            val (t1, lo1) = ge(geP)
            val (_, _, w, d) = lt(ltP)
            (t1, lo1, w, d)
        }
      case _ => None
    }
  }

  /** ⌊x / W⌋ as a long, in EXACT integer arithmetic:
    * (x − pmod(x, W)) div W. pmod is non-negative for W > 0, x − pmod
    * is exactly divisible, so truncating division IS floor division (a
    * double-based floor would round t and lo independently above 2^52
    * and silently drop join rows). The one excluded corner: x within W
    * of Long.MinValue makes the aligned window start underflow — i.e.
    * the grid is valid on [Long.MinValue + W, Long.MaxValue], which
    * epoch micros/seconds/days never leave.
    *
    * Axis per domain: integral columns cast to long; timestamps via
    * unix_micros (exact physical micros, no second-truncating cast);
    * dates via unix_date. */
  private def cell(x: Expression, w: Long, dom: Domain): Expression = {
    val xl = dom match {
      case IntegralDom  => Cast(x, LongType)
      case TimestampDom => UnixMicros(x)
      case DateDom      => Cast(UnixDate(x), LongType)
    }
    val wl = Literal(w)
    IntegralDivide(Subtract(xl, Pmod(xl, wl)), wl)
  }
}
