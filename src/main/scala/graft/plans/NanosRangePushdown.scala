package graft.plans

import scala.annotation.tailrec
import scala.util.control.NonFatal

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DateType, LongType, TimestampNTZType, TimestampType}

/** Recovers parquet filter pushdown for time predicates that compare a
  * COMPUTED expression over a scan column instead of the column itself —
  * without the implied bound the parquet source pushes nothing and every
  * scan reads all row groups; at 100 TB that turns a day-slice query
  * into a full-table read. Two chain families are handled:
  *
  *  - the legacy `events.ts` nanos chain: physically `timestamp[ns]`,
  *    read as a raw `LongType` (`nanosAsLong`) and converted with
  *    `timestamp_micros(ts div 1000)` ([[graft.engine.Tables]]);
  *  - casts over NATIVE timestamp columns (`timestamp[us]` testdata,
  *    read as TIMESTAMP_NTZ): `to_date(ts) BETWEEN d1 AND d2` compares
  *    `cast(ts as date)`, and comparing against a zoned literal inserts
  *    `cast(ts as timestamp)` — neither cast shape is translated by the
  *    V1 source, so both are peeled to an implied bound on the bare
  *    column (exact at day boundaries for NTZ→date, which has no zone
  *    dependence; one day of slack for the zone-dependent shapes).
  *
  * This optimizer rule conjoins, to such filters, an IMPLIED range
  * predicate on the underlying long column. A plain `attr cmp literal`
  * conjunct is exactly what the v1 parquet source translates into a
  * pushed filter, so row-group (and page-index) min/max pruning works
  * again; the original predicate stays in place, so results are
  * bit-identical — the added conjunct only has to be implied, never
  * equivalent.
  *
  * The bound is found by INVERTING the real expression, not by
  * re-deriving its arithmetic: the accepted chains
  * (`IntegralDivide` by a positive constant, `MicrosToTimestamp`) are
  * monotone non-decreasing in the raw long, so `chain(x) >= L` is an
  * upward-closed set of `x` and a 64-step binary search over the long
  * range — evaluating the genuine Catalyst expression at each probe —
  * finds the exact threshold. Truncation-vs-floor division, calendar
  * math, ANSI modes: all irrelevant, because the probe IS the engine's
  * own `eval`. A `cast(... as date)` on top (e.g. `to_date(ts)`) is not
  * globally monotone in exotic zones (midnight-crossing DST rewinds), so
  * it is peeled instead: the date literal is relaxed to an inclusive
  * timestamp bound with one day of slack — `java.time` zone offsets are
  * within +-18 h, so a day over-covers every zone — and the remaining
  * arithmetic chain is inverted exactly.
  *
  * Registered via [[graft.GraftExtensions]] (`injectOptimizerRule`), so
  * it runs inside the operator-optimization fixed point: by then
  * `PushDownPredicates` has moved the filter next to the relation and
  * constant folding has collapsed the literal side. The rule is
  * idempotent (derived conjuncts are `semanticEquals`-deduped against
  * the existing ones), a requirement for fixed-point batches.
  */
object NanosRangePushdown extends Rule[LogicalPlan] with PredicateHelper {

  private val MicrosPerDay = 86400L * 1000000L
  /** Over-covers any `java.time` zone offset (bounded at +-18 h). */
  private val ZoneSlackMicros = MicrosPerDay

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      // Only top-level conjuncts imply anything about the whole filter;
      // a comparison under an Or must not leak a bound.
      val implied = conjuncts.flatMap(derive)
        .filter(_.references.subsetOf(child.outputSet))
        .foldLeft(Vector.empty[Expression]) { (acc, d) =>
          if ((conjuncts ++ acc).exists(_.semanticEquals(d))) acc
          else acc :+ d
        }
      if (implied.isEmpty) f
      else Filter((conjuncts ++ implied).reduceLeft(And), child)
  }

  /** Implied raw-column bounds for one conjunct, or Nil. */
  private def derive(pred: Expression): Seq[Expression] = pred match {
    case cmp: BinaryComparison => (cmp.left, cmp.right) match {
      case (e, l: Literal) if l.value != null => bounds(e, cmp, l, flipped = false)
      case (l: Literal, e) if l.value != null => bounds(e, cmp, l, flipped = true)
      case _ => Nil
    }
    case _ => Nil
  }

  private def bounds(e: Expression, cmp: BinaryComparison, lit: Literal,
      flipped: Boolean): Seq[Expression] = {
    // Directions implied by the (normalized) operator. Strict ops are
    // searched with their inclusive form — at most one unit looser,
    // still implied.
    val lowers: Seq[Boolean] = cmp match {
      case _: EqualTo | _: EqualNullSafe => Seq(true, false)
      case _: GreaterThan | _: GreaterThanOrEqual => Seq(!flipped)
      case _: LessThan | _: LessThanOrEqual => Seq(flipped)
      case _ => Nil
    }
    lowers.flatMap { isLower =>
      peelCast(e, lit, isLower).flatMap { case (inner, bound, peeled) =>
        chainAttr(inner, depth = if (peeled) 1 else 0).flatMap { attr =>
          invert(inner, attr, bound, isLower).map { x =>
            if (isLower) GreaterThanOrEqual(attr, Literal(x, attr.dataType))
            else LessThanOrEqual(attr, Literal(x, attr.dataType))
          }
        }
      }
    }
  }

  /** If `e` is a whitelisted cast over a timestamp chain, replace the
    * literal with an implied bound in the chain's own type and return
    * the chain below the cast (plus a flag that a peel happened, which
    * licenses a bare-attribute chain); otherwise pass through
    * unchanged. Peels:
    *  - ltz→date: inclusive timestamp bound with a day of slack
    *    (zone offsets are within ±18 h);
    *  - ntz→date: EXACT day-boundary bound — NTZ date truncation has no
    *    zone dependence;
    *  - ntz→ltz (comparison against a zoned literal): NTZ bound with a
    *    day of slack over the literal's UTC micros. */
  private def peelCast(e: Expression, lit: Literal,
      isLower: Boolean): Option[(Expression, Literal, Boolean)] = e match {
    case c: Cast if c.dataType == DateType &&
        c.child.dataType == TimestampType =>
      lit match {
        case Literal(days: Int, DateType) =>
          val micros =
            if (isLower) days * MicrosPerDay - ZoneSlackMicros
            else (days + 1L) * MicrosPerDay + ZoneSlackMicros
          Some((c.child, Literal(micros, TimestampType), true))
        case _ => None
      }
    case c: Cast if c.dataType == DateType &&
        c.child.dataType == TimestampNTZType =>
      lit match {
        case Literal(days: Int, DateType) =>
          val micros =
            if (isLower) days * MicrosPerDay
            else (days + 1L) * MicrosPerDay - 1L
          Some((c.child, Literal(micros, TimestampNTZType), true))
        case _ => None
      }
    case c: Cast if c.dataType == TimestampType &&
        c.child.dataType == TimestampNTZType =>
      lit match {
        case Literal(utcMicros: Long, TimestampType) =>
          val micros =
            if (isLower) utcMicros - ZoneSlackMicros
            else utcMicros + ZoneSlackMicros
          Some((c.child, Literal(micros, TimestampNTZType), true))
        case _ => None
      }
    case _: Cast => None // other casts: not in the monotone whitelist
    case _ => Some((e, lit, false))
  }

  /** The single scan-column attribute under a monotone arithmetic
    * chain. `depth > 0` rejects bare `attr cmp lit` conjuncts (nothing
    * to derive — and the exclusion is what makes the rule idempotent);
    * a peeled cast counts as depth, so `cast(ts as date) cmp lit` over
    * a bare native column still derives. */
  @tailrec
  private def chainAttr(e: Expression, depth: Int): Option[AttributeReference] =
    e match {
      case a: AttributeReference if depth > 0 &&
          (a.dataType == LongType || a.dataType == TimestampType ||
            a.dataType == TimestampNTZType) =>
        Some(a)
      case MicrosToTimestamp(c) => chainAttr(c, depth + 1)
      case d: IntegralDivide => d.right match {
        case Literal(v: Long, LongType) if v > 0 => chainAttr(d.left, depth + 1)
        case _ => None
      }
      case _ => None
    }

  /** Binary-search the exact threshold of the monotone predicate
    * `chain(x) >= bound` (or `<=`): 64 probes of the real expression
    * with the attribute substituted. Returns None when the bound is
    * vacuous (everything/nothing satisfies) or any probe throws. */
  private def invert(chain: Expression, attr: AttributeReference,
      bound: Literal, isLower: Boolean): Option[Long] = {
    val template: Long => Expression = x => {
      val sub = chain.transform {
        case a: AttributeReference if a.exprId == attr.exprId =>
          Literal(x, attr.dataType)
      }
      if (isLower) GreaterThanOrEqual(sub, bound)
      else LessThanOrEqual(sub, bound)
    }
    try {
      val p: Long => Boolean = x => template(x).eval(null) == true
      if (isLower) {
        // minimal satisfying x of an upward-closed set
        if (!p(Long.MaxValue)) None // predicate unsatisfiable on longs
        else if (p(Long.MinValue)) None // vacuous bound
        else {
          var lo = Long.MinValue // p false
          var hi = Long.MaxValue // p true
          while (BigInt(hi) - BigInt(lo) > 1) {
            val mid = ((BigInt(lo) + BigInt(hi)) / 2).toLong
            if (p(mid)) hi = mid else lo = mid
          }
          Some(hi)
        }
      } else {
        // maximal satisfying x of a downward-closed set
        if (!p(Long.MinValue)) None
        else if (p(Long.MaxValue)) None
        else {
          var lo = Long.MinValue // p true
          var hi = Long.MaxValue // p false
          while (BigInt(hi) - BigInt(lo) > 1) {
            val mid = ((BigInt(lo) + BigInt(hi)) / 2).toLong
            if (p(mid)) lo = mid else hi = mid
          }
          Some(lo)
        }
      }
    } catch {
      // A throwing probe breaks the monotone-search contract; derive
      // nothing rather than risk an unsound bound.
      case NonFatal(_) => None
    }
  }
}
