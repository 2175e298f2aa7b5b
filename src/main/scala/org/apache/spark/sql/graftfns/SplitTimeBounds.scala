package org.apache.spark.sql.graftfns

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Optimizer rule: infer pushable SECONDS bounds from range predicates
  * over a split-timestamp reconstruction
  *
  * {{{ cast(sec as bigint) * 1000000000L + cast(nsec as bigint) }}}
  *
  * — the shape `MixedRead.spine` gives rosbag1's (time_sec, time_nsec)
  * receipt pair when normalizing to one nanosecond `timestamp` column.
  * A filter `timestamp >= T` over the mixed spine pushes into the mcap
  * (log_time) and db3 (timestamp) branches natively, but the bag
  * branch's column is COMPUTED — the DSv2 pushdown only sees raw
  * attributes, so time-range queries degraded to post-scan filters
  * there and every bag chunk was read. This rule adds the implied raw
  * `time_sec` conjunct, which the rosbag source's pushdown then turns
  * into chunk-info pruning.
  *
  * Soundness needs NO rosbag-specific assumption (not even
  * 0 <= nsec < 1e9): for any int-typed `nsec`, `-2^31 <= nsec <=
  * 2^31-1`, so
  *
  *  - `ts >= a`  implies  `sec >= floorDiv(a - (2^31-1), 1e9)`
  *  - `ts <= b`  implies  `sec <= floorDiv(b + 2^31,     1e9)`
  *
  * (±2-3 seconds of slack; the original predicate still filters rows
  * exactly, the derived one only PRUNES). `sec * 1e9 + nsec` cannot
  * overflow a long for int-typed inputs, so the algebra is exact.
  * Strict comparisons use the same bound (weaker, still sound);
  * equality derives both. Bounds outside the Int range derive nothing
  * (no constraint expressible on the int column). The derived conjunct
  * is added only if not already present, so the fixpoint batch
  * terminates.
  */
object SplitTimeBounds extends Rule[LogicalPlan] {

  private val NsPerSec = 1000000000L

  /** Matches cast(sec:int as long) * 1e9 + cast(nsec:int as long),
    * either multiplicand order, returning (sec, nsec) attributes.
    */
  private object SplitTs {
    private def longOfInt(e: Expression): Option[Attribute] = e match {
      case Cast(a: AttributeReference, LongType, _, _)
        if a.dataType == IntegerType => Some(a)
      case _ => None
    }
    private def secTerm(e: Expression): Option[Attribute] = e match {
      case Multiply(l, Literal(NsPerSec, LongType), _) => longOfInt(l)
      case Multiply(Literal(NsPerSec, LongType), r, _) => longOfInt(r)
      case _ => None
    }
    def unapply(e: Expression): Option[(Attribute, Attribute)] = e match {
      case Add(l, r, _) =>
        secTerm(l).flatMap(s => longOfInt(r).map(n => (s, n)))
          .orElse(secTerm(r).flatMap(s => longOfInt(l).map(n => (s, n))))
      case _ => None
    }
  }

  private def lowerSecBound(a: Long): Option[Int] = {
    // sec >= floorDiv(a - (2^31 - 1), 1e9); overflow -> no bound
    val x = try Math.subtractExact(a, Int.MaxValue.toLong)
      catch { case _: ArithmeticException => return None }
    val b = Math.floorDiv(x, NsPerSec)
    if (b > Int.MaxValue || b < Int.MinValue) None else Some(b.toInt)
  }

  private def upperSecBound(b: Long): Option[Int] = {
    val x = try Math.addExact(b, 1L + Int.MaxValue.toLong) // + 2^31
      catch { case _: ArithmeticException => return None }
    val u = Math.floorDiv(x, NsPerSec)
    if (u > Int.MaxValue || u < Int.MinValue) None else Some(u.toInt)
  }

  private def ge(sec: Attribute, v: Int): Expression =
    GreaterThanOrEqual(sec, Literal(v, IntegerType))
  private def le(sec: Attribute, v: Int): Expression =
    LessThanOrEqual(sec, Literal(v, IntegerType))

  /** A user SPELLING of the split timestamp — the raw reconstruction,
    * its double widening (`timestamp >= 1.7e18` coerces the long
    * column to double), a double division (`timestamp / 1e9 >= T`,
    * epoch seconds) or an integral division (`timestamp div 1000000000`).
    * Each maps a comparison literal back into sound NANOSECOND bounds;
    * the double paths widen by [[FpSlack]] (covers the ≤3 roundings —
    * cast, divide, product — each ≤2⁻⁵³ relative, ≤ ~3·10³ ns absolute
    * at the long range's edge), negligible next to the ±2-3 s the
    * sec-bound derivation already concedes.
    */
  private sealed trait TsShape { def sec: Attribute }
  private final case class TsDirect(sec: Attribute) extends TsShape
  private final case class TsDouble(sec: Attribute) extends TsShape
  private final case class TsDivDouble(sec: Attribute, den: Double) extends TsShape
  private final case class TsDivIntegral(sec: Attribute, den: Long) extends TsShape

  private val FpSlack = 1L << 14 // 16384 ns

  private object Shape {
    def unapply(e: Expression): Option[TsShape] = e match {
      case SplitTs(sec, _) => Some(TsDirect(sec))
      case Cast(SplitTs(sec, _), DoubleType, _, _) => Some(TsDouble(sec))
      case Divide(Cast(SplitTs(sec, _), DoubleType, _, _),
          Literal(d: Double, DoubleType), _)
        if d > 0 && java.lang.Double.isFinite(d) => Some(TsDivDouble(sec, d))
      case IntegralDivide(SplitTs(sec, _), Literal(d: Long, LongType), _)
        if d > 0 => Some(TsDivIntegral(sec, d))
      case _ => None
    }
  }

  /** A finite double safely into the long range, else None (a bound
    * past ±2^63 constrains nothing expressible).
    */
  private def toNsLong(v: Double): Option[Long] =
    if (!java.lang.Double.isFinite(v) || v > 9.2e18 || v < -9.2e18) None
    else Some(v.toLong)

  /** The implied ns-domain LOWER bound of `shape >= lit` (and, weaker
    * but sound, of the strict form).
    */
  private def lowerNs(shape: TsShape, lit: Any): Option[Long] =
    (shape, lit) match {
      case (TsDirect(_), a: Long) => Some(a)
      case (TsDouble(_), t: Double) => toNsLong(t).map(_ - FpSlack)
      case (TsDivDouble(_, den), t: Double) => toNsLong(t * den).map(_ - FpSlack)
      case (TsDivIntegral(_, den), s: Long) =>
        // trunc(x / den) >= S implies x > (S - 1) * den, both signs
        try Some(Math.addExact(Math.multiplyExact(
          Math.subtractExact(s, 1L), den), 1L))
        catch { case _: ArithmeticException => None }
      case _ => None
    }

  /** The implied ns-domain UPPER bound of `shape <= lit`. */
  private def upperNs(shape: TsShape, lit: Any): Option[Long] =
    (shape, lit) match {
      case (TsDirect(_), b: Long) => Some(b)
      case (TsDouble(_), t: Double) => toNsLong(t).map(_ + FpSlack)
      case (TsDivDouble(_, den), t: Double) => toNsLong(t * den).map(_ + FpSlack)
      case (TsDivIntegral(_, den), s: Long) =>
        // trunc(x / den) <= S implies x < (S + 1) * den, both signs
        try Some(Math.subtractExact(Math.multiplyExact(
          Math.addExact(s, 1L), den), 1L))
        catch { case _: ArithmeticException => None }
      case _ => None
    }

  /** Canonicalize literal-on-the-left comparisons so `derived` matches
    * one orientation.
    */
  private def flipLiteralLeft(e: Expression): Expression = e match {
    case GreaterThan(l: Literal, r) => LessThan(r, l)
    case GreaterThanOrEqual(l: Literal, r) => LessThanOrEqual(r, l)
    case LessThan(l: Literal, r) => GreaterThan(r, l)
    case LessThanOrEqual(l: Literal, r) => GreaterThanOrEqual(r, l)
    case EqualTo(l: Literal, r) => EqualTo(r, l)
    case other => other
  }

  /** The sec conjuncts implied by one comparison conjunct, if any. */
  private def derived(conjunct: Expression): Seq[Expression] =
    flipLiteralLeft(conjunct) match {
      case GreaterThanOrEqual(Shape(s), Literal(v, _)) =>
        lowerNs(s, v).flatMap(lowerSecBound).map(ge(s.sec, _)).toSeq
      case GreaterThan(Shape(s), Literal(v, _)) =>
        lowerNs(s, v).flatMap(lowerSecBound).map(ge(s.sec, _)).toSeq
      case LessThanOrEqual(Shape(s), Literal(v, _)) =>
        upperNs(s, v).flatMap(upperSecBound).map(le(s.sec, _)).toSeq
      case LessThan(Shape(s), Literal(v, _)) =>
        upperNs(s, v).flatMap(upperSecBound).map(le(s.sec, _)).toSeq
      case EqualTo(Shape(s), Literal(v, _)) =>
        lowerNs(s, v).flatMap(lowerSecBound).map(ge(s.sec, _)).toSeq ++
          upperNs(s, v).flatMap(upperSecBound).map(le(s.sec, _)).toSeq
      case _ => Seq.empty
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val existing = splitConjuncts(cond)
      val add = existing.flatMap(derived)
        .filterNot(d => existing.exists(_.semanticEquals(d)))
        .distinct
      if (add.isEmpty) f
      else Filter(add.foldLeft(cond)(And(_, _)), child)
  }
}
