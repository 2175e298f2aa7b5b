package org.apache.spark.sql.graftfns

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

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

  /** The sec conjuncts implied by one comparison conjunct, if any. */
  private def derived(conjunct: Expression): Seq[Expression] = conjunct match {
    case GreaterThanOrEqual(SplitTs(sec, _), Literal(a: Long, LongType)) =>
      lowerSecBound(a).map(ge(sec, _)).toSeq
    case GreaterThan(SplitTs(sec, _), Literal(a: Long, LongType)) =>
      lowerSecBound(a).map(ge(sec, _)).toSeq
    case LessThanOrEqual(SplitTs(sec, _), Literal(b: Long, LongType)) =>
      upperSecBound(b).map(le(sec, _)).toSeq
    case LessThan(SplitTs(sec, _), Literal(b: Long, LongType)) =>
      upperSecBound(b).map(le(sec, _)).toSeq
    case EqualTo(SplitTs(sec, _), Literal(v: Long, LongType)) =>
      lowerSecBound(v).map(ge(sec, _)).toSeq ++
        upperSecBound(v).map(le(sec, _)).toSeq
    // literal-on-the-left spellings, mirrored
    case GreaterThanOrEqual(Literal(b: Long, LongType), SplitTs(sec, _)) =>
      upperSecBound(b).map(le(sec, _)).toSeq
    case GreaterThan(Literal(b: Long, LongType), SplitTs(sec, _)) =>
      upperSecBound(b).map(le(sec, _)).toSeq
    case LessThanOrEqual(Literal(a: Long, LongType), SplitTs(sec, _)) =>
      lowerSecBound(a).map(ge(sec, _)).toSeq
    case LessThan(Literal(a: Long, LongType), SplitTs(sec, _)) =>
      lowerSecBound(a).map(ge(sec, _)).toSeq
    case EqualTo(Literal(v: Long, LongType), SplitTs(sec, _)) =>
      lowerSecBound(v).map(ge(sec, _)).toSeq ++
        upperSecBound(v).map(le(sec, _)).toSeq
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
