package org.apache.spark.sql.graftplans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.JoinedRow
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Custom logical node for the as-of join — SURVEY.md §7.3 ladder step
  * (c): a whole-operator semantic Spark's built-ins can't express
  * directly, given its own LogicalPlan + Strategy + physical exec
  * (registered through `SparkSessionExtensions` /
  * `experimental.extraStrategies`) instead of an expression-level
  * encoding.
  *
  * Semantics: for every right row, attach the value columns of the
  * LATEST left row with the same key and `leftTs <= rightTs`; nulls for
  * right rows with no preceding left row. Null keys / null timestamps
  * never match (SQL comparison semantics — unlike the union+window
  * encoding, where a null key forms its own window partition). Ties on
  * (key, leftTs) are broken arbitrarily — pre-aggregate the left side
  * if that matters (exactly as with any other engine's ASOF join).
  *
  * Why a custom exec: the union+window form (graft.operators.AsOfJoin)
  * shuffles left+right TOGETHER through one window, buffering window
  * frames; this node shuffles each side once on its own key, sorts
  * within partitions, and streams a single forward merge with O(1)
  * state (one candidate row) — no window buffers, no tag/filter pass,
  * and the planner sees a first-class operator it can place exchanges
  * and sorts around (reusing existing partitioning/ordering when the
  * child already provides it, e.g. bucketed layouts).
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    leftTs: Attribute,
    valueAttrs: Seq[Attribute],
    rightKey: Attribute,
    rightTs: Attribute) extends BinaryNode {

  override def output: Seq[Attribute] =
    right.output ++ valueAttrs.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]. Register via
  * [[GraftPlanExtensions]] or `spark.experimental.extraStrategies`.
  */
object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, lts, vals, rk, rts) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lts, vals, rk, rts) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join: both children hash-clustered by key (the
  * planner inserts/reuses exchanges to co-partition them, exactly as
  * for SortMergeJoin) and sorted by (key, ts); each partition pair then
  * streams one forward merge holding a single candidate row.
  *
  * Scale shape: one shuffle per side (none when a side is already
  * clustered — bucketed tables join exchange-free), per-task memory
  * O(1) beyond the sort, output streamed in right-side order (declared
  * via `outputOrdering`, so a downstream orderBy on (key, ts) is free).
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    leftTs: Attribute,
    valueAttrs: Seq[Attribute],
    rightKey: Attribute,
    rightTs: Attribute) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    right.output ++ valueAttrs.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  // rows stream 1:1 out of the right child's partitions, so both its
  // partitioning and the required (key, ts) sort survive — declaring
  // them lets downstream same-key aggregations/windows/merge-joins
  // skip their exchange AND their sort
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    right.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lRdd = left.execute()
    val rRdd = right.execute()
    require(lRdd.getNumPartitions == rRdd.getNumPartitions,
      s"as-of join children not co-partitioned: ${lRdd.getNumPartitions} vs " +
        s"${rRdd.getNumPartitions} (planner invariant violated)")
    val lOut = left.output
    val rOut = right.output
    val lKey = leftKey; val lTs = leftTs; val vals = valueAttrs
    val rKey = rightKey; val rTs = rightTs
    val outAttrs = output
    lRdd.zipPartitions(rRdd) { (lIter, rIter) =>
      // per-partition: distinct projection buffers, so cross-side
      // comparisons never read a buffer the other side just overwrote
      val keyProjL = UnsafeProjection.create(Seq(lKey), lOut)
      val tsProjL = UnsafeProjection.create(Seq(lTs), lOut)
      val valProjL = UnsafeProjection.create(vals, lOut)
      val keyProjR = UnsafeProjection.create(Seq(rKey), rOut)
      val tsProjR = UnsafeProjection.create(Seq(rTs), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lKey.dataType))
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTs.dataType))
      // the joined value side must be declared nullable here even when
      // the left schema isn't: unmatched right rows read the all-null
      // row, and a non-nullable binding would skip the isNullAt check
      // and read 0/garbage instead of null
      val resultProj =
        UnsafeProjection.create(outAttrs, rOut ++ vals.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullVals = new GenericInternalRow(vals.length)

      new Iterator[InternalRow] {
        private var lrow: InternalRow = if (lIter.hasNext) lIter.next() else null
        private var cand: InternalRow = _     // values of latest matching left row
        private var candKey: InternalRow = _  // its key (copied)

        override def hasNext: Boolean = rIter.hasNext

        override def next(): InternalRow = {
          val rrow = rIter.next()
          val rk = keyProjR(rrow)
          if (rk.isNullAt(0)) {
            // null right key matches nothing; do not consume left rows
            // (they may match later keys — nulls sort first)
            return resultProj(joined(rrow, nullVals))
          }
          val rt = tsProjR(rrow)
          val rtNull = rt.isNullAt(0)
          var advancing = lrow != null
          while (advancing) {
            val lk = keyProjL(lrow)
            val cmp = if (lk.isNullAt(0)) -1 else keyOrd.compare(lk, rk)
            if (cmp < 0) {
              // left key behind (or null) — never matches this or any
              // later right row; skip
              lrow = if (lIter.hasNext) lIter.next() else null
            } else if (cmp == 0 && !rtNull) {
              val lt = tsProjL(lrow)
              if (lt.isNullAt(0) || tsOrd.compare(lt, rt) <= 0) {
                if (!lt.isNullAt(0)) { // null left ts never matches
                  cand = valProjL(lrow).copy()
                  candKey = lk.copy()
                }
                lrow = if (lIter.hasNext) lIter.next() else null
              } else advancing = false // left ts ahead — keep for later rows
            } else advancing = false   // left key ahead, or right ts null
            if (lrow == null) advancing = false
          }
          val matched = cand != null && keyOrd.compare(candKey, rk) == 0
          resultProj(joined(rrow, if (matched) cand else nullVals))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
