package org.apache.spark.sql.graftplans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.DataType

/** DataFrame-facing builder for [[AsOfJoinPlan]] — lives under
  * org.apache.spark.sql because `Dataset.ofRows` (logical plan →
  * DataFrame) is private[sql]. Callers use
  * `graft.operators.AsOfJoin.native(...)`.
  */
object AsOfJoinApi {

  /** @param tsType  pre-computed common event-time type (see
    *        AsOfJoin.widerTsType) both sides' ts are cast to.
    * @param keyType pre-computed common key type: mismatched-but-
    *        joinable key types (int vs long) would otherwise hash to
    *        different partitions (murmur3 of 5 != murmur3 of 5L) and
    *        compare through an ordering built for the wrong physical
    *        type — silent all-null matches.
    *
    * Casts ride on HIDDEN right-side columns only when the type
    * actually needs widening: in the common matched-type case the exec
    * binds the right side's OWN attributes, so its declared
    * partitioning and (key, ts) ordering survive the final projection
    * and downstream same-key consumers really do skip their exchange
    * and sort.
    */
  def asof(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String, valueCols: Seq[String],
           tsType: DataType, keyType: DataType): DataFrame = {
    require(valueCols.nonEmpty && valueCols.distinct == valueCols,
      s"valueCols must be non-empty and distinct, got $valueCols")
    // every working name is reserved on BOTH sides: the final
    // drop(hidden) removes ALL columns of that name, so a valueCol
    // named __asof_rk would silently vanish from the result
    val reserved = Seq("__asof_lk", "__asof_ts", "__asof_rk", "__asof_rts")
    valueCols.foreach { v =>
      require(!reserved.contains(v),
        s"valueCol '$v' collides with a reserved as-of working name ($reserved)")
    }
    val spark = left.sparkSession
    ensureStrategy(spark)
    val resolver = spark.sessionState.analyzer.resolver
    def resolveOn(plan: LogicalPlan, name: String, side: String): Attribute = {
      val ms = plan.output.filter(a => resolver(a.name, name))
      require(ms.size == 1,
        s"column '$name' resolves to ${ms.size} attributes on the $side side")
      ms.head
    }
    val lp = left.select(
      col(key).cast(keyType).as("__asof_lk") +:
        col(leftTs).cast(tsType).as("__asof_ts") +: valueCols.map(col): _*)
    val la = lp.queryExecution.analyzed
    val ra0 = right.queryExecution.analyzed
    val needKeyCast = resolveOn(ra0, key, "right").dataType != keyType
    val needTsCast = resolveOn(ra0, rightTs, "right").dataType != tsType
    val hidden =
      (if (needKeyCast) Seq("__asof_rk") else Nil) ++
        (if (needTsCast) Seq("__asof_rts") else Nil)
    hidden.foreach { h =>
      require(!right.columns.contains(h),
        s"right side already has a column named '$h' (reserved working name)")
    }
    var rp = right
    if (needKeyCast) rp = rp.withColumn("__asof_rk", col(key).cast(keyType))
    if (needTsCast) rp = rp.withColumn("__asof_rts", col(rightTs).cast(tsType))
    val ra = rp.queryExecution.analyzed
    val plan = AsOfJoinPlan(
      la, ra,
      leftKey = la.output.head,
      leftTs = la.output(1),
      valueAttrs = la.output.drop(2),
      rightKey = resolveOn(ra, if (needKeyCast) "__asof_rk" else key, "right"),
      rightTs = resolveOn(ra, if (needTsCast) "__asof_rts" else rightTs, "right"))
    val out = classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
    if (hidden.isEmpty) out else out.drop(hidden: _*)
  }

  /** Idempotently add the strategy to a live session (builder-time
    * wiring: `spark.sql.extensions=...GraftExtensions`).
    */
  def ensureStrategy(s: SparkSession): Unit = synchronized {
    // the strategy may already be live via GraftExtensions
    // (injectPlannerStrategy) — check the PLANNER's effective strategy
    // list, not just extraStrategies, so the recommended extension
    // wiring doesn't accumulate a duplicate per asof() call
    val live = s.sessionState.planner.strategies.contains(AsOfJoinStrategy) ||
      s.experimental.extraStrategies.contains(AsOfJoinStrategy)
    if (!live)
      s.experimental.extraStrategies = s.experimental.extraStrategies :+ AsOfJoinStrategy
  }
}
