package org.apache.spark.sql.graftplans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.classic
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.DataType

/** DataFrame-facing builder for [[AsOfJoinPlan]] — lives under
  * org.apache.spark.sql because `Dataset.ofRows` (logical plan →
  * DataFrame) is private[sql]. Callers use
  * `graft.operators.AsOfJoin.native(...)`.
  */
object AsOfJoinApi {

  /** @param tsType pre-computed common event-time type (see
    *        AsOfJoin.widerTsType) both sides' ts are cast to.
    */
  def asof(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String, valueCols: Seq[String],
           tsType: DataType): DataFrame = {
    require(valueCols.nonEmpty && valueCols.distinct == valueCols,
      s"valueCols must be non-empty and distinct, got $valueCols")
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lp = left.select(
      col(key) +: col(leftTs).cast(tsType).as("__asof_ts") +: valueCols.map(col): _*)
    val la = lp.queryExecution.analyzed
    val rp = right.withColumn("__asof_rts", col(rightTs).cast(tsType))
    val ra = rp.queryExecution.analyzed
    val plan = AsOfJoinPlan(
      la, ra,
      leftKey = la.output.head,
      leftTs = la.output(1),
      valueAttrs = la.output.drop(2),
      rightKey = ra.output.find(_.name == key).getOrElse(
        throw new IllegalArgumentException(s"right side has no column '$key'")),
      rightTs = ra.output.last)
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
      .drop("__asof_rts")
  }

  /** Idempotently add the strategy to a live session (builder-time
    * wiring: `spark.sql.extensions=...GraftExtensions`).
    */
  def ensureStrategy(s: SparkSession): Unit = synchronized {
    if (!s.experimental.extraStrategies.contains(AsOfJoinStrategy))
      s.experimental.extraStrategies = s.experimental.extraStrategies :+ AsOfJoinStrategy
  }
}
