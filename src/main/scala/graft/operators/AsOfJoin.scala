package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: for each right-side row, attach the latest left-side row
  * with ts <= right.ts within the same key — THE canonical robotics
  * query over the reference's data model (align two sensor streams on
  * nearest-preceding timestamp; SURVEY.md §2.2 joins, §7.6).
  *
  * Spark has no native as-of join. This packages the union+window
  * technique: tag both sides, union, one window partitioned by key
  * ordered by (ts, tag), carry the last left value forward, keep right
  * rows. Exactly ONE shuffle (by key) and no cross product — survives
  * 100x scale; hot keys bound the window partition (salt upstream if a
  * single key exceeds task memory).
  */
object AsOfJoin {
  /** @param left     the "quotes"/sensor stream providing values
    * @param right    the "trades"/query stream receiving values
    * @param key      equi-key column name present on both sides
    * @param leftTs   event-time column name on `left`
    * @param rightTs  event-time column name on `right`
    * @param valueCols left columns to carry onto right rows (null when
    *                  no left row precedes)
    */
  def apply(left: DataFrame, right: DataFrame, key: String,
            leftTs: String, rightTs: String, valueCols: Seq[String]): DataFrame = {
    val rightCols = right.columns.toSeq
    val l = left.select(
      (col(key).as("__k") +: col(leftTs).as("__ts") +: lit(0).as("__tag") +:
        valueCols.map(c => col(c).as(s"__v_$c"))) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right.select(
      (col(key).as("__k") +: col(rightTs).cast(left.schema(leftTs).dataType).as("__ts") +:
        lit(1).as("__tag") +:
        valueCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"__v_$c"))) ++
        rightCols.map(col): _*)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(s"__v_$c", last(col(s"__v_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__tag") === 1)
      .select(rightCols.map(col) ++ valueCols.map(c => col(s"__v_$c").as(c)): _*)
  }
}
