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
  import org.apache.spark.sql.types._

  private val integral: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)

  /** Common event-time type both sides are cast TO (never a narrowing
    * cast of either side): identical types pass through; date widens to
    * the other side's timestamp flavor; integral pairs widen losslessly
    * to the larger of the two; float widens to double. Only mixed
    * numeric/temporal combinations (e.g. double vs timestamp — no
    * lossless common type exists) fail loudly at plan time.
    */
  private[operators] def widerTsType(l: DataType, r: DataType): DataType = (l, r) match {
    case (a, b) if a == b => a
    case (DateType, TimestampType) | (TimestampType, DateType) => TimestampType
    case (DateType, TimestampNTZType) | (TimestampNTZType, DateType) => TimestampNTZType
    case (a, b) if integral.contains(a) && integral.contains(b) =>
      if (a.defaultSize >= b.defaultSize) a else b
    case (FloatType, DoubleType) | (DoubleType, FloatType) =>
      DoubleType  // float -> double is exact; numeric-seconds streams
    case (a, b) => throw new IllegalArgumentException(
      s"as-of join column types must match or widen losslessly; got $a vs $b")
  }

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
    val tsType = widerTsType(left.schema(leftTs).dataType, right.schema(rightTs).dataType)
    val lvType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => left.schema(left.schema.fieldIndex(c))))
    // ALL carried values travel in ONE struct: the struct is non-null
    // for every left row (even if its fields are null), so
    // last(ignoreNulls) distinguishes "no left row yet" (null struct)
    // from "left value is null" — and a right row can never mix fields
    // from different left rows.
    val l = left.select(
      (col(key).as("__k") +: col(leftTs).cast(tsType).as("__ts") +: lit(0).as("__tag") +:
        struct(valueCols.map(col): _*).as("__lv") +: Nil) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right.select(
      (col(key).as("__k") +: col(rightTs).cast(tsType).as("__ts") +:
        lit(1).as("__tag") +: lit(null).cast(lvType).as("__lv") +: Nil) ++
        rightCols.map(col): _*)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__lv", last(col("__lv"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(rightCols.map(col) ++ valueCols.map(c => col(s"__lv.$c").as(c)): _*)
  }

  /** The custom-operator form of the same join: a first-class
    * AsOfJoinPlan logical node planned to a sort-merge AsOfJoinExec
    * (SURVEY.md §7.3 ladder (c); see
    * org.apache.spark.sql.graftplans.AsOfJoinPlan for semantics and the
    * comparison with the union+window encoding above). Same arguments,
    * same output columns. Differences: null KEYS never match here (SQL
    * comparison semantics), whereas the window form groups null keys
    * into their own partition and matches within it.
    */
  def native(left: DataFrame, right: DataFrame, key: String,
             leftTs: String, rightTs: String, valueCols: Seq[String]): DataFrame = {
    val tsType = widerTsType(left.schema(leftTs).dataType, right.schema(rightTs).dataType)
    // keys get the same lossless-widen-or-fail treatment as timestamps:
    // an int-vs-long key pair must hash and compare in ONE type or
    // equal keys land in different shuffle partitions
    val keyType = widerTsType(left.schema(key).dataType, right.schema(key).dataType)
    org.apache.spark.sql.graftplans.AsOfJoinApi.asof(
      left, right, key, leftTs, rightTs, valueCols, tsType, keyType)
  }
}
