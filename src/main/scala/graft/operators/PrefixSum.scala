package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions.coalesce
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types.LongType

/** Distributed exclusive prefix sum in a total order — the classic
  * two-phase parallel scan, never a single-partition window.
  *
  * `SUM(v) OVER (ORDER BY ...)` with no PARTITION BY collapses onto one
  * task — a non-starter at 100 TB (same failure mode Seqno avoids for
  * row numbering). Instead:
  *
  *  1. range-partition + sort-within-partitions by the order key
  *     (parallel, one shuffle),
  *  2. pin ONE physical plan by materialising the RDD — range bounds
  *     are sampled once and every subsequent job reuses the same
  *     shuffle output (re-planning would re-sample bounds and silently
  *     mis-assign prefixes),
  *  3. per-partition totals: a metadata-sized job emitting ONE long per
  *     partition, scanned on the driver into partition offsets,
  *  4. map phase: each partition streams its rows adding a local
  *     running sum to its broadcast offset.
  *
  * Identical to the serial scan for any total order (callers must make
  * the order key unique with a tie-break column). NULL values count as
  * 0. Cost: one range shuffle + one count-style pass over shuffle files
  * + one map pass — the driver holds numPartitions longs, nothing else.
  */
object PrefixSum {
  private val V = "__ps_v"

  /** @param df       input rows
    * @param sortCols  total order (must be unique — add a tie-break)
    * @param value     summand; cast to long, NULL counts as 0
    * @param out       name of the appended exclusive-prefix column
    */
  def exclusive(df: DataFrame, sortCols: Seq[Column], value: Column,
                out: String = "prefix", numPartitions: Option[Int] = None): DataFrame = {
    require(!df.columns.contains(V), s"input may not use the reserved column name $V")
    require(!df.columns.contains(out), s"output column $out already exists in the input")
    val spark = df.sparkSession
    val n = numPartitions.getOrElse(spark.sessionState.conf.numShufflePartitions)
    val sorted = df
      .withColumn(V, coalesce(value.cast(LongType), lit(0L)))
      .repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val vIdx = sorted.schema.fieldIndex(V)
    // .rdd pins the sampled range bounds; the totals job and the main
    // job both read the same shuffle output (see Seqno for the trap).
    val rdd = sorted.rdd
    val partSums = rdd
      .mapPartitionsWithIndex { (i, it) =>
        var s = 0L
        it.foreach(r => s += r.getLong(vIdx))
        Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _) // exclusive: offsets(i) = sum of parts < i
    val outSchema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields.patch(vIdx, Nil, 1)) // drop the summand copy
      .add(out, LongType, nullable = false)
    val result = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = offsets(i)
      it.map { r =>
        val v = r.getLong(vIdx)
        val cols = r.toSeq.patch(vIdx, Nil, 1) :+ acc
        acc += v
        Row.fromSeq(cols)
      }
    }
    spark.createDataFrame(result, outSchema)
  }
}
