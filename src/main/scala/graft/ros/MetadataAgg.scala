package graft.ros

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Metadata-only aggregate pushdown for the container sources: the
  * "rosbag info" query class — `count(*)`, `groupBy(topic/…).count()`
  * and ungrouped `min/max(timestamp)` — answered from each
  * container's OWN metadata (rosbag chunk-info per-connection counts
  * and start/end times, MCAP summary Statistics, the db3 b-tree
  * itself) without reading a single chunk body. At fleet scale that
  * turns a full-archive scan into a per-file index read.
  *
  * Scope is deliberately narrow and sound: untyped scans, no pushed
  * filters (Spark only offers aggregate pushdown when every filter was
  * fully consumed, and these sources always retain residuals), no
  * limit, COUNT(*)/MIN/MAX aggregates only ([[parse]]), grouping only
  * by catalog columns whose values the metadata carries — and only
  * under pure counts, since the metadata has per-channel counts but
  * not per-channel time ranges. `supportCompletePushDown` stays
  * false: the scan returns PARTIAL per-file rows and Spark's final
  * aggregate combines them — correct under every grouping.
  */
object MetadataAgg {

  /** The pushed-aggregate output schema: group columns (spine types)
    * then one non-null LongType per COUNT(*).
    */
  def schema(cols: Seq[String], spine: StructType, nCounts: Int): StructType =
    StructType(cols.map(c => spine(spine.fieldIndex(c))) ++
      (0 until nCounts).map(i =>
        StructField(s"count_$i", LongType, nullable = false)))

  /** Partial rows: per (file-level group key) counts, to be summed by
    * Spark's final aggregate. `perUnit` = one (groupable values by
    * column name, count) per metadata unit (a bag connection, an mcap
    * channel).
    */
  def rows(cols: Seq[String], nCounts: Int,
           perUnit: Seq[(Map[String, Any], Long)]): Seq[Seq[Any]] =
    if (perUnit.isEmpty && cols.isEmpty)
      // Ungrouped COUNT(*) over a fleet with zero count units (bags
      // with no chunks, mcap Statistics with an empty channel map):
      // Spark rewrites the final COUNT as SUM over the partials, and
      // SUM over an empty ungrouped input is NULL — one explicit zero
      // partial keeps df.count() == 0. Grouped counts correctly stay
      // empty (no groups).
      Seq(Seq.fill(nCounts)(0L))
    else
      perUnit.groupBy { case (vals, _) => cols.map(vals) }
        .map { case (key, units) =>
          val n = units.map(_._2).sum
          key ++ Seq.fill(nCounts)(n)
        }.toSeq

  /** One requested aggregate of a pushed "rosbag info" aggregation:
    * `count(*)`, or min/max over a timestamp column the container's
    * metadata carries a range for.
    */
  sealed trait AggSpec
  case object CountStarSpec extends AggSpec
  final case class MinSpec(col: String) extends AggSpec
  final case class MaxSpec(col: String) extends AggSpec

  /** Parse an Aggregation into (group columns, agg specs) iff every
    * piece is answerable from container metadata:
    *
    *   - aggregates: COUNT(*) always; MIN/MAX only over `minMaxCols`
    *     (the timestamp column whose range the format's writer stamps
    *     — chunk-info start/end, MCAP Statistics start/end);
    *   - grouping: plain columns from `groupable`. By default grouped
    *     MIN/MAX is refused — writer-stamped metadata (chunk-info, MCAP
    *     Statistics) has per-connection/channel counts but not
    *     per-group time ranges. A source whose metadata walk CAN see
    *     per-group values (db3's leaf-prefix walk reads topic_id and
    *     timestamp together) passes `groupedMinMax = true`.
    *
    * None = not pushable, run the normal scan.
    */
  def parse(agg: Aggregation, groupable: Set[String],
            minMaxCols: Set[String], groupedMinMax: Boolean = false)
      : Option[(Seq[String], Seq[AggSpec])] = {
    def named(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case f: NamedReference if f.fieldNames.length == 1 =>
        Some(f.fieldNames.head)
      case _ => None
    }
    val specs = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => CountStarSpec
      case m: Min =>
        named(m.column).filter(minMaxCols) match {
          case Some(c) => MinSpec(c)
          case None => return None
        }
      case m: Max =>
        named(m.column).filter(minMaxCols) match {
          case Some(c) => MaxSpec(c)
          case None => return None
        }
      case _ => return None
    }
    if (specs.isEmpty) return None
    val cols = agg.groupByExpressions.toSeq.map {
      case f: NamedReference if f.fieldNames.length == 1 => f.fieldNames.head
      case _ => return None
    }
    if (!cols.forall(groupable)) return None
    if (cols.nonEmpty && !groupedMinMax &&
      !specs.forall(_ == CountStarSpec)) return None
    Some((cols, specs))
  }

  /** Pushed-aggregate output schema for the grouped min/max path:
    * the group columns (spine types) followed by [[schemaFor]]'s agg
    * columns.
    */
  def schemaGrouped(cols: Seq[String], spine: StructType,
                    specs: Seq[AggSpec]): StructType =
    StructType(cols.map(c => spine(spine.fieldIndex(c))) ++
      schemaFor(specs, spine).fields)

  /** Pushed-aggregate output schema for an [[AggSpec]] list (ungrouped
    * min/max path): counts are non-null longs; min/max columns carry
    * the spine column's own type, nullable because a file with zero
    * messages contributes a (0, null, null) partial row.
    */
  def schemaFor(specs: Seq[AggSpec], spine: StructType): StructType =
    StructType(specs.zipWithIndex.map {
      case (CountStarSpec, i) =>
        StructField(s"count_$i", LongType, nullable = false)
      case (MinSpec(c), i) =>
        StructField(s"min_$i", spine(spine.fieldIndex(c)).dataType,
          nullable = true)
      case (MaxSpec(c), i) =>
        StructField(s"max_$i", spine(spine.fieldIndex(c)).dataType,
          nullable = true)
    })

  /** Partial rows for the ungrouped min/max path: one row per file —
    * (total count, min-by-column, max-by-column); Spark's final
    * aggregate sums the counts and re-min/maxes the ranges (nulls from
    * empty files are ignored by min/max, counted as 0 by sum).
    */
  def fileRows(specs: Seq[AggSpec],
               perFile: Seq[(Long, Map[String, Any], Map[String, Any])])
      : Seq[Seq[Any]] =
    perFile.map { case (n, mins, maxs) =>
      specs.map {
        case CountStarSpec => n
        case MinSpec(c) => mins.getOrElse(c, null)
        case MaxSpec(c) => maxs.getOrElse(c, null)
      }
    }
}

/** A Scan serving precomputed metadata-aggregate rows: one partition,
  * no file IO at execution time.
  */
class MetadataAggScan(aggSchema: StructType, precomputed: Seq[Seq[Any]],
                      desc: String) extends Scan with Batch {
  override def readSchema(): StructType = aggSchema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(MetadataAggPartition(precomputed.map(_.toArray).toArray))
  override def createReaderFactory(): PartitionReaderFactory =
    new MetadataAggReaderFactory(aggSchema)
  override def description(): String = s"$desc metadataAgg=true"
}

final case class MetadataAggPartition(rows: Array[Array[Any]])
  extends InputPartition

class MetadataAggReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val rows = p.asInstanceOf[MetadataAggPartition].rows
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow =
        InternalRow.fromSeq(rows(i).toSeq.zipWithIndex.map {
          case (v: String, _) => UTF8String.fromString(v)
          case (v, _) => v
        })
      override def close(): Unit = ()
    }
}
