package graft.ros

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Metadata-only aggregate pushdown for the container sources: the
  * "rosbag info" query class — `count(*)` and
  * `groupBy(topic/…).count()` — answered from each container's OWN
  * count metadata (rosbag chunk-info per-connection counts, MCAP
  * summary Statistics) without reading a single chunk body. At fleet
  * scale that turns a full-archive scan into a per-file index read.
  *
  * Scope is deliberately narrow and sound: untyped scans, no pushed
  * filters (Spark only offers aggregate pushdown when every filter was
  * fully consumed, and these sources always retain residuals), no
  * limit, COUNT(*) aggregates only, grouping only by catalog columns
  * whose values the metadata carries. `supportCompletePushDown` stays
  * false: the scan returns PARTIAL per-file rows and Spark's final
  * aggregate sums them — correct under every grouping.
  */
object MetadataAgg {

  /** The group-by column names iff `agg` is pushable over `allowed`
    * (all aggregates COUNT(*), all groupings plain columns from the
    * allowed set); None otherwise.
    */
  def groupCols(agg: Aggregation, allowed: Set[String]): Option[Seq[String]] = {
    if (agg.aggregateExpressions.isEmpty ||
        !agg.aggregateExpressions.forall(_.isInstanceOf[CountStar])) return None
    val cols = agg.groupByExpressions.toSeq.map {
      case f: NamedReference if f.fieldNames.length == 1 => f.fieldNames.head
      case _ => return None
    }
    if (cols.forall(allowed)) Some(cols) else None
  }

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
    perUnit.groupBy { case (vals, _) => cols.map(vals) }
      .map { case (key, units) =>
        val n = units.map(_._2).sum
        key ++ Seq.fill(nCounts)(n)
      }.toSeq
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
