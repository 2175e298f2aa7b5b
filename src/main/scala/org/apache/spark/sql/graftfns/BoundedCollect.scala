package org.apache.spark.sql.graftfns

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Aggregation buffer for [[BoundedCollect]]: the exact element count
  * plus at most cap+1 collected elements (enough to hold any
  * under-cap bucket in full; one extra so a bucket that exactly hits
  * the bound is distinguishable without consulting the count).
  */
final class BoundedCollectBuffer(var n: Long, val items: mutable.ArrayBuffer[Any])

/** `collect_list` with a HARD per-key buffer bound — the single-pass
  * routing aggregate behind KeyedPairs (round 19).
  *
  * Returns struct(n BIGINT, items ARRAY<child>): `n` is the exact
  * count of non-null child values in the group; `items` holds ALL of
  * them when n <= cap and is NULL otherwise. Unlike `collect_list`,
  * whose buffer grows with the group (one stop-shingle key shared by
  * 10⁶ docs = a 10⁶-element array in one aggregation buffer), this
  * buffer never exceeds cap+1 elements — over-cap groups keep
  * counting but stop collecting, so a pathologically hot key costs
  * 8 bytes of state, not its member list. Null child values are
  * skipped entirely (collect_list's behavior); they can never pair
  * (PairExpand drops nulls), so not counting them keeps `n` equal to
  * the pairable-member count.
  *
  * One groupBy with this aggregate replaces the pre-round-19 pair
  * routing's THREE passes (a counting aggregation, an anti join for
  * small buckets, an inner join for hot buckets): small buckets come
  * out of the aggregation already materialized, and only the over-cap
  * keys — rare by construction — are re-routed through a join.
  */
case class BoundedCollect(child: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedCollectBuffer] with UnaryLike[Expression] {

  require(cap >= 1, s"cap must be >= 1, got $cap")

  override def createAggregationBuffer(): BoundedCollectBuffer =
    new BoundedCollectBuffer(0L, mutable.ArrayBuffer.empty)

  override def update(b: BoundedCollectBuffer, input: InternalRow): BoundedCollectBuffer = {
    val v = child.eval(input)
    if (v != null) {
      b.n += 1
      // copy: eval of struct/array children returns a reused row buffer
      if (b.items.length <= cap) b.items += InternalRow.copyValue(v)
    }
    b
  }

  override def merge(b: BoundedCollectBuffer, o: BoundedCollectBuffer): BoundedCollectBuffer = {
    b.n += o.n
    var i = 0
    while (b.items.length <= cap && i < o.items.length) {
      b.items += o.items(i)
      i += 1
    }
    b
  }

  override def eval(b: BoundedCollectBuffer): Any =
    InternalRow(b.n,
      if (b.n <= cap) new GenericArrayData(b.items.toArray) else null)

  @transient private lazy val serProj = UnsafeProjection.create(Array[DataType](
    LongType, ArrayType(child.dataType, containsNull = false)))

  override def serialize(b: BoundedCollectBuffer): Array[Byte] =
    serProj(InternalRow(b.n, new GenericArrayData(b.items.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): BoundedCollectBuffer = {
    val row = new UnsafeRow(2)
    row.pointTo(bytes, bytes.length)
    val buf = createAggregationBuffer()
    buf.n = row.getLong(0)
    val arr = row.getArray(1)
    val et = child.dataType
    var i = 0
    while (i < arr.numElements()) {
      buf.items += InternalRow.copyValue(arr.get(i, et))
      i += 1
    }
    buf
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("items", ArrayType(child.dataType, containsNull = false))))
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_collect"

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollect =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollect =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedCollect =
    copy(child = newChild)
}

object BoundedCollect {
  /** Column API: struct(n, items) per group — see [[BoundedCollect]]. */
  def boundedCollect(child: Column, cap: Int): Column =
    ExpressionUtils.column(
      BoundedCollect(ExpressionUtils.expression(child), cap)
        .toAggregateExpression())
}
