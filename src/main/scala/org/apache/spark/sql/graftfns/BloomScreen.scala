package org.apache.spark.sql.graftfns

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter screening for semi-join-shaped pipelines — the
  * decontamination / membership primitive at 100 TB.
  *
  * An exact "does this shingle appear in the benchmark set" join ships
  * every corpus-side row into a join (broadcast or shuffle). When the
  * probe set is large-ish (a full eval-suite shingle inventory) but the
  * MISS rate is high — the common case: almost no corpus shingle is a
  * benchmark shingle — a Bloom filter of the probe set screens rows
  * map-side BEFORE the join, so only might-match rows reach it. No
  * false negatives (recall is exact); false positives are removed by
  * the exact join that follows, so a bloom-prefiltered semi-join
  * returns IDENTICAL results to the plain join at a fraction of the
  * shuffle volume.
  *
  * Built on Spark's own runtime-filter primitives (the engine uses the
  * same pair for join pushdown): [[BloomFilterAggregate]] builds the
  * filter DISTRIBUTED — map-side partial filters OR-merged in one
  * aggregation, never a driver-side loop over items — and
  * [[BloomFilterMightContain]] probes it codegen'd. Both sides key on
  * xxhash64 of the value, so build and probe agree on any input type.
  * The finished filter is a model-sized driver value (numBits/8 bytes,
  * a few MB for hundreds of millions of items) embedded as a binary
  * literal — same lifecycle as broadcast-join hash maps and the
  * IVF/PQ models.
  */
object BloomScreen {

  /** Build a Bloom filter over `key` rows of `df` (distributed
    * aggregation), returning the serialized filter bytes.
    *
    * @param expectedItems sizing hint: distinct keys expected.
    * @param fpp target false-positive rate; bits are derived with the
    *        standard -n*ln(p)/ln(2)^2 formula.
    */
  def build(df: DataFrame, key: Column, expectedItems: Long, fpp: Double = 0.03): Array[Byte] = {
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val numBits = math.max(64L,
      math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    // BloomFilterAggregate silently clamps BOTH sizing inputs:
    // numBits to spark.sql.optimizer.runtime.bloomFilter.maxNumBits
    // (default 64M bits ≈ 8 MB) and estimatedNumItems to
    // ...bloomFilter.maxNumItems (default 4M). A clamped item count is
    // the nastier failure: BloomFilter.create derives the HASH COUNT
    // from bits/items, so 4M claimed items against a raised bit budget
    // picks far too many hash functions and a large real insert
    // saturates the filter toward all-true — pass-through with the fpp
    // "honored" on paper. Raise both session caps for the duration of
    // the build, then RESTORE the prior values: Spark's own runtime
    // bloom-join filters in unrelated queries read the same confs, and
    // a permanent raise would silently inflate them for the session's
    // lifetime. (The caps are captured when THIS aggregate is analyzed,
    // inside the raised window — the finished filter is unaffected by
    // the restore.)
    // synchronized over the PLANNING window only: the raise/restore is
    // not safe under concurrent same-session builders (one could
    // restore the caps out from under another's analysis, or capture a
    // raised value as its "prior"), but the caps are captured when the
    // aggregate is planned — so force the physical plan inside the
    // lock and run the (potentially long) distributed job OUTSIDE it,
    // on the cached QueryExecution. Serializing whole builds under a
    // JVM lock would block independent sessions' builders for the full
    // job runtime.
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(ExpressionUtils.expression(key))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val out = df.select(ExpressionUtils.column(agg).as("bf"))
    BloomScreen.synchronized {
      val conf = df.sparkSession.conf
      val caps = Seq(
        ("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", 67108864L, numBits),
        ("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", 4000000L, expectedItems))
      val prior = caps.map { case (k, default, needed) =>
        val before = conf.getOption(k)
        if (needed > before.map(_.toLong).getOrElse(default)) conf.set(k, needed.toString)
        k -> before
      }
      try { out.queryExecution.executedPlan; () }
      finally prior.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None)    => conf.unset(k)
      }
    }
    val row = out.head()
    // null only when df is empty: return an empty filter of the right
    // size so mightContain is all-false (the semantically right answer)
    if (row.isNullAt(0)) {
      val empty = org.apache.spark.util.sketch.BloomFilter.create(expectedItems, numBits)
      val bos = new java.io.ByteArrayOutputStream()
      empty.writeTo(bos)
      bos.toByteArray
    } else row.getAs[Array[Byte]](0)
  }

  /** Codegen'd membership probe against a built filter. True means
    * "possibly present" (false-positive rate ~fpp); false means
    * DEFINITELY absent — filter semantics, use on the miss-heavy side.
    */
  def mightContain(filter: Array[Byte], key: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      Literal(filter, BinaryType),
      new XxHash64(Seq(ExpressionUtils.expression(key)))))
}
