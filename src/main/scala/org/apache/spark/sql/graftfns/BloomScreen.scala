package org.apache.spark.sql.graftfns

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

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
  * The BUILD side constructs per-partition [[BloomFilter]]s and
  * OR-merges them in a treeAggregate — map-side partials, log-depth
  * merge, never a driver-side loop over items. We deliberately do NOT
  * use Spark's [[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate]]
  * here: it silently clamps its sizing inputs to the session confs
  * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits/maxNumItems`,
  * and it reads those confs via `SQLConf.get` at JOB-SUBMISSION time
  * (executor-side `createAggregationBuffer`), not at planning — so a
  * raise-plan-restore window around the build does not stick (measured
  * on Spark 4.1.2: a 479M-bit request came back clamped to the 64M-bit
  * default, i.e. a filter that saturates toward all-true on a large
  * insert). Building the sketch directly makes the geometry exact by
  * construction, with no session-conf mutation and no lock.
  *
  * The PROBE side stays on Spark's codegen'd
  * [[BloomFilterMightContain]]. Wire compatibility: both sides key on
  * xxhash64 of the value — the build inserts `putLong(xxhash64(key))`,
  * exactly what `BloomFilterAggregate.update` does, and the probe
  * calls `mightContainLong(xxhash64(key))` on the deserialized sketch.
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
    val hashed = df.select(
      ExpressionUtils.column(new XxHash64(Seq(ExpressionUtils.expression(key)))).as("h"))
    // toRdd keeps the optimized physical plan (pruning/pushdown intact)
    // and avoids a row-deserialization pass; each partition folds its
    // hashes into a local sketch, empty partitions contribute nothing.
    val items = expectedItems
    val bits = numBits
    val partials = hashed.queryExecution.toRdd.mapPartitions { rows =>
      if (rows.isEmpty) Iterator.empty
      else {
        val bf = BloomFilter.create(items, bits)
        while (rows.hasNext) bf.putLong(rows.next().getLong(0))
        Iterator.single(bf)
      }
    }
    // log-depth OR-merge: at 1000 executors the driver receives
    // ~sqrt(P) partials, not P. null stands in for "no rows seen".
    val merged = partials.treeAggregate(null: BloomFilter)(
      (a, b) => if (a == null) b else { a.mergeInPlace(b); a },
      (a, b) => if (a == null) b else if (b == null) a else { a.mergeInPlace(b); a },
      depth = 2)
    // merged == null only when df is empty: an empty filter of the
    // right size makes mightContain all-false, the semantically right
    // answer for "no probe set".
    val out = if (merged == null) BloomFilter.create(items, bits) else merged
    // loud geometry check: a filter smaller than requested saturates
    // toward all-true on a large insert and silently stops screening
    require(out.bitSize() >= bits,
      s"bloom filter geometry clamped: got ${out.bitSize()} bits, requested $bits")
    serialize(out)
  }

  private def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
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
