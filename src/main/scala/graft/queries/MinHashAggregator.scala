package graft.queries

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §7.7): element-wise-min union of minhash
  * signatures. The set-union property of minhash — sig(A ∪ B) =
  * elementwise_min(sig(A), sig(B)) — makes this a natural Aggregator:
  * aggregate per-shard document signatures into collection-level
  * signatures (e.g. estimate Jaccard overlap BETWEEN datasets, not just
  * between documents) with a tiny fixed-size state that merges
  * associatively across partitions (map-side partial, then merge —
  * exactly Spark's Aggregator contract).
  *
  * Register via `udaf(MinHashUnion)` for use in agg(); used typed via
  * `.toColumn` on grouped Datasets.
  */
object MinHashUnion extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
  val NumHashes = 16

  override def zero: Array[Long] = Array.fill(NumHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    var i = 0
    while (i < NumHashes && i < sig.length) {
      if (sig(i) < buf(i)) buf(i) = sig(i)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < NumHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

  /** Jaccard estimate from two signatures: fraction of agreeing slots.
    * Divides by the COMPARED length, not the aggregator's fixed
    * NumHashes — signatures from a wider LshTuning scheme (32/48
    * hashes) estimate correctly too.
    */
  def estimate(a: Seq[Long], b: Seq[Long]): Double = {
    val n = math.min(a.length, b.length)
    if (n == 0) 0.0
    else a.zip(b).count { case (x, y) => x == y }.toDouble / n
  }
}

/** THE MinHash-LSH column builders — single definition of the
  * signature scheme (seeded xxhash64 minima) and the band/bucket
  * derivation, shared by batch q28 and the streaming near-dup so the
  * two can never disagree on what a candidate pair is.
  */
object MinHashLsh {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  val NumHashes: Int = MinHashUnion.NumHashes
  val NumBands: Int = NumHashes / 2   // bands of 2 rows each

  /** `array<long>` signature of a distinct-shingle array column:
    * sig[i] = min over shingles of xxhash64(i, shingle). Backed by the
    * native one-pass MinHashSig expression (bit-equal to the NumHashes
    * separate array_min(transform(...)) passes it replaced — proven in
    * TextExprSpec, incl. the null-shingle and empty-array corners).
    */
  def signature(sh: Column): Column = signature(sh, NumHashes)

  def signature(sh: Column, numHashes: Int): Column =
    org.apache.spark.sql.graftfns.TextFunctions.minhashSig(sh, numHashes)

  /** `array<struct<band:int, bucket:long>>` — one bucket per band,
    * hashing that band's signature rows together.
    */
  def bandBuckets(sig: Column): Column = bandBuckets(sig, NumBands, 2)

  /** Parametric banding (corpus-derived schemes come from
    * graft.operators.LshTuning.minhashScheme): `bands` buckets per doc,
    * each hashing its `rows` consecutive signature slots together.
    */
  def bandBuckets(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map(b =>
      struct(lit(b).as("band"),
        xxhash64((0 until rows).map(r =>
          element_at(sig, b * rows + r + 1)): _*).as("bucket"))): _*)
}
