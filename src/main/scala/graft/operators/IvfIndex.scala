package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftfns.VectorFunctions

/** IVF-style coarse quantization for embedding similarity search:
  * k-means-trained centroids, a map-only cell-assignment expression,
  * and a cell-partitioned parquet layout whose probes prune to
  * nProbe/k of the data.
  *
  * Scale shape: training state is k centroids × dim floats — a model,
  * not data, so it lives driver-side (collect of k rows per Lloyd
  * iteration). Assignment is a single projection per row (k native
  * codegen'd dot products inside one least()) — no join, no window, no
  * shuffle; the round-1 shape (crossJoin ×k then a row_number window)
  * shuffled 16× the corpus for the same argmax.
  */
object IvfIndex {
  final case class Centroid(id: Int, vec: Array[Float]) {
    // left-to-right double fold, same op order as the l2() column
    val norm: Double = {
      var acc = 0.0; var i = 0
      while (i < vec.length) { acc += vec(i).toDouble * vec(i).toDouble; i += 1 }
      math.sqrt(acc)
    }
  }

  private def dotd(a: Column, b: Column): Column = VectorFunctions.dot(a, b)

  /** Lloyd-iteration k-means, deterministic throughout: init picks the
    * k ids that hash lowest (a deterministic pseudo-random sample that
    * assumes NOTHING about the id distribution — dense, sparse and
    * offset id spaces all yield exactly min(k, n) centroids), updates
    * are per-dimension avg aggregates (one map-side-combined shuffle of
    * k×dim doubles per iteration), empty cells keep their previous
    * centroid.
    */
  def train(e: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int): Seq[Centroid] = {
    require(k >= 1 && iters >= 0)
    var cents: Seq[Centroid] = e
      .orderBy(xxhash64(col(idCol)), col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .zipWithIndex.map { case (r, i) => Centroid(i, r.getSeq[Float](0).toArray) }.toSeq
    require(cents.nonEmpty, "cannot train on an empty table")
    val dim = cents.head.vec.length
    for (_ <- 1 to iters) {
      val avgCols = (0 until dim).map(i => avg(element_at(col("v"), i + 1)).as(s"c$i"))
      val updated = e.select(col(vecCol).as("v"))
        .withColumn("cell", nearestCell(col("v"), cents))
        .groupBy(col("cell")).agg(avgCols.head, avgCols.tail: _*)
        .collect()
        .map(r => r.getInt(0) ->
          Centroid(r.getInt(0), Array.tabulate(dim)(i => r.getDouble(i + 1).toFloat)))
        .toMap
      cents = cents.map(c => updated.getOrElse(c.id, c))
    }
    cents
  }

  /** Map-only nearest-centroid argmax by cosine: one least() over k
    * (negated dot/|c|, id) structs — |v| is constant per row, so it
    * cancels out of the argmax. Ties break toward the lower cell id
    * (struct ordering). Stays inside whole-stage codegen.
    */
  def nearestCell(v: Column, cents: Seq[Centroid]): Column = {
    val scored = cents.map { c =>
      struct((-dotd(v, typedLit(c.vec)) / lit(c.norm)).as("negsim"), lit(c.id).as("id"))
    }
    val best = if (scored.size == 1) scored.head else least(scored: _*)
    best.getField("id")
  }

  /** Adds a `cell` column — the index assignment pass. */
  def assign(e: DataFrame, vecCol: String, cents: Seq[Centroid]): DataFrame =
    e.withColumn("cell", nearestCell(col(vecCol), cents))

  /** nProbe cells nearest to a local query vector — pure driver math
    * over the k-row model. Dimension mismatches fail loudly (a silent
    * prefix dot product returns confidently wrong neighbors), and
    * zero-norm centroids rank last instead of poisoning the sort with
    * NaN.
    */
  def probeCells(q: Array[Float], cents: Seq[Centroid], nProbe: Int): Seq[Int] =
    cents.map { c =>
      require(c.vec.length == q.length,
        s"query dim ${q.length} != centroid ${c.id} dim ${c.vec.length}")
      var acc = 0.0; var i = 0
      while (i < q.length) { acc += q(i).toDouble * c.vec(i).toDouble; i += 1 }
      (if (c.norm == 0.0) Double.MaxValue else -acc / c.norm, c.id)
    }.sorted.take(nProbe).map(_._2)

  /** Persisted index: train, assign, write parquet partitioned by
    * `cell`. A probe that filters `cell IN (...)` reads only the probed
    * directories (partition pruning) — nProbe/k of the bytes.
    */
  def build(e: DataFrame, idCol: String, vecCol: String, dir: String,
            k: Int, iters: Int = 2): Seq[Centroid] = {
    val cents = train(e, idCol, vecCol, k, iters)
    assign(e, vecCol, cents).write.partitionBy("cell").mode("overwrite").parquet(dir)
    cents
  }

  /** Probe a built index directory: prune to nProbe cells, exact-rerank
    * inside them, return top-k by cosine.
    */
  def probe(spark: org.apache.spark.sql.SparkSession, dir: String, idCol: String,
            vecCol: String, cents: Seq[Centroid], q: Array[Float],
            nProbe: Int, topK: Int): DataFrame = {
    val cells = probeCells(q, cents, nProbe)
    val qNorm = {
      var acc = 0.0; var i = 0
      while (i < q.length) { acc += q(i).toDouble * q(i).toDouble; i += 1 }
      math.sqrt(acc)
    }
    spark.read.parquet(dir)
      .filter(col("cell").isin(cells: _*))
      .select(col(idCol),
        (dotd(col(vecCol), typedLit(q)) /
          (VectorFunctions.norm(col(vecCol)) * lit(qNorm))).as("cos"))
      .orderBy(col("cos").desc, col(idCol)).limit(topK)
  }
}
