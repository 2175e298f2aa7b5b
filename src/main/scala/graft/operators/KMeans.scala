package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd k-means over an (id, float-vector) DataFrame —
  * the shared trainer behind IvfIndex (cosine cells) and PqIndex
  * (euclidean codewords). The model is k×dim floats: training state
  * lives driver-side, each iteration is ONE map-side-combined shuffle
  * of model-sized partials.
  *
  * Deterministic throughout:
  *  - seed init picks the k lowest-xxhash ids (a pseudo-random sample
  *    that assumes nothing about the id distribution);
  *  - centroid updates quantize each element to integer micros BEFORE
  *    summation, so the aggregate is exact long arithmetic —
  *    independent of shuffle-merge order (a plain avg() of doubles can
  *    differ in the last ulp between runs and flip a toFloat rounding);
  *  - empty cells keep their previous centroid;
  *  - argmin ties break toward the lower centroid id (struct ordering
  *    in the caller-supplied `nearest`).
  */
object KMeans {

  /** @param nearest map-only argmin column: (vector column, current
    *        centroids) -> centroid id — the distance geometry is the
    *        caller's (cosine for IVF cells, euclidean for PQ codes).
    * @param seeds optional pre-collected init centroids (PqIndex slices
    *        ONE seed collection across its m subspaces instead of
    *        re-scanning per subspace).
    */
  def train(e: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int,
            nearest: (Column, Array[Array[Float]]) => Column,
            seeds: Option[Array[Array[Float]]] = None): Array[Array[Float]] = {
    require(k >= 1 && iters >= 0, s"need k >= 1 and iters >= 0, got k=$k iters=$iters")
    var cents: Array[Array[Float]] = seeds.getOrElse {
      e.orderBy(xxhash64(col(idCol)), col(idCol)).limit(k)
        .select(col(vecCol)).collect().map(_.getSeq[Float](0).toArray)
    }
    require(cents.nonEmpty, "cannot train on an empty table")
    val dim = cents.head.length
    // Row layout of the per-cell aggregate: __cell, then (sum, count)
    // per position, then __n, then (iteration 1 only) __mx.
    def sIdx(i: Int) = 1 + 2 * i
    def cIdx(i: Int) = 2 + 2 * i
    val nIdx = 1 + 2 * dim
    val mxIdx = 2 + 2 * dim
    for (it <- 1 to iters) {
      // try_element_at: null (not an ANSI error) on empty/short vectors.
      // Each position carries its own non-null COUNT and is averaged
      // over that count — a cell mixing short and full-length vectors
      // gets an unbiased mean of the values actually present, instead
      // of short rows silently dragging the coordinate toward 0 by
      // inflating a shared divisor.
      val sumCols = (0 until dim).flatMap(i => Seq(
        sum(floor(try_element_at(col("__v"), lit(i + 1)).cast("double") * 1e6 + 0.5)
          .cast("long")).as(s"s$i"),
        count(try_element_at(col("__v"), lit(i + 1))).as(s"c$i"))) :+
        count(lit(1)).as("__n")
      // The overflow guard rides iteration 1's aggregate instead of a
      // separate full-corpus pass: the micro-quantized per-cell sum is
      // exact only while it fits a Long (n values of magnitude <= mx
      // sum to <= n*mx*1e6). Detect, not silently wrap — embeddings
      // are O(1)-magnitude, so a violation means unnormalized input.
      // (Under ANSI the sum itself may throw first; either way the
      // corrupted result is never used.)
      val aggCols = if (it == 1) sumCols :+
        max(array_max(transform(col("__v"), x => abs(x.cast("double"))))).as("__mx")
      else sumCols
      val rows = e.select(col(vecCol).as("__v"))
        .withColumn("__cell", nearest(col("__v"), cents))
        .groupBy(col("__cell")).agg(aggCols.head, aggCols.tail: _*)
        .collect()
      if (it == 1) {
        val n = rows.map(_.getLong(nIdx)).sum
        val mx = rows.collect { case r if !r.isNullAt(mxIdx) => r.getDouble(mxIdx) }
          .foldLeft(0.0)(math.max)
        require(mx * 1e6 * n <= Long.MaxValue.toDouble * 0.99,
          s"k-means centroid sum could overflow Long: $n vectors with " +
            f"max|x|=$mx%.3g exceed the exact-integer domain " +
            "(|x|*1e6*rows must stay below 2^63) — rescale the input")
      }
      val updated = rows.flatMap { r =>
        // null __cell groups the null-vector rows — nothing to learn
        if (r.isNullAt(0)) None else Some(r.getInt(0) -> r)
      }.toMap
      cents = cents.zipWithIndex.map { case (c, j) =>
        updated.get(j) match {
          case None => c // empty cell: keep the previous centroid
          case Some(r) => Array.tabulate(dim) { i =>
            // position with no values in this cell: keep the previous
            // coordinate (the all-empty-cell case degenerates to c)
            val cnt = r.getLong(cIdx(i))
            if (cnt == 0L) c(i)
            else (r.getLong(sIdx(i)).toDouble / (1e6 * cnt)).toFloat
          }
        }
      }
    }
    cents
  }
}
