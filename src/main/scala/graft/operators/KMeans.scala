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
    // loop-invariant overflow guard, computed ONCE (not per iteration —
    // the interpreted per-element abs pass is the expensive part): the
    // micro-quantized per-cell sum is exact only while it fits a Long
    // (n elements of magnitude <= mx sum to <= n*mx*1e6). Detect, not
    // silently wrap — embeddings are O(1)-magnitude, so a violation
    // means unnormalized input, not a tuning problem. Conservative
    // bound: global max|x| times the TOTAL row count caps every cell.
    if (iters > 0) {
      val r = e.agg(
        max(array_max(transform(col(vecCol), x => abs(x.cast("double"))))).as("mx"),
        count(lit(1)).as("n")).head()
      // max() is null when there are no rows, or every vector is
      // null/empty — nothing to sum, so nothing can overflow.
      if (!r.isNullAt(0)) {
        val (mx, n) = (r.getDouble(0), r.getLong(1))
        require(mx * 1e6 * n <= Long.MaxValue.toDouble * 0.99,
          s"k-means centroid sum could overflow Long: $n vectors with " +
            f"max|x|=$mx%.3g exceed the exact-integer domain " +
            "(|x|*1e6*rows must stay below 2^63) — rescale the input")
      }
    }
    for (_ <- 1 to iters) {
      // try_element_at: null (not an ANSI error) on empty/short vectors —
      // the null-sum check below keeps those cells' previous centroids
      val sumCols = (0 until dim).map(i =>
        sum(floor(try_element_at(col("__v"), lit(i + 1)).cast("double") * 1e6 + 0.5)
          .cast("long")).as(s"s$i")) :+ count(lit(1)).as("__n")
      val updated = e.select(col(vecCol).as("__v"))
        .withColumn("__cell", nearest(col("__v"), cents))
        .groupBy(col("__cell")).agg(sumCols.head, sumCols.tail: _*)
        .collect()
        .flatMap { r =>
          // a sum is null when every vector in the cell is empty/null at
          // that position — treat like an empty cell (keep the previous
          // centroid) instead of NPE-ing on Row.getLong
          if ((1 to dim).exists(r.isNullAt)) None
          else {
            val n = r.getLong(dim + 1)
            Some(r.getInt(0) -> Array.tabulate(dim)(i =>
              (r.getLong(i + 1).toDouble / (1e6 * n)).toFloat))
          }
        }.toMap
      cents = cents.zipWithIndex.map { case (c, j) => updated.getOrElse(j, c) }
    }
    cents
  }
}
