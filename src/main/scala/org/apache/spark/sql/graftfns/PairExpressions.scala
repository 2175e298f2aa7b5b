package org.apache.spark.sql.graftfns

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Per-task top-k scored pair expansion for blocked all-pairs cosine —
  * the fusion that makes exact embedding near-dup ranking (q30) a
  * shuffle-light plan at any scale.
  *
  * The generic path (KeyedPairs.allPairs → explode pair structs →
  * dot → TakeOrdered) materializes one struct PER PAIR, each carrying
  * two full embedding vectors: ~cap² × 2·dim floats of intermediate
  * garbage per task before the ranker throws all but k rows away.
  * This expression runs the same double loop INSIDE one eval call per
  * block-pair group — tight JVM loops over pre-extracted primitive
  * arrays, a bounded k-heap, and an output of exactly ≤ k tiny
  * (va, vb, cos) rows per task. The shuffle after it carries k rows
  * per task instead of cap² pairs.
  *
  * CodegenFallback is deliberate: one eval call does O(cap²·dim) work,
  * so per-call interpretation overhead is amortized to nothing — the
  * opposite trade from [[DotProduct]], which runs once per row.
  *
  * Arithmetic is BIT-IDENTICAL to the unfused form (and hence to the
  * DuckDB oracle): dot accumulates left-to-right in double
  * (`acc += (double)a[i] * (double)b[i]`), cosine is
  * `dot / (nrmA * nrmB)` with the lower-id side as A — exactly
  * `dotd(pa.embedding, pb.embedding) / (pa.nrm * pb.nrm)`.
  *
  * Input: two arrays of struct(id LONG, embedding ARRAY<FLOAT>,
  * nrm DOUBLE) plus an explicit `diag` boolean. When `diag` is true
  * this is a DIAGONAL block (pairs within `left`, id-ascending, and
  * `right` is ignored); otherwise every cross pair, oriented va < vb.
  * The flag must be EXPLICIT (bi === bj), not inferred from `right`
  * being empty: a cross block-pair group whose right block happened to
  * receive no rows also has an empty right side, and inferring
  * diagonal there would re-emit the left block's internal pairs — a
  * duplicate of the true diagonal group's output. Pairs whose vectors
  * differ in length or hold null elements are skipped (the unfused
  * form gave them NULL cosine, which a descending ranker also never
  * surfaced). Zero-norm vectors are skipped too — a DELIBERATE
  * divergence: the unfused form throws DIVIDE_BY_ZERO under ANSI, and
  * a vector with no direction cannot be anyone's near-duplicate.
  * Ranking: (cos desc, va asc, vb asc) — ties break identically to
  * the global orderBy, so per-task top-k composes exactly with a
  * downstream TakeOrderedAndProject.
  */
case class TopDotPairs(left: Expression, right: Expression, diag: Expression, k: Int)
    extends Expression with ExpectsInputTypes with CodegenFallback {

  require(k >= 1, s"k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(left, right, diag)
  override def nullable: Boolean = false
  override def foldable: Boolean = false

  private val sideType = ArrayType(StructType(Seq(
    StructField("id", LongType), StructField("embedding", ArrayType(FloatType)),
    StructField("nrm", DoubleType))))

  override def inputTypes: Seq[AbstractDataType] = Seq(sideType, sideType, BooleanType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("va", LongType, nullable = false),
    StructField("vb", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "top_dot_pairs"

  /** (ids, embeddings, norms); embeddings null when unusable (null
    * vector / null element) — those rows pair with nothing.
    */
  private def extract(a: ArrayData): (Array[Long], Array[Array[Float]], Array[Double]) = {
    val n = a.numElements()
    val ids = new Array[Long](n)
    val embs = new Array[Array[Float]](n)
    val nrms = new Array[Double](n)
    var i = 0
    while (i < n) {
      val row = a.getStruct(i, 3)
      ids(i) = row.getLong(0)
      if (!row.isNullAt(1) && !row.isNullAt(2)) {
        val e = row.getArray(1)
        val m = e.numElements()
        var ok = true
        val f = new Array[Float](m)
        var j = 0
        while (j < m && ok) {
          if (e.isNullAt(j)) ok = false else f(j) = e.getFloat(j)
          j += 1
        }
        // zero/NaN norm -> no direction -> pairs with nothing (see scaladoc)
        val nrm = row.getDouble(2)
        if (ok && nrm > 0) { embs(i) = f; nrms(i) = nrm }
      }
      i += 1
    }
    (ids, embs, nrms)
  }

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    val d = diag.eval(input)
    if (l == null || d == null || (d == false && r == null))
      return new GenericArrayData(Array.empty[Any])
    val (aIds, aEmb, aNrm) = extract(l.asInstanceOf[ArrayData])
    val (bIds, bEmb, bNrm) =
      if (d.asInstanceOf[Boolean]) (Array.empty[Long], Array.empty[Array[Float]], Array.empty[Double])
      else extract(r.asInstanceOf[ArrayData])
    // min-heap on goodness: the ROOT is the worst kept pair, evicted
    // when a better one arrives. Comparator = (cos asc, va desc, vb
    // desc), i.e. the REVERSE of the output ranking.
    val heap = new java.util.PriorityQueue[(Double, Long, Long)](k + 1,
      (x: (Double, Long, Long), y: (Double, Long, Long)) => {
        val c = java.lang.Double.compare(x._1, y._1)
        if (c != 0) c
        else {
          val va = java.lang.Long.compare(y._2, x._2)
          if (va != 0) va else java.lang.Long.compare(y._3, x._3)
        }
      })
    def offer(ia: Long, ib: Long, cos: Double): Unit = {
      val (va, vb) = if (ia < ib) (ia, ib) else (ib, ia)
      heap.add((cos, va, vb))
      if (heap.size > k) heap.poll()
    }
    if (d.asInstanceOf[Boolean]) {
      // diagonal: pairs within left, lower id as A
      var i = 0
      while (i < aIds.length) {
        if (aEmb(i) != null) {
          var j = i + 1
          while (j < aIds.length) {
            if (aEmb(j) != null && aEmb(i).length == aEmb(j).length && aIds(i) != aIds(j)) {
              // orient by id BEFORE the arithmetic so operand order
              // matches the unfused pa < pb form exactly
              val (x, y) = if (aIds(i) < aIds(j)) (i, j) else (j, i)
              offer(aIds(x), aIds(y), dot(aEmb(x), aEmb(y)) / (aNrm(x) * aNrm(y)))
            }
            j += 1
          }
        }
        i += 1
      }
    } else {
      var i = 0
      while (i < aIds.length) {
        if (aEmb(i) != null) {
          var j = 0
          while (j < bIds.length) {
            if (bEmb(j) != null && aEmb(i).length == bEmb(j).length && aIds(i) != bIds(j)) {
              val (xi, xe, xn, yi, ye, yn) =
                if (aIds(i) < bIds(j)) (aIds(i), aEmb(i), aNrm(i), bIds(j), bEmb(j), bNrm(j))
                else (bIds(j), bEmb(j), bNrm(j), aIds(i), aEmb(i), aNrm(i))
              offer(xi, yi, dot(xe, ye) / (xn * yn))
            }
            j += 1
          }
        }
        i += 1
      }
    }
    val out = new Array[Any](heap.size)
    var idx = heap.size - 1
    while (idx >= 0) {             // poll order = worst first: fill backwards
      val (cos, va, vb) = heap.poll()
      out(idx) = InternalRow(va, vb, cos)
      idx -= 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(left = newChildren(0), right = newChildren(1), diag = newChildren(2))
}

/** Per-task THRESHOLDED scored pair expansion — [[TopDotPairs]]'s
  * sibling for building a similarity pair GRAPH instead of a top-k:
  * emits every pair with cosine >= thresh, fused inside one eval per
  * block-pair group. The generic path (pair structs → dot → filter)
  * materializes cap² intermediate structs per task, each carrying two
  * embedding copies, of which a threshold-sparse handful survive; here
  * the double loop scores in place and the output holds exactly the
  * surviving (va, vb, cos) rows. This is the reference-graph kernel
  * behind q60's checked gate (exact cosine>=t pair graph) — at audit
  * scale the only thing crossing task boundaries is the sparse graph.
  *
  * Same arithmetic/orientation/skip rules as [[TopDotPairs]]
  * (lower-id side is A before the arithmetic, zero-norm and ragged
  * vectors pair with nothing), same explicit `diag` flag, same
  * deliberate CodegenFallback (one eval does O(cap²·dim) work).
  * Output order within a task is loop order — consumers that need
  * determinism sort or aggregate downstream (set semantics are
  * order-free).
  */
case class ThresholdDotPairs(left: Expression, right: Expression,
    diag: Expression, thresh: Double)
    extends Expression with ExpectsInputTypes with CodegenFallback {

  override def children: Seq[Expression] = Seq(left, right, diag)
  override def nullable: Boolean = false
  override def foldable: Boolean = false

  private val sideType = ArrayType(StructType(Seq(
    StructField("id", LongType), StructField("embedding", ArrayType(FloatType)),
    StructField("nrm", DoubleType))))

  override def inputTypes: Seq[AbstractDataType] = Seq(sideType, sideType, BooleanType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("va", LongType, nullable = false),
    StructField("vb", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "threshold_dot_pairs"

  private def extract(a: ArrayData): (Array[Long], Array[Array[Float]], Array[Double]) = {
    val n = a.numElements()
    val ids = new Array[Long](n)
    val embs = new Array[Array[Float]](n)
    val nrms = new Array[Double](n)
    var i = 0
    while (i < n) {
      val row = a.getStruct(i, 3)
      ids(i) = row.getLong(0)
      if (!row.isNullAt(1) && !row.isNullAt(2)) {
        val e = row.getArray(1)
        val m = e.numElements()
        var ok = true
        val f = new Array[Float](m)
        var j = 0
        while (j < m && ok) {
          if (e.isNullAt(j)) ok = false else f(j) = e.getFloat(j)
          j += 1
        }
        val nrm = row.getDouble(2)
        if (ok && nrm > 0) { embs(i) = f; nrms(i) = nrm }
      }
      i += 1
    }
    (ids, embs, nrms)
  }

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    val d = diag.eval(input)
    if (l == null || d == null || (d == false && r == null))
      return new GenericArrayData(Array.empty[Any])
    val (aIds, aEmb, aNrm) = extract(l.asInstanceOf[ArrayData])
    val (bIds, bEmb, bNrm) =
      if (d.asInstanceOf[Boolean]) (Array.empty[Long], Array.empty[Array[Float]], Array.empty[Double])
      else extract(r.asInstanceOf[ArrayData])
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    def score(xi: Long, xe: Array[Float], xn: Double,
              yi: Long, ye: Array[Float], yn: Double): Unit = {
      val cos = dot(xe, ye) / (xn * yn)
      if (cos >= thresh) out += InternalRow(xi, yi, cos)
    }
    if (d.asInstanceOf[Boolean]) {
      var i = 0
      while (i < aIds.length) {
        if (aEmb(i) != null) {
          var j = i + 1
          while (j < aIds.length) {
            if (aEmb(j) != null && aEmb(i).length == aEmb(j).length && aIds(i) != aIds(j)) {
              val (x, y) = if (aIds(i) < aIds(j)) (i, j) else (j, i)
              score(aIds(x), aEmb(x), aNrm(x), aIds(y), aEmb(y), aNrm(y))
            }
            j += 1
          }
        }
        i += 1
      }
    } else {
      var i = 0
      while (i < aIds.length) {
        if (aEmb(i) != null) {
          var j = 0
          while (j < bIds.length) {
            if (bEmb(j) != null && aEmb(i).length == bEmb(j).length && aIds(i) != bIds(j)) {
              if (aIds(i) < bIds(j))
                score(aIds(i), aEmb(i), aNrm(i), bIds(j), bEmb(j), bNrm(j))
              else
                score(bIds(j), bEmb(j), bNrm(j), aIds(i), aEmb(i), aNrm(i))
            }
            j += 1
          }
        }
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(left = newChildren(0), right = newChildren(1), diag = newChildren(2))
}

/** Native unordered-pair expansion over payload arrays — the fused
  * replacement for KeyedPairs' interpreted in-row expansion
  * (`flatten(transform(ps, x => transform(filter(ps, y => y > x), ...)))`
  * and its cross-block sibling), which evaluates a nested lambda tree
  * plus a CreateStruct per PAIR. On pair-heavy corpora that expansion
  * is the dominant cost of the whole near-dup family (q27/q28/q29/
  * q46/q63/q65): the amplified-corpus probe spends ~40s of its jaccard
  * materialization in lambda evaluation alone. One eval call here does
  * the whole bucket with a tight double loop and one comparator.
  *
  * Semantics are EXACTLY the interpreted forms:
  *  - `diag` true (the bucket itself, `bs` ignored): every unordered
  *    pair {x, y} of distinct-valued elements of `as`, oriented
  *    pa < pb by the payload's natural (struct) ordering; equal-valued
  *    elements pair with nothing (the `y > x` filter's behavior —
  *    exact-duplicate payloads cannot order themselves).
  *  - `diag` false: every (x, y) of `as` × `bs`, oriented by the same
  *    ordering with ties going (y, x) (the `when(x < y, ...)`
  *    otherwise-branch). Cross blocks never hold equal payloads (equal
  *    values hash to the same block), so the tie arm is vestigial but
  *    preserved bit-for-bit.
  *
  * CodegenFallback for the same reason as [[TopDotPairs]]: one call
  * does O(f²) work, so per-call interpretation overhead vanishes.
  */
case class PairExpand(as: Expression, bs: Expression, diag: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(as, bs, diag)
  override def nullable: Boolean = false
  override def foldable: Boolean = false

  private def elemType: DataType = as.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (as.dataType, bs.dataType, diag.dataType) match {
      case (ArrayType(a, _), ArrayType(b, _), BooleanType) if a.sameType(b) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pair_expand needs two arrays of the same element type and a boolean, " +
            s"got ${as.dataType}, ${bs.dataType}, ${diag.dataType}")
    }
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pa", elemType), StructField("pb", elemType))), containsNull = false)
  override def prettyName: String = "pair_expand"

  @transient private lazy val ordering: Ordering[Any] =
    org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering(elemType)

  override def eval(input: InternalRow): Any = {
    val a = as.eval(input).asInstanceOf[ArrayData]
    val b = bs.eval(input).asInstanceOf[ArrayData]
    val d = diag.eval(input)
    // null inputs pair with nothing — the interpreted forms produced a
    // null array there, which every consumer's explode dropped; an
    // empty array is the same downstream without the null channel
    if (a == null || d == null || (d == false && b == null))
      return new GenericArrayData(Array.empty[Any])
    val et = elemType
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    if (d.asInstanceOf[Boolean]) {
      val n = a.numElements()
      var i = 0
      while (i < n) {
        val x = a.get(i, et)
        if (x != null) { // null x: `y > null` is null for every y — no pairs
          var j = i + 1
          while (j < n) {
            val y = a.get(j, et)
            if (y != null) { // null y: dropped by the three-valued filter
              val c = ordering.compare(x, y)
              if (c < 0) out += InternalRow(x, y)
              else if (c > 0) out += InternalRow(y, x)
              // c == 0: equal payloads pair with nothing (y > x filter)
            }
            j += 1
          }
        }
        i += 1
      }
    } else {
      val n = a.numElements(); val m = b.numElements()
      var i = 0
      while (i < n) {
        val x = a.get(i, et)
        var j = 0
        while (j < m) {
          val y = b.get(j, et)
          // null x or y: `x < y` is null, so the interpreted when()
          // took its otherwise-branch — (y, x), null and all
          if (x != null && y != null && ordering.compare(x, y) < 0)
            out += InternalRow(x, y)
          else out += InternalRow(y, x) // ties and nulls go (y, x)
          j += 1
        }
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(as = newChildren(0), bs = newChildren(1), diag = newChildren(2))
}

object PairFunctions {
  /** Column API: per-group top-k cosine pairs over (id, embedding, nrm)
    * struct arrays; `diag` marks the within-block group — see
    * [[TopDotPairs]].
    */
  def topDotPairs(as: Column, bs: Column, diag: Column, k: Int): Column =
    ExpressionUtils.column(TopDotPairs(
      ExpressionUtils.expression(as), ExpressionUtils.expression(bs),
      ExpressionUtils.expression(diag), k))

  /** Column API: per-group thresholded cosine pairs — see
    * [[ThresholdDotPairs]].
    */
  def thresholdDotPairs(as: Column, bs: Column, diag: Column, thresh: Double): Column =
    ExpressionUtils.column(ThresholdDotPairs(
      ExpressionUtils.expression(as), ExpressionUtils.expression(bs),
      ExpressionUtils.expression(diag), thresh))

  /** Column API: native bucket pair expansion — see [[PairExpand]]. */
  def pairExpand(as: Column, bs: Column, diag: Column): Column =
    ExpressionUtils.column(PairExpand(ExpressionUtils.expression(as),
      ExpressionUtils.expression(bs), ExpressionUtils.expression(diag)))
}
