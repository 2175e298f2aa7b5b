package org.apache.spark.sql.graftfns

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd word n-gram shingling over a token array — the
  * distinct space-joined n-grams in first-occurrence order.
  *
  * Replaces the interpreted HOF chain
  * `array_distinct(transform(sequence(0, size-n), i -> concat_ws(' ',
  * toks[i], ..., toks[i+n-1])))` bit-for-bit (same windows, same
  * separator semantics — concat_ws skips null elements — same
  * first-occurrence dedup order, empty array when size < n, NULL for a
  * NULL input). The HOF form evaluates a lambda expression tree per
  * window and allocates two intermediate arrays per row; shingling is
  * the single hottest stage of the near-dup family (q27/q28/q46/q47
  * and the streaming variant all start from it), which at corpus scale
  * makes the interpreted overhead THE pipeline bottleneck — the same
  * bench-driven justification as [[DotProduct]] (SURVEY.md §7.3).
  */
case class WordShingles(child: Expression, n: Int, dedup: Boolean = true)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  @transient private lazy val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val sz = toks.numElements()
    if (sz < n) return new GenericArrayData(Array.empty[Any])
    // LinkedHashSet (dedup) and ArrayList (all occurrences) share the
    // java.util.Collection toArray contract — one loop serves both modes
    val out: java.util.Collection[UTF8String] =
      if (dedup) new java.util.LinkedHashSet[UTF8String]()
      else new java.util.ArrayList[UTF8String](sz - n + 1)
    var i = 0
    while (i <= sz - n) {
      val parts = new Array[UTF8String](n)
      var k = 0
      while (k < n) {
        parts(k) = if (toks.isNullAt(i + k)) null else toks.getUTF8String(i + k)
        k += 1
      }
      out.add(UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val spaceRef = ctx.addReferenceObj("space", space, classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val sz = ctx.freshName("sz")
      val seen = ctx.freshName("seen")
      val parts = ctx.freshName("parts")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val utf8 = classOf[UTF8String].getName
      val gad = classOf[GenericArrayData].getName
      val coll =
        if (dedup) s"new java.util.LinkedHashSet<$utf8>()"
        else s"new java.util.ArrayList<$utf8>($sz - $n + 1)"
      s"""
         |int $sz = $c.numElements();
         |if ($sz < $n) {
         |  ${ev.value} = new $gad(new Object[0]);
         |} else {
         |  java.util.Collection<$utf8> $seen = $coll;
         |  $utf8[] $parts = new $utf8[$n];
         |  for (int $i = 0; $i <= $sz - $n; $i++) {
         |    for (int $k = 0; $k < $n; $k++) {
         |      $parts[$k] = $c.isNullAt($i + $k) ? null : $c.getUTF8String($i + $k);
         |    }
         |    $seen.add($utf8.concatWs($spaceRef, $parts));
         |  }
         |  ${ev.value} = new $gad($seen.toArray());
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native codegen'd 64-bit SimHash over a token array: dedupe tokens
  * (array_distinct semantics — value equality, nulls skipped), hash
  * each distinct token with xxhash64 (seed 42, the engine default),
  * count set bits per position, emit bit b iff strictly more than half
  * the tokens have it set (2*S_b > N — ties break to 0).
  *
  * Bit-equal to the exploded derivation it replaces
  * (explode(array_distinct(toks)) → xxhash64 → 64 bit-sum aggregates →
  * reassemble), proven on random inputs in TextExprSpec. The plan win
  * is structural, not just codegen: the exploded form shuffles
  * tokens×docs rows through a 65-column aggregation, while this is a
  * MAP-ONLY projection — per-doc state never leaves the row. At corpus
  * scale that deletes the largest shuffle of the SimHash dedup path
  * (reference scope: near-dup infrastructure per SURVEY.md §2.2's
  * LLM-pipeline brief).
  *
  * Returns NULL for a NULL input or when no non-null token exists
  * (those docs have no simhash — the exploded form dropped them in the
  * groupBy; callers filter on isNotNull).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "simhash64"
  // null on non-null input when the array holds no non-null tokens
  override def nullable: Boolean = true

  private val Seed = 42L  // xxhash64's default seed in Spark

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val sz = toks.numElements()
    val seen = new java.util.HashSet[UTF8String]()
    val counts = new Array[Int](64)
    var n = 0
    var i = 0
    while (i < sz) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        if (seen.add(t)) {
          val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(t, Seed)
          n += 1
          var b = 0
          while (b < 64) { counts(b) += ((h >>> b) & 1L).toInt; b += 1 }
        }
      }
      i += 1
    }
    if (n == 0) null
    else {
      var out = 0L
      var b = 0
      while (b < 64) { if (2 * counts(b) > n) out |= (1L << b); b += 1 }
      out
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val sz = ctx.freshName("sz")
      val seen = ctx.freshName("seen")
      val counts = ctx.freshName("counts")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val t = ctx.freshName("t")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      val utf8 = classOf[UTF8String].getName
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      s"""
         |int $sz = $c.numElements();
         |java.util.HashSet<$utf8> $seen = new java.util.HashSet<$utf8>();
         |int[] $counts = new int[64];
         |int $n = 0;
         |for (int $i = 0; $i < $sz; $i++) {
         |  if ($c.isNullAt($i)) continue;
         |  $utf8 $t = $c.getUTF8String($i);
         |  if (!$seen.add($t)) continue;
         |  long $h = $xxh.hashUTF8String($t, ${Seed}L);
         |  $n++;
         |  for (int $b = 0; $b < 64; $b++) $counts[$b] += (int) (($h >>> $b) & 1L);
         |}
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $out = 0L;
         |  for (int $b = 0; $b < 64; $b++) if (2 * $counts[$b] > $n) $out |= (1L << $b);
         |  ${ev.value} = $out;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native winnowing fingerprints (Schleimer et al., SIGMOD'03 — the
  * MOSS document-fingerprinting algorithm) over a token array, fused
  * into one loop per row: k-gram construction, code-point polynomial
  * hashing, sliding w-window minimum, and first-occurrence dedup.
  *
  * Bit-identical to the interpreted HOF chain it replaces
  * (`transform(sequence…)` k-grams → `concat_ws(" ", …)` →
  * per-character `split`/`ascii` polynomial fold mod 1e9+7 →
  * `array_min(slice(…))` per window → `array_distinct`), proven on
  * random inputs in TextExprSpec. Spark's `ascii` is `codePointAt(0)`
  * of the first code point (same as DuckDB's `ord`), so the hash here
  * walks UTF-8 code points — identical for non-ASCII text too. The
  * interpreted form allocates a per-character string array for every
  * gram of every document (three HOF lambda trees deep), which made
  * winnowing the single most expensive stage in the suite; this is a
  * map-only projection with zero allocations beyond the output array.
  *
  * Semantics preserved exactly: `concat_ws` skips null tokens (all-null
  * grams hash to 0 via the empty string); fewer than w grams — which
  * includes fewer than k tokens — yields an EMPTY array (the caller's
  * explode then drops the doc, matching the old `size(hs) >= w`
  * filter); NULL input yields NULL.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(k >= 1, s"gram size must be >= 1, got $k")
  require(w >= 1, s"window size must be >= 1, got $w")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = WinnowFingerprints.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.compute($c, $k, $w);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprints {
  private val Mod = 1000000007L

  /** The portable per-string hash, start accumulator 0 — shared with
    * [[PolyHashes]].
    */
  private[graftfns] def polyHash(s: UTF8String): Long = hashCodePoints(0L, s)

  /** Polynomial fold acc = (acc*31 + codePoint) % Mod over s's UTF-8
    * code points (Spark `ascii` ≡ DuckDB `ord` per char of `split`).
    */
  private def hashCodePoints(acc0: Long, s: UTF8String): Long = {
    var acc = acc0
    val n = s.numBytes
    var i = 0
    while (i < n) {
      val b = s.getByte(i) & 0xFF
      var cp = 0
      if (b < 0x80) { cp = b; i += 1 }
      else if (b < 0xE0) {
        cp = ((b & 0x1F) << 6) | (s.getByte(i + 1) & 0x3F); i += 2
      } else if (b < 0xF0) {
        cp = ((b & 0x0F) << 12) | ((s.getByte(i + 1) & 0x3F) << 6) |
          (s.getByte(i + 2) & 0x3F); i += 3
      } else {
        cp = ((b & 0x07) << 18) | ((s.getByte(i + 1) & 0x3F) << 12) |
          ((s.getByte(i + 2) & 0x3F) << 6) | (s.getByte(i + 3) & 0x3F); i += 4
      }
      acc = (acc * 31 + cp) % Mod
    }
    acc
  }

  /** Row kernel, shared verbatim by eval and codegen. */
  def compute(toks: ArrayData, k: Int, w: Int): GenericArrayData = {
    val sz = toks.numElements()
    val ng = sz - k + 1
    if (ng < w) return new GenericArrayData(Array.empty[Any])
    val hs = new Array[Long](ng)
    var i = 0
    while (i < ng) {
      var acc = 0L
      var first = true
      var j = 0
      while (j < k) {
        if (!toks.isNullAt(i + j)) {
          if (!first) acc = (acc * 31 + 32) % Mod // the concat_ws ' '
          acc = hashCodePoints(acc, toks.getUTF8String(i + j))
          first = false
        }
        j += 1
      }
      hs(i) = acc
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i <= ng - w) {
      var m = hs(i)
      var j = 1
      while (j < w) { if (hs(i + j) < m) m = hs(i + j); j += 1 }
      seen.add(m)
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }
}

/** Element-wise engine-portable polynomial hash over a string array:
  * each element folds `acc = (acc*31 + codePoint) % 1000000007` (the
  * q35/q63 hash — DuckDB replicates it exactly with
  * `list_reduce(list_transform(string_split(s,''), ord), ...)`), so a
  * downstream shuffle can key on 8-byte longs instead of the strings
  * (q65: the shingle-keyed collect_set's dominant byte volume at
  * corpus scale). Collisions (~2⁻³⁰ density) are ENGINE-IDENTICAL —
  * oracle equality is unaffected; the report is perturbed equally and
  * negligibly on both sides.
  */
case class PolyHashes(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "poly_hashes"

  override def nullSafeEval(input: Any): Any =
    PolyHashes.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = PolyHashes.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyHashes {
  /** Row kernel, shared verbatim by eval and codegen. A null element
    * hashes like the empty string (accumulator 0) — shingle arrays
    * are containsNull=false in practice, this just keeps the kernel
    * total.
    */
  def compute(arr: ArrayData): GenericArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val s = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      out(i) = if (s == null) 0L else WinnowFingerprints.polyHash(s)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native MinHash signature over a shingle array: sig[i] = min over
  * shingles of xxhash64(i, shingle), for i in 0 until numHashes — ONE
  * walk of the array computing all minima, replacing numHashes
  * separate interpreted `array_min(transform(sh, x => xxhash64(lit(i),
  * x)))` passes (16 lambda evaluations and 16 intermediate arrays per
  * row; at corpus scale the signature pass is the map-side cost of the
  * whole MinHash dedup path).
  *
  * Bit-identical to the HOF form: Spark's multi-arg xxhash64 chains
  * args through the seed, so `xxhash64(lit(i), x)` is
  * `hashUTF8String(x, hashInt(i, 42))` — the per-i seeds are
  * precomputed once. Null shingles contribute the bare seed (a null
  * arg leaves the running hash unchanged); an EMPTY array — and a NULL
  * one, which the HOF chain turns into array_min(null) per slot —
  * yields an all-null signature. All preserved exactly; callers filter
  * on size > 0 as before.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends Expression with ExpectsInputTypes {

  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"
  override def nullable: Boolean = false // null input -> all-null sig, not null

  // xxhash64's default seed is 42; hashing the Int literal i first
  // chains into each string hash as that element's seed
  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i =>
      org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(i, 42L))

  override def eval(input: InternalRow): Any =
    MinHashSig.compute(child.eval(input).asInstanceOf[ArrayData], seeds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val seedsRef = ctx.addReferenceObj("seeds", seeds, "long[]")
    val cls = MinHashSig.getClass.getName.stripSuffix("$")
    val c = child.genCode(ctx)
    ev.copy(
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral,
      code = code"""
        |${c.code}
        |org.apache.spark.sql.catalyst.util.GenericArrayData ${ev.value} =
        |  $cls.compute(${c.isNull} ? null : ${c.value}, $seedsRef);
        |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object MinHashSig {
  /** Row kernel, shared verbatim by eval and codegen. A null or empty
    * array yields the all-null signature (what the HOF chain produced).
    */
  def compute(sh: ArrayData, seeds: Array[Long]): GenericArrayData = {
    val k = seeds.length
    if (sh == null) return new GenericArrayData(new Array[Any](k))
    val n = sh.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](k)) // all-null sig
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var j = 0
    while (j < n) {
      if (sh.isNullAt(j)) {
        // null arg leaves the running hash at the seed
        var i = 0
        while (i < k) { if (seeds(i) < mins(i)) mins(i) = seeds(i); i += 1 }
      } else {
        val s = sh.getUTF8String(j)
        var i = 0
        while (i < k) {
          val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(s, seeds(i))
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins) // primitive-long constructor, no boxing
  }
}

object TextFunctions {
  /** Column API for native shingling (token array -> distinct n-grams). */
  def shingles(toks: Column, n: Int): Column =
    ExpressionUtils.column(WordShingles(ExpressionUtils.expression(toks), n))

  /** All n-gram occurrences in position order (no dedup) — the
    * frequency-counting variant (BPE pair statistics, n-gram LMs).
    */
  def shinglesAll(toks: Column, n: Int): Column =
    ExpressionUtils.column(
      WordShingles(ExpressionUtils.expression(toks), n, dedup = false))

  /** Column API for the native map-only SimHash (token array -> long). */
  def simhash64(toks: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(toks)))

  /** Column API for native winnowing (token array -> distinct
    * fingerprint longs; k-gram hashes, min of each 4-window).
    */
  def winnowFingerprints(toks: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(
      WinnowFingerprints(ExpressionUtils.expression(toks), k, w))

  /** Column API for the native one-pass MinHash signature. */
  def minhashSig(sh: Column, numHashes: Int): Column =
    ExpressionUtils.column(
      MinHashSig(ExpressionUtils.expression(sh), numHashes))

  /** Column API for element-wise portable polynomial hashes (string
    * array -> long array; the q35/q63 hash, DuckDB-replicable).
    */
  def polyHashes(arr: Column): Column =
    ExpressionUtils.column(PolyHashes(ExpressionUtils.expression(arr)))
}
