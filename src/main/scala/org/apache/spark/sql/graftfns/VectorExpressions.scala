package org.apache.spark.sql.graftfns

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native codegen'd dot product over float-array columns.
  *
  * The built-in route (`aggregate(zip_with(...))`) evaluates interpreted
  * (higher-order functions are CodegenFallback) and allocates an
  * intermediate array per row — measured ~10x slower on the ANN /
  * near-dup queries. This expression emits a tight multiply-add loop via
  * doGenCode (SURVEY.md §7.3's "custom expression only if bench demands
  * it" — it did).
  *
  * Determinism: accumulates LEFT-TO-RIGHT in double, the exact op order
  * of the interpreted fold and of DuckDB's list_reduce oracle — results
  * are bit-identical to both, so it is safe inside oracle-checked
  * queries.
  *
  * Null semantics MATCH the HOF form exactly (which is what makes the
  * RewriteDotProduct optimizer rule a sound substitution): zip_with
  * pads a shorter array with nulls and the fold then yields NULL, so a
  * length mismatch or a null element returns NULL here too — never a
  * silently truncated product.
  *
  * Lives under org.apache.spark.sql (the standard extension-library
  * pattern) because Column<->Expression bridging and AbstractDataType
  * are private[sql].
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  // can return null on non-null inputs (length mismatch / null element)
  override def nullable: Boolean = true

  private def elementsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      // per-element null checks only when the static schema says null
      // elements are possible — the containsNull=false hot path is a
      // branch-free multiply-add loop
      val nullCheck =
        if (elementsNullable)
          s"if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $x.numElements();
         |if ($y.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $acc += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All L random-hyperplane sign signatures of a float vector in ONE
  * kernel: returns `array<int>` of length `tables`, where element t is
  * the `bits`-bit bucket of table t (bit j set iff
  * dot(vec, plane[t][j]) > 0). The composed form this replaces built
  * tables×bits separate [[DotProduct]] nodes inside one Generate
  * projection — a 120-node expression tree (12×10 at q31's scheme)
  * whose generated code re-read the input array per plane; here the
  * planes live in ONE flat reference array
  * (`planes[(t*bits + j)*dim + i]`) and the input is walked with plain
  * index loops. Arithmetic matches the driver-side probe signature
  * bit-for-bit: left-to-right double accumulation over
  * min(dim, |vec|), strict `> 0` sign. Null elements contribute
  * nothing (embeddings carry containsNull=false; the guard is for
  * schema generality). NULL input → NULL.
  */
case class HyperplaneSigs(child: Expression, planes: Array[Float],
    tables: Int, bits: Int, dim: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(tables >= 1 && bits >= 1 && bits <= 30 && dim >= 1,
    s"bad scheme: tables=$tables bits=$bits dim=$dim")
  require(planes.length == tables * bits * dim,
    s"planes length ${planes.length} != tables*bits*dim ${tables * bits * dim}")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hyperplane_sigs"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var sig = 0
      var j = 0
      while (j < bits) {
        val base = (t * bits + j) * dim
        var acc = 0.0
        var i = 0
        while (i < n) {
          if (!v.isNullAt(i)) acc += planes(base + i).toDouble * v.getFloat(i).toDouble
          i += 1
        }
        if (acc > 0) sig |= (1 << j)
        j += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val p = ctx.addReferenceObj("planes", planes, "float[]")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val sig = ctx.freshName("sig")
      val acc = ctx.freshName("acc")
      val base = ctx.freshName("base")
      val elemNullCheck =
        if (child.dataType.asInstanceOf[ArrayType].containsNull)
          s"if ($v.isNullAt($i)) continue;"
        else ""
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |int[] $out = new int[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  int $sig = 0;
         |  for (int $j = 0; $j < $bits; $j++) {
         |    int $base = ($t * $bits + $j) * $dim;
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $elemNullCheck
         |      $acc += (double) $p[$base + $i] * (double) $v.getFloat($i);
         |    }
         |    if ($acc > 0) $sig |= (1 << $j);
         |  }
         |  $out[$t] = $sig;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  /** Register the native functions for SQL use on a live session
    * (tests, driver-created sessions). For builder-time wiring use
    * `spark.sql.extensions=org.apache.spark.sql.graftfns.GraftExtensions`.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingles", wordShinglesBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_fingerprints", winnowBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig", minhashBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "html_text", exprs => HtmlText(exprs(0), exprs(1)), "built-in")
  }

  /** Shared SQL builder (registry + extensions): n must be a literal —
    * the shingle width shapes the expression, it cannot vary per row.
    */
  private[graftfns] def wordShinglesBuilder(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): WordShingles =
    WordShingles(exprs(0), exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _) => n
      case other => throw new IllegalArgumentException(
        s"word_shingles(toks, n): n must be an integer literal, got $other")
    })

  /** Shared SQL builder: k and w shape the expression — literals only. */
  private[graftfns] def winnowBuilder(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): WinnowFingerprints = {
    def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression, name: String): Int =
      e match {
        case org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _) => n
        case other => throw new IllegalArgumentException(
          s"winnow_fingerprints(toks, k, w): $name must be an integer literal, got $other")
      }
    WinnowFingerprints(exprs(0), intLit(exprs(1), "k"), intLit(exprs(2), "w"))
  }

  /** Shared SQL builder: the hash count shapes the expression — literal only. */
  private[graftfns] def minhashBuilder(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): MinHashSig =
    MinHashSig(exprs(0), exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _) => n
      case other => throw new IllegalArgumentException(
        s"minhash_sig(sh, k): k must be an integer literal, got $other")
    })

  /** Column API for the native dot product (float arrays, double out). */
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column API for the fused multi-table hyperplane signatures. */
  def hyperplaneSigs(v: Column, planes: Array[Float],
      tables: Int, bits: Int, dim: Int): Column =
    ExpressionUtils.column(
      HyperplaneSigs(ExpressionUtils.expression(v), planes, tables, bits, dim))

  /** L2 norm via the native dot. */
  def norm(a: Column): Column = org.apache.spark.sql.functions.sqrt(dot(a, a))
}

/** SparkSessionExtensions entry point: set
  * `spark.sql.extensions=org.apache.spark.sql.graftfns.GraftExtensions`
  * and every session gets `dot_product` in SQL plus the
  * [[RewriteDotProduct]] optimizer rule (HOF dot-product folds are
  * silently upgraded to the codegen'd expression).
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DotProduct].getCanonicalName, "dot_product"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("word_shingles"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[WordShingles].getCanonicalName, "word_shingles"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VectorFunctions.wordShinglesBuilder(exprs)))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("simhash64"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[SimHash64].getCanonicalName, "simhash64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHash64(exprs(0))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("winnow_fingerprints"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[WinnowFingerprints].getCanonicalName, "winnow_fingerprints"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VectorFunctions.winnowBuilder(exprs)))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("minhash_sig"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[MinHashSig].getCanonicalName, "minhash_sig"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VectorFunctions.minhashBuilder(exprs)))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("warc_digest"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[WarcDigest].getCanonicalName, "warc_digest"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WarcDigest(exprs(0))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("html_text"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[HtmlText].getCanonicalName, "html_text"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        HtmlText(exprs(0), exprs(1))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("url_canon"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[UrlCanon].getCanonicalName, "url_canon"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        UrlCanon(exprs(0))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("url_host"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[UrlHost].getCanonicalName, "url_host"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        UrlHost(exprs(0))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("url_domain"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[UrlDomain].getCanonicalName, "url_domain"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        UrlDomain(exprs(0))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("url_surt"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[UrlSurt].getCanonicalName, "url_surt"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        UrlSurt(exprs(0))))
    ext.injectOptimizerRule(_ => RewriteDotProduct)
    ext.injectOptimizerRule(_ => SplitTimeBounds)
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graftplans.AsOfJoinStrategy)
  }
}
