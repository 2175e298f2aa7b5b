package org.apache.spark.sql.graftfns

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

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
    ext.injectOptimizerRule(_ => RewriteDotProduct)
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graftplans.AsOfJoinStrategy)
  }
}
