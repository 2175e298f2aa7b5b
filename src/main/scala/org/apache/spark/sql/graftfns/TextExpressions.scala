package org.apache.spark.sql.graftfns

import org.apache.spark.sql.Column
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
case class WordShingles(child: Expression, n: Int)
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
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= sz - n) {
      val parts = new Array[UTF8String](n)
      var k = 0
      while (k < n) {
        parts(k) = if (toks.isNullAt(i + k)) null else toks.getUTF8String(i + k)
        k += 1
      }
      seen.add(UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
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
      s"""
         |int $sz = $c.numElements();
         |if ($sz < $n) {
         |  ${ev.value} = new $gad(new Object[0]);
         |} else {
         |  java.util.LinkedHashSet<$utf8> $seen = new java.util.LinkedHashSet<$utf8>();
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

object TextFunctions {
  /** Column API for native shingling (token array -> distinct n-grams). */
  def shingles(toks: Column, n: Int): Column =
    ExpressionUtils.column(WordShingles(ExpressionUtils.expression(toks), n))
}
