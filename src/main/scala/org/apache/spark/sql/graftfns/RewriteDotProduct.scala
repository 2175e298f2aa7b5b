package org.apache.spark.sql.graftfns

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the interpreted higher-order-function dot
  * product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)),
  *               0.0d, (acc, v) -> acc + v) }}}
  *
  * into the codegen'd [[DotProduct]] expression. Users (and SQL authors)
  * naturally write the HOF form; HOFs are CodegenFallback — interpreted,
  * one intermediate array allocation per row, ~10x slower in the ANN /
  * near-dup benchmarks. The rewrite is a pure win because DotProduct
  * reproduces the HOF form's exact semantics:
  *
  *  - accumulation is left-to-right in double — bit-identical result;
  *  - products must already be computed IN DOUBLE in the lambda (both
  *    multiplicands cast from the float lambda variable). A float-
  *    precision product (`x * y` on floats) rounds differently and is
  *    deliberately NOT matched;
  *  - zero must be literal +0.0d (a -0.0d seed changes the empty-array
  *    result bit);
  *  - length mismatch / null element / null input all yield NULL in
  *    both forms (zip_with pads with null, the fold then nulls out).
  *
  * Conservative by construction: anything structurally different —
  * reversed multiplicand order is fine (IEEE multiply commutes), but a
  * non-identity finish lambda, a non-zero seed, non-float arrays, or
  * extra arithmetic — is left untouched.
  *
  * Registered via [[GraftExtensions]] (`injectOptimizerRule`), or
  * per-session with
  * `spark.experimental.extraOptimizations ++= Seq(RewriteDotProduct)`.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  /** The expression is `v` or `cast(v as double)` for lambda var `v`. */
  private def asDoubleOf(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case w: NamedLambdaVariable => w.exprId == v.exprId && w.dataType == DoubleType
    case Cast(w: NamedLambdaVariable, DoubleType, _, _) => w.exprId == v.exprId
    case _ => false
  }

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def isPlusZeroD(e: Expression): Boolean = e match {
    case Literal(d: Double, DoubleType) =>
      java.lang.Double.doubleToRawLongBits(d) == 0L
    case _ => false
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(a, b, LambdaFunction(Multiply(mx, my, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
        zero,
        LambdaFunction(Add(aa, av, _), Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
        LambdaFunction(fin: NamedLambdaVariable, Seq(farg: NamedLambdaVariable), _))
      if isFloatArray(a) && isFloatArray(b) &&
        isPlusZeroD(zero) &&
        // product computed in double from the two zip vars (either order)
        ((asDoubleOf(mx, x) && asDoubleOf(my, y)) || (asDoubleOf(mx, y) && asDoubleOf(my, x))) &&
        // merge is acc + v (either order — IEEE add commutes)
        ((asDoubleOf(aa, acc) && asDoubleOf(av, v)) || (asDoubleOf(aa, v) && asDoubleOf(av, acc))) &&
        // identity finish
        fin.exprId == farg.exprId =>
      DotProduct(a, b)
  }
}
