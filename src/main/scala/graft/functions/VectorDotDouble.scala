package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Σ aᵢ·bᵢ in plain double — the cosine SCREEN's inner loop.
  *
  * The expression form `aggregate(zip_with(a,b,(x,y)=>x*y), 0.0, +)` is a
  * higher-order function, which Catalyst evaluates INTERPRETED
  * (CodegenFallback) — and when the screen is a join condition it runs once
  * per candidate pair: at sf1 one label block's millions of pairs burned
  * minutes in `ArrayAggregate.eval`. This kernel is one static call per
  * pair inside whole-stage codegen.
  *
  * Bit-identical to the expression form: same left-to-right summation
  * order, same IEEE double ops. Mismatched lengths or null elements yield
  * null (zip_with pads with null → null sum); NaN/Infinity propagate as
  * IEEE dictates, exactly like the fold.
  */
case class VectorDotDouble(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vector_dot_double"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dotDouble(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  // The kernel returns a boxed null for mismatched lengths/null elements —
  // ev.isNull must be derived from the boxed result.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("boxedDot")
      s"""
         |java.lang.Double $boxed = graft.functions.VectorOps.dotDouble(
         |  $a, $b, ${isFloat(left)}, ${isFloat(right)});
         |${ev.isNull} = ($boxed == null);
         |${ev.value} = ${ev.isNull} ? -1.0 : $boxed.doubleValue();
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDotDouble =
    copy(left = newLeft, right = newRight)
}

object VectorDotDouble {
  private[functions] val descriptor = (
    FunctionIdentifier("vector_dot_double"),
    new ExpressionInfo(classOf[VectorDotDouble].getName, "vector_dot_double"),
    (children: Seq[Expression]) =>
      VectorDotDouble(children.head, children(1)): Expression,
  )
}
