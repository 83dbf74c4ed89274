package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Σ (aᵢ−bᵢ)² in plain double — the IVF/k-means ROUTING inner loop.
  *
  * The expression form `aggregate(zip_with(v,c,(x,y)=>(x-y)²), 0.0, +)` is
  * a higher-order function, which Catalyst evaluates INTERPRETED
  * (CodegenFallback) — and in `Ivf.centroidDistances` it runs once per
  * (query, centroid): at the 50k-cell scale row 147 targets, the routing
  * product alone is |queries|·50k interpreted folds. This kernel is one
  * static call inside whole-stage codegen (the [[VectorDotDouble]]
  * lesson applied to the distance).
  *
  * Bit-identical to the expression form: same left-to-right summation
  * order, same IEEE double ops — probe ORDER (and therefore every ANN
  * result downstream) is unchanged. Mismatched lengths or null elements
  * yield null, exactly like the zip_with fold.
  */
case class SqDistDouble(left: Expression, right: Expression)
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
  override def prettyName: String = "graft_sqdist"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.sqDistDouble(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("boxedDist")
      s"""
         |java.lang.Double $boxed = graft.functions.VectorOps.sqDistDouble(
         |  $a, $b, ${isFloat(left)}, ${isFloat(right)});
         |${ev.isNull} = ($boxed == null);
         |${ev.value} = ${ev.isNull} ? -1.0 : $boxed.doubleValue();
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistDouble =
    copy(left = newLeft, right = newRight)
}

object SqDistDouble {
  private[functions] val descriptor = (
    FunctionIdentifier("graft_sqdist"),
    new ExpressionInfo(classOf[SqDistDouble].getName, "graft_sqdist"),
    (children: Seq[Expression]) =>
      SqDistDouble(children.head, children(1)): Expression,
  )
}
