package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native nearest-centroid assignment: `graft_nearest_cell(vec, centroids)`
  * returns the 0-based index of the squared-euclidean-nearest row of the
  * `array<array<double>>` centroid matrix (first minimum wins, so ties
  * break to the lowest cell — identical to
  * `array_position(dists, array_min(dists)) - 1`).
  *
  * The pure-expression form (`transform` over the centroid literal with a
  * `zip_with`+`aggregate` distance per cell) is CodegenFallback: k·dim
  * interpreted lambda frames PER ROW, and the cost scales with the cell
  * count — thread dumps showed every executor pinned in
  * `ArrayTransform.eval` once the k-means cell count grew with the corpus
  * (SURVEY §4's recurring HOF lesson). This kernel is one static call with
  * two primitive loops; per-row cost is k·dim double ops inside
  * whole-stage codegen.
  */
case class NearestCell(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<array<double>>), " +
        s"got (${l.catalogString}, ${r.catalogString})")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_cell"

  override def nullSafeEval(vec: Any, cents: Any): Any =
    NearestCellOps.nearest(vec.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (v, c) => s"graft.functions.NearestCellOps.nearest($v, $c)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCell =
    copy(left = newLeft, right = newRight)
}

/** Static kernel (separate object so codegen emits a plain Java call). */
object NearestCellOps {
  def nearest(v: ArrayData, cents: ArrayData): Int = {
    val k = cents.numElements()
    var best = -1
    var bestD = Double.PositiveInfinity
    var i = 0
    while (i < k) {
      val c = cents.getArray(i)
      val dim = math.min(v.numElements(), c.numElements())
      var d = 0.0
      var j = 0
      while (j < dim) {
        val t = v.getDouble(j) - c.getDouble(j)
        d += t * t
        j += 1
      }
      if (d < bestD) { bestD = d; best = i } // strict: first minimum wins
      i += 1
    }
    best
  }
}

object NearestCell {
  private[functions] val descriptor = (
    FunctionIdentifier("graft_nearest_cell"),
    new ExpressionInfo(classOf[NearestCell].getName, "graft_nearest_cell"),
    (children: Seq[Expression]) =>
      NearestCell(children(0), children(1)): Expression,
  )
}
