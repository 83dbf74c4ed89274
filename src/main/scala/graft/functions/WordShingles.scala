package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct SORTED word n-gram shingles of a token array — one static call
  * per document.
  *
  * The expression form (`transform(sequence(1, size-n+1), i =>
  * concat_ws(" ", slice(toks, i, n)))` + `array_distinct` + `sort_array`)
  * is a higher-order function: Catalyst evaluates the whole projection
  * INTERPRETED (CodegenFallback), and because projections collapse through
  * `Repartition`, the token expression (`split(trim(lower(text)))`) gets
  * re-inlined and re-evaluated per shingle index — O(tokens²) per doc, all
  * interpreted. (An Exchange is a stage boundary, not an optimizer
  * barrier.) This kernel runs inside whole-stage codegen, touches each
  * token once, dedupes and sorts in one pass.
  *
  * Semantics equal `sort_array(array_distinct(transform(...)))`: shingles
  * of `n` consecutive tokens, `concat_ws` null-skipping, binary UTF8
  * ordering (TreeSet over UTF8String's natural order = Spark's StringType
  * sort order). Empty array when the doc has fewer than `n` tokens.
  */
case class WordShingles(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, int literal), got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(toks: Any, n: Any): Any =
    ShingleOps.shingles(toks.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) => s"graft.functions.ShingleOps.shingles($t, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordShingles =
    copy(left = newLeft, right = newRight)
}

/** Static kernel (separate object so codegen sees a Java static call). */
object ShingleOps {
  private val Space = UTF8String.fromString(" ")

  def shingles(toks: ArrayData, n: Int): ArrayData = {
    val size = toks.numElements()
    if (size < n) return new GenericArrayData(Array.empty[Any])
    val set = new java.util.TreeSet[UTF8String]()
    val window = new Array[UTF8String](n)
    var i = 0
    while (i + n <= size) {
      var j = 0
      while (j < n) {
        window(j) = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
        j += 1
      }
      set.add(UTF8String.concatWs(Space, window: _*)) // concat_ws skips nulls
      i += 1
    }
    new GenericArrayData(set.toArray[AnyRef](new Array[AnyRef](set.size)))
  }

  /** Every shingle INSTANCE in document order (multiplicity preserved) —
    * the repetition-metric variant: n-gram frequency counting needs the
    * duplicated instances that [[shingles]]'s distinct set throws away.
    */
  def shinglesAll(toks: ArrayData, n: Int): ArrayData = {
    val size = toks.numElements()
    if (size < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[AnyRef](size - n + 1)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i + n <= size) {
      var j = 0
      while (j < n) {
        window(j) = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(Space, window: _*) // concat_ws skips nulls
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** All shingle instances (document order, duplicates kept) — same kernel
  * family as [[WordShingles]], minus the dedup/sort; feeds n-gram
  * repetition counting where multiplicity IS the signal.
  */
case class WordShinglesAll(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, int literal), got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles_all"

  override def nullSafeEval(toks: Any, n: Any): Any =
    ShingleOps.shinglesAll(toks.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) => s"graft.functions.ShingleOps.shinglesAll($t, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordShinglesAll =
    copy(left = newLeft, right = newRight)
}

object WordShinglesAll {
  private[functions] val descriptor = (
    FunctionIdentifier("word_shingles_all"),
    new ExpressionInfo(classOf[WordShinglesAll].getName, "word_shingles_all"),
    (children: Seq[Expression]) =>
      WordShinglesAll(children.head, children(1)): Expression,
  )
}

object WordShingles {
  private[functions] val descriptor = (
    FunctionIdentifier("word_shingles"),
    new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
    (children: Seq[Expression]) =>
      WordShingles(children.head, children(1)): Expression,
  )
}
