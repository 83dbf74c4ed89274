package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the
  * canonical-composition pass every text-curation pipeline runs before
  * hashing/dedup (a decomposed `e`+U+0301 and a precomposed `é` must
  * fingerprint identically or near-dup detection silently misses pairs).
  *
  * Spark has no built-in normalizer; the expression form would be a Scala
  * UDF (no codegen, serialization per row). This is one static
  * `java.text.Normalizer` call per row inside whole-stage codegen, with a
  * fast pre-check (`Normalizer.isNormalized`) so the common all-ASCII /
  * already-NFC row allocates nothing. Matches DuckDB's `nfc_normalize`,
  * which makes the operator oracle-checkable end-to-end.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def dataType: DataType = child.dataType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcOps.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcOps.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Static kernel (separate object so codegen sees a Java static call). */
object NfcOps {
  import java.text.Normalizer

  def normalize(s: UTF8String): UTF8String = {
    if (s == null) return null
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

object NfcNormalize {
  private[functions] val descriptor = (
    FunctionIdentifier("nfc_normalize"),
    new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
    (children: Seq[Expression]) => NfcNormalize(children.head): Expression,
  )
}
