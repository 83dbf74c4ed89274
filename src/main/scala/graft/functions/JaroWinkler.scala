package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro–Winkler similarity (Jaro 1989; Winkler 1990) — the record-
  * linkage field comparator the Fellegi–Sunter layer wants for NAME
  * agreement (edit distance counts a prefix typo and a suffix typo the
  * same; census-style linkage weights the shared prefix, which is why
  * Winkler's variant is the de-facto name comparator).
  *
  * Semantics pinned to DuckDB's `jaro_winkler_similarity` (verified
  * empirically, edge cases included) so the oracle is a genuinely
  * INDEPENDENT native implementation, not a replay of this arithmetic:
  *   - either side empty → 0.0 (both-empty included — DuckDB's rule);
  *   - match window = max(l1,l2)/2 − 1 (floored, never below 0 — so
  *     1-char strings only match at distance 0);
  *   - jaro = (m/l1 + m/l2 + (m − t)/m)/3, t = matched-but-out-of-order
  *     position count halved with INTEGER division (the count can be
  *     odd; rounding down is the rapidfuzz/DuckDB convention);
  *   - Winkler boost ONLY when jaro > 0.7: jw = jaro + min(prefix,4)
  *     ·0.1·(1 − jaro).
  * Cross-engine float agreement is a handful of IEEE ops in fixed order —
  * final-ulp at worst, absorbed by the gate's 9-digit normalization.
  *
  * CONTRACT — unit of comparison is the UTF-16 CODE UNIT, not the code
  * point: identical to DuckDB's byte walk on ASCII (the linkage-
  * normalized regime this operator contracts). Outside the BMP a
  * surrogate PAIR counts as two units, so two distinct astral
  * characters sharing a high surrogate score 2/3 where a code-point
  * walk scores 0 (spec-pinned in FunctionsSpec "jaro_winkler non-BMP"),
  * and DuckDB's UTF-8 byte walk is a THIRD convention out there —
  * non-BMP text must not reach this comparator expecting cross-engine
  * agreement. Normalize/strip to BMP first (the q202 pipeline's
  * lower/trim names are ASCII).
  *
  * A Scala UDF here would pay serialization per row and break whole-stage
  * codegen in the hottest loop of the linkage pipeline (one call per
  * candidate pair); this stays a single static call inside the generated
  * code, zero allocations beyond the two boolean match tables.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[StringType] &&
        right.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerOps.similarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.JaroWinklerOps.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

/** Static kernel (separate object so codegen sees a Java static call). */
object JaroWinklerOps {

  def similarity(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString
    val s2 = b.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (s1 == s2) return 1.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (!found && j <= hi) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var halfTrans = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) halfTrans += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    // INTEGER halving, pinned to DuckDB/rapidfuzz: the mismatch count
    // CAN be odd (equal matched multisets, different drop positions —
    // e.g. "…000000180" vs "…00x000180" mismatches 3 of 17), and the
    // engines only agree if the odd half rounds DOWN on both sides
    val t = (halfTrans / 2).toDouble
    val jaro = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val pMax = math.min(4, math.min(l1, l2))
    while (prefix < pMax && s1.charAt(prefix) == s2.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}

object JaroWinkler {
  private[functions] val descriptor = (
    FunctionIdentifier("jaro_winkler"),
    new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
    (children: Seq[Expression]) =>
      JaroWinkler(children.head, children(1)): Expression,
  )
}
