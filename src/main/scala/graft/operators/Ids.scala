package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Surrogate-id operator.
  *
  * Reference inserts a per-row `uuid7().hex`
  * (sm_cloud_run/etl/siasus_procedimentos_ambulatoriais.py:327-329) —
  * nondeterministic, so no oracle could ever reproduce it and re-runs of the
  * same batch produce different ids. The Spark-first re-expression derives a
  * deterministic surrogate from the natural key: stable across retries,
  * reproducible by the verification oracle, and codegen'd.
  */
object Ids {

  /** 64-hex-char deterministic surrogate id over the natural-key columns.
    *
    * Injective serialization guards: separators inside string parts are
    * escaped (`|` → `\|`) and nulls get an explicit sentinel — otherwise
    * `concat_ws` silently skips nulls and `("a|b")` vs `("a","b")` would
    * collide, giving distinct records the same id. (A part equal to the
    * literal NUL sentinel could still collide — natural keys are expected
    * to be printable codes/numbers.) For all-numeric non-null keys the
    * serialization equals plain `concat_ws('|', …)`, which is what the SQL
    * oracle uses.
    */
  /** NUL as the null-part sentinel — cannot appear in printable key codes. */
  private val NullSentinel: String = 0.toChar.toString

  def surrogateId(naturalKey: Seq[Column], sep: String = "|"): Column = {
    val parts = naturalKey.map { c =>
      // escape the escape char FIRST, then the separator — otherwise
      // ("a\", "b|c") and ("a|b\", "c") both serialize to a\|b\|c
      val escaped = replace(
        replace(c.cast("string"), lit("\\"), lit("\\\\")),
        lit(sep), lit("\\" + sep))
      coalesce(escaped, lit(NullSentinel))
    }
    sha2(concat_ws(sep, parts: _*), 256)
  }
}
