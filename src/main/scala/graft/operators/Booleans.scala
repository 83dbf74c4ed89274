package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Boolean-coercion operators.
  *
  * Reference: `'0'/'1'` flags → bool with anything else → NA
  * (`_para_booleano`, sm_cloud_run/etl/siasus_procedimentos_ambulatoriais.py:
  * 107-114), and the maintained-establishment flag where only `'M'` is true
  * and anything else — including NA — is false (:286-290).
  */
object Booleans {

  /** `'1'`→true, `'0'`→false, else null. */
  def zeroOne(c: Column): Column =
    when(c === "1", lit(true)).when(c === "0", lit(false)).otherwise(lit(null).cast("boolean"))

  /** `'M'`→true, anything else (incl. null) → false. */
  def isM(c: Column): Column =
    when(c === "M", lit(true)).otherwise(lit(false))
}
