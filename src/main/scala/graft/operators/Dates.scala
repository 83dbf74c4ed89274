package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Date-parsing operators.
  *
  * Reference: competence months arrive as `AAAAMM` strings parsed with
  * `pd.to_datetime(format="%Y%m", errors="coerce")`
  * (sm_cloud_run/etl/siasus_procedimentos_ambulatoriais.py:101,232-239), and
  * `AAAAMMDD` dates tolerate blank-padded digit groups
  * (sm_cloud_run/utilitarios/datas.py:28-62). Both become null-coercing
  * Catalyst expressions (whole-stage codegen; no UDF).
  */
object Dates {

  /** `AAAAMM` → timestamp at month start; unparseable → null. */
  def parseAaaamm(c: Column): Column =
    try_to_timestamp(c, lit("yyyyMM"))

  /** `AAAAMMDD` → timestamp, robust to digits blank-padded instead of
    * zero-padded (datas.py slices the string and relies on `int()`
    * tolerating surrounding spaces); unparseable → null.
    */
  def parseAaaammdd(c: Column): Column = {
    val y = lpad(trim(substring(c, 1, 4)), 4, "0")
    val m = lpad(trim(substring(c, 5, 2)), 2, "0")
    val d = lpad(trim(substring(c, 7, 2)), 2, "0")
    try_to_timestamp(concat(y, m, d), lit("yyyyMMdd"))
  }
}
