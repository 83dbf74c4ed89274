package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Null-normalization operators.
  *
  * Reference chain (sm_cloud_run/etl/siasus_procedimentos_ambulatoriais.py:
  * 241-285): empty string → NA frame-wide; all-'0' codes → NA; all-'9'
  * codes → NA; sentinel values (age `'999'`) → NA; plus conditional
  * multi-column null-out (`update_where`, :303-313). All expressed as
  * `when`/`rlike` so they fuse into one codegen stage with the scan.
  */
object NullRules {

  /** `'' → null` for one column (pandas `.replace("", np.nan)`). */
  def emptyToNull(c: Column): Column =
    when(c === "", lit(null)).otherwise(c)

  /** Codes made only of '0' → null (reference also nulls `""` here since
    * `all()` of an empty string is vacuously true).
    */
  def allZerosToNull(c: Column): Column =
    when(c.rlike("^0*$"), lit(null)).otherwise(c)

  /** Codes made only of '9' → null; nulls stay null. */
  def allNinesToNull(c: Column): Column =
    when(c.rlike("^9+$"), lit(null)).otherwise(c)

  /** Exact sentinel match → null (e.g. age `'999'`). */
  def sentinelToNull(c: Column, sentinel: String): Column =
    when(c === sentinel, lit(null)).otherwise(c)

  /** Null out `cols` wherever `cond` holds (janitor `update_where`). */
  def nullOutWhen(df: DataFrame, cond: Column, cols: Seq[String]): DataFrame =
    df.withColumns(cols.map(c => c -> when(cond, lit(null)).otherwise(col(c))).toMap)
}
