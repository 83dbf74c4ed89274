package graft.operators

import org.apache.spark.sql.DataFrame

/** Column-rename operators.
  *
  * Reference: every DATASUS ETL renames raw columns through a "de-para"
  * dictionary after trimming whitespace from header names
  * (sm_cloud_run/etl/siasus_procedimentos_ambulatoriais.py:36,229-230; the
  * same DE_PARA_* pattern appears in all six ETLs). Pure metadata ops in
  * Spark — no data movement.
  */
object Renames {

  /** Trim stray whitespace off every column name (`rename_columns(strip)`). */
  def trimColumnNames(df: DataFrame): DataFrame =
    df.withColumnsRenamed(df.columns.map(c => c -> c.trim).toMap)

  /** De-para rename; keys absent from the frame are ignored (pandas
    * `rename` semantics).
    */
  def dePara(df: DataFrame, mapping: Map[String, String]): DataFrame =
    df.withColumnsRenamed(mapping.filter { case (from, _) => df.columns.contains(from) })
}
