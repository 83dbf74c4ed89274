package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Schema-map casting + validation gates.
  *
  * Reference: `tratar_tipos` casts a frame to a dtype dictionary with
  * `errors="ignore"` (sm_cloud_run/etl/sisab_resolutividade_por_condicao.py:
  * 121-127) and `validar_pa` asserts guarded columns are fully non-null
  * (sm_cloud_run/etl/siasus_procedimentos_ambulatoriais.py:366-378).
  *
  * Spark-first: per-row `try_cast` (a failed value becomes null instead of
  * silently leaving the whole column untyped — the scalable reinterpretation
  * of pandas' column-level errors='ignore'), and validation as an aggregate
  * over the same scan rather than a driver-side `applymap`.
  */
object Casts {

  /** Cast each listed column to its target type; uncastable values → null. */
  def castWithSchema(df: DataFrame, schema: Map[String, String]): DataFrame =
    df.withColumns(schema.collect {
      case (name, tpe) if df.columns.contains(name) => name -> col(name).try_cast(tpe)
    })

  /** One row per guarded column with its null count; empty result (after
    * filtering violations > 0) means the gate passes.
    */
  def nullViolations(df: DataFrame, guarded: Seq[String]): DataFrame = {
    val counts = df.agg(
      count(lit(1)).as("__total"),
      guarded.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c")): _*
    )
    val stacked = guarded.map { c =>
      counts.select(lit(c).as("coluna"), col(s"__nulls_$c").as("nulos"), col("__total").as("total"))
    }.reduce(_.unionByName(_))
    stacked.filter(col("nulos") > 0)
  }
}
