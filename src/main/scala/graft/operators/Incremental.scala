package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental-refresh bookkeeping.
  *
  * Reference: before each ETL/load run, `verificar_e_executar` selects
  * metadata rows where the downstream timestamp is missing or older than the
  * upstream one (`timestamp_modificacao_ftp > timestamp_etl_gcs` /
  * `timestamp_etl_gcs > timestamp_load_bd`, with `IS NULL` for
  * never-processed; sm_cloud_run/scripts/verificar_e_executar.py:36-57) —
  * the driver of all incremental work.
  *
  * Spark-first: the same staleness predicate as a scan-level filter over
  * the metadata table — evaluated for a whole partition of work items at
  * once rather than one (uf, período) per HTTP request.
  */
object Incremental {

  /** Rows whose `consumedTs` is missing or older than `producedTs`. */
  def stalePredicate(producedTs: Column, consumedTs: Column): Column =
    consumedTs.isNull || (producedTs > consumedTs)

  /** Work list: metadata rows needing refresh for the given stage. */
  def needsRefresh(meta: DataFrame, producedTs: String, consumedTs: String): DataFrame =
    meta.filter(stalePredicate(col(producedTs), col(consumedTs)))
}
