package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot reconciliation — the data-diff every 100 TB pipeline needs
  * before promoting a rebuilt table (regression-test a refactor, audit an
  * upsert, validate a migration).
  *
  * Reference analogue: the load layer trusts `upsert`/`carregar_dataframe`
  * blindly; a diff of (previous snapshot, candidate snapshot) is the
  * operational check that a re-run changed exactly what it should.
  *
  * Spark-first: `exceptAll` both ways. Catalyst plans each side as one
  * hash aggregation over all columns (count per distinct row) plus one
  * join — multiset semantics, so duplicate rows diff correctly (a row
  * appearing 3× old and 2× new shows up once as removed). Both sides
  * shuffle once on the full-row hash; nothing collects to the driver.
  */
object Diff {

  /** Rows added to / removed from `old` in `neu`, tagged `mudanca` ∈
    * {adicionada, removida}. A modified row appears as one `removida`
    * (its old version) plus one `adicionada` (its new version).
    */
  def diffSnapshots(old: DataFrame, neu: DataFrame): DataFrame =
    neu.exceptAll(old).withColumn("mudanca", lit("adicionada"))
      .unionByName(old.exceptAll(neu).withColumn("mudanca", lit("removida")))
}
