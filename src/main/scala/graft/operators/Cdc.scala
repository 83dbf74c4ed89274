package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Changelog (CDC) application: fold a batch of keyed change events —
  * upserts and deletes carrying a monotone sequence number — into a
  * snapshot table, the Debezium/Delta-change-feed `MERGE` every lakehouse
  * ingestion layer runs. Generalizes the reference's delete-conflicts
  * upsert (utilitarios/bd_utilitarios.py:262): there every incoming row
  * wins unconditionally; here ORDER among changes matters (a delete after
  * an update must erase the row, an update after a delete must restore
  * it) and only the latest change per key is applied.
  *
  * Spark-first shape, sized for a small batch against a 100 TB snapshot:
  *  - the per-key winner comes from the bounded-heap TopKRows aggregate
  *    (map-side partials cap the exchange at one row per key per
  *    partition); a window `row_number` would sort+shuffle the whole
  *    changelog, `max_by` has no deterministic tie contract;
  *  - the snapshot is probed with a broadcast LEFT ANTI on the winner
  *    keys — the target never shuffles (the q76/q93 SCD discipline) and
  *    composes with [[Upsert.upsertBloomPruned]]'s scan-side split when
  *    the target is file-backed;
  *  - survivors and applied winners reunite in one `unionByName` plan.
  */
object Cdc {

  /** Apply `changes` to `target`.
    *
    * Contract: `changes` carries every `target` column (full row images,
    * keys included) plus `seqCol` (monotone change order, UNIQUE within a
    * key — ties would make the winner, and any engine replaying the log,
    * nondeterministic) and `opCol`. The latest change per key wins:
    * `deleteOp` drops the key from the result; any other op replaces the
    * existing row or inserts a missing one. Keys absent from the log pass
    * through untouched.
    */
  def applyChangelog(
      target: DataFrame, changes: DataFrame, keyCols: Seq[String],
      seqCol: String, opCol: String, deleteOp: String = "D"): DataFrame = {
    val winners = TopK.groupTopKRows(
        changes, keyCols, Seq((seqCol, false)), k = 1, posCol = "__pos")
      .drop("__pos")
    val survivors = target.join(
      broadcast(winners.select(keyCols.map(col): _*)), keyCols, "left_anti")
    survivors.unionByName(
      winners.filter(col(opCol) =!= deleteOp)
        .select(target.columns.map(col).toSeq: _*))
  }
}
