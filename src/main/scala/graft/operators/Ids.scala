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

  /** 64-hex-char deterministic surrogate id over the natural-key columns. */
  def surrogateId(naturalKey: Seq[Column], sep: String = "|"): Column =
    sha2(concat_ws(sep, naturalKey: _*), 256)
}
