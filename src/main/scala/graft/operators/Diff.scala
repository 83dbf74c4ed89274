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

  /** Order-independent table checksum — the anti-entropy primitive: two
    * replicas (or a table and its rebuild) compare one (rows, checksum)
    * row each instead of shipping data. Each column is md5'd SEPARATELY
    * (fixed 32-hex tokens; nulls → a 32-char non-hex sentinel no digest
    * can produce), so the concatenated row key is injective up to md5
    * collisions — no '|'-in-value or sentinel-string ambiguity. The row
    * digest's first two 32-bit halves combine into 64 bits of per-row
    * entropy; the checksum is their exact DECIMAL(38,0) sum —
    * commutative, so ANY partitioning or row order yields the same
    * value, and portable (md5, no murmur/xxhash dependency) so any
    * engine replays it. One map-side-combinable aggregation, no shuffle
    * beyond the single-row reduce.
    */
  def tableChecksum(df: DataFrame, columns: Seq[String]): DataFrame = {
    val colTokens = columns.map(c =>
      coalesce(md5(col(c).cast("string").cast("binary")), lit("n" * 32)))
    val rowDigest = md5(concat(colTokens: _*).cast("binary"))
    def half(start: Int) =
      conv(substring(rowDigest, start, 8), 16, 10).cast("decimal(38,0)")
    val rowHash = half(1) * lit(4294967296L) + half(9)
    df.agg(
      count(lit(1L)).as("linhas"),
      sum(rowHash).cast("decimal(38,0)").cast("string").as("soma_verificacao"))
  }
}
