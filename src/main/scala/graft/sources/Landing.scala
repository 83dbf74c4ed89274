package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Landing-zone workflow — the engine side of the reference's network
  * retrieval loop (`sm_cloud_run/utilitarios/datasus_ftp.py:77-142`
  * ftplib fetch; `scripts/verificar_e_executar.py` freshness gate),
  * re-expressed so the SOCKET never enters the engine:
  *
  *   1. [[graft.sources.Listing]] parses the remote catalog (an FTP
  *      `LIST` dump, q02's operator) into structured rows;
  *   2. [[landedState]] scans the local landing directory with Spark's
  *      `binaryFile` source — METADATA ONLY (name, size, mtime): column
  *      pruning reaches the binaryFile reader, so `content` is never
  *      read or buffered for a state scan, and a million-file landing
  *      zone costs a file-status pass, not an I/O pass;
  *   3. [[fetchWorklist]] anti-joins the two — files missing from the
  *      landing zone, or landed with a different size than the catalog
  *      claims, come back as (file, reason) fetch work;
  *   4. the fetch itself runs OUT-OF-BAND with any transfer tool
  *      (zero-egress environments, proxies and credential handling stay
  *      outside the cluster), e.g.:
  *      {{{
  *      # worklist.csv = fetchWorklist(...).select("nome_completo") dump
  *      while read f; do
  *        curl -sS --fail -O "ftp://HOST/REMOTE_DIR/$f" -o "LANDING/$f"
  *      done < worklist.csv
  *      # or, mirroring with lftp:
  *      lftp -e 'mirror --only-missing REMOTE_DIR LANDING; quit' HOST
  *      }}}
  *   5. a re-run of [[fetchWorklist]] proves the zone current (empty
  *      worklist), and [[Dbf.readDbc]]/[[Dbf.readDbf]] decode the landed
  *      blobs distributed, one partition per file.
  *
  * The whole loop is idempotent and restartable: the worklist is
  * derived state, so a crashed fetch simply re-lists. LandingSpec
  * replays 1-5 offline end-to-end (the "fetch" is a local copy).
  */
object Landing {

  /** Landing-zone state: one row per landed file — `nome_completo`
    * (base name), `tamanho` (bytes), `modificado_em`. Metadata only;
    * the binaryFile `content` column is pruned away before the scan.
    */
  def landedState(
      spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(dir)
      .select(
        element_at(split(col("path"), "/"), -1).as("nome_completo"),
        col("length").as("tamanho"),
        col("modificationTime").as("modificado_em"))

  /** Fetch worklist: catalog entries absent from the landing zone or
    * landed at a different size. `listing` must carry (`nome_completo`,
    * `tamanho`) — [[Listing.parseLines]]'s shape; `landed` is
    * [[landedState]]'s (or any frame with the same two columns).
    * Output: the listing row + `motivo` ∈ {ausente, tamanho_diferente}.
    *
    * Size, not mtime, is the freshness signal — FTP `LIST` timestamps
    * lose precision across timezones/DST while sizes are exact, which
    * is also the reference's re-download rule. The join is on the file
    * NAME: both sides are catalog-sized (≤ millions of rows), orders of
    * magnitude under the data itself — AQE plans it broadcast whenever
    * one side fits.
    */
  def fetchWorklist(listing: DataFrame, landed: DataFrame): DataFrame = {
    val l = landed.select(
      col("nome_completo"),
      col("tamanho").cast("long").as("__tamanho_local"))
    listing.join(l, Seq("nome_completo"), "left_outer")
      .withColumn("motivo",
        when(col("__tamanho_local").isNull, "ausente")
          .when(col("__tamanho_local") =!= col("tamanho").cast("long"),
            "tamanho_diferente"))
      .filter(col("motivo").isNotNull)
      .drop("__tamanho_local")
  }
}
