package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Staged storage + chunked bulk load.
  *
  * Reference stages transformed frames as whole CSV strings in object
  * storage (sm_cloud_run/utilitarios/cloud_storage.py:8-50) and bulk-loads
  * with chunked COPY (`carregar_dataframe`/`postgresql_copiar_dados`,
  * sm_cloud_run/utilitarios/bd_utilitarios.py:85-251, passo=10000).
  *
  * Spark-first: staging is a parquet write (schema+types preserved, column
  * pruning on re-read — CSV staging loses both); the COPY chunking maps to
  * write partitioning (`passo` ≈ records per output partition), which is
  * what a distributed sink parallelizes over.
  */
object Staging {

  /** Stage to parquet and hand back the re-read frame. */
  def stageRoundtrip(spark: SparkSession, df: DataFrame, path: String): DataFrame = {
    df.write.mode(SaveMode.Overwrite).parquet(path)
    spark.read.parquet(path)
  }

  /** Chunked bulk load: write grouped by a chunk column (directory
    * partition per chunk, the COPY-batch analog) and re-read.
    */
  def bulkLoadRoundtrip(
      spark: SparkSession, df: DataFrame, chunkCol: String, path: String): DataFrame = {
    df.write.mode(SaveMode.Overwrite).partitionBy(chunkCol).parquet(path)
    spark.read.parquet(path)
  }

  /** JSONL (one JSON object per line) staging roundtrip — the interchange
    * format LLM corpora ship in (WebText/Pile/RedPajama-style dumps are
    * JSONL shards). Write is Spark's native distributed json sink (one
    * shard per partition); the re-read pins the EXPLICIT schema — schema
    * inference is a whole extra pass over 100 TB and type-widens
    * heterogeneous shards, so round-tripping through inference is neither
    * cheap nor faithful.
    */
  def jsonlRoundtrip(spark: SparkSession, df: DataFrame, path: String): DataFrame = {
    df.write.mode(SaveMode.Overwrite).json(path)
    spark.read.schema(df.schema).json(path)
  }

  /** ORC staging roundtrip — the second columnar format every warehouse
    * exchange touches (Hive-era lakes are ORC). Same contract as the
    * parquet path: distributed write, explicit schema on re-read, and the
    * scan keeps columnar virtues (predicate pushdown + column pruning —
    * plan-asserted in PlanShapeSpec), so a filtered re-read touches only
    * the stripes and columns it needs.
    */
  def orcRoundtrip(spark: SparkSession, df: DataFrame, path: String): DataFrame = {
    df.write.mode(SaveMode.Overwrite).orc(path)
    spark.read.schema(df.schema).orc(path)
  }

  /** Small-file compaction (the OPTIMIZE step every long-lived lake table
    * needs): rewrite a fragmented table into `nFiles` range-clustered
    * files sorted on `sortCol` — `repartitionByRange` gives
    * non-overlapping per-file key ranges, so later reads filtered on the
    * key skip whole files via parquet min/max stats, and the small-file
    * metadata pressure (one footer+open per file per task at 100 TB) is
    * gone. Content is untouched; only layout changes.
    *
    * If the destination already carries a `_graft_manifest`
    * ([[graft.operators.Layout.writeBloomManifests]]), the manifest
    * describes files this rewrite deletes — it is re-derived for the same
    * keys after the write (bloom columns normalized to the per-key
    * `bloom_<key>` names, default fpp), so a caller's pruned reads keep
    * working across compactions instead of silently probing a dead file
    * list.
    */
  def compact(
      spark: SparkSession, df: DataFrame, sortCol: String, nFiles: Int,
      path: String): DataFrame = {
    val manifestKeys = graft.operators.Layout.manifestKeys(spark, path)
    df.repartitionByRange(nFiles, org.apache.spark.sql.functions.col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode(SaveMode.Overwrite).parquet(path)
    if (manifestKeys.nonEmpty)
      graft.operators.Layout.writeBloomManifests(spark, path, manifestKeys)
    spark.read.parquet(path)
  }

  /** Persist `df` as a bucketed+sorted catalog table. Tables bucketed the
    * same way on their join key then hash-join WITHOUT a shuffle on either
    * side — at 100 TB this converts every recurring fact-fact join on the
    * key into a scan-local merge. (Bucketing only applies through the
    * catalog, hence `saveAsTable` rather than a path write.)
    */
  def bucketedTable(
      spark: SparkSession, df: DataFrame, name: String,
      bucketCol: String, nBuckets: Int): DataFrame = {
    // A previous JVM's warehouse directory outlives the in-memory catalog;
    // Overwrite can't drop a table the catalog doesn't know, so clear the
    // stale location explicitly or saveAsTable throws LOCATION_ALREADY_EXISTS.
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val stale = new java.io.File(warehouse, name.toLowerCase(java.util.Locale.ROOT))
    if (stale.exists()) {
      import scala.reflect.io.Directory
      new Directory(stale).deleteRecursively()
    }
    df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(name)
    spark.table(name)
  }
}
