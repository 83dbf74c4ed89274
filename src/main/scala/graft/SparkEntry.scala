package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator ↔ query map.
  *
  * The 200+-entry `queries`/`oracleSql` maps live in per-family registry
  * shards under `registry/` (traits mixed in here, entries verbatim);
  * this object only aggregates them and hosts the flagship `entry`.
  */
object SparkEntry
    extends RegistryCore with RegistryWarehouse with RegistryDedup with RegistryLinkGraph with RegistrySimilarity with RegistryText with RegistryRetrieval with RegistryCuration with RegistryMultimodal with RegistryStreaming with RegistryStats with RegistryTimeseries {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q08_predicate_filter")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    queriesCore ++ queriesWarehouse ++ queriesDedup ++ queriesLinkGraph ++ queriesSimilarity ++ queriesText ++ queriesRetrieval ++ queriesCuration ++ queriesMultimodal ++ queriesStreaming ++ queriesStats ++ queriesTimeseries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    oraclesCore ++ oraclesWarehouse ++ oraclesDedup ++ oraclesLinkGraph ++ oraclesSimilarity ++ oraclesText ++ oraclesRetrieval ++ oraclesCuration ++ oraclesMultimodal ++ oraclesStreaming ++ oraclesStats ++ oraclesTimeseries ++ oracleSqlRest
}
