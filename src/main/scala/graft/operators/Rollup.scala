package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grouped roll-ups and batch recombination.
  *
  * Reference: partitioned FTP-file metadata is rolled up per
  * (tipo, uf, ano, mes, nome) — partition names collected into a list, sizes
  * summed, timestamps min/max'd (`processar_particoes`,
  * sm_cloud_run/etl/datasus_ftp_metadados.py:129-161) — after keeping only
  * the trailing 13 months per group (:203-205); transformed batches are
  * recombined with `pd.concat` (etl/siasus_procedimentos_ambulatoriais.py:442).
  *
  * Spark-first: `groupBy().agg()` with partial (map-side) aggregation;
  * the trailing-window filter is a windowed per-group max, not a
  * groupby-apply; batch recombination is `unionByName` — one distributed
  * plan, nothing funnels through the driver.
  */
object Rollup {

  /** Keep rows whose `dateCol` is within `months` months of the per-group
    * max (reference's "últimos 13 meses" filter, truncated to month starts
    * so the cutoff is calendar-stable).
    */
  def keepTrailingMonths(df: DataFrame, groupCols: Seq[String], dateCol: String, months: Int): DataFrame = {
    // Per-group cutoffs are a tiny aggregate (one row per group) broadcast
    // back over the scan — never a window over the fact table, which at
    // scale would shuffle 100 TB to compute a handful of cutoff dates.
    val cutoffs = df
      .groupBy(groupCols.map(c => col(c).as(s"__graft_g_$c")): _*)
      .agg(add_months(to_date(date_trunc("MONTH", max(col(dateCol)))), -months)
        .as("__graft_cutoff"))
    val cond = groupCols.map(c => df(c) <=> col(s"__graft_g_$c")).reduce(_ && _)
    df.join(broadcast(cutoffs), cond, "inner")
      .filter(to_date(col(dateCol)) >= col("__graft_cutoff"))
      .drop("__graft_cutoff" +: groupCols.map(c => s"__graft_g_$c"): _*)
  }

  /** Roll partitions up into their logical file: list of partition tags
    * (sorted, joined — deterministic), summed sizes, min/max timestamps.
    */
  def rollupPartitions(
      df: DataFrame, groupCols: Seq[String], partitionCol: String,
      sizeCol: String, tsCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*).agg(
      array_join(sort_array(collect_list(col(partitionCol))), ",").as("particoes"),
      sum(col(sizeCol).cast("decimal(28,3)")).cast("double").as("tamanho_total"),
      max(col(tsCol)).as("ts_max"),
      min(col(tsCol)).as("ts_min"),
      count(lit(1L)).as("num_particoes"),
    )

  /** Recombine transformed batches (`pd.concat` analog) — resolves columns
    * by name so batch column order can differ.
    */
  def unionBatches(batches: Seq[DataFrame]): DataFrame =
    batches.reduceLeft(_.unionByName(_))

  /** Wide-format pivot (the inverse of q41's unpivot; pandas
    * `pivot_table(aggfunc='count')`): one row per key, one count column
    * per EXPLICIT pivot value. Passing the values up front matters at
    * scale — `pivot(col)` without them runs a whole extra distinct job
    * over 100 TB just to learn the column list; with them the plan is a
    * single map-side-combinable aggregation, missing combinations
    * backfilled with 0.
    */
  def pivotCounts(
      df: DataFrame, keyCol: String, pivotCol: String,
      values: Seq[String]): DataFrame =
    df.groupBy(col(keyCol)).pivot(pivotCol, values)
      .agg(count(lit(1L)))
      .na.fill(0L, values)
}
