package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema-evolution reads over a growing lake table — the source-side
  * reality every long-lived pipeline hits: early batches were written
  * with yesterday's schema (columns missing), later batches add columns
  * (and a column's type may widen). One logical table must read across
  * ALL batch vintages without rewriting history.
  *
  * Spark-first: `mergeSchema` unifies the per-file footers at PLANNING
  * time (the union schema is computed from footer metadata — no data
  * pass), old files surface the added columns as nulls, and column
  * pruning/pushdown still reach every file (a file without the filtered
  * column contributes all rows, one without a projected column
  * contributes nulls — never a scan error). [[readEvolved]] adds the
  * declared-contract layer on top: an explicit target schema with
  * per-column defaults, so "absent in old vintages" is distinguishable
  * from "null in new data" by coalescing ONLY where the batch predates
  * the column.
  *
  * Batches land under `batch=N` partitions (the vintage is part of the
  * path, pruned like any partition column), so "which rows predate
  * column c" is a partition-value predicate — no per-row provenance
  * column needed.
  */
object Evolution {

  /** Write one batch under `root/batch=<n>/` with exactly the columns
    * the writer knew at that vintage.
    */
  def writeBatch(df: DataFrame, root: String, n: Int): Unit =
    df.write.mode("overwrite").parquet(s"$root/batch=$n")

  /** Union-schema read across every batch vintage: mergeSchema fuses
    * the footers; `batch` comes back as the partition column.
    */
  def readMerged(spark: SparkSession, root: String): DataFrame =
    spark.read.option("mergeSchema", "true")
      .option("basePath", root).parquet(root)

  /** [[readMerged]] + declared defaults: for each (column -> (firstBatch,
    * default)), rows from batches BEFORE the column existed read the
    * default instead of null — later nulls stay null (they were written
    * as nulls on purpose). The coalesce is a partition-predicate
    * `when`, codegen'd on the scan, no shuffle.
    */
  def readEvolved(
      spark: SparkSession, root: String,
      defaults: Map[String, (Int, Any)]): DataFrame = {
    val merged = readMerged(spark, root)
    defaults.foldLeft(merged) { case (df, (c, (firstBatch, dflt))) =>
      // a default may be declared ahead of the first batch that writes
      // the column — then NO vintage carries it and col(c) would be
      // unresolved; synthesize the default for every pre-firstBatch row
      val existing =
        if (df.columns.contains(c)) col(c)
        else when(lit(false), lit(dflt)) // typed null of the default's type
      df.withColumn(c,
        when(col("batch") < firstBatch, lit(dflt)).otherwise(existing))
    }
  }
}
