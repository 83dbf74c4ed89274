package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators: deterministic sampling and sequence
  * packing — the steps between dedup/quality-filter and the tokenizer in a
  * pretraining pipeline. Both are pure Catalyst expressions / window aggs,
  * deterministic under any partitioning, and SQL-reproducible so the
  * DuckDB oracle checks them end-to-end.
  */
object Curation {

  /** Portable deterministic percent-hash of a key: first 32 md5 bits mod
    * 100 — uniform-ish in [0,100), identical in any engine with md5 (no
    * Murmur3/xxhash dependency), stable across runs/partitionings.
    */
  def pctHash(key: Column): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long") % 100

  /** Stratified sampling: keep a per-stratum percentage, chosen by the
    * deterministic [[pctHash]] of the id — reproducible joins/audits (the
    * same doc is always in or out), no RNG state on executors, and
    * embarrassingly parallel (a scan-level filter, no shuffle).
    * `rates` maps stratum value → percent kept; `defaultRate` covers the
    * rest.
    */
  def stratifiedSample(
      df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Int], defaultRate: Int): DataFrame = {
    val rate = rates.foldRight(lit(defaultRate)) { case ((k, v), el) =>
      when(col(stratumCol) === k, lit(v)).otherwise(el)
    }
    df.filter(pctHash(col(idCol)) < rate)
  }

  /** Offset-based sequence packing: assign each document to the
    * fixed-`budget` token bin its running token-offset starts in
    * (`bin = floor(offset / budget)` with `offset` = the per-group running
    * sum of token counts BEFORE this doc, ordered by id). This is the
    * streaming-packing used for pretraining batches: bins are contiguous
    * id-ordered runs, documents may straddle a boundary (they continue
    * into the next sequence), and the assignment is a single window
    * cumsum per group — one shuffle on the group key, reproducible in SQL.
    */
  def packSequences(
      df: DataFrame, idCol: String, groupCol: String, tokensCol: String,
      budget: Long): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offset = coalesce(sum(col(tokensCol)).over(w), lit(0L))
    df.withColumn("bin", floor(offset / budget))
  }

  /** Per-bin packing summary (docs, tokens, fill ratio vs budget). */
  def packingStats(
      packed: DataFrame, groupCol: String, tokensCol: String,
      budget: Long): DataFrame =
    packed.groupBy(col(groupCol), col("bin"))
      .agg(
        count(lit(1L)).as("docs"),
        sum(col(tokensCol)).as("tokens"))
      .withColumn("preenchimento",
        round(col("tokens").cast("double") / budget.toDouble, 6))
}
