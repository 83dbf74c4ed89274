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

  /** Overlapping token-window chunking: split each document into windows
    * of `window` tokens advancing by `window - overlap` — the
    * context-length shaping step between curation and the tokenizer
    * (retrieval corpora, fixed-context pretraining). Emits one row per
    * chunk: `chunk_idx`, the whitespace-rejoined `chunk_text`, and its
    * token count (the last chunk may be short; a document shorter than
    * one window is exactly one chunk). Pure explode over a scan-level
    * sequence — no shuffle, parallel in the documents, and every window
    * is a deterministic `slice` of the token array (no per-row state), so
    * the whole fan-out is SQL-reproducible.
    */
  def chunkTokens(
      df: DataFrame, textCol: String, window: Int, overlap: Int): DataFrame = {
    require(window > 0 && overlap >= 0 && overlap < window,
      s"need 0 <= overlap < window, got window=$window overlap=$overlap")
    val stride = window - overlap
    // tokenization materializes in ONE projected column; everything below
    // references the attribute (chunk count in the generator, window slice
    // per chunk) so split() runs once per document, not once per chunk
    val n = size(col("__toks"))
    // number of chunks: 1 + ceil(max(0, n - window) / stride), at least 1
    val chunks = lit(1) + ceil(greatest(n - window, lit(0)).cast("double") / stride)
      .cast("int")
    df.withColumn("__toks", TextAnalysis.tokens(col(textCol)))
      .withColumn("chunk_idx", explode(sequence(lit(0), chunks - 1)))
      .select(
        df.columns.map(col) :+
          col("chunk_idx") :+
          concat_ws(" ",
            slice(col("__toks"), col("chunk_idx") * stride + 1, lit(window)))
            .as("chunk_text") :+
          least(size(col("__toks")) - col("chunk_idx") * stride, lit(window))
            .cast("int").as("chunk_tokens"): _*)
  }
}
