package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Intra-document language segmentation — the multilingual-corpus
  * reality [[TextAnalysis.langId]] (row 31) cannot see: a whole-document
  * language label is WRONG for code-switched pages (a Portuguese article
  * quoting English paragraphs), and LLM curation pipelines route, filter
  * and count tokens PER LANGUAGE SEGMENT (e.g. the CommonCrawl-style
  * per-language extraction passes). Published shape: window-classify
  * then merge — score fixed-width token windows with the n-gram/marker
  * classifier and run-length-merge adjacent same-language windows into
  * segments (the linear-time segmentation baseline; change-point
  * refinements share the same window-score substrate).
  *
  * Shape at 100 TB: windows explode per document (document-bounded, the
  * [[Winnow]] discipline), the per-window classifier is the row-31
  * integer marker count + declaration-order argmax (codegen'd, exactly
  * replayable), and the run-length merge is two per-document windows
  * (lag + cumsum) over WINDOW rows — bounded by ⌈tokens/W⌉ per doc,
  * never by corpus size — plus one combinable per-run aggregation.
  * Integer scores decide every boundary; no float anywhere.
  *
  * Output: one row per segment — (idCol, seg, lang, token_inicio,
  * token_fim, n_janelas) with seg 0-based per document in order,
  * token_fim EXCLUSIVE.
  */
object LangSegment {

  def langSegments(
      docs: DataFrame, idCol: String, textCol: String,
      window: Int = 20): DataFrame = {
    require(window >= 1, s"need window >= 1, got $window")
    val toks = docs
      .select(col(idCol).as("__id"),
        TextAnalysis.tokens(col(textCol)).as("__t"))
      .filter(size(col("__t")) > 0)
    // non-overlapping W-token windows; the last one may be short
    // window count = 1 + (n-1) div W in exact integer arithmetic (the
    // no-float-decides-membership rule; Column `/` would be IEEE)
    val wins = toks.select(col("__id"), size(col("__t")).as("__n"),
        posexplode(transform(
          sequence(lit(0), expr(s"(size(__t) - 1) div $window")),
          i => slice(col("__t"), i * window + 1, lit(window)))))
      .select(col("__id"), col("__n"), col("pos").as("__w"),
        col("col").as("__wt"))
    val (scores, pred) = TextAnalysis.langId(col("__wt"))
    val scored = wins.select(col("__id"), col("__n"), col("__w"),
      pred.as("__lang"))
    // run-length merge: boundary where the language changes
    val wOrd = Window.partitionBy("__id").orderBy(col("__w"))
    val runs = scored
      .withColumn("__chg",
        when(lag(col("__lang"), 1).over(wOrd).isNull ||
          lag(col("__lang"), 1).over(wOrd) =!= col("__lang"), 1L)
          .otherwise(0L))
      .withColumn("__run", sum(col("__chg")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, 0)))
    runs.groupBy(col("__id"), col("__run"))
      .agg(
        min(col("__lang")).as("lang"),
        (min(col("__w")) * window).cast("long").as("token_inicio"),
        least(max(col("__w") + 1) * window, max(col("__n")))
          .cast("long").as("token_fim"),
        count(lit(1L)).as("n_janelas"))
      .select(col("__id").as(idCol), (col("__run") - 1L).as("seg"),
        col("lang"), col("token_inicio"), col("token_fim"),
        col("n_janelas"))
  }
}
