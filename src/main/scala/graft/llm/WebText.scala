package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Main-text extraction from raw HTML — the first transform a web-scale
  * corpus applies after the fetch (WARC/CommonCrawl-style pages → training
  * text): boilerplate containers (`head`, `script`, `style`, `nav`,
  * `footer`) are dropped wholesale, remaining tags are stripped, the
  * handful of ubiquitous character entities are decoded, and whitespace is
  * collapsed.
  *
  * Everything is a chain of scan-level codegen'd string expressions — no
  * shuffle, no UDF, no DOM parse — so extraction runs embarrassingly
  * parallel over pages and fuses with downstream quality/dedup passes in
  * one whole-stage-codegen pass. Every pattern is restricted to syntax
  * with identical Java-regex/RE2 semantics (no backreferences, no
  * lookaround; one literal non-greedy block match per container tag), so
  * the DuckDB oracle replays the extraction byte-for-byte.
  *
  * This is the regex-level extractor (trafilatura/jusText-class DOM
  * heuristics need an HTML tree); its contract is documented as tag
  * stripping, not readability scoring.
  */
object WebText {

  /** Containers whose CONTENT is boilerplate and dropped wholesale. */
  val DropBlocks: Seq[String] = Seq("head", "script", "style", "nav", "footer")

  private def dropBlock(c: Column, tag: String): Column =
    regexp_replace(c, s"(?is)<$tag[^>]*>.*?</$tag>", " ")

  /** The ubiquitous entities, decoded innermost-first (`&amp;` LAST so a
    * literal `&amp;lt;` decodes to `&lt;`, not `<`).
    */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&nbsp;" -> " ", "&amp;" -> "&")

  /** Extract display text from an HTML page column. */
  def extractText(html: Column): Column = {
    val noBlocks = DropBlocks.foldLeft(html)(dropBlock)
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    val decoded = Entities.foldLeft(noTags) { case (c, (from, to)) =>
      replace(c, lit(from), lit(to))
    }
    trim(regexp_replace(decoded, """\s+""", " "))
  }

  /** Crude page-quality signal that pairs with [[extractText]]: the
    * fraction of the raw page's characters that survive extraction
    * (boilerplate-heavy pages score low). One IEEE division of two exact
    * lengths.
    */
  def textDensity(html: Column, text: Column): Column =
    length(text).cast("double") / greatest(length(html), lit(1)).cast("double")
}
