package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** JSF form-state extraction from HTML — the parse half of the reference's
  * SISAB report flow (utilitarios/sisab_producao_modelos.py:134-147 pulls
  * the `javax.faces.ViewState` hidden field with BeautifulSoup and scrapes
  * the select-box option codes to assemble the POST payload; the HTTP
  * transport itself stays out of a Spark engine's scope). Here the
  * extraction is `regexp_extract` expressions over an HTML column —
  * scan-level, codegen'd, embarrassingly parallel over pages.
  */
object HtmlForm {

  /** The `javax.faces.ViewState` hidden-input value ('' when absent),
    * attribute order tolerant (id before or after value). `(?s)` so a tag
    * whose attributes span lines (real pretty-printed SISAB HTML) still
    * matches; `[^>]*` keeps each pattern inside one tag.
    */
  def viewState(html: Column): Column = {
    val idFirst = regexp_extract(html,
      """(?s)id="javax\.faces\.ViewState"[^>]*value="([^"]*)"""", 1)
    val valueFirst = regexp_extract(html,
      """(?s)value="([^"]*)"[^>]*id="javax\.faces\.ViewState"""", 1)
    when(idFirst =!= "", idFirst).otherwise(valueFirst)
  }

  /** Explode every `<option value="…">…</option>` of the select box with
    * the given id into one row per option, appending `opcao_codigo` /
    * `opcao_descricao`. Two `regexp_extract_all` passes (one per capture
    * group — Spark returns one group per call) zipped positionally; rows
    * with no such select or no options produce nothing, like the
    * reference's scrape.
    */
  def selectOptions(df: DataFrame, htmlCol: String, selectId: String): DataFrame = {
    // (?s) lets the box body span lines; the open tag is matched tolerantly
    // (other attributes before/after id, any order) and the id itself is
    // regex-quoted — real multi-line SISAB pages parse, not just the
    // single-line synthetic ones.
    val quotedId = java.util.regex.Pattern.quote(selectId)
    val body = regexp_extract(col(htmlCol),
      s"""(?s)<select[^>]*\\bid="$quotedId"[^>]*>(.*?)</select>""", 1)
    val opt = """(?s)<option[^>]*\bvalue="([^"]*)"[^>]*>([^<]*)</option>"""
    // body is materialized ONCE below the explode: regexp_extract_all
    // yields one capture group per call, so the option scan needs two
    // passes over the box body — inlined, each would re-run the
    // whole-page <select> regex (the costliest expression here) per pass
    val zipped = arrays_zip(
      regexp_extract_all(col("__body"), lit(opt), lit(1)),
      regexp_extract_all(col("__body"), lit(opt), lit(2)))
    df.withColumn("__body", body)
      .withColumn("__opt", explode(zipped))
      .withColumn("opcao_codigo", col("__opt.0"))
      .withColumn("opcao_descricao", col("__opt.1"))
      .drop("__opt", "__body")
  }
}
