package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Directory-listing metadata parse.
  *
  * Reference: FTP `LIST` lines are parsed with a regex into modification
  * date, hour, size and name (sm_cloud_run/etl/datasus_ftp_metadados.py:
  * 104-126), then the 8-char file name is sliced into
  * tipo/uf/ano/mes/partição and the date+hour recombined into a timestamp
  * (:179-200). Here the whole parse is `regexp_extract`/`substring`
  * expressions over a line column — scan-level, codegen'd.
  */
object Listing {

  private val LineRe = """^(\d{2}-\d{2}-\d{2})\s+(\d{2}:\d{2}[APM]{2})\s+(\d+)\s+(.+)"""

  /** Parse listing lines into (data_modificacao, hora, tamanho, nome).
    *
    * One anchored validity regex + one `split(limit=4)` instead of four
    * `regexp_extract` evaluations of the same pattern per line (regex
    * extraction reruns the whole match once per requested group — the
    * grammar is whitespace-delimited with the name as trailing remainder,
    * so a limited split recovers the groups in a single pass). Lines that
    * don't match keep the reference regex semantics: empty strings, null
    * size.
    */
  def parseLines(df: DataFrame, lineCol: String): DataFrame = {
    val l = col(lineCol)
    val valid = l.rlike(LineRe)
    val parts = split(l, "\\s+", 4)
    df.withColumns(Map(
      "data_modificacao" -> when(valid, element_at(parts, 1)).otherwise(""),
      "hora" -> when(valid, element_at(parts, 2)).otherwise(""),
      "tamanho" -> when(valid, element_at(parts, 3)).otherwise(lit(null)).cast("long"),
      "nome_completo" -> when(valid, element_at(parts, 4)).otherwise(""),
    ))
  }

  /** Slice an 8-char DATASUS-style file name into its fields; empty
    * partition tag → null (reference `.replace('', pd.NA)`).
    */
  def splitName(df: DataFrame, nameCol: String): DataFrame = {
    val n = col(nameCol)
    df.withColumns(Map(
      "tipo" -> substring(n, 1, 2),
      "sigla_uf" -> substring(n, 3, 2),
      "ano" -> substring(n, 5, 2),
      "mes" -> substring(n, 7, 2),
      "particao" -> graft.operators.NullRules.emptyToNull(
        regexp_extract(n, """^\w{8}(.*)\.dbc$""", 1)),
      "nome" -> substring(n, 1, 8),
    ))
  }

  /** Combine `MM-dd-yy` date + `hh:mmAM/PM` hour into a timestamp
    * (reference `pd.to_datetime(format='%m-%d-%y %I:%M%p')`).
    */
  def modificationTs(dateCol: Column, hourCol: Column): Column =
    try_to_timestamp(concat_ws(" ", dateCol, hourCol), lit("MM-dd-yy hh:mma"))
}
