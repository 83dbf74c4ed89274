package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Delimited-report ingestion (SISAB-style).
  *
  * Reference: reports arrive as ISO-8859-1 text with a prose header, a
  * `;`-separated body using `,` decimals and `.` thousands separators, a
  * `Fonte:` footer, and stray `Unnamed` columns
  * (sm_cloud_run/utilitarios/sisab_relatorio_producao_utilitarios.py:194-223).
  */
object ReportCsv {

  /** Real-file ingestion path: delimited read with the report dialect. */
  def readDelimited(spark: SparkSession, path: String, encoding: String = "ISO-8859-1"): DataFrame =
    spark.read
      .option("sep", ";")
      .option("header", "true")
      .option("encoding", encoding)
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** Parse a decimal-comma / thousands-dot numeral into a double. */
  def parseDecimalComma(c: Column): Column =
    regexp_replace(regexp_replace(c, "\\.", ""), ",", ".").cast("double")

  /** Verticalize a wide report (one column per category/competence) into
    * long form — the reference's `DataFrame.melt` over the SISAB report
    * (sm_cloud_run/utilitarios/sisab_relatorio_producao_utilitarios.py:
    * 305-312). Spark-first: `unpivot` (pure narrow transform, no shuffle);
    * empty cells become 0 like the reference's `fillna(0).astype(int)`.
    */
  def meltReport(
      df: DataFrame, ids: Seq[String], valueCols: Seq[String],
      varName: String, valueName: String): DataFrame =
    df.unpivot(ids.map(col).toArray, valueCols.map(col).toArray, varName, valueName)
      .withColumn(valueName, coalesce(col(valueName), lit(0)).cast("int"))

  private val PtMonths = Seq(
    "JAN" -> "01", "FEV" -> "02", "MAR" -> "03", "ABR" -> "04",
    "MAI" -> "05", "JUN" -> "06", "JUL" -> "07", "AGO" -> "08",
    "SET" -> "09", "OUT" -> "10", "NOV" -> "11", "DEZ" -> "12")

  /** `MES/AAAA` Portuguese competence label → month-start date
    * (`MESES[dt[:3]] + dt[3:]` then `%m/%Y`,
    * sisab_relatorio_producao_utilitarios.py:319-324); unknown → null.
    */
  def parsePtCompetencia(c: Column): Column = {
    val mm = PtMonths.foldLeft(lit(null).cast("string")) { case (acc, (pt, num)) =>
      when(upper(substring(c, 1, 3)) === pt, lit(num)).otherwise(acc)
    }
    make_date(substring(c, 5, 4).cast("int"), mm.cast("int"), lit(1))
  }

  /** Drop pandas-style `Unnamed` spill columns. */
  def dropUnnamed(df: DataFrame): DataFrame =
    df.drop(df.columns.filter(_.startsWith("Unnamed")): _*)

  /** Trim a prose header (first `headerLines` lines) and everything from
    * the footer marker on, given an explicit line-number column (text has
    * no inherent order in a distributed scan, so the position is data).
    */
  def trimHeaderFooter(
      df: DataFrame, lineNoCol: String, headerLines: Int, footerMarker: Column): DataFrame = {
    // Footer position found with a 1-row aggregate broadcast back over the
    // scan (a global window would funnel everything into one partition).
    val bound = df.agg(min(when(footerMarker, col(lineNoCol))).as("__footer_start"))
    df.crossJoin(broadcast(bound))
      .filter(col(lineNoCol) > headerLines &&
        (col("__footer_start").isNull || col(lineNoCol) < col("__footer_start")))
      .drop("__footer_start")
  }
}
