package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grouped statistical model fitting as single aggregations.
  *
  * Reference analogue: the reference's report pipelines reduce per-UF /
  * per-municipality indicator series to summary rows
  * (sisab_resolutividade_por_condicao.py's per-group percentages); the
  * natural next question a health-indicator consumer asks — "which way is
  * this trending?" — is a per-group line fit, re-expressed here the
  * Spark-first way.
  */
object Stats {

  /** Per-group ordinary-least-squares line fit `y = a + b·x` from the
    * four classical sufficient statistics — ONE map-side-combinable
    * aggregation over the scan (Σx, Σy, Σxy, Σx² accumulate in DECIMAL,
    * so the result is identical under any partitioning; a double sum
    * would drift and make the fitted slope depend on the cluster
    * layout). The closed form then runs per GROUP ROW:
    * `b = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²₍sum₎)`, `a = (Σy − b·Σx)/n`,
    * every step an IEEE correctly-rounded double op over exact sums —
    * SQL-replayable bit-for-bit.
    *
    * At 100 TB this is the ONLY shape a grouped regression can take:
    * sufficient statistics are a partial aggregate (tiny state per
    * group); anything that materializes per-group vectors (e.g.
    * collect_list into a solver) caps at executor memory.
    *
    * Degenerate groups — n < 2 or zero x-variance — yield null slope
    * and intercept. Output: group cols + (n, inclinacao, intercepto).
    */
  def groupLinearFit(
      df: DataFrame, groupCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    val x = col(xCol).cast("decimal(38,12)")
    val y = col(yCol).cast("decimal(38,12)")
    val agg = df.groupBy(groupCols.map(col): _*).agg(
      count(lit(1L)).as("n"),
      sum(x).cast("decimal(38,12)").as("__sx"),
      sum(y).cast("decimal(38,12)").as("__sy"),
      sum((col(xCol).cast("double") * col(yCol).cast("double"))
        .cast("decimal(38,12)")).cast("decimal(38,12)").as("__sxy"),
      sum((col(xCol).cast("double") * col(xCol).cast("double"))
        .cast("decimal(38,12)")).cast("decimal(38,12)").as("__sxx"))
    val n = col("n").cast("double")
    val sx = col("__sx").cast("double")
    val sy = col("__sy").cast("double")
    val sxy = col("__sxy").cast("double")
    val sxx = col("__sxx").cast("double")
    val denom = n * sxx - sx * sx
    val b = (n * sxy - sx * sy) / denom
    agg.select(groupCols.map(col) ++ Seq(
      col("n"),
      when(col("n") >= 2 && denom =!= 0.0, b).as("inclinacao"),
      when(col("n") >= 2 && denom =!= 0.0, (sy - b * sx) / n)
        .as("intercepto")): _*)
  }
}
