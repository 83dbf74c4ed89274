package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact 1-D Wasserstein-1 (earth mover's) distance between two
  * empirical distributions per group — the drift metric that respects
  * MAGNITUDE, completing the distribution-difference family: PSI
  * (row 186) needs bins and saturates, KS (row 217) sees only the
  * worst CDF gap, W₁ integrates |F_A − F_B| over the value axis, so
  * "everything shifted 2%" and "everything shifted 40%" finally read
  * differently.
  *
  *   W₁ = ∫ |F_A(x) − F_B(x)| dx
  *      = Σ_v |cumA(v)·n_B − cumB(v)·n_A| · (v_next − v) / (n_A·n_B)
  *
  * over the group's sorted distinct values — the standard exact
  * two-sample form (equivalently the L1 distance between the quantile
  * functions).
  *
  * Exactness: values quantize to DECIMAL(18,scale) (the CUSUM series
  * contract — the caller names the resolution); per-value counts and
  * cumulations are longs; the CDF comparison is the INTEGER
  * cross-product |cumA·n_B − cumB·n_A| (the q201 KS arithmetic — no
  * float decides a contribution), the value gap scales to INTEGER
  * units of 10^-scale, contributions accumulate in DECIMAL(38,0), and
  * W₁ is two IEEE divisions at the edge (by n_A·n_B, then by the
  * scale factor) in a fixed order the oracle replays. Long products
  * bound the contract at n²·range < 2⁶³ — the same declared headroom
  * as the KS row.
  *
  * Shape: one combinable (group, value) aggregation over raw rows,
  * then cum/lead windows that walk the group's DISTINCT quantized
  * values (value-cardinality-bounded — the q201/ABC discipline: the
  * sorted partition is the value grid, never the event stream).
  * Groups missing a side emit null (no distance to a nonexistent
  * sample). Output: (group…, n_a, n_b, w1).
  */
object Wasserstein {

  def wasserstein1d(
      df: DataFrame, groupCols: Seq[String], sideCol: String,
      valueCol: String, scale: Int = 2): DataFrame = {
    require(scale >= 0 && scale <= 6, s"need scale in [0,6], got $scale")
    val g = groupCols.map(col)
    val dec = s"decimal(18,$scale)"
    val pow10 = math.pow(10, scale).toLong
    val perValue = df
      .filter(col(valueCol).isNotNull && col(sideCol).isNotNull)
      .select(g :+ col(sideCol).cast("boolean").as("__sa") :+
        col(valueCol).cast(dec).as("__v"): _*)
      .groupBy(g :+ col("__v"): _*)
      .agg(sum(when(col("__sa"), 1L).otherwise(0L)).as("__ca"),
        sum(when(!col("__sa"), 1L).otherwise(0L)).as("__cb"))
    val wRun = Window.partitionBy(g: _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(g: _*)
    val wLead = Window.partitionBy(g: _*).orderBy(col("__v"))
    val cum = perValue
      .withColumn("__cuma", sum(col("__ca")).over(wRun))
      .withColumn("__cumb", sum(col("__cb")).over(wRun))
      .withColumn("__na", sum(col("__ca")).over(wAll))
      .withColumn("__nb", sum(col("__cb")).over(wAll))
      .withColumn("__gapi",
        ((lead(col("__v"), 1).over(wLead) - col("__v")) * lit(pow10))
          .cast("long"))
      .withColumn("__contrib",
        (abs(col("__cuma") * col("__nb") - col("__cumb") * col("__na")) *
          col("__gapi")).cast("decimal(38,0)"))
    cum.groupBy(g: _*)
      .agg(max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
        sum(when(col("__gapi").isNotNull, col("__contrib"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("__sum"))
      .select(g ++ Seq(col("n_a"), col("n_b"),
        when(col("n_a") > 0L && col("n_b") > 0L,
          col("__sum").cast("double") /
            (col("n_a") * col("n_b")).cast("double") /
            lit(pow10.toDouble)).as("w1")): _*)
  }
}
