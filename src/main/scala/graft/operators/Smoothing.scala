package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Holt linear-trend exponential smoothing per group (Holt 1957 /
  * Winters 1960 — the workhorse short-horizon forecaster): level and
  * trend updated recursively over the day-bucketed series,
  *
  *   l_t = α·y_t + (1−α)·(l_{t−1} + b_{t−1})
  *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
  *
  * with the standard initialization l_1 = y_1, b_1 = y_2 − y_1 (0 for a
  * one-point series). Forecast h steps out = l_n + h·b_n. Completes the
  * time-series family: [[Timeseries]] fits global trends (OLS,
  * Theil–Sen) and decomposes seasonality; Holt is the recency-weighted
  * recursive smoother operators actually page against.
  *
  * The recursion is inherently sequential IN t — but only within a
  * group's own series, which is CALENDAR-BOUNDED (one point per day
  * bucket: a year is 365 elements no matter how many raw rows fold into
  * each bucket). So the shape is the [[Timeseries.seasonalDecompose]]
  * discipline: one combinable day-bucket pre-aggregation over the raw
  * rows (DECIMAL(38,6)-summed — order-independent), then the per-group
  * fold as ONE `aggregate` higher-order function over the array_sort'd
  * (day, y) structs — never a cross-row window, never a driver loop.
  * Raw-row volume scales freely; the recursion length does not.
  *
  * Determinism: the fold applies the identical IEEE expression sequence
  * both engines (the oracle replays it as a recursive CTE in the same
  * position order), so level/trend/forecast are bit-identical doubles —
  * no tolerance, hash-comparable.
  *
  * Output: one row per group — n (series length), nivel (l_n),
  * tendencia (b_n), previsao_1, previsao_7.
  */
object Smoothing {

  def holtSmooth(
      df: DataFrame, groupCols: Seq[String], dayCol: Column,
      valueCol: String, alpha: Double, beta: Double): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(alpha > 0 && alpha <= 1 && beta >= 0 && beta <= 1,
      s"need alpha in (0,1], beta in [0,1]: got $alpha, $beta")
    val g = groupCols.map(col)
    // day bucket: DECIMAL-exact fold of raw rows into one point per day
    val daily = df
      .filter(valueColNotNull(valueCol))
      .groupBy(g :+ dayCol.as("__d"): _*)
      .agg(sum(col(valueCol).cast("decimal(38,6)")).cast("double")
        .as("__y"))
    val series = daily
      .groupBy(g: _*)
      .agg(array_sort(collect_list(struct(col("__d"), col("__y"))))
        .as("__s"))
      .withColumn("__v", transform(col("__s"), _.getField("__y")))
      .withColumn("n", size(col("__v")).cast("long"))
    val a = lit(alpha)
    val b = lit(beta)
    // init (l1, b1), then fold elements 2..n; newL appears twice in the
    // trend update — identical IEEE expression, identical result (the
    // oracle's recursive CTE duplicates it the same way)
    val init = struct(
      element_at(col("__v"), 1).as("l"),
      when(col("n") >= 2L,
        element_at(col("__v"), 2) - element_at(col("__v"), 1))
        .otherwise(lit(0.0)).as("b"))
    val folded = aggregate(
      slice(col("__v"), lit(2), greatest(col("n").cast("int") - 1, lit(0))),
      init,
      (st, y) => struct(
        (a * y + (lit(1.0) - a) * (st.getField("l") + st.getField("b")))
          .as("l"),
        (b * ((a * y + (lit(1.0) - a) *
            (st.getField("l") + st.getField("b"))) - st.getField("l")) +
          (lit(1.0) - b) * st.getField("b")).as("b")))
    series
      .withColumn("__f", folded)
      .select(g ++ Seq(
        col("n"),
        col("__f.l").as("nivel"),
        col("__f.b").as("tendencia"),
        (col("__f.l") + col("__f.b")).as("previsao_1"),
        (col("__f.l") + lit(7.0) * col("__f.b")).as("previsao_7")): _*)
  }

  private def valueColNotNull(c: String): Column = col(c).isNotNull
}
