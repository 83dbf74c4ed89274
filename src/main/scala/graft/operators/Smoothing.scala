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

  /** EWMA control chart (Roberts, Technometrics 1959) — the drift
    * monitor BETWEEN row 167's memoryless z-score and row 206's
    * all-memory CUSUM: z_t = λ·y_t + (1−λ)·z_{t−1} geometrically
    * discounts history, catching sustained small shifts a point flag
    * misses while re-centering faster than CUSUM after a regime ends.
    * Control limits are the exact finite-horizon form
    *
    *   μ ± L·σ·√( λ/(2−λ) · (1 − (1−λ)^{2t}) )
    *
    * with z_0 = μ (the in-series mean — the standard retrospective
    * chart), σ the sample standard deviation of the bucketed series.
    *
    * Same shape contract as [[holtSmooth]]: one DECIMAL-summed
    * day-bucket pre-aggregation over raw rows, then the recursion as
    * ONE `aggregate` fold over the array_sort'd series — per-group
    * series are calendar-bounded, so the fold length never scales with
    * row volume. The discount power (1−λ)^{2t} is NOT computed with
    * pow() (whose rounding is not IEEE-mandated and may differ between
    * the JVM and the oracle's libm): it rides the fold as r2_t =
    * r2_{t−1}·rr, one IEEE multiply per step that a recursive CTE
    * replays bit-for-bit. μ and σ come from exact decimal sums; every
    * remaining op (one division, sqrt, multiplies) is IEEE-exact, so
    * the alarm's float comparison is engine-deterministic. σ is the
    * POPULATION form from exact sums (the zScoreFlags tree).
    *
    * Output: one row per (group…, time) — valor, ewma, lim_inferior,
    * lim_superior, alarme.
    */
  def ewmaChart(
      df: DataFrame, groupCols: Seq[String], dayCol: Column,
      valueCol: String, lambda: Double = 0.25,
      limitL: Double = 3.0): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(lambda > 0 && lambda < 1, s"need lambda in (0,1), got $lambda")
    require(limitL > 0, s"need limitL > 0, got $limitL")
    val g = groupCols.map(col)
    val lam = lit(lambda)
    val oneMinus = lit(1.0 - lambda)
    val rr = lit((1.0 - lambda) * (1.0 - lambda))
    val cFac = lit(lambda / (2.0 - lambda))
    val daily = df
      .filter(valueColNotNull(valueCol))
      .groupBy(g :+ dayCol.as("__d"): _*)
      .agg(sum(col(valueCol).cast("decimal(38,6)")).cast("double")
        .as("__y"))
    val series = daily
      .groupBy(g: _*)
      .agg(
        array_sort(collect_list(struct(col("__d"), col("__y")))).as("__s"),
        count(lit(1L)).as("n"),
        sum(col("__y").cast("decimal(38,12)")).cast("decimal(38,12)")
          .as("__sx"),
        sum((col("__y") * col("__y")).cast("decimal(38,12)"))
          .cast("decimal(38,12)").as("__sxx"))
      .withColumn("__mu", col("__sx").cast("double") / col("n").cast("double"))
      // population σ from the exact sums — the proven q150 (zScoreFlags)
      // expression tree, replayed verbatim by the oracle
      .withColumn("__sigma", sqrt(greatest(
        col("__sxx").cast("double") / col("n").cast("double") -
          col("__mu") * col("__mu"), lit(0.0))))
    // the per-point chart needs every z_t, not just the last. z_t IS
    // the left fold over the length-t prefix, so each point re-runs the
    // fold with steps past t gated to exact no-ops: identical per-step
    // IEEE ops in identical order (bit-equal to the sequential
    // recursion — the oracle's recursive CTE replays unchanged), with
    // ZERO per-step allocation. The previous shape appended to the
    // carried array via concat — the same O(n²) step count but with an
    // O(t) array copy PER STEP, a quadratic allocation churn in series
    // length; n is calendar-bounded by the day-bucket contract, and
    // the gated flops are branch-cheap where the copies were not.
    val zs = transform(sequence(lit(1), col("n").cast("int")), t =>
      aggregate(
        col("__s"),
        struct(col("__mu").as("z"), lit(1.0).as("r2"), lit(0).as("j")),
        (st, e) => {
          val live = st.getField("j") < t
          struct(
            when(live,
              lam * e.getField("__y") + oneMinus * st.getField("z"))
              .otherwise(st.getField("z")).as("z"),
            when(live, st.getField("r2") * rr)
              .otherwise(st.getField("r2")).as("r2"),
            (st.getField("j") + 1).as("j"))
        },
        st => struct(st.getField("z").as("z"), st.getField("r2").as("r2"))))
    series
      .withColumn("__zs", zs)
      .select(g ++ Seq(col("__mu"), col("__sigma"),
        posexplode(zip_with(col("__s"), col("__zs"),
          (s, z) => struct(s.getField("__d").as("__d"),
            s.getField("__y").as("__y"), z.getField("z").as("__z"),
            z.getField("r2").as("__r2")))).as(Seq("__i", "__e"))): _*)
      .withColumn("__hw",
        lit(limitL) * col("__sigma") *
          sqrt(cFac * (lit(1.0) - col("__e.__r2"))))
      .select(g ++ Seq(
        col("__e.__d").as("tempo"),
        col("__e.__y").as("valor"),
        col("__e.__z").as("ewma"),
        (col("__mu") - col("__hw")).as("lim_inferior"),
        (col("__mu") + col("__hw")).as("lim_superior"),
        coalesce(abs(col("__e.__z") - col("__mu")) > col("__hw"),
          lit(false)).as("alarme")): _*)
  }

  private def valueColNotNull(c: String): Column = col(c).isNotNull
}
