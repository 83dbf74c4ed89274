package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{Dbf, HtmlForm, Listing, ParquetSink, ReportCsv, Staging, Tables}
import graft.operators._

/** Time series: gap-fill, cohorts, rolling actives, decay, survival,
  * autocorrelation, CUSUM, seasonal decomposition, robust trend.
  *
  * Registry shard of [[SparkEntry]] — entries moved verbatim; see SURVEY.md §2
  * for the operator-row mapping.
  */
private[graft] trait RegistryTimeseries extends RegistryBase {

  protected def queriesTimeseries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // §2 row 244 — EWMA control chart (Roberts 1959): day-bucketed
    // per-type value series, z-recursion + discount power as ONE
    // aggregate fold (no pow() — its rounding is not IEEE-mandated),
    // population-σ limits from exact decimal sums. The oracle replays
    // the identical IEEE sequence as a recursive CTE.
    "q230_ewma_chart" -> { (s, dir) =>
      ordered(operators.Smoothing.ewmaChart(
        Tables.events(s, dir), Seq("event_type"), to_date(col("ts")),
        "value", lambda = 0.25, limitL = 3.0))
    },

    // Calendar gap-fill + forward-fill: per-customer monthly order
    // totals with every month of each customer's span PRESENT (absent
    // months get null value + presence flag + the carried last value) —
    // the panel normalization the reference's per-competencia tables
    // assume upstream. Per-group calendars explode from per-group
    // bounds (rows = group spans, never groups × global calendar); the
    // carry is one running ignore-nulls window per group. Oracle
    // replays the calendar, the join and the carry exactly.
    "q144_gap_fill" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
        .select(col("o_custkey"),
          to_date(date_trunc("MONTH", col("o_orderdate"))).as("mes"),
          col("o_totalprice"))
        .groupBy("o_custkey", "mes")
        .agg(sum(col("o_totalprice").cast("decimal(38,6)")).cast("double")
          .as("valor"))
      ordered(operators.Timeseries.gapFillMonthly(
        o, Seq("o_custkey"), "mes", "valor"))
    },

    // Cohort retention matrix: customers grouped by first-order month,
    // activity counted per (cohort, month offset) — the longitudinal
    // panel question (of month-X entrants, how many are active at
    // X+k?). One min-aggregation, one entity-keyed join, one exact
    // distinct count per cell; the month offset is exactly integral on
    // truncated dates. Oracle replays all three steps.
    "q145_cohort_retention" -> { (s, dir) =>
      val a = Tables.orders(s, dir)
        .select(col("o_custkey"),
          to_date(date_trunc("MONTH", col("o_orderdate"))).as("mes"))
      ordered(operators.Timeseries.cohortRetention(a, "o_custkey", "mes"))
    },

    // Lag-1..7 autocorrelation of the daily event-value series: the
    // corpus collapses to one row per day FIRST (combinable sum), so
    // the windows/self-join walk 30 buckets; sufficient statistics are
    // exact DECIMAL, the edge is a fixed double parenthesization + one
    // division per lag.
    "q189_autocorrelation" -> { (s, dir) =>
      val daily = Tables.events(s, dir)
        .filter(col("value").isNotNull)
        .groupBy(to_date(col("ts")).as("dia"))
        .agg(sum(col("value").cast("decimal(18,2)")).as("total"))
      ordered(operators.Timeseries.autocorrelation(
        daily, "dia", "total", maxLag = 7, scale = 2))
    },

    // CUSUM changepoint scan over the same daily series: the recursive
    // max(0, .) statistic via its closed running-extremum form, n-scaled
    // exact decimals end to end, the alarm an exact decimal gate and
    // each reported statistic one IEEE division.
    "q190_cusum" -> { (s, dir) =>
      val daily = Tables.events(s, dir)
        .filter(col("value").isNotNull)
        .groupBy(to_date(col("ts")).as("dia"))
        .agg(sum(col("value").cast("decimal(18,2)")).as("total"))
      ordered(operators.Timeseries.cusumChangepoints(
        daily, "dia", "total", slack = "500", threshold = "2000",
        scale = 2))
    },

    // Classical additive decomposition of the daily event-value series
    // (weekly period): centered 7-point trend with honest null edges,
    // per-position seasonal means routed through DECIMAL(38,18),
    // value = trend + seasonal + residual on every interior day.
    "q197_seasonal_decomp" -> { (s, dir) =>
      val daily = Tables.events(s, dir)
        .filter(col("value").isNotNull)
        .groupBy(to_date(col("ts")).as("dia"))
        .agg(sum(col("value").cast("decimal(18,2)")).as("total"))
      ordered(operators.Timeseries.classicalDecomposition(
        daily, "dia", "total", period = 7, scale = 2))
    },

    // Mann-Kendall monotone-trend test per event type over the daily
    // value series: S and the tie-corrected 18*Var in pure BIGINT over
    // the calendar-bounded collapsed series, one sqrt/division edge,
    // three-way trend call at z = +/-1.96.
    "q204_mann_kendall" -> { (s, dir) =>
      val e = Tables.events(s, dir).select(
        col("event_type").as("grupo"), to_date(col("ts")).as("dia"),
        col("value"))
      ordered(operators.Timeseries.mannKendall(
        e, Seq("grupo"), "dia", "value"))
    },

    // Theil-Sen robust trend per event type over the daily value
    // series (the quantifier next to q204's detector): exact medians of
    // pairwise slopes and point residuals via value-collapse +
    // conditional middle-rank lookups, calendar-bounded pair space.
    "q214_theil_sen" -> { (s, dir) =>
      val e = Tables.events(s, dir).select(
        col("event_type").as("grupo"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .as("dia_num"),
        col("value"))
      ordered(operators.Timeseries.theilSen(
        e, Seq("grupo"), "dia_num", "value"))
    },

    // Kaplan–Meier time-to-conversion: signup→first-purchase durations
    // per user, right-censored at the corpus horizon, cohorted by
    // signup week. Survival accumulates per-factor lns in
    // DECIMAL(38,18) over the collapsed duration table.
    "q185_kaplan_meier" -> { (s, dir) =>
      val ev = Tables.events(s, dir).select("user_id", "event_type", "ts")
      val t0 = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(col("ts")).as("__t0"))
      val tp = ev.filter(col("event_type") === "purchase")
        .join(t0, Seq("user_id"))
        .filter(col("ts") >= col("__t0"))
        .groupBy("user_id").agg(min(col("ts")).as("__tp"))
      val horizon = ev.agg(max(col("ts")).as("__hz"))
      val subjects = t0.join(tp, Seq("user_id"), "left")
        .crossJoin(broadcast(horizon))
        .select(
          to_date(date_trunc("WEEK", col("__t0"))).as("coorte"),
          datediff(to_date(coalesce(col("__tp"), col("__hz"))),
            to_date(col("__t0"))).cast("long").as("dur"),
          col("__tp").isNotNull.as("converteu"))
      ordered(operators.Timeseries.kaplanMeier(
        subjects, Seq("coorte"), "dur", "converteu"))
    },

    // Recency-weighted engagement: per-user decayed activity score at a
    // reference day, halving per elapsed week — every term an exact
    // scaled-integer product (value is 2-dp fixed-point, the weight is
    // the integer 2^(18-wk)), summed in BIGINT, ONE final IEEE division
    // so the report column is a plain driver-hashable DOUBLE. One
    // combinable aggregation.
    "q164_decayed_engagement" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("dia"), col("value"))
      ordered(operators.Timeseries.decayedScoreScaled(
        ev, "user_id", "dia", "value", refDay = "2024-02-01",
        valueScale = 2))
    },

    // Exact rolling active users (DAU + trailing-7-day window): distinct
    // counts don't decompose over sliding windows, so activity dedups to
    // (user, day) first, then each deduped row fans out to the 7 window
    // ends it feeds — constant fan-out of the DEDUPED volume, two
    // combinable distinct counts, no window sort.
    "q160_active_users" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("dia"))
      ordered(operators.Timeseries.rollingActive(ev, "user_id", "dia",
        window = 7))
    },

    // §2 row 235 — Holt linear-trend smoothing per event_type over the
    // day-bucketed value series: decimal day-bucket fold, then the
    // sequential recursion as ONE aggregate HOF over the sorted series.
    // The oracle replays the identical IEEE sequence as a recursive
    // CTE — hash-compared, no tolerance.
    "q221_holt_smoothing" -> { (s, dir) =>
      ordered(operators.Smoothing.holtSmooth(
        Tables.events(s, dir), Seq("event_type"), to_date(col("ts")),
        "value", alpha = 0.5, beta = 0.3))
    },
  )

  protected def oraclesTimeseries: Map[String, String] = Map(

    "q230_ewma_chart" ->
      """WITH RECURSIVE d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS dd,
        |    CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS y
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |s AS (SELECT event_type, dd, y,
        |    row_number() OVER (PARTITION BY event_type ORDER BY dd) AS rn
        |  FROM d),
        |st AS (SELECT event_type, count(*) AS n,
        |    CAST(sum(CAST(y AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS sx,
        |    CAST(sum(CAST(y * y AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS sxx
        |  FROM s GROUP BY event_type),
        |ms AS (SELECT event_type, n,
        |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
        |    sqrt(greatest(CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE) -
        |      (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) *
        |      (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 0.0)) AS sigma
        |  FROM st),
        |r AS (
        |  SELECT event_type, 0 AS rn, mu AS z,
        |    CAST(1.0 AS DOUBLE) AS r2 FROM ms
        |  UNION ALL
        |  SELECT r.event_type, r.rn + 1, 0.25 * s.y + 0.75 * r.z,
        |    r.r2 * CAST(0.5625 AS DOUBLE)
        |  FROM r JOIN s ON s.event_type = r.event_type
        |    AND s.rn = r.rn + 1)
        |SELECT s.event_type, s.dd AS tempo, s.y AS valor, r.z AS ewma,
        |  ms.mu - 3.0 * ms.sigma * sqrt((CAST(0.25 AS DOUBLE) / CAST(1.75 AS DOUBLE)) * (CAST(1.0 AS DOUBLE) - r.r2))
        |    AS lim_inferior,
        |  ms.mu + 3.0 * ms.sigma * sqrt((CAST(0.25 AS DOUBLE) / CAST(1.75 AS DOUBLE)) * (CAST(1.0 AS DOUBLE) - r.r2))
        |    AS lim_superior,
        |  coalesce(abs(r.z - ms.mu) >
        |    3.0 * ms.sigma * sqrt((CAST(0.25 AS DOUBLE) / CAST(1.75 AS DOUBLE)) * (CAST(1.0 AS DOUBLE) - r.r2)), FALSE)
        |    AS alarme
        |FROM s JOIN r ON r.event_type = s.event_type AND r.rn = s.rn
        |JOIN ms ON ms.event_type = s.event_type
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q221_holt_smoothing" ->
      """WITH RECURSIVE d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS dd,
        |    CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS y
        |  FROM events WHERE value IS NOT NULL
        |  GROUP BY 1, 2),
        |s AS (
        |  SELECT event_type, y,
        |    row_number() OVER (PARTITION BY event_type ORDER BY dd)
        |      AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM d),
        |r AS (
        |  SELECT s1.event_type, s1.n, 1 AS rn, s1.y AS l,
        |    CASE WHEN s1.n >= 2 THEN s2.y - s1.y ELSE 0.0 END AS b
        |  FROM s s1 LEFT JOIN s s2
        |    ON s2.event_type = s1.event_type AND s2.rn = 2
        |  WHERE s1.rn = 1
        |  UNION ALL
        |  SELECT r.event_type, r.n, r.rn + 1,
        |    0.5 * s.y + 0.5 * (r.l + r.b),
        |    0.3 * ((0.5 * s.y + 0.5 * (r.l + r.b)) - r.l) + 0.7 * r.b
        |  FROM r JOIN s ON s.event_type = r.event_type
        |    AND s.rn = r.rn + 1)
        |SELECT event_type, n, l AS nivel, b AS tendencia,
        |  l + b AS previsao_1, l + 7.0 * b AS previsao_7
        |FROM r WHERE rn = n
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // each group's own month calendar, the left join back and the
    // running ignore-nulls carry replayed exactly
    "q144_gap_fill" ->
      """WITH m AS (
        |  SELECT o_custkey, CAST(date_trunc('month', o_orderdate) AS DATE) AS mes,
        |    CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6)))
        |      AS DECIMAL(38,6)) AS DOUBLE) AS valor
        |  FROM orders GROUP BY o_custkey, mes),
        |b AS (
        |  SELECT o_custkey, min(mes) AS mn, max(mes) AS mx
        |  FROM m GROUP BY o_custkey),
        |cal AS (
        |  SELECT o_custkey,
        |    CAST(unnest(generate_series(mn, mx, INTERVAL 1 MONTH)) AS DATE) AS mes
        |  FROM b)
        |SELECT cal.o_custkey, cal.mes, m.valor,
        |  m.valor IS NOT NULL AS presente,
        |  last_value(m.valor IGNORE NULLS) OVER (
        |    PARTITION BY cal.o_custkey ORDER BY cal.mes
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS valor_carregado
        |FROM cal LEFT JOIN m ON cal.o_custkey = m.o_custkey AND cal.mes = m.mes
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q145_cohort_retention" ->
      """WITH a AS (
        |  SELECT o_custkey,
        |    CAST(date_trunc('month', o_orderdate) AS DATE) AS mes
        |  FROM orders),
        |c AS (SELECT o_custkey, min(mes) AS cohorte FROM a GROUP BY o_custkey)
        |SELECT cohorte,
        |  CAST(date_diff('month', cohorte, mes) AS INT) AS offset_meses,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS entidades_ativas
        |FROM a JOIN c USING (o_custkey)
        |GROUP BY cohorte, offset_meses
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the daily collapse, the bounded lag self-join, the exact
    // decimal sufficient statistics and the fixed double edge formula.
    "q189_autocorrelation" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS dia,
        |    sum(CAST(value AS DECIMAL(18,2))) AS total
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |idx AS (SELECT row_number() OVER (ORDER BY dia) AS t,
        |    CAST(total AS DECIMAL(18,2)) AS x FROM daily),
        |tot AS (SELECT CAST(count(*) AS DOUBLE) AS nd,
        |    sum(x) AS s, sum(x * x) AS ss FROM idx),
        |par AS (SELECT CAST(b.t - a.t AS BIGINT) AS defasagem,
        |    CAST(count(*) AS BIGINT) AS n_pares,
        |    sum(a.x * b.x) AS sxy, sum(a.x) AS sa, sum(b.x) AS sb
        |  FROM idx a JOIN idx b ON b.t > a.t AND b.t <= a.t + 7
        |  GROUP BY 1)
        |SELECT defasagem, n_pares,
        |  (nd * nd * CAST(sxy AS DOUBLE) - nd * CAST(s AS DOUBLE) *
        |    (CAST(sa AS DOUBLE) + CAST(sb AS DOUBLE)) +
        |   CAST(n_pares AS DOUBLE) * CAST(s AS DOUBLE) *
        |     CAST(s AS DOUBLE)) /
        |  (nd * nd * CAST(ss AS DOUBLE) - nd * CAST(s AS DOUBLE) *
        |    CAST(s AS DOUBLE)) AS acf
        |FROM par, tot
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the n-scaled deviations, both cumulative windows, the
    // running-extremum closed form and the exact decimal alarm gate.
    "q190_cusum" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS dia,
        |    sum(CAST(value AS DECIMAL(18,2))) AS total
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |base AS (SELECT dia, CAST(total AS DECIMAL(18,2)) AS x FROM daily),
        |st AS (SELECT CAST(count(*) AS DECIMAL(10,0)) AS n, sum(x) AS s
        |  FROM base),
        |d AS (SELECT dia, x, n,
        |    n * x - s - n * CAST('500' AS DECIMAL(18,2)) AS dup,
        |    n * x - s + n * CAST('500' AS DECIMAL(18,2)) AS ddn
        |  FROM base, st),
        |c AS (SELECT dia, x, n,
        |    sum(dup) OVER (ORDER BY dia
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cup,
        |    sum(ddn) OVER (ORDER BY dia
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cdn
        |  FROM d),
        |r AS (SELECT dia, x, n, cup, cdn,
        |    least(min(cup) OVER (ORDER BY dia
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |      CAST(0 AS DECIMAL(18,2))) AS mn,
        |    greatest(max(cdn) OVER (ORDER BY dia
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |      CAST(0 AS DECIMAL(18,2))) AS mx
        |  FROM c)
        |SELECT dia, CAST(x AS DOUBLE) AS valor,
        |  CAST(cup - mn AS DOUBLE) / CAST(n AS DOUBLE) AS cusum_alta,
        |  CAST(mx - cdn AS DOUBLE) / CAST(n AS DOUBLE) AS cusum_baixa,
        |  ((cup - mn) > n * CAST('2000' AS DECIMAL(18,2)) OR
        |   (mx - cdn) > n * CAST('2000' AS DECIMAL(18,2))) AS alarme
        |FROM r
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the daily decimal collapse, the time-ordered pair signs,
    // the tie-corrected integer variance and the +/-1 continuity edge.
    "q204_mann_kendall" ->
      """WITH e AS (
        |  SELECT event_type AS grupo, CAST(ts AS DATE) AS dia, value
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        |ser AS (
        |  SELECT grupo, dia,
        |    CAST(CAST(sum(CAST(value AS DECIMAL(38,12)))
        |      AS DECIMAL(38,12)) AS DOUBLE) AS v
        |  FROM e GROUP BY 1, 2),
        |pares AS (
        |  SELECT a.grupo,
        |    CAST(sum(CAST(sign(b.v - a.v) AS BIGINT)) AS BIGINT) AS s
        |  FROM ser a JOIN ser b ON a.grupo = b.grupo AND b.dia > a.dia
        |  GROUP BY 1),
        |tv AS (SELECT grupo, v, CAST(count(*) AS BIGINT) AS tk
        |  FROM ser GROUP BY 1, 2),
        |tie AS (SELECT grupo, CAST(sum(tk) AS BIGINT) AS n,
        |    CAST(sum(tk * (tk - 1) * (2 * tk + 5)) AS BIGINT) AS tcorr
        |  FROM tv GROUP BY 1),
        |j AS (SELECT tie.grupo, n, coalesce(pares.s, 0) AS s,
        |    CAST(n * (n - 1) * (2 * n + 5) - tcorr AS BIGINT) AS var18
        |  FROM tie LEFT JOIN pares ON pares.grupo = tie.grupo),
        |zt AS (SELECT grupo, n, CAST(s AS BIGINT) AS s, var18,
        |    CASE WHEN var18 > 0 THEN
        |      CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE) /
        |          sqrt(CAST(var18 AS DOUBLE) / 18.0)
        |        WHEN s < 0 THEN CAST(s + 1 AS DOUBLE) /
        |          sqrt(CAST(var18 AS DOUBLE) / 18.0)
        |        ELSE 0.0 END END AS z
        |  FROM j)
        |SELECT grupo, n, s, var18, z,
        |  CASE WHEN var18 > 0 THEN
        |    CASE WHEN z > 1.96 THEN 'alta' WHEN z < -1.96 THEN 'baixa'
        |      ELSE 'estavel' END END AS tendencia
        |FROM zt
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the daily collapse, the pairwise slopes, both exact
    // value-collapsed medians with the floor'd middle-rank lookups and
    // the residual pass.
    "q214_theil_sen" ->
      """WITH e AS (
        |  SELECT event_type AS grupo,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS DOUBLE) AS x,
        |    value
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        |ser AS (
        |  SELECT grupo, x, CAST(CAST(sum(CAST(value AS DECIMAL(38,12)))
        |    AS DECIMAL(38,12)) AS DOUBLE) AS v
        |  FROM e GROUP BY 1, 2),
        |sl AS (
        |  SELECT a.grupo, (b.v - a.v) / (b.x - a.x) AS s
        |  FROM ser a JOIN ser b ON a.grupo = b.grupo AND b.x > a.x),
        |byv AS (SELECT grupo, s, CAST(count(*) AS BIGINT) AS c
        |  FROM sl GROUP BY 1, 2),
        |cumv AS (SELECT grupo, s, c,
        |    CAST(sum(c) OVER (PARTITION BY grupo ORDER BY s
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |    CAST(sum(c) OVER (PARTITION BY grupo) AS BIGINT) AS tot
        |  FROM byv),
        |med AS (SELECT grupo, CAST(max(tot) AS BIGINT) AS n_pares,
        |    (min(CASE WHEN cum >= CAST(floor((tot + 1) / 2.0) AS BIGINT)
        |        THEN s END) +
        |     min(CASE WHEN cum >= CAST(floor(tot / 2.0) AS BIGINT) + 1
        |        THEN s END)) / 2.0 AS inclinacao
        |  FROM cumv GROUP BY 1),
        |res AS (SELECT ser.grupo, v - inclinacao * x AS r
        |  FROM ser JOIN med USING (grupo)),
        |byr AS (SELECT grupo, r, CAST(count(*) AS BIGINT) AS c
        |  FROM res GROUP BY 1, 2),
        |cumr AS (SELECT grupo, r, c,
        |    CAST(sum(c) OVER (PARTITION BY grupo ORDER BY r
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |    CAST(sum(c) OVER (PARTITION BY grupo) AS BIGINT) AS tot
        |  FROM byr),
        |medr AS (SELECT grupo,
        |    (min(CASE WHEN cum >= CAST(floor((tot + 1) / 2.0) AS BIGINT)
        |        THEN r END) +
        |     min(CASE WHEN cum >= CAST(floor(tot / 2.0) AS BIGINT) + 1
        |        THEN r END)) / 2.0 AS intercepto
        |  FROM cumr GROUP BY 1),
        |pontos AS (SELECT grupo, CAST(count(*) AS BIGINT) AS n
        |  FROM ser GROUP BY 1)
        |SELECT pontos.grupo, n, n_pares, inclinacao, intercepto
        |FROM pontos LEFT JOIN med USING (grupo)
        |LEFT JOIN medr USING (grupo)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the daily collapse, the centered window with null edges,
    // the decimal-routed seasonal means and the fixed recomposition.
    "q197_seasonal_decomp" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS dia,
        |    sum(CAST(value AS DECIMAL(18,2))) AS total
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |b AS (SELECT dia, CAST(total AS DECIMAL(18,2)) AS x,
        |    CAST((row_number() OVER (ORDER BY dia) - 1) % 7 AS BIGINT)
        |      AS posicao,
        |    CASE WHEN count(*) OVER w7 = 7 THEN
        |      CAST(sum(CAST(total AS DECIMAL(18,2))) OVER w7 AS DOUBLE)
        |        / 7.0 END AS tendencia
        |  FROM daily
        |  WINDOW w7 AS (ORDER BY dia
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |d AS (SELECT dia, x, posicao, tendencia,
        |    CAST(x AS DOUBLE) - tendencia AS detr FROM b),
        |pp AS (SELECT posicao,
        |    CAST(sum(CAST(detr AS DECIMAL(38,18))) AS DOUBLE) /
        |      CAST(count(detr) AS DOUBLE) AS s_bruto
        |  FROM d GROUP BY 1),
        |ct AS (SELECT
        |    CAST(sum(CAST(s_bruto AS DECIMAL(38,18))) AS DOUBLE) /
        |      CAST(count(s_bruto) AS DOUBLE) AS m FROM pp)
        |SELECT dia, CAST(x AS DOUBLE) AS valor, posicao, tendencia,
        |  s_bruto - m AS sazonal, detr - (s_bruto - m) AS residuo
        |FROM d JOIN pp USING (posicao) CROSS JOIN ct
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays subjects (durations + censoring), the reverse at-risk
    // cumulative, and the decimal-accumulated survival product.
    "q185_kaplan_meier" ->
      """WITH t0 AS (SELECT user_id, min(ts) AS t0 FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |tp AS (SELECT e.user_id, min(e.ts) AS tp
        |  FROM events e JOIN t0 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts >= t0.t0 GROUP BY 1),
        |hz AS (SELECT max(ts) AS hz FROM events),
        |subj AS (SELECT CAST(date_trunc('week', t0.t0) AS DATE) AS coorte,
        |    CAST(datediff('day', CAST(t0.t0 AS DATE),
        |      CAST(COALESCE(tp.tp, hz.hz) AS DATE)) AS BIGINT) AS dur,
        |    tp.tp IS NOT NULL AS conv
        |  FROM t0 LEFT JOIN tp USING (user_id) CROSS JOIN hz),
        |coll AS (SELECT coorte, dur,
        |    sum(CASE WHEN conv THEN 1 ELSE 0 END) AS eventos,
        |    count(*) AS a
        |  FROM subj GROUP BY 1, 2),
        |r AS (SELECT coorte, dur, eventos,
        |    sum(a) OVER (PARTITION BY coorte ORDER BY dur DESC
        |      ROWS UNBOUNDED PRECEDING) AS em_risco
        |  FROM coll),
        |lterm AS (SELECT *,
        |    CASE WHEN em_risco = eventos THEN CAST(0 AS DECIMAL(38,18))
        |      ELSE CAST(ln(CAST(em_risco - eventos AS DOUBLE) /
        |        CAST(em_risco AS DOUBLE)) AS DECIMAL(38,18)) END AS l,
        |    CASE WHEN em_risco = eventos THEN 1 ELSE 0 END AS z
        |  FROM r),
        |srv AS (SELECT coorte, dur, em_risco, eventos,
        |    CASE WHEN max(z) OVER w = 1 THEN 0.0
        |      ELSE exp(CAST(sum(l) OVER w AS DOUBLE)) END AS sobrevivencia
        |  FROM lterm WINDOW w AS (PARTITION BY coorte ORDER BY dur ASC
        |    ROWS UNBOUNDED PRECEDING))
        |SELECT coorte, dur, CAST(em_risco AS BIGINT) AS em_risco,
        |  CAST(eventos AS BIGINT) AS eventos, sobrevivencia
        |FROM srv WHERE eventos > 0 ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the week binning, the exact 1/(1<<w) weights and the
    // DECIMAL term sum.
    "q164_decayed_engagement" ->
      """WITH e AS (
        |  SELECT user_id, value,
        |    greatest(CAST(floor(date_diff('day', CAST(ts AS DATE),
        |      DATE '2024-02-01') / 7.0) AS INT), 0) AS wk
        |  FROM events)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS atividade,
        |  CAST(coalesce(sum(CASE WHEN wk > 18 THEN 0
        |    ELSE CAST(round(value * 100) AS BIGINT) *
        |      (1::BIGINT << (18 - wk)) END), 0) AS DOUBLE)
        |    / 26214400.0 AS score_decaido
        |FROM e GROUP BY user_id
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the (user, day) dedup, the 7-window fan-out and both
    // distinct counts.
    "q160_active_users" ->
      """WITH ed AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |daily AS (
        |  SELECT d AS dia, CAST(count(DISTINCT user_id) AS BIGINT)
        |    AS ativos_dia
        |  FROM ed GROUP BY 1),
        |win AS (
        |  SELECT g.dia, CAST(count(DISTINCT user_id) AS BIGINT)
        |    AS ativos_janela
        |  FROM ed, LATERAL unnest(generate_series(d, d + 6,
        |    INTERVAL 1 DAY)) g(dia)
        |  GROUP BY 1)
        |SELECT daily.dia, ativos_dia, ativos_janela
        |FROM daily JOIN win ON daily.dia = win.dia
        |ORDER BY ALL NULLS FIRST""".stripMargin,
  )
}
