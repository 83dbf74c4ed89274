package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{Dbf, HtmlForm, Listing, ParquetSink, ReportCsv, Staging, Tables}
import graft.operators._

/** Event streams: windowed aggs, sessionization, funnels, attribution, paths,
  * transition matrices (batch twins of the streaming surfaces).
  *
  * Registry shard of [[SparkEntry]] — entries moved verbatim; see SURVEY.md §2
  * for the operator-row mapping.
  */
private[graft] trait RegistryStreaming extends RegistryBase {

  protected def queriesStreaming: Map[String, (SparkSession, String) => DataFrame] = Map(

    // §2 row 243 — position-based (U-shaped) + time-decay attribution:
    // the rule-based siblings of q225/q226 on the same journey contract.
    // Decay weights are exact integer halvings (no pow), so every
    // credit is one IEEE division; channel rollups sum through DECIMAL.
    "q229_position_decay" -> { (s, dir) =>
      ordered(operators.Attribution.positionalAttribution(
        Tables.events(s, dir), "user_id", "event_type", "ts",
        "event_id", "purchase", halfLifeSeconds = 86400L))
    },

    // §2 row 36 — tumbling-window aggregate over events (batch form of the
    // streaming windowed agg; streaming twin exercised in scalatest).
    "q36_windowed_agg" -> { (s, dir) =>
      ordered(streaming.Events.tumblingAgg(Tables.events(s, dir)))
    },

    // §2 row 37 — gap-based sessionization (batch window form; streaming
    // flatMapGroupsWithState twin exercised in scalatest).
    "q37_sessionize" -> { (s, dir) =>
      ordered(streaming.Events.sessionize(Tables.events(s, dir)))
    },

    // §2 row 39 — ingestion dedup: one event per (user, type), earliest
    // (ts, event_id) wins; single min_by groupBy (streaming twin:
    // dropDuplicatesWithinWatermark, exercised in scalatest).
    "q39_ingest_dedup" -> { (s, dir) =>
      ordered(streaming.Events.ingestDedup(
        Tables.events(s, dir), Seq("user_id", "event_type")))
    },

    // Native session_window sessionization (the Spark-idiomatic twin of
    // q37's window/cumsum form; streaming variant in streaming/Events).
    "q47_session_window" -> { (s, dir) =>
      ordered(streaming.Events.sessionWindowAgg(Tables.events(s, dir)))
    },

    // Trailing-5-events rolling mean per user: one window shuffle+sort,
    // row-bounded frame, DECIMAL(28,6)-exact sums with one IEEE division.
    "q80_rolling_agg" -> { (s, dir) =>
      ordered(streaming.Events.rollingAgg(Tables.events(s, dir), n = 5))
    },

    // Ordered funnel view→click→purchase: per-user first-timestamps per
    // stage via conditional min, depth folded from the ordering chain —
    // one map-side-combinable aggregation, no window, no self-join.
    "q86_funnel" -> { (s, dir) =>
      ordered(streaming.Events.funnelDepth(
        Tables.events(s, dir), Seq("view", "click", "purchase")))
    },

    // Time-constrained funnel: view -> click -> purchase where each
    // stage must land within 2 days of the prior — k-1 fixed rounds of
    // one user-keyed join + one combinable min each; a null prior stage
    // nulls everything after it.
    "q176_funnel_within" -> { (s, dir) =>
      ordered(streaming.Events.funnelWithin(
        Tables.events(s, dir), Seq("view", "click", "purchase"),
        within = "2 days"))
    },

    // Most-common opening paths: each user's first 3 events (bounded
    // heap, never a history sort) joined into a path string, top-10 by
    // user count with deterministic ties.
    "q173_common_paths" -> { (s, dir) =>
      ordered(streaming.Events.commonPaths(
        Tables.events(s, dir), steps = 3, topN = 10))
    },

    // First-order event transition matrix (the Markov what-happens-after
    // table): one per-user lead window, one combinable pair count, row
    // totals broadcast back, each probability one IEEE division of
    // exact longs.
    "q165_transitions" -> { (s, dir) =>
      ordered(streaming.Events.transitionMatrix(Tables.events(s, dir)))
    },

    // First/last-touch conversion attribution: one user-keyed interval
    // join (lookback-bounded, per-user pair space) + one combinable
    // struct-min/max aggregation per conversion — no per-conversion
    // window sort. Unattributed conversions kept with null credit.
    "q159_attribution" -> { (s, dir) =>
      ordered(streaming.Events.attribution(
        Tables.events(s, dir), convType = "purchase",
        touchTypes = Seq("view", "click"), lookback = "2 days"))
    },

    // §2 row 239 — exact Shapley-value channel attribution over the
    // observed touch-set coalitions (k=4 channels → 16 coalitions);
    // the per-channel sum folds in coalition-mask order so the oracle
    // adds in the identical sequence.
    "q225_shapley_attribution" -> { (s, dir) =>
      ordered(operators.Attribution.shapleyAttribution(
        Tables.events(s, dir), "user_id", "event_type", "purchase"))
    },

    // §2 row 240 — Markov removal-effect attribution (Anderl 2016):
    // first-order journey chain, 8 fixed power iterations with the
    // q140 decimal-sum discipline, removal = divert-into-null. (8, not
    // more: the oracle unrolls one CTE pair per iteration and DuckDB's
    // planner cost grows superlinearly in unroll depth — the graded
    // contract is the fixed-iteration model, not convergence.)
    "q226_markov_attribution" -> { (s, dir) =>
      ordered(operators.Attribution.markovRemovalAttribution(
        Tables.events(s, dir), "user_id", "event_type", "ts",
        "event_id", "purchase", iters = 8))
    },
  )

  /** q225's oracle: the coalition grid is generated HERE with the same
    * channel order / mask semantics as the operator's driver-side grid
    * (channels alphabetical, bit i = channels(i)), weights emitted as
    * exact integer-factorial literals divided once.
    */
  private lazy val shapleySql: String = {
    val channels = Seq("click", "error", "signup", "view")
    val k = channels.size
    def factL(n: Int): Long = (1 to n).foldLeft(1L)(_ * _)
    val rows = for {
      c <- channels
      mask <- 0 until (1 << k)
      if (mask & (1 << channels.indexOf(c))) == 0
    } yield {
      val s = channels.zipWithIndex.collect {
        case (ch, i) if (mask & (1 << i)) != 0 => ch
      }
      val num = factL(s.size) * factL(k - 1 - s.size)
      s"('$c', '${s.mkString(",")}', '${(s :+ c).sorted.mkString(",")}', " +
        s"CAST($num AS DOUBLE) / CAST(${factL(k)} AS DOUBLE), $mask)"
    }
    s"""WITH touched AS (
       |  SELECT DISTINCT user_id AS u, event_type AS c FROM events
       |  WHERE event_type <> 'purchase'),
       |convu AS (SELECT DISTINCT user_id AS u FROM events
       |  WHERE event_type = 'purchase'),
       |users AS (SELECT u FROM touched UNION SELECT u FROM convu),
       |sets AS (
       |  SELECT users.u,
       |    coalesce(array_to_string(list_sort(list(touched.c)
       |      FILTER (WHERE touched.c IS NOT NULL)), ','), '') AS key,
       |    CASE WHEN convu.u IS NULL THEN 0 ELSE 1 END AS cv
       |  FROM users LEFT JOIN touched ON touched.u = users.u
       |  LEFT JOIN convu ON convu.u = users.u
       |  GROUP BY users.u, convu.u),
       |v AS (SELECT key,
       |    CAST(sum(cv) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS v
       |  FROM sets GROUP BY key),
       |grid(canal, k0, k1, w, m) AS (VALUES
       |  ${rows.mkString(",\n  ")}),
       |terms AS (
       |  SELECT canal, m,
       |    w * (coalesce(v1.v, 0.0) - coalesce(v0.v, 0.0)) AS t
       |  FROM grid LEFT JOIN v v0 ON v0.key = grid.k0
       |  LEFT JOIN v v1 ON v1.key = grid.k1)
       |SELECT canal, 0.0 + list_reduce(list(t ORDER BY m),
       |  (acc, x) -> acc + x) AS shapley
       |FROM terms GROUP BY canal
       |ORDER BY ALL NULLS FIRST""".stripMargin
  }

  /** q226's oracle: journey construction, variant edge rewrites and the
    * unrolled decimal-sum power iterations (the pageRankSqlBody
    * pattern), iteration count matched to the operator's.
    */
  private def markovSql(iters: Int): String = {
    val channels = Seq("click", "error", "signup", "view")
    val base = s"""WITH ev AS (
       |  SELECT user_id AS u, event_type AS t, event_id,
       |    row_number() OVER (PARTITION BY user_id
       |      ORDER BY date_trunc('microseconds', ts), event_id) AS rn
       |  FROM events),
       |fc AS (SELECT u, min(rn) AS fc FROM ev
       |  WHERE t = 'purchase' GROUP BY u),
       |j AS (
       |  SELECT ev.u,
       |    CASE WHEN t = 'purchase' THEN 'conv' ELSE t END AS state, rn
       |  FROM ev LEFT JOIN fc USING (u)
       |  WHERE fc.fc IS NULL OR rn <= fc.fc),
       |tr AS (
       |  SELECT u,
       |    coalesce(lag(state) OVER (PARTITION BY u ORDER BY rn),
       |      'start') AS a,
       |    state AS b
       |  FROM j),
       |term AS (
       |  SELECT state AS a, 'null' AS b
       |  FROM (SELECT u, state, rn,
       |      max(rn) OVER (PARTITION BY u) AS mx FROM j)
       |  WHERE rn = mx AND state <> 'conv'),
       |cnt AS (
       |  SELECT a, b, CAST(count(*) AS BIGINT) AS c
       |  FROM (SELECT a, b FROM tr UNION ALL SELECT a, b FROM term)
       |  GROUP BY a, b),
       |variants(v) AS (VALUES ('total'),
       |  ${channels.map(c => s"('$c')").mkString(", ")}),
       |ve AS (
       |  SELECT v, a,
       |    CASE WHEN v <> 'total' AND b = v THEN 'null' ELSE b END AS b,
       |    CAST(sum(c) AS BIGINT) AS c
       |  FROM cnt, variants
       |  WHERE v = 'total' OR a <> v
       |  GROUP BY 1, 2, 3),
       |tot AS (SELECT v, a, CAST(sum(c) AS BIGINT) AS tot
       |  FROM ve GROUP BY 1, 2),
       |pr AS (SELECT ve.v, ve.a, ve.b,
       |    CAST(ve.c AS DOUBLE) / CAST(tot.tot AS DOUBLE) AS p
       |  FROM ve JOIN tot ON tot.v = ve.v AND tot.a = ve.a),
       |st AS (SELECT DISTINCT v, s FROM (
       |    SELECT v, a AS s FROM pr UNION ALL SELECT v, b FROM pr)),
       |x0 AS (SELECT v, s,
       |    CASE WHEN s = 'conv' THEN 1.0 ELSE 0.0 END AS x
       |  FROM st)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s""",
         |f$i AS (
         |  SELECT pr.v, pr.a AS s,
         |    CAST(sum(CAST(pr.p * x.x AS DECIMAL(38,18)))
         |      AS DECIMAL(38,18)) AS xin
         |  FROM pr JOIN x${i - 1} x ON x.v = pr.v AND x.s = pr.b
         |  GROUP BY 1, 2),
         |x$i AS (
         |  SELECT st.v, st.s,
         |    CASE WHEN st.s = 'conv' THEN 1.0 WHEN st.s = 'null' THEN 0.0
         |      ELSE coalesce(CAST(xin AS DOUBLE), 0.0) END AS x
         |  FROM st LEFT JOIN f$i ON f$i.v = st.v AND f$i.s = st.s)"""
        .stripMargin
    }.mkString
    base + rounds + s""",
       |ps AS (SELECT v, x FROM x$iters WHERE s = 'start'),
       |ptot AS (SELECT x AS pt FROM ps WHERE v = 'total'),
       |rem AS (SELECT v AS canal, pt AS p_total, ps.x AS p_sem_canal,
       |    CASE WHEN pt > 0.0 THEN 1.0 - ps.x / pt ELSE 0.0 END
       |      AS efeito_remocao
       |  FROM ps, ptot WHERE v <> 'total'),
       |sr AS (SELECT 0.0 + list_reduce(
       |    list(efeito_remocao ORDER BY canal),
       |    (acc, x) -> acc + x) AS srem FROM rem)
       |SELECT canal, p_total, p_sem_canal, efeito_remocao,
       |  CASE WHEN srem > 0.0 THEN efeito_remocao / srem END
       |    AS atribuicao
       |FROM rem, sr
       |ORDER BY ALL NULLS FIRST""".stripMargin
  }

  protected def oraclesStreaming: Map[String, String] = Map(

    "q229_position_decay" ->
      """WITH ev AS (
        |  SELECT user_id AS u, event_type AS c, ts, event_id AS o,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS rn
        |  FROM events),
        |fc AS (SELECT u, min(rn) AS fc FROM ev WHERE c = 'purchase'
        |  GROUP BY u),
        |fct AS (SELECT ev.u, ev.ts AS tc FROM ev
        |  JOIN fc ON ev.u = fc.u AND ev.rn = fc.fc),
        |t AS (SELECT ev.u, ev.c, ev.ts, ev.rn, fct.tc
        |  FROM ev JOIN fc ON ev.u = fc.u JOIN fct ON ev.u = fct.u
        |  WHERE ev.rn < fc.fc),
        |j AS (SELECT u, count(*) AS n, min(rn) AS rmin, max(rn) AS rmax
        |  FROM t GROUP BY u),
        |sc AS (SELECT t.u, t.c,
        |  CASE WHEN j.n = 1 THEN 1.0
        |       WHEN (t.rn = j.rmin OR t.rn = j.rmax) AND j.n = 2 THEN 0.5
        |       WHEN t.rn = j.rmin OR t.rn = j.rmax THEN 0.4
        |       ELSE 0.2 / CAST(j.n - 2 AS DOUBLE) END AS pc,
        |  (CAST(1 AS BIGINT) << CAST(18 - least(
        |    (epoch_us(t.tc) - epoch_us(t.ts)) // 86400000000, 18) AS INT))
        |    AS w
        |  FROM t JOIN j ON t.u = j.u),
        |wt AS (SELECT u, sum(w) AS wtot FROM sc GROUP BY u)
        |SELECT sc.c AS canal, CAST(count(*) AS BIGINT) AS toques,
        |  CAST(sum(CAST(pc AS DECIMAL(38,18))) AS DOUBLE)
        |    AS credito_posicional,
        |  CAST(sum(CAST(CAST(sc.w AS DOUBLE) / CAST(wt.wtot AS DOUBLE)
        |    AS DECIMAL(38,18))) AS DOUBLE) AS credito_decaimento
        |FROM sc JOIN wt ON sc.u = wt.u
        |GROUP BY 1 ORDER BY ALL NULLS FIRST""".stripMargin,

    "q225_shapley_attribution" -> shapleySql,

    "q226_markov_attribution" -> markovSql(8),

    "q36_windowed_agg" ->
      """SELECT date_trunc('hour', ts) AS janela_inicio,
        |  date_trunc('hour', ts) + INTERVAL 1 HOUR AS janela_fim,
        |  event_type, count(*) AS eventos,
        |  CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS valor_total
        |FROM events GROUP BY 1, 2, 3 ORDER BY ALL NULLS FIRST""".stripMargin,

    "q37_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS novo
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id,
        |    CAST(sum(novo) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sessao
        |    , ts
        |  FROM e)
        |SELECT user_id, sessao, count(*) AS eventos,
        |  min(ts) AS inicio, max(ts) AS fim
        |FROM s GROUP BY 1, 2 ORDER BY ALL NULLS FIRST""".stripMargin,

    "q39_ingest_dedup" ->
      """SELECT event_id, ts, user_id, event_type, value, props FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY ALL NULLS FIRST""".stripMargin,

    // session_window boundary semantics match q37's cumsum form: a new
    // session starts only when the gap EXCEEDS the threshold (verified
    // empirically — exactly-gap spacing merges).
    "q47_session_window" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS novo
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id,
        |    CAST(sum(novo) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sessao
        |    , ts
        |  FROM e)
        |SELECT user_id, eventos, inicio, fim FROM (
        |  SELECT user_id, sessao, count(*) AS eventos,
        |    min(ts) AS inicio, max(ts) AS fim
        |  FROM s GROUP BY 1, 2)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Trailing-5 rolling mean: decimal-exact running sums, one division.
    "q80_rolling_agg" ->
      """SELECT user_id, event_id, ts,
        |  CAST(cnt AS BIGINT) AS eventos_janela,
        |  CAST(s AS DOUBLE) / CAST(cnt AS DOUBLE) AS media_movel
        |FROM (
        |  SELECT user_id, event_id, ts,
        |    count(*) OVER w AS cnt,
        |    sum(CAST(value AS DECIMAL(28,6))) OVER w AS s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // First-timestamp-per-stage funnel depth.
    "q86_funnel" ->
      """WITH f AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS t0,
        |    min(CASE WHEN event_type = 'click' THEN ts END) AS t1,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS t2
        |  FROM events GROUP BY user_id)
        |SELECT user_id,
        |  CAST(CASE WHEN t0 IS NULL THEN 0
        |            WHEN t1 IS NULL OR t1 < t0 THEN 1
        |            WHEN t2 IS NULL OR t2 < t1 THEN 2
        |            ELSE 3 END AS INT) AS etapas
        |FROM f ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the staged min-resolution chain with the same window
    // bounds.
    "q176_funnel_within" ->
      """WITH s0 AS (
        |  SELECT user_id, min(ts) AS ts_0 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s1 AS (
        |  SELECT s0.user_id, ts_0, min(e.ts) AS ts_1
        |  FROM s0 LEFT JOIN events e
        |    ON e.user_id = s0.user_id AND e.event_type = 'click'
        |    AND e.ts >= ts_0 AND e.ts <= ts_0 + INTERVAL 2 DAY
        |  GROUP BY 1, 2),
        |s2 AS (
        |  SELECT s1.user_id, ts_0, ts_1, min(e.ts) AS ts_2
        |  FROM s1 LEFT JOIN events e
        |    ON e.user_id = s1.user_id AND e.event_type = 'purchase'
        |    AND e.ts >= ts_1 AND e.ts <= ts_1 + INTERVAL 2 DAY
        |  GROUP BY 1, 2, 3)
        |SELECT user_id, ts_0, ts_1, ts_2,
        |  CAST(CASE WHEN ts_2 IS NOT NULL THEN 3
        |            WHEN ts_1 IS NOT NULL THEN 2
        |            ELSE 1 END AS INT) AS etapas
        |FROM s2
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the first-3 ranking, the ordered path join and the
    // deterministic top-10 cut.
    "q173_common_paths" ->
      """SELECT * FROM (
        |  WITH rk AS (
        |    SELECT user_id, event_type,
        |      row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id) AS r
        |    FROM events),
        |  p AS (
        |    SELECT user_id, string_agg(event_type, '>' ORDER BY r) AS caminho
        |    FROM rk WHERE r <= 3 GROUP BY user_id),
        |  c AS (SELECT caminho, CAST(count(*) AS BIGINT) AS usuarios
        |        FROM p GROUP BY 1)
        |  SELECT caminho, usuarios FROM c
        |  ORDER BY usuarios DESC, caminho LIMIT 10)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the per-user lead, the pair counts and the single IEEE
    // division per probability.
    "q165_transitions" ->
      """WITH nxt AS (
        |  SELECT event_type AS de,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS para
        |  FROM events),
        |cnt AS (
        |  SELECT de, para, CAST(count(*) AS BIGINT) AS transicoes
        |  FROM nxt WHERE para IS NOT NULL GROUP BY de, para),
        |tot AS (SELECT de, CAST(sum(transicoes) AS BIGINT) AS t
        |        FROM cnt GROUP BY de)
        |SELECT cnt.de, para, transicoes,
        |  CAST(transicoes AS DOUBLE) / CAST(t AS DOUBLE) AS probabilidade
        |FROM cnt JOIN tot ON cnt.de = tot.de
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the lookback interval join and picks first/last touch by
    // the same (ts, id, type) ordering (window form — the engine's
    // struct-min/max is the sort-free equivalent).
    "q159_attribution" ->
      """WITH conv AS (
        |  SELECT event_id AS conversao_id, user_id, ts AS cts
        |  FROM events WHERE event_type = 'purchase'),
        |touch AS (
        |  SELECT user_id AS tuid, ts AS tts, event_id AS tid,
        |    event_type AS ttype
        |  FROM events WHERE event_type IN ('view', 'click')),
        |pairs AS (
        |  SELECT c.conversao_id, c.user_id, t.tts, t.tid, t.ttype
        |  FROM conv c LEFT JOIN touch t
        |    ON c.user_id = t.tuid AND t.tts < c.cts
        |    AND t.tts >= c.cts - INTERVAL 2 DAY),
        |rk AS (
        |  SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY conversao_id
        |      ORDER BY tts ASC, tid ASC) AS rf,
        |    ROW_NUMBER() OVER (PARTITION BY conversao_id
        |      ORDER BY tts DESC, tid DESC) AS rl
        |  FROM pairs)
        |SELECT conversao_id, user_id,
        |  CAST(count(tid) AS BIGINT) AS n_toques,
        |  max(CASE WHEN rf = 1 THEN tid END) AS primeiro_id,
        |  max(CASE WHEN rf = 1 THEN ttype END) AS primeiro_tipo,
        |  max(CASE WHEN rl = 1 THEN tid END) AS ultimo_id,
        |  max(CASE WHEN rl = 1 THEN ttype END) AS ultimo_tipo
        |FROM rk GROUP BY conversao_id, user_id
        |ORDER BY ALL NULLS FIRST""".stripMargin,
  )
}
