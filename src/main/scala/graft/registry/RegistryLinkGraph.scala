package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{Dbf, HtmlForm, Listing, ParquetSink, ReportCsv, Staging, Tables}
import graft.operators._

/** Record linkage (fuzzy/edit/Jaro-Winkler/Fellegi-Sunter, golden record) and
  * graph analytics (PageRank, k-core, triangles, BFS).
  *
  * Registry shard of [[SparkEntry]] — entries moved verbatim; see SURVEY.md §2
  * for the operator-row mapping.
  */
private[graft] trait RegistryLinkGraph extends RegistryBase {

  protected def queriesLinkGraph: Map[String, (SparkSession, String) => DataFrame] = Map(

    // PageRank over the supplier->part->customer supply graph (3 fixed
    // power iterations, damping 0.85, dangling mass redistributed) —
    // the graph-centrality signal web curation weights crawl priors by
    // (Common Crawl's per-host centrality). Per iteration: one edge join
    // + one combinable DECIMAL mass sum; state = one row per node. The
    // oracle unrolls the iterations as CTEs and replays every rank
    // bit-for-bit (the q123 discipline for iterative fitting).
    "q140_pagerank" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
      val e1 = li.select((-col("l_suppkey")).as("src"),
        col("l_partkey").as("dst"))
      val e2 = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_partkey").as("src"),
          (col("o_custkey") + 1000000000L).as("dst"))
      ordered(llm.Components.pageRank(
        e1.unionByName(e2), "src", "dst", iters = 3))
    },

    // Blocked fuzzy record linkage: planted one-char-deletion typo
    // variants of customer names matched back by exact Levenshtein ≤ 1,
    // restricted to pairs sharing the numeric suffix-4 (id-like names
    // make every other key degenerate — all 150k share "customer#000…";
    // the planted deletion, before the last 5 chars, always preserves
    // the suffix). SAME result set as the original fuzzyPairs suffix-4
    // pass (spec-pinned), but candidates come from the FastSS deletion-
    // neighborhood join STRATIFIED by the suffix instead of suffix-key
    // collision blocks: suffix-4 keys SATURATE as the corpus outgrows
    // the 10⁴ key space (measured ×9.1 wall at ×10 data, candidate
    // volume ×181 from block² growth), while deletion-variant collisions
    // track true near-dup density — the §4 entropy discipline made
    // structural. Edits INSIDE the suffix still escape — the documented
    // blocking-coverage trade; the spec demonstrates the multi-pass
    // prefix+suffix fuzzyPairs form on human-like names. Oracle replays
    // normalization, the suffix restriction and the exact edit distance.
    "q142_fuzzy_linkage" -> { (s, dir) =>
      val c = Tables.customer(s, dir).select("c_custkey", "c_name")
      val variants = c.filter(col("c_custkey") % 7 === 0)
        .select((col("c_custkey") + 10000000L).as("c_custkey"),
          concat(substring(col("c_name"), 1, 12),
            substring(col("c_name"), 14, 100000)).as("c_name"))
      val base = c.unionByName(variants)
        .select(col("c_custkey"), lower(trim(col("c_name"))).as("nome"))
      ordered(operators.Linkage.editJoinDeletes(
        base, "c_custkey", "nome", maxDist = 1,
        strata = Some(nm => substring(nm, -4, 4))))
    },

    // Per-vertex triangle counting over the supplier co-supply graph
    // (suppliers sharing a part; parts sampled %20 to bound wedge
    // volume — Σdeg² grows quadratically in supplier degree, the
    // declared skew lever): canonical a<b<c wedges from two edge
    // self-joins — each
    // triangle generated exactly once — then one combinable per-vertex
    // count. Completes the graph trio (components, PageRank,
    // triangles). Oracle replays edge building and both joins.
    "q146_triangle_count" -> { (s, dir) =>
      val ps = Tables.lineitem(s, dir).filter(col("l_partkey") % 20 === 0)
        .select(col("l_partkey").as("p"), col("l_suppkey").as("sup"))
        .distinct()
      val edges = ps.select(col("p"), col("sup").as("s1"))
        .join(ps.select(col("p"), col("sup").as("s2")), Seq("p"))
        .filter(col("s1") < col("s2"))
        .select(col("s1").as("src"), col("s2").as("dst")).distinct()
      ordered(llm.Components.triangleCount(edges, "src", "dst"))
    },

    // Golden-record construction (MDM survivorship) — the full record-
    // linkage deliverable in one engine: q142's blocking + exact
    // Levenshtein pairs → connected components → one canonical row per
    // entity (longest name survives with deterministic ties, best
    // balance wins, canonical id = cluster minimum). Oracle replays the
    // blocking and the DP, closes the clusters by recursive CTE (the
    // q52 pattern) and ranks the survivorship deterministically.
    "q151_golden_record" -> { (s, dir) =>
      val c = Tables.customer(s, dir)
        .select("c_custkey", "c_name", "c_acctbal")
      val variants = c.filter(col("c_custkey") % 7 === 0)
        .select((col("c_custkey") + 10000000L).as("c_custkey"),
          concat(substring(col("c_name"), 1, 12),
            substring(col("c_name"), 14, 100000)).as("c_name"),
          (col("c_acctbal") + lit(100.0)).as("c_acctbal"))
      val rec = c.unionByName(variants)
      val pairs = operators.Linkage.fuzzyPairs(rec, "c_custkey", "c_name",
        maxDist = 1, blockKeys = Seq(nm => substring(nm, -4, 4)))
      val labels = llm.Components.connectedComponents(pairs, "id_a", "id_b")
      val labeled = rec.join(labels,
          rec("c_custkey") === labels("doc_id"), "left")
        .select(coalesce(col("cluster_id"), col("c_custkey"))
            .as("cluster_id"),
          col("c_custkey"), col("c_name"), col("c_acctbal"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("cluster_id")
        .orderBy(length(col("c_name")).desc, col("c_name").desc,
          col("c_custkey").asc)
      ordered(labeled
        .withColumn("__r", row_number().over(w))
        .groupBy("cluster_id")
        .agg(
          count(lit(1L)).as("membros"),
          min(col("c_custkey")).as("id_canonico"),
          max(when(col("__r") === 1, col("c_name"))).as("nome_canonico"),
          max(col("c_acctbal")).as("saldo_max")))
    },

    // EXACT edit-distance self-join via FastSS deletion neighborhoods
    // (no caller-chosen blocking keys — q142's recall trade removed): a
    // pair within Levenshtein d must share a <=d-deletion variant (the
    // alignment's matched subsequence — a theorem, not a heuristic), so
    // candidates = variant collisions, then one exact DP per survivor.
    // Same planted variants as q142; the output is the COMPLETE
    // distance-1 pair set.
    "q183_edit_join" -> { (s, dir) =>
      val c = Tables.customer(s, dir).select(
        col("c_custkey"), lower(trim(col("c_name"))).as("nome"))
      val variants = c.filter(col("c_custkey") % 7 === 0)
        .select((col("c_custkey") + 10000000L).as("c_custkey"),
          concat(substring(col("nome"), 1, 12),
            substring(col("nome"), 14, 100000)).as("nome"))
      ordered(operators.Linkage.editJoinDeletes(
        c.unionByName(variants), "c_custkey", "nome", maxDist = 1))
    },

    // Multi-source BFS hop levels over the supplier-part bipartite
    // graph (suppliers negated, the q140 vertex-space trick): frontier
    // expansion, one adjacency join + one visited anti-join per round,
    // depth-capped so the recursive-CTE oracle replays the exact
    // semantics.
    "q191_bfs_levels" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val edges = li.select((-col("l_suppkey")).as("src"),
        col("l_partkey").as("dst")).distinct()
      val seeds = li.filter(col("l_partkey") % 500 === 0)
        .select(col("l_partkey").as("seed"))
      ordered(llm.Components.bfsLevels(
        edges, "src", "dst", seeds, "seed", maxDepth = 3))
    },

    // Jaro-Winkler name linkage: suffix-4-blocked candidates over
    // customer names + planted one-char mid-name substitutions (suffix
    // preserved, so blocking finds every plant), scored by the native
    // codegen expression. The oracle's jaro_winkler_similarity is
    // DuckDB's own INDEPENDENT kernel — this row cross-checks the
    // similarity arithmetic itself, not a replay of it.
    "q202_jaro_winkler" -> { (s, dir) =>
      val c = Tables.customer(s, dir).select(
        col("c_custkey").as("id"), lower(trim(col("c_name"))).as("nome"))
      val v = c.filter(col("id") % 9 === 0).select(
        (col("id") + 1000000L).as("id"),
        concat(substring(col("nome"), 1, 11), lit("x"),
          substring(col("nome"), 13, 100000)).as("nome"))
      ordered(operators.Linkage.jaroWinklerPairs(
        c.unionByName(v), "id", "nome", minSim = 0.937,
        blockKeys = Seq(nm => substring(nm, -4, 4))))
    },

    // Fellegi–Sunter probabilistic linkage: supervised m/u weights from
    // labeled pairs (planted variants = matches, distant-id pairs =
    // non-matches), then the three-way log-likelihood-ratio decision.
    // Candidates come from the NATION-STRATIFIED FastSS deletion-
    // neighborhood join (the q142 cure, r11 VERDICT #1): the complete
    // same-nation Levenshtein ≤ 2 pair set — a theorem-bounded filter
    // whose candidate volume tracks true near-name density (LINEAR in
    // the corpus: each id has a bounded digit-neighborhood), where the
    // old fixed suffix-3 key saturated block² (measured ×188 candidates
    // at ×10 data). The name agreement falls out of the join for free
    // (nome_igual = dist ≤ 1 — the planted one-deletion variants agree,
    // two-edit digit neighbors disagree); the balance-band field is
    // mangled on a third of the variants.
    "q186_fellegi_sunter" -> { (s, dir) =>
      val c = Tables.customer(s, dir).select(
        col("c_custkey").as("id"), lower(trim(col("c_name"))).as("nome"),
        col("c_nationkey").as("nacao"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("faixa"),
        col("c_mktsegment").as("seg"))
      val v = c.filter(col("id") % 7 === 0).select(
        (col("id") + 10000000L).as("id"),
        concat(substring(col("nome"), 1, 12),
          substring(col("nome"), 14, 100000)).as("nome"),
        col("nacao"),
        when(col("id") % 3 === 0, lit(-1L)).otherwise(col("faixa"))
          .as("faixa"),
        col("seg"))
      def side(df: DataFrame, sfx: String) = df.select(
        col("id").as(s"id_$sfx"), col("nome").as(s"nome_$sfx"),
        col("faixa").as(s"faixa_$sfx"), col("seg").as(s"seg_$sfx"))
      def agreed(p: DataFrame) = p.select(
        col("id_a"), col("id_b"),
        (levenshtein(col("nome_a"), col("nome_b")) <= 1).as("nome_igual"),
        (col("faixa_a") === col("faixa_b")).as("faixa_igual"),
        (col("seg_a") === col("seg_b")).as("seg_igual"))
      val matches = agreed(side(c, "a").join(side(v, "b"),
          col("id_b") === col("id_a") + 10000000L))
        .withColumn("eh_par", lit(true))
      val nonMatches = agreed(side(c, "a").join(side(c, "b"),
          col("id_b") === col("id_a") + 11111L))
        .withColumn("eh_par", lit(false))
      val all = c.unionByName(v)
      val attrs = all.select("id", "faixa", "seg")
      // attrs is the customer DIMENSION — broadcast both probes so the
      // pair stream (output-bound, ~2.6B rows at sf10 from replica
      // cross-products) is never shuffled or sorted for an equi-join;
      // without the hint AQE plans SMJ and the sf10 shuffle write
      // exhausted the rehearsal box's disk. CEILING: attrs grows
      // linearly with sf (~1.65M rows at sf10); past ~sf50 two copies
      // of it approach Spark's 8 GB broadcast hard limit / driver
      // heap, at which point this hint must be dropped (degrade to
      // SMJ) or the dimension bucketed — rehearsed scales are safe.
      val cands = operators.Linkage.editJoinDeletesOn(
          all, "id", "nome", "nacao", maxDist = 2)
        .join(broadcast(attrs.select(col("id").as("id_a"),
          col("faixa").as("faixa_a"), col("seg").as("seg_a"))), "id_a")
        .join(broadcast(attrs.select(col("id").as("id_b"),
          col("faixa").as("faixa_b"), col("seg").as("seg_b"))), "id_b")
        .select(col("id_a"), col("id_b"),
          (col("dist") <= 1L).as("nome_igual"),
          (col("faixa_a") === col("faixa_b")).as("faixa_igual"),
          (col("seg_a") === col("seg_b")).as("seg_igual"))
      ordered(operators.Linkage.fellegiSunterScore(
          cands, matches.unionByName(nonMatches),
          Seq("nome_igual", "faixa_igual", "seg_igual"), "eh_par",
          upper = 1.0, lower = -1.0)
        .select("id_a", "id_b", "nome_igual", "faixa_igual", "seg_igual",
          "pontuacao", "classificacao"))
    },

    // k-core decomposition of the supplier co-supply graph: iterative
    // peeling to the exact fixpoint (cascades included) — one degree
    // aggregation + two semi-joins per round. Not SQL-expressible
    // (non-monotone fixpoint) -> rows-only; KCore spec pins cascades
    // and K4-with-pendants by hand.
    "q161_kcore" -> { (s, dir) =>
      // parts co-purchased within an order: sparse enough (degrees
      // 42-206 at sf0.01) that k=82 peels a quarter of the graph with
      // real cascades while the core survives (the collapse threshold
      // sits at ~84 - quasi-random graphs die sharply)
      val ps = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val edges = ps.select(col("o"), col("p").as("p1"))
        .join(ps.select(col("o"), col("p").as("p2")), Seq("o"))
        .filter(col("p1") < col("p2"))
        .select(col("p1").as("src"), col("p2").as("dst")).distinct()
      ordered(llm.Components.kCore(edges, "src", "dst", k = 82))
    },

    // §2 row 241 — TF-IDF token-set cosine name matching (Cohen/
    // Ravikumar/Fienberg 2003's TFIDF baseline): the linkage axis edit
    // distance cannot see — token-PERMUTED variants ("small ring" →
    // "ring small") score cosine 1.0 where Levenshtein reads ~10 edits.
    // Log-free idf (N/df, one exact division), DECIMAL-folded norms.
    "q227_tfidf_name_match" -> { (s, dir) =>
      val p = Tables.part(s, dir).filter(col("p_partkey") % 3 === 0)
        .select(col("p_partkey").as("id"),
          lower(trim(col("p_name"))).as("nome"))
      val variants = p.filter(col("id") % 5 === 0).select(
        (col("id") + 1000000L).as("id"),
        concat_ws(" ", reverse(llm.TextAnalysis.tokens(col("nome"))))
          .as("nome"))
      ordered(operators.TfIdfLink.tfidfNamePairs(
        p.unionByName(variants), "id", "nome", threshold = 0.8))
    },

    // §2 row 232 — sorted-neighborhood blocking (Hernández-Stolfo
    // merge/purge): global (c_name, id) rank via the distributed
    // range-exchange rank engine (no single-task window), (w-1)-band
    // pairing, exact banded-Levenshtein verify — the linear-candidate
    // member of the blocking family next to rows 159/199.
    "q218_snm_blocking" -> { (s, dir) =>
      ordered(operators.Neighborhood.sortedNeighborhoodLink(
          Tables.customer(s, dir), "c_custkey", "c_name",
          window = 8, maxDist = 2)
        .withColumn("edit_dist", col("edit_dist").cast("long")))
    },
  )

  protected def oraclesLinkGraph: Map[String, String] = Map(

    // Replays tokenize → df → log-free idf → decimal norms → shared-
    // token pairs → decimal shared-weight sum → one cosine division.
    "q227_tfidf_name_match" ->
      """WITH base AS (
        |  SELECT p_partkey AS id, lower(trim(p_name)) AS nome FROM part
        |  WHERE p_partkey % 3 = 0
        |  UNION ALL
        |  SELECT p_partkey + 1000000,
        |    array_to_string(list_reverse(
        |      string_split_regex(trim(lower(trim(p_name))), '\s+')), ' ')
        |  FROM part WHERE p_partkey % 3 = 0 AND p_partkey % 5 = 0),
        |tok AS (
        |  SELECT DISTINCT id, t FROM (
        |    SELECT id, unnest(string_split_regex(trim(lower(nome)),
        |      '\s+')) AS t
        |    FROM base)
        |  WHERE t <> ''),
        |nn AS (SELECT CAST(count(DISTINCT id) AS BIGINT) AS n FROM tok),
        |w AS (
        |  SELECT t, CAST(count(*) AS BIGINT) AS df,
        |    CAST(n AS DOUBLE) / CAST(count(*) AS DOUBLE) AS w
        |  FROM tok, nn GROUP BY t, n
        |  HAVING count(*) <= n * 0.5),
        |nrm AS (
        |  SELECT id, sqrt(CAST(sum(CAST(w.w * w.w AS DECIMAL(38,12)))
        |    AS DOUBLE)) AS nrm
        |  FROM tok JOIN w USING (t) GROUP BY id),
        |p AS (
        |  SELECT a.id AS id_a, b.id AS id_b, w.w
        |  FROM tok a JOIN tok b ON a.t = b.t AND a.id < b.id
        |  JOIN w ON w.t = a.t),
        |sc AS (
        |  SELECT id_a, id_b, CAST(count(*) AS BIGINT) AS tokens_comuns,
        |    CAST(sum(CAST(w * w AS DECIMAL(38,12))) AS DOUBLE) AS s
        |  FROM p GROUP BY 1, 2)
        |SELECT id_a, id_b, tokens_comuns,
        |  s / (na.nrm * nb.nrm) AS cosseno
        |FROM sc JOIN nrm na ON na.id = sc.id_a
        |JOIN nrm nb ON nb.id = sc.id_b
        |WHERE s / (na.nrm * nb.nrm) >= 0.8
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the global rank as the naive window row_number (the
    // engine's range-exchange rank is spec-pinned equal), the
    // rank-window pair space, and the edit gate.
    "q218_snm_blocking" ->
      """WITH r AS (
        |  SELECT c_custkey AS id, c_name AS k,
        |    row_number() OVER (ORDER BY c_name, c_custkey) AS rk
        |  FROM customer WHERE c_name IS NOT NULL),
        |p AS (
        |  SELECT a.id AS id_a, b.id AS id_b, a.k AS key_a, b.k AS key_b,
        |    b.rk - a.rk AS dist
        |  FROM r a JOIN r b ON b.rk > a.rk AND b.rk - a.rk <= 7)
        |SELECT id_a, id_b, key_a, key_b, dist,
        |  CAST(levenshtein(key_a, key_b) AS BIGINT) AS edit_dist
        |FROM p WHERE levenshtein(key_a, key_b) <= 2
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q140_pagerank" -> pageRankOracle(iters = 3),

    // normalization, the two blocking passes and the exact edit
    // distance replayed; Spark's substring(-n) = DuckDB len(nm)-n+1
    "q142_fuzzy_linkage" ->
      """WITH base AS (
        |  SELECT c_custkey AS id, lower(trim(c_name)) AS nm FROM customer
        |  UNION ALL
        |  SELECT c_custkey + 10000000,
        |    lower(trim(substring(c_name, 1, 12) || substring(c_name, 14)))
        |  FROM customer WHERE c_custkey % 7 = 0),
        |keys AS (
        |  SELECT id, nm, 0 AS pass, substring(nm, len(nm) - 3, 4) AS key
        |  FROM base),
        |cand AS (
        |  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
        |    a.nm AS nm_a, b.nm AS nm_b
        |  FROM keys a JOIN keys b
        |    ON a.pass = b.pass AND a.key = b.key AND a.id < b.id
        |  WHERE a.key IS NOT NULL AND a.key <> '')
        |SELECT id_a, id_b, CAST(levenshtein(nm_a, nm_b) AS BIGINT) AS dist
        |FROM cand
        |WHERE levenshtein(nm_a, nm_b) <= 1
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q146_triangle_count" ->
      """WITH ps AS (
        |  SELECT DISTINCT l_partkey AS p, l_suppkey AS sup
        |  FROM lineitem WHERE l_partkey % 20 = 0),
        |e AS (
        |  SELECT DISTINCT a.sup AS a, b.sup AS b
        |  FROM ps a JOIN ps b ON a.p = b.p AND a.sup < b.sup),
        |wedge AS (
        |  SELECT e1.a, e1.b AS m, e2.b AS c
        |  FROM e e1 JOIN e e2 ON e1.b = e2.a),
        |tri AS (
        |  SELECT w.a, w.m AS b, w.c
        |  FROM wedge w JOIN e ON w.a = e.a AND w.c = e.b)
        |SELECT vertice, CAST(count(*) AS BIGINT) AS triangulos FROM (
        |  SELECT a AS vertice FROM tri
        |  UNION ALL SELECT b FROM tri
        |  UNION ALL SELECT c FROM tri)
        |GROUP BY vertice
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // q142's blocking+DP, q52's recursive closure, deterministic
    // survivorship rank — the whole golden-record path replayed
    "q151_golden_record" ->
      """WITH RECURSIVE base AS (
        |  SELECT c_custkey AS id, c_name AS nome, c_acctbal AS saldo
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey + 10000000,
        |    substring(c_name, 1, 12) || substring(c_name, 14),
        |    c_acctbal + 100.0
        |  FROM customer WHERE c_custkey % 7 = 0),
        |keyed AS (SELECT id, lower(trim(nome)) AS nm FROM base),
        |e AS (
        |  SELECT DISTINCT a.id AS a, b.id AS b
        |  FROM keyed a JOIN keyed b
        |    ON substring(a.nm, len(a.nm) - 3, 4) =
        |       substring(b.nm, len(b.nm) - 3, 4)
        |   AND a.id < b.id
        |  WHERE levenshtein(a.nm, b.nm) <= 1),
        |sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
        |reach(n, r) AS (
        |  SELECT a, b FROM sym
        |  UNION
        |  SELECT reach.n, sym.b FROM reach JOIN sym ON reach.r = sym.a),
        |lab AS (SELECT n AS id, LEAST(n, MIN(r)) AS cluster_id
        |        FROM reach GROUP BY n),
        |full_ AS (
        |  SELECT coalesce(lab.cluster_id, base.id) AS cluster_id,
        |    base.id, base.nome, base.saldo
        |  FROM base LEFT JOIN lab ON base.id = lab.id),
        |rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY cluster_id
        |    ORDER BY len(nome) DESC, nome DESC, id ASC) AS r
        |  FROM full_)
        |SELECT cluster_id,
        |  CAST(count(*) AS BIGINT) AS membros,
        |  min(id) AS id_canonico,
        |  max(CASE WHEN r = 1 THEN nome END) AS nome_canonico,
        |  max(saldo) AS saldo_max
        |FROM rk GROUP BY cluster_id
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Brute-force all-pairs Levenshtein with the same normalization —
    // the deletion-neighborhood filter must lose NOTHING.
    "q183_edit_join" ->
      """WITH c AS (
        |  SELECT c_custkey AS id, lower(trim(c_name)) AS nm FROM customer
        |  UNION ALL
        |  SELECT c_custkey + 10000000,
        |    lower(trim(substring(c_name, 1, 12) || substring(c_name, 14)))
        |  FROM customer WHERE c_custkey % 7 = 0)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist
        |FROM c a JOIN c b
        |  ON a.id < b.id AND abs(len(a.nm) - len(b.nm)) <= 1
        |WHERE levenshtein(a.nm, b.nm) <= 1
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the undirected closure with a depth-capped recursive CTE:
    // min(d) over the distinct (vertex, depth) walk IS the BFS level.
    "q191_bfs_levels" ->
      """WITH RECURSIVE e AS (
        |  SELECT DISTINCT -l_suppkey AS a, l_partkey AS b FROM lineitem),
        |adj AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
        |seeds AS (SELECT DISTINCT l_partkey AS v FROM lineitem
        |  WHERE l_partkey % 500 = 0),
        |walk(v, d) AS (
        |  SELECT v, 0 FROM seeds
        |  UNION
        |  SELECT adj.b, d + 1 FROM walk JOIN adj ON walk.v = adj.a
        |  WHERE d < 3)
        |SELECT v AS vertice, CAST(min(d) AS BIGINT) AS nivel
        |FROM walk GROUP BY 1
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays normalization, the planted substitution, suffix-4
    // blocking and the threshold — but the similarity itself is
    // DuckDB's OWN jaro_winkler_similarity kernel, an implementation
    // independent of the engine's native expression.
    "q202_jaro_winkler" ->
      """WITH c AS (
        |  SELECT c_custkey AS id, lower(trim(c_name)) AS nome
        |  FROM customer),
        |v AS (
        |  SELECT id + 1000000 AS id,
        |    substring(nome, 1, 11) || 'x' || substring(nome, 13) AS nome
        |  FROM c WHERE id % 9 = 0),
        |allr AS (SELECT * FROM c UNION ALL SELECT * FROM v),
        |k AS (SELECT id, nome, right(nome, 4) AS key FROM allr),
        |cand AS (
        |  SELECT a.id AS id_a, b.id AS id_b,
        |    a.nome AS nome_a, b.nome AS nome_b
        |  FROM k a JOIN k b ON a.key = b.key AND a.id < b.id)
        |SELECT id_a, id_b, jaro_winkler_similarity(nome_a, nome_b) AS sim
        |FROM cand
        |WHERE jaro_winkler_similarity(nome_a, nome_b) >= 0.937
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays variants, labeled pairs, the smoothed m/u weights and the
    // left-associated log-likelihood sum with its three-way decision;
    // candidates = the COMPLETE same-nation Levenshtein ≤ 2 pair set
    // (brute-force here; the engine reaches it via stratified FastSS).
    "q186_fellegi_sunter" ->
      """WITH c AS (SELECT c_custkey AS id, lower(trim(c_name)) AS nome,
        |    c_nationkey AS nacao,
        |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS tel3,
        |    c_mktsegment AS seg FROM customer),
        |v AS (SELECT id + 10000000 AS id,
        |    substring(nome, 1, 12) || substring(nome, 14) AS nome, nacao,
        |    CASE WHEN id % 3 = 0 THEN -1 ELSE tel3 END AS tel3, seg
        |  FROM c WHERE id % 7 = 0),
        |pares AS (
        |  SELECT a.id AS id_a, b.id AS id_b,
        |    levenshtein(a.nome, b.nome) <= 1 AS nome_igual,
        |    a.tel3 = b.tel3 AS faixa_igual, a.seg = b.seg AS seg_igual,
        |    TRUE AS eh_par
        |  FROM c a JOIN v b ON b.id = a.id + 10000000
        |  UNION ALL
        |  SELECT a.id, b.id, levenshtein(a.nome, b.nome) <= 1,
        |    a.tel3 = b.tel3, a.seg = b.seg, FALSE
        |  FROM c a JOIN c b ON b.id = a.id + 11111),
        |w AS (SELECT
        |    sum(CASE WHEN eh_par THEN 1 ELSE 0 END) AS nm,
        |    sum(CASE WHEN eh_par THEN 0 ELSE 1 END) AS nu,
        |    sum(CASE WHEN eh_par AND nome_igual THEN 1 ELSE 0 END) AS m_nome,
        |    sum(CASE WHEN NOT eh_par AND nome_igual THEN 1 ELSE 0 END) AS u_nome,
        |    sum(CASE WHEN eh_par AND faixa_igual THEN 1 ELSE 0 END) AS m_faixa,
        |    sum(CASE WHEN NOT eh_par AND faixa_igual THEN 1 ELSE 0 END) AS u_faixa,
        |    sum(CASE WHEN eh_par AND seg_igual THEN 1 ELSE 0 END) AS m_seg,
        |    sum(CASE WHEN NOT eh_par AND seg_igual THEN 1 ELSE 0 END) AS u_seg
        |  FROM pares),
        |pesos AS (SELECT
        |    ln(CAST((m_nome + 1) * (nu + 2) AS DOUBLE) /
        |       CAST((u_nome + 1) * (nm + 2) AS DOUBLE)) AS wa_nome,
        |    ln(CAST((nm + 1 - m_nome) * (nu + 2) AS DOUBLE) /
        |       CAST((nu + 1 - u_nome) * (nm + 2) AS DOUBLE)) AS wd_nome,
        |    ln(CAST((m_faixa + 1) * (nu + 2) AS DOUBLE) /
        |       CAST((u_faixa + 1) * (nm + 2) AS DOUBLE)) AS wa_faixa,
        |    ln(CAST((nm + 1 - m_faixa) * (nu + 2) AS DOUBLE) /
        |       CAST((nu + 1 - u_faixa) * (nm + 2) AS DOUBLE)) AS wd_faixa,
        |    ln(CAST((m_seg + 1) * (nu + 2) AS DOUBLE) /
        |       CAST((u_seg + 1) * (nm + 2) AS DOUBLE)) AS wa_seg,
        |    ln(CAST((nm + 1 - m_seg) * (nu + 2) AS DOUBLE) /
        |       CAST((nu + 1 - u_seg) * (nm + 2) AS DOUBLE)) AS wd_seg
        |  FROM w),
        |todos AS (SELECT * FROM c UNION ALL SELECT * FROM v),
        |cand AS (SELECT a.id AS id_a, b.id AS id_b,
        |    levenshtein(a.nome, b.nome) <= 1 AS nome_igual,
        |    a.tel3 = b.tel3 AS faixa_igual, a.seg = b.seg AS seg_igual
        |  FROM todos a JOIN todos b
        |    ON a.nacao = b.nacao AND a.id < b.id
        |      AND abs(length(a.nome) - length(b.nome)) <= 2
        |      AND levenshtein(a.nome, b.nome) <= 2),
        |sc AS (SELECT id_a, id_b, nome_igual, faixa_igual, seg_igual,
        |    (CASE WHEN nome_igual THEN wa_nome ELSE wd_nome END)
        |      + (CASE WHEN faixa_igual THEN wa_faixa ELSE wd_faixa END)
        |      + (CASE WHEN seg_igual THEN wa_seg ELSE wd_seg END)
        |      AS pontuacao
        |  FROM cand CROSS JOIN pesos)
        |SELECT id_a, id_b, nome_igual, faixa_igual, seg_igual, pontuacao,
        |  CASE WHEN pontuacao >= 1.0 THEN 'match'
        |       WHEN pontuacao <= -1.0 THEN 'nao_match'
        |       ELSE 'possivel' END AS classificacao
        |FROM sc ORDER BY ALL NULLS FIRST""".stripMargin,
  )
}
