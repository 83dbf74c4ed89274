package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{Dbf, HtmlForm, Listing, ParquetSink, ReportCsv, Staging, Tables}
import graft.operators._

/** Embedding similarity/ANN: cosine top-k, LSH, IVF, PQ/IVFADC, JL screen,
  * quantization, centroids, MMR.
  *
  * Registry shard of [[SparkEntry]] — entries moved verbatim; see SURVEY.md §2
  * for the operator-row mapping.
  */
private[graft] trait RegistrySimilarity extends RegistryBase {

  protected def queriesSimilarity: Map[String, (SparkSession, String) => DataFrame] = Map(

    // §2 row 247 — simplified (centroid) silhouette: clustering-quality
    // audit over the labeled embeddings; decimal-exact squared
    // distances, decimal argmin for the nearest other centroid, one
    // sqrt per side.
    "q233_silhouette" -> { (s, dir) =>
      ordered(llm.Similarity.simplifiedSilhouette(
        Tables.embeddings(s, dir), "vec_id", "embedding", "label"))
    },
    // §2 row 29 — brute-force cosine top-k: broadcast query set, decimal
    // -exact dot products, per-query window top-k.
    "q29_cosine_topk" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      // the fixed 32-row batch is a global sort-limit; persist it so the
      // probe/scoring joins downstream don't each recompute the sort
      val queries = llm.CacheScope.persistTracked(emb.orderBy("vec_id").limit(32))
      ordered(llm.Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10))
    },

    // §2 row 30 — LSH-bucketed ANN: hyperplane buckets, equi-join, exact
    // rerank (rows-only; recall spec in scalatest).
    "q30_ann_lsh" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val queries = llm.CacheScope.persistTracked(emb.orderBy("vec_id").limit(32))
      ordered(llm.Similarity.annTopK(emb, queries, "vec_id", "embedding", 10, planes = 4))
    },

    // §2 row 42 — IVF ANN: k-means cells, nProbe nearest cells per query,
    // exact-cosine rerank inside probed cells (rows-only; recall spec in
    // scalatest).
    "q42_ann_ivf" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val queries = llm.CacheScope.persistTracked(emb.orderBy("vec_id").limit(32))
      ordered(llm.Ivf.ivfTopK(emb, queries, "vec_id", "embedding", 10))
    },

    // Symmetric int8 embedding quantization (4x storage compression for
    // embedding stores). Graded contract emits exact SCALAR witnesses of
    // the quantized array — the integer sum of squares pins every q_i
    // exactly, the max reconstruction error pins the dequantization —
    // because the driver's row-compare cannot hash array cells (q45
    // lesson). Rounding is floor(x/s + 0.5): IEEE-exact, so DuckDB
    // reproduces the ints bit-for-bit where round()'s half convention
    // would diverge.
    "q54_embedding_quantize" -> { (s, dir) =>
      val q = llm.Similarity.quantizeInt8(
        Tables.embeddings(s, dir).select("vec_id", "embedding"), "embedding")
      ordered(q.select(
        col("vec_id"), col("escala"),
        aggregate(col("q"), lit(0L),
          (a, x) => a + x.cast("long") * x.cast("long")).as("soma_q2"),
        array_max(zip_with(col("q"), col("embedding"),
          (qi, xi) => abs(qi.cast("double") * col("escala") - xi.cast("double"))))
          .as("erro_max")))
    },

    // Per-label embedding centroid: posexplode fan-out + one map-side-
    // combinable (label, position) aggregation, DECIMAL(38,18)-exact sums
    // with a single IEEE division — the mean-pooling / class-prototype
    // step of an embedding pipeline.
    "q77_embedding_pool" -> { (s, dir) =>
      ordered(llm.Similarity.groupCentroid(
        Tables.embeddings(s, dir), "label", "embedding"))
    },

    // Embedding-space outlier gate: every vector scored by cosine to its
    // OWN label's centroid (mislabeled/off-topic/garbage-encoding
    // detection). Centroids broadcast, corpus never shuffles; all sums
    // DECIMAL-exact so scores and flags replay bit-for-bit.
    "q114_centroid_outliers" -> { (s, dir) =>
      ordered(llm.Similarity.centroidOutliers(
        Tables.embeddings(s, dir), "vec_id", "embedding", "label",
        minCos = 0.0))
    },

    // Hard-negative mining: per query, the 5 most-similar vectors with a
    // DIFFERENT label (the contrastive near-misses). Broadcast queries,
    // cross-label predicate before any dot product, per-query top-k.
    // FIXED 20-query batch (the §4 retrieval discipline: a constant
    // query load against a growing corpus — modulus selection would
    // grow the batch with the corpus and turn the bench quadratic).
    "q116_hard_negatives" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      ordered(llm.Similarity.hardNegatives(
        emb, emb.orderBy("vec_id").limit(20),
        "vec_id", "embedding", "label", k = 5))
    },

    // Johnson-Lindenstrauss random projection (Achlioptas ±1 signs from
    // portable md5 — no stored matrix, engine-identical, append-
    // consistent): the cheap distance-preserving screen in front of
    // exact cosine. DECIMAL-accumulated per (id, output dim) so the
    // projected space is partition-independent; the oracle rebuilds
    // every sign and sum exactly.
    "q138_random_projection" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir).filter(col("vec_id") % 50 === 0)
      ordered(llm.Similarity.randomProject(emb, "vec_id", "embedding",
        outDims = 8))
    },

    // The two-stage ANN q138's projection exists for: screen all pairs
    // in 8 projected dims (8× less pair work than full-dim), bounded-
    // heap keep 50 candidates per query, exact-decimal cosine re-rank
    // the survivors only. Deterministic end to end, so the oracle
    // replays BOTH stages — projections, screen ranks, and the exact
    // re-rank — bit-for-bit. Recall vs brute force is the JL trade
    // (spec-measured); self matches always survive.
    "q139_screened_topk" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val q = emb.orderBy("vec_id").limit(32)
      ordered(llm.Similarity.screenedTopK(emb, q, "vec_id", "embedding",
        k = 10, outDims = 8, screen = 50))
    },

    // MMR diversified re-rank (Carbonell-Goldstein): brute-force cosine
    // top-20 candidates per query, then 5 greedy rounds of
    // λ·rel − (1−λ)·max-sim-to-selected — the de-redundancy step
    // between retrieval and a RAG context window. k is constant, so the
    // loop is k engine rounds (broadcast join + bounded-heap argmax),
    // all queries advancing in parallel; the oracle unrolls the rounds
    // as CTEs and replays every selection exactly.
    "q143_mmr_diversify" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val queries = emb.orderBy("vec_id").limit(8)
      val cand = llm.Similarity
        .bruteForceTopK(emb, queries, "vec_id", "embedding", k = 20)
        .select(col("query_id"), col("corpus_id"), col("cosine").as("rel"))
      ordered(llm.Similarity.mmrSelect(
        cand, emb, "vec_id", "embedding", k = 5, lambda = 0.7))
    },

    // Product-quantization ANN through the FULL IVFADC composition —
    // the architecture that ships at scale: IVF cells bound the scan
    // set, PQ codes bound per-vector cost, ADC shortlist, exact refine
    // (rows-only: ADC is approximate by construction; SimilaritySpec
    // pins recall 0.44 raw / 0.96 refined / 0.76 IVFADC vs exact L2
    // and code determinism).
    "q206_pq_ann" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") % 200 === 0)
      val model = llm.Pq.fit(emb, "vec_id", "embedding", m = 8, k = 16,
        samplePct = 30)
      val idx = llm.Ivf.index(emb, "vec_id", "embedding", nCells = 16,
        samplePct = 30)
      ordered(llm.Pq.ivfAdcTopK(
        idx, model, llm.Pq.encode(emb, "vec_id", "embedding", model),
        emb, q, "vec_id", "embedding", k = 10, nProbe = 6,
        shortlist = 100))
    },

    // §2 row 234 — margin-based parallel-corpus mining (Artetxe &
    // Schwenk: cos / neighborhood-average ratio, argmax per left id).
    // A = vec_id%40==0, B = %40==1 — disjoint sides, the published
    // two-corpus setting; k-NN averages decimal-folded, one division.
    "q220_margin_mining" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      ordered(llm.Mining.marginMine(
        emb.filter(col("vec_id") % 40 === 0),
        emb.filter(col("vec_id") % 40 === 1),
        "vec_id", "embedding", k = 4, threshold = 1.0))
    },
  )

  protected def oraclesSimilarity: Map[String, String] = Map(

    "q233_silhouette" ->
      """WITH e AS (
        |  SELECT vec_id, label,
        |    generate_subscripts(embedding, 1) - 1 AS pos,
        |    CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings
        |  WHERE label IS NOT NULL AND embedding IS NOT NULL),
        |c AS (SELECT label AS cl, pos,
        |    CAST(sum(CAST(v AS DECIMAL(38,18))) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE) AS cv
        |  FROM e GROUP BY cl, pos),
        |d AS (SELECT e.vec_id, e.label, c.cl,
        |    sum(CAST((e.v - c.cv) * (e.v - c.cv) AS DECIMAL(38,18))) AS d2
        |  FROM e JOIN c ON e.pos = c.pos
        |  GROUP BY e.vec_id, e.label, c.cl),
        |own AS (SELECT vec_id, label, d2 AS a2 FROM d WHERE label = cl),
        |oth AS (SELECT vec_id, min(d2) AS b2 FROM d WHERE label <> cl
        |  GROUP BY vec_id),
        |sv AS (SELECT own.label,
        |    sqrt(CAST(a2 AS DOUBLE)) AS a, sqrt(CAST(b2 AS DOUBLE)) AS b
        |  FROM own JOIN oth ON own.vec_id = oth.vec_id)
        |SELECT label AS cluster, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(CASE WHEN greatest(a, b) > 0.0
        |      THEN (b - a) / greatest(a, b) ELSE 0.0 END
        |    AS DECIMAL(38,18))) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |    AS silhueta_media
        |FROM sv GROUP BY label
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the q29 decimal-dot cosine over A×B, both directions'
    // top-4 decimal-folded neighborhood averages, the margin ratio and
    // the per-id_a argmax with the pinned tie order.
    "q220_margin_mining" ->
      """WITH a AS (SELECT vec_id, embedding FROM embeddings
        |  WHERE vec_id % 40 = 0),
        |b AS (SELECT vec_id, embedding FROM embeddings
        |  WHERE vec_id % 40 = 1),
        |na AS (SELECT vec_id, sqrt(CAST(list_aggregate(list_transform(
        |    embedding, x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
        |    AS DECIMAL(38,18))), 'sum') AS DOUBLE)) AS nrm FROM a),
        |nb AS (SELECT vec_id, sqrt(CAST(list_aggregate(list_transform(
        |    embedding, x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
        |    AS DECIMAL(38,18))), 'sum') AS DOUBLE)) AS nrm FROM b),
        |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    CAST(list_aggregate(list_transform(
        |      list_zip(a.embedding, b.embedding),
        |      z -> CAST(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)
        |      AS DECIMAL(38,18))), 'sum') AS DOUBLE) /
        |      (na.nrm * nb.nrm) AS cos
        |  FROM a JOIN na ON na.vec_id = a.vec_id
        |  CROSS JOIN b JOIN nb ON nb.vec_id = b.vec_id),
        |ka AS (SELECT id_a,
        |    CAST(SUM(CAST(cos AS DECIMAL(38,18))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE) AS nn
        |  FROM (SELECT id_a, cos, row_number() OVER (PARTITION BY id_a
        |      ORDER BY cos DESC, id_b ASC) AS r FROM p)
        |  WHERE r <= 4 GROUP BY id_a),
        |kb AS (SELECT id_b,
        |    CAST(SUM(CAST(cos AS DECIMAL(38,18))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE) AS nn
        |  FROM (SELECT id_b, cos, row_number() OVER (PARTITION BY id_b
        |      ORDER BY cos DESC, id_a ASC) AS r FROM p)
        |  WHERE r <= 4 GROUP BY id_b),
        |m AS (SELECT p.id_a, p.id_b, p.cos,
        |    p.cos / (ka.nn / 2.0 + kb.nn / 2.0) AS margin
        |  FROM p JOIN ka ON ka.id_a = p.id_a
        |  JOIN kb ON kb.id_b = p.id_b),
        |best AS (SELECT id_a, id_b, cos, margin, row_number() OVER (
        |    PARTITION BY id_a
        |    ORDER BY margin DESC, cos DESC, id_b ASC) AS rb FROM m)
        |SELECT id_a, id_b, cos AS cosine, margin
        |FROM best WHERE rb = 1 AND margin >= 1.0
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q29_cosine_topk" ->
      """WITH n AS (
        |  SELECT vec_id,
        |    sqrt(CAST(list_aggregate(list_transform(embedding,
        |      x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,18))),
        |      'sum') AS DOUBLE)) AS nrm
        |  FROM embeddings),
        |p AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
        |    CAST(list_aggregate(list_transform(list_zip(q.embedding, c.embedding),
        |      z -> CAST(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) AS DECIMAL(38,18))),
        |      'sum') AS DOUBLE) AS dot
        |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 32) q
        |  CROSS JOIN embeddings c),
        |s AS (
        |  SELECT query_id, corpus_id, p.dot / (nq.nrm * nc.nrm) AS cosine
        |  FROM p
        |  JOIN n nq ON p.query_id = nq.vec_id
        |  JOIN n nc ON p.corpus_id = nc.vec_id)
        |SELECT * FROM (
        |  SELECT query_id, corpus_id, cosine,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, corpus_id ASC) AS BIGINT) AS rank
        |  FROM s)
        |WHERE rank <= 10 ORDER BY ALL NULLS FIRST""".stripMargin,

    // Reproduces the quantization exactly: same max-abs/127 scale (greatest
    // is order-independent), same IEEE-exact floor(x/s + 0.5) rounding, so
    // the integer sum of squares and the double reconstruction error match
    // bit-for-bit.
    "q54_embedding_quantize" ->
      """WITH s AS (
        |  SELECT vec_id, embedding AS e,
        |    greatest(list_max(list_transform(embedding,
        |      x -> abs(CAST(x AS DOUBLE)))), 1e-12) / 127.0 AS escala
        |  FROM embeddings)
        |SELECT vec_id, escala,
        |  CAST(list_sum(list_transform(e,
        |    x -> floor(CAST(x AS DOUBLE) / escala + 0.5) ** 2)) AS BIGINT) AS soma_q2,
        |  list_max(list_transform(e,
        |    x -> abs(floor(CAST(x AS DOUBLE) / escala + 0.5) * escala
        |             - CAST(x AS DOUBLE)))) AS erro_max
        |FROM s ORDER BY ALL NULLS FIRST""".stripMargin,

    // Decimal-exact per-coordinate means (posexplode ↔ unnest+subscripts).
    "q77_embedding_pool" ->
      """SELECT label, CAST(posicao AS INT) AS posicao,
        |  CAST(sum(CAST(CAST(v AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) /
        |    CAST(count(*) AS DOUBLE) AS valor
        |FROM (
        |  SELECT label, generate_subscripts(embedding, 1) - 1 AS posicao,
        |    unnest(embedding) AS v
        |  FROM embeddings)
        |GROUP BY label, posicao
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Per-label centroid (q77's DECIMAL-exact mean), per-vector decimal
    // dot and norms — the q38 idiom — then cosine-to-centroid + flag.
    "q114_centroid_outliers" ->
      """WITH e AS (
        |  SELECT vec_id, label, generate_subscripts(embedding, 1) - 1 AS posicao,
        |    CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings),
        |c AS (SELECT label, posicao,
        |    CAST(sum(CAST(v AS DECIMAL(38,18))) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE) AS valor
        |  FROM e GROUP BY label, posicao),
        |nv AS (SELECT vec_id,
        |    sqrt(CAST(sum(CAST(v * v AS DECIMAL(38,18))) AS DOUBLE)) AS nrm
        |  FROM e GROUP BY vec_id),
        |nc AS (SELECT label,
        |    sqrt(CAST(sum(CAST(valor * valor AS DECIMAL(38,18))) AS DOUBLE)) AS nrm
        |  FROM c GROUP BY label),
        |d AS (SELECT e.vec_id, e.label,
        |    CAST(sum(CAST(e.v * c.valor AS DECIMAL(38,18))) AS DOUBLE) AS dot
        |  FROM e JOIN c USING (label, posicao) GROUP BY 1, 2)
        |SELECT d.vec_id, d.label,
        |  d.dot / (nv.nrm * nc.nrm) AS cos_centroide,
        |  d.dot / (nv.nrm * nc.nrm) < 0.0 AS atipico
        |FROM d JOIN nv USING (vec_id) JOIN nc ON d.label = nc.label
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // q29's decimal-exact pair scoring restricted to CROSS-label pairs.
    "q116_hard_negatives" ->
      """WITH n AS (
        |  SELECT vec_id,
        |    sqrt(CAST(list_aggregate(list_transform(embedding,
        |      x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,18))),
        |      'sum') AS DOUBLE)) AS nrm
        |  FROM embeddings),
        |p AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
        |    CAST(list_aggregate(list_transform(list_zip(q.embedding, c.embedding),
        |      z -> CAST(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) AS DECIMAL(38,18))),
        |      'sum') AS DOUBLE) AS dot
        |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 20) q
        |  JOIN embeddings c ON q.label <> c.label),
        |s AS (
        |  SELECT query_id, corpus_id, p.dot / (nq.nrm * nc.nrm) AS cosine
        |  FROM p
        |  JOIN n nq ON p.query_id = nq.vec_id
        |  JOIN n nc ON p.corpus_id = nc.vec_id)
        |SELECT * FROM (
        |  SELECT query_id, corpus_id, cosine,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, corpus_id ASC) AS BIGINT) AS rank
        |  FROM s)
        |WHERE rank <= 5 ORDER BY ALL NULLS FIRST""".stripMargin,

    // every ±1 sign from md5(i:j), element casts and the DECIMAL sum
    // replayed exactly; parallel unnests zip (pos, value)
    "q138_random_projection" ->
      """WITH sub AS (
        |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 50 = 0),
        |el AS (
        |  SELECT vec_id,
        |    unnest(range(0, len(embedding))) AS i,
        |    unnest(embedding) AS x
        |  FROM sub),
        |c AS (
        |  SELECT vec_id, CAST(jt.j AS INT) AS j,
        |    CAST(CAST(x AS DOUBLE) *
        |      (CASE WHEN CAST(('0x' || substring(
        |           md5(CAST(i AS VARCHAR) || ':' || CAST(jt.j AS VARCHAR)),
        |           1, 8)) AS BIGINT) % 2 = 0
        |            THEN 1.0 ELSE -1.0 END) AS DECIMAL(38,18)) AS c
        |  FROM el CROSS JOIN (SELECT unnest(range(0, 8)) AS j) jt)
        |SELECT vec_id, j,
        |  CAST(CAST(sum(c) AS DECIMAL(38,18)) AS DOUBLE) AS valor
        |FROM c GROUP BY vec_id, j
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // both stages replayed: unit-normalize (guarded norm), project with
    // md5 signs, screen rank at 50, exact decimal cosine re-rank at 10
    "q139_screened_topk" ->
      """WITH n AS (
        |  SELECT vec_id,
        |    greatest(sqrt(CAST(list_aggregate(list_transform(embedding,
        |      x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,18))),
        |      'sum') AS DOUBLE)), 1e-12) AS nrm
        |  FROM embeddings),
        |u AS (
        |  SELECT e.vec_id,
        |    list_transform(e.embedding, x -> CAST(x AS DOUBLE) / nrm) AS u
        |  FROM embeddings e JOIN n USING (vec_id)),
        |qids AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 32),
        |el AS (
        |  SELECT vec_id,
        |    unnest(range(0, len(u))) AS i,
        |    unnest(u) AS x
        |  FROM u),
        |proj AS (
        |  SELECT vec_id, jt.j,
        |    CAST(CAST(sum(CAST(x * (CASE WHEN CAST(('0x' || substring(
        |        md5(CAST(i AS VARCHAR) || ':' || CAST(jt.j AS VARCHAR)), 1, 8))
        |        AS BIGINT) % 2 = 0 THEN 1.0 ELSE -1.0 END) AS DECIMAL(38,18)))
        |      AS DECIMAL(38,18)) AS DOUBLE) AS valor
        |  FROM el CROSS JOIN (SELECT unnest(range(0, 8)) AS j) jt
        |  GROUP BY vec_id, jt.j),
        |dots AS (
        |  SELECT qp.vec_id AS query_id, cp.vec_id AS corpus_id,
        |    CAST(CAST(sum(CAST(qp.valor * cp.valor AS DECIMAL(38,18)))
        |      AS DECIMAL(38,18)) AS DOUBLE) AS screen
        |  FROM proj qp JOIN proj cp USING (j)
        |  WHERE qp.vec_id IN (SELECT vec_id FROM qids)
        |  GROUP BY query_id, corpus_id),
        |cand AS (
        |  SELECT query_id, corpus_id FROM (
        |    SELECT query_id, corpus_id,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY screen DESC, corpus_id ASC) AS r
        |    FROM dots) WHERE r <= 50),
        |p AS (
        |  SELECT c.query_id, c.corpus_id,
        |    CAST(list_aggregate(list_transform(list_zip(qe.embedding, ce.embedding),
        |      z -> CAST(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) AS DECIMAL(38,18))),
        |      'sum') AS DOUBLE) AS dot
        |  FROM cand c
        |  JOIN embeddings qe ON c.query_id = qe.vec_id
        |  JOIN embeddings ce ON c.corpus_id = ce.vec_id),
        |s AS (
        |  SELECT query_id, corpus_id, p.dot / (nq.nrm * nc.nrm) AS cosine
        |  FROM p JOIN n nq ON p.query_id = nq.vec_id
        |         JOIN n nc ON p.corpus_id = nc.vec_id)
        |SELECT * FROM (
        |  SELECT query_id, corpus_id, cosine,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, corpus_id ASC) AS BIGINT) AS rank
        |  FROM s)
        |WHERE rank <= 10 ORDER BY ALL NULLS FIRST""".stripMargin,

    "q143_mmr_diversify" -> mmrOracle(k = 5),
  )
}
