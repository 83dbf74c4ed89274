package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{Dbf, HtmlForm, Listing, ParquetSink, ReportCsv, Staging, Tables}
import graft.operators._

/** Retrieval: BM25 (inline + indexed), TF-IDF, RRF fusion, phrase search, PRF,
  * retrieval evaluation, the RAG chain.
  *
  * Registry shard of [[SparkEntry]] — entries moved verbatim; see SURVEY.md §2
  * for the operator-row mapping.
  */
private[graft] trait RegistryRetrieval extends RegistryBase {

  protected def queriesRetrieval: Map[String, (SparkSession, String) => DataFrame] = Map(

    // The composed RAG ingestion pipeline, end-to-end and ORACLE-EXACT:
    // chunk the corpus (q53's operator) → embed each chunk with a
    // deterministic md5 feature hash (portable, so DuckDB replays the
    // "model" bit-for-bit — a real encoder slots into the same column) →
    // exact cosine top-3 retrieval (q29's operator) for a query subset.
    // The embedded corpus is a persisted branch point: both the corpus
    // and query sides of the pair join consume it, and CollapseProject
    // would otherwise re-chunk + re-hash per consumer (SURVEY §4).
    "q89_rag_retrieval" -> { (s, dir) =>
      val dims = 4
      val chunks = llm.Curation.chunkTokens(
        Tables.documents(s, dir).select("doc_id", "text"), "text",
        window = 30, overlap = 0)
        .select((col("doc_id") * 1000 + col("chunk_idx")).as("chunk_id"),
          col("chunk_text"))
      val emb = transform(sequence(lit(0), lit(dims - 1)),
        i => conv(substring(md5(concat(i.cast("string"), lit(":"),
          col("chunk_text")).cast("binary")), 1, 8), 16, 10)
          .cast("double") / 4294967296.0d)
      val corpus = llm.CacheScope.persistTracked(
        chunks.select(col("chunk_id"), emb.as("embedding")))
      // a FIXED query batch (deterministic first-32 by id): real retrieval
      // serves a constant query load against a growing corpus — a
      // corpus-proportional query set (the old % filter) made this bench
      // O(corpus²) and it blew up 60x at sf1
      val queries = llm.CacheScope.persistTracked(
        corpus.orderBy("chunk_id").limit(32))
      ordered(llm.Similarity.bruteForceTopK(
        corpus, queries, "chunk_id", "embedding", k = 3))
    },

    // Keyword/BM25 retrieval — the lexical twin of q89's embedding RAG:
    // inverted postings (one scan-level tokenize→explode→combine), the
    // fixed 8-query batch BROADCAST onto the postings (the corpus never
    // shuffles for candidate generation), log-free idf so every score op
    // is correctly-rounded IEEE arithmetic DuckDB replays bit-for-bit,
    // bounded-heap top-5 per query.
    // maxDfFraction is lifted to 1.0 here: the synthetic corpus draws from
    // a ~31-word vocabulary, so every term exceeds the 0.5 near-stopword
    // default (which is the right default against a real Zipf vocabulary).
    "q99_bm25_retrieval" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val queries = docs.orderBy("doc_id").limit(8)
      ordered(llm.Retrieval.bm25TopK(docs, queries, "doc_id", "text", k = 5,
        maxDfFraction = 1.0))
    },

    // Pseudo-relevance-feedback expansion: BM25 -> mine top-3 terms from
    // each query's top-5 docs (bounded heap, deterministic ties) ->
    // append -> BM25 again. The whole two-pass chain replays in the
    // oracle; the corpus never shuffles in either pass.
    "q169_prf_expansion" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val queries = docs.orderBy("doc_id").limit(8)
      ordered(llm.Retrieval.prfExpand(docs, queries, "doc_id", "text",
        k = 5, kDocs = 5, mTerms = 3, maxDfFraction = 1.0))
    },

    // Hybrid retrieval: BM25 (q99's lexical path, k=20) and embedding
    // cosine top-k (q89's dense path over whole docs, k=20) fused with
    // reciprocal-rank fusion — rank-based, so the two retrievers' score
    // scales never need calibrating. Both rank lists are tiny (8 queries
    // × ≤20 rows); the fuse is one map-side-combinable agg + bounded-heap
    // top-5, exact through DECIMAL per-retriever contributions.
    "q100_hybrid_rrf" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val queries = docs.orderBy("doc_id").limit(8)
      val bm25 = llm.Retrieval.bm25TopK(docs, queries, "doc_id", "text",
        k = 20, maxDfFraction = 1.0)
        .select("query_id", "doc_id", "posicao")
      val emb = transform(sequence(lit(0), lit(3)),
        i => conv(substring(md5(concat(i.cast("string"), lit(":"),
          col("text")).cast("binary")), 1, 8), 16, 10)
          .cast("double") / 4294967296.0d)
      val corpus = llm.CacheScope.persistTracked(
        docs.select(col("doc_id"), emb.as("embedding")))
      val qemb = llm.CacheScope.persistTracked(
        corpus.orderBy("doc_id").limit(8))
      val knn = llm.Similarity.bruteForceTopK(
        corpus, qemb, "doc_id", "embedding", k = 20)
        .select(col("query_id"), col("corpus_id").as("doc_id"),
          col("rank").as("posicao"))
      ordered(llm.Retrieval.rrfFuse(Seq(bm25, knn), k = 5))
    },

    // TF-IDF cosine retrieval, SMART lnc.ltc (Salton & Buckley) — the
    // second lexical ranker next to q99's BM25: document vectors carry
    // tf only (so the doc norm folds off the postings in one combinable
    // aggregation — no vocabulary join), query vectors carry tf·(N/df)
    // with the LOG-FREE idf; every score op is correctly-rounded IEEE
    // (sqrt included) so DuckDB replays the cosine bit-for-bit.
    // maxDfFraction lifted to 1.0 for the ~31-word synthetic vocabulary
    // (same note as q99).
    "q131_tfidf_retrieval" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val queries = docs.orderBy("doc_id").limit(8)
      ordered(llm.Retrieval.tfidfTopK(docs, queries, "doc_id", "text",
        k = 5, maxDfFraction = 1.0))
    },

    // q99's BM25 replayed from a PERSISTED postings index built in TWO
    // appends: write half the corpus, fold the other half in
    // (postings append + exact-integer stats merge), query off the
    // index alone — no tokenization in the scoring plan, scores
    // bit-identical to the from-scratch path. Oracle: q99's SQL verbatim.
    "q136_bm25_indexed" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val idxDir = scratchDir("graft-postidx")
      llm.Retrieval.writePostingsIndex(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", idxDir)
      llm.Retrieval.appendPostingsIndex(
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", idxDir)
      val queries = docs.orderBy("doc_id").limit(8)
      ordered(llm.Retrieval.bm25TopKIndexed(
        llm.Retrieval.readPostingsIndex(s, idxDir), queries,
        "doc_id", "text", k = 5, maxDfFraction = 1.0))
    },

    // Retrieval evaluation in-engine: q99's BM25 ranking scored against
    // an exact-duplicate relevance set (every doc sharing the query's
    // text is relevant — including the query itself, which a sane
    // lexical ranker must retrieve). Per query: relevant count, hits,
    // recall@5 and reciprocal rank — the offline gate a retriever
    // change passes before production. Oracle nests q99's replay as a
    // CTE and replays the eval arithmetic exactly.
    "q141_retrieval_eval" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val queries = docs.orderBy("doc_id").limit(8)
      val ranking = llm.Retrieval.bm25TopK(docs, queries, "doc_id", "text",
        k = 5, maxDfFraction = 1.0)
      val rel = queries.select(col("doc_id").as("query_id"), col("text"))
        .join(docs, "text")
        .select("query_id", "doc_id")
      ordered(llm.Retrieval.evalRanking(ranking, rel, k = 5))
    },

    // Average precision @5 over the same BM25 ranking + duplicate-text
    // relevance as q141 — every relevant doc contributes precision at
    // its own rank, folded in rank order; MAP-ready per-query rows.
    "q211_avg_precision" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val queries = docs.orderBy("doc_id").limit(8)
      val ranking = llm.Retrieval.bm25TopK(docs, queries, "doc_id", "text",
        k = 5, maxDfFraction = 1.0)
      val rel = queries.select(col("doc_id").as("query_id"), col("text"))
        .join(docs, "text")
        .select("query_id", "doc_id")
      ordered(llm.Retrieval.evalAveragePrecision(ranking, rel, k = 5))
    },

    // Exact phrase search over positional postings: a k-term phrase
    // matches at position p iff term_i sits at p+i for all i — one
    // broadcast of the exploded phrase terms onto the positional
    // posting scan, one combinable per-(doc, phrase, start) count
    // equal to the phrase length, one count per (phrase, doc). The
    // primitive the term-bag rankers (q99/q131) cannot express.
    "q156_phrase_search" -> { (s, dir) =>
      import s.implicits._
      val phrases = Seq("hash join", "table scan", "sort merge", "the row")
        .toDF("frase")
      ordered(llm.Retrieval.phraseSearch(
        Tables.documents(s, dir), "doc_id", "text", phrases, "frase"))
    },
  )

  protected def oraclesRetrieval: Map[String, String] = Map(

    // Chunk (q53 idiom) → md5 feature-hash embed → decimal-exact cosine
    // top-3 (q29 idiom): the whole retrieval pipeline replayed in SQL.
    "q89_rag_retrieval" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, tk, len(tk) AS n,
        |    1 + CAST(ceil(greatest(len(tk) - 30, 0) / 30.0) AS INT) AS nch
        |  FROM t),
        |ch AS (
        |  SELECT doc_id * 1000 + u.i AS chunk_id,
        |    array_to_string(tk[u.i * 30 + 1 : u.i * 30 + 30], ' ') AS chunk_text
        |  FROM c, LATERAL unnest(generate_series(0, nch - 1)) u(i)),
        |e AS (
        |  SELECT chunk_id,
        |    list_transform(generate_series(0, 3),
        |      d -> CAST(CAST(('0x' || substring(md5(
        |        CAST(d AS VARCHAR) || ':' || chunk_text), 1, 8)) AS BIGINT)
        |        AS DOUBLE) / 4294967296.0) AS emb
        |  FROM ch),
        |n AS (
        |  SELECT chunk_id, sqrt(CAST(list_aggregate(list_transform(emb,
        |    x -> CAST(x * x AS DECIMAL(38,18))), 'sum') AS DOUBLE)) AS nrm
        |  FROM e),
        |p AS (
        |  SELECT q.chunk_id AS query_id, cdf.chunk_id AS corpus_id,
        |    CAST(list_aggregate(list_transform(list_zip(q.emb, cdf.emb),
        |      z -> CAST(z[1] * z[2] AS DECIMAL(38,18))), 'sum') AS DOUBLE) AS dot
        |  FROM (SELECT * FROM e ORDER BY chunk_id LIMIT 32) q
        |  CROSS JOIN e cdf),
        |s AS (
        |  SELECT query_id, corpus_id, p.dot / (nq.nrm * nc.nrm) AS cosine
        |  FROM p
        |  JOIN n nq ON p.query_id = nq.chunk_id
        |  JOIN n nc ON p.corpus_id = nc.chunk_id)
        |SELECT * FROM (
        |  SELECT query_id, corpus_id, cosine,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, corpus_id ASC) AS BIGINT) AS rank
        |  FROM s)
        |WHERE rank <= 3 ORDER BY ALL NULLS FIRST""".stripMargin,

    // BM25 replayed exactly: same tokenization as q55, df from the
    // candidate set, one-row corpus stats, and the identical double
    // expression tree (constants combined IN the engine — `1.2 + 1.0`
    // mirrors Spark's lit(k1) + lit(1.0)); per-term contributions sum in
    // DECIMAL(38,18) on both sides.
    "q99_bm25_retrieval" -> bm25Sql,
    "q169_prf_expansion" -> prfSql,

    // RRF hybrid: q99's BM25 replay (k=20) + q89's md5-embedding cosine
    // replay over whole docs (k=20), contributions 1/(60+rank) summed in
    // DECIMAL(38,18) — both rank lists and the fuse are replayed exactly.
    "q100_hybrid_rrf" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id),
        |post AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
        |         FROM tok GROUP BY term, doc_id),
        |stats AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(CAST(sum(dl) AS HUGEINT) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
        |  FROM dl),
        |q AS (
        |  SELECT doc_id AS query_id,
        |    unnest(list_distinct(string_split_regex(trim(lower(text)), '\s+'))) AS term
        |  FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 8)),
        |cand AS (
        |  SELECT q.query_id, q.term, p.doc_id, p.tf, d.dl
        |  FROM q JOIN post p USING (term) JOIN dl d USING (doc_id)),
        |dfreq AS (
        |  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |  FROM cand GROUP BY term),
        |scored AS (
        |  SELECT query_id, doc_id,
        |    CAST(CAST(sum(CAST(
        |      ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
        |       (CAST(df AS DOUBLE) + 0.5))
        |      * ((CAST(tf AS DOUBLE) * (1.2 + 1.0)) /
        |         (CAST(tf AS DOUBLE) +
        |          1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / avgdl)))
        |      AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS DOUBLE) AS score
        |  FROM cand JOIN dfreq USING (term), stats
        |  WHERE CAST(df AS DOUBLE) <= 1.0 * CAST(n_docs AS DOUBLE)
        |  GROUP BY query_id, doc_id),
        |bm AS (
        |  SELECT query_id, doc_id,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY score DESC, doc_id) AS posicao
        |  FROM scored QUALIFY posicao <= 20),
        |e AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(0, 3),
        |      d -> CAST(CAST(('0x' || substring(md5(
        |        CAST(d AS VARCHAR) || ':' || text), 1, 8)) AS BIGINT)
        |        AS DOUBLE) / 4294967296.0) AS emb
        |  FROM documents),
        |n AS (
        |  SELECT doc_id, sqrt(CAST(list_aggregate(list_transform(emb,
        |    x -> CAST(x * x AS DECIMAL(38,18))), 'sum') AS DOUBLE)) AS nrm
        |  FROM e),
        |p AS (
        |  SELECT qe.doc_id AS query_id, ce.doc_id AS corpus_id,
        |    CAST(list_aggregate(list_transform(list_zip(qe.emb, ce.emb),
        |      z -> CAST(z[1] * z[2] AS DECIMAL(38,18))), 'sum') AS DOUBLE) AS dot
        |  FROM (SELECT * FROM e ORDER BY doc_id LIMIT 8) qe
        |  CROSS JOIN e ce),
        |s AS (
        |  SELECT query_id, corpus_id, p.dot / (nq.nrm * nc.nrm) AS cosine
        |  FROM p
        |  JOIN n nq ON p.query_id = nq.doc_id
        |  JOIN n nc ON p.corpus_id = nc.doc_id),
        |kn AS (
        |  SELECT query_id, corpus_id AS doc_id,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY cosine DESC, corpus_id) AS posicao
        |  FROM s QUALIFY posicao <= 20),
        |contrib AS (
        |  SELECT query_id, doc_id,
        |    CAST(1.0 / (60.0 + CAST(posicao AS DOUBLE)) AS DECIMAL(38,18)) AS c
        |  FROM bm
        |  UNION ALL
        |  SELECT query_id, doc_id,
        |    CAST(1.0 / (60.0 + CAST(posicao AS DOUBLE)) AS DECIMAL(38,18)) AS c
        |  FROM kn),
        |f AS (
        |  SELECT query_id, doc_id,
        |    CAST(CAST(sum(c) AS DECIMAL(38,18)) AS DOUBLE) AS score
        |  FROM contrib GROUP BY query_id, doc_id)
        |SELECT query_id, doc_id, score,
        |  CAST(row_number() OVER (PARTITION BY query_id
        |                          ORDER BY score DESC, doc_id) AS INT) AS posicao
        |FROM f
        |QUALIFY posicao <= 5
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // lnc.ltc replay: tf-only doc norms, query-side log-free idf N/df,
    // DECIMAL-accumulated dot products and norms, IEEE sqrt/÷ exact
    "q131_tfidf_retrieval" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |post AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
        |         FROM tok GROUP BY term, doc_id),
        |dnorm AS (
        |  SELECT doc_id,
        |    sqrt(CAST(CAST(sum(CAST(CAST(tf AS DOUBLE) * CAST(tf AS DOUBLE)
        |      AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS DOUBLE)) AS dnorm
        |  FROM post GROUP BY doc_id),
        |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |qpost AS (
        |  SELECT query_id, term, CAST(count(*) AS BIGINT) AS qtf
        |  FROM (SELECT doc_id AS query_id,
        |          unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |        FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 8))
        |  GROUP BY query_id, term),
        |dfreq AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM post
        |  WHERE term IN (SELECT DISTINCT term FROM qpost) GROUP BY term),
        |qw AS (
        |  SELECT query_id, term,
        |    CAST(qtf AS DOUBLE) * (CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) AS wq
        |  FROM qpost JOIN dfreq USING (term), stats
        |  WHERE CAST(df AS DOUBLE) <= 1.0 * CAST(n_docs AS DOUBLE)),
        |qnorm AS (
        |  SELECT query_id,
        |    sqrt(CAST(CAST(sum(CAST(wq * wq AS DECIMAL(38,12)))
        |      AS DECIMAL(38,12)) AS DOUBLE)) AS qnorm
        |  FROM qw GROUP BY query_id),
        |scored AS (
        |  SELECT query_id, p.doc_id,
        |    CAST(CAST(sum(CAST(CAST(p.tf AS DOUBLE) * wq AS DECIMAL(38,18)))
        |      AS DECIMAL(38,18)) AS DOUBLE) / (qnorm * dnorm) AS score
        |  FROM qw JOIN post p USING (term) JOIN dnorm d ON p.doc_id = d.doc_id
        |       JOIN qnorm USING (query_id)
        |  GROUP BY query_id, p.doc_id, qnorm, dnorm)
        |SELECT query_id, doc_id, score,
        |  CAST(row_number() OVER (PARTITION BY query_id
        |                          ORDER BY score DESC, doc_id) AS INT) AS posicao
        |FROM scored
        |QUALIFY posicao <= 5
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // the persisted-index roundtrip is score-identical — q99's replay
    "q136_bm25_indexed" -> bm25Sql,

    // q99's replay nested as a CTE (ORDER BY stripped), exact-duplicate
    // relevance, integer-ratio eval arithmetic
    "q141_retrieval_eval" ->
      s"""WITH ranked AS (
${bm25Sql.replace("ORDER BY ALL NULLS FIRST", "")}),
rel AS (
  SELECT q.doc_id AS query_id, d.doc_id
  FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 8) q
  JOIN documents d ON d.text = q.text),
relcount AS (
  SELECT query_id, CAST(count(*) AS BIGINT) AS n_relevantes
  FROM rel GROUP BY query_id),
hits AS (
  SELECT r.query_id, r.doc_id, r.posicao,
    CASE WHEN rel.doc_id IS NOT NULL THEN 1 ELSE 0 END AS h
  FROM ranked r LEFT JOIN rel
    ON r.query_id = rel.query_id AND r.doc_id = rel.doc_id
  WHERE r.posicao <= 5),
per AS (
  SELECT query_id,
    CAST(sum(h) AS BIGINT) AS n_acertos,
    min(CASE WHEN h = 1 THEN posicao END) AS first_rel
  FROM hits GROUP BY query_id)
SELECT rc.query_id, rc.n_relevantes,
  CAST(coalesce(p.n_acertos, 0) AS BIGINT) AS n_acertos,
  CAST(CAST(coalesce(p.n_acertos, 0) AS BIGINT) AS DOUBLE) /
    CAST(rc.n_relevantes AS DOUBLE) AS recall,
  coalesce(1.0 / CAST(p.first_rel AS DOUBLE), 0.0) AS rr
FROM relcount rc LEFT JOIN per p USING (query_id)
ORDER BY ALL NULLS FIRST""",

    // Same ranked/rel CTEs as q141; replays the cumulative-hit window
    // and the rank-ordered precision fold.
    "q211_avg_precision" ->
      s"""WITH ranked AS (
${bm25Sql.replace("ORDER BY ALL NULLS FIRST", "")}),
rel AS (
  SELECT q.doc_id AS query_id, d.doc_id
  FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 8) q
  JOIN documents d ON d.text = q.text),
relcount AS (
  SELECT query_id, CAST(count(*) AS BIGINT) AS n_relevantes
  FROM rel GROUP BY query_id),
hits AS (
  SELECT r.query_id, r.posicao,
    CASE WHEN rel.doc_id IS NOT NULL THEN 1 ELSE 0 END AS h
  FROM ranked r LEFT JOIN rel
    ON r.query_id = rel.query_id AND r.doc_id = rel.doc_id
  WHERE r.posicao <= 5),
ch AS (
  SELECT query_id, posicao, h,
    CAST(sum(h) OVER (PARTITION BY query_id ORDER BY posicao
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c
  FROM hits),
ap AS (
  SELECT query_id, CAST(count(*) AS BIGINT) AS n_acertos,
    0.0 + list_reduce(
      list(CAST(c AS DOUBLE) / CAST(posicao AS DOUBLE) ORDER BY posicao),
      (acc, x) -> acc + x) AS apsum
  FROM ch WHERE h = 1 GROUP BY query_id)
SELECT rc.query_id, rc.n_relevantes,
  CAST(coalesce(a.n_acertos, 0) AS BIGINT) AS n_acertos,
  coalesce(a.apsum, 0.0) / CAST(rc.n_relevantes AS DOUBLE) AS ap
FROM relcount rc LEFT JOIN ap a USING (query_id)
ORDER BY ALL NULLS FIRST""",

    // Replays positional postings (lateral generate_series = the
    // posexplode), the phrase-term fan-out, candidate starts and both
    // exact counts.
    "q156_phrase_search" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents),
        |post AS (
        |  SELECT doc_id, tk[g.i] AS term, g.i - 1 AS pos
        |  FROM t, LATERAL unnest(generate_series(1, len(tk))) g(i)
        |  WHERE tk[g.i] <> ''),
        |phl AS (
        |  SELECT frase, string_split_regex(trim(lower(frase)), '\s+') AS ptk
        |  FROM (VALUES ('hash join'), ('table scan'), ('sort merge'),
        |        ('the row')) p(frase)),
        |ph AS (
        |  SELECT frase, ptk[g.i] AS term, g.i - 1 AS i
        |  FROM phl, LATERAL unnest(generate_series(1, len(ptk))) g(i)
        |  WHERE ptk[g.i] <> ''),
        |pl AS (SELECT frase, CAST(count(*) AS BIGINT) AS len
        |       FROM ph GROUP BY 1),
        |cand AS (
        |  SELECT post.doc_id, ph.frase, post.pos - ph.i AS s, pl.len
        |  FROM post JOIN ph ON post.term = ph.term JOIN pl USING (frase)),
        |hit AS (
        |  SELECT doc_id, frase
        |  FROM cand GROUP BY doc_id, frase, s, len
        |  HAVING count(*) = len AND s >= 0)
        |SELECT frase, doc_id, CAST(count(*) AS BIGINT) AS ocorrencias
        |FROM hit GROUP BY 1, 2
        |ORDER BY ALL NULLS FIRST""".stripMargin,
  )
}
