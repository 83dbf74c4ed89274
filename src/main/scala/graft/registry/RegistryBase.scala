package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{Dbf, HtmlForm, Listing, ParquetSink, ReportCsv, Staging, Tables}
import graft.operators._

/** Shared plumbing for the registry shards: the deterministic oracle ordering,
  * the scratch-dir helper, and the long-form oracle SQL builders.
  */
private[graft] trait RegistryBase {


  /** Deterministic total order for oracle compare: sort by every output
    * column (asc, nulls first — matches DuckDB `ORDER BY ALL NULLS FIRST`).
    * The testdata does not guarantee key uniqueness, so partial-key sorts
    * are not reproducible across engines.
    */
  private[graft] def ordered(df: DataFrame): DataFrame =
    df.orderBy(df.columns.map(c => col(c).asc_nulls_first): _*)

  /** Scratch dir for the index/layout queries (q130/q136/q178) that must
    * WRITE before they read. Deleted recursively on JVM exit — the read
    * is lazy (materialized by the caller after the query function
    * returns), so an eager post-read cleanup isn't possible; the exit
    * hook keeps repeated bench invocations from accreting parquet
    * versions in /tmp.
    */
  private[graft] def scratchDir(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      try {
        Files.walk(dir).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
      } catch { case _: Throwable => () } // best-effort: scratch only
    }))
    dir.toString
  }


  /** MMR unrolled: q29's brute-force CTEs produce the candidate pool,
    * then one (max-sim, argmax) CTE pair per greedy round — same IEEE op
    * order as the engine (0.7·rel − (1.0 − 0.7)·ms).
    */
  private[graft] def mmrOracle(k: Int): String = {
    val pairCos =
      """CAST(list_aggregate(list_transform(list_zip(ec.embedding, es.embedding),
        |      z -> CAST(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) AS DECIMAL(38,18))),
        |      'sum') AS DOUBLE) / (nc.nrm * ns.nrm)""".stripMargin
    val base = """WITH n AS (
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
      |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8) q
      |  CROSS JOIN embeddings c),
      |cand AS (
      |  SELECT query_id, corpus_id, cosine AS rel FROM (
      |    SELECT query_id, corpus_id, p.dot / (nq.nrm * nc.nrm) AS cosine,
      |      row_number() OVER (PARTITION BY query_id
      |        ORDER BY p.dot / (nq.nrm * nc.nrm) DESC, corpus_id ASC) AS r
      |    FROM p JOIN n nq ON p.query_id = nq.vec_id
      |           JOIN n nc ON p.corpus_id = nc.vec_id)
      |  WHERE r <= 20),
      |su1 AS (
      |  SELECT query_id, corpus_id, 1 AS ordem FROM (
      |    SELECT query_id, corpus_id,
      |      row_number() OVER (PARTITION BY query_id
      |        ORDER BY rel DESC, corpus_id ASC) AS r
      |    FROM cand) WHERE r = 1)""".stripMargin
    val rounds = (2 to k).map { t =>
      s""",
         |ms$t AS (
         |  SELECT c.query_id, c.corpus_id, c.rel,
         |    max($pairCos) AS ms
         |  FROM cand c
         |  JOIN su${t - 1} s ON c.query_id = s.query_id
         |  JOIN embeddings ec ON c.corpus_id = ec.vec_id
         |  JOIN embeddings es ON s.corpus_id = es.vec_id
         |  JOIN n nc ON c.corpus_id = nc.vec_id
         |  JOIN n ns ON s.corpus_id = ns.vec_id
         |  WHERE NOT EXISTS (SELECT 1 FROM su${t - 1} x
         |    WHERE x.query_id = c.query_id AND x.corpus_id = c.corpus_id)
         |  GROUP BY c.query_id, c.corpus_id, c.rel),
         |su$t AS (
         |  SELECT * FROM su${t - 1}
         |  UNION ALL
         |  SELECT query_id, corpus_id, $t FROM (
         |    SELECT query_id, corpus_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY (0.7 * rel - (1.0 - 0.7) * ms) DESC,
         |                 corpus_id ASC) AS r
         |    FROM ms$t) WHERE r = 1)""".stripMargin
    }.mkString
    base + rounds +
      s"""
         |SELECT query_id, corpus_id, CAST(ordem AS INT) AS ordem
         |FROM su$k ORDER BY ALL NULLS FIRST""".stripMargin
  }

  /** PageRank unrolled: iteration k = a dangling scalar, a per-dest
    * DECIMAL contribution sum, the damped update — same IEEE op order as
    * the engine expression.
    */
  /** One doubled-rank Pearson replay per pair, UNION ALL'd — mirrors
    * `Stats.spearmanCorr` token for token at the IEEE edge.
    */
  private[graft] def spearmanOracle(pairs: Seq[(String, String)]): String = {
    val blocks = pairs.map { case (xc, yc) =>
      s"""SELECT * FROM (
         |WITH b AS (SELECT CAST($xc AS DOUBLE) AS x, CAST($yc AS DOUBLE)
         |    AS y FROM lineitem
         |  WHERE $xc IS NOT NULL AND $yc IS NOT NULL),
         |cx AS (SELECT x AS v, CAST(count(*) AS BIGINT) AS cnt FROM b
         |  GROUP BY 1),
         |rx AS (SELECT v, 2 * COALESCE(sum(cnt) OVER (ORDER BY v
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    + cnt + 1 AS r2 FROM cx),
         |cy AS (SELECT y AS v, CAST(count(*) AS BIGINT) AS cnt FROM b
         |  GROUP BY 1),
         |ry AS (SELECT v, 2 * COALESCE(sum(cnt) OVER (ORDER BY v
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    + cnt + 1 AS r2 FROM cy),
         |j AS (SELECT CAST(rx.r2 AS HUGEINT) AS rxv,
         |    CAST(ry.r2 AS HUGEINT) AS ryv
         |  FROM b JOIN rx ON b.x = rx.v JOIN ry ON b.y = ry.v),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(rxv) AS sx,
         |    sum(ryv) AS sy, sum(rxv * rxv) AS sxx, sum(ryv * ryv) AS syy,
         |    sum(rxv * ryv) AS sxy FROM j)
         |SELECT '$xc' AS coluna_x, '$yc' AS coluna_y, n,
         |  CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
         |    THEN CAST(n * sxy - sx * sy AS DOUBLE) /
         |      (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
         |       sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
         |  END AS rho
         |FROM st)""".stripMargin
    }
    blocks.mkString("", "\nUNION ALL\n", "\nORDER BY ALL NULLS FIRST")
  }

  private[graft] def pageRankOracle(iters: Int): String =
    pageRankSqlBody(
      """e AS (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT -l_suppkey AS src, l_partkey AS dst FROM lineitem
        |    UNION ALL
        |    SELECT l_partkey, 1000000000 + o_custkey
        |    FROM lineitem JOIN orders ON l_orderkey = o_orderkey))""".stripMargin,
      iters) +
      s"""
         |SELECT n AS vertice, r AS rank FROM r$iters
         |ORDER BY ALL NULLS FIRST""".stripMargin

  /** The damped-iteration replay shared by every PageRank-family
    * oracle: caller supplies the CTE chain whose LAST member is
    * `e(src, dst)`, gets back `WITH <e>, ..., r<iters>` ready for a
    * final SELECT over `r<iters>(n, outd, r)`.
    */
  private[graft] def pageRankSqlBody(edgesCte: String, iters: Int): String = {
    val base = "WITH " + edgesCte + """,
      |v AS (SELECT DISTINCT n FROM
      |  (SELECT src AS n FROM e UNION ALL SELECT dst FROM e)),
      |deg AS (SELECT src AS n, CAST(count(*) AS BIGINT) AS outd
      |        FROM e GROUP BY src),
      |base AS (
      |  SELECT v.n, coalesce(deg.outd, 0) AS outd
      |  FROM v LEFT JOIN deg USING (n)),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM base),
      |r0 AS (SELECT n, outd, 1.0 / n_nodes AS r FROM base, nn)""".stripMargin
    val rounds = (1 to iters).map { k =>
      s""",
         |d$k AS (
         |  SELECT coalesce(CAST(sum(CAST(r AS DECIMAL(38,18)))
         |    AS DECIMAL(38,18)), CAST(0 AS DECIMAL(38,18))) AS dang
         |  FROM r${k - 1} WHERE outd = 0),
         |c$k AS (
         |  SELECT e.dst AS n,
         |    CAST(sum(CAST(p.r / CAST(p.outd AS DOUBLE) AS DECIMAL(38,18)))
         |      AS DECIMAL(38,18)) AS cin
         |  FROM r${k - 1} p JOIN e ON p.n = e.src
         |  WHERE p.outd > 0 GROUP BY e.dst),
         |r$k AS (
         |  SELECT base.n, base.outd,
         |    ((1.0 - 0.85) / n_nodes) + 0.85 *
         |      (CAST(coalesce(cin, CAST(0 AS DECIMAL(38,18))) AS DOUBLE) +
         |       CAST(dang AS DOUBLE) / n_nodes) AS r
         |  FROM base LEFT JOIN c$k USING (n), d$k, nn)""".stripMargin
    }.mkString
    base + rounds
  }

  // q99's BM25 replay, shared with q136 (the persisted postings
  // index scores bit-identically to tokenizing from scratch)
  private[graft] lazy val bm25Sql: String =
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
        |  GROUP BY query_id, doc_id)
        |SELECT query_id, doc_id, score,
        |  CAST(row_number() OVER (PARTITION BY query_id
        |                          ORDER BY score DESC, doc_id) AS INT) AS posicao
        |FROM scored
        |QUALIFY posicao <= 5
        |ORDER BY ALL NULLS FIRST""".stripMargin

  // q169's two-pass PRF replay: q99's scoring CTEs, the feedback-term
  // mining (top-3 by summed tf, term-ASC ties), the distinct term-union
  // expansion, and the second scoring pass
  private[graft] lazy val prfSql: String =
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
        |cand1 AS (
        |  SELECT q.query_id, q.term, p.doc_id, p.tf, d.dl
        |  FROM q JOIN post p USING (term) JOIN dl d USING (doc_id)),
        |df1 AS (
        |  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |  FROM cand1 GROUP BY term),
        |sc1 AS (
        |  SELECT query_id, doc_id,
        |    CAST(CAST(sum(CAST(
        |      ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
        |       (CAST(df AS DOUBLE) + 0.5))
        |      * ((CAST(tf AS DOUBLE) * (1.2 + 1.0)) /
        |         (CAST(tf AS DOUBLE) +
        |          1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / avgdl)))
        |      AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS DOUBLE) AS score
        |  FROM cand1 JOIN df1 USING (term), stats
        |  WHERE CAST(df AS DOUBLE) <= 1.0 * CAST(n_docs AS DOUBLE)
        |  GROUP BY query_id, doc_id),
        |r1 AS (
        |  SELECT query_id, doc_id FROM (
        |    SELECT query_id, doc_id,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY score DESC, doc_id) AS r
        |    FROM sc1) WHERE r <= 5),
        |fb AS (
        |  SELECT query_id, term, CAST(sum(tf) AS BIGINT) AS w
        |  FROM r1 JOIN post USING (doc_id) GROUP BY 1, 2),
        |ft AS (
        |  SELECT query_id, term FROM (
        |    SELECT query_id, term,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY w DESC, term) AS r
        |    FROM fb) WHERE r <= 3),
        |q2 AS (
        |  SELECT DISTINCT query_id, term FROM (
        |    SELECT query_id, term FROM q
        |    UNION ALL SELECT query_id, term FROM ft)),
        |cand2 AS (
        |  SELECT q2.query_id, q2.term, p.doc_id, p.tf, d.dl
        |  FROM q2 JOIN post p USING (term) JOIN dl d USING (doc_id)),
        |df2 AS (
        |  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |  FROM cand2 GROUP BY term),
        |sc2 AS (
        |  SELECT query_id, doc_id,
        |    CAST(CAST(sum(CAST(
        |      ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
        |       (CAST(df AS DOUBLE) + 0.5))
        |      * ((CAST(tf AS DOUBLE) * (1.2 + 1.0)) /
        |         (CAST(tf AS DOUBLE) +
        |          1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / avgdl)))
        |      AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS DOUBLE) AS score
        |  FROM cand2 JOIN df2 USING (term), stats
        |  WHERE CAST(df AS DOUBLE) <= 1.0 * CAST(n_docs AS DOUBLE)
        |  GROUP BY query_id, doc_id)
        |SELECT query_id, doc_id, score,
        |  CAST(row_number() OVER (PARTITION BY query_id
        |                          ORDER BY score DESC, doc_id) AS INT) AS posicao
        |FROM sc2
        |QUALIFY posicao <= 5
        |ORDER BY ALL NULLS FIRST""".stripMargin

  private[graft] def calibrationOracle(buckets: Int, epochs: Int): String =
    perceptronCtes(buckets, epochs) +
      s""",
         |s AS (
         |  SELECT doc_id, CAST(sum(c * coalesce(w, 0)) AS BIGINT) AS m
         |  FROM fc LEFT JOIN w$epochs USING (bucket) GROUP BY doc_id),
         |lbl AS (
         |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y
         |  FROM documents),
         |sm AS (
         |  SELECT lbl.doc_id, CAST(coalesce(s.m, 0) AS BIGINT) AS m, y
         |  FROM lbl LEFT JOIN s USING (doc_id))
         |SELECT
         |  CAST(CASE WHEN m > 0 THEN 1 WHEN m < 0 THEN -1 ELSE 0 END AS INT)
         |    AS sinal,
         |  CAST(CASE WHEN m = 0 THEN 0
         |            ELSE length(CAST(abs(m) AS VARCHAR)) END AS INT) AS ordem,
         |  CAST(CASE WHEN m = 0 THEN 0
         |            ELSE CAST(substring(CAST(abs(m) AS VARCHAR), 1, 1) AS INT)
         |       END AS INT) AS primeiro_digito,
         |  CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         |  CAST(CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS DOUBLE) / CAST(CAST(count(*) AS BIGINT) AS DOUBLE) AS taxa_pos,
         |  CAST(CAST(sum(CAST(m AS DECIMAL(38,0))) AS DECIMAL(38,0))
         |    AS DOUBLE) / CAST(CAST(count(*) AS BIGINT) AS DOUBLE)
         |    AS margem_media
         |FROM sm GROUP BY sinal, ordem, primeiro_digito
         |ORDER BY ALL NULLS FIRST""".stripMargin

  private[graft] lazy val minhashEstimateSql: String = {
      val mins = (0 until 20).map(s =>
        s"min((h1 + $s*h2) % 4294967291) AS s$s").mkString(",\n|    ")
      val bands = (0 until 5).map { b =>
        val cols = (0 until 4).map(r => s"s${b * 4 + r}").mkString(", ")
        if (b == 0) s"SELECT id, 0 AS band, concat_ws(',', $cols) AS bhash FROM sigs"
        else s"UNION ALL SELECT id, $b, concat_ws(',', $cols) FROM sigs"
      }.mkString("\n|  ")
      val matches = (0 until 20)
        .map(s => s"(CASE WHEN a.s$s = b.s$s THEN 1 ELSE 0 END)")
        .mkString(" +\n|      ")
      s"""WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    array_to_string((string_split_regex(trim(lower(text)), '\\s+'))[2:], ' ')
        |  FROM documents WHERE doc_id % 5 = 0),
        |t AS (
        |  SELECT doc_id AS id, string_split_regex(trim(lower(text)), '\\s+') AS tk
        |  FROM all_docs),
        |k AS (
        |  SELECT id,
        |    list_distinct([array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk) - 1)]) AS sh
        |  FROM t WHERE len(tk) >= 3),
        |shrows AS (
        |  SELECT id, CAST(('0x' || substring(m, 1, 8)) AS BIGINT) AS h1,
        |             CAST(('0x' || substring(m, 9, 8)) AS BIGINT) AS h2
        |  FROM (SELECT id, md5(unnest(sh)) AS m FROM k)),
        |sigs AS (
        |  SELECT id,
        |    $mins
        |  FROM shrows GROUP BY id),
        |buckets AS (
        |  $bands),
        |pairs AS (
        |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |  FROM buckets a JOIN buckets b
        |    ON a.band = b.band AND a.bhash = b.bhash AND a.id < b.id)
        |SELECT id_a, id_b, jaccard_est FROM (
        |  SELECT p.id_a, p.id_b,
        |    CAST($matches AS DOUBLE) / 20.0 AS jaccard_est
        |  FROM pairs p JOIN sigs a ON p.id_a = a.id JOIN sigs b ON p.id_b = b.id)
        |WHERE jaccard_est >= 0.5
        |ORDER BY ALL NULLS FIRST""".stripMargin
  }

  private[graft] lazy val oracleSqlRest: Map[String, String] = Map(

    "q126_vocab_coverage" ->
      """WITH t AS (
        |  SELECT doc_id, lang, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents),
        |vocab AS (
        |  SELECT DISTINCT unnest(tk) AS w FROM t WHERE lang = 'en'),
        |words AS (
        |  SELECT doc_id, unnest(tk) AS w FROM t WHERE lang <> 'en'),
        |m AS (
        |  SELECT f.doc_id, f.w, (v.w IS NOT NULL) AS dentro
        |  FROM (SELECT doc_id, w FROM words WHERE w <> '') f
        |  LEFT JOIN (SELECT w FROM vocab WHERE w <> '') v USING (w)),
        |s AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |    CAST(count(*) FILTER (NOT dentro) AS BIGINT) AS n_oov,
        |    CAST(count(DISTINCT w) AS BIGINT) AS n_tipos,
        |    CAST(count(DISTINCT w) FILTER (NOT dentro) AS BIGINT)
        |      AS n_tipos_oov
        |  FROM m GROUP BY doc_id)
        |SELECT d.doc_id,
        |  COALESCE(s.n_tokens, 0) AS n_tokens,
        |  COALESCE(s.n_oov, 0) AS n_oov,
        |  COALESCE(s.n_tipos, 0) AS n_tipos,
        |  COALESCE(s.n_tipos_oov, 0) AS n_tipos_oov,
        |  CASE WHEN COALESCE(s.n_tokens, 0) > 0 THEN
        |    CAST(s.n_oov AS DOUBLE) / CAST(s.n_tokens AS DOUBLE)
        |  END AS taxa_oov
        |FROM (SELECT DISTINCT doc_id FROM documents WHERE lang <> 'en') d
        |LEFT JOIN s USING (doc_id)
        |ORDER BY ALL NULLS FIRST""".stripMargin,
  )

  /** q123's oracle, generated: each perceptron epoch unrolled as one CTE
    * block — margins from the previous weight table, gradient over the
    * misclassified docs, full-join accumulate. All-BIGINT algebra, so
    * the chain replays the Spark training loop bit-for-bit.
    */
  private[graft] def perceptronOracle(buckets: Int, epochs: Int): String =
    perceptronCtes(buckets, epochs) +
      s"\nSELECT bucket, w FROM w$epochs ORDER BY ALL NULLS FIRST"

  /** q125's oracle: the q123 training chain, then the trained weight
    * table applied back over the SAME feature counts — n_feats counts
    * feature INSTANCES (Σc, matching linearTextScore's per-gram count),
    * the margin is Σ c·w, approval is its sign.
    */
  private[graft] def selfTrainOracle(buckets: Int, epochs: Int): String =
    perceptronCtes(buckets, epochs) +
      s""",
         |s AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_feats,
         |    CAST(sum(c * coalesce(w, 0)) AS BIGINT) AS margem_milli
         |  FROM fc LEFT JOIN w$epochs USING (bucket) GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(coalesce(s.n_feats, 0) AS BIGINT) AS n_feats,
         |  CAST(coalesce(s.margem_milli, 0) AS BIGINT) AS margem_milli,
         |  coalesce(s.margem_milli, 0) > 0 AS aprovado
         |FROM documents d LEFT JOIN s USING (doc_id)
         |ORDER BY ALL NULLS FIRST""".stripMargin

  private[graft] def perceptronCtes(buckets: Int, epochs: Int): String = {
    val base = """WITH t AS (
      |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
      |    string_split_regex(trim(lower(text)), '\s+') AS tk
      |  FROM documents),
      |feats AS (
      |  SELECT doc_id, y, unnest(tk) AS g FROM t
      |  UNION ALL
      |  SELECT doc_id, y, unnest([array_to_string(tk[i:i+1], ' ')
      |                            for i in range(1, len(tk))]) AS g
      |  FROM t WHERE len(tk) >= 2),
      |fc AS (
      |  SELECT doc_id, y,
      |    CAST(('0x' || substring(md5(g), 1, 8)) AS BIGINT) % {B} AS bucket,
      |    count(*) AS c
      |  FROM feats WHERE g <> '' GROUP BY ALL),
      |w1 AS (SELECT bucket, CAST(sum(y * c) AS BIGINT) AS w
      |       FROM fc GROUP BY bucket)""".stripMargin
      .replace("{B}", buckets.toString)
    val chain = (2 to epochs).map { e =>
      s""",
         |m$e AS (
         |  SELECT doc_id, y, sum(c * coalesce(w, 0)) AS margin
         |  FROM fc LEFT JOIN w${e - 1} USING (bucket) GROUP BY doc_id, y),
         |g$e AS (
         |  SELECT bucket, CAST(sum(y * c) AS BIGINT) AS g FROM fc
         |  JOIN (SELECT doc_id FROM m$e WHERE y * margin <= 0) mm
         |    USING (doc_id)
         |  GROUP BY bucket),
         |w$e AS (
         |  SELECT coalesce(pw.bucket, pg.bucket) AS bucket,
         |    CAST(coalesce(pw.w, 0) + coalesce(pg.g, 0) AS BIGINT) AS w
         |  FROM w${e - 1} pw FULL JOIN g$e pg ON pw.bucket = pg.bucket)"""
        .stripMargin
    }.mkString
    base + chain
  }

  /** q95's oracle, generated: the same 16-bit min-max scale (exact
    * wide-integer product and integral floor division — HUGEINT here,
    * DECIMAL(38,0) on the Spark side, identical for any BIGINT domain)
    * and the same 32 interleave terms the Spark expression builds —
    * column j's bit i lands at position i*2+j.
    */
  private[graft] def zorderOracle: String = {
    def scaleSql(c: String, j: Int) =
      s"""CASE WHEN mx$j - mn$j <= 0 THEN 0
         |      ELSE COALESCE(CAST((CAST($c AS HUGEINT) - mn$j) * 65535
         |                    // (CAST(mx$j AS HUGEINT) - mn$j)
         |                    AS BIGINT), 0) END AS s$j""".stripMargin
    val terms = (for { i <- 0 until 16; j <- 0 until 2 }
      yield s"(((s$j >> $i) & 1) << ${i * 2 + j})").mkString(" + ")
    s"""WITH stats AS (
       |  SELECT min(o_custkey) AS mn0, max(o_custkey) AS mx0,
       |         min(o_orderkey) AS mn1, max(o_orderkey) AS mx1
       |  FROM orders),
       |s AS (
       |  SELECT o_orderkey, o_custkey,
       |    ${scaleSql("o_custkey", 0)},
       |    ${scaleSql("o_orderkey", 1)}
       |  FROM orders, stats)
       |SELECT o_orderkey, o_custkey, $terms AS zorder FROM s
       |ORDER BY ALL NULLS FIRST""".stripMargin
  }
}
