package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TopK

/** Keyword (sparse/lexical) retrieval: inverted postings + BM25-family
  * scoring — the lexical twin of the embedding pipeline (q89); production
  * RAG stacks run both and fuse the rankings. BM25 is the public
  * Robertson–Spärck Jones probabilistic weighting (k1/b saturation form).
  *
  * Scale shape: the corpus is tokenized ONCE into postings (scan-level
  * explode → one map-side-combinable aggregation); the query batch is
  * tiny and BROADCAST onto the postings scan, so candidate generation
  * never shuffles the corpus — candidates are exactly the postings of
  * the query's terms. Document frequencies for those terms come from the
  * candidate set itself (no full-vocabulary aggregation), corpus-level
  * stats (N, avg doc length) are a one-row aggregate cross-joined in,
  * and the final per-query ranking goes through the bounded-heap top-k
  * aggregate — k rows per query per partition to the exchange, nothing
  * globally sorted.
  *
  * Engine-exactness (the q65 discipline): with `logIdf = false` (default)
  * the score uses the LOG-FREE idf `(N − df + 0.5)/(df + 0.5)` — every
  * step is an IEEE correctly-rounded `+ − × /` over exact integer counts,
  * so any engine reproduces the scores bit-for-bit (`ln`'s last ulp
  * varies across libm implementations); per-term contributions sum
  * through DECIMAL(38,18), order-independent under any partitioning.
  * `logIdf = true` gives the classic `ln(1 + (N−df+0.5)/(df+0.5))` BM25+
  * idf for production ranking quality at the cost of oracle hashability.
  */
object Retrieval {

  /** Inverted postings: one row per (term, document) with the term
    * frequency and the document's token length.
    *
    * The token array and `dl` are computed in a projection BELOW the
    * explode's Generate. Putting `size(tokens)` in the same select as
    * `explode(tokens)` plants the analyzer's residual Project ABOVE the
    * Generate, where it re-runs the regex split once per emitted TOKEN
    * instead of once per document — measured ~12× slower on the postings
    * build (and the blow-up grows with document length). The split runs
    * exactly once per document here; nothing is persisted.
    */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    Spread(docs.select(col(idCol).as("doc_id"), col(textCol)))
      .select(col("doc_id"), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), size(col("__toks")).as("dl"), col("__toks"))
      .select(col("doc_id"), col("dl"), explode(col("__toks")).as("term"))
      .groupBy("term", "doc_id", "dl").agg(count(lit(1L)).as("tf"))

  /** BM25 top-k: `queries` (id + text, same column names as the corpus)
    * against the `docs` corpus. Output: (query_id, doc_id, score,
    * posicao). Queries score their DISTINCT terms (standard for short
    * queries); terms in more than `maxDfFraction` of the corpus are
    * dropped before scoring — near-stopwords carry the largest posting
    * lists and the smallest idf, so the cap bounds per-query join volume
    * at any corpus size. Queries whose terms all miss (or are all
    * capped) emit no rows.
    */
  def bm25TopK(
      docs: DataFrame, queries: DataFrame, idCol: String, textCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      maxDfFraction: Double = 0.5, logIdf: Boolean = false): DataFrame = {
    val post = CacheScope.persistTracked(postings(docs, idCol, textCol))
    // corpus stats: ONE row (count + exact-decimal-sum mean doc length),
    // cross-joined into the scoring expression
    val stats = post.groupBy("doc_id").agg(first(col("dl")).as("dl"))
      .agg(count(lit(1L)).as("n_docs"),
        (sum(col("dl").cast("decimal(38,0)")).cast("double") /
          count(lit(1L)).cast("double")).as("avgdl"))
    val qterms = queries.select(col(idCol).as("query_id"),
      explode(array_distinct(TextAnalysis.tokens(col(textCol)))).as("term"))
    // candidates = postings of query terms only; the broadcast keeps the
    // postings side pipeline-local (no shuffle of the corpus). Persisted:
    // both the df count and the scoring consume it, and CollapseProject
    // would re-run the corpus scan per consumer (SURVEY §4)
    val cand = CacheScope.persistTracked(post.join(broadcast(qterms), "term"))
    // df for the query's terms from the candidate set itself (dedupe the
    // per-query fanout first: a term shared by two queries must count its
    // documents once)
    val dfreq = cand.select("term", "doc_id").distinct()
      .groupBy("term").agg(count(lit(1L)).as("df"))
    val idf =
      if (logIdf)
        log((col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)) + lit(1.0))
      else
        (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5))
    // tf saturation: tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)); constants
    // combine IN the engine (lit(k1) + lit(1.0)) so an oracle writing
    // `1.2 + 1.0` reproduces the same double, whatever k1's rounding is
    val tfw = col("tf").cast("double") * (lit(k1) + lit(1.0)) /
      (col("tf").cast("double") + lit(k1) *
        (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / col("avgdl")))
    // dfreq is at most |distinct query terms| rows — broadcast, so the
    // candidate stream never shuffles before the per-(query, doc) sum
    val scored = cand.join(broadcast(dfreq), Seq("term")).crossJoin(broadcast(stats))
      .filter(col("df").cast("double") <=
        lit(maxDfFraction) * col("n_docs").cast("double"))
      .withColumn("__c", (idf * tfw).cast("decimal(38,18)"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("__c")).cast("double").as("score"))
    TopK.groupTopKRows(
      scored, Seq("query_id"), Seq(("score", false), ("doc_id", true)), k)
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009) —
    * the standard hybrid-retrieval combiner: each input ranking
    * contributes `1 / (k0 + rank)` for every (query, doc) it returned,
    * fused score = the sum; higher is better. Rank-based, so the
    * retrievers' raw scores never need calibrating against each other —
    * which is why production RAG stacks fuse lexical BM25 and embedding
    * ANN this way rather than mixing score scales.
    *
    * Inputs are rankings shaped (query_id, doc_id, `rankCol`) — the
    * output shape of [[bm25TopK]] and of the similarity top-k family.
    * Scale shape: a union of per-retriever rank lists (each already
    * bounded to k rows per query — tiny relative to any corpus), one
    * map-side-combinable aggregation on (query, doc), then the
    * bounded-heap top-k. Nothing here touches the corpus.
    *
    * Exactness: each contribution `1/(k0+rank)` is ONE correctly-rounded
    * IEEE division of exact integers; contributions sum through
    * DECIMAL(38,18) (order-independent under any partitioning — a double
    * sum would depend on which retriever's row arrives first), final
    * cast back to double. Any engine replays it bit-for-bit.
    */
  def rrfFuse(
      rankings: Seq[DataFrame], k: Int, k0: Int = 60,
      rankCol: String = "posicao",
      weights: Seq[Double] = Seq.empty): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(weights.isEmpty || weights.length == rankings.length,
      s"need one weight per ranking, got ${weights.length} for ${rankings.length}")
    val ws = if (weights.isEmpty) Seq.fill(rankings.length)(1.0) else weights
    val contribs = rankings.zip(ws).map { case (r, w) =>
      // weighted RRF (w_r / (k0 + rank)): one extra correctly-rounded
      // multiply, so the weighted form stays oracle-exact; w = 1.0
      // multiplies out to the classic unweighted score bit-for-bit
      r.select(col("query_id"), col("doc_id"),
        (lit(w) * (lit(1.0) / (lit(k0).cast("double") + col(rankCol).cast("double"))))
          .cast("decimal(38,18)").as("__c"))
    }.reduce(_ union _)
    val fused = contribs.groupBy("query_id", "doc_id")
      .agg(sum(col("__c")).cast("double").as("score"))
    TopK.groupTopKRows(
      fused, Seq("query_id"), Seq(("score", false), ("doc_id", true)), k)
  }
}
