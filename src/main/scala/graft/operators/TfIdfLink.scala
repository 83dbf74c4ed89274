package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.{CacheScope, Dedup, TextAnalysis}

/** TF-IDF token-set cosine name matching — the TFIDF baseline of Cohen,
  * Ravikumar & Fienberg (IIWeb 2003, "A Comparison of String Distance
  * Metrics for Name-Matching Tasks"): score a name pair by the cosine of
  * their idf-weighted TOKEN SETS. The linkage family's missing axis:
  * edit distance (rows 159/199/232) sees "joao silva" vs "silva joao"
  * as 10 edits apart; token-set cosine scores them 1.0 — word-order
  * permutations, dropped middle tokens and extra titles are exactly the
  * name noise TF-IDF weighting absorbs (a rare surname dominates the
  * score, a ubiquitous "da"/"ltd" contributes almost nothing).
  *
  * SET semantics by contract (names essentially never repeat a token;
  * tf is identically 1) and the LOG-FREE idf w_t = N/df_t — one IEEE
  * division of exact BIGINTs, the row-148 discipline that keeps the
  * oracle bit-exact where `ln` would smuggle in libm divergence. Norms
  * and shared-weight sums accumulate w² terms as DECIMAL(38,12) (order-
  * free exact), with ONE double division producing the cosine.
  *
  * Shape: df is a combinable aggregation; candidates come from the
  * shared-token inverted index through [[Dedup.tiledPairs]] (a
  * ubiquitous token cannot create one quadratic task — and with N/df
  * weighting it also cannot create a high score, so `maxDfFraction`
  * prunes candidates the scorer would discard anyway); per-pair scoring
  * is one combinable aggregation over the shared-token rows.
  *
  * Output: (id_a < id_b, tokens_comuns, cosseno ≥ threshold).
  */
object TfIdfLink {

  def tfidfNamePairs(
      df: DataFrame, idCol: String, nameCol: String,
      threshold: Double, maxDfFraction: Double = 0.5,
      maxBlock: Int = Dedup.AdaptiveBlock): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"need threshold in (0,1], got $threshold")
    val d = "decimal(38,12)"
    val toks = CacheScope.persistTracked(
      df.select(col(idCol).as("__id"),
          explode(array_distinct(
            TextAnalysis.tokens(col(nameCol)))).as("__t"))
        .filter(col("__t") =!= ""))
    val n = toks.select("__id").distinct().count()
    val weights = CacheScope.persistTracked(
      toks.groupBy("__t").agg(count(lit(1L)).as("__df"))
        .filter(col("__df") <= (lit(n) * maxDfFraction))
        .withColumn("__w",
          lit(n).cast("double") / col("__df").cast("double")))
    val weighted = toks.join(weights, "__t")
    val norms = weighted.groupBy("__id")
      .agg(sqrt(sum((col("__w") * col("__w")).cast(d)).cast("double"))
        .as("__nrm"))
    val keyed = weighted.join(norms, "__id")
      .select(col("__id"), col("__t").as("__block"), col("__nrm"))
    val shared = Dedup.tiledPairs(keyed, Seq("__nrm"), maxBlock)
      .join(weights.select(col("__t").as("__block"), col("__w")),
        "__block")
      .select(
        least(col("id_a"), col("id_b")).as("__ida"),
        greatest(col("id_a"), col("id_b")).as("__idb"),
        // tile orientation may flip between a pair's shared-token rows;
        // the cosine needs only the PRODUCT of the two norms, which is
        // symmetric — value-normalize so the per-pair max is stable
        least(col("__nrm_a"), col("__nrm_b")).as("__n1"),
        greatest(col("__nrm_a"), col("__nrm_b")).as("__n2"),
        (col("__w") * col("__w")).cast(d).as("__w2"))
      .groupBy("__ida", "__idb")
      .agg(count(lit(1L)).as("tokens_comuns"),
        max(col("__n1")).as("__na"), max(col("__n2")).as("__nb"),
        sum(col("__w2")).cast(d).as("__s"))
    shared
      .withColumn("cosseno",
        col("__s").cast("double") / (col("__na") * col("__nb")))
      .filter(col("cosseno") >= threshold)
      .select(col("__ida").as("id_a"), col("__idb").as("id_b"),
        col("tokens_comuns"), col("cosseno"))
  }
}
