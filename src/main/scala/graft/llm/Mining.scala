package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Margin-based parallel-corpus mining (Artetxe & Schwenk, ACL 2019 —
  * "Margin-based Parallel Corpus Mining with Multilingual Sentence
  * Embeddings"; the LASER/CCMatrix recipe): score a candidate pair
  * (x, y) not by raw cosine but by the RATIO of the pair's cosine to
  * the average cosine of each side's k nearest neighbors,
  *
  *   margin(x,y) = cos(x,y) / (avgNN_k(x)/2 + avgNN_k(y)/2)
  *
  * — a hubness correction: a vector whose neighborhood is globally
  * dense (high average similarity to everything) must beat its own
  * neighborhood, not just an absolute threshold. The published
  * harvesting rule is `max` strategy: keep x's argmax-margin y when the
  * margin clears the threshold.
  *
  * This is the missing TRAINING-PAIR MINER next to [[Similarity
  * .hardNegatives]] (which mines negatives): bitext for translation
  * models, near-pairs for distillation, cross-corpus alignment.
  *
  * Shape: both directions' k-NN tables come from one A×B scored frame
  * (broadcast the designated query side — the corpus side never
  * shuffles), per-side neighborhood averages are DECIMAL-folded
  * (order-independent: Σ of top-k cosines in DECIMAL(38,18), one IEEE
  * division at the edge), and the margin is one division of
  * deterministic doubles. At scale the scored frame composes with the
  * JL screen / IVF shortlist exactly like [[Similarity.topKExactScreened]]
  * — the contract (exact cosine, decimal-folded averages,
  * deterministic argmax ties) is this operator's.
  *
  * Output: one row per x with its best y — (id_a, id_b, cosine,
  * margin), margin ≥ threshold, ties on (margin, cosine) broken by
  * ascending id_b.
  */
object Mining {

  def marginMine(
      sideA: DataFrame, sideB: DataFrame, idCol: String, vecCol: String,
      k: Int, threshold: Double): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val a = broadcast(sideA.select(
      col(idCol).as("id_a"), col(vecCol).as("__av"),
      Similarity.l2Norm(col(vecCol)).as("__an")))
    val scored = CacheScope.persistTracked(
      Spread(sideB)
        .select(col(idCol).as("id_b"), col(vecCol).as("__bv"),
          Similarity.l2Norm(col(vecCol)).as("__bn"))
        .join(a)
        .select(col("id_a"), col("id_b"),
          (Similarity.dotDecimal(col("__av"), col("__bv")).cast("double") /
            (col("__an") * col("__bn"))).as("cos")))
    // per-side k-NN average: rank within side, DECIMAL-fold the top-k
    def nnAvg(side: String): DataFrame = {
      val w = Window.partitionBy(side)
        .orderBy(col("cos").desc,
          col(if (side == "id_a") "id_b" else "id_a").asc)
      scored.withColumn("__r", row_number().over(w))
        .filter(col("__r") <= k)
        .groupBy(side)
        .agg((sum(col("cos").cast("decimal(38,18)")).cast("double") /
          count(lit(1L)).cast("double")).as(s"__nn_$side"))
    }
    val withNn = scored
      .join(nnAvg("id_a"), "id_a")
      .join(nnAvg("id_b"), "id_b")
      .withColumn("margin",
        col("cos") / (col("__nn_id_a") / 2.0 + col("__nn_id_b") / 2.0))
    val wBest = Window.partitionBy("id_a")
      .orderBy(col("margin").desc, col("cos").desc, col("id_b").asc)
    withNn
      .withColumn("__b", row_number().over(wBest))
      .filter(col("__b") === 1 && col("margin") >= threshold)
      .select(col("id_a"), col("id_b"),
        col("cos").as("cosine"), col("margin"))
  }
}
