package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Popularity-smoothed negative sampling — the contrastive-pair data
  * prep of word2vec (Mikolov et al. NeurIPS 2013 §2.2: unigram^(3/4))
  * and implicit-feedback recommenders (BPR and every two-tower model):
  * for each observed (user, item) positive, draw k negatives from the
  * item distribution P(i) ∝ count(i)^0.75 — popular items appear as
  * negatives more often (informative contrasts), the 3/4 power keeps
  * the tail from vanishing.
  *
  * Engine shape (the 100 TB design): the item catalog collapses to one
  * cumulative-weight table (|items| rows — catalogs are bounded; the
  * fact table never sorts), and each draw becomes a single EQUI-join
  * probe: [0, total) splits into fixed-width integer buckets, every
  * item pre-lists the buckets its weight interval overlaps (≈ 1 + its
  * share — an exploded table of ~2·|items| rows), a draw routes to
  * bucket(T) and verifies lo ≤ T < hi. No range join, no per-draw
  * binary search, no broadcast of the unbucketed catalog into a
  * nested-loop — the classic inverted-CDF lookup as one hash join.
  *
  * Determinism (oracle-replayable bit for bit, no transcendentals):
  *   - weight = cnt^0.75 computed as sqrt(sqrt(cnt³)) — cnt³ is an
  *     exact DECIMAL product and sqrt is IEEE-correctly-rounded, so
  *     both engines agree where pow(x, .75) (libm, rounding unspecified)
  *     may differ by an ulp;
  *   - weights become INTEGERS (floor(w·10⁶)), so cumulative bounds and
  *     the total are exact longs;
  *   - the draw u is the md5-low-48-bits dyadic uniform (the
  *     [[graft.operators.PrioritySample]] hash), T = floor(u·total) a
  *     long, and interval membership lo ≤ T < hi is an integer gate —
  *     no float ever decides which item a draw selects.
  *
  * Draws that hit the positive item itself are dropped (the word2vec
  * convention is resample; a deterministic fixed-draw-count engine
  * drops instead — callers wanting exactly k resample with a second
  * pass over the misses). Output: (user, item, draw j, item_negativo).
  */
object Negative {

  /** u in (0,1): (md5-low-48-bits + 0.5) / 2^48 — exact dyadic double,
    * identical in any engine with md5 (PrioritySample's hash, salted
    * with the draw index).
    */
  private def uniform(seed: Column): Column =
    (conv(substring(md5(seed.cast("binary")), 1, 12), 16, 10)
      .cast("long").cast("double") + lit(0.5)) / lit(281474976710656.0)

  def negativeSample(
      interactions: DataFrame, userCol: String, itemCol: String,
      k: Int, buckets: Int = 1024): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    require(buckets >= 1, s"need buckets >= 1, got $buckets")
    val pos = CacheScope.persistTracked(
      interactions
        .filter(col(userCol).isNotNull && col(itemCol).isNotNull)
        .select(col(userCol).as("__u"), col(itemCol).as("__i"))
        .distinct())
    // cnt^0.75 = sqrt(sqrt(cnt³)): decimal cube, two IEEE sqrts, then
    // an exact integer weight
    val wInt = floor(
      sqrt(sqrt((col("__n").cast("decimal(38,0)") * col("__n") * col("__n"))
        .cast("double"))) * lit(1000000.0)).cast("long")
    val wItems = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)).orderBy(col("__i"))
    // catalog-bounded single-partition window (the ABC/q147 contract:
    // this walks the ITEM table, never the fact table)
    val cum = pos.groupBy(col("__i")).agg(count(lit(1L)).as("__n"))
      .withColumn("__w", wInt)
      .withColumn("__hi", sum(col("__w")).over(wItems))
      .withColumn("__lo", col("__hi") - col("__w"))
      .transform(CacheScope.persistTracked)
    val total = cum.agg(max(col("__hi")).as("__total"))
    // every bucket the item's [lo, hi) overlaps — ~1 + w·B/total rows
    // per item, the routing table for the equi-join probe; the bucket
    // width is one ceil-division in INTEGER arithmetic on both sides
    val stepExpr = s"((__total + ${buckets.toLong - 1}L) div ${buckets.toLong}L)"
    val itemBuckets = cum.crossJoin(broadcast(total))
      .withColumn("__step", expr(stepExpr))
      .select(col("__i").as("__neg"), col("__lo"), col("__hi"),
        explode(sequence(
          expr("__lo div __step"),
          expr("(__hi - 1) div __step"))).as("__b"))
    val draws = pos
      .withColumn("__j", explode(sequence(lit(1), lit(k))))
      .crossJoin(broadcast(total))
      .withColumn("__t",
        floor(uniform(concat_ws(":", col("__u"), col("__i"), col("__j")))
          * col("__total").cast("double")).cast("long"))
      .withColumn("__b", expr(s"__t div $stepExpr"))
    draws.join(itemBuckets, Seq("__b"))
      .filter(col("__t") >= col("__lo") && col("__t") < col("__hi"))
      .filter(col("__neg") =!= col("__i"))
      .select(col("__u").as(userCol), col("__i").as(itemCol),
        col("__j").cast("long").as("sorteio"),
        col("__neg").as("item_negativo"))
  }
}
