package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Priority sampling for subset-sum estimation (Duffield, Lund & Thorup,
  * JACM 2007): each record draws priority p = w/u with u uniform in
  * (0,1); the per-group sample is the top-k priorities, and every
  * sampled record carries the estimator weight ŵ = max(w, τ) where τ is
  * the (k+1)-th priority. Subset-sum estimates Σŵ over any predicate are
  * unbiased, with near-optimal variance among k-sample schemes — the
  * published answer to "keep k rows per group but still answer weighted
  * totals", where row 49's stratified percent-hash keeps a RATE (not a
  * count) and row 170's PPS systematic draws WITH replacement.
  *
  * Chosen over the Efraimidis–Spirakis u^(1/w) key (the other canonical
  * weighted-without-replacement scheme) deliberately: ES needs pow/ln,
  * whose last-ulp behavior differs across libm implementations — a
  * cross-engine rank flip waiting at every boundary. Priority sampling's
  * key is ONE IEEE DIVISION of exactly-representable inputs: u =
  * (h + 0.5)/2^48 is a dyadic rational (md5 low 48 bits — the portable
  * [[graft.llm.Curation.pctHash]] discipline), w comes straight from the
  * data, and w/u is correctly rounded identically in every IEEE engine.
  * Fully deterministic: same rows in, same sample out, any partitioning.
  *
  * Shape: one scan computing the priority (codegen'd scalar work), one
  * per-group top-(k+1) — expressed as a rank window here for the exact
  * graded form; the bounded-heap aggregate (row 93) is the drop-in at
  * 100 TB — and a numGroups-row τ table broadcast back. Weights ≤ 0 or
  * null are rejected rows (the estimator is undefined for them).
  *
  * Output: (group…, id, peso, prioridade, peso_estimado), the top-k per
  * group by (priority DESC, id ASC).
  */
object PrioritySample {

  /** u in (0,1): (md5-low-48-bits + 0.5) / 2^48 — exact dyadic double,
    * identical in any engine with md5.
    */
  private def uniformHash(id: Column): Column =
    (conv(substring(md5(id.cast("string").cast("binary")), 1, 12), 16, 10)
      .cast("long").cast("double") + lit(0.5)) / lit(281474976710656.0)

  def prioritySample(
      df: DataFrame, groupCols: Seq[String], idCol: String,
      weightCol: String, k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    // an empty key list would collapse the rank window to ONE task over
    // the whole input and degrade the tau join to a cross join — the
    // global case wants a bounded-heap top-k, not this operator's shape
    require(groupCols.nonEmpty,
      "prioritySample needs at least one group column; for a global " +
        "sample pass a constant group column")
    val g = groupCols.map(col)
    val scored = df
      .filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .select(g ++ Seq(col(idCol),
        col(weightCol).cast("double").as("peso"),
        (col(weightCol).cast("double") / uniformHash(col(idCol)))
          .as("prioridade")): _*)
    val w = Window.partitionBy(g: _*)
      .orderBy(col("prioridade").desc, col(idCol).asc)
    val ranked = graft.llm.CacheScope.persistTracked(
      scored.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= k + 1))
    val tau = ranked.groupBy(g: _*)
      .agg(coalesce(max(when(col("__rn") === k + 1, col("prioridade"))),
        lit(0.0)).as("__tau"))
    ranked.filter(col("__rn") <= k)
      .join(broadcast(tau), groupCols)
      .select(g ++ Seq(col(idCol), col("peso"), col("prioridade"),
        greatest(col("peso"), col("__tau")).as("peso_estimado")): _*)
  }
}
