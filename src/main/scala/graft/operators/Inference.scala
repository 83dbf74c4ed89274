package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hypothesis tests and preference models, round 15: the A/B and
  * labeling-QA statistics a curation pipeline runs on top of the
  * engine's aggregates.
  *
  * Reference analogue: the reference's report layer compares indicator
  * distributions across periods and municipalities
  * (sisab_resolutividade_por_condicao.py per-group percentages,
  * config_painel_sm.py cohort cuts); these operators are the
  * significance-test companions of those comparisons, re-expressed the
  * Spark-first way — exact integer/DECIMAL sufficient statistics from
  * combinable aggregations, one fixed-parenthesization IEEE edge.
  */
object Inference {

  private val d19 = "decimal(19,0)"

  /** Mann–Whitney U test (Mann & Whitney 1947) with tie correction —
    * the two-sample special case of row 211's Kruskal–Wallis machinery
    * and the nonparametric companion of Welch's t (row 219): "did arm
    * B's distribution shift against arm A" without normality.
    *
    * Engine-exact via the row-209 doubled-rank discipline: tie-averaged
    * ranks are half-integers, so everything runs on integer doubled
    * ranks r₂ = 2·below + equal + 1 from the distinct-value collapse
    * ([[Stats.belowFromCounts]] — the 256-bucket decomposition, never a
    * corpus-wide rank sort). 2·U_A = ΣR₂(A) − n_A(n_A+1) is an exact
    * DECIMAL; the tie term Σ(t³−t) rides the SAME per-row aggregation
    * (a joined row whose value has multiplicity t contributes t²−1 —
    * the row-211 fusion). The normal-approximation
    * z = (2U_A − n_A·n_B) / (2·σ_U) with
    * σ_U² = n_A·n_B/12 · ((n+1) − ΣT/(n(n−1))) is a fixed
    * parenthesization of correctly-rounded IEEE ops over those exact
    * integers — engine-identical under any partitioning. Degenerate
    * designs (an empty arm, or every value tied → σ_U = 0) report null
    * z. Headroom: ΣR₂ ≤ 2n² must fit DECIMAL — n ≤ ~2·10⁹ rows
    * (the row-211 wall; beyond it, pre-bin).
    *
    * Output: one row — (n_a, n_b, u_a, u_b, z).
    */
  def mannWhitneyU(
      df: DataFrame, groupCol: String, valueCol: String,
      armA: String, armB: String): DataFrame = {
    val base = df
      .filter(col(groupCol).isin(armA, armB))
      .select((col(groupCol) === armA).as("__a"),
        col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .transform(graft.llm.CacheScope.persistTracked)
    val counts = graft.llm.CacheScope.persistTracked(
      base.groupBy(col("__v")).agg(count(lit(1L)).as("__cnt"))
        .withColumn("__c", lit("v")))
    val ranks = Stats.belowFromCounts(counts)
      .select(col("__v"), col("__cnt"),
        (lit(2L) * col("__below") + col("__cnt") + lit(1L)).as("__r2"))
    val agg = base.join(ranks, Seq("__v")).agg(
      sum(when(col("__a"), 1L).otherwise(0L)).as("n_a"),
      sum(when(!col("__a"), 1L).otherwise(0L)).as("n_b"),
      sum(when(col("__a"), col("__r2").cast(d19))
        .otherwise(lit(0L).cast(d19))).as("__ra2"),
      sum(col("__cnt").cast(d19) * col("__cnt").cast(d19) - lit(1L))
        .as("__st"))
    val u2a = col("__ra2") -
      col("n_a").cast(d19) * (col("n_a").cast(d19) + lit(1L))
    val u2b = lit(2L).cast(d19) * col("n_a").cast(d19) *
      col("n_b").cast(d19) - u2a
    val nad = col("n_a").cast("double")
    val nbd = col("n_b").cast("double")
    val nd = (col("n_a") + col("n_b")).cast("double")
    val tieAdj = (nd + lit(1.0)) -
      col("__st").cast("double") / (nd * (nd - lit(1.0)))
    val varU = nad * nbd / lit(12.0) * tieAdj
    agg.select(
      col("n_a"), col("n_b"),
      when(col("n_a") > 0L && col("n_b") > 0L,
        u2a.cast("double") / lit(2.0)).as("u_a"),
      when(col("n_a") > 0L && col("n_b") > 0L,
        u2b.cast("double") / lit(2.0)).as("u_b"),
      when(col("n_a") > 0L && col("n_b") > 0L && varU > 0.0,
        (u2a.cast("double") - nad * nbd) /
          (lit(2.0) * sqrt(varU))).as("z"))
  }

  /** One-way ANOVA F (Fisher) — "did the k group MEANS diverge",
    * completing the parametric family next to Welch's t (two groups,
    * unequal variance) and Kruskal–Wallis (ranks): the classic
    * equal-variance k-group mean test every experiment dashboard
    * reports.
    *
    * Exactness: per-group n, Σx, Σx² accumulate in DECIMAL(38,12) (the
    * row-219 discipline — order-independent under any partitioning);
    * each group's Σx²ᵍ/nᵍ is ONE IEEE division of exact decimals, and
    * the cross-group sum folds DETERMINISTICALLY over groups sorted by
    * key (k is test-statistic-small by contract — the row-211
    * list_reduce discipline). SSB = S2 − S²/n and SSW = Q − S2 are
    * fixed parenthesizations; F = (SSB/(k−1)) / (SSW/(n−k)). Null F
    * when k < 2, n ≤ k, or SSW ≤ 0 (a zero-variance corpus has no
    * within-group scale).
    *
    * Output: one row — (n, k, ss_entre, ss_dentro, f).
    */
  def anovaF(
      df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val d38 = "decimal(38,12)"
    val x = col("__v")
    val per = df
      .select(col(groupCol).cast("string").as("__g"),
        col(valueCol).cast("double").as("__v"))
      .filter(col("__g").isNotNull && col("__v").isNotNull)
      .groupBy("__g").agg(
        count(lit(1L)).as("__n"),
        sum(x.cast(d38)).cast(d38).as("__s"),
        sum((x * x).cast(d38)).cast(d38).as("__q"))
    val term = col("__s").cast("double") * col("__s").cast("double") /
      col("__n").cast("double")
    val tot = per.agg(
      sum(col("__n")).as("n"),
      count(lit(1L)).as("k"),
      sum(col("__s")).cast(d38).as("__ss"),
      sum(col("__q")).cast(d38).as("__qq"),
      aggregate(
        array_sort(collect_list(struct(col("__g"), term.as("__t")))),
        lit(0.0), (acc, v) => acc + v.getField("__t")).as("__s2"))
    val nd = col("n").cast("double")
    val kd = col("k").cast("double")
    val ssb = col("__s2") -
      col("__ss").cast("double") * col("__ss").cast("double") / nd
    val ssw = col("__qq").cast("double") - col("__s2")
    tot.select(col("n"), col("k"),
      when(col("n") > 0L, ssb).as("ss_entre"),
      when(col("n") > 0L, ssw).as("ss_dentro"),
      when(col("k") >= 2L && col("n") > col("k") && ssw > 0.0,
        (ssb / (kd - lit(1.0))) / (ssw / (nd - kd))).as("f"))
  }

  /** Cohen's kappa (1960) — inter-annotator agreement corrected for
    * chance: the labeling-QA gate every human- or model-labeled
    * curation pipeline needs before trusting its labels (two quality
    * classifiers, a rater pair, a model-vs-gold audit).
    *
    * Fully exact up to the final edge: observed agreement p_o = A/n and
    * expected agreement p_e = Σ_c n_Ac·n_Bc / n² are ratios of exact
    * BIGINT/DECIMAL integers (the marginal-product sum is one inner
    * join of the two ≤|classes|-row marginal tables — never a fold of
    * doubles, so no ordering discipline is even needed);
    * κ = (p_o − p_e)/(1 − p_e) is a fixed parenthesization of the two
    * resulting doubles. κ is null when p_e = 1 (a single shared class —
    * agreement is unfalsifiable). Rows where either rater is null are
    * dropped (no label ≠ a label).
    *
    * Output: one row — (n, concordancia, esperada, kappa).
    */
  def cohenKappa(
      df: DataFrame, raterACol: String, raterBCol: String): DataFrame = {
    val base = df
      .select(col(raterACol).cast("string").as("__ra"),
        col(raterBCol).cast("string").as("__rb"))
      .filter(col("__ra").isNotNull && col("__rb").isNotNull)
      .transform(graft.llm.CacheScope.persistTracked)
    val tot = base.agg(
      count(lit(1L)).as("n"),
      sum(when(col("__ra") === col("__rb"), 1L).otherwise(0L)).as("__ag"))
    val ma = base.groupBy("__ra").agg(count(lit(1L)).as("__na"))
    val mb = base.groupBy("__rb").agg(count(lit(1L)).as("__nb"))
    val pe = ma.join(mb, col("__ra") === col("__rb"))
      .agg(coalesce(sum(col("__na").cast(d19) * col("__nb").cast(d19)),
        lit(0L).cast(d19)).as("__pen"))
    val nd = col("n").cast("double")
    val po = col("__ag").cast("double") / nd
    val ped = col("__pen").cast("double") /
      (col("n").cast(d19) * col("n").cast(d19)).cast("double")
    tot.crossJoin(broadcast(pe))
      .select(col("n"),
        when(col("n") > 0L, po).as("concordancia"),
        when(col("n") > 0L, ped).as("esperada"),
        when(col("n") > 0L && ped < 1.0,
          (po - ped) / (lit(1.0) - ped)).as("kappa"))
  }

  /** Jensen–Shannon divergence (log₂, bounded [0,1]) and Hellinger
    * distance between two categorical/binned distributions — the
    * bounded SYMMETRIC companions of row 186's PSI/χ² drift gate (PSI
    * explodes on vanishing bins and is asymmetric; JS/Hellinger are
    * the metrics a mixture monitor can threshold stably).
    *
    * Exactness: per-bucket proportions are single IEEE divisions of
    * exact BIGINT counts; each bucket's JS/Hellinger contribution is a
    * fixed parenthesization of correctly-rounded ops, and the
    * cross-bucket sums accumulate the per-bucket DOUBLES through
    * DECIMAL(38,18) casts (the row-154 decimal-of-double discipline —
    * order-independent, SQL-replayable; bucket tables are bounded, so
    * 18 fractional digits lose nothing thresholdable). Zero-count
    * buckets contribute 0 to their side's KL term (lim p·log p = 0);
    * an empty SIDE yields null distances.
    *
    * Output: one row — (n_buckets, js, hellinger).
    */
  def jsHellingerDrift(
      base: DataFrame, current: DataFrame, bucketCol: String): DataFrame = {
    val dd = "decimal(38,18)"
    val joined = base.groupBy(col(bucketCol).as("bucket"))
      .agg(count(lit(1L)).as("n_base"))
      .join(current.groupBy(col(bucketCol).as("bucket"))
        .agg(count(lit(1L)).as("n_atual")), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_atual"), lit(0L)).as("n_atual"))
    val totals = joined.agg(
      sum(col("n_base")).as("__nt"), sum(col("n_atual")).as("__mt"))
    val p = col("n_base").cast("double") / col("__nt").cast("double")
    val q = col("n_atual").cast("double") / col("__mt").cast("double")
    val m = (p + q) / lit(2.0)
    val jsC = (when(col("n_base") > 0L, p * log2(p / m)).otherwise(0.0) +
      when(col("n_atual") > 0L, q * log2(q / m)).otherwise(0.0)) /
      lit(2.0)
    val hC = (sqrt(p) - sqrt(q)) * (sqrt(p) - sqrt(q))
    joined.crossJoin(broadcast(totals))
      .agg(
        count(lit(1L)).as("n_buckets"),
        max(col("__nt")).as("__n"), max(col("__mt")).as("__m"),
        sum(jsC.cast(dd)).cast(dd).as("__js"),
        sum(hC.cast(dd)).cast(dd).as("__h"))
      .select(col("n_buckets"),
        when(col("__n") > 0L && col("__m") > 0L,
          col("__js").cast("double")).as("js"),
        when(col("__n") > 0L && col("__m") > 0L,
          sqrt(col("__h").cast("double") / lit(2.0))).as("hellinger"))
  }

  /** Bradley–Terry preference model (1952) fit by `iters` fixed MM
    * steps (Hunter 2004): from (winner, loser) comparison events,
    * estimate item strengths p with
    * p_i ← W_i / Σ_j n_ij/(p_i + p_j) — the pairwise-preference model
    * behind RLHF reward aggregation, ranking-from-duels and match-up
    * normalization.
    *
    * Determinism: the MM update's denominator sums per-opponent DOUBLE
    * ratios through DECIMAL(38,12) rounding (order-independent — the
    * row-154 decimal-of-double discipline), every division is one IEEE
    * op, and the iteration count is FIXED, so the fit replays
    * bit-for-bit in any engine (the oracle unrolls the same `iters`
    * steps). The final strengths are normalized to sum 1 through one
    * decimal-accumulated sum.
    *
    * Shape at 100 TB: comparisons collapse to the (i, j, n_ij) match
    * matrix in one combinable aggregation — the corpus is touched
    * once; the MM steps then run on the COLLECTED matrix on the driver
    * (k²-bounded state — the k-means-centroid bounded-collect call).
    * CONTRACT: the ITEM set is test-statistic-small (brands, arms,
    * model variants — the row-211 k-groups discipline); the comparison
    * STREAM is unbounded. A DataFrame-loop MM was built first and
    * measured EXPONENTIAL in the step count (54 s at k=5 on a 25-item
    * matrix at sf0.1): each step references the previous strengths
    * frame twice, the self-join attribute dedup rewrites one branch,
    * and the rewritten branch misses the cache — per-step persists do
    * not save it. Driver arithmetic replicates Spark's cast semantics
    * exactly: scala BigDecimal(double) (shortest-string) → setScale(12,
    * HALF_UP) → exact decimal sums → correctly-rounded toDouble.
    *
    * The MLE only exists on items with ≥1 win and ≥1 loss; one-sided
    * items (their MLE is 0/∞) are excluded from the fit and reported
    * with null strength — their comparisons against fitted items are
    * likewise conditioned out (one filtering pass, documented, not
    * cascaded).
    *
    * Output: one row per item — (item, vitorias, derrotas, forca).
    */
  def bradleyTerry(
      comparisons: DataFrame, winnerCol: String, loserCol: String,
      iters: Int = 5): DataFrame = {
    require(iters >= 1 && iters <= 50, s"need 1 <= iters <= 50, got $iters")
    val wins = graft.llm.CacheScope.persistTracked(
      comparisons
        .select(col(winnerCol).cast("string").as("__w"),
          col(loserCol).cast("string").as("__l"))
        .filter(col("__w").isNotNull && col("__l").isNotNull &&
          col("__w") =!= col("__l"))
        .groupBy("__w", "__l").agg(count(lit(1L)).as("__n")))
    val winTot = wins.groupBy(col("__w").as("__i"))
      .agg(sum(col("__n")).as("vitorias"))
    val lossTot = wins.groupBy(col("__l").as("__i"))
      .agg(sum(col("__n")).as("derrotas"))
    val items = graft.llm.CacheScope.persistTracked(
      winTot.join(lossTot, Seq("__i"), "full_outer")
        .select(col("__i"),
          coalesce(col("vitorias"), lit(0L)).as("vitorias"),
          coalesce(col("derrotas"), lit(0L)).as("derrotas"))
        .withColumn("__fit",
          col("vitorias") > 0L && col("derrotas") > 0L))
    val fitIds = items.filter(col("__fit"))
      .select("__i").collect().map(_.getString(0))
    // directed win counts restricted to fittable endpoints — collected:
    // ≤k² rows by the item-set contract. The fit runs on CONDITIONED
    // totals (wins against excluded items must not leak into a
    // strength); an item whose conditioned wins hit zero keeps strength
    // 0 through the iteration (the BT limit for a conditioned sink),
    // and (0,0) pairs contribute nothing — the MM stays total without
    // a cascaded re-filter.
    val winsRows =
      if (fitIds.isEmpty) Array.empty[org.apache.spark.sql.Row]
      else wins.filter(col("__w").isin(fitIds: _*) &&
        col("__l").isin(fitIds: _*)).collect()
    val wi2 = winsRows.groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(2)).sum).toMap.withDefaultValue(0L)
    val nij = winsRows
      .flatMap(r => Seq(
        (r.getString(0), r.getString(1)) -> r.getLong(2),
        (r.getString(1), r.getString(0)) -> r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val dec12 = (v: Double) =>
      scala.math.BigDecimal(v).setScale(12,
        scala.math.BigDecimal.RoundingMode.HALF_UP)
    var p: Map[String, Double] = fitIds.map(_ -> 1.0).toMap
    for (_ <- 1 to iters) {
      val den = collection.mutable.Map.empty[String, scala.math.BigDecimal]
      for (((i, j), n) <- nij; s = p(i) + p(j); if s > 0.0)
        den(i) = den.getOrElse(i, scala.math.BigDecimal(0)) +
          dec12(n.toDouble / s)
      p = fitIds.map(i => i -> (
        if (wi2(i) == 0L) 0.0
        else wi2(i).toDouble / den(i).doubleValue)).toMap
    }
    val z = p.values.map(dec12).sum.doubleValue
    val spark = comparisons.sparkSession
    import spark.implicits._
    val strengths =
      (if (z > 0.0) p.toSeq.map { case (i, v) => (i, v / z) }
       else Seq.empty[(String, Double)]).toDF("__i", "forca")
    items
      .join(broadcast(strengths), Seq("__i"), "left")
      .select(col("__i").as("item"), col("vitorias"), col("derrotas"),
        col("forca"))
  }
}
