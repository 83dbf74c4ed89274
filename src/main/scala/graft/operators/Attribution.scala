package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.llm.CacheScope

/** Multi-touch attribution beyond first/last-touch (row 176): the two
  * published model-based attributions marketers actually run — exact
  * Shapley values over observed touchpoint coalitions, and Markov-chain
  * removal effects over first-order journey transitions.
  */
object Attribution {

  /** Exact Shapley-value channel attribution (Shapley 1953; the
    * cooperative-game attribution standard — each channel's credit is
    * its average marginal contribution to the conversion rate across
    * every possible coalition order).
    *
    * The coalition value is EMPIRICAL: v(S) = observed conversion rate
    * of users whose distinct-touch set is exactly S (the standard
    * data-driven convention; unobserved coalitions contribute v = 0 —
    * a declared contract, stated here because silent zeros are the
    * usual Shapley-implementation bug). φ_c = Σ_{S ⊆ K\{c}}
    * |S|!·(k−1−|S|)!/k! · (v(S∪{c}) − v(S)), exact over all 2^k
    * coalitions — exponential BY DEFINITION, so k is capped at 12
    * (4096 coalitions; sampling approximations are a different
    * operator's contract).
    *
    * Shape at scale: raw events collapse to (user, sorted touch-set
    * key, converted) — combinable aggregations, the only pass over raw
    * data; per-set rates are a |distinct sets| ≤ 2^k table; the
    * channel list is a BOUNDED collect (≤ event-type cardinality, the
    * k-means-centroid rule); the k·2^(k−1) (channel, coalition) grid is
    * built driver-side as literals and joined against the tiny rate
    * table. Determinism: v = nc/n is ONE division of exact BIGINTs;
    * each term w·(v₁−v₀) is IEEE over identical doubles; the per-channel
    * sum folds in coalition-mask order (the cramersV fold rule) so both
    * engines add in the same sequence.
    *
    * Output: (canal, shapley) — Σ shapley over channels telescopes to
    * v(K) − v(∅) by construction (the efficiency axiom), a property the
    * spec pins.
    */
  def shapleyAttribution(
      events: DataFrame, userCol: String, typeCol: String,
      convType: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val touched = events.filter(col(typeCol) =!= convType)
      .select(col(userCol).as("__u"), col(typeCol).cast("string").as("__c"))
      .distinct()
      .transform(CacheScope.persistTracked)
    val convU = events.filter(col(typeCol) === convType)
      .select(col(userCol).as("__u")).distinct()
      .withColumn("__cv", lit(1L))
    val users = touched.select("__u")
      .unionByName(convU.select("__u")).distinct()
    val sets = users
      .join(touched.groupBy("__u")
        .agg(array_sort(collect_set(col("__c"))).as("__set")),
        Seq("__u"), "left")
      .join(convU, Seq("__u"), "left")
      .select(
        concat_ws(",", coalesce(col("__set"),
          array().cast("array<string>"))).as("__key"),
        coalesce(col("__cv"), lit(0L)).as("__cv"))
    val perSet = sets.groupBy("__key")
      .agg(count(lit(1L)).as("__n"), sum(col("__cv")).as("__nc"))
    val vdf = perSet.select(col("__key"),
      (col("__nc").cast("double") / col("__n").cast("double")).as("__v"))
    // bounded collect: the channel alphabet (≤ event-type cardinality)
    val channels = touched.select("__c").distinct().orderBy("__c")
      .collect().map(_.getString(0)).toSeq
    val k = channels.size
    require(k >= 1 && k <= 12,
      s"exact Shapley is 2^k in coalitions; got k=$k channels (cap 12)")
    def factL(n: Int): Long = (1 to n).foldLeft(1L)(_ * _)
    val grid = for {
      c <- channels
      mask <- 0 until (1 << k)
      if (mask & (1 << channels.indexOf(c))) == 0
    } yield {
      val s = channels.zipWithIndex.collect {
        case (ch, i) if (mask & (1 << i)) != 0 => ch
      }
      val w = (factL(s.size) * factL(k - 1 - s.size)).toDouble /
        factL(k).toDouble
      (c, s.mkString(","), (s :+ c).sorted.mkString(","), w, mask)
    }
    val gridDf = grid.toDF("canal", "__key0", "__key1", "__w", "__m")
    val terms = gridDf
      .join(broadcast(vdf.select(col("__key").as("__key0"),
        col("__v").as("__v0"))), Seq("__key0"), "left")
      .join(broadcast(vdf.select(col("__key").as("__key1"),
        col("__v").as("__v1"))), Seq("__key1"), "left")
      .select(col("canal"), col("__m"),
        (col("__w") * (coalesce(col("__v1"), lit(0.0)) -
          coalesce(col("__v0"), lit(0.0)))).as("__t"))
    terms.groupBy("canal").agg(
      aggregate(
        array_sort(collect_list(struct(col("__m"), col("__t")))),
        lit(0.0), (acc, x) => acc + x.getField("__t")).as("shapley"))
  }

  /** Markov removal-effect attribution (Anderl, Becker, von Wangenheim
    * & Schumann, Int. J. Research in Marketing 2016 — the "Mapping the
    * customer journey" model): build the first-order journey chain
    * start → touches → {conv | null}, compute the chain's conversion
    * probability, then for each channel REMOVE it (transitions into it
    * divert to the null absorber) and re-compute; a channel's credit is
    * its removal effect 1 − P₋c/P, normalized across channels.
    *
    * Journey contract: events order by (µs-truncated ts, tie id) — the
    * cross-engine timestamp discipline; a journey truncates at its
    * FIRST conversion event (absorbing), non-converters absorb in null
    * from their last touch. Transition probabilities are ONE division
    * of exact BIGINT counts.
    *
    * Absorption probabilities run `iters` fixed power iterations of
    * x ← P·x with x(conv)=1, x(null)=0 — the q140 PageRank discipline:
    * per-term products cast DECIMAL(38,18) and summed EXACTLY (order-
    * free), one double cast per state per round, so the oracle's
    * unrolled CTEs replay bit-for-bit. All frames after the first
    * collapse are (variants ≤ k+1) × (states ≤ k+3) — broadcast-sized
    * regardless of event volume; raw events are touched exactly once.
    *
    * Output: (canal, p_total, p_sem_canal, efeito_remocao, atribuicao).
    */
  def markovRemovalAttribution(
      events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, tieCol: String, convType: String,
      iters: Int = 20): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    val ev = events.select(col(userCol).as("__u"),
      col(typeCol).cast("string").as("__t"),
      col(tsCol).as("__ts"), col(tieCol).as("__tb"))
    val w = Window.partitionBy("__u").orderBy(col("__ts"), col("__tb"))
    val seq0 = ev.withColumn("__rn", row_number().over(w))
    val firstConv = seq0.filter(col("__t") === convType)
      .groupBy("__u").agg(min(col("__rn")).as("__fc"))
    val wU = Window.partitionBy("__u")
    val journey = seq0.join(firstConv, Seq("__u"), "left")
      .filter(col("__fc").isNull || col("__rn") <= col("__fc"))
      .withColumn("__state",
        when(col("__t") === convType, lit("conv")).otherwise(col("__t")))
    val trans = journey.select(col("__u"),
      coalesce(lag(col("__state"), 1).over(w), lit("start")).as("__a"),
      col("__state").as("__b"))
    val terminal = journey
      .withColumn("__mx", max(col("__rn")).over(wU))
      .filter(col("__rn") === col("__mx") && col("__state") =!= "conv")
      .select(col("__state").as("__a"), lit("null").as("__b"))
    val counts = CacheScope.persistTracked(
      trans.select("__a", "__b").unionByName(terminal)
        .groupBy("__a", "__b").agg(count(lit(1L)).as("__c")))
    // bounded collect: channel states (≤ event-type cardinality)
    val channels = counts.select(col("__a").as("__s"))
      .unionByName(counts.select(col("__b").as("__s"))).distinct()
      .filter(!col("__s").isin("start", "conv", "null"))
      .orderBy("__s").collect().map(_.getString(0)).toSeq
    val spark = events.sparkSession
    import spark.implicits._
    val variants = ("total" +: channels).toDF("__var")
    // removal: transitions INTO the removed channel divert to null;
    // its out-edges become unreachable and drop from the state space
    val vedges = counts.crossJoin(broadcast(variants))
      .filter(col("__var") === "total" || col("__a") =!= col("__var"))
      .withColumn("__b2",
        when(col("__var") =!= "total" && col("__b") === col("__var"),
          lit("null")).otherwise(col("__b")))
      .groupBy(col("__var"), col("__a"), col("__b2").as("__b"))
      .agg(sum(col("__c")).as("__c"))
    val fromTot = vedges.groupBy("__var", "__a")
      .agg(sum(col("__c")).as("__tot"))
    val probs = CacheScope.persistTracked(
      vedges.join(fromTot, Seq("__var", "__a"))
        .select(col("__var"), col("__a"), col("__b"),
          (col("__c").cast("double") / col("__tot").cast("double"))
            .as("__p")))
    // The `iters` fixed power iterations run on the DRIVER (round 15 —
    // the q241 Bradley–Terry discipline): every post-collapse frame is
    // (variants ≤ k+1) × (states ≤ k+3) rows by the channel contract,
    // and the DataFrame loop paid ~iters × (join + agg + checkpoint)
    // scheduler rounds on ~2k rows — pure fixed overhead (measured
    // 7.5 s at sf0.1 with the corpus work a fraction of that). Driver
    // arithmetic replicates the replaced plan op-for-op: per-term IEEE
    // product → Spark's double→DECIMAL(38,18) cast (scala BigDecimal
    // shortest-string, setScale 18 HALF_UP) → exact decimal sum
    // (order-free) → one correctly-rounded toDouble per state per
    // round — bit-identical to the DataFrame loop it replaces, and the
    // oracle's unrolled CTEs replay it unchanged.
    val probRows = probs
      .select("__var", "__a", "__b", "__p").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getDouble(3)))
    val stateKeys = (probRows.map(r => (r._1, r._2)) ++
      probRows.map(r => (r._1, r._3))).distinct
    val dec18 = (v: Double) =>
      scala.math.BigDecimal(v).setScale(18,
        scala.math.BigDecimal.RoundingMode.HALF_UP)
    def absorbD(s: String): Option[Double] =
      if (s == "conv") Some(1.0) else if (s == "null") Some(0.0) else None
    var xm: Map[(String, String), Double] =
      stateKeys.map(k => k -> absorbD(k._2).getOrElse(0.0)).toMap
    for (_ <- 0 until iters) {
      val folded =
        collection.mutable.Map.empty[(String, String), scala.math.BigDecimal]
      for ((v, a, b, p) <- probRows) {
        val t = dec18(p * xm((v, b)))
        val k = (v, a)
        folded(k) = folded.getOrElse(k, scala.math.BigDecimal(0)) + t
      }
      xm = stateKeys.map { k =>
        k -> absorbD(k._2).getOrElse(
          folded.get(k).map(_.doubleValue).getOrElse(0.0))
      }.toMap
    }
    val pStart = stateKeys.filter(_._2 == "start")
      .map(k => (k._1, xm(k)))
      .sortBy(_._1).toSeq.toDF("__var", "__x")
    val pTotal = pStart.filter(col("__var") === "total")
      .select(col("__x").as("__pt"))
    val removals = pStart.filter(col("__var") =!= "total")
      .crossJoin(broadcast(pTotal))
      .select(col("__var").as("canal"), col("__pt").as("p_total"),
        col("__x").as("p_sem_canal"),
        when(col("__pt") > 0.0, lit(1.0) - col("__x") / col("__pt"))
          .otherwise(lit(0.0)).as("efeito_remocao"))
    val sumRem = removals.agg(
      aggregate(
        array_sort(collect_list(struct(col("canal"),
          col("efeito_remocao").as("__e")))),
        lit(0.0), (acc, r) => acc + r.getField("__e")).as("__sum"))
    removals.crossJoin(broadcast(sumRem))
      .select(col("canal"), col("p_total"), col("p_sem_canal"),
        col("efeito_remocao"),
        when(col("__sum") > 0.0, col("efeito_remocao") / col("__sum"))
          .as("atribuicao"))
  }

  /** Position-based (U-shaped) + time-decay multi-touch attribution —
    * the two RULE-based models between first/last-touch (row 176) and
    * the model-based pair above (Shapley / Markov): position credits
    * 40/20/40 (first and last touch 0.4 each, the middle splits 0.2
    * evenly; 1-touch journeys get 1.0, 2-touch 0.5/0.5), time-decay
    * credits halve per elapsed half-life before the conversion.
    *
    * Journey = the touches strictly before a user's FIRST conversion
    * (the q226 journey rule), ordered by (ts, orderCol) — the same
    * total order both attribution siblings use. Non-converting users
    * contribute nothing (position/decay are conversion-credit models).
    *
    * Determinism (the engine-vs-oracle contract): decay weights are
    * INTEGERS — w = 2^(18 − k) with k = full half-lives elapsed,
    * integer-division of epoch-µs and clamped at 18 (beyond, the
    * credit ratio is ≤ 2⁻¹⁸ ≈ 4 ppm — below attribution noise; the
    * clamp keeps every weight an exact long and the per-journey total
    * an exact integer sum, so each decay credit is ONE IEEE division
    * of exact integers — no pow(), whose rounding is not IEEE-mandated
    * and differs across engines). Position credits are fixed literals
    * except the middle split's one division; per-channel sums of both
    * credits accumulate through DECIMAL(38,18) casts (the q184 rule).
    *
    * Scale: two combinable aggregations over the journey frame (per-
    * user stats, per-channel rollup) + one row_number window per user
    * — journeys are bounded per user; nothing collects. Output:
    * (canal, toques, credito_posicional, credito_decaimento).
    */
  def positionalAttribution(
      events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      orderCol: String, convType: String,
      halfLifeSeconds: Long = 86400L): DataFrame = {
    require(halfLifeSeconds > 0,
      s"need halfLifeSeconds > 0, got $halfLifeSeconds")
    val wSeq = Window.partitionBy(col("__u"))
      .orderBy(col("__ts"), col("__o"))
    val ev = CacheScope.persistTracked(events
      .select(col(userCol).as("__u"), col(typeCol).cast("string").as("__c"),
        col(tsCol).as("__ts"), col(orderCol).as("__o"))
      .withColumn("__rn", row_number().over(wSeq).cast("long")))
    // first conversion per user: its rank bounds the journey, its
    // timestamp anchors the decay clock (min_by is deterministic —
    // __rn is unique within the user)
    val fc = ev.filter(col("__c") === convType)
      .groupBy("__u")
      .agg(min(col("__rn")).as("__fc"), min_by(col("__ts"), col("__rn")).as("__tc"))
    val touches = ev.join(fc, Seq("__u")).filter(col("__rn") < col("__fc"))
    val jStats = touches.groupBy("__u").agg(
      count(lit(1L)).as("__n"),
      min(col("__rn")).as("__rmin"), max(col("__rn")).as("__rmax"))
    val n = col("__n")
    val isEnd = col("__rn") === col("__rmin") || col("__rn") === col("__rmax")
    val kExpr =
      s"((unix_micros(__tc) - unix_micros(__ts)) div ${halfLifeSeconds * 1000000L}L)"
    val scored = touches.join(jStats, Seq("__u"))
      .withColumn("__pc",
        when(n === 1L, lit(1.0))
          .when(isEnd && n === 2L, lit(0.5))
          .when(isEnd, lit(0.4))
          .otherwise(lit(0.2) / (n - 2L).cast("double")))
      .withColumn("__w",
        expr(s"shiftleft(1L, cast(18 - least($kExpr, 18L) as int))"))
    val wTot = scored.groupBy("__u").agg(sum(col("__w")).as("__wt"))
    scored.join(wTot, Seq("__u"))
      .withColumn("__dc", col("__w").cast("double") / col("__wt").cast("double"))
      .groupBy(col("__c").as("canal"))
      .agg(count(lit(1L)).as("toques"),
        sum(col("__pc").cast("decimal(38,18)")).cast("double")
          .as("credito_posicional"),
        sum(col("__dc").cast("decimal(38,18)")).cast("double")
          .as("credito_decaimento"))
  }
}
