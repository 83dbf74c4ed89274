package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.llm.{Negative, Similarity, TextAnalysis}
import graft.operators.{Attribution, Bootstrap, Smoothing, Stats, Wasserstein}

/** Round-13 additions: position/time-decay attribution, the EWMA control
  * chart, split-conformal intervals, popularity^0.75 negative sampling,
  * simplified silhouette and IPS/SNIPS off-policy evaluation.
  */
class NewOpsR13Spec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // ---- position-based + time-decay attribution --------------------------

  test("positional credits: 1-touch 1.0, 2-touch 0.5/0.5, U-shape 40/20/40") {
    val ev = Seq(
      // user 1: one touch then converts
      (1L, "a", ts("2024-01-01 00:00:00"), 1L),
      (1L, "purchase", ts("2024-01-01 01:00:00"), 2L),
      // user 2: two touches
      (2L, "a", ts("2024-01-01 00:00:00"), 1L),
      (2L, "b", ts("2024-01-01 00:10:00"), 2L),
      (2L, "purchase", ts("2024-01-01 01:00:00"), 3L),
      // user 3: four touches — first/last 0.4, middles 0.1 each
      (3L, "a", ts("2024-01-01 00:00:00"), 1L),
      (3L, "b", ts("2024-01-01 00:01:00"), 2L),
      (3L, "c", ts("2024-01-01 00:02:00"), 3L),
      (3L, "d", ts("2024-01-01 00:03:00"), 4L),
      (3L, "purchase", ts("2024-01-01 01:00:00"), 5L),
      // user 4: never converts — contributes nothing
      (4L, "a", ts("2024-01-01 00:00:00"), 1L)
    ).toDF("u", "t", "ts", "id")
    val out = Attribution
      .positionalAttribution(ev, "u", "t", "ts", "id", "purchase")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    // a: 1.0 (u1) + 0.5 (u2 first) + 0.4 (u3 first) = 1.9
    assert(out("a")._1 == 3L)
    assert(math.abs(out("a")._2 - 1.9) < 1e-12)
    // b: 0.5 (u2 last) + 0.1 (u3 middle) = 0.6
    assert(math.abs(out("b")._2 - 0.6) < 1e-12)
    assert(math.abs(out("c")._2 - 0.1) < 1e-12)
    // d: u3 last = 0.4
    assert(math.abs(out("d")._2 - 0.4) < 1e-12)
    // position credits telescope to one per converting journey
    assert(math.abs(out.values.map(_._2).sum - 3.0) < 1e-12)
  }

  test("decay credits halve per full half-life and sum to 1 per journey") {
    val ev = Seq(
      (1L, "old", ts("2024-01-01 00:00:00"), 1L),  // 2 half-lives before
      (1L, "new", ts("2024-01-02 00:00:00"), 2L),  // 1 half-life before
      (1L, "purchase", ts("2024-01-03 00:00:00"), 3L)
    ).toDF("u", "t", "ts", "id")
    val out = Attribution
      .positionalAttribution(ev, "u", "t", "ts", "id", "purchase",
        halfLifeSeconds = 86400L)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    // weights 2^16 : 2^17 → 1/3 : 2/3
    assert(math.abs(out("old") - 1.0 / 3.0) < 1e-12)
    assert(math.abs(out("new") - 2.0 / 3.0) < 1e-12)
  }

  // ---- EWMA control chart ------------------------------------------------

  test("EWMA recursion, limit widening and a planted-shift alarm") {
    // 10 calm days then a large sustained shift (retrospective charts
    // fold the shift into μ and σ, so it must be big to trip L·σ limits)
    val rows = (1 to 10).map(d =>
      ("g", ts(f"2024-01-$d%02d 00:00:00"), 10.0)) ++
      (11 to 16).map(d => ("g", ts(f"2024-01-$d%02d 00:00:00"), 50.0))
    val df = rows.toDF("g", "ts", "v")
    val out = Smoothing
      .ewmaChart(df, Seq("g"), to_date(col("ts")), "v", lambda = 0.25,
        limitL = 2.0)
      .orderBy("tempo").collect()
    assert(out.length == 16)
    // replay the recursion by hand
    val ys = (1 to 10).map(_ => 10.0) ++ (11 to 16).map(_ => 50.0)
    val mu = ys.sum / ys.size
    var z = mu
    val zs = ys.map { y => z = 0.25 * y + 0.75 * z; z }
    out.zip(zs).foreach { case (r, want) =>
      assert(r.getAs[Double]("ewma") == want) }
    // limits widen monotonically with t
    val hw = out.map(r =>
      r.getAs[Double]("lim_superior") - r.getAs[Double]("lim_inferior"))
    assert(hw.zip(hw.tail).forall { case (a, b) => a < b })
    // the shifted tail alarms, the calm head does not
    assert(!out.take(8).exists(_.getAs[Boolean]("alarme")))
    assert(out.takeRight(2).forall(_.getAs[Boolean]("alarme")))
  }

  // ---- split-conformal intervals -----------------------------------------

  test("conformal q-hat is the exact ceil((n+1)(1-alpha)) order statistic") {
    // 9 calibration rows with |residuals| 1..9; alpha=0.2 →
    // rank = ceil(10*0.8) = 8 → qhat = 8
    val cal = (1 to 9).map(i => (i.toLong, 10.0, 10.0 + i))
      .toDF("id", "pred", "y")
    val app = Seq((100L, 10.0, 17.5), (101L, 10.0, 18.5))
      .toDF("id", "pred", "y")
    val out = Stats.conformalIntervals(cal, app, "id", "pred", "y", 0.2)
      .orderBy("id").collect()
    assert(out(0).getAs[Double]("lo") == 2.0 &&
      out(0).getAs[Double]("hi") == 18.0)
    assert(out(0).getAs[Boolean]("coberto"))   // 17.5 inside
    assert(!out(1).getAs[Boolean]("coberto"))  // 18.5 outside
    // calibration too small for the requested coverage fails loudly
    intercept[Exception] {
      Stats.conformalIntervals(
        cal.limit(2), app, "id", "pred", "y", 0.01).collect()
    }
  }

  // ---- negative sampling ---------------------------------------------------

  test("negative sampling: deterministic, in-catalog, one hit per draw") {
    val inter = Seq(
      (1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L), (5L, 10L),
      (1L, 20L), (2L, 20L), (1L, 30L)
    ).toDF("u", "i")
    val a = Negative.negativeSample(inter, "u", "i", k = 4).collect()
    val b = Negative.negativeSample(inter, "u", "i", k = 4).collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
    val catalog = Set(10L, 20L, 30L)
    assert(a.forall(r => catalog.contains(r.getAs[Long]("item_negativo"))))
    // no draw returns its own positive
    assert(a.forall(r => r.getAs[Long]("item_negativo") != r.getAs[Long]("i")))
    // each (u, i, j) appears at most once (exactly one CDF interval per T)
    val keys = a.map(r => (r.getAs[Long]("u"), r.getAs[Long]("i"),
      r.getAs[Long]("sorteio")))
    assert(keys.length == keys.distinct.length)
    // 8 positives × 4 draws = 32 total; output = 32 − self-collisions
    assert(a.length <= 32 && a.length > 0)
    // the popular item (weight 5^.75 vs 1) dominates the negatives drawn
    // for positives of OTHER items
    val negOfOthers = a.filter(_.getAs[Long]("i") != 10L)
      .map(_.getAs[Long]("item_negativo"))
    assert(negOfOthers.count(_ == 10L) > negOfOthers.length / 2)
  }

  // ---- simplified silhouette ----------------------------------------------

  test("silhouette: tight separated clusters ~1, straddler ~0") {
    val pts = Seq(
      (1L, Array(0.0f, 0.0f), 0), (2L, Array(0.1f, 0.0f), 0),
      (3L, Array(10.0f, 0.0f), 1), (4L, Array(10.1f, 0.0f), 1)
    ).toDF("id", "vec", "lab")
    val out = Similarity.simplifiedSilhouette(pts, "id", "vec", "lab")
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(out(0) > 0.99 && out(1) > 0.99)
    // add a point exactly between the two centroids → its s ≈ 0 drags
    // cluster 0's mean down
    val pts2 = pts.unionByName(
      Seq((5L, Array(5.05f, 0.0f), 0)).toDF("id", "vec", "lab"))
    val out2 = Similarity.simplifiedSilhouette(pts2, "id", "vec", "lab")
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(out2(0) < out(0) && out2(0) > 0.5)
  }

  test("silhouette: single cluster yields no rows (no other centroid)") {
    val pts = Seq((1L, Array(0.0f), 0), (2L, Array(1.0f), 0))
      .toDF("id", "vec", "lab")
    assert(Similarity.simplifiedSilhouette(pts, "id", "vec", "lab").isEmpty)
  }

  // ---- IPS / SNIPS off-policy evaluation -----------------------------------

  test("IPS and SNIPS reproduce the hand-computed estimates") {
    // one context; action a: 3 plays reward 1.0; action b: 1 play reward 8.0
    // → p(a)=0.75, p(b)=0.25; target = argmax avg reward = b
    val log = Seq(
      (0L, "a", 1.0), (0L, "a", 1.0), (0L, "a", 1.0), (0L, "b", 8.0)
    ).toDF("x", "a", "r")
    val out = Stats.ipsPolicyValue(log, "x", "a", "r").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("acao_alvo") == "b")
    // IPS = (0+0+0+8/0.25)/4 = 8; SNIPS = 32/(1/0.25) = 8
    assert(r.getAs[Double]("v_ips") == 8.0)
    assert(r.getAs[Double]("v_snips") == 8.0)
    assert(r.getAs[Long]("n") == 4L)
  }

  // ---- Poisson bootstrap CI -------------------------------------------------

  test("bootstrap CI: deterministic, brackets the mean, exact replicate count") {
    val df = (1 to 400).map(i => ("g", i.toLong, 100.0 + (i % 21) - 10))
      .toDF("g", "id", "x")
    val a = Bootstrap.bootstrapMeanCi(df, Seq("g"), "id", "x", b = 100)
      .collect().head
    val b = Bootstrap.bootstrapMeanCi(df, Seq("g"), "id", "x", b = 100)
      .collect().head
    assert(a.toString == b.toString)
    assert(a.getAs[Long]("n") == 400L)
    assert(a.getAs[Long]("b_validos") == 100L)
    val (media, lo, hi) = (a.getAs[Double]("media"),
      a.getAs[Double]("ic_inferior"), a.getAs[Double]("ic_superior"))
    assert(lo < media && media < hi)
    // a ±10 population: the 95% CI of a 400-row mean is well inside ±2
    assert(hi - lo < 4.0 && hi - lo > 0.0)
  }

  test("bootstrap Poisson CDF thresholds are a valid monotone CDF") {
    val cs = Bootstrap.PoissonCdf
    assert(cs.size == 9)
    assert(cs.zip(cs.tail).forall { case (a, b) => a < b })
    assert(math.abs(cs.head - math.exp(-1.0)) < 1e-15)
    assert(cs.last > 0.999998 && cs.last < 1.0) // c_8 = 1 − 1.13e-6
  }

  // ---- 1-D Wasserstein ------------------------------------------------------

  test("W1: zero for identical samples, exact for a constant shift") {
    val df = ((1 to 50).map(i => ("g", true, i.toDouble)) ++
      (1 to 50).map(i => ("g", false, i.toDouble + 7.25)))
      .toDF("g", "lado", "v")
    val out = Wasserstein.wasserstein1d(df, Seq("g"), "lado", "v")
      .collect().head
    assert(out.getAs[Long]("n_a") == 50L && out.getAs[Long]("n_b") == 50L)
    assert(math.abs(out.getAs[Double]("w1") - 7.25) < 1e-9)
    val same = ((1 to 50).map(i => ("g", true, i.toDouble)) ++
      (1 to 50).map(i => ("g", false, i.toDouble))).toDF("g", "lado", "v")
    assert(Wasserstein.wasserstein1d(same, Seq("g"), "lado", "v")
      .collect().head.getAs[Double]("w1") == 0.0)
    // hand case: A={0,10}, B={5,15} -> W1 = 5
    val hand = Seq(("g", true, 0.0), ("g", true, 10.0),
      ("g", false, 5.0), ("g", false, 15.0)).toDF("g", "lado", "v")
    assert(Wasserstein.wasserstein1d(hand, Seq("g"), "lado", "v")
      .collect().head.getAs[Double]("w1") == 5.0)
    // a group with one side missing emits null
    val oneSide = Seq(("h", true, 1.0)).toDF("g", "lado", "v")
    assert(Wasserstein.wasserstein1d(oneSide, Seq("g"), "lado", "v")
      .collect().head.isNullAt(3))
  }

  // ---- Good-Turing ----------------------------------------------------------

  test("Good-Turing replays the textbook frequency-of-frequencies table") {
    val docs = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val out = TextAnalysis.goodTuring(docs, "text")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), r.getDouble(3))).toMap
    // counts a:3 b:2 c:1 -> N=6, N_1=N_2=N_3=1
    assert(out(1L)._1.contains(1L))
    assert(out(1L)._2.contains(2.0))           // r*=2*N_2/N_1
    assert(out(1L)._3 == 1.0 / 6.0)
    assert(out(2L)._2.contains(3.0))           // r*=3*N_3/N_2
    assert(out(2L)._3 == 2.0 / 6.0)
    assert(out(3L)._2.isEmpty)                 // N_4 = 0 -> null
    assert(out(3L)._3 == 0.5)
    assert(out(0L)._1.isEmpty && out(0L)._2.isEmpty)
    assert(out(0L)._3 == 1.0 / 6.0)            // P0 = N_1/N
  }
}
