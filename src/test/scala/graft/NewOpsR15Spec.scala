package graft

import org.apache.spark.sql.functions._

/** Round-15 operators (Inference): textbook-value checks for
  * Mann–Whitney U, ANOVA F, Cohen's kappa, JS/Hellinger drift and
  * Bradley–Terry.
  */
class NewOpsR15Spec extends SparkSpec {
  import spark.implicits._

  private def one(df: org.apache.spark.sql.DataFrame) = df.collect().head

  test("mannWhitneyU matches the no-ties textbook case") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0)).toDF("arm", "v")
    val r = one(graft.operators.Inference.mannWhitneyU(df, "arm", "v", "a", "b"))
    assert(r.getAs[Long]("n_a") == 3 && r.getAs[Long]("n_b") == 3)
    assert(r.getAs[Double]("u_a") == 0.0)
    assert(r.getAs[Double]("u_b") == 9.0)
    // z = (U - n_a n_b/2)/sqrt(n_a n_b (n+1)/12) = -4.5/sqrt(5.25)
    assert(math.abs(r.getAs[Double]("z") - (-4.5 / math.sqrt(5.25))) < 1e-12)
  }

  test("mannWhitneyU reports null z when every value ties") {
    val df = Seq(("a", 1.0), ("a", 1.0), ("b", 1.0)).toDF("arm", "v")
    val r = one(graft.operators.Inference.mannWhitneyU(df, "arm", "v", "a", "b"))
    assert(r.isNullAt(r.fieldIndex("z")))
    // tied ranks still give the midrank U: each pair contributes 1/2
    assert(r.getAs[Double]("u_a") == 1.0)
  }

  test("anovaF matches the two-group hand computation") {
    val df = Seq(("g1", 1.0), ("g1", 2.0), ("g1", 3.0),
      ("g2", 4.0), ("g2", 5.0), ("g2", 6.0)).toDF("g", "v")
    val r = one(graft.operators.Inference.anovaF(df, "g", "v"))
    assert(r.getAs[Long]("n") == 6 && r.getAs[Long]("k") == 2)
    assert(math.abs(r.getAs[Double]("ss_entre") - 13.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("ss_dentro") - 4.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("f") - 13.5) < 1e-9)
  }

  test("anovaF is null-F on a single group") {
    val df = Seq(("g1", 1.0), ("g1", 2.0)).toDF("g", "v")
    val r = one(graft.operators.Inference.anovaF(df, "g", "v"))
    assert(r.isNullAt(r.fieldIndex("f")))
  }

  test("cohenKappa matches the classic 2x2 example") {
    // 20 yes/yes, 15 no/no, 5 yes/no, 10 no/yes -> po=0.7, pe=0.5, k=0.4
    val rows = Seq.fill(20)(("s", "s")) ++ Seq.fill(15)(("n", "n")) ++
      Seq.fill(5)(("s", "n")) ++ Seq.fill(10)(("n", "s"))
    val r = one(graft.operators.Inference.cohenKappa(
      rows.toDF("ra", "rb"), "ra", "rb"))
    assert(r.getAs[Long]("n") == 50)
    assert(math.abs(r.getAs[Double]("concordancia") - 0.7) < 1e-12)
    assert(math.abs(r.getAs[Double]("esperada") - 0.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("kappa") - 0.4) < 1e-12)
  }

  test("jsHellingerDrift is 0 on identical and 1 on disjoint distributions") {
    val a = Seq("x", "x", "y").toDF("b")
    val same = one(graft.operators.Inference.jsHellingerDrift(a, a, "b"))
    assert(math.abs(same.getAs[Double]("js")) < 1e-15)
    assert(math.abs(same.getAs[Double]("hellinger")) < 1e-15)
    val l = Seq("x").toDF("b")
    val r = Seq("y").toDF("b")
    val dis = one(graft.operators.Inference.jsHellingerDrift(l, r, "b"))
    assert(math.abs(dis.getAs[Double]("js") - 1.0) < 1e-12)
    assert(math.abs(dis.getAs[Double]("hellinger") - 1.0) < 1e-12)
  }

  test("bradleyTerry gives equal strengths on a symmetric duel and " +
    "null on one-sided items") {
    val duels = Seq(("A", "B"), ("B", "A"), ("A", "C")).toDF("w", "l")
    val out = graft.operators.Inference.bradleyTerry(duels, "w", "l")
      .collect().map(r => r.getAs[String]("item") ->
        (r.getAs[Long]("vitorias"), r.getAs[Long]("derrotas"),
          Option(r.getAs[java.lang.Double]("forca")))).toMap
    assert(out("C") == ((0L, 1L, None))) // never won: conditioned out
    val fa = out("A")._3.get
    val fb = out("B")._3.get
    // A vs B is a 1-1 tie; C's one-sided duel is conditioned out, so
    // the fitted strengths are symmetric and normalized
    assert(math.abs(fa - fb) < 1e-12 && math.abs(fa + fb - 1.0) < 1e-12)
    assert(out("A")._1 == 2L && out("A")._2 == 1L)
  }
}
