package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TopK
import graft.plans.WindowTopKRewrite
import graft.sources.Tables

/** The window-top-k optimizer rewrite ([[WindowTopKRewrite]]) and the
  * generalized bounded-heap aggregate behind it
  * ([[graft.functions.TopKRows]]): result equivalence with the window
  * form, residual-predicate handling, and the rewritten plan shape.
  *
  * The shared test session has no GraftExtensions, so the rule is
  * attached through `spark.experimental.extraOptimizations` (removed in
  * afterAll); `windowGroupLimitThreshold = -1` keeps Spark's own
  * InferWindowGroupLimit from rewriting the pattern first — in a
  * GraftSession the injected rule runs in the operator-optimization
  * batch, before that built-in, so production plans get the clean shape
  * without the conf.
  */
class TopKRewriteSpec extends SparkSpec {

  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ WindowTopKRewrite
    spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", "-1")
  }

  override def afterAll(): Unit = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == WindowTopKRewrite)
    spark.conf.unset("spark.sql.optimizer.windowGroupLimitThreshold")
    super.afterAll()
  }

  private def withRuleOff[T](body: => T): T = {
    spark.conf.set("spark.graft.topkRewrite.enabled", "false")
    try body finally spark.conf.set("spark.graft.topkRewrite.enabled", "true")
  }

  private def topkDf = {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_quantity").desc, col("l_orderkey").asc, col("l_linenumber").asc)
    li.withColumn("rn", row_number().over(w))
  }

  test("rewrite preserves the window form's results exactly") {
    // build a FRESH DataFrame per measurement: a Dataset memoizes its
    // QueryExecution, so re-collecting one df under a changed conf would
    // silently reuse the first plan
    def q() = topkDf.filter(col("rn") <= 3)
    val want = withRuleOff(q().collect().toSeq.sortBy(_.toString))
    val rewritten = q()
    val got = rewritten.collect().toSeq.sortBy(_.toString)
    assert(planString(rewritten).contains("graft_top_k_rows"))
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("rewritten plan aggregates instead of sorting every row") {
    val q = topkDf.filter(col("rn") <= 3)
    val plan = planString(q)
    assert(plan.contains("graft_top_k_rows"), s"rule did not fire:\n$plan")
    assert(!plan.contains("Window"), s"window survived the rewrite:\n$plan")
    assert(plan.contains("ObjectHashAggregate"), s"wrong aggregate impl:\n$plan")
  }

  test("residual conjuncts survive: rn range and equality filters") {
    def range() = topkDf.filter(col("rn") >= 2 && col("rn") <= 3)
    val wantRange = withRuleOff(range().collect().toSeq.sortBy(_.toString))
    val rw = range()
    assert(rw.collect().toSeq.sortBy(_.toString) == wantRange)
    assert(planString(rw).contains("graft_top_k_rows"))

    def eq() = topkDf.filter(col("rn") === 2)
    val wantEq = withRuleOff(eq().collect().toSeq.sortBy(_.toString))
    val rwEq = eq()
    val gotEq = rwEq.collect().toSeq.sortBy(_.toString)
    assert(gotEq == wantEq && gotEq.nonEmpty)
    assert(planString(rwEq).contains("graft_top_k_rows"))
  }

  test("rank() rewrites through RankKRows, boundary tie groups kept whole") {
    // l_quantity alone ties heavily: rank()<=2 keeps whole tie groups,
    // so the output exceeds 2 rows per group where quantities repeat
    def ranked() = {
      val w = Window.partitionBy("l_suppkey").orderBy(col("l_quantity").desc)
      Tables.lineitem(spark, sfDir)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity")
        .withColumn("rk", rank().over(w)).filter(col("rk") <= 2)
    }
    val want = withRuleOff(ranked().collect().toSeq.sortBy(_.toString))
    val rw = ranked()
    val got = rw.collect().toSeq.sortBy(_.toString)
    assert(planString(rw).contains("graft_rank_k_rows"), planString(rw))
    assert(got == want && got.nonEmpty)
  }

  test("dense_rank() rewrites too: k smallest distinct keys, all their rows") {
    def ranked() = {
      val w = Window.partitionBy("l_suppkey").orderBy(col("l_quantity").desc)
      Tables.lineitem(spark, sfDir)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity")
        .withColumn("rk", dense_rank().over(w)).filter(col("rk") <= 2)
    }
    val want = withRuleOff(ranked().collect().toSeq.sortBy(_.toString))
    val rw = ranked()
    val got = rw.collect().toSeq.sortBy(_.toString)
    assert(planString(rw).contains("graft_dense_rank_k_rows"), planString(rw))
    assert(got == want && got.nonEmpty)
  }

  test("non-rewritable shapes are left alone (above maxFraction, no upper bound)") {
    // percent_rank/ntile bounds past maxFraction keep most of each group:
    // the bounded aggregate would buffer more than the window sorts
    val w = Window.partitionBy("l_suppkey").orderBy(col("l_quantity").desc)
    val li = Tables.lineitem(spark, sfDir)
    val ranked = li.withColumn("rk", percent_rank().over(w)).filter(col("rk") <= 0.9)
    assert(!planString(ranked).contains("graft_"))
    val wide = li.withColumn("nt", ntile(4).over(w)).filter(col("nt") <= 3)
    assert(!planString(wide).contains("graft_"))
    val lower = topkDf.filter(col("rn") >= 5)
    assert(!planString(lower).contains("graft_top_k_rows"))
  }

  test("ntile(b) <= k rewrites: first-k buckets via a broadcast count join") {
    def q() = {
      // unique composite ordering — ntile ties are arbitrary like
      // row_number, so the comparison needs a deterministic order
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_quantity").desc, col("l_orderkey").asc, col("l_linenumber").asc)
      Tables.lineitem(spark, sfDir)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity")
        .withColumn("nt", ntile(4).over(w)).filter(col("nt") <= 1)
    }
    val want = withRuleOff(q().collect().toSeq.sortBy(_.toString))
    val rw = q()
    val got = rw.collect().toSeq.sortBy(_.toString)
    val plan = planString(rw)
    assert(plan.contains("graft_top_k_rows"), s"rule did not fire:\n$plan")
    assert(!plan.contains("Window"), s"window survived:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"count side not broadcast:\n$plan")
    assert(got == want && got.nonEmpty)
  }

  test("percent_rank() <= p rewrites: rank cutoff from the group count") {
    def q(bound: Double, strict: Boolean = false) = {
      // quantity-only ordering ties heavily: percent_rank is rank-based,
      // so retained tie groups and values are still deterministic
      val w = Window.partitionBy("l_suppkey").orderBy(col("l_quantity").desc)
      val pr = Tables.lineitem(spark, sfDir)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity")
        .withColumn("pr", percent_rank().over(w))
      if (strict) pr.filter(col("pr") < bound) else pr.filter(col("pr") <= bound)
    }
    for ((bound, strict) <- Seq((0.25, false), (0.25, true), (0.0, false))) {
      val want = withRuleOff(q(bound, strict).collect().toSeq.sortBy(_.toString))
      val rw = q(bound, strict)
      val got = rw.collect().toSeq.sortBy(_.toString)
      val plan = planString(rw)
      assert(plan.contains("graft_rank_k_rows"),
        s"rule did not fire for bound=$bound strict=$strict:\n$plan")
      assert(got == want, s"mismatch for bound=$bound strict=$strict")
      assert(got.nonEmpty)
    }
  }

  test("cume_dist() <= p rewrites with carried tie-group sizes") {
    def q(bound: Double) = {
      // quantity-only ordering ties heavily: cume_dist depends on the
      // tie-group END position, exercising the carried peer counts
      val w = Window.partitionBy("l_suppkey").orderBy(col("l_quantity").desc)
      Tables.lineitem(spark, sfDir)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity")
        .withColumn("cd", cume_dist().over(w)).filter(col("cd") <= bound)
    }
    for (bound <- Seq(0.3, 0.5)) {
      val want = withRuleOff(q(bound).collect().toSeq.sortBy(_.toString))
      val rw = q(bound)
      val got = rw.collect().toSeq.sortBy(_.toString)
      val plan = planString(rw)
      assert(plan.contains("graft_rank_k_rows"),
        s"rule did not fire for bound=$bound:\n$plan")
      assert(!plan.contains("Window"), s"window survived:\n$plan")
      assert(got == want, s"mismatch for bound=$bound")
      assert(got.nonEmpty)
    }
  }

  test("fraction rewrites handle a global (unpartitioned) window") {
    def q() = {
      val w = Window.orderBy(col("l_quantity").desc, col("l_orderkey").asc,
        col("l_linenumber").asc)
      Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .withColumn("pr", percent_rank().over(w)).filter(col("pr") <= 0.1)
    }
    val want = withRuleOff(q().collect().toSeq.sortBy(_.toString))
    val rw = q()
    val got = rw.collect().toSeq.sortBy(_.toString)
    assert(planString(rw).contains("graft_rank_k_rows"), planString(rw))
    assert(got == want && got.nonEmpty)
  }

  test("groupTopKRows carries arbitrary payload types and null sort keys") {
    val df = Seq(
      ("a", Some(3.0), "x1", Seq(1, 2)), ("a", Some(9.0), "x2", Seq(3)),
      ("a", None, "x3", Seq.empty[Int]), ("a", Some(7.0), "x4", Seq(4)),
      ("b", Some(1.0), "y1", Seq(5)))
      .toDF("g", "score", "tag", "payload")
    val got = TopK.groupTopKRows(df, Seq("g"),
        orderCols = Seq(("score", false), ("tag", true)), k = 2)
      .select("g", "posicao", "tag")
      .as[(String, Int, String)].collect().toSeq.sorted
    // desc with default nulls-last: null score never enters the top-2
    assert(got == Seq(("a", 1, "x2"), ("a", 2, "x4"), ("b", 1, "y1")))
  }

  test("groupTopKRows equals the window form on real data") {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    val got = TopK.groupTopKRows(li, Seq("l_suppkey"),
        Seq(("l_quantity", false), ("l_orderkey", true), ("l_linenumber", true)), 3, "rn")
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "rn")
      .collect().toSeq.sortBy(_.toString)
    val want = withRuleOff(topkDf.filter(col("rn") <= 3).collect().toSeq.sortBy(_.toString))
    assert(got == want)
  }
}
