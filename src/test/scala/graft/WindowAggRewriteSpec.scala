package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.WindowAggRewrite
import graft.sources.Tables

/** The window-to-aggregate rewrite ([[WindowAggRewrite]]): full-frame
  * window aggregates (`sum(x) OVER (PARTITION BY p)`) replanned as a
  * per-group aggregation joined back, result-identical, window-free.
  *
  * Attached via `extraOptimizations` like [[graft.plans.WindowTopKRewrite]]
  * in its spec (the shared test session has no GraftExtensions).
  */
class WindowAggRewriteSpec extends SparkSpec {

  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ WindowAggRewrite
  }

  override def afterAll(): Unit = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == WindowAggRewrite)
    super.afterAll()
  }

  private def withRuleOff[T](body: => T): T = {
    spark.conf.set("spark.graft.windowAggRewrite.enabled", "false")
    try body finally spark.conf.set("spark.graft.windowAggRewrite.enabled", "true")
  }

  test("partitioned full-frame aggregates rewrite window-free, results exact") {
    def q() = {
      val w = Window.partitionBy("l_suppkey")
      Tables.lineitem(spark, sfDir)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity")
        .withColumn("grp_qty",
          sum(col("l_quantity").cast("decimal(28,3)")).over(w))
        .withColumn("grp_n", count(lit(1)).over(w))
        .withColumn("grp_max", max(col("l_quantity")).over(w))
    }
    val want = withRuleOff(q().collect().toSeq.sortBy(_.toString))
    val rw = q()
    val got = rw.collect().toSeq.sortBy(_.toString)
    val plan = planString(rw)
    assert(!plan.contains("Window"), s"window survived the rewrite:\n$plan")
    assert(plan.contains("Aggregate"), s"no aggregate in rewritten plan:\n$plan")
    assert(got == want && got.nonEmpty)
  }

  test("global (unpartitioned) totals rewrite to a single-row join") {
    def q() = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .withColumn("total_n", count(lit(1)).over(Window.partitionBy()))
    val want = withRuleOff(q().collect().toSeq.sortBy(_.toString))
    val rw = q()
    val got = rw.collect().toSeq.sortBy(_.toString)
    assert(!planString(rw).contains("Window"), planString(rw))
    assert(got == want && got.nonEmpty)
  }

  test("null group keys aggregate and join like a window's null partition") {
    def q() = Seq((Some(1L), 10.0), (Some(1L), 20.0), (None, 5.0), (None, 7.0))
      .toDF("k", "v")
      .withColumn("grp_sum",
        sum(col("v").cast("decimal(18,3)")).over(Window.partitionBy("k")))
    val want = withRuleOff(q().collect().toSeq.sortBy(_.toString))
    val got = q().collect().toSeq.sortBy(_.toString)
    assert(got == want)
    // the two null-key rows must share one group, not drop out of the join
    assert(got.count(_.isNullAt(0)) == 2)
  }

  test("first_value/last_value over ordered windows rewrite to struct extrema") {
    def q() = {
      // unique composite order → the window itself is deterministic, so
      // exact equality with the rewrite is well-defined
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_shipdate").asc, col("l_orderkey").asc, col("l_linenumber").asc)
      Tables.lineitem(spark, sfDir)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
        .withColumn("first_qty", first(col("l_quantity")).over(w))
        .withColumn("last_qty", last(col("l_quantity")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .withColumn("n", count(lit(1)).over(
          w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    }
    val want = withRuleOff(q().collect().toSeq.sortBy(_.toString))
    val rw = q()
    val got = rw.collect().toSeq.sortBy(_.toString)
    val plan = planString(rw)
    assert(!plan.contains("Window"), s"window survived:\n$plan")
    assert(got == want && got.nonEmpty)
  }

  test("descending nulls-last first_value rewrites with swapped extrema") {
    def q() = {
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_quantity").desc_nulls_last, col("l_orderkey").desc_nulls_last,
          col("l_linenumber").desc_nulls_last)
      Tables.lineitem(spark, sfDir)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity")
        .withColumn("top_qty", first(col("l_quantity")).over(w))
    }
    val want = withRuleOff(q().collect().toSeq.sortBy(_.toString))
    val rw = q()
    val got = rw.collect().toSeq.sortBy(_.toString)
    assert(!planString(rw).contains("Window"), planString(rw))
    assert(got == want && got.nonEmpty)
  }

  test("order-sensitive and ordered windows are left alone") {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_suppkey", "l_orderkey", "l_quantity")
    // first() depends on partition order — must NOT rewrite
    val firstQ = li.withColumn("f",
      first(col("l_quantity")).over(Window.partitionBy("l_suppkey")))
    assert(planString(firstQ).contains("Window"))
    // an ORDER BY makes the frame running, not full — must NOT rewrite
    val running = li.withColumn("r",
      sum(col("l_quantity")).over(
        Window.partitionBy("l_suppkey").orderBy("l_orderkey")))
    assert(planString(running).contains("Window"))
    // running last_value is the current peer group's last, not the
    // group's — must NOT rewrite
    val runningLast = li.withColumn("rl",
      last(col("l_quantity")).over(
        Window.partitionBy("l_suppkey").orderBy("l_orderkey")))
    assert(planString(runningLast).contains("Window"))
    // mixed sort directions have no single struct extremum — left alone
    val mixed = li.withColumn("m",
      first(col("l_quantity")).over(
        Window.partitionBy("l_suppkey")
          .orderBy(col("l_orderkey").asc, col("l_quantity").desc)))
    assert(planString(mixed).contains("Window"))
  }
}
