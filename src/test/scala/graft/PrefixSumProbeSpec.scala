package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch probe: prefixSum vs the single-partition window oracle. */
class PrefixSumProbeSpec extends SparkSpec {
  import spark.implicits._

  test("prefixSum equals the single-partition window on unique doubles") {
    val df = spark.range(0, 100000)
      .select((hash(col("id")).cast("double") / 7.0).as("__v"))
      .groupBy("__v").agg(count(lit(1L)).as("__cnt"))
    val got = graft.operators.Stats.prefixSum(df, "__v", "__cnt")
      .select("__v", "__below")
    val wBelow = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = df.withColumn("__below",
      coalesce(sum(col("__cnt")).over(wBelow), lit(0L)))
      .select("__v", "__below")
    val diff = got.as[(Double, Long)].collect().toMap
    val base = want.as[(Double, Long)].collect().toMap
    val bad = base.iterator.filter { case (v, b) => diff.get(v) != Some(b) }
      .take(5).toList
    assert(diff.size == base.size, s"sizes ${diff.size} vs ${base.size}")
    assert(bad.isEmpty, s"first mismatches: $bad vs ${bad.map(x => diff.get(x._1))}")
  }

  test("prefixSum equals the window on the q195 shape (lineitem price)") {
    val base = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select(col("l_returnflag").cast("string").as("__g"),
        col("l_extendedprice").cast("double").as("__v"))
      .filter(col("__g").isNotNull && col("__v").isNotNull)
      .transform(graft.llm.CacheScope.persistTracked)
    val counts = base.groupBy("__v").agg(count(lit(1L)).as("__cnt"))
    val got = graft.operators.Stats.prefixSum(counts, "__v", "__cnt")
      .select("__v", "__below")
    val wBelow = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = counts.withColumn("__below",
      coalesce(sum(col("__cnt")).over(wBelow), lit(0L)))
      .select("__v", "__below")
    val diff = got.as[(Double, Long)].collect().toMap
    val base2 = want.as[(Double, Long)].collect().toMap
    val bad = base2.iterator.filter { case (v, b) => diff.get(v) != Some(b) }
      .take(5).toList
    assert(diff.size == base2.size, s"sizes ${diff.size} vs ${base2.size}")
    assert(bad.isEmpty,
      s"first mismatches: $bad vs ${bad.map(x => diff.get(x._1))}")
  }
}
