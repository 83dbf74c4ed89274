package graft

/** Print the executed plan of named queries (plan-audit loop). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.create()
    for (name <- args) {
      println(s"===== $name =====")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      llm.CacheScope.releaseAll()
    }
    spark.stop()
  }
}

/** Time named queries with the noop sink. Args containing `=` are session
  * conf sets applied IN ORDER, so one invocation can A/B an optimizer
  * toggle: `SpotBench q92 spark.graft.topkRewrite.enabled=false q92`.
  */
object SpotBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create()
    for (arg <- args) {
      if (arg.contains("=")) {
        val Array(k, v) = arg.split("=", 2)
        spark.conf.set(k, v)
        println(s"SPOT-CONF $k=$v")
      } else {
        val t0 = System.nanoTime()
        SparkEntry.queries(arg)(spark, sfDir).write.format("noop").mode("overwrite").save()
        llm.CacheScope.releaseAll()
        println(f"SPOT $arg ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
