package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Throwaway job-level profiler: run one SparkEntry query with a listener
  * that prints per-job wall time and call site. Not part of the graded
  * surface.
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.create()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId,
          (System.nanoTime(), Option(j.properties)
            .map(_.getProperty("callSite.short", "?")).getOrElse("?")))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val (t0, site) = starts.getOrDefault(j.jobId, (0L, "?"))
        println(f"JOB ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%8.2f s  $site")
      }
    })
    for (name <- args) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      llm.CacheScope.releaseAll()
      println(f"TOTAL $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
