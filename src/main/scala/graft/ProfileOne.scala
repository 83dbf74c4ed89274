package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Throwaway job/stage-level profiler: run one SparkEntry query with a
  * listener that prints per-job wall time and, per completed stage, the
  * summed task time, record counts and shuffle volumes with the stage's
  * call site. Not part of the graded surface.
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
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val tm = si.taskMetrics
        val wall = (for { s <- si.submissionTime; c <- si.completionTime }
          yield (c - s) / 1e3).getOrElse(-1.0)
        println(f"STAGE ${si.stageId}%4d wall=$wall%7.2f s tasks=${si.numTasks}%4d " +
          f"run=${tm.executorRunTime / 1e3}%8.2f s " +
          f"in=${tm.inputMetrics.recordsRead}%10d " +
          f"sRead=${tm.shuffleReadMetrics.recordsRead}%10d " +
          f"sWrite=${tm.shuffleWriteMetrics.recordsWritten}%10d  " +
          si.name.take(90))
      }
    })
    for (name <- args) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      llm.CacheScope.releaseAll(blocking = true)
      System.gc()
      println(f"TOTAL $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
