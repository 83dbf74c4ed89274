package graft

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.create()

    // Warm-up pass at the smallest SF: JIT-compiles the Catalyst/codegen/
    // parquet/shuffle machinery once so the measured pass times steady-state
    // operator cost, not first-query JVM warm-up. Timings from the warm-up
    // are discarded; failures there still surface in the measured pass.
    val names = SparkEntry.queries.keys.toSeq.sorted
    if (new java.io.File(warmDir).isDirectory) {
      for (name <- names) {
        try SparkEntry.queries(name)(spark, warmDir)
          .write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () } // reported from the measured pass
        finally llm.CacheScope.releaseAll()
      }
    }

    // A failed query must not fake a healthy wall time: record it in
    // "errors", log the trace, and count it as 0 s so the total is visibly
    // missing work rather than silently including a truncated run.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = names.map { name =>
      val t0 = System.nanoTime()
      // noop sink forces FULL computation of every output column —
      // count() would let the optimizer strip projections and sorts and
      // time little more than the scan.
      val ok =
        try { SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: $e")
            e.printStackTrace()
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
            false
        }
        finally llm.CacheScope.releaseAll()
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else 0.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) =>
      s"\"" + k + "\":\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"failed":${errors.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
