package graft

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create()

    val names = SparkEntry.queries.keys.toSeq.sorted

    def runOne(name: String): Either[String, Double] = {
      val t0 = System.nanoTime()
      // noop sink forces FULL computation of every output column —
      // count() would let the optimizer strip projections and sorts and
      // time little more than the scan.
      try {
        SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        Right((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: $e")
          e.printStackTrace()
          Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
      } finally {
        llm.CacheScope.releaseAll()
        // Untimed heap compaction BETWEEN queries: ~190 sequential query
        // executions in one JVM let old-gen pressure from earlier queries
        // inflate later ones (r6 recorded q45 at 23.5 s in the marathon vs
        // 5.4 s isolated at the same SF — the operator scales ×3.8 at ×10
        // data, the other ×4 was inherited heap state). A real cluster
        // gives each job fresh executors; this biases each query's wall
        // time to its own work. Runs after timing capture — never counted.
        System.gc()
      }
    }

    // Warm-up = a full first pass at the MEASURED scale factor: JIT, codegen
    // and regex compilation happen against the exact expression trees and
    // data shapes the measured pass will run, so steady-state operator cost
    // is what gets recorded (a smaller-SF warm-up was observed to leave
    // per-query codegen artifacts of ~10 s in the record). Warm-up timings
    // are discarded; failures surface from the measured pass.
    for (name <- names) runOne(name)

    // A failed query must not fake a healthy wall time: record it in
    // "errors", log the trace, and count it as 0 s so the total is visibly
    // missing work rather than silently including a truncated run.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = names.map { name =>
      runOne(name) match {
        case Right(sec) => name -> sec
        case Left(msg) => errors(name) = msg; name -> 0.0
      }
    }
    val total = results.map(_._2).sum

    // Full-precision, full-name record → a sidecar file (humans + the
    // per-round regression diff read this).
    val qsFull = results.map { case (k, v) => Json.quote(k) + ":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => Json.quote(k) + ":" + Json.quote(v.take(120)) }
      .mkString("{", ",", "}")
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qsFull,"errors":$errJson,"failed":${errors.size},"sf":"$sfDir"}"""
    try {
      val out = java.nio.file.Paths.get("target", "bench_full.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out, (fullLine + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable => System.err.println(s"[bench] sidecar write failed: $e") }

    // Stdout line — the harness captures only the final ~2000 chars of the
    // run's output (r6/r7 artifacts stored parsed:null because 99 full
    // query names at nanosecond precision overflowed that tail). Short
    // `qNN` keys (the names' unique numeric prefixes) at millisecond
    // precision keep the whole line ≈1.3 KB so it always lands inside the
    // captured window, sbt's `[success]` trailer included.
    def shortKey(name: String): String = {
      val p = name.takeWhile(_ != '_')
      if (p.matches("q\\d+")) p else name
    }
    def ms(v: Double): String = (math.round(v * 1000) / 1000.0).toString // locale-safe
    val qsShort = results.map { case (k, v) => Json.quote(shortKey(k)) + ":" + ms(v) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qsShort,"errors":$errJson,"failed":${errors.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
