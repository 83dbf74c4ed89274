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
        // BLOCKING release: async unpersist (the default) lets the
        // warm-up run's cached blocks — at sf10/q181 that is ~GBs of
        // shingle arrays — stay resident into the adjacent measured
        // run, whose old-gen pressure then makes the SECOND run slower
        // than the first (r11 §4: 321.8 → 501.1 s). Waiting here is
        // untimed by construction.
        llm.CacheScope.releaseAll(blocking = true)
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

    // Warm-up is PER-QUERY and ADJACENT: each query runs once discarded,
    // then once measured, back to back. The old protocol (one full
    // warm-up pass, then one full measured pass) stopped measuring
    // steady state once the surface grew past ~50 queries: Spark's
    // generated-class cache is a fixed ~100-entry LRU, so with 199
    // queries there were ~198 executions between a query's warm-up and
    // its measured run — every query's codegen classes were evicted and
    // the "measured" run paid full compilation again. Measured: q169 at
    // sf0.1 ran 13.4 s cold vs 5.5 s warm (the r10 driver bench's
    // unexplained 6.1→14.0 s step was exactly this, triggered by the
    // query count crossing the cache capacity, not by any code change).
    // Adjacent warm-up restores the steady-state contract at identical
    // total cost (still 2n executions), independent of surface size.
    // Warm-up runs at the MEASURED scale factor — a smaller-SF warm-up
    // was observed to leave per-query codegen artifacts of ~10 s.
    //
    // A failed query must not fake a healthy wall time: record it in
    // "errors", log the trace, and count it as 0 s so the total is visibly
    // missing work rather than silently including a truncated run.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = names.map { name =>
      runOne(name) // discarded warm-up, timings from the adjacent rerun
      runOne(name) match {
        case Right(sec) => name -> sec
        case Left(msg) => errors(name) = msg; name -> 0.0
      }
    }
    val total = results.map(_._2).sum

    // Full-precision, full-name record → a sidecar file (humans + the
    // per-round regression diff read this). Error text UNtruncated here —
    // this is the one artifact meant to keep the whole message; the
    // stdout line below carries a 120-char cut so a stack trace cannot
    // blow the capture window.
    val qsFull = results.map { case (k, v) => Json.quote(k) + ":" + v }
      .mkString("{", ",", "}")
    val errJsonFull = errors.map { case (k, v) => Json.quote(k) + ":" + Json.quote(v) }
      .mkString("{", ",", "}")
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qsFull,"errors":$errJsonFull,"failed":${errors.size},"sf":"$sfDir"}"""
    try {
      val out = java.nio.file.Paths.get("target", "bench_full.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out, (fullLine + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable => System.err.println(s"[bench] sidecar write failed: $e") }

    // Stdout line — the harness captures only the final ~2000 chars of the
    // run's COMBINED output, stderr included, with sbt's ~73-char
    // `[success]` epilogue inside the same window. Four consecutive
    // rounds of `parsed: null` proved arithmetic: ANY per-query map
    // (~10 chars/query × 199 queries ≈ 1,940 chars) cannot survive
    // query growth inside that budget. So the stdout record is
    // TOTAL-ONLY (~100 chars, immune to query-count growth); the
    // per-query map at full precision lives in the bench_full.json
    // sidecar written above, which the per-round regression diff and
    // SpotBench workflows read. Error names only (no messages) when
    // non-empty, capped at 5, so even a mass failure stays in-window.
    def ms(v: Double): String = { // locale-safe: Long/Double toString only
      if (v >= 9.95) math.round(v).toString
      else {
        val d = math.max(math.round(v * 10), 1L)
        if (d % 10 == 0) (d / 10).toString else (d / 10.0).toString
      }
    }
    val errField =
      if (errors.isEmpty) ""
      else {
        val names = errors.keys.take(5).map(Json.quote).mkString("[", ",", "]")
        s""","errors":$names"""
      }
    val sfName = new java.io.File(sfDir).getName
    spark.stop()
    // Bypass sbt's logger: under a non-forked `sbt runMain`, System.out is
    // replaced by sbt's log stream, which prefixes every line with
    // `[info] ` — and three rounds of driver artifacts stored
    // `"parsed": null` against that framing. Writing straight to file
    // descriptor 1 lands the line RAW at column 0 in the combined output
    // (no prefix, nothing else appended on the same line), which is what
    // a `json.loads(line)`-per-line parser needs. Printed exactly once:
    // the capture window is ~2000 chars of combined output, so a second
    // (prefixed) copy would push this one's head out of the window.
    val rawStdout = new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.out), true, "UTF-8")
    rawStdout.println(s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries_n":${results.size}$errField,"failed":${errors.size},"sf":"$sfName"}""")
    rawStdout.flush()
  }
}
