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
  * `probe:` names run perf-probe VARIANTS of graded queries (degraded or
  * alternative internals) that must stay outside the graded contract.
  */
object SpotBench {

  /** Perf-probe variants — same inputs as their graded twins, internals
    * deliberately altered for attribution experiments.
    */
  private val probes: Map[String,
      (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
    // q27 with skew tiling DISABLED (maxBlock = Int.MaxValue → every
    // block takes the plain self-join path): isolates tiledPairs'
    // salting/explode overhead from the inherent pair-scoring cost
    "q27_no_tiling" -> { (s, dir) =>
      import org.apache.spark.sql.functions._
      import graft.sources.Tables
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val variants = docs.filter(col("doc_id") % 5 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000)
        .withColumn("text",
          concat_ws(" ", slice(llm.TextAnalysis.tokens(col("text")), 2, 100000)))
      llm.Dedup.simhashPairsPortable(
        docs.unionByName(variants), "doc_id", "text", maxHamming = 3,
        maxBlock = Int.MaxValue)
    },
    // IVF fit+route probes: flat vs two-level at the same TOTAL cell
    // count — the measurement behind Dedup.FlatCellLimit. Each probe
    // builds the index (k-means fit) and routes the whole corpus
    // (assignment argmin), the two costs the threshold trades: flat
    // pays O(cells·dim) per routed row with the centroid matrix as a
    // plan literal; hierarchical pays O((√cells+√cells)·dim) with
    // centroids in joined DataFrames.
    "ivf_flat_256" -> { (s, dir) =>
      import org.apache.spark.sql.functions._
      val emb = graft.sources.Tables.embeddings(s, dir)
      llm.Ivf.index(emb, "vec_id", "embedding", nCells = 256)
        .assigned.groupBy("__cell").count()
    },
    "ivf_hier_256" -> { (s, dir) =>
      import org.apache.spark.sql.functions._
      val emb = graft.sources.Tables.embeddings(s, dir)
      llm.Ivf.indexHierarchical(emb, "vec_id", "embedding",
          kCoarse = 16, kFine = 16)
        .assigned.groupBy("__cell").count()
    },
    "ivf_flat_1024" -> { (s, dir) =>
      import org.apache.spark.sql.functions._
      val emb = graft.sources.Tables.embeddings(s, dir)
      llm.Ivf.index(emb, "vec_id", "embedding", nCells = 1024)
        .assigned.groupBy("__cell").count()
    },
    "ivf_hier_1024" -> { (s, dir) =>
      import org.apache.spark.sql.functions._
      val emb = graft.sources.Tables.embeddings(s, dir)
      llm.Ivf.indexHierarchical(emb, "vec_id", "embedding",
          kCoarse = 32, kFine = 32)
        .assigned.groupBy("__cell").count()
    },
    "ivf_flat_4096" -> { (s, dir) =>
      import org.apache.spark.sql.functions._
      val emb = graft.sources.Tables.embeddings(s, dir)
      llm.Ivf.index(emb, "vec_id", "embedding", nCells = 4096)
        .assigned.groupBy("__cell").count()
    },
    "ivf_hier_4096" -> { (s, dir) =>
      import org.apache.spark.sql.functions._
      val emb = graft.sources.Tables.embeddings(s, dir)
      llm.Ivf.indexHierarchical(emb, "vec_id", "embedding",
          kCoarse = 64, kFine = 64)
        .assigned.groupBy("__cell").count()
    },
    // q146's wedge stage ALONE (ordering filter applied, closing join
    // dropped, wedges counted): attributes the query's cost between
    // O(E^1.5) pair generation and the closing probe
    "q146_wedges_only" -> { (s, dir) =>
      import org.apache.spark.sql.functions._
      import graft.sources.Tables
      val ps = Tables.lineitem(s, dir).filter(col("l_partkey") % 20 === 0)
        .select(col("l_partkey").as("p"), col("l_suppkey").as("sup"))
        .distinct()
      val und = ps.select(col("p"), col("sup").as("s1"))
        .join(ps.select(col("p"), col("sup").as("s2")), Seq("p"))
        .filter(col("s1") < col("s2"))
        .select(col("s1").as("a"), col("s2").as("b")).distinct()
      val deg = und.select(col("a").as("__v"))
        .unionByName(und.select(col("b").as("__v")))
        .groupBy("__v").agg(count(lit(1L)).as("__deg"))
      val withDeg = und
        .join(deg.select(col("__v").as("a"), col("__deg").as("__da")), Seq("a"))
        .join(deg.select(col("__v").as("b"), col("__deg").as("__db")), Seq("b"))
      val aFirst = col("__da") < col("__db") ||
        (col("__da") === col("__db") && col("a") < col("b"))
      val oriented = withDeg.select(
        when(aFirst, col("a")).otherwise(col("b")).as("u"),
        when(aFirst, col("b")).otherwise(col("a")).as("w"),
        when(aFirst, col("__db")).otherwise(col("__da")).as("__dw"))
      val wedge = oriented.select(col("u"), col("w").as("x"), col("__dw").as("__dx"))
        .join(oriented.select(col("u"), col("w").as("y"), col("__dw").as("__dy")),
          Seq("u"))
        .filter(col("__dx") < col("__dy") ||
          (col("__dx") === col("__dy") && col("x") < col("y")))
      wedge.agg(count(lit(1L)).as("wedges"))
    },
    // q146 through the closing probe but WITHOUT the per-vertex
    // explode+count: isolates the probe from the credit aggregation
    "q146_probe_only" -> { (s, dir) =>
      import org.apache.spark.sql.functions._
      import graft.sources.Tables
      val ps = Tables.lineitem(s, dir).filter(col("l_partkey") % 20 === 0)
        .select(col("l_partkey").as("p"), col("l_suppkey").as("sup"))
        .distinct()
      val und = ps.select(col("p"), col("sup").as("s1"))
        .join(ps.select(col("p"), col("sup").as("s2")), Seq("p"))
        .filter(col("s1") < col("s2"))
        .select(col("s1").as("a"), col("s2").as("b")).distinct()
      val deg = und.select(col("a").as("__v"))
        .unionByName(und.select(col("b").as("__v")))
        .groupBy("__v").agg(count(lit(1L)).as("__deg"))
      val withDeg = und
        .join(deg.select(col("__v").as("a"), col("__deg").as("__da")), Seq("a"))
        .join(deg.select(col("__v").as("b"), col("__deg").as("__db")), Seq("b"))
      val aFirst = col("__da") < col("__db") ||
        (col("__da") === col("__db") && col("a") < col("b"))
      val oriented = withDeg.select(
        when(aFirst, col("a")).otherwise(col("b")).as("u"),
        when(aFirst, col("b")).otherwise(col("a")).as("w"),
        when(aFirst, col("__db")).otherwise(col("__da")).as("__dw"))
        .transform(llm.CacheScope.persistTracked)
      val wedge = oriented.select(col("u"), col("w").as("x"), col("__dw").as("__dx"))
        .join(oriented.select(col("u"), col("w").as("y"), col("__dw").as("__dy")),
          Seq("u"))
        .filter(col("__dx") < col("__dy") ||
          (col("__dx") === col("__dy") && col("x") < col("y")))
      val close = oriented.select(
        xxhash64(col("u"), col("w")).as("__ck"),
        col("u").as("__cx"), col("w").as("__cy"))
      wedge.withColumn("__ck", xxhash64(col("x"), col("y")))
        .join(broadcast(close), Seq("__ck"))
        .filter(col("__cx") === col("x") && col("__cy") === col("y"))
        .agg(count(lit(1L)).as("triangles"))
    },
    // q206's 100 TB shape measured honestly, split the way a long-lived
    // corpus actually runs: fit/encode/index ONCE to a persisted
    // cell-partitioned encoded table (+ codebook/centroid tables), then
    // the query path alone against the stored artifacts — the rehearsal
    // curve the graded q206 (in-query fit) can't show.
    "pq_persist_build" -> { (s, dir) =>
      import org.apache.spark.sql.functions._
      val emb = graft.sources.Tables.embeddings(s, dir)
      val base = s"/tmp/graft-pqidx-${new java.io.File(dir).getName}"
      val model = llm.Pq.fit(emb, "vec_id", "embedding", m = 8, k = 16,
        samplePct = 30)
      val idx = llm.Ivf.index(emb, "vec_id", "embedding", nCells = 16,
        samplePct = 30)
      llm.Pq.encode(emb, "vec_id", "embedding", model)
        .join(idx.assigned.select("vec_id", "__cell"), Seq("vec_id"))
        .write.mode("overwrite").partitionBy("__cell")
        .parquet(s"$base/encoded")
      idx.centroids.write.mode("overwrite").parquet(s"$base/centroids")
      val cb = model.codebooks.zipWithIndex.flatMap { case (cents, sub) =>
        cents.zipWithIndex.map { case (c, j) => (sub, j, c) } }
      import s.implicits._
      cb.toDF("__sub", "__code", "__cent")
        .write.mode("overwrite").parquet(s"$base/codebook")
      s.read.parquet(s"$base/encoded").groupBy().count()
    },
    "pq_persist_query" -> { (s, dir) =>
      import org.apache.spark.sql.functions._
      val base = s"/tmp/graft-pqidx-${new java.io.File(dir).getName}"
      val emb = graft.sources.Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") % 200 === 0)
      val enc = s.read.parquet(s"$base/encoded")
      val idx = llm.Ivf.IvfIndex(
        enc.select(col("vec_id"), col("__cell")),
        s.read.parquet(s"$base/centroids"))
      // bounded collect: the codebook is m·k = 128 rows by construction
      val rows = s.read.parquet(s"$base/codebook")
        .orderBy("__sub", "__code").collect()
      val m = rows.map(_.getInt(0)).max + 1
      val codebooks = rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1)
        .map(_._2.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toSeq).toSeq)
      val model = llm.Pq.PqModel(m, codebooks.head.head.length, codebooks)
      llm.Pq.ivfAdcTopK(idx, model, enc.select("vec_id", "codes"), emb, q,
        "vec_id", "embedding", k = 10, nProbe = 6, shortlist = 100)
    })

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create()
    for (arg <- args) {
      if (arg.contains("=")) {
        val Array(k, v) = arg.split("=", 2)
        spark.conf.set(k, v)
        println(s"SPOT-CONF $k=$v")
      } else {
        val q = if (arg.startsWith("probe:")) probes(arg.stripPrefix("probe:"))
          else SparkEntry.queries(arg)
        val t0 = System.nanoTime()
        q(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        // blocking, same rationale as Bench: an async unpersist leaves
        // the previous run's blocks resident into the next timed run
        llm.CacheScope.releaseAll(blocking = true)
        // untimed heap compaction between queries, same as Bench: without
        // it a heavy query's old-gen pressure inflates every later timing
        // in the session (measured ×3 on q45 right after a q27 run) and
        // A/B comparisons read order effects, not code
        System.gc()
        println(f"SPOT $arg $sec%.2f s")
      }
    }
    spark.stop()
  }
}
