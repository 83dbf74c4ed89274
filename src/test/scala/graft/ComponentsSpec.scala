package graft

import graft.llm.Components

/** Connected components over pair lists: planted shapes (chains are the
  * worst case for naive propagation, cycles test dedup, hubs test the
  * no-collect_list skew bound) verified against an in-memory union-find
  * ground truth.
  */
class ComponentsSpec extends SparkSpec {

  import spark.implicits._

  private def groundTruth(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val got = Components.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    graft.llm.CacheScope.releaseAll()
    got
  }

  test("long chain collapses to its minimum (worst case for naive propagation)") {
    val chain = (0L until 200L).map(i => (i, i + 1))
    val got = run(chain)
    assert(got.size == 201 && got.values.toSet == Set(0L))
  }

  test("cycles, hubs and multiple components match union-find ground truth") {
    val edges = Seq[(Long, Long)](
      (1, 2), (2, 3), (3, 1), // cycle
      (10, 11), (10, 12), (10, 13), (13, 14), // hub + tail
      (100, 200), (200, 100), (200, 100), // duplicate + reversed edges
      (7, 7), // self loop must be ignored
      (1000, 999)) // reversed order pair
    val got = run(edges)
    val truth = groundTruth(edges.filter(e => e._1 != e._2))
    assert(got == truth)
  }

  test("merging two chains through a late bridge stays exact") {
    val edges = (0L until 50L).map(i => (i, i + 1)) ++
      (100L until 150L).map(i => (i, i + 1)) ++
      Seq((49L, 101L)) // bridge joins both chains into one component
    val got = run(edges)
    assert(got.values.toSet == Set(0L))
    assert(got.size == 102)
  }

  test("empty and single-pair inputs") {
    assert(run(Seq.empty) == Map.empty)
    assert(run(Seq((5L, 3L))) == Map(5L -> 3L, 3L -> 3L))
  }

  test("keepBestPerCluster: argmax survivor, id tiebreak, singleton passthrough") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val scored = Seq(
      (1L, 0.5), (2L, 0.9), (3L, 0.7), // chain cluster: 2 wins on score
      (10L, 0.4), (11L, 0.4),          // tie: smaller id 10 wins
      (20L, 0.1),                      // singleton survives untouched
    ).toDF("doc_id", "qualidade")
    val out = graft.llm.Components
      .keepBestPerCluster(pairs, scored, "doc_id", "qualidade")
      .select("cluster_id", "doc_id", "qualidade", "membros")
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(out == Set(
      (1L, 2L, 0.9, 3L), (10L, 10L, 0.4, 2L), (20L, 20L, 0.1, 1L)))
  }

  test("keepBestPerCluster drops no cluster and keeps exactly one doc each") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val edges = (0L until 40L by 2L).map(i => (i, i + 1))
    val pairs = edges.toDF("id_a", "id_b")
    val scored = (0L until 50L).map(i => (i, (i % 7).toDouble)).toDF("doc_id", "qualidade")
    val out = graft.llm.Components
      .keepBestPerCluster(pairs, scored, "doc_id", "qualidade")
    // 20 pair clusters + 10 singletons (40..49)
    assert(out.count() == 30L)
    assert(out.select("doc_id").distinct().count() == 30L)
  }

  test("pageRank: symmetric cycle stays uniform, hubs outrank leaves, " +
      "mass conserved, partition-independent") {
    import spark.implicits._
    // 3-cycle: perfectly symmetric, every iteration keeps rank = 1/3
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val cr = Components.pageRank(cycle, "src", "dst", iters = 3)
      .as[(Long, Double)].collect().toMap
    graft.llm.CacheScope.releaseAll()
    assert(cr.size == 3 && cr.values.forall(r => math.abs(r - 1.0 / 3) < 1e-15),
      s"symmetry must keep the cycle uniform: $cr")

    // star: every leaf points at the hub; hub must outrank all leaves,
    // and total mass stays 1 (dangling hub redistributes)
    val star = (2L to 9L).map(l => (l, 1L)).toDF("src", "dst")
    val sr = Components.pageRank(star, "src", "dst", iters = 3)
      .as[(Long, Double)].collect().toMap
    graft.llm.CacheScope.releaseAll()
    assert(sr(1L) > sr(2L), s"hub must outrank leaves: $sr")
    assert((2L to 9L).map(sr).toSet.size == 1, "leaves are symmetric")
    assert(math.abs(sr.values.sum - 1.0) < 1e-9,
      s"mass must be conserved, got ${sr.values.sum}")

    // bit-determinism under partitioning
    val a = Components.pageRank(star.repartition(7), "src", "dst", 3)
      .as[(Long, Double)].collect().toSet
    graft.llm.CacheScope.releaseAll()
    assert(a == sr.toSet, "ranks must not depend on partition layout")
  }

  test("kCore: pendants peel, cascades propagate, empty core when k " +
      "exceeds every subgraph's cohesion") {
    // K4 on {1,2,3,4} with pendants 5-1 and 6-2: the 3-core is exactly K4
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 1L), (6L, 2L)).toDF("src", "dst")
    val core3 = Components.kCore(k4, "src", "dst", k = 3)
      .as[(Long, Long)].collect().toSet
    assert(core3 == Set((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)),
      s"3-core of K4+pendants must be K4: $core3")

    // triangle {1,2,3} + chain 3-4-5: for k=2 vertex 5 peels first, THEN
    // 4 falls below — the cascade must run to the fixpoint
    val chain = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val core2 = Components.kCore(chain, "src", "dst", k = 2)
      .as[(Long, Long)].collect().toSet
    assert(core2 == Set((1L, 2L), (2L, 2L), (3L, 2L)),
      s"cascade must peel 5 then 4, leaving the triangle: $core2")

    assert(Components.kCore(k4, "src", "dst", k = 4).isEmpty,
      "no 4-core exists in K4 + pendants")
  }

  test("kCore incremental degree maintenance matches a brute-force peel " +
      "on a deterministic pseudo-random graph (round-16 cross-check)") {
    // ~60-vertex graph with hash-derived edges: multi-round cascades,
    // duplicate/reversed edges, vertices whose every edge peels away
    // (the grau-0 ghost case), and a surviving dense core
    val raw = (0L until 400L).map { i =>
      val a = (i * 2654435761L) % 60L
      val b = (i * 40503L + 7L) % 60L
      (a, b)
    } ++ (0L until 10L).flatMap(i => (0L until 10L).map(j => (i, j)))
    val edges = raw.filter { case (a, b) => a != b }.toDF("src", "dst")
    for (k <- Seq(2, 5, 9, 12)) {
      val got = Components.kCore(edges, "src", "dst", k = k)
        .as[(Long, Long)].collect().toMap
      graft.llm.CacheScope.releaseAll()
      // reference: in-memory peel over the canonical undirected edge set
      var und = raw.filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      var changed = true
      while (changed) {
        val deg = und.flatMap { case (a, b) => Seq(a, b) }
          .groupBy(identity).map { case (v, n) => v -> n.size.toLong }
        val weak = deg.filter(_._2 < k).keySet
        changed = weak.nonEmpty
        und = und.filter { case (a, b) => !weak(a) && !weak(b) }
      }
      val want = und.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).map { case (v, n) => v -> n.size.toLong }
      assert(got == want, s"k=$k core mismatch: got $got want $want")
    }
  }

  test("triangleCount: K4 has 3 triangles per vertex; paths have none; " +
      "reversed/duplicate/self-loop edges are normalized away") {
    import spark.implicits._
    val k4 = Seq(
      (1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), // reversed dup of (1,2)
      (2L, 3L), (2L, 4L), (3L, 4L), (3L, 3L), // self-loop
    ).toDF("src", "dst")
    val got = Components.triangleCount(k4, "src", "dst")
      .as[(Long, Long)].collect().toMap
    graft.llm.CacheScope.releaseAll()
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"got $got")
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    assert(Components.triangleCount(path, "src", "dst").count() == 0L,
      "a path holds no triangles")
    graft.llm.CacheScope.releaseAll()
  }

  test("bfsLevels: min hop level from any seed, undirected edges, " +
      "depth cap excludes the far tail, isolated seeds report 0") {
    import spark.implicits._
    // path 1-2-3-4-5 (edge 3-2 stored REVERSED to prove undirectedness)
    val edges = Seq((1L, 2L), (3L, 2L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val seeds = Seq(1L, 5L, 9L).toDF("seed") // 9 touches no edge
    val got = Components
      .bfsLevels(edges, "src", "dst", seeds, "seed", maxDepth = 2)
      .as[(Long, Long)].collect().toMap
    // 3 is reachable at hop 2 from BOTH seeds; 9 is an isolated seed
    assert(got == Map(1L -> 0L, 5L -> 0L, 9L -> 0L,
      2L -> 1L, 4L -> 1L, 3L -> 2L), s"got $got")
    // depth 1 drops the middle vertex entirely
    val d1 = Components
      .bfsLevels(edges, "src", "dst", seeds, "seed", maxDepth = 1)
      .as[(Long, Long)].collect().toMap
    assert(!d1.contains(3L) && d1(2L) == 1L && d1(4L) == 1L, s"got $d1")
    graft.llm.CacheScope.releaseAll()
  }
}
