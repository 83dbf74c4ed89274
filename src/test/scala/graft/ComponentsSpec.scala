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
}
