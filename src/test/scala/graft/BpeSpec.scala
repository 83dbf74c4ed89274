package graft

import org.apache.spark.sql.functions._

import graft.llm.Bpe
import graft.sources.Tables

class BpeSpec extends SparkSpec {

  import spark.implicits._

  test("canonical Sennrich corpus learns the textbook merge sequence") {
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).toDF("text")
    val got = Bpe.train(docs, "text", numMerges = 6)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (0, "e", "s", 9L), (1, "es", "t", 9L), (2, "est", "</w>", 9L),
      (3, "l", "o", 7L), (4, "lo", "w", 7L), (5, "e", "w", 6L)))
  }

  test("merge table equals an independent single-node replay on real docs") {
    val docs = Tables.documents(spark, sfDir).select("text")
    val got = Bpe.train(docs, "text", numMerges = 10)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq

    // independent replay: plain Scala BPE over the word counts
    val words = docs.select(explode(
        llm.TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy("w").count().as[(String, Long)].collect()
    var vocab: Map[Vector[String], Long] = words.toSeq
      .map { case (w, n) =>
        (w.toCharArray.map(_.toString).toVector :+ Bpe.EndOfWord) -> n }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    // tie-break comparator in CODE-POINT order — Spark's UTF8String
    // binary ordering — not Java's UTF-16-unit compareTo; the two
    // diverge for supplementary-plane symbols, and the replay must
    // mirror the engine
    def cpLt(a: String, b: String): Boolean = {
      val (ai, bi) = (a.codePoints().toArray, b.codePoints().toArray)
      val n = math.min(ai.length, bi.length)
      var i = 0
      while (i < n) { if (ai(i) != bi(i)) return ai(i) < bi(i); i += 1 }
      ai.length < bi.length
    }
    val want = Seq.newBuilder[(Int, String, String, Long)]
    for (i <- 0 until 10) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, n) <- vocab; j <- 0 until syms.length - 1)
        pairs((syms(j), syms(j + 1))) =
          pairs.getOrElse((syms(j), syms(j + 1)), 0L) + n
      val ((l, r), f) = pairs.toSeq
        .sortWith { case (((a1, b1), c1), ((a2, b2), c2)) =>
          if (c1 != c2) c1 > c2
          else if (a1 != a2) cpLt(a1, a2)
          else cpLt(b1, b2)
        }.head
      want += ((i, l, r, f))
      vocab = vocab.toSeq.map { case (syms, n) =>
        val out = Vector.newBuilder[String]
        var k = 0
        while (k < syms.length) {
          if (k < syms.length - 1 && syms(k) == l && syms(k + 1) == r) {
            out += (l + r); k += 2
          } else { out += syms(k); k += 1 }
        }
        out.result() -> n
      }.groupBy(_._1).map { case (k2, vs) => k2 -> vs.map(_._2).sum }
    }
    assert(got == want.result())
  }

  test("segment applies the learned merges greedily ('lowest' splits low|est</w>)") {
    val merges = Seq(("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o"), ("lo", "w"))
    val out = Bpe.segment(
        Seq((1L, "lowest")).toDF("doc_id", "text"), "doc_id", "text", merges)
      .as[(Long, String, Seq[String])].collect().head
    assert(out == ((1L, "lowest", Seq("low", "est</w>"))))
  }

  test("segmentFast equals the fold form on the Sennrich corpus") {
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).toDF("text")
    val merges = Bpe.train(docs, "text", numMerges = 6)
      .as[(Int, String, String, Long)].collect().sortBy(_._1)
      .map(m => (m._2, m._3)).toSeq
    // segment BOTH seen and unseen words (unseen exercises partial
    // merges and the no-applicable-pair exit)
    val probe = Seq((1L, "low lower lowest newest widest news wide ow"))
      .toDF("doc_id", "text")
    val slow = Bpe.segment(probe, "doc_id", "text", merges)
      .as[(Long, String, Seq[String])].collect().sortBy(_._2).toSeq
    val fast = Bpe.segmentFast(probe, "doc_id", "text", merges)
      .as[(Long, String, Seq[String])].collect().sortBy(_._2).toSeq
    assert(fast == slow, s"fast $fast\nslow $slow")
  }

  test("segmentFast equals the fold form on real documents") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").limit(40)
    val merges = Bpe.train(docs, "text", numMerges = 10)
      .as[(Int, String, String, Long)].collect().sortBy(_._1)
      .map(m => (m._2, m._3)).toSeq
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, String, Seq[String])].collect()
        .sortBy(t => (t._1, t._2)).toSeq
    val slow = norm(Bpe.segment(docs, "doc_id", "text", merges))
    val fast = norm(Bpe.segmentFast(docs, "doc_id", "text", merges))
    assert(fast == slow)
    assert(fast.nonEmpty && fast.exists(_._3.size > 1))
  }

  test("segmentFast takes a 10k-merge table without plan blow-up") {
    // the fold form would nest 10k aggregate lambdas into one Catalyst
    // plan here; the broadcast rank map never touches the plan at all
    val noise = (0 until 9998).map(i => (s"x$i", s"y$i"))
    val merges = Seq(("a", "b"), ("ab", Bpe.EndOfWord)) ++ noise
    val out = Bpe.segmentFast(
        Seq((1L, "ab ba")).toDF("doc_id", "text"), "doc_id", "text", merges)
      .as[(Long, String, Seq[String])].collect().sortBy(_._2).toSeq
    assert(out == Seq(
      (1L, "ab", Seq("ab" + Bpe.EndOfWord)),
      (1L, "ba", Seq("b", "a", Bpe.EndOfWord))))
  }

  test("minFreq stops the loop before degenerate merges") {
    val docs = Seq("a b").toDF("text")
    // every pair occurs once — below the default minFreq of 2
    val got = Bpe.train(docs, "text", numMerges = 5).collect()
    assert(got.isEmpty)
  }
}
