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
    val want = Seq.newBuilder[(Int, String, String, Long)]
    for (i <- 0 until 10) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, n) <- vocab; j <- 0 until syms.length - 1)
        pairs((syms(j), syms(j + 1))) =
          pairs.getOrElse((syms(j), syms(j + 1)), 0L) + n
      val ((l, r), f) = pairs.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.head
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

  test("minFreq stops the loop before degenerate merges") {
    val docs = Seq("a b").toDF("text")
    // every pair occurs once — below the default minFreq of 2
    val got = Bpe.train(docs, "text", numMerges = 5).collect()
    assert(got.isEmpty)
  }
}
