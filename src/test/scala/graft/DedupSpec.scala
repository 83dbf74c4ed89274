package graft

import org.apache.spark.sql.functions._

import graft.llm.{Dedup, TextAnalysis}
import graft.sources.Tables

class DedupSpec extends SparkSpec {

  import spark.implicits._

  test("exactDedup keeps exactly the min-id row per duplicate text") {
    val df = Seq(
      (1L, "alpha beta"), (2L, "alpha beta"), (3L, "gamma"),
      (10L, "alpha beta"), (4L, "delta"),
    ).toDF("id", "text")
    val out = Dedup.exactDedup(df, "text", "id")
      .as[(Long, String)].collect().toSet
    assert(out == Set((1L, "alpha beta"), (3L, "gamma"), (4L, "delta")))
  }

  test("jaccard matches hand computation") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    val j = df.select(Dedup.jaccard(col("x"), col("y"))).as[Double].head()
    assert(math.abs(j - 2.0 / 4.0) < 1e-12)
  }

  test("minhash-LSH recall >= 0.9 on planted near-duplicates") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val variants = docs.filter(col("doc_id") % 5 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000)
      .withColumn("text",
        concat_ws(" ", slice(TextAnalysis.tokens(col("text")), 2, 100000)))
    val planted = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id")).as[Long].collect().toSet
    val pairs = Dedup.minhashNearDups(
        docs.unionByName(variants), "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val found = planted.count(id => pairs.contains((id, id + 1000000)))
    val recall = found.toDouble / planted.size
    assert(recall >= 0.9, s"recall $recall over ${planted.size} planted pairs")
  }

  test("simhash: identical docs collide at hamming 0; near-dups stay close") {
    val docs = Seq(
      (1L, "spark scans parquet files fast and well"),
      (2L, "spark scans parquet files fast and well"),
      (3L, "completely different words entirely here now"),
    ).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .as[(Long, Long, Int)].collect()
    assert(pairs.exists { case (a, b, h) => a == 1L && b == 2L && h == 0 })
    assert(!pairs.exists { case (a, b, _) => b == 3L || a == 3L })
  }

  test("embedding near-dup finds planted co-directional vectors only") {
    val df = Seq(
      (1L, 0, Seq(1.0f, 0.0f, 2.0f)),
      (2L, 0, Seq(2.0f, 0.0f, 4.0f)),   // same direction as 1
      (3L, 0, Seq(-1.0f, 5.0f, 0.0f)),  // far from 1 and 2
      (4L, 1, Seq(1.0f, 0.0f, 2.0f)),   // same direction as 1 but other block
    ).toDF("vec_id", "label", "embedding")
    val pairs = Dedup.embeddingNearDups(df, "vec_id", "embedding", "label", 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("simhash64 is deterministic and order-insensitive over token sets") {
    val df = Seq(
      (1L, "one two three four"),
      (2L, "four three two one"),
    ).toDF("doc_id", "text")
    val out = df.select(Dedup.simhash64(TextAnalysis.tokens(col("text"))))
      .as[Long].collect()
    assert(out(0) == out(1))
  }
}
