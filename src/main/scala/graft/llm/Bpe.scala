package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** BPE tokenizer-vocabulary induction (Sennrich, Haddow & Birch, ACL
  * 2016 — the algorithm behind GPT-2/RoBERTa-class tokenizers):
  * iteratively merge the corpus's most frequent adjacent symbol pair,
  * starting from characters, until `numMerges` merges (or no pair
  * reaches `minFreq`). The learned artifact is the ORDERED merge table —
  * applying it greedily reproduces the tokenizer.
  *
  * Scale shape — the part that matters at 100 TB: the corpus is touched
  * exactly ONCE (token explode → word-count aggregation, map-side
  * combinable); every merge iteration then runs on the WORD VOCABULARY
  * (Heaps'-law sublinear in corpus size, ~10⁵–10⁶ rows for web corpora,
  * weighted by word counts), never the corpus. Per iteration: one
  * vocab-linear pair fan-out + combinable sum, a single-row argmax via
  * `orderBy.limit(1)` (TakeOrdered — only the top pair reaches the
  * driver, the k-means collect discipline), and a vocab-linear merge
  * application. Lineage is truncated with `localCheckpoint` every few
  * rounds — the apply step would otherwise stack `numMerges` nested
  * aggregate expressions into one unbounded plan.
  *
  * Determinism: ties on pair frequency break lexicographically
  * (left, right), so the merge sequence is identical under any
  * partitioning — property-checked against an independent single-node
  * replay in BpeSpec.
  */
object Bpe {

  /** End-of-word marker — its own symbol, per the paper (distinguishes
    * "est" mid-word from "est" at word end).
    */
  val EndOfWord = "</w>"

  /** Word → initial symbol array: characters plus the end marker. */
  def charSymbols(word: Column): Column =
    concat(filter(split(word, ""), s => s =!= ""), array(lit(EndOfWord)))

  /** (word, n, syms) vocabulary of the corpus — the ONE corpus-wide pass. */
  def vocab(docs: DataFrame, textCol: String): DataFrame =
    Spread(docs.select(col(textCol)))
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1L)).as("n"))
      .withColumn("syms", charSymbols(col("word")))

  /** Adjacent-pair weighted counts over a (n, syms) vocabulary. */
  private def pairCounts(v: DataFrame): DataFrame =
    v.select(col("n"), explode(arrays_zip(
        slice(col("syms"), lit(1), size(col("syms")) - 1),
        slice(col("syms"), lit(2), size(col("syms")) - 1))).as("p"))
      .select(col("p.0").as("left"), col("p.1").as("right"), col("n"))
      .groupBy("left", "right").agg(sum(col("n")).as("freq"))

  /** Replace every non-overlapping (left, right) adjacency with the
    * merged symbol, leftmost-first — one fold per word. After a merge the
    * accumulator's tail IS the merged symbol, so "aaa" under (a,a)
    * becomes [aa, a], exactly the paper's simultaneous re.sub semantics.
    */
  private def applyMerge(syms: Column, left: String, right: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 &&
          element_at(acc, -1) === lit(left) && x === lit(right),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(left + right))))
        .otherwise(concat(acc, array(x))))

  /** The ordered merge table: (merge_idx, left, right, freq). */
  def train(
      docs: DataFrame, textCol: String, numMerges: Int,
      minFreq: Long = 2L): DataFrame = {
    require(numMerges > 0, s"need numMerges > 0, got $numMerges")
    val spark = docs.sparkSession
    var v = vocab(docs, textCol).persist()
    v.count() // materialize before the loop (the corpus pass happens once)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val top = pairCounts(v)
        .orderBy(col("freq").desc, col("left").asc, col("right").asc)
        .limit(1).collect()
      if (top.isEmpty || top.head.getLong(2) < minFreq) done = true
      else {
        val (l, r, f) = (top.head.getString(0), top.head.getString(1),
          top.head.getLong(2))
        merges += ((i, l, r, f))
        val next = v.withColumn("syms", applyMerge(col("syms"), l, r))
        // truncate lineage every few rounds: each apply nests another
        // aggregate lambda into the plan; checkpointing keeps plan depth
        // (and codegen size) bounded like the k-means rounds
        val bounded =
          if ((i + 1) % 4 == 0) next.localCheckpoint(eager = true) else next
        val old = v
        v = bounded.persist()
        v.count()
        old.unpersist()
        i += 1
      }
    }
    v.unpersist()
    import spark.implicits._
    merges.toSeq.toDF("merge_idx", "left", "right", "freq")
  }

  /** Apply a learned merge table to text: tokenize, then fold each word
    * through the merges in order. Expression-composed (numMerges nested
    * folds) — the REFERENCE semantics and fine for the tens of merges
    * typical of tests/demos; production vocabularies (10k–50k merges)
    * go through [[segmentFast]], which is spec-proved equal.
    */
  def segment(
      docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val base = Spread(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("word"))
    val folded = merges.foldLeft(charSymbols(col("word"))) {
      case (syms, (l, r)) => applyMerge(syms, l, r)
    }
    base.select(col(idCol), col("word"), folded.as("symbols"))
  }

  /** Production segmenter: identical output to [[segment]], built for
    * real vocabularies. The merge table rides to the executors ONCE as a
    * broadcast rank map; each word goes through the standard min-rank
    * merge loop (Sennrich's `apply_bpe`, GPT-2's `bpe()`): repeatedly
    * merge the word's lowest-rank adjacent pair, leftmost-first
    * non-overlapping, until no pair is in the table. Per word that is
    * O(len²) hash probes INDEPENDENT of vocabulary size, where the fold
    * form pays O(numMerges · len) — and nests `numMerges` aggregate
    * lambdas into one Catalyst plan, which stops codegen-compiling
    * beyond a few dozen merges. `mapPartitions` is justified here the
    * same way as the binary codecs: no Catalyst expression can hold a
    * 50k-entry mutable rank table.
    *
    * Equivalence with the fold form: sequential exhaustive application
    * (merge 0 everywhere, then merge 1, …) equals the min-rank loop
    * whenever every merge's pair symbols are products of earlier merges
    * or base characters — true of every table [[train]] emits, and of
    * any properly learned BPE table. A merge can only create its own new
    * symbol, and that symbol cannot be an element of an EARLIER merge's
    * pair, so later merges never manufacture new occurrences of earlier
    * pairs; both strategies therefore apply exactly the same multiset of
    * merges to every word. Spec-proved equal on the Sennrich corpus and
    * on real documents (BpeSpec).
    *
    * A per-partition memo caches the loop per DISTINCT word (Zipf: the
    * bulk of token occurrences are repeats), capped so a pathological
    * vocabulary cannot grow executor memory unboundedly.
    */
  def segmentFast(
      docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val base = Spread(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("word"))
    val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.groupBy(_._1).map { case (p, vs) =>
        p -> vs.map(_._2).min // duplicate pair keeps its FIRST rank
      }
    val bc = docs.sparkSession.sparkContext.broadcast(ranks)
    val outSchema = base.schema
      .add("symbols", ArrayType(StringType, containsNull = true))
    base.mapPartitions { it =>
      val rk = bc.value
      val byRank = rk.map(_.swap) // rank → pair, built once per partition
      val memo = new java.util.HashMap[String, Seq[String]]()
      it.map { row =>
        val w = row.getString(1)
        var syms = memo.get(w)
        if (syms == null) {
          syms = bpeWord(w, rk, byRank)
          if (memo.size < (1 << 20)) memo.put(w, syms)
        }
        Row.fromSeq(row.toSeq :+ syms)
      }
    }(Encoders.row(outSchema))
  }

  /** One word through the min-rank merge loop. Initial symbols are CODE
    * POINTS (never split surrogate pairs — matches `split(word, "")`,
    * which is regex- and therefore code-point-based) plus the end
    * marker.
    */
  private def bpeWord(
      w: String, ranks: Map[(String, String), Int],
      byRank: Map[Int, (String, String)]): Seq[String] = {
    val init = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      init += w.substring(i, i + n)
      i += n
    }
    init += EndOfWord
    var word = init
    var scanning = word.length > 1
    while (scanning) {
      var best = Int.MaxValue
      var j = 0
      while (j < word.length - 1) {
        val r = ranks.getOrElse((word(j), word(j + 1)), Int.MaxValue)
        if (r < best) best = r
        j += 1
      }
      if (best == Int.MaxValue) scanning = false
      else {
        val (l, r) = byRank(best)
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var k = 0
        while (k < word.length) {
          if (k < word.length - 1 && word(k) == l && word(k + 1) == r) {
            out += (l + r); k += 2
          } else { out += word(k); k += 1 }
        }
        word = out
        scanning = word.length > 1
      }
    }
    word.toSeq
  }
}
