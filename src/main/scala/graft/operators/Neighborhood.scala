package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sorted-neighborhood blocking (Hernández & Stolfo, SIGMOD 1995 — the
  * merge/purge method): sort every record by a domain sort key and emit
  * each pair of records that lie within `window` positions of each other
  * in that GLOBAL order. The classic third member of the candidate-
  * generation family next to equality blocking ([[Linkage.fuzzyPairs]])
  * and deletion neighborhoods ([[Linkage.editJoinDeletes]]): blocking
  * misses pairs that straddle a key boundary; SNM's sliding window
  * catches exactly those, and the candidate count is bounded by
  * construction at n·(window−1) — LINEAR in the corpus, no key-entropy
  * tuning, no quadratic block to tile.
  *
  * The scale story is the rank engine. SNM needs each record's global
  * position, and the naive `row_number()` over an unpartitioned window
  * is a single-task sort. Here the rank is computed the way Spark's own
  * `orderBy` sorts at scale: one RANGE exchange on (key, id), a
  * row_number per PARTITION (task-bounded), and a partition-offset table
  * of exactly numPartitions rows folded with one bounded cumulative
  * window and broadcast back. No task ever sees more than its range
  * slice; the result is the exact global rank in the (key, id) total
  * order — deterministic regardless of where the sampled range
  * boundaries fall, because the ORDER is total (ids unique by contract).
  *
  * Pairing never self-joins on rank inequality (that's a range join):
  * ranks bucket into bands of `window−1` consecutive positions, so two
  * rows within distance < window sit in the same or adjacent bands. The
  * left side claims its own band and the next; one equi-join on the
  * claimed band + the distance filter emits each pair exactly once.
  * Band population is window−1 rows by construction — the join is
  * perfectly balanced, skew-proof at any corpus size.
  *
  * Output: (id_a, id_b, key_a, key_b, dist) with rank_a < rank_b,
  * dist = rank_b − rank_a ∈ [1, window−1].
  */
object Neighborhood {

  /** Exact global rank in the (sortKey, id) total order, distributed:
    * range exchange → per-partition row_number → numPartitions-row
    * offset fold. Returns df columns + `__rank` (1-based).
    */
  private[graft] def globalRank(
      df: DataFrame, idCol: String, sortKey: Column): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sessionState.conf.numShufflePartitions
    val ranged = df
      .withColumn("__k", sortKey)
      .repartitionByRange(p, col("__k"), col(idCol))
      .sortWithinPartitions(col("__k"), col(idCol))
      .withColumn("__part", spark_partition_id())
    val wLocal = Window.partitionBy("__part")
      .orderBy(col("__k"), col(idCol))
    // PERSISTED: local is consumed twice (offsets + the join), and
    // repartitionByRange SAMPLES its boundaries per evaluation — two
    // un-shared evaluations can disagree, making the offsets lie about
    // the main side's partition ids (the round-14 prefixSum lesson,
    // measured as piecewise-constant rank errors). The cache pins ONE
    // range shuffle for every consumer.
    val local = graft.llm.CacheScope.persistTracked(
      ranged.withColumn("__lr", row_number().over(wLocal)))
    // numPartitions rows — the bounded fold that replaces a global sort
    // (SmallFold: no WindowExec, so the plan never logs the
    // single-partition warning for a 32-row table)
    val offsets = SmallFold.cumBefore(
      local.groupBy("__part").agg(count(lit(1L)).as("__pc")),
      "__part", "__pc", out = "__off")
    local.join(broadcast(offsets), "__part")
      .withColumn("__rank", col("__off") + col("__lr"))
      .drop("__part", "__lr", "__off")
  }

  def sortedNeighborhoodPairs(
      df: DataFrame, idCol: String, keyCol: String,
      window: Int): DataFrame = {
    require(window >= 2, s"need window >= 2, got $window")
    val band = (window - 1).toLong
    val ranked = graft.llm.CacheScope.persistTracked(
      globalRank(
        df.select(col(idCol), col(keyCol)).filter(col(keyCol).isNotNull),
        idCol, col(keyCol))
        .withColumn("__band", expr(s"(__rank - 1) div $band")))
    val left = ranked.select(
      col(idCol).as("id_a"), col("__k").as("key_a"),
      col("__rank").as("__ra"),
      explode(array(col("__band"), col("__band") + 1L)).as("__claim"))
    val right = ranked.select(
      col(idCol).as("id_b"), col("__k").as("key_b"),
      col("__rank").as("__rb"), col("__band").as("__claim"))
    left.join(right, "__claim")
      .filter(col("__rb") > col("__ra") &&
        col("__rb") - col("__ra") <= band)
      .select(col("id_a"), col("id_b"), col("key_a"), col("key_b"),
        (col("__rb") - col("__ra")).as("dist"))
  }

  /** SNM candidates verified by exact edit distance — the full
    * merge/purge pass: window pairs whose keys are within
    * `maxDist` Levenshtein edits. The DP is banded by the engine
    * (`levenshtein(l, r, k)` stops at k+1).
    */
  def sortedNeighborhoodLink(
      df: DataFrame, idCol: String, keyCol: String,
      window: Int, maxDist: Int): DataFrame =
    sortedNeighborhoodPairs(df, idCol, keyCol, window)
      .withColumn("edit_dist",
        levenshtein(col("key_a"), col("key_b"), maxDist))
      .filter(col("edit_dist") >= 0 && col("edit_dist") <= maxDist)
}
