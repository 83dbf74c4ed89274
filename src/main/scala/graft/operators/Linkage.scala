package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy record linkage — the classic ETL entity-resolution step.
  *
  * Reference analogue: the reference resolves entities through exact
  * de-para alias tables (`operators.Renames`, etl/scnes_vinculos.py's
  * code maps) — which handles KNOWN aliases; typo'd near-duplicates
  * (mis-keyed establishment/municipality names) need fuzzy matching, the
  * record-linkage generalization re-expressed here Spark-first.
  */
object Linkage {

  /** Fuzzy near-match pairs: `(id_a < id_b, dist)` for every pair whose
    * normalized names are within EXACT Levenshtein distance `maxDist`,
    * with candidates formed only inside cheap BLOCKS — multi-pass: one
    * pass per caller-supplied key expression over the normalized name, a
    * pair is a candidate if ANY pass collides (the standard
    * union-of-blocking-keys discipline; recall is bounded by how well
    * the keys cover the possible edit positions — the documented
    * record-linkage trade).
    *
    * Never corpus²: each pass is an equi-join on its key; a degenerate
    * hot key (every record sharing a prefix — id-like names all starting
    * "Customer#") is the q26 hot-bucket case, so pick keys SELECTIVE for
    * the data (suffix n-grams for id-like names, phonetic codes for
    * human names — `soundex()` composes directly as a key). Verification
    * is one Levenshtein DP per candidate; at scale swap in Spark's
    * thresholded `levenshtein(l, r, k)` (bails at k+1, banding the DP) —
    * the plain form here keeps the oracle exact.
    */
  def fuzzyPairs(
      df: DataFrame, idCol: String, nameCol: String, maxDist: Int,
      blockKeys: Seq[Column => Column]): DataFrame = {
    require(maxDist >= 0, s"need maxDist >= 0, got $maxDist")
    require(blockKeys.nonEmpty, "need at least one blocking key")
    val keyed = df.select(col(idCol).as("__id"),
        lower(trim(col(nameCol))).as("__nm"))
      .select(col("__id"), col("__nm"),
        posexplode(array(blockKeys.map(k => k(col("__nm"))): _*))
          .as(Seq("__pass", "__key")))
      .filter(col("__key").isNotNull && col("__key") =!= "")
    val cand = keyed
      .select(col("__pass"), col("__key"),
        col("__id").as("id_a"), col("__nm").as("__nm_a"))
      .join(keyed.select(col("__pass"), col("__key"),
        col("__id").as("id_b"), col("__nm").as("__nm_b")),
        Seq("__pass", "__key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "__nm_a", "__nm_b").distinct()
    cand.select(col("id_a"), col("id_b"),
        levenshtein(col("__nm_a"), col("__nm_b")).cast("long").as("dist"))
      .filter(col("dist") <= maxDist)
  }
}
