package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys.
  *
  * First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`,
  * on by default in [[graft.GraftSession]]), which splits oversized
  * sort-merge partitions at runtime. Explicit salting remains the tool when
  * the skewed side must hash-join a mid-size dimension that is too big to
  * broadcast: replicate the dim `salt` ways and scatter the fact rows
  * deterministically so one hot key spreads over `salt` reducers.
  */
object Skew {

  /** Deterministic salt in [0, salt) derived from the row's own columns —
    * reproducible across retries/partitionings (never `rand()`, which
    * breaks task retry idempotence).
    */
  def saltExpr(seedCols: Seq[Column], salt: Int): Column =
    pmod(hash(seedCols: _*), lit(salt))

  /** Equi-join `fact` to `dim` on `key` with an explicit `salt`-way
    * scatter: dim rows are replicated `salt` times (dim must be the small
    * side), fact rows carry a deterministic salt from `seedCols`. Result
    * equals the plain join, but the hot key's rows land on `salt`
    * different reducers.
    */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, key: String,
      seedCols: Seq[String], salt: Int, joinType: String = "inner"): DataFrame = {
    val saltedFact = fact.withColumn(
      "__graft_salt", saltExpr(seedCols.map(col), salt))
    val saltedDim = dim
      .withColumn("__graft_salt", explode(array((0 until salt).map(lit): _*)))
    saltedFact
      .join(saltedDim, Seq(key, "__graft_salt"), joinType)
      .drop("__graft_salt")
  }
}
