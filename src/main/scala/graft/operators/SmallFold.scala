package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cumulative folds over BOUNDED tables without WindowExec.
  *
  * The offset folds that replace global sorts in this repo (range-
  * exchange rank maps, width_bucket decompositions) are windows over at
  * most numShufflePartitions or 256 rows — but a partition-less window
  * still logs WindowExec's "Moving all data to a single partition"
  * warning, so a bench tail full of EXPECTED noise would let a real
  * corpus-sized window hide in it. A broadcast self-join is O(rows²)
  * in the bounded table — trivial at these sizes — and keeps the
  * engine's plans warning-free: if that warning ever appears again, it
  * is a bug, not noise.
  */
private[graft] object SmallFold {

  /** Adds `out` = Σ `valCol` over rows with strictly smaller `orderCol`
    * (within equal `parts`), as one broadcast self-join + re-group.
    * `orderCol` must be unique within `parts` (the callers' tables are
    * groupBy collapses, so it is). `zero` supplies the empty-prefix
    * value with the caller's sum type (lit(0L) for longs, a typed
    * decimal literal for decimal folds).
    */
  def cumBefore(
      totals: DataFrame, orderCol: String, valCol: String,
      parts: Seq[String] = Nil, out: String = "__off",
      zero: Column = lit(0L)): DataFrame = {
    val keyCols = parts :+ orderCol
    val left = totals.select(keyCols.map(col): _*)
    val right = totals.select(
      parts.map(c => col(c).as(s"__sf_$c")) ++
        Seq(col(orderCol).as("__sf_o"), col(valCol).as("__sf_v")): _*)
    val cond = parts.map(c => col(c) === col(s"__sf_$c"))
      .foldLeft(col("__sf_o") < col(orderCol))(_ && _)
    left.join(broadcast(right), cond, "left")
      .groupBy(keyCols.map(col): _*)
      .agg(coalesce(sum(col("__sf_v")), zero).as(out))
  }
}
