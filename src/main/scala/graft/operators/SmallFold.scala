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
  * engine's plans warning-free.
  *
  * Warning discipline (amended r15): prefix folds route through here;
  * the ONLY partition-less windows allowed to survive are SERIAL
  * per-step recurrences over calendar-bounded series tables, where a
  * prefix fold cannot express the step: Timeseries.autocorrelation /
  * classicalDecomposition (row_number + centered rolling mean over a
  * ≤|calendar| bucket table — the operators' input contract). Any
  * OTHER "Moving all data to a single partition" in a bench tail is a
  * bug, not noise.
  */
private[graft] object SmallFold {

  /** Adds `out` = Σ `valCol` over rows with strictly smaller `orderCol`
    * (within equal `parts`), as one broadcast self-join + re-group.
    * `orderCol` should be unique within `parts` (the callers' tables
    * are groupBy collapses, so it is) — but the right side pre-collapses
    * per (parts, orderCol) anyway: the tables are ≤~256 rows by design,
    * the extra aggregate is free, and it makes an accidental duplicate
    * key harmless (a duplicate used to multiply through the self-join
    * and silently inflate every downstream prefix). `zero` supplies the
    * empty-prefix value with the caller's sum type (lit(0L) for longs,
    * a typed decimal literal for decimal folds).
    */
  def cumBefore(
      totals: DataFrame, orderCol: String, valCol: String,
      parts: Seq[String] = Nil, out: String = "__off",
      zero: Column = lit(0L)): DataFrame =
    cumBeforeMulti(totals, orderCol, Seq((valCol, out, zero)), parts)

  /** [[cumBefore]] for several value columns in ONE self-join: each
    * (valCol, out, zero) triple adds `out` = Σ `valCol` over strictly
    * smaller `orderCol` rows. `orderCol` may be any ordered type —
    * including a struct, for composite sort keys.
    */
  def cumBeforeMulti(
      totals: DataFrame, orderCol: String,
      vals: Seq[(String, String, Column)],
      parts: Seq[String] = Nil): DataFrame = {
    val keyCols = parts :+ orderCol
    val left = totals.select(keyCols.map(col): _*)
    val right = totals
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col(vals.head._1)).as(vals.head._1),
        vals.tail.map { case (v, _, _) => sum(col(v)).as(v) }: _*)
      .select(
        parts.map(c => col(c).as(s"__sf_$c")) ++
          (col(orderCol).as("__sf_o") +:
            vals.map { case (v, _, _) => col(v).as(s"__sf_v_$v") }): _*)
    val cond = parts.map(c => col(c) === col(s"__sf_$c"))
      .foldLeft(col("__sf_o") < col(orderCol))(_ && _)
    left.join(broadcast(right), cond, "left")
      .groupBy(keyCols.map(col): _*)
      .agg(
        coalesce(sum(col(s"__sf_v_${vals.head._1}")), vals.head._3)
          .as(vals.head._2),
        vals.tail.map { case (v, o, z) =>
          coalesce(sum(col(s"__sf_v_$v")), z).as(o) }: _*)
  }
}
