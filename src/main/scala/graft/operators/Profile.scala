package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Long-format column profiling — the one-pass health summary a pipeline
  * emits next to every published table (null counts drive the reference's
  * validation gates; distinct counts and ranges catch schema drift and
  * key explosions before a downstream join does).
  *
  * Shape: ALL metrics for ALL columns in ONE aggregation — Spark plans
  * the multi-column exact distincts through a single Expand (×|cols|)
  * with partial aggregation, so the input is read once, never one job
  * per column. The single result row is then exploded to one row per
  * column entirely inside the plan (no driver round-trip). Min/max
  * render as strings so heterogeneous column types stack in one output.
  */
object Profile {

  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "need at least one column to profile")
    val aggs = columns.flatMap(c => Seq(
      count(col(c)).as(s"__n_$c"),
      countDistinct(col(c)).as(s"__d_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stacked = array(columns.map(c => struct(
      lit(c).as("coluna"),
      col(s"__n_$c").as("nao_nulos"),
      col(s"__d_$c").as("distintos"),
      col(s"__min_$c").as("minimo"),
      col(s"__max_$c").as("maximo"))): _*)
    row.select(explode(stacked).as("__p")).select("__p.*")
  }
}
