package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}

/** Surrogate-id operator.
  *
  * Reference inserts a per-row `uuid7().hex`
  * (sm_cloud_run/etl/siasus_procedimentos_ambulatoriais.py:327-329) —
  * nondeterministic, so no oracle could ever reproduce it and re-runs of the
  * same batch produce different ids. The Spark-first re-expression derives a
  * deterministic surrogate from the natural key: stable across retries,
  * reproducible by the verification oracle, and codegen'd.
  */
object Ids {

  /** 64-hex-char deterministic surrogate id over the natural-key columns.
    *
    * Injective serialization guards: separators inside string parts are
    * escaped (`|` → `\|`) and nulls get an explicit sentinel — otherwise
    * `concat_ws` silently skips nulls and `("a|b")` vs `("a","b")` would
    * collide, giving distinct records the same id. (A part equal to the
    * literal NUL sentinel could still collide — natural keys are expected
    * to be printable codes/numbers.) For all-numeric non-null keys the
    * serialization equals plain `concat_ws('|', …)`, which is what the SQL
    * oracle uses.
    */
  /** NUL as the null-part sentinel — cannot appear in printable key codes. */
  private val NullSentinel: String = 0.toChar.toString

  def surrogateId(naturalKey: Seq[Column], sep: String = "|"): Column = {
    val parts = naturalKey.map { c =>
      // escape the escape char FIRST, then the separator — otherwise
      // ("a\", "b|c") and ("a|b\", "c") both serialize to a\|b\|c
      val escaped = replace(
        replace(c.cast("string"), lit("\\"), lit("\\\\")),
        lit(sep), lit("\\" + sep))
      coalesce(escaped, lit(NullSentinel))
    }
    sha2(concat_ws(sep, parts: _*), 256)
  }

  /** Contiguous dense 0-based ids in a TOTAL order — the "number every
    * row" primitive (training-example ids, stable shard offsets) that
    * has no scalable expression form: `row_number()` over a global
    * window collapses the corpus into ONE partition, and
    * `monotonically_increasing_id` is neither contiguous nor
    * order-related. The scalable shape is the classic two-phase
    * assignment: range-repartition + intra-partition sort gives the
    * global order across partitions, then `zipWithIndex` counts each
    * partition once and offsets by the prefix sums — two passes, no
    * single-partition stage. (One of the few justified RDD drops: the
    * per-partition offset arithmetic is genuinely imperative.)
    *
    * `orderCols` must be a TOTAL order (include a unique tie-break):
    * ids are then a pure function of the data — identical under any
    * partitioning (the range partitioner's sampled boundaries move, the
    * sorted sequence doesn't) and reproducible by a SQL
    * `row_number() - 1`.
    */
  def contiguousIds(
      df: DataFrame, orderCols: Seq[(String, Boolean)],
      idName: String = "seq_id"): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    val sortExprs = orderCols.map { case (c, asc) =>
      if (asc) col(c).asc else col(c).desc }
    val sorted = df.repartitionByRange(sortExprs: _*)
      .sortWithinPartitions(sortExprs: _*)
    val schema = sorted.schema.add(StructField(idName, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex()
      .map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
