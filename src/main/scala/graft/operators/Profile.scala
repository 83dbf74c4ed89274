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

  /** Pre-join skew/cost diagnostics — the report an operator like the
    * q146 wedge join or any fact-fact equi-join should be sized from
    * BEFORE it runs: per-side key counts, the hottest keys, and the
    * EXACT output cardinality Σ_k c_left(k)·c_right(k) (which is also
    * the Σdeg² wedge-volume term when diagnosing a self-join).
    *
    * Shape: one map-side-combinable count per side (key tables are
    * vocabulary-sized, facts are never rejoined); the hottest keys come
    * from `orderBy().limit()` → TakeOrderedAndProject (per-partition
    * heaps, the q70 discipline — no global sort); the cardinality
    * estimate is one join of the two COUNT tables + one sum of exact
    * DECIMAL(38,0) products. Everything integer-exact. The report
    * column `valor` is BIGINT: the product-sum accumulates in
    * DECIMAL(38,0) (overflow-proof) and only the final scalar casts
    * down — exact while the diagnosed join output stays below 2⁶³−1
    * rows (~9.2·10¹⁸ — beyond any join a 100 TB table produces; a
    * decimal-typed output column would fail dtype-level hash compares
    * in pyarrow/pandas readers, measured round 9).
    *
    * Output rows (metrica, chave, valor): `linhas_esq/linhas_dir`
    * (row counts), `chaves_esq/chaves_dir` (distinct keys),
    * `linhas_juncao` (exact join output rows), and topK
    * `quente_esq/quente_dir` rows carrying the hottest keys and their
    * counts.
    */
  def joinDiagnostics(
      left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
      topK: Int): DataFrame = {
    require(topK >= 1, s"need topK >= 1, got $topK")
    val cl = graft.llm.CacheScope.persistTracked(
      left.groupBy(col(leftKey).cast("string").as("chave"))
        .agg(count(lit(1L)).as("__c")))
    val cr = graft.llm.CacheScope.persistTracked(
      right.groupBy(col(rightKey).cast("string").as("chave"))
        .agg(count(lit(1L)).as("__c")))
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    def summary(df: DataFrame, rowsName: String, keysName: String) =
      df.agg(
        coalesce(sum(col("__c")), lit(0L)).as("__rows"),
        count(lit(1L)).as("__keys"))
        .select(explode(map(
          lit(rowsName), col("__rows"),
          lit(keysName), col("__keys")))
          .as(Seq("metrica", "valor")))
        .select(col("metrica"), lit(null).cast("string").as("chave"),
          col("valor"))
    def hot(df: DataFrame, name: String) =
      df.orderBy(col("__c").desc, col("chave")).limit(topK)
        .select(lit(name).as("metrica"), col("chave"), col("__c").as("valor"))
    val est = cl.withColumnRenamed("__c", "__cl")
      .join(cr.withColumnRenamed("__c", "__cr"), Seq("chave"))
      .agg(coalesce(sum(dec(col("__cl")) * dec(col("__cr"))),
        lit(0).cast("decimal(38,0)")).as("valor"))
      .select(lit("linhas_juncao").as("metrica"),
        lit(null).cast("string").as("chave"),
        col("valor").cast("long").as("valor"))
    summary(cl, "linhas_esq", "chaves_esq")
      .unionByName(summary(cr, "linhas_dir", "chaves_dir"))
      .unionByName(est)
      .unionByName(hot(cl, "quente_esq"))
      .unionByName(hot(cr, "quente_dir"))
  }
}
