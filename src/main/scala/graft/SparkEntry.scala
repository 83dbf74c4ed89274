package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator ↔ query map. */
object SparkEntry {

  /** Deterministic total order for oracle compare: sort by every output
    * column (asc, nulls first — matches DuckDB `ORDER BY ALL NULLS FIRST`).
    * The testdata does not guarantee key uniqueness, so partial-key sorts
    * are not reproducible across engines.
    */
  private[graft] def ordered(df: DataFrame): DataFrame =
    df.orderBy(df.columns.map(c => col(c).asc_nulls_first): _*)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q08_predicate_filter")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // §2 row 8 — condicoes_pa-style predicate disjunction
    // (config_painel_sm.py:67): startswith / regex / isin / equality
    // disjuncts as one scan-level Catalyst predicate.
    "q08_predicate_filter" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      ordered(o.filter(Filters.anyOf(Seq(
        col("o_orderpriority").startsWith("1"),
        col("o_orderpriority").rlike("^3-ME"),
        col("o_orderstatus").isin("P"),
        col("o_orderpriority") === "5-LOW" && col("o_orderstatus") === "F",
      ))))
    },

    // §2 row 9 — two-column membership against one dim key set
    // (siasus_procedimentos_ambulatoriais.py:206-209), as OR'd broadcast
    // match flags instead of a driver-collected literal list.
    "q09_semijoin_filter" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val activeIds = Tables.supplier(s, dir)
        .filter(col("s_acctbal") > 0).select("s_suppkey")
      ordered(Filters.filterMemberOfAny(li, Seq("l_suppkey", "l_partkey"), activeIds))
    },
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(

    "q08_predicate_filter" ->
      """SELECT * FROM orders
        |WHERE o_orderpriority LIKE '1%'
        |   OR regexp_matches(o_orderpriority, '^3-ME')
        |   OR o_orderstatus IN ('P')
        |   OR (o_orderpriority = '5-LOW' AND o_orderstatus = 'F')
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q09_semijoin_filter" ->
      """SELECT * FROM lineitem
        |WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal > 0)
        |   OR l_partkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal > 0)
        |ORDER BY ALL NULLS FIRST""".stripMargin,
  )
}
