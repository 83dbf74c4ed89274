package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-contract validation (the dbt-test / Great-Expectations
  * check suite) — the reference's hand-rolled non-null gates
  * (`validar_pa`, etl/siasus_procedimentos_ambulatoriais.py:366-378;
  * row 24) generalized into a composable expectation set a load job runs
  * before committing a batch.
  *
  * Evaluation shape at 100 TB:
  *
  * - ALL row-local checks (not-null, accepted-values, range) fold into
  *   ONE conditional-count aggregation over a single scan — never a job
  *   per check (the q87 one-pass-profiling discipline). The single
  *   result row is exploded to long (check, violations) format inside
  *   the plan.
  * - Each uniqueness check is one map-side-combinable groupBy on its key
  *   set; violations = Σ (group size − 1) — rows beyond the first per
  *   duplicated key.
  * - Each referential-integrity check probes the dimension's distinct
  *   keys as a BROADCAST left-anti build side (dimensions are small by
  *   definition; the fact scan never shuffles). Null FKs are not
  *   RI violations — that is `NotNull`'s job (the SQL-standard split).
  *
  * Output: (verificacao, violacoes, total) — one row per declared check,
  * `violacoes = 0` meaning the contract holds; `total` counts the rows
  * the check examined (all rows for row-local and uniqueness checks,
  * non-null FK rows for referential integrity). Deterministic check
  * names (`kind:column`) make the report joinable/diffable across runs.
  */
object Expectations {

  sealed trait Check { def name: String }

  /** Column must be non-null. */
  final case class NotNull(column: String) extends Check {
    def name = s"not_null:$column"
  }

  /** Non-null values must belong to the accepted set. */
  final case class Accepted(column: String, values: Seq[String])
      extends Check {
    def name = s"accepted_values:$column"
  }

  /** Non-null values must fall in [lo, hi]. */
  final case class InRange(column: String, lo: Double, hi: Double)
      extends Check {
    def name = s"in_range:$column"
  }

  /** Key tuple must be unique across the table (null keys group as SQL
    * GROUP BY does).
    */
  final case class Unique(columns: Seq[String]) extends Check {
    def name = s"unique:${columns.mkString(",")}"
  }

  /** Non-null foreign keys must exist in the dimension column. */
  final case class RefIntegrity(column: String, dim: DataFrame,
      dimColumn: String) extends Check {
    def name = s"ref_integrity:$column"
  }

  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    val rowLocal = checks.collect {
      case c @ NotNull(col0) =>
        c.name -> sum(when(col(col0).isNull, 1L).otherwise(0L))
      case c @ Accepted(col0, vs) =>
        c.name -> sum(when(col(col0).isNotNull &&
          !col(col0).isInCollection(vs), 1L).otherwise(0L))
      case c @ InRange(col0, lo, hi) =>
        c.name -> sum(when(col(col0).isNotNull &&
          (col(col0) < lo || col(col0) > hi), 1L).otherwise(0L))
    }
    val localReport: Option[DataFrame] =
      if (rowLocal.isEmpty) None
      else {
        val aggCols = count(lit(1L)).as("__total") +:
          rowLocal.map { case (n, e) => e.as(s"__v_$n") }
        val one = df.agg(aggCols.head, aggCols.tail: _*)
        // single row -> long format inside the plan (no driver collect)
        Some(one.select(explode(map(
          rowLocal.flatMap { case (n, _) =>
            Seq(lit(n), col(s"__v_$n"))
          }: _*)).as(Seq("verificacao", "violacoes")), col("__total")))
      }
    val uniques = checks.collect { case c @ Unique(cols) =>
      df.groupBy(cols.map(col): _*).agg(count(lit(1L)).as("__n"))
        .agg(
          lit(c.name).as("verificacao"),
          coalesce(sum(when(col("__n") > 1L, col("__n") - 1L)
            .otherwise(0L)), lit(0L)).as("violacoes"),
          coalesce(sum(col("__n")), lit(0L)).as("__total"))
    }
    val refs = checks.collect { case c @ RefIntegrity(col0, dim, dimCol) =>
      // left join (not anti) so probed-row total and miss count come from
      // the SAME single pass — no extra scan, no driver action
      val keys = dim.select(col(dimCol).as(col0)).distinct()
        .withColumn("__hit", lit(1))
      df.filter(col(col0).isNotNull)
        .join(broadcast(keys), Seq(col0), "left")
        .agg(
          lit(c.name).as("verificacao"),
          coalesce(sum(when(col("__hit").isNull, 1L).otherwise(0L)), lit(0L))
            .as("violacoes"),
          count(lit(1L)).as("__total"))
    }
    (localReport.toSeq ++ uniques ++ refs)
      .reduce(_.unionByName(_))
      .select(col("verificacao"), col("violacoes"),
        col("__total").as("total"))
  }
}
