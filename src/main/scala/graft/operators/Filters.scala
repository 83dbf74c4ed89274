package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record-selection operators.
  *
  * Re-expresses the reference's row filters
  * (sm_cloud_run/utilitarios/config_painel_sm.py:67 `condicoes_pa`, applied in
  * sm_cloud_run/etl/siasus_procedimentos_ambulatoriais.py:220, and the
  * active-municipality membership filter at :206-209) as pure Catalyst
  * predicates. The reference evaluates these with pandas `query(engine=
  * "python")` — row-at-a-time; here they are declarative expressions so
  * Catalyst pushes them into the parquet scan and whole-stage codegen.
  */
object Filters {

  /** OR-combine a disjunct list (`condicoes_pa` is ~17 OR'd predicates). */
  def anyOf(preds: Seq[Column]): Column =
    preds.reduceLeft(_ || _)

  /** Keep fact rows where ANY of `factKeys` is a member of the dim key set.
    *
    * Reference: `PA_UFMUN in municipios or PA_MUNPCN in municipios`
    * (siasus_procedimentos_ambulatoriais.py:208) — the reference collects the
    * list to the driver and string-interpolates it into a pandas query. At
    * scale the dim must never hit the driver: we broadcast the (distinct) dim
    * key set once per fact key column and OR the match flags. Each join is a
    * BroadcastHashJoin, so the fact table is never shuffled.
    */
  def filterMemberOfAny(fact: DataFrame, factKeys: Seq[String], dimKeys: DataFrame): DataFrame = {
    val dimCol = dimKeys.columns.head
    val outCols = fact.columns
    val flagged = factKeys.zipWithIndex.foldLeft(fact) { case (df, (k, i)) =>
      val d = broadcast(
        dimKeys.select(col(dimCol).as(s"__graft_dk$i")).distinct()
          .withColumn(s"__graft_m$i", lit(true))
      )
      df.join(d, df(k) === d(s"__graft_dk$i"), "left").drop(s"__graft_dk$i")
    }
    flagged
      .filter(anyOf(factKeys.indices.map(i => col(s"__graft_m$i"))))
      .select(outCols.map(col): _*)
  }
}
