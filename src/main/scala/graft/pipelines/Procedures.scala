package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.Tables

/** End-to-end composition of the reference's per-batch ETL chain
  * (etl/siasus_procedimentos_ambulatoriais.py:199-366: select active
  * municipalities → predicate filter → de-para rename → date parse → null
  * rules → boolean coercion → code split → surrogate id → dimension
  * lookups → audit columns → validation) over the neutral testdata star
  * schema.
  *
  * One declarative plan end to end: the two membership/dimension lookups
  * broadcast, every filter is scan-level, and the whole row-wise transform
  * chain fuses into a single codegen stage between the scan and the joins —
  * the pipeline adds NO shuffle beyond the final presentation sort.
  */
object Procedures {

  def run(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)

    // 1 — active-entity membership (two fact columns vs one dim key set)
    val activeIds = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") > 0).select("s_suppkey")
    val selected = Filters.filterMemberOfAny(
      li, Seq("l_suppkey", "l_partkey"), activeIds)

    // 2 — condition predicate disjunction
    val filtered = selected.filter(Filters.anyOf(Seq(
      col("l_returnflag") === "R",
      col("l_linestatus") === "O" && col("l_quantity") > 45,
    )))

    // 3 — de-para rename
    val renamed = Renames.dePara(filtered, Map(
      "l_quantity" -> "quantidade_apresentada",
      "l_extendedprice" -> "valor_apresentado",
      "l_shipdate" -> "realizacao_data"))

    // 4-7 — date parse, null rules, boolean coercion, code split
    val competenciaRaw = date_format(col("realizacao_data"), "yyyyMM")
    val codigo = when(col("l_orderkey") % 9 === 0, lit(""))
      .otherwise(lpad((col("l_partkey") % 9999).cast("string"), 7, "0"))
    val transformed = renamed
      .withColumn("competencia_data", Dates.parseAaaamm(competenciaRaw))
      .withColumn("condicao_codigo", NullRules.emptyToNull(codigo))
      .withColumn("obito", Booleans.zeroOne((col("l_linenumber") % 2).cast("string")))
      .withColumn("servico_id", Strings.slicePrefix(codigo, 3))
      .withColumn("servico_classificacao_id", Strings.sliceFrom(codigo, 3))

    // 8 — deterministic surrogate id
    val withId = transformed.withColumn("id", Ids.surrogateId(Seq(
      col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))))

    // 9 — geography lookup (fact → supplier dim → nation name), broadcast
    val geoDim = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey").as("geo_suppkey"),
        col("n_name").as("unidade_geografica_nome"))
    val withGeo = DimJoins.dimLookup(withId, "l_suppkey", geoDim, "geo_suppkey")

    // 10 — period dimension (month-aligned fast path)
    val periods = Tables.orders(spark, dir).select(
        to_date(date_trunc("MONTH", col("o_orderdate"))).as("data_inicio"))
      .distinct()
      .withColumn("periodo_codigo", date_format(col("data_inicio"), "yyyyMM"))
    val withPeriod = DimJoins.periodLookupMonthAligned(
      withGeo, col("realizacao_data"), periods, "data_inicio")

    // 11 — audit constants (frozen clock for reproducibility)
    val audited = withPeriod
      .withColumn("criacao_data", lit("2026-08-01 00:00:00").cast("timestamp_ntz"))
      .withColumn("ftp_arquivo_nome", lit("PASP2408"))

    // 12 — validation gate: key fields must be present
    audited
      .filter(col("id").isNotNull && col("quantidade_apresentada").isNotNull)
      .select(
        col("id"), col("l_orderkey").as("pedido_id"),
        col("l_linenumber").as("linha_numero"),
        col("quantidade_apresentada"), col("valor_apresentado"),
        col("realizacao_data"), col("competencia_data"),
        col("condicao_codigo"), col("obito"),
        col("servico_id"), col("servico_classificacao_id"),
        col("unidade_geografica_nome"), col("periodo_codigo"),
        col("criacao_data"), col("ftp_arquivo_nome"))
  }
}
