package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.typed.Records

class TypedRecordsSpec extends SparkSpec {

  import spark.implicits._

  test("typed transform keeps the plan declarative and the schema checked") {
    val items = Records.rawItems(spark, sfDir)
    val active = Tables.supplier(spark, sfDir)
      .filter(col("s_acctbal") > 0).select("s_suppkey")
    val out = Records.transform(items, active)
    // schema is the case-class contract
    assert(out.columns.toSeq == Seq(
      "id", "pedido_id", "item_id", "fornecedor_id", "linha_numero",
      "quantidade_apresentada", "valor_apresentado", "realizacao_data",
      "devolucao_status"))
    // ids are deterministic sha2 over the natural key
    val row = out.orderBy("pedido_id", "linha_numero").head()
    assert(row.id.length == 64 && row.id.matches("[0-9a-f]+"))
    // no typed lambdas: the plan must stay free of DeserializeToObject
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.contains("DeserializeToObject") && !plan.contains("MapElements"),
      s"typed facade must not opaque the plan:\n$plan")
    assert(out.count() > 0)
  }
}
