package graft.typed

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Filters, Ids}

/** Typed `Dataset[T]` boundaries for the record-transform chain.
  *
  * Pattern: case-class schemas give compile-time safety at module
  * boundaries (a renamed or re-typed column fails at `as[T]`, not three
  * stages later), while everything INSIDE a stage stays Column expressions
  * so Catalyst still prunes, pushes down, and codegens — typed lambdas
  * (`.map`/`.filter(T => Boolean)`) are deliberately absent: they opaque
  * the plan and kill pushdown.
  */
object Records {

  /** Raw fact row as read from the lineitem table. */
  case class RawItem(
      l_orderkey: Long, l_partkey: Long, l_suppkey: Long, l_linenumber: Int,
      l_quantity: Double, l_extendedprice: Double, l_discount: Double,
      l_tax: Double, l_returnflag: String, l_linestatus: String,
      l_shipdate: Timestamp)

  /** Transformed record (the reference ETL's output shape). */
  case class Procedimento(
      id: String, pedido_id: Long, item_id: Long, fornecedor_id: Long,
      linha_numero: Int, quantidade_apresentada: Double,
      valor_apresentado: Double, realizacao_data: Timestamp,
      devolucao_status: String)

  def rawItems(spark: SparkSession, dir: String): Dataset[RawItem] = {
    import spark.implicits._
    graft.sources.Tables.lineitem(spark, dir).as[RawItem]
  }

  /** Typed record-transform: selection filter → rename/derive → surrogate
    * id, with `Dataset[Procedimento]` as the checked output contract.
    */
  def transform(
      items: Dataset[RawItem], activeSuppliers: DataFrame): Dataset[Procedimento] = {
    import items.sparkSession.implicits._
    Filters.filterMemberOfAny(
        items.toDF(), Seq("l_suppkey", "l_partkey"), activeSuppliers)
      .select(
        Ids.surrogateId(Seq(
          col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"))).as("id"),
        col("l_orderkey").as("pedido_id"),
        col("l_partkey").as("item_id"),
        col("l_suppkey").as("fornecedor_id"),
        col("l_linenumber").as("linha_numero"),
        col("l_quantity").as("quantidade_apresentada"),
        col("l_extendedprice").as("valor_apresentado"),
        col("l_shipdate").as("realizacao_data"),
        col("l_returnflag").as("devolucao_status"))
      .as[Procedimento]
  }
}
