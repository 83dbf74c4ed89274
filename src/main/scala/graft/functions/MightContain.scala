package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}

/** Registration shim exposing Catalyst's own [[BloomFilterMightContain]]
  * (the expression Spark's runtime bloom-filter join pruning uses) as a
  * callable function. Spark registers it only in the internal function
  * registry, but the expression class itself is public — this makes the
  * codegen'd bloom probe usable from the DataFrame API
  * (`call_function("graft_might_contain", filterBytes, xxhash64(key))`)
  * for [[graft.operators.Upsert.upsertBloomPruned]]'s scan-side pruning.
  */
object MightContain {
  private[functions] val descriptor = (
    FunctionIdentifier("graft_might_contain"),
    new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_might_contain"),
    (children: Seq[Expression]) =>
      BloomFilterMightContain(children(0), children(1)): Expression,
  )
}
