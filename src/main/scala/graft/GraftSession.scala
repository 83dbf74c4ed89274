package graft

import org.apache.spark.sql.SparkSession

/** Session factory: one place for the engine's Spark configuration so the
  * driver mains, tests and downstream users get identical semantics.
  *
  *  - `shuffle.partitions` sized to the local core count (never the 200
  *    default — partition count is a deploy-time knob, not a code constant)
  *  - AQE on: runtime coalescing + skew-join splitting at scale
  *  - UTC session timezone (all reference timestamps are zone-fixed)
  *  - nanosecond parquet timestamps read as raw longs (normalized in
  *    [[graft.sources.Tables.events]])
  *  - [[graft.functions.GraftExtensions]] injected: native expressions
  *    (`roman_to_int`, …) available to SQL users too.
  */
object GraftSession {

  def builder(cores: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse")
      .config("spark.ui.enabled", "false")

  def create(cores: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt): SparkSession = {
    val spark = builder(cores).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
