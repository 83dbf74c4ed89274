package graft.llm

import org.apache.spark.sql.DataFrame

/** Partitioning floor for CPU-bound per-row stages.
  *
  * Scan parallelism is BYTE-based (`files.maxPartitionBytes`), which
  * under-partitions small-but-expensive inputs: a 25 MB parquet of 50k
  * documents arrives as ONE split, and the whole tokenize→shingle→hash map
  * side of a dedup query runs single-threaded regardless of cluster size.
  * Repartitioning to the default parallelism costs one shuffle of the raw
  * rows — trivial next to the per-row compute it unlocks.
  *
  * The introduced Exchange has a second, equally important effect: it is an
  * optimizer barrier, so an expensive projection below it (tokenization) is
  * MATERIALIZED once per row instead of being inlined by CollapseProject
  * into every reference in downstream lambda bodies (a shingle `transform`
  * that re-ran `split()` per element turned O(tokens) docs into O(tokens²)).
  *
  * No-op when the input is already wider — a 100 TB scan arrives with
  * thousands of splits and must not be narrowed.
  */
private[graft] object Spread {
  def apply(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
