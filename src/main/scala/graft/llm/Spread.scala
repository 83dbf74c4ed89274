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
  * Note the Exchange is NOT an optimizer barrier: CollapseProject collapses
  * projections straight through Repartition (measured — see SURVEY §4), so
  * an expensive expression below the shuffle still re-inlines into every
  * downstream reference. Stopping recomputation takes `persist()` or a
  * native expression; Spread only fixes parallelism.
  *
  * No-op when the input is already wider — a 100 TB scan arrives with
  * thousands of splits and must not be narrowed. Also a no-op on
  * STREAMING inputs: partition inspection needs `df.rdd`, which throws
  * on an unresolved streaming plan — and a micro-batch's parallelism is
  * the source's concern (maxFilesPerTrigger / kafka partitions), not a
  * static repartition's. Callers like `Retrieval.postings` stay usable
  * on streams because of this gate.
  */
private[graft] object Spread {
  def apply(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
