package graft.llm

import org.apache.spark.sql.DataFrame

/** Checkpoint hygiene for iterative loops (CC / PageRank / k-core / BFS /
  * Markov attribution): each round `localCheckpoint`s its state to
  * truncate the self-referencing lineage, but the PREVIOUS round's
  * blocks stay pinned in the unified memory pool until explicitly
  * unpersisted — across tens of rounds that accumulation IS the memory
  * floor (the r12 sf10 k-core rehearsal OOM'd the 16 GiB default driver
  * with UNABLE_TO_ACQUIRE_MEMORY: every peel round's 29M-edge snapshot
  * was still resident; only the newest is ever read again).
  *
  * [[free]] reaches the checkpoint leaf of a SUPERSEDED round's plan and
  * drops its blocks. Callers free `prev` only after the next round's
  * checkpoint has materialized (eager checkpoint, or after the
  * convergence action for lazy ones) — the freed RDD must never be
  * recomputable-from-nothing while still referenced by a live plan.
  */
private[graft] object Roll {

  /** Unpersist the RDD behind a frame that IS a localCheckpoint result
    * — i.e. whose ROOT plan is the LogicalRDD leaf. No-op otherwise
    * (including the loops' first iteration, where the iterate is still
    * the caller's relation-backed input). Matching the root, not every
    * leaf, is load-bearing: collecting leaves anywhere in the plan
    * would reach a CALLER-supplied checkpointed/RDD-backed input
    * through the iterate's lineage and destroy blocks (a localCheckpoint
    * RDD is unrecoverable after unpersist) that the caller — or this
    * loop's own cached side tables — still depends on.
    */
  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
