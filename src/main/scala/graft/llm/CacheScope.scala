package graft.llm

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Tracks the intermediate relations the dedup/similarity operators
  * persist (LSH branch points must be cached or CollapseProject re-inlines
  * their expressions once per consumer — see SURVEY §4). Spark keeps
  * persisted blocks until unpersist, so long-lived sessions that call these
  * operators repeatedly should release them once the results are
  * materialized:
  *
  * {{{
  *   val pairs = Dedup.minhashNearDups(docs, "id", "text", 0.5)
  *   pairs.write.parquet(out)        // materialize
  *   CacheScope.releaseAll()          // drop operator-internal caches
  * }}}
  */
object CacheScope {
  // Process-global, single-driver-thread discipline: releaseAll() assumes
  // no other thread is mid-query on these operators (it would unpersist
  // their in-flight branch points and reintroduce the recompute blow-up).
  // Concurrent drivers should serialize release points per batch.

  private val tracked = mutable.ListBuffer.empty[DataFrame]

  /** Persist `df` at MEMORY_AND_DISK and remember it for release. */
  private[graft] def persistTracked(df: DataFrame): DataFrame = synchronized {
    tracked += df
    df.persist(StorageLevel.MEMORY_AND_DISK)
  }

  /** Unpersist every operator-internal cache created so far. Call after the
    * downstream result has been materialized (caches are needed during its
    * execution).
    */
  def releaseAll(blocking: Boolean = false): Unit = synchronized {
    tracked.foreach(_.unpersist(blocking))
    tracked.clear()
  }
}
