package graft.core

import org.apache.spark.SparkContext
import org.apache.spark.sql.Dataset

/** Query-scoped registry for persisted/checkpointed data that must not
  * outlive its query in a long-lived session (the bench/verify harness
  * runs the full declared inventory in ONE SparkSession — round-3
  * finding: un-released persists accumulate cached partitions across
  * 49 queries × multiple passes).
  *
  * Producers ([[graft.ext.DedupOps]] sketch relations,
  * [[GraftStage.cached]] fan-out stages, `dupClusters` fixpoint
  * checkpoints) register here; the harness calls [[release]] AFTER each
  * query's terminal action. Releasing before the terminal action is a
  * caller bug for checkpointed frames (a localCheckpoint truncates
  * lineage — its blocks are the only copy).
  */
object QueryCaches {
  // Strong references on purpose: release() must unpersist
  // DETERMINISTICALLY even after the query's terminal action dropped
  // the last caller reference (a weak ref can be GC-cleared in that
  // window, leaving the blocks to the ContextCleaner's eventual
  // GC-driven sweep — the leak test then flakes). The registry is a
  // query-scoped contract: the harness (Bench/Verify/tests) calls
  // release() after every query; a long-lived embedding application
  // should do the same per batch, or unpersist its Datasets itself
  // (track() purges entries already unpersisted out-of-band, so
  // self-managed callers don't grow the buffer).
  private val frames = scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]
  private val rddIds = scala.collection.mutable.ArrayBuffer.empty[(SparkContext, Int)]

  /** Persist `ds` (default storage level) and register it for release. */
  def track[T](ds: Dataset[T]): Dataset[T] =
    synchronized {
      frames.filterInPlace(_.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
      frames += ds.persist()
      ds
    }

  /** Register an already-persisted RDD by id (localCheckpoint blocks —
    * the Dataset API offers no unpersist handle for them; the id comes
    * from a before/after diff of `sc.getPersistentRDDs`). */
  private[graft] def trackRddId(sc: SparkContext, id: Int): Unit =
    synchronized { rddIds += sc -> id }

  /** Unpersist everything tracked (idempotent; non-blocking). */
  def release(): Unit = synchronized {
    frames.foreach(_.unpersist(blocking = false))
    frames.clear()
    rddIds.foreach { case (sc, id) =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false))
    }
    rddIds.clear()
  }
}
