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
  // Entries are OWNED by the thread that registered them (round-4
  // advice): under concurrent queries in one JVM (thrift-server use,
  // parallel suites), a JVM-wide release() could drop another in-flight
  // query's localCheckpoint blocks — whose lineage is truncated, so
  // that query would fail with lost blocks rather than recompute.
  // release() therefore only sweeps the calling thread's entries, plus
  // entries whose owner thread has died (their query can no longer be
  // in flight — this keeps the sequential-harness leak guarantee even
  // when a test registered from a short-lived thread).
  private val frames = scala.collection.mutable.ArrayBuffer.empty[(Thread, Dataset[_])]
  private val rddIds = scala.collection.mutable.ArrayBuffer.empty[(Thread, SparkContext, Int)]

  /** Persist `ds` (default storage level) and register it for release. */
  def track[T](ds: Dataset[T]): Dataset[T] =
    synchronized {
      frames.filterInPlace(_._2.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
      frames += Thread.currentThread() -> ds.persist()
      ds
    }

  /** Register an already-persisted RDD by id (localCheckpoint blocks —
    * the Dataset API offers no unpersist handle for them; the id comes
    * from a before/after diff of `sc.getPersistentRDDs`). */
  private[graft] def trackRddId(sc: SparkContext, id: Int): Unit =
    synchronized { rddIds += ((Thread.currentThread(), sc, id)) }

  /** Unpersist everything the CALLING thread tracked, plus orphans from
    * dead threads (idempotent; non-blocking). Another live thread's
    * in-flight entries are left alone. */
  def release(): Unit = releaseWhere { owner =>
    (owner eq Thread.currentThread()) || !owner.isAlive
  }

  /** Unpersist EVERY tracked entry regardless of owning thread — the
    * shutdown/idle-sweep escape hatch for pooled-thread applications
    * (a pool worker that registered caches and returned to the pool
    * stays alive without ever calling [[release]], so its entries are
    * invisible to other threads' release() by design). Only call when
    * no query is in flight: dropping a live query's localCheckpoint
    * blocks fails it with lost blocks, not a recompute. */
  def releaseAll(): Unit = releaseWhere(_ => true)

  private def releaseWhere(sweep: Thread => Boolean): Unit = synchronized {
    frames.filterInPlace { case (owner, ds) =>
      if (sweep(owner)) { ds.unpersist(blocking = false); false } else true
    }
    rddIds.filterInPlace { case (owner, sc, id) =>
      if (sweep(owner)) {
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)); false
      } else true
    }
  }
}
