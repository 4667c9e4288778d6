package graft.core

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions.{col, struct}
import org.apache.spark.sql.types.StructType

import java.util.concurrent.{Callable, TimeUnit, TimeoutException => JTimeoutException}
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, Future, TimeoutException}

/** Per-worker identity handed to lifecycle hooks and user functions,
  * mirroring the reference's `worker_info` dependency injection
  * (reference: pypeln/process/worker.py:48-49,92-94). On Spark a
  * "worker" is a partition-task: `index` is the partition id and
  * `numWorkers` the stage's partition count — together they also cover
  * the reference's `stage_status` surface (active worker census,
  * pypeln/process/worker.py:103-117,189-209), which on Spark is a
  * scheduler concern, not user code.
  */
final case class WorkerInfo(index: Int, numWorkers: Int, stageId: Int, attempt: Long)

/** A lazy pipeline stage: the Spark-native analog of the reference's
  * `Stage` DAG node (reference: pypeln/process/stage.py:13-24). Nothing
  * executes until a terminal action (`toIterable` / `run` / `collect`),
  * exactly like the reference's iterate-to-run contract
  * (reference: docs/advanced.md:35).
  *
  * Two parallel plans are maintained, both pure lineage (no execution):
  *
  *   - `plain: Dataset[T]` — the Tungsten path. Operator chains that
  *     never observe creation order stay here: parquet pushdown, column
  *     pruning, and whole-stage codegen all survive, and no indexing
  *     job ever runs.
  *   - `indexed: Dataset[Element[T]]` — the creation-order path,
  *     materialized ON DEMAND (first use of `ordered` /
  *     `toIterableWithIndex` / `indexedDF`). Source indices come from
  *     `zipWithIndex` (an extra job — the price of the reference's
  *     enumeration contract, pypeln/process/api/from_iterable.py:15-22),
  *     paid only when something downstream actually consumes indices.
  *
  * Concurrency mapping:
  *   - `workers = n`  → `repartition(n)` (reference: process/stage.py:51-64)
  *   - task-backend async IO with `workers = n` → [[mapAsync]]: a bounded
  *     in-flight window of Futures inside each partition
  *     (reference: task/worker.py:217-283 semaphore-bounded TaskPool)
  *   - `timeout` → per-element bounded wait, element dropped on expiry
  *     and the in-flight attempt interrupted
  *     (reference: process/supervisor.py:19-32, worker.py:152-161)
  *   - `on_start` / `on_done` → partition open/close hooks
  *     (reference: process/worker.py:68-127)
  */
final class GraftStage[T](
    val plain: Dataset[T],
    mkIndexed: () => Dataset[Element[T]]) {

  /** Creation-order plan; forcing this builds (and memoizes) the indexed
    * lineage, including the source `zipWithIndex` job when first acted on. */
  lazy val indexed: Dataset[Element[T]] = mkIndexed()

  private def spark: SparkSession = plain.sparkSession

  /** 1→1 transform; index passes through untouched
    * (reference: pypeln/process/api/map.py:19-27). */
  def map[B](f: T => B)(implicit eb: Encoder[B], ee: Encoder[Element[B]]): GraftStage[B] =
    new GraftStage(plain.map(f), () => indexed.map(el => Element(el.index, f(el.value))))

  /** `map` with the full reference option surface: `workers` (partition
    * fan-out), per-element `timeout` (drop on expiry), `onStart`/`onDone`
    * per-worker lifecycle with resource injection
    * (reference: pypeln/process/api/map.py:115-126, docs/advanced.md:87-124).
    */
  def mapEx[S, B](
      f: (T, S) => B,
      workers: Int = 0,
      timeout: Duration = Duration.Zero,
      onStart: WorkerInfo => S = (_: WorkerInfo) => null.asInstanceOf[S],
      onDone: S => Unit = (_: S) => ())(implicit eb: Encoder[B], ee: Encoder[Element[B]]): GraftStage[B] = {
    def run[A, C](d: Dataset[A], g: (A, S) => Option[C])(implicit e: Encoder[C]): Dataset[C] = {
      val in = if (workers > 0) d.repartition(workers) else d
      val t = timeout
      in.mapPartitions { iter =>
        val tc = TaskContext.get()
        val wi = WorkerInfo(tc.partitionId(), tc.numPartitions(), tc.stageId(), tc.taskAttemptId())
        val state = onStart(wi)
        tc.addTaskCompletionListener[Unit](_ => onDone(state))
        if (t <= Duration.Zero) iter.flatMap(a => g(a, state))
        else iter.flatMap { a =>
          // Timeout semantics per the reference: the element is DROPPED,
          // the pipeline continues (process/api/map_process_test.py:63-76).
          // The attempt is cancelled with interrupt — cooperative user
          // code stops; non-interruptible code is abandoned on its
          // (daemon) scratch thread so it can't wedge the task.
          GraftStage.withTimeout(t)(g(a, state)).flatten
        }
      }
    }
    new GraftStage(
      run[T, B](plain, (a, s) => Some(f(a, s))),
      () => run[Element[T], Element[B]](indexed, (el, s) => Some(Element(el.index, f(el.value, s)))))
  }

  /** 1→N transform; each child element i gets index `parent :+ i`
    * (reference: pypeln/process/api/flat_map.py:22-28). */
  def flatMap[B](f: T => IterableOnce[B])(implicit eb: Encoder[B], ee: Encoder[Element[B]]): GraftStage[B] =
    new GraftStage(
      plain.flatMap(f),
      () => indexed.flatMap { el =>
        f(el.value).iterator.zipWithIndex.map { case (v, i) => Element(el.push(i.toLong), v) }
      })

  /** Keep elements where the predicate holds; surviving elements keep
    * their original index (reference: pypeln/process/api/filter.py:19-27). */
  def filter(p: T => Boolean): GraftStage[T] =
    new GraftStage(plain.filter(p), () => indexed.filter((el: Element[T]) => p(el.value)))

  /** Column-expression filter: the Catalyst path. On the plain plan the
    * predicate reaches the parquet scan (PushedFilters) — this is the
    * filter to use when the predicate is expressible, keeping the scan
    * pruned at 100 TB. Indices of survivors are unchanged, same contract
    * as [[filter]]. */
  def filterCol(c: Column): GraftStage[T] =
    new GraftStage(plain.filter(c), () => GraftStage.filterIndexed(indexed, c))

  /** Async-IO map: the task-backend analog. Keeps up to `workers`
    * Futures in flight per partition (bounded window ≈ the reference's
    * semaphore-bounded TaskPool, task/worker.py:225-238). Completions
    * are drained in submission order (per-partition order preserved;
    * global order is not, same as the reference under concurrency).
    * `timeout` bounds each element's wait once it reaches the head of
    * the window; on expiry the element is DROPPED (reference task
    * backend: asyncio.wait_for + swallowed TimeoutError,
    * task/worker.py:246-255) — a hung Future can no longer wedge the
    * task forever.
    */
  def mapAsync[B](f: T => Future[B], workers: Int = 8,
      timeout: Duration = GraftStage.DefaultAsyncTimeout)(
      implicit eb: Encoder[B], ee: Encoder[Element[B]]): GraftStage[B] = {
    val n = math.max(1, workers)
    val t = timeout
    def run[A, C](d: Dataset[A], value: A => T, mk: (A, B) => C)(
        implicit e: Encoder[C]): Dataset[C] =
      d.mapPartitions(iter =>
        GraftStage.asyncWindowIterator(iter, n, t, (a: A) => f(value(a)), mk))
    new GraftStage(
      run[T, B](plain, identity, (_, b) => b),
      () => run[Element[T], Element[B]](indexed, _.value, (a, b) => Element(a.index, b)))
  }

  /** Side-effect call per element, passing elements through unchanged
    * (reference: pypeln/process/api/each.py:19-26). Lazy like the
    * reference; the effect fires when the stage is executed — cache
    * (or use [[eachRun]]) for exactly-once delivery across repeated
    * actions. */
  def each(f: T => Unit): GraftStage[T] = {
    implicit val ep: Encoder[T] = plain.encoder
    new GraftStage(
      plain.map { v => f(v); v },
      () => { implicit val ei: Encoder[Element[T]] = indexed.encoder
              indexed.map { el => f(el.value); el } })
  }

  /** Terminal each: deliver every element to `f` exactly once via a
    * single `foreach` action — the reference's `each(..., run=True)`
    * (pypeln/process/api/each.py:137-141). No lineage is left behind to
    * re-fire the effect. */
  def eachRun(f: T => Unit): Unit =
    GraftErrors.unwrap(plain.foreach(f(_)))

  /** Drain the stage for its side effects
    * (reference: pypeln/process/api/run.py:15-43). User exceptions are
    * re-thrown with their original type (see [[GraftErrors]]). */
  def run(): Unit = GraftErrors.unwrap(plain.foreach((_: T) => ()))

  /** Union-all of stages; interleaving is partition-order, order not
    * preserved — same contract as the concurrent backends
    * (reference: pypeln/process/api/concat.py:14-16). */
  def concat(others: GraftStage[T]*): GraftStage[T] =
    new GraftStage(
      others.foldLeft(plain)((a, b) => a.union(b.plain)),
      () => others.foldLeft(indexed)((a, b) => a.union(b.indexed)))

  /** Deterministic round-robin concat — the reference SYNC backend's
    * concat contract (pypeln/sync/stage.py:36-47 `iter_dependencies`,
    * sync/api/concat.py:21): one element from each live stage per
    * cycle, exhausted stages dropping out — [1,2,3] ++ [4,5,6,7] →
    * 1,4,2,5,3,6,7. (Plain [[concat]] is the concurrent-backend
    * contract: union-all, arrival order.)
    *
    * Spark-first shape: the interleave IS a distributed sort. Each
    * stage's creation order comes from its indexed plan; the per-stage
    * ordinal rank from `zipWithIndex` (distributed two-pass count —
    * same idiom as [[GraftStage.fromDataset]], never a one-partition
    * window); then elements sort lexicographically by (rank, stage#) —
    * Spark's range-partitioned Sort, no driver accumulation (the
    * reference holds every iterator on one thread). Forces the indexed
    * plans and pays one rank job per input AT CALL TIME (zipWithIndex
    * computes partition offsets eagerly — same behavior as [[ordered]],
    * a documented exception to the nothing-runs-before-the-terminal
    * contract): order-defining by nature — use [[concat]] when arrival
    * order is acceptable. */
  def concatRoundRobin(others: GraftStage[T]*)(
      implicit et: Encoder[T], ee: Encoder[Element[T]]): GraftStage[T] = {
    val sess = spark
    val ranked = (this +: others).zipWithIndex.map { case (s, sNo) =>
      val n = sNo.toLong
      sess.createDataset(
        s.indexed.orderBy(col("index")).rdd.zipWithIndex.map {
          case (el, rank) => Element(Seq(rank, n), el.value) })(ee)
    }
    val merged = ranked.reduce(_ union _).orderBy(col("index"))
    new GraftStage(
      merged.map(_.value),
      // dense re-enumeration of the interleaved order, so downstream
      // ordered/flatMap indexing sees a normal source index space
      () => sess.createDataset(
        merged.rdd.zipWithIndex.map { case (el, j) => Element(Seq(j), el.value) })(ee))
  }

  /** Restore source-creation order by sorting on the index path — a
    * plain Spark `Sort` over `array<bigint>` (range-partitioned, fully
    * distributed), vs. the reference's accumulate-everything
    * single-worker insertion sort (pypeln/process/api/ordered.py:12-20,66).
    * Forces the indexed plan (and the one-time source indexing job).
    */
  def ordered(implicit et: Encoder[T]): GraftStage[T] = {
    val sorted = indexed.orderBy(col("index"))
    new GraftStage(sorted.map(_.value), () => sorted)
  }

  /** Fan-out support: persist so N downstream consumers share one
    * computation (reference broadcast-to-all-output-queues,
    * pypeln/process/queue.py:114-129). The indexed plan is cached
    * independently, on first use. Both persists are registered with
    * [[QueryCaches]] so a long-lived session can release them after
    * the pipeline's terminal action. */
  def cached: GraftStage[T] =
    new GraftStage(QueryCaches.track(plain), () => QueryCaches.track(indexed))

  /** Materialize as a local iterator of values; the `WithIndex` variant
    * yields full Elements (`return_index=True`,
    * reference: pypeln/process/api/to_iterable.py:26-53). */
  def toIterable: Iterator[T] =
    GraftErrors.unwrapIterator(plain.toLocalIterator().asScala)
  def toIterableWithIndex: Iterator[Element[T]] =
    GraftErrors.unwrapIterator(indexed.toLocalIterator().asScala)

  def collectValues(): Seq[T] = GraftErrors.unwrap(plain.collect().toSeq)

  /** Awaitable-stage parity: the whole stage gathered into a Future —
    * the task backend's `await stage` (reference:
    * pypeln/task/stage.py:105-115 `__await__` → list-gather). The
    * caller's thread never blocks; the drain runs on `ec`. User
    * exceptions fail the Future with their ORIGINAL type. */
  def toFutureSeq(implicit ec: scala.concurrent.ExecutionContext): Future[Seq[T]] =
    Future(collectValues())

  /** Async-pull terminal — the task backend's `to_async_iterable`
    * (reference: pypeln/task/api/to_iterable.py:62-101: the sync
    * source is pumped from an executor thread into a bounded queue and
    * consumed without blocking the event loop; same bridge here). A
    * daemon producer drains `toLocalIterator` into a `maxsize`-bounded
    * queue (backpressure: the producer blocks, Spark stops pulling
    * partitions), and each `next()` returns a Future — the consumer
    * thread never blocks per element. */
  def toAsyncIterator(maxsize: Int = 256): GraftStage.AsyncValueIterator[T] =
    new GraftStage.AsyncValueIterator[T](toIterable, maxsize)

  /** The stage as a DataFrame (plain path — use in declared queries). */
  def toDF: DataFrame = plain.toDF()

  /** The indexed plan as a DataFrame (`index: array<bigint>`, `value`). */
  def indexedDF: DataFrame = indexed.toDF()

  /** Pipe composition: `stage |> (_.map(f)) |> (_.filter(p))`
    * (reference: pypeln/utils.py:74-75,87-98 `__or__`/Partial). */
  def |>[B](f: GraftStage[T] => GraftStage[B]): GraftStage[B] = f(this)

  private implicit class RichJIterator[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }
}

object GraftStage {

  /** Default per-element bound for [[GraftStage.mapAsync]]: FINITE, so
    * the default configuration can never wedge a task behind one hung
    * Future (round-3 finding — `Duration.Inf` let an unresponsive
    * service stall the partition forever; the reference's task backend
    * swallows `asyncio.TimeoutError` per element when a bound is set,
    * task/worker.py:246-255, and a production async stage should
    * always have one). Pass `timeout = Duration.Inf` explicitly to opt
    * back into unbounded waits. */
  val DefaultAsyncTimeout: Duration = Duration(60, java.util.concurrent.TimeUnit.SECONDS)

  /** Async-pull iterator over a stage's values: `next()` completes with
    * `Some(value)` per element and `None` at exhaustion; a failure in
    * the pipeline fails the Future with the user's original exception.
    * Sequential-consumption contract (await each `next()` before the
    * next call), like any async-iterator protocol. */
  final class AsyncValueIterator[T] private[core] (source: Iterator[T], maxsize: Int) {
    private val END = new AnyRef
    private val queue = new java.util.concurrent.LinkedBlockingQueue[AnyRef](math.max(1, maxsize))
    private val producer = new Thread(() => {
      try { source.foreach(v => queue.put(v.asInstanceOf[AnyRef])); queue.put(END) }
      catch { case e: Throwable => queue.put(Failed(GraftErrors.userCause(e))) }
    }, "graft-async-drain")
    producer.setDaemon(true)
    producer.start()
    private case class Failed(e: Throwable)
    @volatile private var exhausted = false

    def next(): Future[Option[T]] = Future {
      if (exhausted) None
      else queue.take() match {
        case END => exhausted = true; None
        case Failed(e) => exhausted = true; throw e
        case v => Some(v.asInstanceOf[T])
      }
    }(asyncEc)

    /** Gather the remainder — `await stage` ergonomics on top of the
      * async pull. */
    def toSeq: Future[Seq[T]] = {
      implicit val ec: scala.concurrent.ExecutionContext = asyncEc
      def loop(acc: List[T]): Future[List[T]] = next().flatMap {
        case Some(v) => loop(v :: acc)
        case None => Future.successful(acc.reverse)
      }
      loop(Nil)
    }
  }

  /** Async-pull iterator bridged into a SYNC `Iterator` through a
    * `maxsize`-bounded queue — the pump half of [[fromAsyncIterator]],
    * exposed for tests. A daemon pump awaits each `nextF()` Future
    * SEQUENTIALLY (the async-iterator protocol: never request element
    * i+1 before i resolves) and `put`s into the bounded queue; when
    * the queue is full the pump blocks BEFORE requesting the next
    * element, so the producer is never advanced more than
    * `maxsize + 1` elements past the consumer — the reference's
    * `maxsize` backpressure contract. A failed Future surfaces on the
    * consumer side with the user's ORIGINAL exception. */
  final class AsyncSourceIterator[T] private[graft] (
      nextF: () => Future[Option[T]], maxsize: Int) extends Iterator[T] {
    private val END = new AnyRef
    private case class Failed(e: Throwable)
    private val queue = new java.util.concurrent.LinkedBlockingQueue[AnyRef](math.max(1, maxsize))
    private val pump = new Thread(() => {
      try {
        var done = false
        while (!done) {
          Await.result(nextF(), Duration.Inf) match {
            case Some(v) => queue.put(v.asInstanceOf[AnyRef])
            case None => done = true; queue.put(END)
          }
        }
      } catch { case e: Throwable => queue.put(Failed(GraftErrors.userCause(e))) }
    }, "graft-async-source-pump")
    pump.setDaemon(true)
    pump.start()
    private var head: AnyRef = _
    private var exhausted = false
    def hasNext: Boolean = {
      if (exhausted) return false
      if (head == null) queue.take() match {
        case END => exhausted = true
        case Failed(e) => exhausted = true; throw e
        case v => head = v
      }
      !exhausted
    }
    def next(): T = {
      if (!hasNext) throw new NoSuchElementException("async source exhausted")
      val v = head; head = null; v.asInstanceOf[T]
    }
  }

  /** Source from an ASYNC producer — the task backend's
    * `from_iterable(async_iterable)` (reference:
    * pypeln/task/api/from_iterable.py:14-80: the async source is pumped
    * from the event loop through a bounded queue into the pipeline).
    * `next()` yields `Some(value)` per element and `None` at
    * exhaustion, awaited sequentially; `maxsize` bounds how far the
    * producer runs ahead while the elements stage driver-side (a local
    * buffer is inherent on Spark — a Dataset source materializes before
    * the cluster plan sees it; the bound is the producer-side
    * backpressure, same as the reference's queue). */
  def fromAsyncIterator[T](next: () => Future[Option[T]], maxsize: Int = 256)(
      implicit spark: SparkSession, et: Encoder[T], ee: Encoder[Element[T]]): GraftStage[T] =
    fromIterable(new AsyncSourceIterator(next, maxsize).toSeq)

  /** Source from a local iterable; index `(i)` assigned by enumeration,
    * the creation-order contract of the reference
    * (pypeln/process/api/from_iterable.py:15-22). Indices here are free
    * (assigned driver-side), so the indexed plan costs no extra job. */
  def fromIterable[T](xs: Iterable[T])(
      implicit spark: SparkSession, et: Encoder[T], ee: Encoder[Element[T]]): GraftStage[T] = {
    val elems = xs.iterator.zipWithIndex.map { case (v, i) => Element(Seq(i.toLong), v) }.toSeq
    val ind = spark.createDataset(elems)
    new GraftStage(spark.createDataset(xs.toSeq), () => ind)
  }

  /** Source from an existing Dataset. The plain plan IS the dataset —
    * scans stay pruned/pushed-down. Creation-order indices are derived
    * lazily via `zipWithIndex` (one extra job, faithful enumeration —
    * `monotonically_increasing_id` would NOT be: not dense, not
    * creation-ordered across partitions), and only if the pipeline
    * actually demands order (`ordered` / `toIterableWithIndex`). */
  def fromDataset[T](d: Dataset[T])(implicit ee: Encoder[Element[T]]): GraftStage[T] =
    new GraftStage(d, () =>
      d.sparkSession.createDataset(
        d.rdd.zipWithIndex.map { case (v, i) => Element(Seq(i), v) })(ee))

  /** Column filter on an indexed plan: flatten value-struct fields so the
    * caller's Column resolves by payload field name, filter, re-nest.
    * (For atomic payloads the column is addressed as `value` — the same
    * name Spark gives single-column datasets, so conditions written for
    * the plain plan resolve unchanged.) */
  private[core] def filterIndexed[T](ind: Dataset[Element[T]], c: Column): Dataset[Element[T]] = {
    implicit val enc: Encoder[Element[T]] = ind.encoder
    ind.schema("value").dataType match {
      case st: StructType =>
        ind.select(col("index"), col("value.*"))
          .filter(c)
          .select(col("index"), struct(st.fieldNames.toSeq.map(col): _*).as("value"))
          .as[Element[T]]
      case _ => ind.filter(c)
    }
  }

  /** Bounded in-flight async window over a partition iterator — the
    * shared engine of batch [[GraftStage.mapAsync]] and streaming
    * `GraftStream.mapAsync`. Keeps ≤ n Futures outstanding, drains in
    * submission order, drops elements whose Future exceeds `t`
    * (reference task-backend semantics: semaphore-bounded TaskPool +
    * asyncio.wait_for, task/worker.py:225-255). */
  /** Elements dropped by [[GraftStage.mapAsync]] timeout expiry in THIS
    * JVM — drop-on-timeout must never be silent data loss (round-4
    * advice: the finite default timeout + silent drop could lose
    * elements invisibly). Each drop is also logged at WARN. On a
    * cluster every executor counts its own drops (the counter does not
    * flow back to the driver — watch executor logs/metrics there). */
  private val asyncDropped = new java.util.concurrent.atomic.LongAdder
  def asyncDroppedCount: Long = asyncDropped.sum()
  private lazy val asyncLog = org.slf4j.LoggerFactory.getLogger("graft.core.GraftStage")

  private[graft] def asyncWindowIterator[A, B, C](
      iter: Iterator[A], n: Int, t: Duration,
      submit: A => Future[B], mk: (A, B) => C): Iterator[C] = {
    val window = new scala.collection.mutable.Queue[(A, Future[B])]()
    new Iterator[C] {
      private var pending: Option[C] = None
      private def fill(): Unit =
        while (window.size < n && iter.hasNext) {
          val a = iter.next()
          window.enqueue((a, submit(a)))
        }
      private def advance(): Unit = {
        while (pending.isEmpty && { fill(); window.nonEmpty }) {
          val (a, fut) = window.dequeue()
          try pending = Some(mk(a, Await.result(fut, t)))
          catch {
            case _: TimeoutException => // drop on timeout — counted, never silent
              asyncDropped.increment()
              asyncLog.warn(s"mapAsync dropped an element after $t (total dropped in this JVM: ${asyncDropped.sum()})")
          }
        }
      }
      def hasNext: Boolean = { advance(); pending.nonEmpty }
      def next(): C = {
        advance()
        val r = pending.get; pending = None; r
      }
    }
  }

  /** Live census of a running stage — the reference's `stage_status`
    * dependency injection (pypeln/process/worker.py:103-117,189-209:
    * `active_workers`, `done`). On Spark the scheduler owns worker
    * lifecycle, so the census is a DRIVER-side view over
    * `SparkStatusTracker` (executor-side code sees its own identity via
    * [[WorkerInfo]] instead — accumulator reads don't flow back into
    * tasks on a real cluster). */
  final case class StageStatus(stageId: Int, activeWorkers: Int, completed: Int, total: Int) {
    def done: Boolean = activeWorkers == 0 && completed >= total
  }

  /** Status of every currently-active Spark stage (empty when idle). */
  def stageStatus(spark: SparkSession): Seq[StageStatus] = {
    val tracker = spark.sparkContext.statusTracker
    tracker.getActiveStageIds.toSeq.sorted.flatMap { id =>
      tracker.getStageInfo(id).map(si =>
        StageStatus(id, si.numActiveTasks, si.numCompletedTasks, si.numTasks))
    }
  }

  /** Executor-side ExecutionContext for [[GraftStage.mapAsync]] user
    * functions — the analog of the reference task backend's per-worker
    * event loop (task/utils.py:34-51). Reference it INSIDE the lambda
    * (`Future(...)(GraftStage.asyncEc)`): as an object member it
    * resolves statically on the executor, whereas a driver-side
    * ExecutionContext captured in the closure is not serializable. */
  lazy val asyncEc: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newCachedThreadPool(r => {
        val t = new Thread(r, "graft-async"); t.setDaemon(true); t
      }))

  /** Shared scratch pool for per-element timeout evaluation; daemon
    * threads so abandoned (non-interruptible) user code never blocks JVM
    * exit. The pool itself is cached/elastic: a hard thread cap would
    * deadlock fresh elements behind abandoned hung ones, and
    * interrupt-on-timeout (below) reclaims threads from any user code
    * that honors interruption — so for cooperative code the pool stays
    * at ≈ the number of concurrently evaluating elements. */
  private lazy val timeoutPool = java.util.concurrent.Executors.newCachedThreadPool(r => {
    val t = new Thread(r, "graft-timeout"); t.setDaemon(true); t
  })

  /** Live count of ABANDONED attempts: timed-out elements whose user
    * code ignored the interrupt and is still running on its scratch
    * thread. The reference reclaims these by killing the OS worker
    * process (process/worker.py:152-161); a JVM cannot kill a thread
    * safely, so the analog is a RESOURCE BOUND: past
    * `graft.timeout.maxAbandoned` live abandoned threads (default 256,
    * a system property so operators can size it per executor), the
    * next timed element fails fast with a diagnosis instead of letting
    * the JVM accrete hung threads without limit. */
  private[graft] val abandonedCount = new java.util.concurrent.atomic.AtomicInteger(0)

  private def maxAbandoned: Int =
    Integer.getInteger("graft.timeout.maxAbandoned", 256)

  /** Run `body` with a wall-clock bound: Some(result) if it finishes,
    * None if not — in which case the attempt is cancelled WITH interrupt
    * (reference semantics: kill worker, drop element, keep going —
    * process/supervisor.py:26-31). Non-interruptible attempts count
    * against the abandoned-thread bound until they eventually exit. */
  private[graft] def withTimeout[A](t: Duration)(body: => A): Option[A] = {
    if (abandonedCount.get() >= maxAbandoned)
      throw new IllegalStateException(
        s"graft timeout: ${abandonedCount.get()} abandoned worker threads " +
          "are still running user code that ignored interruption " +
          "(limit graft.timeout.maxAbandoned=" + maxAbandoned + "). " +
          "Make the timed code honor Thread.interrupt, raise the limit, " +
          "or restart the executor — refusing new timed work rather than " +
          "accreting hung threads without bound.")
    // abandoned bookkeeping: the flag flips exactly once, either by the
    // waiter (timeout path, increments) or by task exit (decrements iff
    // the waiter already gave up on it)
    val abandoned = new java.util.concurrent.atomic.AtomicBoolean(false)
    val fut = timeoutPool.submit(new Callable[A] {
      def call(): A =
        try body
        finally if (abandoned.getAndSet(true)) abandonedCount.decrementAndGet()
    })
    try Some(fut.get(t.toMillis, TimeUnit.MILLISECONDS))
    catch {
      case _: JTimeoutException =>
        fut.cancel(true)
        if (!abandoned.getAndSet(true)) abandonedCount.incrementAndGet()
        None
      case e: java.util.concurrent.ExecutionException => throw e.getCause
    }
  }
}

/** Typed error propagation (reference: worker exceptions cross the
  * process boundary as `PipelineException` and are re-raised in the
  * caller with the ORIGINAL type + remote traceback,
  * pypeln/process/queue.py:88-104, pypeln/utils.py:21-39, test
  * map_process_test.py:168-183). Spark already ships the serialized
  * cause back to the driver inside SparkException — we unwrap the cause
  * chain and re-throw the user's exception, remote stack intact.
  */
object GraftErrors {
  private def isEngine(e: Throwable): Boolean = {
    val n = e.getClass.getName
    n.startsWith("org.apache.spark.Spark") || n.startsWith("org.apache.spark.sql")
  }

  /** Innermost non-Spark cause, or the original throwable if none. */
  def userCause(e: Throwable): Throwable = {
    var cur: Throwable = e
    var best: Throwable = e
    while (cur != null) {
      if (!isEngine(cur)) { best = cur; cur = null }
      else cur = cur.getCause
    }
    best
  }

  def unwrap[A](body: => A): A =
    try body catch { case e: Throwable if isEngine(e) => throw userCause(e) }

  def unwrapIterator[A](it: Iterator[A]): Iterator[A] = new Iterator[A] {
    def hasNext: Boolean = unwrap(it.hasNext)
    def next(): A = unwrap(it.next())
  }
}

/** `to_stage`-style implicit coercions (reference:
  * pypeln/process/api/to_stage.py:9-13): any Seq or Dataset lifts into a
  * GraftStage at a pipe boundary via `.toStage`. */
object GraftImplicits {
  implicit class SeqToStage[T](private val xs: Iterable[T]) extends AnyVal {
    def toStage(implicit spark: SparkSession, et: Encoder[T], ee: Encoder[Element[T]]): GraftStage[T] =
      GraftStage.fromIterable(xs)
  }
  implicit class DatasetToStage[T](private val d: Dataset[T]) extends AnyVal {
    def toStage(implicit ee: Encoder[Element[T]]): GraftStage[T] =
      GraftStage.fromDataset(d)
  }
}
