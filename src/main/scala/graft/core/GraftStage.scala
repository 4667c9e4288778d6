package graft.core

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions.col

import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future, TimeoutException}

/** Per-worker identity handed to lifecycle hooks and user functions,
  * mirroring the reference's `worker_info` dependency injection
  * (reference: pypeln/process/worker.py:48-49,92-94). On Spark a
  * "worker" is a partition-task; `index` is the partition id.
  */
final case class WorkerInfo(index: Int, stageId: Int, attempt: Long)

/** A lazy pipeline stage: the Spark-native analog of the reference's
  * `Stage` DAG node (reference: pypeln/process/stage.py:13-24). Wraps a
  * `Dataset[Element[T]]` — Spark's lineage IS the lazy DAG, Catalyst is
  * the planner the reference never had, and the shuffle is the
  * inter-stage queue. Nothing executes until a terminal action
  * (`toIterable` / `run` / `collect`), exactly like the reference's
  * iterate-to-run contract (reference: docs/advanced.md:35).
  *
  * Concurrency mapping:
  *   - `workers = n`  → `repartition(n)` (reference: process/stage.py:51-64)
  *   - task-backend async IO with `workers = n` → [[mapAsync]]: a bounded
  *     in-flight window of Futures inside each partition
  *     (reference: task/worker.py:217-283 semaphore-bounded TaskPool)
  *   - `timeout` → per-element Future + await, element dropped on expiry
  *     (reference: process/supervisor.py:19-32, worker.py:152-161)
  *   - `on_start` / `on_done` → partition open/close hooks
  *     (reference: process/worker.py:68-127)
  */
final class GraftStage[T](val ds: Dataset[Element[T]]) extends Serializable {

  private def spark: SparkSession = ds.sparkSession

  /** 1→1 transform; index passes through untouched
    * (reference: pypeln/process/api/map.py:19-27). */
  def map[B](f: T => B)(implicit e: Encoder[Element[B]]): GraftStage[B] =
    new GraftStage(ds.map(el => Element(el.index, f(el.value))))

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
      onDone: S => Unit = (_: S) => ())(implicit e: Encoder[Element[B]]): GraftStage[B] = {
    val in = if (workers > 0) ds.repartition(workers) else ds
    val t = timeout
    new GraftStage(in.mapPartitions { iter =>
      val tc = TaskContext.get()
      val wi = WorkerInfo(tc.partitionId(), tc.stageId(), tc.taskAttemptId())
      val state = onStart(wi)
      tc.addTaskCompletionListener[Unit](_ => onDone(state))
      if (t <= Duration.Zero) iter.map(el => Element(el.index, f(el.value, state)))
      else {
        // Timeout semantics per the reference: the element is DROPPED,
        // the pipeline continues (process/api/map_process_test.py:63-76).
        // The worker thread is not killed (Spark tasks are not
        // restartable mid-partition); the user fn runs on a scratch
        // thread so a hung element can't wedge the task.
        implicit val ec: ExecutionContext = GraftStage.timeoutEc
        iter.flatMap { el =>
          try Some(Element(el.index, Await.result(Future(f(el.value, state)), t)))
          catch { case _: TimeoutException => None }
        }
      }
    })
  }

  /** 1→N transform; each child element i gets index `parent :+ i`
    * (reference: pypeln/process/api/flat_map.py:22-28). */
  def flatMap[B](f: T => IterableOnce[B])(implicit e: Encoder[Element[B]]): GraftStage[B] =
    new GraftStage(ds.flatMap { el =>
      f(el.value).iterator.zipWithIndex.map { case (v, i) => Element(el.push(i.toLong), v) }
    })

  /** Keep elements where the predicate holds; index untouched
    * (reference: pypeln/process/api/filter.py:19-27). */
  def filter(p: T => Boolean): GraftStage[T] =
    new GraftStage(ds.filter((el: Element[T]) => p(el.value)))

  /** Async-IO map: the task-backend analog. Keeps up to `workers`
    * Futures in flight per partition (bounded window ≈ the reference's
    * semaphore-bounded TaskPool, task/worker.py:225-238). Completions
    * are drained in submission order (per-partition order preserved;
    * global order is not, same as the reference under concurrency).
    */
  def mapAsync[B](f: T => Future[B], workers: Int = 8)(implicit e: Encoder[Element[B]]): GraftStage[B] = {
    val n = math.max(1, workers)
    new GraftStage(ds.mapPartitions { iter =>
      val window = new scala.collection.mutable.Queue[(Seq[Long], Future[B])]()
      new Iterator[Element[B]] {
        private def fill(): Unit =
          while (window.size < n && iter.hasNext) {
            val el = iter.next()
            window.enqueue((el.index, f(el.value)))
          }
        def hasNext: Boolean = { fill(); window.nonEmpty }
        def next(): Element[B] = {
          fill()
          val (idx, fut) = window.dequeue()
          Element(idx, Await.result(fut, Duration.Inf))
        }
      }
    })
  }

  /** Side-effect sink (reference: pypeln/process/api/each.py:19-26).
    * Lazy like the reference; call [[run]] to execute. */
  def each(f: T => Unit): GraftStage[T] = {
    implicit val enc: Encoder[Element[T]] = ds.encoder
    new GraftStage(ds.map { el => f(el.value); el })
  }

  /** Drain the stage for its side effects
    * (reference: pypeln/process/api/run.py:15-43). */
  def run(): Unit = ds.foreach((_: Element[T]) => ())

  /** Union-all of stages; interleaving is partition-order, order not
    * preserved — same contract as the concurrent backends
    * (reference: pypeln/process/api/concat.py:14-16). */
  def concat(others: GraftStage[T]*): GraftStage[T] =
    new GraftStage(others.foldLeft(ds)((a, b) => a.union(b.ds)))

  /** Restore source-creation order by sorting on the index path — a
    * plain Spark `Sort` over `array<bigint>` (range-partitioned, fully
    * distributed), vs. the reference's accumulate-everything
    * single-worker insertion sort (pypeln/process/api/ordered.py:12-20,66).
    */
  def ordered: GraftStage[T] = new GraftStage(ds.orderBy(col("index")))

  /** Fan-out support: persist so N downstream consumers share one
    * computation (reference broadcast-to-all-output-queues,
    * pypeln/process/queue.py:114-129). */
  def cached: GraftStage[T] = new GraftStage(ds.cache())

  /** Materialize as a local iterator of values; `returnIndex = true`
    * yields full Elements (reference: pypeln/process/api/to_iterable.py:26-53). */
  def toIterable: Iterator[T] = ds.toLocalIterator().asScala.map(_.value)
  def toIterableWithIndex: Iterator[Element[T]] = ds.toLocalIterator().asScala

  def collectValues(): Seq[T] = ds.collect().toSeq.map(_.value)

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
  /** Shared pool for per-element timeout evaluation; daemon threads so
    * hung user code never blocks JVM exit. */
  private[core] lazy val timeoutEc: ExecutionContext =
    ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newCachedThreadPool(r => {
        val t = new Thread(r, "graft-timeout"); t.setDaemon(true); t
      }))

  /** Source from a local iterable; index `(i)` assigned by enumeration,
    * the creation-order contract of the reference
    * (pypeln/process/api/from_iterable.py:15-22). */
  def fromIterable[T](xs: Iterable[T])(implicit spark: SparkSession, e: Encoder[Element[T]]): GraftStage[T] =
    new GraftStage(spark.createDataset(
      xs.iterator.zipWithIndex.map { case (v, i) => Element(Seq(i.toLong), v) }.toSeq))

  /** Source from an existing Dataset. `zipWithIndex` (one extra job)
    * gives faithful creation-order indices; `monotonically_increasing_id`
    * would NOT (not dense, not creation-ordered across partitions). */
  def fromDataset[T](d: Dataset[T])(implicit e: Encoder[Element[T]]): GraftStage[T] = {
    val enc = e
    new GraftStage(d.sparkSession.createDataset(
      d.rdd.zipWithIndex.map { case (v, i) => Element(Seq(i), v) })(enc))
  }
}
