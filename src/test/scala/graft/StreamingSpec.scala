package graft

import graft.streaming.GraftStream
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import java.util.concurrent.ConcurrentLinkedQueue

/** Streaming parity slice (SURVEY §7.2 step 4): unbounded sources with
  * bounded per-trigger admission (the reference's maxsize
  * backpressure), transform parity on streams, ForeachWriter lifecycle
  * (= on_start/f/on_done), and event-time windows checked against
  * their batch oracles.
  */
/** Executor-visible static state for the ForeachWriter lifecycle test. */
object StreamingSpecState {
  val seen = new ConcurrentLinkedQueue[Int]()
  val opens = new java.util.concurrent.atomic.AtomicInteger
  val closes = new java.util.concurrent.atomic.AtomicInteger
  def reset(): Unit = { seen.clear(); opens.set(0); closes.set(0) }
}

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("stream map/filter parity: results equal the Scala-collection oracle") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Int]
    val out = new ConcurrentLinkedQueue[Int]()
    val st = new GraftStream(in.toDS()).map(_ * 2).filter(_ % 3 != 0)
    val q = st.eachBatch((batch, _) => batch.collect().foreach(out.add))
    in.addData(1 to 100: _*)
    q.processAllAvailable(); q.stop()
    assert(out.toArray.map(_.asInstanceOf[Int]).sorted.toSeq ==
      (1 to 100).map(_ * 2).filter(_ % 3 != 0))
  }

  test("ForeachWriter each: lifecycle open/process/close = on_start/f/on_done") {
    // The ForeachWriter is task-serialized, so captured locals would be
    // a deserialized COPY on the "executor" — state lives in a static
    // holder (same JVM in local mode).
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Int]
    StreamingSpecState.reset()
    val q = new GraftStream(in.toDS())
      .eachStart[Unit]((v, _) => { StreamingSpecState.seen.add(v); () },
        onStart = _ => { StreamingSpecState.opens.incrementAndGet(); () },
        onDone = _ => { StreamingSpecState.closes.incrementAndGet(); () })
    in.addData(1 to 50: _*)
    q.processAllAvailable(); q.stop()
    assert(StreamingSpecState.seen.toArray.map(_.asInstanceOf[Int]).sorted.toSeq == (1 to 50))
    assert(StreamingSpecState.opens.get() > 0 &&
      StreamingSpecState.opens.get() == StreamingSpecState.closes.get())
  }

  test("maxsize analog: file source admits one file per trigger, totals match batch") {
    // Stage 3 copies of events.parquet in a fresh dir: with
    // maxFilesPerTrigger=1 the stream must drain in 3 micro-batches
    // (bounded admission — the maxsize contract), totalling 3× the
    // batch count.
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val src = Paths.get("/root/testdata/sf0.001/events.parquet")
    val dir = Files.createTempDirectory("graft_stream_in")
    (1 to 3).foreach(i => Files.copy(src, dir.resolve(s"part-$i.parquet"),
      StandardCopyOption.REPLACE_EXISTING))
    val schema = spark.read.parquet(src.toString).schema
    val st = GraftStream.files(spark, dir.toString, schema, maxFilesPerTrigger = 1)
    val counts = new ConcurrentLinkedQueue[Long]()
    val q = st.eachBatch((batch, _) => { counts.add(batch.count()); () })
    q.processAllAvailable(); q.stop()
    val batchTotal = spark.read.parquet(src.toString).count()
    val got = counts.toArray.map(_.asInstanceOf[Long])
    assert(got.sum == 3 * batchTotal)
    assert(got.length == 3, s"expected 3 one-file micro-batches, got ${got.length}")
  }

  test("watermarked tumbling window equals its batch oracle") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val df = in.toDF().toDF("ts", "v")
    val rows = new ConcurrentLinkedQueue[Row]()
    val q = GraftStream.windowedCounts(df, "ts", "1 minute", "10 seconds")
      .writeStream.outputMode("update")
      .foreachBatch((b: org.apache.spark.sql.Dataset[Row], _: Long) =>
        { b.collect().foreach(rows.add); () })
      .start()
    val base = 1700000000000L
    in.addData((0 until 60).map(i => (new Timestamp(base + i * 1000L), i.toLong)): _*)
    q.processAllAvailable(); q.stop()
    // update-mode emits per-window rows; last emission per window wins
    val got = rows.toArray.map(_.asInstanceOf[Row])
      .map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap
    val expected = (0 until 60).map(i => (base + i * 1000L) / 10000 * 10000)
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got == expected)
  }

  test("streaming dedup: duplicate keys within the watermark are dropped, state bounded") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val df = in.toDF().toDF("ts", "k")
    val rows = new ConcurrentLinkedQueue[Long]()
    val q = GraftStream.dedupExact(df, "ts", "10 minutes", "k")
      .writeStream.outputMode("append")
      .foreachBatch((b: org.apache.spark.sql.Dataset[Row], _: Long) =>
        { b.collect().foreach(r => rows.add(r.getLong(1))); () })
      .start()
    val base = 1700000000000L
    // 100 events over 20 keys: every key repeats 5x inside the watermark
    in.addData((0 until 100).map(i => (new Timestamp(base + i * 1000L), (i % 20).toLong)): _*)
    q.processAllAvailable(); q.stop()
    val got = rows.toArray.map(_.asInstanceOf[Long]).sorted.toSeq
    assert(got == (0L until 20L), s"each key exactly once, got $got")
  }

  test("streaming session_window equals the lag-based batch sessionization shape") {
    // Batch check of the same session_window operator the stream uses:
    // session count and per-session event totals must equal the
    // lag+running-sum oracle (EventQueries.eventsSessions) at 30 min.
    val dir = "/root/testdata/sf0.001"
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), timestamp_micros(expr("ts div 1000")).as("tm"))
    val viaSessionWindow = ev
      .groupBy(session_window(col("tm"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val viaLag = queries.EventQueries.eventsSessions(spark, dir)
      .select(col("user_id"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(viaSessionWindow == viaLag)
  }
}
