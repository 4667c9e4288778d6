package graft

import graft.streaming.GraftStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Streaming SCALE smokes (round-7 verdict #6): the batch pillars have
  * 1M/10M-row generator smokes (DocGenSourceSpec / VecGenSourceSpec);
  * these drive the two heaviest streaming state machines through ~1.2M
  * synthetic rows under a wall-clock budget, proving the keyed-state
  * plans hold at volume, not just on the parity fixtures: state stays
  * O(keys) (not O(stream)), emission counts match the exact structural
  * oracle, and no per-row driver round-trip hides in the loop.
  * Budgets follow the DocGenSourceSpec convention: measured idle time
  * × ~3.5 for a loaded co-tenant machine.
  */
class StreamScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("scale smoke: cohortUpdates over 1M events / 50k users / 10 weeks") {
    implicit val sq = spark.sqlContext
    val users = 50000
    val weeks = 10
    val WeekMs = 7L * 86400000L
    val base = 1704067200000L // 2024-01-01, week-aligned enough: absolute weeks
    val in = MemoryStream[(Long, Timestamp)]
    val df = in.toDF().toDF("user", "ts")
    val total = new java.util.concurrent.atomic.AtomicLong
    val perOffset = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
    val q = GraftStream.cohortUpdates(df, "ts", "user", watermark = "7 days")
      .writeStream.outputMode("append")
      .foreachBatch((b: org.apache.spark.sql.Dataset[(Long, Long)], _: Long) => {
        total.addAndGet(b.count())
        b.groupBy("_2").count().collect().foreach(r =>
          perOffset.merge(r.getLong(0), r.getLong(1), (a, x) => a + x))
        ()
      }).start()
    val t0 = System.nanoTime()
    // 2 events per (user, week), batched by CONTIGUOUS week ranges in
    // time order, so no event ever falls behind the 7-day watermark —
    // the emission count is then exact: one row per (user, week).
    val rnd = new scala.util.Random(7)
    for (range <- Seq(0 until 3, 3 until 6, 6 until 9, 9 until 10)) {
      val batch = for {
        w <- range.toVector
        u <- 0 until users
        _ <- 0 until 2
      } yield (u.toLong, new Timestamp(base + w * WeekMs + rnd.nextInt(86400000)))
      in.addData(batch: _*)
      q.processAllAvailable()
    }
    q.stop()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(total.get() == users.toLong * weeks,
      s"expected one emission per (user, week): ${total.get()}")
    // every user's cohort is week 0 → offsets are exactly 0..9, each
    // emitted once per user
    (0 until weeks).foreach { w =>
      assert(perOffset.getOrDefault(w.toLong, 0L) == users.toLong,
        s"offset $w: ${perOffset.get(w.toLong)}")
    }
    assert(secs < 150.0, f"1M-event cohort stream took $secs%.1f s (budget 150 s on local[16])")
    info(f"1M events through cohortUpdates in $secs%.1f s")
  }

  test("scale smoke: scdUpdates compacts 1M events / 100k users to exactly 2 intervals each") {
    implicit val sq = spark.sqlContext
    val users = 100000
    val days = 10
    val DayMs = 86400000L
    val base = 1704067200000L
    val in = MemoryStream[(String, Timestamp, Long, Long)]
    val df = in.toDF().toDF("k", "ts", "s", "eid")
    val total = new java.util.concurrent.atomic.AtomicLong
    val q = GraftStream.scdUpdates(df, "ts", "k", "s", "eid", "0 seconds")
      .writeStream.outputMode("append")
      .foreachBatch((b: org.apache.spark.sql.Dataset[(String, Long, Long)], _: Long) => {
        total.addAndGet(b.filter(_._1 != "zz").count()); ()
      }).start()
    val t0 = System.nanoTime()
    // one event per (user, day); the tracked state flips once at day 5
    // (d/5: 0 then 1), so the 10-event history per user MUST compact to
    // exactly 2 interval-opens — the structural oracle. Chunks are
    // contiguous day ranges so nothing falls behind the watermark;
    // within a chunk, timestamps scatter inside each day.
    val rnd = new scala.util.Random(13)
    for (range <- Seq(0 until 3, 3 until 6, 6 until 9, 9 until 10)) {
      val batch = for {
        d <- range.toVector
        u <- 0 until users
      } yield (u.toString, new Timestamp(base + d * DayMs + rnd.nextInt(DayMs.toInt)),
        (d / 5).toLong, (d.toLong * users + u))
      in.addData(batch: _*)
      q.processAllAvailable()
    }
    in.addData(("zz", new Timestamp(base + 30L * DayMs), 0L, 0L))
    q.processAllAvailable()
    q.stop()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(total.get() == 2L * users,
      s"expected 2 intervals per user, got ${total.get()} total")
    assert(secs < 150.0, f"1M-event SCD stream took $secs%.1f s (budget 150 s)")
    info(f"1M events through scdUpdates in $secs%.1f s (${2L * users} intervals)")
  }

  test("scale smoke: nearDupVerified over 200k streamed docs finds every planted duplicate") {
    implicit val sq = spark.sqlContext
    val n = 200000
    val half = n / 2
    val vocab = Array("key", "agg", "row", "scan", "slow", "fast", "table", "value",
      "part", "hash", "merge", "batch", "spark", "line", "sort", "window",
      "join", "small", "query", "big", "group", "stream", "column", "data")
    def textFor(seed: Long): String = {
      val r = new scala.util.Random(seed * 2654435761L + 13)
      Seq.fill(20)(vocab(r.nextInt(vocab.length))).mkString(" ")
    }
    // planted EXACT duplicates (guaranteed band collision at any LSH
    // parameters — J=1): intra-batch pairs (i, i+1) at i % 2000 == 0 in
    // each half, cross-batch pairs (i, i+half) at i % 2000 == 1000
    def docText(id: Long): String =
      if (id % 2000 == 1) textFor(id - 1)
      else if (id >= half && (id - half) % 2000 == 1000) textFor(id - half)
      else textFor(id)
    val planted =
      (0L until half by 2000).map(i => (i, i + 1)) ++
        (half.toLong until n by 2000).map(i => (i, i + 1)) ++
        (1000L until half by 2000).map(i => (i, i + half))
    val in = MemoryStream[(Long, String)]
    val df = in.toDF().toDF("doc_id", "text")
    val got = java.util.concurrent.ConcurrentHashMap.newKeySet[(Long, Long)]()
    // 16 hashes / 2 bands (r=8): the 10M-doc batch smoke's parameters —
    // organic 20-token docs over a 24-word vocab land J≈0 pairwise, so
    // candidates stay planted-only; stateTtl = "" keeps NoTimeout so
    // processAllAvailable observes quiescence (operator scaladoc).
    val q = GraftStream.nearDupVerified(df, "doc_id", "text",
        k = 3, hashes = 16, bands = 2, threshold = 0.7, maxBucket = 8, stateTtl = "")
      .writeStream.outputMode("append")
      .foreachBatch((b: org.apache.spark.sql.Dataset[(Long, Long, Double)], _: Long) => {
        b.collect().foreach(p => got.add((p._1, p._2))); ()
      }).start()
    val t0 = System.nanoTime()
    in.addData((0L until half).map(i => (i, docText(i))): _*)
    q.processAllAvailable()
    in.addData((half.toLong until n).map(i => (i, docText(i))): _*)
    q.processAllAvailable()
    q.stop()
    val secs = (System.nanoTime() - t0) / 1e9
    val gotSet = new scala.collection.mutable.HashSet[(Long, Long)]()
    got.forEach(p => { gotSet += p; () })
    val missed = planted.filterNot(gotSet)
    assert(missed.isEmpty,
      s"${missed.size}/${planted.size} planted duplicate pairs missed: ${missed.take(5)}")
    assert(gotSet.size < planted.size + 100,
      s"organic candidate flood: ${gotSet.size} pairs vs ${planted.size} planted")
    assert(secs < 240.0, f"200k-doc verified near-dup stream took $secs%.1f s (budget 240 s on local[16])")
    info(f"200k docs through nearDupVerified in $secs%.1f s, ${gotSet.size} pairs")
  }

  test("scale smoke: pitUpdates serves 1M events / 50k users with activity-bounded state") {
    // The PIT feature server at volume: 20 events per user spread over
    // 20 days, one per day — the trailing-7-day prune caps state at ~7
    // events/user no matter the stream length, and every 4th event is
    // a sampled-user purchase label. Structural oracle: label count is
    // exact (every purchase of a user % 5 == 0 emits once), and each
    // emission's prior-purchase count is < 2 (at one event/day, a 7-day
    // window holds at most 1 earlier purchase of the 4-day cadence...
    // exactly 1 after the first) — checked in aggregate.
    implicit val sq = spark.sqlContext
    val users = 50000
    val days = 20
    val DayUs = 86400L * 1000000L
    val in = MemoryStream[(Long, Long, String, Long)]
    val df = in.toDF().toDF("user_id", "tus", "event_type", "cents")
    val nOut = new java.util.concurrent.atomic.AtomicLong
    val sumPrior = new java.util.concurrent.atomic.AtomicLong
    val q = GraftStream.pitUpdates(df, "user_id", "tus", "event_type", "cents")
      .writeStream.outputMode("append")
      .foreachBatch((b: org.apache.spark.sql.Dataset[(Long, Long, Long, Long, Long, Long)],
                     _: Long) => {
        val rs = b.collect(); nOut.addAndGet(rs.length.toLong)
        rs.foreach(r => sumPrior.addAndGet(r._5)); ()
      }).start()
    val t0 = System.nanoTime()
    for (range <- Seq(0 until 7, 7 until 14, 14 until 20)) {
      val batch = for {
        d <- range.toVector
        u <- 0 until users
      } yield (u.toLong, d * DayUs + (u % 1000).toLong,
        if (d % 4 == 3) "purchase" else "view", 100L)
      in.addData(batch: _*)
      q.processAllAvailable()
    }
    q.stop()
    val secs = (System.nanoTime() - t0) / 1e9
    val sampled = users / 5
    // labels at days 3, 7, 11, 15, 19 for every sampled user
    assert(nOut.get() == sampled.toLong * 5, s"label emissions: ${nOut.get()}")
    // day-3 labels see 0 prior purchases; each later label sees exactly
    // 1 (the previous purchase is 4 days back, inside the 7-day window)
    assert(sumPrior.get() == sampled.toLong * 4, s"prior purchases: ${sumPrior.get()}")
    assert(secs < 150.0, f"1M-event PIT stream took $secs%.1f s (budget 150 s on local[16])")
    info(f"1M events through pitUpdates in $secs%.1f s, ${nOut.get()} feature rows")
  }
}
