package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CHECKPOINT RECOVERY — the production property none of the other
  * streaming tests touch: a stopped keyed-state query, restarted
  * against the SAME checkpoint, must (a) resume its state store (the
  * running counts continue, not reset), (b) not re-read committed
  * offsets (already-processed files are not reprocessed), and (c)
  * continue the batch-id sequence (the contract foreachBatch sinks key
  * their idempotence on). MemoryStream is not replayable across
  * restarts, so the source is a parquet DIRECTORY fed file-by-file —
  * the [[graft.streaming.GraftStream.files]] production entry.
  */
class StreamingRecoverySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("keyed state and source offsets survive a stop/restart from checkpoint") {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    val srcDir = Files.createTempDirectory("graft_rec_src").toString
    val ckptDir = Files.createTempDirectory("graft_rec_ckpt").toString
    // The stream reads the top-level dir; each feed lands as a new
    // subdirectory-free file set — write to a scratch dir then move the
    // parquet part in, so half-written files never enter the listing.
    def feed(name: String, rows: Seq[(Long, Long)]): Unit = {
      val tmp = Files.createTempDirectory("graft_rec_stage").toString
      rows.toDF("user_id", "v").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(srcDir, s"$name.parquet")
      assert(part.renameTo(dst), s"stage move failed for $name")
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType)))
    val emitted = new ConcurrentLinkedQueue[(Long, Long, Long)]() // (batchId, user, count)
    def pipeline() = spark.readStream.schema(schema).parquet(srcDir)
      .select(col("user_id").cast("long").as("u")).as[Long]
      .groupByKey(identity)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, events: Iterator[Long], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + events.size
          state.update(n)
          (user, n)
      }
      .writeStream.outputMode(OutputMode.Update())
      .option("checkpointLocation", ckptDir)
      .foreachBatch((b: org.apache.spark.sql.Dataset[(Long, Long)], bid: Long) =>
        { b.collect().foreach { case (u, n) => emitted.add((bid, u, n)) }; () })
    // ---- run 1: users 1x3, 2x2
    feed("a", Seq((1L, 0L), (1L, 1L), (1L, 2L), (2L, 0L), (2L, 1L)))
    val q1 = pipeline().start()
    q1.processAllAvailable()
    val run1LastBatch = q1.lastProgress.batchId
    q1.stop()
    val after1 = emitted.toArray.map(_.asInstanceOf[(Long, Long, Long)])
      .groupBy(_._2).map { case (u, vs) => u -> vs.maxBy(_._1)._3 }
    assert(after1 == Map(1L -> 3L, 2L -> 2L), s"run 1 counts: $after1")
    // ---- run 2 from the SAME checkpoint: users 1x2, 3x1
    feed("b", Seq((1L, 3L), (1L, 4L), (3L, 0L)))
    val q2 = pipeline().start()
    q2.processAllAvailable()
    val run2LastBatch = q2.lastProgress.batchId
    q2.stop()
    val run2Rows = emitted.toArray.map(_.asInstanceOf[(Long, Long, Long)])
      .filter(_._1 > run1LastBatch)
    // (a) state recovered: user 1 continues 3 -> 5, never back to 2
    assert(run2Rows.filter(_._2 == 1L).map(_._3).toSet == Set(5L),
      s"user 1 must resume at 3+2=5, got $run2Rows")
    assert(run2Rows.filter(_._2 == 3L).map(_._3).toSet == Set(1L),
      s"fresh user 3 must start at 1, got $run2Rows")
    // (b) no reprocessing: file a's rows were NOT re-read — user 2 had
    // no run-2 input, so Update mode must not emit it again
    assert(!run2Rows.exists(_._2 == 2L),
      s"user 2 must not re-emit after restart (file a reprocessed?): $run2Rows")
    // (c) the batch-id sequence continues past run 1's last committed id
    assert(run2LastBatch > run1LastBatch,
      s"batch ids must continue across restart: $run1LastBatch -> $run2LastBatch")
  }

  test("near-dup bucket state survives restart: post-restart duplicate pairs the pre-restart original") {
    // The dedup-horizon contract under restarts: with eviction off
    // (stateTtl = ""), a duplicate arriving AFTER a stop/restart must
    // still pair against the original seen BEFORE it — the LSH bucket
    // membership lives in the checkpointed state store, not the JVM.
    import spark.implicits._
    val srcDir = Files.createTempDirectory("graft_rec2_src").toString
    val ckptDir = Files.createTempDirectory("graft_rec2_ckpt").toString
    def feed(name: String, rows: Seq[(Long, String)]): Unit = {
      val tmp = Files.createTempDirectory("graft_rec2_stage").toString
      rows.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      assert(part.renameTo(new java.io.File(srcDir, s"$name.parquet")))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val pairs = new ConcurrentLinkedQueue[(Long, Long)]()
    def pipeline() = graft.streaming.GraftStream.nearDupCandidates(
        spark.readStream.schema(schema).parquet(srcDir), "doc_id", "text",
        stateTtl = "")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckptDir)
      .foreachBatch((b: org.apache.spark.sql.Dataset[(Long, Long)], _: Long) =>
        { b.collect().foreach(pairs.add); () })
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    feed("a", Seq((1L, base)))
    val q1 = pipeline().start()
    q1.processAllAvailable(); q1.stop()
    assert(pairs.isEmpty, s"a lone doc must not pair: ${pairs.toArray.mkString(",")}")
    feed("b", Seq((2L, base)))
    val q2 = pipeline().start()
    q2.processAllAvailable(); q2.stop()
    val got = pairs.toArray.map(_.asInstanceOf[(Long, Long)]).toSet
    assert(got == Set((1L, 2L)),
      s"restart must preserve doc 1's buckets so doc 2 pairs it, got $got")
  }

  test("co-travel bucket state survives restart: a post-restart tip retracts PRE-restart pairs") {
    // The retraction contract under restarts: bucket membership lives
    // in the checkpointed store, so a bucket that emitted pairs BEFORE
    // a stop must, when the cap-tipping user arrives AFTER the
    // restart, retract exactly those pre-restart pairs — the
    // exactly-once delta ledger holds across process boundaries.
    import spark.implicits._
    val srcDir = Files.createTempDirectory("graft_rec_ct_src").toString
    val ckptDir = Files.createTempDirectory("graft_rec_ct_ckpt").toString
    def feed(name: String, rows: Seq[(Long, Long, Long, Long)]): Unit = {
      val tmp = Files.createTempDirectory("graft_rec_ct_stage").toString
      rows.toDF("u", "hb", "cx", "cy").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      assert(part.renameTo(new java.io.File(srcDir, s"$name.parquet")))
    }
    val schema = org.apache.spark.sql.types.StructType(
      Seq("u", "hb", "cx", "cy").map(n => org.apache.spark.sql.types.StructField(
        n, org.apache.spark.sql.types.LongType)))
    val out = new ConcurrentLinkedQueue[(Long, Long, Long, Long, Long, Int)]()
    def pipeline() = graft.streaming.GraftStream.cotravelUpdates(
        spark.readStream.schema(schema).parquet(srcDir),
        "u", "hb", "cx", "cy", cap = 3)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckptDir)
      .foreachBatch((b: org.apache.spark.sql.Dataset[(Long, Long, Long, Long, Long, Int)], _: Long) =>
        { b.collect().foreach(out.add); () })
    // run 1: bucket A fills to the cap (3 members -> 3 emitted pairs)
    feed("a", Seq((1L, 9L, 0L, 0L), (2L, 9L, 0L, 0L), (3L, 9L, 0L, 0L)))
    val q1 = pipeline().start()
    q1.processAllAvailable(); q1.stop()
    assert(out.toArray.length == 3, s"run 1 must emit A's 3 pairs: ${out.toArray.mkString(",")}")
    // run 2 from the SAME checkpoint: user 4 tips A hot; bucket B pairs
    feed("b", Seq((4L, 9L, 0L, 0L), (1L, 9L, 5L, 5L), (2L, 9L, 5L, 5L)))
    val q2 = pipeline().start()
    q2.processAllAvailable(); q2.stop()
    val rows = out.toArray.map(_.asInstanceOf[(Long, Long, Long, Long, Long, Int)]).toSeq
    val netA = rows.filter(_._2 == 0L).groupBy(r => (r._4, r._5))
      .view.mapValues(_.map(_._6).sum).toMap
    assert(netA == Map((1L, 2L) -> 0, (1L, 3L) -> 0, (2L, 3L) -> 0),
      s"the post-restart tip must retract exactly the pre-restart pairs: $netA")
    assert(rows.filter(_._2 == 5L) == Seq((9L, 5L, 5L, 1L, 2L, 1)),
      s"bucket B's fresh pair must still emit: ${rows.filter(_._2 == 5L)}")
  }

  test("TTL-armed state across restart: the deadline RESUMES (absolute, checkpointed); data beats a lapsed deadline") {
    // The ProcessingTimeTimeout restart contract, pinned: the timeout
    // deadline is an ABSOLUTE processing-time instant stored in the
    // state store, so a stop/restart does NOT re-arm it — a deadline
    // that lapses while the query is DOWN is already expired at the
    // first post-restart batch. Two consequences, both asserted:
    // (1) a bucket that RECEIVES DATA in the restart batch is invoked
    //     as a data call (hasTimedOut = false) even though its deadline
    //     lapsed during downtime — the duplicate still pairs the
    //     pre-restart original (data arrival supersedes the timeout);
    // (2) after a second downtime lapse, a restart batch in which the
    //     bucket receives NO data fires the persisted timeout and
    //     evicts — a later duplicate re-seeds without pairing.
    // Sleeps here are WHILE THE QUERY IS STOPPED (wall clock vs a
    // persisted absolute deadline — no scheduler race, unlike the
    // in-flight TTL test's counted batches).
    import spark.implicits._
    val srcDir = Files.createTempDirectory("graft_rec3_src").toString
    val ckptDir = Files.createTempDirectory("graft_rec3_ckpt").toString
    def feed(name: String, rows: Seq[(Long, String)]): Unit = {
      val tmp = Files.createTempDirectory("graft_rec3_stage").toString
      rows.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      assert(part.renameTo(new java.io.File(srcDir, s"$name.parquet")))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val pairs = new ConcurrentLinkedQueue[(Long, Long)]()
    val ttlMs = 5000L
    def pipeline() = graft.streaming.GraftStream.nearDupCandidates(
        spark.readStream.schema(schema).parquet(srcDir), "doc_id", "text",
        stateTtl = "5 seconds")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckptDir)
      .foreachBatch((b: org.apache.spark.sql.Dataset[(Long, Long)], _: Long) =>
        { b.collect().foreach(pairs.add); () })
    // processAllAvailable is unusable under ProcessingTimeTimeout (the
    // engine busy-schedules timeout-check batches) — await the file
    // source's committed log offset instead.
    def awaitOffset(q: org.apache.spark.sql.streaming.StreamingQuery, n: Long): Unit = {
      def off: Long = Option(q.lastProgress)
        .flatMap(p => p.sources.headOption).map(_.endOffset)
        .filter(_ != null).map(_.replaceAll("[^0-9]", ""))
        .filter(_.nonEmpty).map(_.toLong).getOrElse(-1L)
      val deadline = System.currentTimeMillis() + 120000
      while (off < n && System.currentTimeMillis() < deadline) {
        q.exception.foreach(e => fail(s"query died: ${e.cause}"))
        Thread.sleep(50)
      }
      assert(off >= n, s"stream did not commit file-log offset $n")
    }
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    // ---- run 1: seed doc 1, stop; TTL deadline persists in the ckpt
    feed("a", Seq((1L, base)))
    val q1 = pipeline().start()
    awaitOffset(q1, 0); q1.stop()
    // ---- downtime > TTL: the checkpointed deadline lapses while down
    Thread.sleep(ttlMs + 2000)
    // ---- run 2: duplicate arrives IN the restart batch → data call
    feed("b", Seq((2L, base)))
    val q2 = pipeline().start()
    awaitOffset(q2, 1)
    val settle = System.currentTimeMillis() + 120000
    def got = pairs.toArray.map(_.asInstanceOf[(Long, Long)]).toSet
    while (!got.contains((1L, 2L)) && System.currentTimeMillis() < settle)
      Thread.sleep(50)
    q2.stop()
    assert(got.contains((1L, 2L)),
      s"data in the restart batch must supersede the lapsed deadline, got $got")
    // ---- downtime > TTL again, then a restart batch with NO data for
    // docs 1/2's buckets: the persisted (lapsed) deadline fires
    Thread.sleep(ttlMs + 2000)
    feed("c", Seq((9L, "completely different unrelated words that share no shingle window at all")))
    val q3 = pipeline().start()
    awaitOffset(q3, 2)
    // late duplicate must RE-SEED (originals evicted), not pair 1/2
    feed("d", Seq((4L, base)))
    awaitOffset(q3, 3)
    q3.stop()
    val finalGot = got
    assert(finalGot == Set((1L, 2L)),
      s"after the no-data restart batch the buckets must be evicted — doc 4 re-seeds " +
        s"without pairing, got $finalGot")
  }

  test("cdcUpdates state resumes across restart; final winners feed cdcMerge == batch merge") {
    // The CDC serving chain under restart: per-key (ord, tie)-max state
    // must RESUME from the checkpoint (the post-restart emission for a
    // key carries the CUMULATIVE change count and compares new changes
    // against the PRE-restart winner), and the stream's final winners,
    // applied through MergeOps.cdcMerge, must equal the one-shot batch
    // merge over base + all changes.
    import org.apache.spark.sql.functions.{col, max_by, struct, count, lit}
    import spark.implicits._
    val srcDir = Files.createTempDirectory("graft_rec4_src").toString
    val ckptDir = Files.createTempDirectory("graft_rec4_ckpt").toString
    def feed(name: String, rows: Seq[(String, Long, Long, String, Long)]): Unit = {
      val tmp = Files.createTempDirectory("graft_rec4_stage").toString
      rows.toDF("k", "o", "t", "op", "v").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      assert(part.renameTo(new java.io.File(srcDir, s"$name.parquet")))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("o", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("t", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("op", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType)))
    val emitted = new ConcurrentLinkedQueue[(String, String, Long, Long)]()
    def pipeline() = graft.streaming.GraftStream.cdcUpdates(
        spark.readStream.schema(schema).parquet(srcDir), "k", "o", "t", "op", "v")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckptDir)
      .foreachBatch((b: org.apache.spark.sql.Dataset[(String, String, Long, Long)], _: Long) =>
        { b.collect().foreach(emitted.add); () })
    val run1 = Seq(("k1", 1L, 0L, "U", 11L), ("k2", 1L, 0L, "U", 21L))
    // run 2: k1 upgrades (ord 2), k2 deleted (ord 2), k4 fresh insert,
    // plus a STALE k1 change (ord 0) that must LOSE to the resumed
    // pre-restart winner — the assertion that state, not batch-local
    // max, decides.
    val run2 = Seq(("k1", 2L, 0L, "U", 12L), ("k1", 0L, 0L, "U", 99L),
      ("k2", 2L, 0L, "D", 0L), ("k4", 1L, 0L, "U", 40L))
    feed("a", run1)
    val q1 = pipeline().start()
    q1.processAllAvailable(); q1.stop()
    feed("b", run2)
    val q2 = pipeline().start()
    q2.processAllAvailable(); q2.stop()
    // latest emission per key (max cumulative n) = the stream's winner
    val finals = emitted.toArray.map(_.asInstanceOf[(String, String, Long, Long)])
      .groupBy(_._1).map { case (k, es) => es.maxBy(_._4) }.toSeq
    // cumulative counts prove resumed state: k1 saw 1 (run 1) + 2 (run 2)
    val fmap = finals.map(e => e._1 -> ((e._2, e._3, e._4))).toMap
    assert(fmap("k1") == (("U", 12L, 3L)),
      s"k1 must resume (n=3 cumulative) and keep ord-2 winner over the stale ord-0: $fmap")
    assert(fmap("k2") == (("D", 0L, 2L)), s"k2 delete must win on resumed ord: $fmap")
    assert(fmap("k4") == (("U", 40L, 1L)), s"k4 fresh: $fmap")
    // the stream's winners == the batch winners over ALL changes
    val allChanges = (run1 ++ run2).toDF("k", "o", "t", "op", "v")
    val batchWinners = allChanges.groupBy(col("k"))
      .agg(max_by(struct(col("op"), col("v")), struct(col("o"), col("t"))).as("w"),
        count(lit(1)).as("n"))
      .select(col("k"), col("w.op").as("op"), col("w.v").as("v"), col("n"))
      .as[(String, String, Long, Long)].collect()
      .map(e => e._1 -> ((e._2, e._3, e._4))).toMap
    assert(fmap == batchWinners, s"stream finals $fmap != batch winners $batchWinners")
    // ...and feeding cdcMerge with all changes reproduces the state the
    // stream implies: k1 updated to 12, k2 deleted, k3 kept, k4 inserted
    val baseT = Seq(("k1", 10L), ("k2", 20L), ("k3", 30L)).toDF("k", "v")
    val merged = graft.ext.MergeOps.cdcMerge(baseT, allChanges, "k",
        Seq("o", "t"), "op", Seq("v"))
      .select(col("k"), col("v"), col("status"))
      .as[(String, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(merged == Map("k1" -> ((12L, "updated")), "k3" -> ((30L, "kept")),
      "k4" -> ((40L, "inserted"))),
      s"merge must reflect the stream's winners (k2 deleted): $merged")
  }
}
