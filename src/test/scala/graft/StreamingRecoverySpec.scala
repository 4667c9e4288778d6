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
}
