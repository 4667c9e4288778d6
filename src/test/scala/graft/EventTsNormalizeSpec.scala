package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Tables
import graft.streaming.GraftStream

/** Locks the round-9 schema-drift fix: the events `ts` column has been
  * shipped by the testdata generator as BOTH bigint-nanos and
  * timestamp[us], and [[Tables.normalizeEventTs]] must canonicalize
  * every known spelling to the same nanos-since-epoch BIGINT — so the
  * next generator flip fails HERE, not in the driver's bench.
  * (Reference parity analog: pypeln's from_iterable bridges any source
  * shape to one internal element stream, task/api/from_iterable.py:14-80.)
  */
class EventTsNormalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Known instants (micros since epoch) spanning a day boundary, plus
    * an event_type payload so a daily-rollup query shape is testable. */
  private val micros = Seq(
    1700000000000000L, 1700000000123456L, 1700086400000000L,
    1700172800654321L, 1700172800654322L)
  private val rows = micros.zipWithIndex.map { case (us, i) => (us, s"et${i % 2}") }

  /** Write the same logical instants under one physical spelling and
    * read them back — the writer is plain Spark so the parquet is
    * exactly what a producer of that era would emit. */
  private def writeSpelling(kind: String): String = {
    val dir = Files.createTempDirectory(s"graft_ts_$kind").toString + "/events.parquet"
    val base = rows.toDF("us", "event_type")
    val df = kind match {
      case "bigint_nanos" => base.select(($"us" * 1000L).as("ts"), $"event_type")
      case "timestamp_ntz" => base.select(
        timestamp_micros($"us").cast(TimestampNTZType).as("ts"), $"event_type")
      case "timestamp_ltz" => base.select(
        timestamp_micros($"us").as("ts"), $"event_type")
    }
    df.coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  private def canon(df: DataFrame): Seq[(Long, String)] =
    Tables.normalizeEventTs(df).select($"ts", $"event_type")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(identity).toSeq

  test("normalizeEventTs: bigint-nanos, timestamp[us]-NTZ and LTZ spellings all canonicalize identically") {
    val expected = rows.map { case (us, et) => (us * 1000L, et) }.sortBy(identity)
    for (kind <- Seq("bigint_nanos", "timestamp_ntz", "timestamp_ltz")) {
      val df = spark.read.parquet(writeSpelling(kind))
      val out = Tables.normalizeEventTs(df)
      assert(out.schema("ts").dataType == LongType, s"$kind must canonicalize to BIGINT")
      assert(canon(df) == expected, s"$kind values drifted")
    }
  }

  test("normalizeEventTs: a daily-active-shaped rollup is identical across spellings") {
    // The query shape that broke in round 8: integer `ts div` day
    // arithmetic. Both spellings must produce the same rollup rows.
    def daily(dir: String): Seq[(Long, Long)] =
      Tables.normalizeEventTs(spark.read.parquet(dir))
        .groupBy(expr("ts div 86400000000000").as("day"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(daily(writeSpelling("bigint_nanos")) == daily(writeSpelling("timestamp_ntz")))
  }

  test("normalizeEventTs: an unknown physical type fails loudly, not as wrong nanos") {
    // A DOUBLE ts would previously be cast-as-seconds silently; schema
    // drift outside the known spellings must throw at load time.
    val df = Seq((1.5d, "et0")).toDF("ts", "event_type")
    val e = intercept[IllegalStateException](Tables.normalizeEventTs(df))
    assert(e.getMessage.contains("unsupported physical type"))
  }

  test("normalizeEventTs: refuses a non-UTC session for timestamp inputs") {
    val df = Seq((java.time.LocalDateTime.of(2023, 11, 14, 22, 13, 20), "et0"))
      .toDF("ts", "event_type")
    val tzKey = "spark.sql.session.timeZone"
    spark.conf.set(tzKey, "America/New_York")
    try {
      val e = intercept[IllegalArgumentException](Tables.normalizeEventTs(df))
      assert(e.getMessage.contains("timeZone"))
    } finally spark.conf.set(tzKey, "UTC")
  }

  test("GraftStream.events: a TIMESTAMP_NTZ file streams with canonical bigint ts") {
    // The production streaming entry point must absorb the physical
    // type exactly like the batch loader — no call-site wrapper.
    val st = GraftStream.events(spark, writeSpelling("timestamp_ntz"))
    assert(st.toDF.schema("ts").dataType == LongType)
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q = st.toDF.writeStream.outputMode("append")
      .foreachBatch((b: org.apache.spark.sql.Dataset[Row], _: Long) =>
        { b.collect().foreach(r => got += ((r.getLong(0), r.getString(1)))); () })
      .start()
    q.processAllAvailable(); q.stop()
    assert(got.sortBy(identity).toSeq ==
      rows.map { case (us, et) => (us * 1000L, et) }.sortBy(identity))
  }
}
