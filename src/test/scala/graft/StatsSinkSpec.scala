package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.StatsSink

/** The DSv2 WRITE path: stats land via commit messages, independent of
  * task/partition layout, cross-checked against the Catalyst kernel. */
class StatsSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def customer = spark.read.parquet(s"$dir/customer.parquet")

  // The sink's checksum contract, spelled query-side with the codegen'd
  // kernel: long/string fields, field order, concat_ws null-skipping.
  private def kernelChecksum(df: org.apache.spark.sql.DataFrame): (Long, java.math.BigDecimal) = {
    val hashed = df.schema.fields.filter(f =>
      f.dataType == org.apache.spark.sql.types.LongType ||
        f.dataType == org.apache.spark.sql.types.StringType).map(f => col(f.name))
    val r = df.select(
      count(lit(1)).as("n"),
      sum(graft.ext.TextOps.fingerprint(concat_ws("|", hashed: _*))
        .cast(DecimalType(38, 0))).as("cs")).head()
    (r.getLong(0), r.getDecimal(1))
  }

  test("batch write: rows, checksum and zone maps equal the query-side kernel answers") {
    StatsSink.stats.remove("t_batch")
    customer.write.mode("append").format("graft-stats").option("name", "t_batch").save()
    val got = StatsSink.stats("t_batch")
    val (n, cs) = kernelChecksum(customer)
    assert(got.rows == n)
    assert(got.checksum.toString == cs.toBigInteger.toString)
    val mm = customer.agg(
      min(col("c_custkey")), max(col("c_custkey")),
      min(col("c_acctbal")), max(col("c_acctbal")),
      min(col("c_mktsegment")), max(col("c_mktsegment"))).head()
    val z = got.zones.map(z => z.name -> z).toMap
    assert(z("c_custkey").lo == mm.getLong(0) && z("c_custkey").hi == mm.getLong(1))
    assert(z("c_acctbal").lo == mm.getDouble(2) && z("c_acctbal").hi == mm.getDouble(3))
    assert(z("c_mktsegment").lo == mm.getString(4) && z("c_mktsegment").hi == mm.getString(5))
    assert(got.zones.forall(_.nulls == 0L))
  }

  test("string zone map orders by UTF-8 bytes (Spark's order), not UTF-16 code units") {
    // r10 advice: U+FF61 sorts BELOW U+10000 in UTF-8 byte order (Spark
    // min/max) but ABOVE it in Java String '<' (its UTF-16 surrogate
    // 0xD800 < 0xFF61). The sink's lo/hi must agree with the engine.
    import spark.implicits._
    StatsSink.stats.remove("t_utf8")
    val df = Seq("｡", "𐀀", "m").toDF("s")
    df.write.mode("append").format("graft-stats").option("name", "t_utf8").save()
    val z = StatsSink.stats("t_utf8").zones.find(_.name == "s").get
    val mm = df.agg(min(col("s")), max(col("s"))).head()
    assert(z.lo == mm.getString(0) && z.hi == mm.getString(1),
      s"zone (${z.lo}, ${z.hi}) vs engine (${mm.getString(0)}, ${mm.getString(1)})")
    assert(z.hi == "𐀀", "U+10000 is the UTF-8 max of the three")
  }

  test("commit merge is layout-independent: 7-partition and 3-partition writes agree") {
    StatsSink.stats.remove("t_a"); StatsSink.stats.remove("t_b")
    customer.repartition(7).write.mode("append").format("graft-stats").option("name", "t_a").save()
    customer.repartition(3).write.mode("append").format("graft-stats").option("name", "t_b").save()
    assert(StatsSink.stats("t_a") == StatsSink.stats("t_b"))
  }

  test("streaming write: epochs accumulate to the batch totals") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    StatsSink.stats.remove("t_stream")
    val rows = customer.select(col("c_custkey"), col("c_name"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("c_custkey", "c_name")
      .writeStream.format("graft-stats").option("name", "t_stream")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-stats-ckpt").toString)
      .start()
    val (a, b) = rows.splitAt(rows.length / 2)
    in.addData(a.toIndexedSeq: _*); q.processAllAvailable()
    in.addData(b.toIndexedSeq: _*); q.processAllAvailable()
    q.stop()
    val got = StatsSink.stats("t_stream")
    val (n, cs) = kernelChecksum(customer.select(col("c_custkey"), col("c_name")))
    assert(got.rows == n)
    assert(got.checksum.toString == cs.toBigInteger.toString)
    val z = got.zones.map(z => z.name -> z).toMap
    val mm = customer.agg(min(col("c_custkey")), max(col("c_custkey"))).head()
    assert(z("c_custkey").lo == mm.getLong(0) && z("c_custkey").hi == mm.getLong(1))
  }
}
