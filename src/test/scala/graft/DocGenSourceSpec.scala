package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DataSource V2 generator: partitioned, deterministic, storage-free —
  * and immediately consumable by the dedup kernels.
  */
class DocGenSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(rows: Long, parts: Int) =
    spark.read.format("graft-docs")
      .option("rows", rows).option("partitions", parts).load()

  test("generates exactly `rows` docs across `partitions` input partitions") {
    val df = docs(10000, 8)
    assert(df.count() == 10000)
    assert(df.rdd.getNumPartitions == 8)
    assert(df.select(countDistinct(col("doc_id"))).head().getLong(0) == 10000)
  }

  test("deterministic: same ids yield identical text at any partitioning") {
    val a = docs(500, 4).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = docs(500, 13).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    assert(a(42L) == graft.sources.DocGenSource.textFor(42L))
  }

  test("scale smoke: fingerprint + MinHash sketch over 1M generated docs") {
    // 100x the oracle corpus, generated executor-side — exercises the
    // codegen kernel path at a size where any per-row interpreter
    // detour or HOF re-evaluation would take minutes.
    val d = docs(1000000L, 32)
    val sketched = d.select(col("doc_id"),
      graft.ext.TextOps.fingerprint(col("text")).as("fp"),
      graft.ext.DedupOps.minhash(
        graft.ext.DedupOps.shingleFps(graft.ext.TextOps.tokens(col("text")), 3), 16).as("mh"))
    val agg = sketched.agg(
      countDistinct(col("fp")).as("n_fp"),
      count(lit(1)).as("n")).head()
    assert(agg.getLong(1) == 1000000L)
    // generator texts are near-unique; organic fingerprint collisions stay tiny
    assert(agg.getLong(0) > 990000L, s"distinct fps: ${agg.getLong(0)}")
  }

  test("feeds the dedup kernels: exact dedup over generated corpus + planted copies") {
    val d = docs(2000, 8)
    val corpus = d.unionAll(d.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val groups = corpus
      .select(graft.ext.TextOps.fingerprint(col("text")).as("fp"), col("doc_id"))
      .groupBy(col("fp")).agg(count(lit(1)).as("n"))
    // every fingerprint appears exactly 2x (original + planted copy) —
    // modulo organic generator collisions, which must be rare
    val histo = groups.groupBy(col("n")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(histo.getOrElse(2L, 0L) >= 1900, s"histogram: $histo")
  }
}
