package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.MergeOps

/** Scale smoke for the CDC MERGE path: a 4M-key base snapshot absorbs
  * a 16M-row changelog (4 changes per key on average, plus one
  * pathological hot key carrying 1M updates — the bot-user shape) and
  * the merged snapshot is verified structurally. Demonstrates the
  * plan's scale claims on real volume: the changelog folds to one row
  * per key map-side (the hot key costs a combine fold, not a
  * single-partition sort), and the full-outer join shuffles |keys|
  * rows, not |changes|.
  */
class MergeScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("scale smoke: 16M-row skewed changelog merges into a 4M-key base") {
    val keys = 4000000L
    val changes = 15000000L
    val hot = 1000000L
    val base = spark.range(0L, keys, 1L, 32)
      .select(col("id").as("k"), (col("id") % 1000L).as("v"))
    // ord = position in the feed; op: every 7th change deletes.
    // Uniform changelog over [0, 2·keys) — half updates, half inserts —
    // plus 1M updates all hammering key 42.
    val uniform = spark.range(0L, changes, 1L, 32)
      .select(pmod(xxhash64(col("id")), lit(keys * 2)).as("k"),
        col("id").as("ord"),
        when(pmod(col("id"), lit(7L)) === 0L, "D").otherwise("U").as("op"),
        (col("id") % 1000000L).as("v"))
    val hotKey = spark.range(changes, changes + hot, 1L, 32)
      .select(lit(42L).as("k"), col("id").as("ord"),
        lit("U").as("op"), col("id").as("v"))
    val t0 = System.nanoTime()
    val merged = MergeOps.cdcMerge(base, uniform.unionAll(hotKey),
      "k", Seq("ord"), "op", Seq("v"))
    val agg = merged.groupBy(col("status")).agg(count(lit(1)).as("n"),
      max(col("k")).as("max_k")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val hotRow = merged.filter(col("k") === 42L).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"statuses: $agg; $secs%.1f s")
    // the hot key's 1M updates fold to its single winner: the last
    // hot-feed row (ord = changes + hot - 1), unless a uniform delete
    // with a later ord existed — it can't, hot ords are the largest.
    assert(hotRow.length == 1 &&
      hotRow.head.getAs[Long]("v") == changes + hot - 1, hotRow.mkString(","))
    assert(hotRow.head.getAs[Long]("n_changes") >= hot)
    // structural totals: every status present at volume; inserts only
    // from the upper key half (k >= keys), kept only from the base.
    assert(agg("inserted")._1 > 1000000L && agg("inserted")._2 >= keys)
    assert(agg("updated")._1 > 1000000L)
    assert(agg("kept")._1 > 100000L && agg("kept")._2 < keys)
    assert(secs < 300.0, f"merge smoke too slow: $secs%.1f s")
  }
}
