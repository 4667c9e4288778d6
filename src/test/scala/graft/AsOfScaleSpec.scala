package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale smokes for the custom as-of operator stack (AsOfJoinPlan →
  * AsOfJoinStrategy → AsOfJoinExec) over the zero-storage generator —
  * the new physical operator gets the same treatment MergeOps /
  * streaming state machines got: correctness at 1M rows proved against
  * the independent union+window composition, then a larger native-only
  * run pinning that the merge completes in bounded time with the
  * skewed generator mix (views dominate; clicks ≈ 30%, purchases ≈
  * 10% — so the probe:reference ratio is realistic, not balanced). */
class AsOfScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def gen(rows: Long) = spark.read.format("graft-events")
    .option("rows", rows).option("partitions", 32)
    .option("users", 50000).option("days", 30).load()
    .select(col("user_id"), col("event_id"), col("event_type"),
      expr("ts div 1000").as("tus"))

  test("1M generated events: AsOfJoinExec matches the union+window composition exactly") {
    val e = gen(1000000L).persist()
    try {
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_event"), col("tus").as("p_tus"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("tus").as("c_tus"))
      val native = graft.ext.AsOfJoin.asOfNative(purchases, clicks,
          "user_id", "c_user", "p_tus", "c_tus")
        .select(col("user_id"), col("p_event"), coalesce(col("c_tus"), lit(-1L)))
      val composed = graft.ext.AsOfJoin.asOfJoin(
          purchases, clicks.select(col("c_user").as("user_id"), col("c_tus")),
          Seq("user_id"), "p_tus", "c_tus", "p_event", "c_tus")
        .select(col("user_id"), col("p_event"), coalesce(col("c_tus"), lit(-1L)))
      // distributed set-equality: union-minus in both directions is empty
      assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty,
        "native and composed as-of disagree at 1M rows")
      val n = native.count()
      assert(n > 50000L, s"smoke must exercise a real probe volume, got $n")
    } finally {
      e.unpersist()
      graft.core.QueryCaches.release()
    }
  }

  test("1M generated events: forward direction == backward on the time-reversed axis") {
    // Duality property: the earliest rt ≥ lt on axis t is exactly the
    // latest (−rt) ≤ (−lt) on axis −t — so forward must agree with
    // backward run on negated timestamps, at scale, including misses.
    // An independent check of the direction logic that reuses the
    // already-proven backward merge as its own oracle.
    val e = gen(1000000L).persist()
    try {
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_event"), col("tus").as("p_tus"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("tus").as("c_tus"))
      val fwd = graft.ext.AsOfJoin.asOfNative(purchases, clicks,
          "user_id", "c_user", "p_tus", "c_tus", direction = "forward")
        .select(col("user_id"), col("p_event"), coalesce(col("c_tus"), lit(-1L)))
      val rev = graft.ext.AsOfJoin.asOfNative(
          purchases.withColumn("np_tus", -col("p_tus")),
          clicks.withColumn("nc_tus", -col("c_tus")),
          "user_id", "c_user", "np_tus", "nc_tus")
        .select(col("user_id"), col("p_event"), coalesce(col("c_tus"), lit(-1L)))
      assert(fwd.exceptAll(rev).isEmpty && rev.exceptAll(fwd).isEmpty,
        "forward and time-reversed backward disagree at 1M rows")
      assert(fwd.count() > 50000L)
    } finally {
      e.unpersist()
      graft.core.QueryCaches.release()
    }
  }

  test("8M generated events: native as-of completes with full match accounting") {
    val t0 = System.nanoTime()
    val e = gen(8000000L)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_event"), col("tus").as("p_tus"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("tus").as("c_tus"))
    val r = graft.ext.AsOfJoin.asOfNative(purchases, clicks,
        "user_id", "c_user", "p_tus", "c_tus")
      .agg(count(lit(1)).as("n"),
        sum(when(col("c_tus").isNotNull, 1L).otherwise(0L)).as("matched"))
      .head()
    graft.core.QueryCaches.release()
    val secs = (System.nanoTime() - t0) / 1e9
    // ~10% purchases of 8M ≈ 800k probes; with 50k users over 30 days
    // nearly every purchase has a prior click
    assert(r.getLong(0) > 500000L, s"probe count ${r.getLong(0)}")
    assert(r.getLong(1) > r.getLong(0) * 9 / 10, s"match rate ${r.getLong(1)}/${r.getLong(0)}")
    info(f"8M-event native as-of: ${r.getLong(0)} probes, ${r.getLong(1)} matched, $secs%.1f s")
    assert(secs < 300, f"merge must complete in bounded time, took $secs%.1f s")
  }
}
