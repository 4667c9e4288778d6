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

  test("duplicate (key, ts) right rows: rightTieBreaker makes every direction deterministic") {
    // Round-11 advice: without a tie column, equal-(key, ts) right rows
    // match in partition order, which Spark does not keep stable across
    // runs. With `rightTieBreaker`, the contract is total: backward and
    // nearest keep the MAX-tie row of the matched instant (latest
    // record wins), forward the MIN-tie row. 200 keys × two duplicated
    // instants, right side deliberately scattered across partitions in
    // tie-scrambled order, run at two shuffle partitionings.
    import spark.implicits._
    val keys = (1L to 200L)
    val right = keys.flatMap { k =>
      Seq((k, 10L, k * 100 + 3), (k, 10L, k * 100 + 1), (k, 10L, k * 100 + 2),
        (k, 20L, k * 100 + 7), (k, 20L, k * 100 + 5))
    }.toDF("r_key", "r_ts", "tie")
      .repartition(7, col("tie")) // scramble physical order vs tie order
    val left = keys.flatMap(k => Seq((k, 5L), (k, 15L), (k, 25L)))
      .toDF("l_key", "l_ts")
    def run(direction: String, parts: Int): Map[(Long, Long), Long] = {
      val before = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      try graft.ext.AsOfJoin.asOfNative(left, right,
          "l_key", "r_key", "l_ts", "r_ts", direction = direction,
          rightTieBreaker = Some("tie"))
        .select(col("l_key"), col("l_ts"), coalesce(col("tie"), lit(-1L)))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      finally spark.conf.set("spark.sql.shuffle.partitions", before)
    }
    for (dir <- Seq("backward", "forward", "nearest")) {
      val a = run(dir, 5)
      val b = run(dir, 16)
      assert(a == b, s"$dir direction differs across partitionings")
      keys.foreach { k =>
        dir match {
          case "backward" =>
            assert(a((k, 5L)) == -1L)          // no prior row
            assert(a((k, 15L)) == k * 100 + 3) // max tie at ts=10
            assert(a((k, 25L)) == k * 100 + 7) // max tie at ts=20
          case "forward" =>
            assert(a((k, 5L)) == k * 100 + 1)  // min tie at ts=10
            assert(a((k, 15L)) == k * 100 + 5) // min tie at ts=20
            assert(a((k, 25L)) == -1L)         // no future row
          case "nearest" =>
            assert(a((k, 5L)) == k * 100 + 1)  // only forward exists
            // ts=15 is equidistant (gap 5 both ways): ties to backward,
            // and backward keeps the max-tie row of ts=10
            assert(a((k, 15L)) == k * 100 + 3)
            assert(a((k, 25L)) == k * 100 + 7) // only backward exists
        }
      }
    }
  }
}
