package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Event-stream DSv2 generator: deterministic, partitioned,
  * storage-free — and schema-compatible with the event-time suite, so
  * the sessionization/retention plans get scale evidence beyond the
  * driver testdata.
  */
class EventGenSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def events(rows: Long, parts: Int, users: Long = 1000L) =
    spark.read.format("graft-events")
      .option("rows", rows).option("partitions", parts)
      .option("users", users).load()

  test("generates exactly `rows` events, deterministic at any partitioning") {
    val a = events(10000L, 4).orderBy("event_id").collect()
    val b = events(10000L, 13).orderBy("event_id").collect()
    assert(a.length == 10000 && a.sameElements(b))
  }

  test("shape sanity: weighted type mix, bounded timestamps, value spikes") {
    val d = events(100000L, 8)
    val mix = d.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mix("view") > mix("click") && mix("click") > mix("error"),
      s"type mix must be weighted: $mix")
    val ts = d.agg(min(col("ts")), max(col("ts"))).head()
    val epoch = 1704067200L * 1000000000L
    assert(ts.getLong(0) >= epoch && ts.getLong(1) < epoch + 30L * 86400L * 1000000000L)
    assert(d.filter(col("value") > 100.0).count() > 0, "spike tail must exist")
  }

  test("scale smoke: sessionize + daily rollup over 50M generated events") {
    // The event-time suite's hottest plan shape — per-user window
    // sessionization (one shuffle+sort keyed by user) feeding a
    // map-side-combined daily aggregate — at ~7000x the oracle
    // corpus. Wall-clock scales with the one user-keyed exchange;
    // 1M users x 50 events keeps per-partition sort memory flat.
    // Budget absorbs loaded co-tenants (round-3 precedent: 3.5x).
    val t0 = System.nanoTime()
    val d = events(50000000L, 64, users = 1000000L)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sessions = d
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("new_s",
        when(col("prev").isNull || col("ts") - col("prev") > 1800L * 1000000000L, 1L)
          .otherwise(0L))
      .groupBy(col("user_id"))
      .agg(sum(col("new_s")).as("n_sessions"), count(lit(1)).as("n_events"))
    val agg = sessions.agg(
      sum(col("n_sessions")), sum(col("n_events")), count(lit(1))).head()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(agg.getLong(1) == 50000000L)
    assert(agg.getLong(2) == 1000000L, s"all users must appear: ${agg.getLong(2)}")
    assert(agg.getLong(0) >= agg.getLong(2), "at least one session per user")
    assert(secs < 300.0, f"50M-event sessionize took $secs%.1f s (budget 300 s)")
    info(f"50M events sessionized in $secs%.1f s, ${agg.getLong(0)} sessions")
  }

  test("scale smoke: AMS F2 sketch over 50M generated events in one shuffle-free pass") {
    // The q_f2_selfjoin_est arithmetic at ~7000x the oracle corpus:
    // the 24-counter fold is ONE ungrouped aggregate whose map-side
    // partials are 25 longs per task — zero keyed shuffle, vs the
    // exact F2's full user-keyed exchange (at local[32] both are
    // CPU-bound and comparable; on a cluster the sketch's shuffle
    // volume is constant while the exact pass moves the key universe).
    // Deterministic hash => the estimate/exact ratio is a constant of
    // the generator; pin it within the mean-of-8/median-of-3 design
    // envelope (factor 2).
    val d = events(50000000L, 64, users = 1000000L)
    val rows = d.select(col("user_id").as("key"))
    val zCols = (0 until 24).map { j =>
      val h = s"(((key * ${104729L + 7919L * j}) + ${7L + 13L * j}) % 1000000007)"
      sum(expr(s"1 - 2 * (shiftright($h * $h, 40) & 1)")).as(s"z$j")
    }
    val t0 = System.nanoTime()
    val sk = rows.agg(count(lit(1)).as("n"), zCols: _*).head()
    val sketchSecs = (System.nanoTime() - t0) / 1e9
    val ests = (0 until 3).map { g =>
      (8 * g until 8 * g + 8).map { j =>
        val z = sk.getLong(1 + j); z * z
      }.sum / 8L
    }
    val est = ests.sorted.apply(1)
    val t1 = System.nanoTime()
    val exact = rows.groupBy(col("key")).agg(count(lit(1)).as("c"))
      .agg(sum(expr("c * c")).as("f2")).head().getLong(0)
    val exactSecs = (System.nanoTime() - t1) / 1e9
    assert(sk.getLong(0) == 50000000L)
    assert(est > exact / 2 && est < exact * 2,
      s"AMS estimate $est outside the design envelope of exact $exact")
    assert(sketchSecs < 120.0, f"sketch pass took $sketchSecs%.1f s (budget 120 s)")
    info(f"F2 exact=$exact est=$est; sketch $sketchSecs%.1f s vs exact ${exactSecs}%.1f s")
  }
}
