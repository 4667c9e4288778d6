package graft

import org.scalatest.funsuite.AnyFunSuite

/** Sketch-based variants that are approximate by construction and so
  * live outside the DuckDB hash gate: their contract is a bounded
  * error against the exact oracle-gated query.
  */
class EventQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("events_daily_active approx (HLL sketch): relative error <= 5% vs exact, per day") {
    val exact = graft.queries.EventQueries.eventsDailyActive(spark, sf)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    // rsd is a STANDARD deviation — at rsd=0.05 a tail day can exceed
    // 5% (measured 5.19% on one of 30 days); rsd=0.02 keeps every day
    // within the asserted 5% bound (deterministic: HLL++ hashing is
    // fixed for a fixed dataset).
    val approx = graft.queries.EventQueries.eventsDailyActiveApprox(spark, sf, rsd = 0.02)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet, "same day grouping")
    exact.foreach { case (day, n) =>
      val a = approx(day)
      val relErr = math.abs(a - n).toDouble / n
      assert(relErr <= 0.05, s"$day: approx $a vs exact $n (relErr $relErr)")
    }
  }

  test("AsOfJoin semantics: latest-prior wins, equal-time matches, no-match is null") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // key 1: views at t=10,20 before click@25 → latest (20) wins;
    //        a view at exactly the click time (t=25, id 103) is VISIBLE
    //        (≤ semantics) and is the latest → it wins over 102;
    // key 2: only a LATER view (t=50 > click@40) → no match, nulls;
    // key 3: click with no views at all → nulls.
    val clicks = Seq((1L, 25L, 11L), (2L, 40L, 21L), (3L, 5L, 31L))
      .toDF("k", "t", "click_id")
    val views = Seq((1L, 10L, 101L), (1L, 20L, 102L), (1L, 25L, 103L),
      (2L, 50L, 201L)).toDF("k", "vt", "view_id")
    val out = graft.ext.AsOfJoin.asOfJoin(clicks, views, Seq("k"),
        leftTime = "t", rightTime = "vt", leftSeq = "click_id", rightSeq = "view_id")
      .select(col("click_id"), col("view_id"), col("vt"))
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(out == Set(
      (11L, Some(103L), Some(25L)),
      (21L, None, None),
      (31L, None, None)), out.toString)
  }

  test("AsOfJoin atomicity: a NULL field in the matched row is not back-filled from older rows") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // latest view (t=20) has x = NULL; the click at t=25 must see THAT
    // row's x as null — per-column carry-forward would tear the row and
    // resurrect the stale x=5 from t=10.
    val clicks = Seq((1L, 25L, 11L)).toDF("k", "t", "click_id")
    val views = Seq((1L, 10L, 101L, Some(5L)), (1L, 20L, 102L, None: Option[Long]))
      .toDF("k", "vt", "view_id", "x")
    val r = graft.ext.AsOfJoin.asOfJoin(clicks, views, Seq("k"),
        leftTime = "t", rightTime = "vt", leftSeq = "click_id", rightSeq = "view_id")
      .select(col("vt"), col("view_id"), col("x")).head()
    assert(r.getLong(0) == 20L && r.getLong(1) == 102L,
      s"must match the t=20 view, got $r")
    assert(r.isNullAt(2), s"matched row's NULL x must stay null, got $r")
  }

  test("AsOfJoin null semantics: NULL keys never match, NULL right times are never prior") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // JOIN semantics (and merge_asof): a NULL key matches nothing — a
    // null-key click must NOT be attributed to a null-key view; a view
    // with a NULL time is never "most recent prior"; a null-TIME click
    // matches nothing.
    val clicks = Seq((Some(1L), Some(25L), 11L), (None: Option[Long], Some(25L), 12L),
      (Some(1L), None: Option[Long], 13L)).toDF("k", "t", "click_id")
    val views = Seq((Some(1L), Some(10L), 101L), (None: Option[Long], Some(5L), 102L),
      (Some(1L), None: Option[Long], 103L)).toDF("k", "vt", "view_id")
    val out = graft.ext.AsOfJoin.asOfJoin(clicks, views, Seq("k"),
        leftTime = "t", rightTime = "vt", leftSeq = "click_id", rightSeq = "view_id")
      .select(col("click_id"), col("view_id"))
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    assert(out == Set(
      (11L, Some(101L)), // normal match (null-time view 103 ignored)
      (12L, None),       // null key: no attribution
      (13L, None)),      // null left time: nothing is prior
      out.toString)
  }

  test("AsOfJoin tolerance: stale matches are nulled, fresh ones kept") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // key 1: view at t=20 before click@25, staleness 5 ≤ tol=10 → kept;
    // key 2: view at t=10 before click@40, staleness 30 > tol=10 → nulled.
    val clicks = Seq((1L, 25L, 11L), (2L, 40L, 21L)).toDF("k", "t", "click_id")
    val views = Seq((1L, 20L, 101L), (2L, 10L, 201L)).toDF("k", "vt", "view_id")
    val out = graft.ext.AsOfJoin.asOfJoin(clicks, views, Seq("k"),
        leftTime = "t", rightTime = "vt", leftSeq = "click_id", rightSeq = "view_id",
        tolerance = Some(10L))
      .select(col("click_id"), col("view_id"))
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    assert(out == Set((11L, Some(101L)), (21L, None)), out.toString)
  }

  test("scale smoke: as-of join over 10M synthetic rows — every click matches its engineered view") {
    // 250k users × 20 views (t = k·100) and 20 clicks (t = k·100 + 50):
    // each click's unique correct match is its user's view 50 units
    // earlier, so correctness is verifiable with a collect-free
    // aggregate at 2000× the oracle row count. One union + one
    // per-user window shuffle — the operator's whole scale story.
    // Budget 240 s absorbs a loaded co-tenant (round-3 postmortem).
    import org.apache.spark.sql.functions._
    val t0 = System.nanoTime()
    val n = 5000000L
    val views = spark.range(n).select(
      expr("id div 20").as("user_id"),
      ((col("id") % 20) * 100L).as("view_tus"),
      col("id").as("view_id"))
    val clicks = spark.range(n).select(
      expr("id div 20").as("user_id"),
      ((col("id") % 20) * 100L + 50L).as("tus"),
      col("id").as("click_id"))
    val out = graft.ext.AsOfJoin.asOfJoin(clicks, views, Seq("user_id"),
      leftTime = "tus", rightTime = "view_tus",
      leftSeq = "click_id", rightSeq = "view_id")
    val r = out.agg(count(lit(1)).as("n"),
      count(when(col("view_tus") === col("tus") - 50L &&
        col("view_id") === col("click_id"), 1)).as("ok")).head()
    assert(r.getLong(0) == n, s"row count ${r.getLong(0)} != $n")
    assert(r.getLong(1) == n, s"correct matches ${r.getLong(1)} != $n")
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 240.0, f"10M-row as-of smoke took $secs%.1f s (budget 240 s)")
    info(f"10M rows as-of joined in $secs%.1f s")
  }

  test("approx percentile (GK sketch): rank error bounded by n/accuracy, per event type") {
    import org.apache.spark.sql.functions.col
    val acc = 100
    val got = graft.queries.EventQueries.eventsValueQuantilesApprox(spark, sf, accuracy = acc)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val vals = graft.queries.Tables.load(spark, sf, "events")
      .select(col("event_type"), col("value")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).groupBy(_._1)
      .map { case (t, xs) => t -> xs.map(_._2).sorted }
    assert(got.keySet == vals.keySet)
    for ((t, sorted) <- vals; (p, v) <- Seq(0.5, 0.95, 0.99).zip(
        Seq(got(t)._2, got(t)._3, got(t)._4))) {
      val n = sorted.length
      // returned value must be an actual element whose rank is within
      // the GK bound (n/accuracy) + 1 of the target rank ceil(p*n)
      val idx = sorted.indexWhere(_ >= v)
      assert(idx >= 0 && sorted.contains(v), s"$t p$p: $v not in data")
      val target = math.ceil(p * n)
      val lo = sorted.indexOf(v) + 1      // 1-based min rank of v
      val hi = sorted.lastIndexOf(v) + 1  // 1-based max rank of v
      val bound = n.toDouble / acc + 1
      assert(lo - bound <= target && target <= hi + bound,
        s"$t p$p: value $v ranks [$lo,$hi], target $target, bound $bound (n=$n)")
    }
  }

  test("events_survival: KM invariants — S monotone non-increasing, risk set telescopes") {
    val rows = graft.queries.EventQueries.eventsSurvival(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    graft.core.QueryCaches.release()
    assert(rows.nonEmpty)
    assert(rows.head._4 <= 1000000L)
    rows.sliding(2).foreach { case Array((t1, n1, _, s1), (t2, n2, _, s2)) =>
      assert(t1 < t2 && s2 <= s1, s"S must not rise: t=$t2 s=$s2 after t=$t1 s=$s1")
      assert(n2 < n1, s"risk set must shrink strictly between represented hours")
    }
    // every event contributes exactly ONE observation (a closed gap to
    // its successor, or its user's censored tail) and all gaps are >= 0,
    // so the t=0 risk set is the full event count
    val (t0, n0, _, _) = rows.head
    val nEvents = graft.queries.Tables.loadEvents(spark, sf).count()
    assert(t0 == 0L && n0 == nEvents, s"n_risk(0)=$n0 vs events=$nEvents")
  }

  test("approx sketch merges map-side: plan has partial + final HashAggregate, no id shuffle") {
    val p = graft.queries.EventQueries.eventsDailyActiveApprox(spark, sf)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    // two-phase hash aggregation: the exchange carries merged sketches,
    // not distinct user ids (exact COUNT(DISTINCT) plans a second
    // expand/exchange keyed by (day, user_id))
    assert("\\(\\d+\\) HashAggregate".r.findAllIn(p).length >= 2, p)
    assert(!p.contains("Expand"), s"sketch path must not expand per-id:\n$p")
  }

  test("events_rfm scale swap: globalNtile banding == rank-selected boundaries on tie-free values") {
    // The eventsRfm scaladoc promises the warehouse-scale swap: replace
    // the per-metric rank window boundary step with
    // SkewOps.globalNtile's approxQuantile banding, same
    // comparison-banding downstream. This EXECUTES that promise: on a
    // tie-free metric both paths must assign every value the same
    // 5-band. (With ties, rank-ntile splits a tied group across bands
    // while both banders here are value-determined — that is why the
    // declared query's comparison-banding is the semantics worth
    // preserving, and both paths share it.)
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // deterministic tie-free permutation: ×7919 is a unit mod the
    // prime 100003, so the 1000 values are distinct and scrambled
    val vals = (1 to 1000).map(i => (i.toLong * 7919L) % 100003L).toDF("v")
    val n = 1000L
    // path 1: the declared query's boundary idiom — 4 exact rank
    // positions, then band by comparison
    val w = Window.orderBy(col("v"))
    val ranks = (1 to 4).map(q => 1L + ((n - 1) * q) / 5)
    val bs = vals.withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk").isin(ranks: _*))
      .collect().map(_.getLong(0)).sorted
    assert(bs.length == 4)
    val rankBanded = vals.select(col("v"),
      (lit(1L) + bs.map(b => when(col("v") > b, 1L).otherwise(0L))
        .reduce(_ + _)).as("band"))
    // path 2: the scale swap — no window anywhere
    val ntileBanded = graft.ext.SkewOps.globalNtile(vals, "v", 5)
    val joined = rankBanded.join(ntileBanded, "v")
      .select(col("v"), col("band"), col("tile"))
    val mismatches = joined.filter(col("band") =!= col("tile")).count()
    assert(mismatches == 0L,
      s"$mismatches of $n values band differently under the swap")
    // and each band holds exactly n/5 values in both paths
    val sizes = ntileBanded.groupBy(col("tile")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes == (1L to 5L).map(_ -> 200L).toMap, s"uneven tiles: $sizes")
  }
}
