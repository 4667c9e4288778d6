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

  test("approx sketch merges map-side: plan has partial + final HashAggregate, no id shuffle") {
    val p = graft.queries.EventQueries.eventsDailyActiveApprox(spark, sf)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    // two-phase hash aggregation: the exchange carries merged sketches,
    // not distinct user ids (exact COUNT(DISTINCT) plans a second
    // expand/exchange keyed by (day, user_id))
    assert("\\(\\d+\\) HashAggregate".r.findAllIn(p).length >= 2, p)
    assert(!p.contains("Expand"), s"sketch path must not expand per-id:\n$p")
  }
}
