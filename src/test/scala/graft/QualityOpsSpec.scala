package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ext.QualityOps._

/** QualityOps semantics over deliberately dirty data — the oracle row
  * (`q_dq_report`) runs on the clean synthetic tables, so nulls,
  * duplicates, out-of-domain values and the maxViolations threshold
  * are pinned here.
  */
class QualityOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dirty = Seq(
    (Some(1L), Some(10.0), Some("A"), Some(100L)),
    (Some(1L), Some(-5.0), Some("B"), Some(200L)), // dup id, below range
    (Some(2L), None, Some("Z"), Some(999L)), // null price, bad status, dangling fk
    (None, Some(2000.0), None, None) // null id / status / fk, above range
  ).toDF("id", "price", "status", "fk")

  private def dim = Seq(100L, 200L).toDF("k")

  test("report: every check type counts its own violations") {
    val rep = report(dirty, Seq(
      Completeness("price"),
      Unique("id"),
      InRange("price", 0.0, 1000.0),
      AcceptedValues("status", Seq("A", "B")),
      RefIntegrity("fk", "dim", dim, "k")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(rep("completeness:price") === ((1L, 4L, false)))
    assert(rep("unique:id") === ((1L, 4L, false))) // 1L appears twice
    assert(rep("range:price") === ((2L, 4L, false))) // -5 and 2000; null skipped
    assert(rep("accepted:status") === ((1L, 4L, false))) // Z; null skipped
    assert(rep("ref:fk->dim.k") === ((1L, 4L, false))) // 999; null fk skipped
  }

  test("report: maxViolations threshold flips pass, clean checks pass at 0") {
    val rep = report(dirty, Seq(Completeness("id"), InRange("price", -10.0, 5000.0)),
      maxViolations = 1L)
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(rep("completeness:id"), "1 null id <= maxViolations=1")
    assert(rep("range:price"), "all in range")
  }
}
