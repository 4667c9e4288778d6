package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.MergeOps

/** Edge semantics of the CDC MERGE that the oracle row
  * (`events_cdc_merge`, real data) cannot exercise: inserts of brand-new
  * keys, deletes of absent keys (MERGE no-op), last-writer-wins ties,
  * and the no-tearing payload contract (a legitimately-null field in
  * the winning change must NOT be back-filled from the base row).
  */
class MergeOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def base = Seq(
    (1L, Some("a1"), Some(10L)),
    (2L, Some("b1"), Some(20L)),
    (3L, Some("c1"), Some(30L))
  ).toDF("k", "s", "v")

  // (k, ord, seq, op, s, v)
  private def changes = Seq(
    (1L, 5L, 1L, "U", Some("a2"), Some(11L)), // plain update
    (1L, 4L, 2L, "U", Some("aX"), Some(99L)), // older — must lose
    (2L, 5L, 1L, "D", None: Option[String], None: Option[Long]), // delete
    (4L, 5L, 1L, "U", Some("d1"), Some(40L)), // insert (new key)
    (5L, 5L, 1L, "D", None, None), // delete of absent key — no-op
    (3L, 5L, 1L, "U", None, Some(31L)), // winning change has NULL field
    (3L, 5L, 2L, "U", Some("cX"), Some(77L)) // same ord, higher seq wins
  ).toDF("k", "ord", "seq", "op", "s", "v")

  test("cdcMerge: upsert/delete/no-op/tie semantics, no payload tearing") {
    val out = MergeOps.cdcMerge(base, changes, "k",
      Seq("ord", "seq"), "op", Seq("s", "v"))
      .collect().map(r => (r.getLong(0),
        Option(r.getAs[String]("s")), Option(r.getAs[Long]("v")),
        r.getAs[String]("status"), r.getLong(r.fieldIndex("n_changes"))))
      .toSet
    assert(out === Set(
      (1L, Some("a2"), Some(11L), "updated", 2L), // LWW: ord 5 beats 4
      // k=2 deleted, k=5 delete-of-absent no-op: both absent
      (3L, Some("cX"), Some(77L), "updated", 2L), // seq tie-break
      (4L, Some("d1"), Some(40L), "inserted", 1L)))
  }

  test("cdcMerge: winning change with a null field keeps it null (no backfill)") {
    // Only the ord-4 row for key 3: its null `s` must survive even
    // though base has s='c1' — the payload travels as one struct.
    val oneNull = changes.filter($"k" === 3L && $"seq" === 1L)
    val row = MergeOps.cdcMerge(base, oneNull, "k",
      Seq("ord", "seq"), "op", Seq("s", "v"))
      .filter($"k" === 3L).collect().head
    assert(row.getAs[String]("s") == null, "null field was backfilled from base")
    assert(row.getAs[Long]("v") == 31L)
  }

  test("latestSnapshot: deterministic argmax per key") {
    val snap = MergeOps.latestSnapshot(changes, "k",
      Seq("ord", "seq"), Seq("s", "v"))
      .collect().map(r => (r.getLong(0), Option(r.getAs[String]("s")))).toMap
    assert(snap(1L) === Some("a2") && snap(3L) === Some("cX"))
  }

  test("cdcMerge: empty changelog returns the base as kept") {
    val out = MergeOps.cdcMerge(base, changes.limit(0), "k",
      Seq("ord", "seq"), "op", Seq("s", "v"))
    assert(out.collect().map(_.getAs[String]("status")).toSeq
      === Seq.fill(3)("kept"))
  }
}
