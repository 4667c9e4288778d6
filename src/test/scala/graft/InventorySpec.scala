package graft

import org.scalatest.funsuite.AnyFunSuite

/** The declared-inventory contract, pinned: every `SparkEntry.queries`
  * entry has a DuckDB oracle under the SAME name (the driver's compare
  * joins on the name — an orphan on either side silently weakens the
  * gate), and the total equals the ledgered count asserted below (the
  * single source of truth — SURVEY §2.2.1 and README mirror it). A
  * count drift without a matching ledger update fails the suite on
  * purpose.
  */
class InventorySpec extends AnyFunSuite {
  test("393 declared queries, each with an oracle, keysets identical") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q.size == 393, s"ledger says 393, found ${q.size}")
    assert(q == o,
      s"queries without oracle: ${(q -- o).toSeq.sorted.mkString(",")}; " +
        s"oracles without query: ${(o -- q).toSeq.sorted.mkString(",")}")
  }
}
