package graft

import graft.functions.HashKernels
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite

/** The banded DTW kernel against a naive full-DP oracle — the
  * [[graft.functions.HashKernels.dtwBand]] contract beyond the SQL
  * gate (which proves one band on real data): band ≥ n−1 equals the
  * unbanded DP on random series, widening the band never increases
  * the distance, identity is zero, and the squared-Euclidean upper
  * bound holds (the diagonal is always a valid warping path).
  */
class DtwSpec extends AnyFunSuite {

  private def naive(a: Array[Long], b: Array[Long]): Long = {
    val n = a.length
    val INF = Long.MaxValue / 4
    val dp = Array.fill(n, n)(INF)
    for (i <- 0 until n; j <- 0 until n) {
      val c = (a(i) - b(j)) * (a(i) - b(j))
      val best =
        if (i == 0 && j == 0) 0L
        else Seq(
          if (i > 0) dp(i - 1)(j) else INF,
          if (j > 0) dp(i)(j - 1) else INF,
          if (i > 0 && j > 0) dp(i - 1)(j - 1) else INF).min
      dp(i)(j) = c + best
    }
    dp(n - 1)(n - 1)
  }

  private def kernel(a: Array[Long], b: Array[Long], band: Int): Long =
    HashKernels.dtwBand(new GenericArrayData(a), new GenericArrayData(b), band)

  test("band >= n-1 equals the naive full DP on random integer series") {
    val rng = new scala.util.Random(11)
    for (_ <- 1 to 60) {
      val n = 1 + rng.nextInt(20)
      val a = Array.fill(n)(rng.nextInt(200).toLong - 100)
      val b = Array.fill(n)(rng.nextInt(200).toLong - 100)
      assert(kernel(a, b, n) == naive(a, b),
        s"full-band kernel must equal naive DP: ${a.toSeq} vs ${b.toSeq}")
    }
  }

  test("widening the band never increases the distance; identity is zero; euclid bounds it") {
    val rng = new scala.util.Random(23)
    for (_ <- 1 to 40) {
      val n = 2 + rng.nextInt(15)
      val a = Array.fill(n)(rng.nextInt(100).toLong)
      val b = Array.fill(n)(rng.nextInt(100).toLong)
      val byBand = (0 to n).map(w => kernel(a, b, w))
      byBand.zip(byBand.tail).foreach { case (narrow, wide) =>
        assert(wide <= narrow, s"wider band found a worse path: $byBand")
      }
      assert(kernel(a, a, 2) == 0L, "identity series must warp at cost 0")
      val euclid = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      assert(byBand.head == euclid, "band 0 IS the diagonal = squared Euclidean")
      byBand.foreach(d => assert(d <= euclid, "DTW can never exceed the diagonal path"))
    }
  }

  test("events_dtw on sf0.001: in-band pairs present, bound flag holds on every row") {
    val got = SparkEntry.queries("events_dtw")(TestSpark.spark, "/root/testdata/sf0.001")
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Boolean]("dtw_le"),
        s"DTW must not exceed squared Euclidean: $r")
      assert(r.getAs[Long]("dtw") >= 0L)
    }
  }
}
