package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale smoke for the z-order layout path (q_zorder's production
  * spelling): 20M rows laid out with `repartitionByRange(z)` — the
  * distributed range-partitioned sort a real table writer runs, NO
  * single-partition window anywhere — then per-file min-max footer
  * stats, then the same 2-D box pruning the declared query measures.
  * Demonstrates (not just argues) that the multi-dim skipping win
  * survives the writer's sampled range boundaries and 100× the bench
  * row count.
  */
class ZorderScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("scale smoke: z-order repartitionByRange layout prunes a 2-D box at 20M rows") {
    val n = 20000000L
    val files = 256
    // two independent uniform 16-bit dims, derived deterministically
    val base = spark.range(0L, n, 1L, 32)
      .select(pmod(xxhash64(col("id")), lit(65536L)).as("x"),
        pmod(xxhash64(col("id") + n), lit(65536L)).as("y"))
    val (bLo, bHi) = (16384L, 32767L) // the [0.25, 0.5)² box of q_zorder
    def scanCost(laidOut: org.apache.spark.sql.DataFrame): (Long, Long) = {
      // the writer's footer stats via the library op
      val stats = graft.ext.LayoutOps.fileStats(laidOut, Seq("x", "y")).collect()
      val hit = stats.filter(r => r.getAs[Long]("x_min") <= bHi &&
        r.getAs[Long]("x_max") >= bLo &&
        r.getAs[Long]("y_min") <= bHi && r.getAs[Long]("y_max") >= bLo)
      (hit.length.toLong, hit.map(_.getAs[Long]("n_rows")).sum)
    }
    val t0 = System.nanoTime()
    val (zFiles, zRows) = scanCost(
      graft.ext.LayoutOps.zorderRepartition(base, "x", "y", files))
    val (lFiles, lRows) = scanCost(
      base.repartitionByRange(files, col("x")))
    // layout-invariant by construction; pins the box matches ~1/16 of rows
    val nMatch = base.agg(sum(when(col("x").between(bLo, bHi) &&
      col("y").between(bLo, bHi), 1L).otherwise(0L))).head().getLong(0)
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"20M rows, $files files: z-order reads $zFiles files / $zRows rows; " +
      f"linear reads $lFiles files / $lRows rows; matched $nMatch; $secs%.1f s")
    assert(nMatch > 1000000L, "box should match ~1/16 of 20M rows")
    assert(zRows >= nMatch && lRows >= nMatch,
      "min-max pruning must keep every matching row")
    // the win the layout exists for: strictly fewer rows behind the
    // min-max index, with honest headroom (≥ 1.5×, measured ~2-3×)
    assert(zRows * 3 < lRows * 2,
      s"z-order should scan ≥1.5× fewer rows: z=$zRows lin=$lRows")
  }

  test("binPack plans compaction over REAL written-file stats: contiguous bins near target") {
    // 64 small "files" (footer stats of a 64-partition write) packed
    // to ~4x-file-sized bins: the planner must cover
    // every file exactly once, keep bins contiguous in file order, and
    // land every closed bin within one max-file of the target.
    val stats = graft.ext.LayoutOps.fileStats(
      spark.range(0L, 1000000L, 1L, 64).select(col("id")), Seq("id"))
    val target = 60000L
    val planned = graft.ext.LayoutOps.binPack(stats, "n_rows", col("id_min"), target)
      .select(col("bin"), col("file"), col("n_rows"), col("id_min")).collect()
    assert(planned.map(_.getAs[Long]("file")).distinct.length == 64, "every file planned once")
    // contiguity: sorted by the packing order, bin ids are non-decreasing
    val inOrder = planned.sortBy(_.getAs[Long]("id_min")).map(_.getAs[Long]("bin"))
    assert(inOrder.zip(inOrder.tail).forall { case (a, b) => a <= b },
      s"bins must be contiguous intervals in pack order: ${inOrder.mkString(",")}")
    val maxFile = planned.map(_.getAs[Long]("n_rows")).max
    val byBin = planned.groupBy(_.getAs[Long]("bin"))
      .view.mapValues(_.map(_.getAs[Long]("n_rows")).sum).toMap
    val lastBin = byBin.keys.max
    byBin.foreach { case (bin, total) =>
      if (bin != lastBin)
        assert(total >= target - maxFile + 1 && total <= target + maxFile - 1,
          s"closed bin $bin total $total must be within one file of target $target")
    }
    assert(byBin.values.sum == 1000000L, "no rows lost or duplicated")
  }
}
