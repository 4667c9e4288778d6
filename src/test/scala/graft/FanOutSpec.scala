package graft

import graft.ext.SkewOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SkewOps.fanOut (r17): the scale-guarded repartition-after-read that
  * un-serializes expensive kernels fused into 1-2-task single-row-group
  * scans. Contract under test: (a) value-invariance — the row multiset
  * is untouched; (b) the guard — a relation already at (or near) the
  * cluster's parallelism passes through IDENTICALLY (no exchange
  * inserted), which is what makes the operator free at warehouse scale;
  * (c) a starved relation actually gains partitions.
  */
class FanOutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fanOut preserves the exact row multiset") {
    val df = (0L until 1000L).map(i => (i, s"row-$i-${i % 7}"))
      .toDF("id", "text").coalesce(1)
    val fanned = SkewOps.fanOut(df)
    assert(fanned.count() == 1000L)
    // multiset equality via symmetric anti-joins (duplicates impossible
    // here, so exceptAll both ways pins it exactly)
    assert(fanned.exceptAll(df).isEmpty && df.exceptAll(fanned).isEmpty)
  }

  test("fanOut is the identity when parallelism is already adequate") {
    val target = spark.sparkContext.defaultParallelism
    val wide = spark.range(0, 1000, 1, math.max(target, 2)).toDF("id")
    // guard: cur * 2 > target  ->  the SAME plan object comes back
    assert(SkewOps.fanOut(wide) eq wide)
  }

  test("fanOut raises a starved relation to the cluster's parallelism") {
    val target = spark.sparkContext.defaultParallelism
    assume(target >= 2) // the guard can only fire with >= 2 slots
    val starved = spark.range(0, 1000, 1, 1).toDF("id")
    val fanned = SkewOps.fanOut(starved)
    assert(fanned ne starved)
    assert(fanned.rdd.getNumPartitions == target)
    assert(fanned.agg(sum(col("id"))).head().getLong(0) == 999L * 1000L / 2L)
  }
}
