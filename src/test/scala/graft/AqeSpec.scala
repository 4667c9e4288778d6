package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Adaptive Query Execution evidence — the runtime half of the skew
  * story: [[graft.queries.Relational.qSaltedOrders]] pins the MANUAL
  * salting rewrite; these tests prove the AQE fallbacks the engine
  * relies on at 100 TB actually fire on this build — a planted hot key
  * splits into multiple skew-join reader splits, and an over-partitioned
  * shuffle coalesces — so the "AQE handles residual skew" claims in
  * SURVEY §2 are executed facts, not configuration hopes. Conf edits
  * are restored in finally (the PlanSpec runtime-filter pattern).
  */
class AqeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("AQE skew join: a planted hot key is split into multiple reader partitions") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      // left: one hot key carrying ~400k rows with a fat payload, plus
      // a uniform tail; right: small uniform dimension — the classic
      // shape where one SMJ task would sort the whole hot key alone.
      val left = spark.range(0, 400000)
        .select(lit(1L).as("k"),
          concat(lit("x"), col("id").cast("string"),
            lit("p".repeat(64))).as("payload"))
        .union(spark.range(2, 1000).select(col("id").as("k"),
          lit("tail").as("payload")))
      val right = spark.range(1, 1000).select(col("id").as("rk"),
        (col("id") * 7).as("w"))
      // NB: the consumer must NOT reuse the join's hash partitioning
      // (a groupBy on the join key would make OptimizeSkewedJoin
      // refuse — splitting the hot partition would break the required
      // distribution); an ungrouped fold leaves AQE free to split.
      // length(payload) keeps the fat column alive through pruning.
      val joined = left.join(right, col("k") === col("rk"))
        .agg(count(lit(1)).as("n"), sum(col("w")).as("sw"),
          sum(length(col("payload"))).as("sp"))
      val row = joined.collect().head
      assert(row.getLong(0) == 400000L + 998L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("isSkew"),
        s"AQE must mark the hot-key SMJ as a skew join:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE coalescing: an over-partitioned tiny shuffle collapses its reader partitions") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1MB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64MB",
      "spark.sql.shuffle.partitions" -> "200")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val agg = spark.range(0, 10000)
        .groupBy((col("id") % 500).as("g")).count()
      val n = agg.rdd.getNumPartitions
      assert(n < 20,
        s"200 shuffle partitions of a tiny aggregate must coalesce, got $n")
      assert(agg.count() == 500)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
