package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.DedupOps
import graft.queries.Tables

/** Scratch profiler for the dedup_clusters pipeline (not part of the
  * declared surface; safe to delete). */
object ProfileClusters {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    // warm
    graft.queries.DedupQueries.dedupClusters(spark, sfDir).write.format("noop").mode("overwrite").save()
    val d = Tables.load(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    val mut = d.select((col("doc_id") + 1000000L).as("doc_id"),
      expr("substring(text, instr(text, ' ') + 1)").as("text"))
    val pairs = DedupOps.nearDupPairs(d.unionAll(mut), "doc_id", "text",
      k = 3, hashes = 64, bands = 16, threshold = 0.7)
    t("pairs.count")(pairs.count())
    val clusters = t("dupClusters build+loop")(DedupOps.dupClusters(pairs))
    t("clusters write")(clusters.write.format("noop").mode("overwrite").save())
    t("full query again") {
      graft.queries.DedupQueries.dedupClusters(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
