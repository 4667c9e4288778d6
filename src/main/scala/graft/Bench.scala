package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR.
  * One untimed warmup pass first (JVM/codegen/broadcast warmup — without
  * it the first query pays ~5s of JIT and poisons its number), then TWO
  * timed passes reporting the per-query MINIMUM: a single co-tenant
  * load spike can inflate one pass 10x (round-3 postmortem: the same
  * tree measured 94.9s on a loaded machine and 28.0s clean), and min-of
  * -two makes one noisy pass unable to poison the number. Emits ONE
  * JSON line on stdout AND writes it to bench_result.json so the
  * driver's parse doesn't depend on scraping sbt-prefixed logs.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = SparkEntry.queries.keys.toSeq.sorted
    // Materialize EVERY column through the noop sink: a count() would
    // let Catalyst prune the very projections being measured (e.g. a
    // fingerprint query degenerates to counting rows).
    // A failed query must be VISIBLE, not a suspiciously fast number:
    // failures are collected and emitted in the JSON's "errors" map
    // (extra key — the driver's parse reads "value"/"queries").
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def exec(name: String): Unit =
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      finally {
        graft.ext.DedupOps.releaseCaches()
        spark.conf.set("spark.graft.lsh.rewrite", "false")
      }
    def timed(name: String): (Double, Boolean) = {
      val t0 = System.nanoTime()
      var ok = true
      try exec(name) catch {
        case e: Throwable =>
          ok = false
          errors.getOrElseUpdate(name, String.valueOf(e.getMessage).replaceAll("[\"\\\\\\n\\r\\t]", " ").take(200))
      }
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    // Warmup: full pass, results discarded.
    names.foreach { n => try exec(n) catch { case _: Throwable => () } }
    val pass1 = names.map(n => n -> timed(n)).toMap
    val pass2 = names.map(n => n -> timed(n)).toMap
    // min over SUCCESSFUL passes only: a fast failure (e.g. 0.1s throw in
    // pass 2 after a 5s success in pass 1) must not understate the time.
    // Both passes failed -> report the max so the number reads as an
    // upper bound beside its "errors" entry, never an optimistic one.
    val results = names.map { n =>
      val (t1, ok1) = pass1(n)
      val (t2, ok2) = pass2(n)
      n -> ((ok1, ok2) match {
        case (true, true)  => math.min(t1, t2)
        case (true, false) => t1
        case (false, true) => t2
        case (false, false) => math.max(t1, t2)
      })
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    println(json)
    Files.writeString(Paths.get("bench_result.json"), json + "\n")
    spark.stop()
  }
}
