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
    // SPARK_GRAFT_BENCH_ONLY=a,b: local-iteration subset (unset in the
    // driver's run — the full inventory is the reported surface).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
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
    val full = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    Files.writeString(Paths.get("bench_result.json"), full + "\n")
    // The driver recovers the stdout JSON from the LAST ~2000 chars of
    // the (sbt-suffixed) output. Round 6's 92-query full-precision line
    // was ~2900 chars, started before that window, and parsed as null.
    // So the printed line is budget-bounded: 3-decimal values, most
    // expensive queries first (the ones performance review needs),
    // cheap tail omitted once the budget is reached. The COMPLETE
    // full-precision map is always in bench_result.json (committed).
    def f3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val budget = 1800
    val head = s"""{"metric":"total","value":${f3(total)},"unit":"sec","nq":${results.size},"queries":{"""
    val tail = s"""},"errors":$errs,"sf":"$sfDir"}"""
    val entries = results.sortBy(-_._2).map { case (k, v) => "\"" + k + "\":" + f3(v) }
    val body = new StringBuilder
    var kept = 0
    var overflow = false
    for (e <- entries if !overflow) {
      val add = (if (kept == 0) 0 else 1) + e.length
      // +70 covers the longer omitted-count suffix variant. Stop at
      // the FIRST entry that doesn't fit: continuing would admit
      // cheaper entries past a skipped expensive one, making the
      // omitted set not-the-cheapest and the ordering claim false.
      if (head.length + body.length + add + tail.length + 70 <= budget) {
        if (kept > 0) body.append(',')
        body.append(e); kept += 1
      } else overflow = true
    }
    val omitted = results.size - kept
    val json = head + body +
      (if (omitted > 0) s"""},"omitted_cheapest":$omitted,"full":"bench_result.json","errors":$errs,"sf":"$sfDir"}"""
       else tail)
    println(json)
    spark.stop()
  }
}
