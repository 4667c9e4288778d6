package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r18 rework equivalence pins: the three operators whose INTERNALS
  * changed this optimization round (sim_kcore's degree-delta peel,
  * sim_mmr's single-state greedy fold, q_zorder's distinct-key bucket
  * expansion) are each compared against the r17 REFERENCE
  * implementation, re-spelled here verbatim, on real testdata. The
  * DuckDB oracle already gates the values; these tests additionally
  * pin the Spark-vs-Spark refactor equivalence so a future edit that
  * drifts from the reference fails in `sbt test` without needing the
  * oracle harness.
  */
class R18ReworkEquivalenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("sim_kcore degree-delta peel == r17 shrinking-edge peel") {
    import graft.ext.SimOps
    // reference mutual-kNN edges, the SimQueries.mutualEdges spelling
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val g = SimOps.knnGraph(e, k = 5, bits = 4)
      .select(col("vec_id"), col("nbr_id")).persist()
    val m = g.as("f").join(g.as("r"),
        col("f.vec_id") === col("r.nbr_id") && col("f.nbr_id") === col("r.vec_id"))
      .filter(col("f.vec_id") < col("f.nbr_id"))
      .select(col("f.vec_id").as("u"), col("f.nbr_id").as("v"))
    // r17 reference: 5 rounds of drop-deg<3 + restrict-edges-to-survivors
    var adj = m.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(m.select(col("v").as("src"), col("u").as("dst")))
      .localCheckpoint()
    for (_ <- 1 to 5) {
      val keep = adj.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= 3).select(col("src").as("kid"))
      adj = adj.join(keep, col("src") === col("kid"), "left_semi")
        .join(keep, col("dst") === col("kid"), "left_semi")
        .localCheckpoint()
    }
    val ref = adj.groupBy(col("src")).agg(count(lit(1)).as("core_deg"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = SparkEntry.queries("sim_kcore")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.ext.DedupOps.releaseCaches()
    g.unpersist()
    assert(ref.nonEmpty, "pin needs a non-trivial 3-core at sf0.01")
    assert(got == ref,
      s"degree-delta peel diverged: only-new=${(got -- ref).take(5)} only-ref=${(ref -- got).take(5)}")
  }

  test("sim_mmr single-state fold == r17 unrolled greedy (exact doubles)") {
    import graft.ext.SimOps
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val corpus = e.select(col("vec_id"), col("embedding"))
    val queries = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val lam = 0.7
    val cand = SimOps.topkBrute(corpus, queries, 8).persist()
    val ce = cand.join(corpus, "vec_id")
    val pair = ce.select(col("q_id"), col("vec_id").as("a_id"), col("embedding").as("a_emb"))
      .join(ce.select(col("q_id"), col("vec_id").as("b_id"),
        col("embedding").as("b_emb")), Seq("q_id"))
      .filter(col("a_id") =!= col("b_id"))
      .select(col("q_id"), col("a_id"), col("b_id"),
        graft.functions.HashExprs.cosineSim(col("a_emb"), col("b_emb")).as("sim"))
      .persist()
    val wq = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id"))
    def pick(scored: DataFrame, rank: Int): DataFrame =
      scored.withColumn("rk", row_number().over(wq)).filter(col("rk") === 1)
        .select(col("q_id"), lit(rank.toLong).as("rank"), col("vec_id"),
          col("cos").as("rel"), col("score").as("mmr_score"))
    var selected = pick(cand.withColumn("score", lit(lam) * col("cos")), 1).persist()
    for (k <- 2 to 4) {
      val rem = cand.join(selected.select(col("q_id"), col("vec_id")),
        Seq("q_id", "vec_id"), "left_anti")
      val msim = pair.join(selected.select(col("q_id"), col("vec_id").as("b_id")),
          Seq("q_id", "b_id"))
        .groupBy(col("q_id"), col("a_id")).agg(max(col("sim")).as("m"))
      val scored = rem.join(msim,
          rem("q_id") === msim("q_id") && rem("vec_id") === msim("a_id"))
        .select(rem("q_id"), col("vec_id"), col("cos"),
          (lit(lam) * col("cos") - lit(1.0 - lam) * col("m")).as("score"))
      selected = selected.unionByName(pick(scored, k)).persist()
    }
    val ref = selected
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet
    val got = SparkEntry.queries("sim_mmr")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet
    graft.ext.DedupOps.releaseCaches()
    cand.unpersist(); pair.unpersist()
    // EXACT double equality on rel and mmr_score is the point: the fold
    // must reproduce the unrolled expressions bit-for-bit (greatest-
    // folded running max == aggregate MAX, identical score trees).
    assert(ref.size >= 20, s"pin needs the full 5-query x 4-rank surface: ${ref.size}")
    assert(got == ref,
      s"state-fold diverged: only-new=${(got -- ref).take(3)} only-ref=${(ref -- got).take(3)}")
  }

  test("q_zorder distinct-key bucket expansion == r17 per-row global ranks") {
    import graft.ext.SkewOps
    val nB = 256
    val base = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk")).persist()
    val mx = base.agg(max(col("pk")).as("pkm"), max(col("sk")).as("skm"),
      count(lit(1)).as("nr"))
    val zed = base.crossJoin(broadcast(mx))
      .withColumn("z", graft.functions.HashExprs.zorder(
        expr("pk * 65536 div (pkm + 1)"), expr("sk * 65536 div (skm + 1)"), 16))
      .persist()
    val rkl = SkewOps.globalRank(zed, Seq("pk", "sk"), "rkl").persist()
    val b = SkewOps.globalRank(rkl, Seq("z", "pk", "sk"), "rkz")
      .select(col("pk"), col("sk"),
        expr(s"(rkl - 1) * $nB div nr").as("b_lin"),
        expr(s"(rkz - 1) * $nB div nr").as("b_z"),
        expr("pkm div 4").as("p_lo"), expr("pkm div 2").as("p_hi"),
        expr("skm div 4").as("s_lo"), expr("skm div 2").as("s_hi"))
      .persist()
    def layout(bucket: org.apache.spark.sql.Column, name: String): DataFrame = {
      val hit = col("pk_min") <= col("p_hi") && col("pk_max") >= col("p_lo") &&
        col("sk_min") <= col("s_hi") && col("sk_max") >= col("s_lo")
      b.groupBy(bucket.as("bucket"))
        .agg(min(col("pk")).as("pk_min"), max(col("pk")).as("pk_max"),
          min(col("sk")).as("sk_min"), max(col("sk")).as("sk_max"),
          count(lit(1)).as("n_rows"),
          sum(when(col("pk").between(col("p_lo"), col("p_hi")) &&
            col("sk").between(col("s_lo"), col("s_hi")), 1L)
            .otherwise(0L)).as("n_match"),
          min(col("p_lo")).as("p_lo"), min(col("p_hi")).as("p_hi"),
          min(col("s_lo")).as("s_lo"), min(col("s_hi")).as("s_hi"))
        .groupBy(lit(name).as("layout"))
        .agg(count(lit(1)).as("buckets_total"),
          sum(when(hit, 1L).otherwise(0L)).as("buckets_read"),
          sum(when(hit, col("n_rows")).otherwise(0L)).as("rows_scanned"),
          sum(col("n_match")).as("rows_matched"))
    }
    val ref = layout(col("b_lin"), "linear_pk").unionAll(layout(col("b_z"), "zorder_pk_sk"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val got = SparkEntry.queries("q_zorder")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    graft.ext.DedupOps.releaseCaches()
    base.unpersist(); zed.unpersist(); rkl.unpersist(); b.unpersist()
    assert(got == ref, s"bucket expansion diverged: new=$got ref=$ref")
  }
}
