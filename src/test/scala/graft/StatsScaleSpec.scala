package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale smokes for the round-13 statistics/graph/text additions —
  * demonstrating headroom the sf0.01 oracle corpus cannot: each new
  * plan shape runs at 100–1000× the gate scale on generated data with
  * its structural invariants asserted (the DocGenSourceSpec /
  * VecGenSourceSpec smoke discipline; generous budgets absorb a loaded
  * co-tenant, round-3 postmortem).
  */
class StatsScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("scale smoke: Poisson-bootstrap CI over 5M units x 32 replicates") {
    // The events_bootstrap plan at 33k× the oracle's unit count: the
    // ×32 replicate explode feeds ONE map-side-combined aggregate (32
    // groups — partials collapse per task, the shuffle carries ~32
    // rows per task regardless of units). Deterministic metric
    // m = (id·37) % 10000 ⇒ the replicate estimates concentrate hard
    // around the point estimate (n = 5M ⇒ CI half-width ~0.1%), so
    // the order-statistics band must BRACKET the point — the
    // correctness invariant that survives any scale.
    val t0 = System.nanoTime()
    val u = spark.range(5000000L).select(col("id").as("user_id"),
      expr("(id * 37) % 10000").as("m"))
    val reps = u.select(col("user_id"), col("m"),
        explode(expr("sequence(0L, 31L)")).as("r"))
      .withColumn("t", expr(
        "(user_id * 2654435761 + r * 1013904223 + 12345) % 1048576"))
      .withColumn("h", expr("((t * t) div 1024) % 1048576"))
      .withColumn("w", expr(
        "CASE WHEN h < 385749 THEN 0 WHEN h < 771499 THEN 1 " +
          "WHEN h < 964373 THEN 2 WHEN h < 1028665 THEN 3 " +
          "WHEN h < 1044738 THEN 4 ELSE 5 END"))
    val ests = reps.groupBy(col("r"))
      .agg(sum(col("w") * col("m")).as("num"), sum(col("w")).as("den"))
      .select(expr("(1000 * num) div den").as("est"))
    val band = ests.agg(sort_array(collect_list(col("est"))).as("a"))
      .select(element_at(col("a"), 2).as("lo"), element_at(col("a"), 31).as("hi"))
      .head()
    val point = u.agg(expr("(1000 * sum(m)) div count(1)").as("p")).head().getLong(0)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(band.getLong(0) <= point && point <= band.getLong(1),
      s"CI [${band.getLong(0)}, ${band.getLong(1)}] must bracket point $point")
    assert(band.getLong(1) - band.getLong(0) < point / 50L,
      "at 5M units the 90% band is within ±1% of the mean")
    assert(secs < 180.0, f"5M-unit bootstrap took $secs%.1f s (budget 180 s)")
    info(f"5M units x 32 replicates in $secs%.1f s, CI " +
      s"[${band.getLong(0)}, ${band.getLong(1)}] around $point")
  }

  test("scale smoke: HITS two-iteration power pass over a 2M-vector kNN graph") {
    // The sim_hits plan at 400× the oracle corpus. SRP bits SCALE WITH
    // the corpus (the documented knob): 16 bits → 65k buckets → ~30
    // vectors/bucket, so the bucket equi-join stays linear; maxBucket
    // caps the hash-collision tail exactly like the dedup families.
    // Invariants: top-20 exists, authority scores are positive and
    // non-increasing in rank order.
    val t0 = System.nanoTime()
    val corpus = spark.read.format("graft-vecs")
      .option("rows", 2000000L).option("partitions", 32).option("dims", 32).load()
    val edges = graft.ext.SimOps.knnGraph(corpus, k = 5, bits = 16, maxBucket = 128)
      .select(col("vec_id").as("src"), col("nbr_id").as("dst"))
      .persist()
    val a1 = edges.groupBy(col("dst").as("v")).agg(count(lit(1)).as("a1"))
    val h1 = edges.join(a1, edges("dst") === a1("v"))
      .groupBy(col("src").as("u")).agg(sum(col("a1")).as("h1")).persist()
    val a2 = edges.join(h1, edges("src") === h1("u"))
      .groupBy(col("dst").as("v")).agg(sum(col("h1")).as("a2"))
    val top = a2.orderBy(col("a2").desc, col("v")).limit(20).collect()
    edges.unpersist(); h1.unpersist()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(top.length == 20, s"top-20 authorities exist, got ${top.length}")
    val scores = top.map(_.getLong(1))
    assert(scores.forall(_ > 0L) && scores.sameElements(scores.sortBy(-_)),
      "authority scores positive and rank-ordered")
    assert(secs < 240.0, f"2M-vector HITS took $secs%.1f s (budget 240 s)")
    info(f"2M-vector kNN graph + 2 HITS iterations in $secs%.1f s")
  }

  test("scale smoke: grid radius join over 1M generated points + 10k planted twins") {
    // The geo_radius_join plan at 2000× the oracle corpus: 1M points on
    // a 400k-wide integer grid (sparse — organic <20-distance pairs are
    // rare) plus 10k coincident twins planted at +2M ids. The 9-cell
    // probe ring joins on (gx, gy); every planted pair must surface at
    // distance 0, and total candidate volume stays linear (the cells
    // are mostly singletons, so the equi-join fan-out is ~9 rows per
    // point, never quadratic).
    val t0 = System.nanoTime()
    val base = spark.read.format("graft-vecs")
      .option("rows", 1000000L).option("partitions", 32).option("dims", 2).load()
      .select(col("vec_id"),
        (expr("CAST(floor(CAST(element_at(embedding, 1) AS DOUBLE) * 100000.0) AS BIGINT)")
          + lit(200000L)).as("px"),
        (expr("CAST(floor(CAST(element_at(embedding, 2) AS DOUBLE) * 100000.0) AS BIGINT)")
          + lit(200000L)).as("py"))
    val twins = base.filter(col("vec_id") % 100 === 0)
      .select((col("vec_id") + 2000000L).as("vec_id"), col("px"), col("py"))
    val p = base.unionAll(twins).persist()
    val home = p.select(col("vec_id"), col("px"), col("py"),
      expr("px div 20").as("gx"), expr("py div 20").as("gy"))
    val offs = Seq(-1L, 0L, 1L)
    val probe = p.select(col("vec_id").as("id_a"), col("px").as("ax"),
        col("py").as("ay"),
        explode(array((for { dx <- offs; dy <- offs } yield
          struct((expr("px div 20") + lit(dx)).as("gx"),
            (expr("py div 20") + lit(dy)).as("gy"))): _*)).as("g"))
      .select(col("id_a"), col("ax"), col("ay"),
        col("g.gx").as("gx"), col("g.gy").as("gy"))
    val got = probe.join(home, Seq("gx", "gy"))
      .filter(col("id_a") < col("vec_id") &&
        (col("ax") - col("px")) * (col("ax") - col("px")) +
          (col("ay") - col("py")) * (col("ay") - col("py")) <= lit(400L))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("vec_id") === col("id_a") + 2000000L &&
          (col("ax") - col("px")) * (col("ax") - col("px")) +
            (col("ay") - col("py")) * (col("ay") - col("py")) === 0L, 1L)
          .otherwise(0L)).as("n_planted")).head()
    p.unpersist()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(got.getLong(1) == 10000L,
      s"every planted coincident twin must surface: ${got.getLong(1)}")
    assert(got.getLong(0) < 100000L,
      s"sparse grid must stay near-plant-only: ${got.getLong(0)} pairs")
    assert(secs < 120.0, f"1M-point radius join took $secs%.1f s (budget 120 s)")
    info(f"1M-point grid radius join in $secs%.1f s, ${got.getLong(0)} pairs")
  }

  test("scale smoke: LOF over 1M points — planted outlier scores high, clump members score 1000") {
    // The geo_lof algebra at 2000× the oracle corpus, with an
    // ANALYTICALLY pinned verdict: a 10-point coincident clump planted
    // far outside the organic range (each member's 3-NN are clump
    // mates at d²=0 → sum_reach floors to 1 → lrd = 3·10⁶, and a
    // neighborhood of equals must score exactly lof = 1000) plus one
    // loner 45 units away (its 3-NN are clump members: reach 3·2025,
    // lrd = 3·10⁶ div 6075 = 493, lof = 9·10⁹ div 1479 ≈ 6.09·10⁶ —
    // the classic "sparser than its neighbors" signal, > 6000× the
    // clump baseline). The candidate pass is the same cell-bounded
    // ring join as the radius smoke; every post-knn stage is
    // candidate-bounded, so 1M points cost one grid join + small-key
    // stitches.
    import graft.queries.GeoQueries
    val t0 = System.nanoTime()
    try {
      val base = spark.read.format("graft-vecs")
        .option("rows", 1000000L).option("partitions", 32).option("dims", 2).load()
        .select(col("vec_id"),
          (expr("CAST(floor(CAST(element_at(embedding, 1) AS DOUBLE) * 100000.0) AS BIGINT)")
            + lit(200000L)).as("px"),
          (expr("CAST(floor(CAST(element_at(embedding, 2) AS DOUBLE) * 100000.0) AS BIGINT)")
            + lit(200000L)).as("py"))
      val clump = spark.range(10).select((col("id") + 3000000L).as("vec_id"),
        lit(500000L).as("px"), lit(500000L).as("py"))
      val loner = spark.range(1).select(lit(3000010L).as("vec_id"),
        lit(500045L).as("px"), lit(500000L).as("py"))
      val p = base.unionAll(clump).unionAll(loner).persist()
      val home = p.select(col("vec_id"), col("px"), col("py"),
        expr("px div 50").as("gx"), expr("py div 50").as("gy"))
      val offs = Seq(-1L, 0L, 1L)
      val knn = p.select(col("vec_id").as("id_a"), col("px").as("ax"),
          col("py").as("ay"),
          explode(array((for { dx <- offs; dy <- offs } yield
            struct((expr("px div 50") + lit(dx)).as("gx"),
              (expr("py div 50") + lit(dy)).as("gy"))): _*)).as("g"))
        .select(col("id_a"), col("ax"), col("ay"),
          col("g.gx").as("gx"), col("g.gy").as("gy"))
        .join(home, Seq("gx", "gy"))
        .filter(col("id_a") =!= col("vec_id") &&
          (col("ax") - col("px")) * (col("ax") - col("px")) +
            (col("ay") - col("py")) * (col("ay") - col("py")) <= lit(2500L))
        .select(col("id_a"), col("vec_id").as("id_b"),
          ((col("ax") - col("px")) * (col("ax") - col("px")) +
            (col("ay") - col("py")) * (col("ay") - col("py"))).as("d2"))
        .withColumn("rk0", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("id_a")).orderBy(col("d2"), col("id_b"))))
        .filter(col("rk0") <= 3)
        .select(col("id_a"), col("rk0").cast("bigint").as("rk"),
          col("id_b"), col("d2"))
      val planted = GeoQueries.lofScores(knn)
        .filter(col("vec_id") >= 3000000L).collect()
        .map(r => r.getLong(0) -> r.getLong(3)).toMap
      p.unpersist()
      val secs = (System.nanoTime() - t0) / 1e9
      assert(planted.size == 11, s"all planted points scored, got ${planted.size}")
      (3000000L to 3000009L).foreach { id =>
        assert(planted(id) == 1000L,
          s"clump member $id must score exactly 1000, got ${planted(id)}") }
      assert(planted(3000010L) > 6000000L,
        s"loner must score > 6e6 milli, got ${planted(3000010L)}")
      assert(secs < 150.0, f"1M-point LOF took $secs%.1f s (budget 150 s)")
      info(f"1M-point LOF in $secs%.1f s; loner lof=${planted(3000010L)} vs clump 1000")
    } finally graft.ext.DedupOps.releaseCaches()
  }

  test("scale smoke: tile-hash partial-dup join over 1M generated docs") {
    // The mm_tile_hash plan at 2000× the oracle corpus: 16M tile rows
    // through the df-cap + tile-keyed equi-join, with 10k planted
    // self-splices (first 8 tiles twice — boundaries align by
    // construction). The generator's templated docs push MANY tile
    // values over the df ≤ 50 cap, and plants built from common tiles
    // are dropped WITH them — the cap's precision-first contract, not
    // a recall bug (measured: ~6.5k of 10k surface). The assertions
    // pin that contract: a solid majority of plants surface, and
    // fan-out per surviving tile value stays ≤ 50·49/2, so candidate
    // volume is linear in the corpus.
    val t0 = System.nanoTime()
    val base = spark.read.format("graft-docs")
      .option("rows", 1000000L).option("partitions", 32).load()
      .select(col("doc_id"), expr("encode(text, 'UTF-8')").as("content"))
    val spliced = base.filter(col("doc_id") % 100 === 0 &&
        length(col("content")) >= 16)
      .withColumn("tw", expr("length(content) div 16"))
      .select((col("doc_id") + 2000000L).as("doc_id"),
        concat(expr("substring(content, 1, 8 * tw)"),
          expr("substring(content, 1, 8 * tw)")).as("content"))
    val corpus = base.unionAll(spliced)
    val tiles = corpus.filter(length(col("content")) >= 16)
      .withColumn("tw", expr("length(content) div 16"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, 15), i -> md5(substring(content, i * tw + 1, tw)))"))
        .as("tile_md5"))
      .distinct()
      .persist()
    val rare = tiles.groupBy(col("tile_md5")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= 50)
    val keep = tiles.join(rare.select(col("tile_md5")), "tile_md5")
    val got = keep.as("x").join(keep.as("y"),
        col("x.tile_md5") === col("y.tile_md5") &&
          col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 8L)
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("b") === col("a") + 2000000L, 1L).otherwise(0L))
          .as("n_planted")).head()
    tiles.unpersist()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(got.getLong(1) >= 6000L,
      s"plants surface through the cap: ${got.getLong(1)} of 10000")
    assert(secs < 240.0, f"1M-doc tile-hash took $secs%.1f s (budget 240 s)")
    info(f"1M docs tile-hash partial-dup join in $secs%.1f s, " +
      s"${got.getLong(0)} pairs, ${got.getLong(1)} planted found")
  }

  test("scale smoke: pairwise source JSD over 1M generated docs / 20 sources") {
    // The text_jsd plan at 200× the gate corpus: token explode → one
    // (source, token) fold, a token-keyed pair join whose fan-out is
    // bounded by |sources|² = a domain constant, and a 190-row pair
    // grid. Invariants: all 190 pairs emit, and every JSD lands in
    // [0, 1 bit] WIDENED by the fast-log kernel's own worst case: the
    // chord sits within 87.2 millibits below true log2, L-differences
    // carry ±87.2, and the weighted fold bounds the total drift by
    // ±87.2 millibits of JSD — ±87,200 micro. The generator's 20
    // "sources" are the SAME distribution (doc_id % 20 slices), so
    // true JSD ≈ 0 and the lower edge is exactly where the chord
    // slack shows up — the property pin for the error bound at
    // corpus scale.
    import graft.functions.HashExprs.log2Millis
    val t0 = System.nanoTime()
    val docs = spark.read.format("graft-docs")
      .option("rows", 1000000L).option("partitions", 32).load()
      .select(expr("CAST(doc_id % 20 AS STRING)").as("source"), col("text"))
    val cnt = docs
      .select(col("source"),
        explode(graft.ext.TextOps.tokens(col("text"))).as("token"))
      .groupBy(col("source"), col("token")).agg(count(lit(1)).as("c"))
      .persist()
    val totals = cnt.groupBy(col("source")).agg(sum(col("c")).as("nt"))
    val jsd = cnt.as("x").join(cnt.as("y"),
        col("x.token") === col("y.token") && col("x.source") < col("y.source"))
      .select(col("x.source").as("sa"), col("y.source").as("sb"),
        col("x.c").as("a"), col("y.c").as("b"))
      .join(broadcast(totals.select(col("source").as("sa"), col("nt").as("na"))), "sa")
      .join(broadcast(totals.select(col("source").as("sb"), col("nt").as("nb"))), "sb")
      .withColumn("u", col("a") * col("nb"))
      .withColumn("v", col("b") * col("na"))
      .withColumn("term",
        col("u") * (log2Millis(lit(2L) * col("u")) - log2Millis(col("u") + col("v"))) +
          col("v") * (log2Millis(lit(2L) * col("v")) - log2Millis(col("u") + col("v"))))
      .groupBy(col("sa"), col("sb"))
      .agg(sum(col("term").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .as("ts"),
        sum(col("a")).as("sam"), sum(col("b")).as("sbm"),
        min(col("na")).as("na"), min(col("nb")).as("nb"))
      .withColumn("d", col("ts") +
        lit(1000L).cast(org.apache.spark.sql.types.DecimalType(38, 0)) *
          col("nb") * (col("na") - col("sam")) +
        lit(1000L).cast(org.apache.spark.sql.types.DecimalType(38, 0)) *
          col("na") * (col("nb") - col("sbm")))
      .select(expr("CAST((1000 * d) div (CAST(2 AS DECIMAL(38,0)) * na * nb) " +
        "AS BIGINT)").as("jsd_micro"))
      .collect()
    cnt.unpersist()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(jsd.length == 190, s"all 20*19/2 pairs emit, got ${jsd.length}")
    assert(jsd.forall(r => r.getLong(0) >= -87200L && r.getLong(0) <= 1087200L),
      s"JSD within [0, 1 bit] ± the 87.2-millibit chord bound; got " +
        s"[${jsd.map(_.getLong(0)).min}, ${jsd.map(_.getLong(0)).max}]")
    assert(secs < 240.0, f"1M-doc JSD took $secs%.1f s (budget 240 s)")
    info(f"1M docs / 20 sources pairwise JSD in $secs%.1f s")
  }

  test("scale smoke: co-travel over 10M events / 1M users — the cap survives urban density, planted pairs surface") {
    // The geo_cotravel plan at 100× the sf0.1 corpus, driving the SAME
    // library code the gated row runs (trajOf → cotravelPairs). At
    // this density the walk crowds ~1M users into the cells around the
    // shared origin, so origin-hour buckets hold hundreds of users —
    // occupancy² pairing there would be billions of candidates; the
    // cap excludes those buckets and is what makes the query runnable
    // at all (the stadium-hour argument, measured). Recall is proved
    // where co-travel is detectable: 100 planted pairs — user u's walk
    // cloned to users 2M+u and 3M+u at a u-specific remote offset —
    // land in otherwise-empty buckets (occupancy exactly 2) and every
    // pair whose source walk spans ≥ 2 distinct (hour, cell) buckets
    // MUST surface with n_shared equal to that bucket count.
    val t0 = System.nanoTime()
    val events = spark.read.format("graft-events")
      .option("rows", 10000000L).option("partitions", 32)
      .option("users", 1000000L).option("days", 30).load()
    val walk = graft.queries.GeoQueries.trajOf(events)
      .select(col("user_id"), col("tus"), col("x"), col("y"))
    val seed = walk.filter(col("user_id") < 100L)
    def planted(idOff: Long) = seed.select(
      (col("user_id") + idOff).as("user_id"), col("tus"),
      (col("x") + col("user_id") * 10000L + 5000000L).as("x"),
      (col("y") + lit(5000000L)).as("y"))
    val t = walk.unionAll(planted(2000000L)).unionAll(planted(3000000L))
    val pairs = graft.queries.GeoQueries.cotravelPairs(t).persist()
    val expected = seed
      .select(col("user_id"), expr("tus div 3600000000").as("hb"),
        expr("x div 25").as("cx"), expr("y div 25").as("cy"))
      .distinct().groupBy(col("user_id")).agg(count(lit(1)).as("nb"))
      .filter(col("nb") >= 2L)
      .select(col("user_id"), col("nb")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = pairs
      .filter(col("user_a") >= 2000000L &&
        col("user_b") === col("user_a") + 1000000L)
      .collect().map(r => (r.getLong(0) - 2000000L, r.getLong(2))).toMap
    val wellFormed = pairs
      .agg(sum(when(col("user_a") < col("user_b") &&
        col("n_shared") >= 2L, 0L).otherwise(1L)).as("bad")).head().getLong(0)
    pairs.unpersist()
    graft.core.QueryCaches.release()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(expected.nonEmpty && expected.size >= 90,
      s"plant seeds span >=2 buckets for most of the 100 users: ${expected.size}")
    assert(got == expected,
      s"every detectable planted pair surfaces with exact shared-bucket " +
        s"count: expected ${expected.size}, got ${got.size}; " +
        s"diff=${(expected.toSet diff got.toSet).take(3)}")
    assert(wellFormed == 0L, s"$wellFormed malformed pairs emitted")
    assert(secs < 240.0, f"10M-event co-travel took $secs%.1f s (budget 240 s)")
    info(f"10M events / 1M users co-travel in $secs%.1f s; " +
      f"${expected.size} planted pairs exact")
  }

  test("scale smoke: map-matching over 10M events / 1M users — snap at scan speed, islands conserve points") {
    // geo_map_match's plan at 100× the sf0.1 corpus, driving the SAME
    // library code the gated row runs (trajOf → anchorVisits): the
    // anchor snap is a broadcast cover join + in-row argmin (no
    // per-point aggregate, nothing shuffles before the walk's own
    // window), and the islands fold rides the user partitioning. The
    // conservation pin is the real gate: Σ n_points over emitted
    // visits must equal EXACTLY the number of on-network positions —
    // a window fold that dropped or duplicated rows across partition
    // boundaries would break the equality at this scale even when
    // sf0.001 hashes stay green.
    val t0 = System.nanoTime()
    val events = spark.read.format("graft-events")
      .option("rows", 10000000L).option("partitions", 32)
      .option("users", 1000000L).option("days", 30).load()
    val t = graft.queries.GeoQueries.trajOf(events)
    val onNet = graft.queries.GeoQueries.anchorSnap(t)
      .filter(col("aid") >= 0L).count()
    val v = graft.queries.GeoQueries.anchorVisits(t)
      .agg(count(lit(1)).as("n_visits"), sum(col("n_points")).as("pts"),
        countDistinct(col("anchor_id")).as("n_anchors")).head()
    graft.core.QueryCaches.release()
    val secs = (System.nanoTime() - t0) / 1e9
    // the 1M-user walk crowds the origin, which sits inside the anchor
    // grid — a large slice of positions must snap on-network
    assert(onNet > 1000000L, s"snap coverage collapsed: $onNet of 10M on-network")
    assert(v.getLong(1) == onNet,
      s"islands must conserve on-network points: ${v.getLong(1)} != $onNet")
    assert(v.getLong(0) > 0L && v.getLong(0) <= onNet, s"visit count sane: ${v.getLong(0)}")
    assert(secs < 240.0, f"10M-event map-match took $secs%.1f s (budget 240 s)")
    info(f"10M events map-matched in $secs%.1f s: $onNet on-network points, " +
      f"${v.getLong(0)} visits over ${v.getLong(2)} anchors")
  }
}
