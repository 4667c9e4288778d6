package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DataSource V2 generator: partitioned, deterministic, storage-free —
  * and immediately consumable by the dedup kernels.
  */
class DocGenSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(rows: Long, parts: Int) =
    spark.read.format("graft-docs")
      .option("rows", rows).option("partitions", parts).load()

  test("generates exactly `rows` docs across `partitions` input partitions") {
    val df = docs(10000, 8)
    assert(df.count() == 10000)
    assert(df.rdd.getNumPartitions == 8)
    assert(df.select(countDistinct(col("doc_id"))).head().getLong(0) == 10000)
  }

  test("deterministic: same ids yield identical text at any partitioning") {
    val a = docs(500, 4).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = docs(500, 13).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    assert(a(42L) == graft.sources.DocGenSource.textFor(42L))
  }

  test("scale smoke: fingerprint + MinHash sketch over 1M generated docs") {
    // 100x the oracle corpus, generated executor-side — exercises the
    // codegen kernel path at a size where any per-row interpreter
    // detour or HOF re-evaluation would take minutes.
    val d = docs(1000000L, 32)
    val sketched = d.select(col("doc_id"),
      graft.ext.TextOps.fingerprint(col("text")).as("fp"),
      graft.ext.DedupOps.minhash(
        graft.ext.DedupOps.shingleFps(graft.ext.TextOps.tokens(col("text")), 3), 16).as("mh"))
    val agg = sketched.agg(
      countDistinct(col("fp")).as("n_fp"),
      count(lit(1)).as("n")).head()
    assert(agg.getLong(1) == 1000000L)
    // generator texts are near-unique; organic fingerprint collisions stay tiny
    assert(agg.getLong(0) > 990000L, s"distinct fps: ${agg.getLong(0)}")
  }

  test("scale smoke: Kneser-Ney LM scoring via the bigram UDTF over 1M generated docs") {
    // The text_kn_lm plan at 200x the oracle corpus: bigrams stream
    // from the Generator (no struct-array materialization on ~50M
    // bigram instances), the c2/context/continuation stats stay
    // vocab-bounded (fixed generator vocabulary => the broadcast-side
    // contract holds at ANY corpus size), and the per-doc fold is
    // map-side combined.
    import graft.functions.HashExprs.{explodeBigrams, log2Millis}
    val t0 = System.nanoTime()
    val d = docs(1000000L, 32)
    val bi = d.select(col("doc_id"), explodeBigrams(col("text")))
      .select(col("doc_id"), col("w1"), col("w2"))
      .persist()
    val c2 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val w1s = c2.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1ctx"), count(lit(1)).as("n1fw"))
    val w2s = c2.groupBy(col("w2")).agg(count(lit(1)).as("n1pw"))
    val b = c2.agg(count(lit(1)).as("btot"))
    val scored = bi.join(broadcast(c2), Seq("w1", "w2"))
      .join(broadcast(w1s), "w1").join(broadcast(w2s), "w2")
      .crossJoin(broadcast(b))
      .withColumn("den", expr("2 * c1ctx * btot"))
      .withColumn("num", expr("(2 * c12 - 1) * btot + n1fw * n1pw"))
      .withColumn("mb", log2Millis(col("den")) - log2Millis(col("num")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nb"), sum(col("mb")).as("smb"))
    val agg = scored.agg(count(lit(1)), sum(col("nb")),
      expr("CAST(SUM(smb) AS DECIMAL(38,0)) div SUM(nb)")).head()
    bi.unpersist()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(agg.getLong(0) == 1000000L, "every generated doc has >= 19 bigrams")
    val avgMb = agg.getLong(2)
    assert(avgMb > 0L && avgMb < 20000L, s"corpus mean KN surprisal sane: $avgMb")
    assert(secs < 180.0, f"1M-doc KN scoring took $secs%.1f s (budget 180 s)")
    info(f"1M docs KN-scored in $secs%.1f s, mean surprisal $avgMb millibits")
  }

  test("filter pushdown: id-range predicates narrow generation and PRUNE input partitions") {
    val df = spark.read.format("graft-docs")
      .option("rows", 1000).option("partitions", 10).load()
    val ranged = df.filter(col("doc_id") >= 250 && col("doc_id") < 700)
    // exactness first: pushed range == post-hoc filter of the full scan
    val full = df.collect().map(r => (r.getLong(0), r.getString(1)))
      .filter(r => r._1 >= 250 && r._1 < 700).sortBy(_._1).toSeq
    val got = ranged.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got == full && got.size == 450)
    // partition pruning: the 10×100 grid clipped to [250, 700) keeps
    // exactly chunks 2..6 — five tasks, not ten
    assert(ranged.rdd.getNumPartitions == 5,
      s"expected 5 pruned partitions, got ${ranged.rdd.getNumPartitions}")
    // point lookup plans a single task
    val point = df.filter(col("doc_id") === 42L)
    assert(point.rdd.getNumPartitions == 1 && point.count() == 1L)
    // a non-id predicate stays residual and still applies
    val residual = df.filter(col("doc_id") < 100 && col("text").contains("spark"))
    val naive = df.collect().filter(r => r.getLong(0) < 100 && r.getString(1).contains("spark"))
    assert(residual.count() == naive.length.toLong)
    // Long.MaxValue boundary (round-11 advice): `<= MaxValue` must keep
    // every row — the unguarded `+ 1` used to wrap the exclusive bound
    // to MinValue and silently EMPTY the scan
    assert(df.filter(col("doc_id") <= Long.MaxValue).count() == 1000L)
    assert(df.filter(col("doc_id") > Long.MaxValue).count() === 0L)
  }

  test("column pushdown: an id-only scan reads struct<doc_id> — text is never generated") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val df = spark.read.format("graft-docs")
      .option("rows", 100).option("partitions", 4).load()
    val idOnly = df.select(col("doc_id"))
    val scans = idOnly.queryExecution.executedPlan.collectLeaves()
      .collect { case b: BatchScanExec => b }
    assert(scans.nonEmpty)
    assert(scans.head.scan.readSchema().fieldNames.toSeq == Seq("doc_id"),
      s"scan must read only doc_id, got ${scans.head.scan.readSchema()}")
    assert(idOnly.collect().map(_.getLong(0)).sorted.toSeq == (0L until 100L).toSeq)
    // pruning must not disturb determinism of the surviving column
    val prunedText = df.filter(col("doc_id") === 7L).select(col("text")).head().getString(0)
    assert(prunedText == graft.sources.DocGenSource.textFor(7L))
  }

  test("aggregate pushdown: count/min/max answer from the range — a trillion-row count is instant") {
    val huge = spark.read.format("graft-docs")
      .option("rows", 1000000000000L).option("partitions", 32).load()
    val t0 = System.nanoTime()
    val n = huge.count()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(n == 1000000000000L)
    assert(secs < 30, f"plan-time count must not generate rows, took $secs%.1f s")
    // min/max of the id ride the same closed form, AFTER a pushed filter
    val mm = huge.filter(col("doc_id") >= 500L && col("doc_id") < 2000L)
      .agg(count(lit(1)), min(col("doc_id")), max(col("doc_id"))).head()
    assert(mm.getLong(0) == 1500L && mm.getLong(1) == 500L && mm.getLong(2) == 1999L)
    // an aggregate the range cannot answer must REFUSE pushdown and
    // still be correct through normal generation
    val small = spark.read.format("graft-docs")
      .option("rows", 1000).option("partitions", 4).load()
    val grouped = small.groupBy((col("doc_id") % 7).as("g")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(grouped.values.sum == 1000L && grouped.size == 7)
    val avgRow = small.agg(avg(col("doc_id"))).head()
    assert(avgRow.getDouble(0) == 499.5)
  }

  test("reported statistics: a small generated dimension auto-broadcasts, a big one does not") {
    // SupportsReportStatistics → Catalyst sees exact numRows/sizeInBytes
    // and picks the broadcast side itself — no broadcast() hint anywhere.
    val dim = spark.read.format("graft-docs")
      .option("rows", 100).option("partitions", 2).load()
      .select(col("doc_id").as("d_id"), col("text").as("d_text"))
    val fact = spark.read.format("graft-events")
      .option("rows", 200000).option("partitions", 8).load()
    val joined = fact.join(dim, fact("user_id") % 100 === dim("d_id"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"100-row generated dim must auto-broadcast:\n$plan")
    assert(joined.count() == 200000L)
    // two fact-sized sides must NOT broadcast (stats above the threshold)
    val bigL = spark.read.format("graft-events")
      .option("rows", 3000000).option("partitions", 8).load()
      .select(col("event_id"), col("user_id"))
    val bigR = spark.read.format("graft-events")
      .option("rows", 3000000).option("partitions", 8).load()
      .select(col("event_id").as("e2"), col("user_id").as("u2"))
    val big = bigL.join(bigR, bigL("event_id") === bigR("e2"))
      .queryExecution.executedPlan.toString
    assert(!big.contains("BroadcastHashJoin"),
      s"3M x 3M generated join must not broadcast either side:\n$big")
  }

  test("scale smoke: char-entropy bound kernel over 1M generated docs, one codegen pass") {
    // the text_entropy hot path at 2000x the oracle corpus: one kernel
    // call per doc inside the scan projection — a per-char explode at
    // this size would shuffle ~10^8 rows; the kernel shuffles zero.
    val t0 = System.nanoTime()
    val d = docs(1000000L, 32)
    val e = graft.functions.HashExprs.charEntropyBound(col("text"))
    val agg = d.select(e.getItem(0).as("n"), e.getItem(2).as("bits"))
      .agg(count(lit(1)).as("rows"), sum(col("n")).as("chars"),
        sum(col("bits")).as("bits"),
        min(expr("(1000 * bits) div n")).as("lo_mbpc"),
        max(expr("(1000 * bits) div n")).as("hi_mbpc")).head()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(agg.getLong(0) == 1000000L)
    // generator prose must land in a sane bits-per-char band: above a
    // repetition wall (0), below the log2(distinct-chars) ceiling
    assert(agg.getLong(3) >= 1000L && agg.getLong(4) <= 6000L,
      s"milli-bits/char band [${agg.getLong(3)}, ${agg.getLong(4)}]")
    info(f"1M docs (${agg.getLong(1)} chars) entropy-bounded in $secs%.1f s")
    assert(secs < 120, f"kernel pass must stay bounded, took $secs%.1f s")
  }

  test("scale smoke: Gopher rule bundle (incl. modal-bigram kernel) over 1M generated docs") {
    // The whole per-row rule suite at 100x oracle scale: proves the
    // linear modalNgramCount kernel and the in-row line/length/stopword
    // signals run at scan speed (zero shuffles — any accidental
    // quadratic or HOF re-evaluation would blow the budget).
    val t0 = System.nanoTime()
    val d = docs(1000000L, 32)
    val tk = graft.ext.TextOps.tokens(col("text"))
    val sig = d.select(col("doc_id"),
        size(tk).cast("bigint").as("n_words"),
        aggregate(transform(tk, t => length(t).cast("bigint")),
          lit(0L), (a, b) => a + b).as("sum_chars"),
        graft.functions.HashExprs.modalNgramCount(tk, 2).as("max_big"))
      .agg(count(lit(1)).as("n"),
        sum(when(lit(10L) * col("max_big") <= col("n_words"), 1L).otherwise(0L)).as("ok_big"),
        sum(when(lit(3L) * col("n_words") <= col("sum_chars") &&
          col("sum_chars") <= lit(10L) * col("n_words"), 1L).otherwise(0L)).as("ok_mwl"))
      .head()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"1M docs through the rule signals in $secs%.1f s")
    assert(sig.getLong(0) == 1000000L)
    assert(sig.getLong(2) > 900000L, "generator words are 1-10 chars; mwl passes broadly")
    assert(secs < 120.0, f"rule bundle must run at scan speed, took $secs%.1f s")
  }

  test("scale smoke: nearDupPairs + capBuckets end-to-end over 10M generated docs") {
    // The whole bucketed near-dup pipeline — tokens → shingle fps →
    // MinHash → banded LSH keys → capBuckets skew guard → bucket
    // self-join → exact Jaccard verify — at 1000x the oracle corpus,
    // demonstrating the plan's headroom rather than asserting it:
    // shuffle volume stays O(docs x bands) fixed-width rows and the
    // candidate join is bucket-bounded, so wall-clock scales with
    // corpus size, not its square. Sketch parameters are the scale
    // knobs — 16 hashes / 2 bands (r=8) here: the 24-word vocabulary
    // gives random doc pairs J≈0.1, and r=8 keeps their band-collision
    // probability ~J^8, so candidates stay sparse enough for the
    // verify join's probe side to broadcast (r=4 measured 1.08M
    // organic candidates → two 10M-row sort-merge shuffles). The PLAN
    // SHAPE is identical to the oracle-gated dedup_near/_capped.
    // Phase costs at local[16]: 46 s end-to-end when first calibrated;
    // round 14 measured the IDENTICAL code at 231 s on an otherwise
    // idle box (the environment's throughput drifts round over round —
    // the round-13 bench saw +21% on unchanged queries). So the
    // wall-clock bound is a PATHOLOGY guard only (a quadratic blowup
    // at 10M docs is hours, not minutes); the complexity gate that
    // actually pins the plan is the candidate-count assert below, and
    // cross-round throughput is tracked by the BENCH/BASELINE
    // artifacts, which the driver normalizes — not by a unit test
    // racing co-tenants.
    val t0 = System.nanoTime()
    val d = docs(10000000L, 64)
    val pairs = graft.ext.DedupOps.nearDupPairs(
      d, "doc_id", "text", k = 3, hashes = 16, bands = 2,
      threshold = 0.7, maxBucket = 8)
    val n = pairs.count()
    graft.ext.DedupOps.releaseCaches()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(n < 100000, s"candidate explosion: $n pairs")
    assert(secs < 600.0, f"10M-doc near-dup pipeline took $secs%.1f s (pathology bound 600 s on local[16])")
    info(f"10M docs end-to-end in $secs%.1f s, $n verified pairs")
  }

  test("scale smoke: perceptual-hash near-dup (byteSegGradHash + hammingPairs) over 1M docs") {
    // The mm_phash pipeline at 1000x its oracle corpus. Hash width is
    // the scale knob: the oracle's 31-bit hash has ~10-bit band keys —
    // fine at 1k docs, but 1M docs would pile ~1000 ids per bucket and
    // the candidate join would square it. segs=63 → 62 bits → ~20-bit
    // band keys → ~1 id per bucket at 1M. The planted contract is
    // width-independent: a last-byte REPLACE (length unchanged) moves
    // only the final segment's sum, flipping at most one gradient bit,
    // and bands=3 > maxHamming=2 gives pigeonhole-exact recall — so
    // every planted pair MUST surface, uncapped, at any scale.
    val t0 = System.nanoTime()
    val d = docs(1000000L, 32)
    val planted = d.filter(col("doc_id") < 10000L)
      .select((col("doc_id") + 1000000000L).as("doc_id"),
        concat(expr("substring(text, 1, length(text) - 1)"), lit("~")).as("text"))
    val corpus = d.select(col("doc_id"), col("text")).unionAll(planted)
    val hashed = corpus.select(col("doc_id"),
      graft.ext.MultimodalOps.byteSegGradHash(encode(col("text"), "UTF-8"), 63).as("ph"))
    val pairs = graft.ext.DedupOps.hammingPairs(
      hashed, "doc_id", "ph", bits = 62, bands = 3, maxHamming = 2)
    val nPlanted = pairs.filter(col("id_b") === col("id_a") + 1000000000L).count()
    graft.ext.DedupOps.releaseCaches()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(nPlanted >= 10000L, s"planted recall broken: $nPlanted of 10000 pairs")
    assert(secs < 150.0, f"1M-doc phash pipeline took $secs%.1f s (budget 150 s)")
    info(f"1M docs + 10k planted tail-edits in $secs%.1f s, $nPlanted planted pairs found")
  }

  test("scale smoke: binary-fixture mint + entropy kernel + tile join over 1M docs") {
    // The mm_bin_* substrate at 1000x the oracle corpus: mint a 68-byte
    // non-UTF8 blob per doc from doc_id arithmetic (the
    // MultimodalQueries.synthBin formula — magic + 4x16-byte tiles,
    // groups of 4 docs sharing tile content), run the codegen 16-bin
    // histogram entropy fold, and the tile-keyed partial-dup equi-join.
    // Pins: the mint is a pure scan-partition projection (no shuffle
    // before the aggregates), constant-BODY docs land under 600
    // millibits (the 4 magic bytes contribute ≤ ~0.45 bits over the
    // 68-byte blob), high-entropy docs stay above 3000, and the tile join's
    // pair count is LINEAR in docs (within-group pairs only — ~6 per
    // group of 4, no df^2 clique), all inside a wall-clock pathology
    // bound.
    val t0 = System.nanoTime()
    val d = docs(1000000L, 32)
    val shipped = expr("CASE WHEN doc_id % 11 = 0 THEN (doc_id + 1) % 3 ELSE doc_id % 3 END")
    val magicHex = element_at(
      array(lit("89504e47"), lit("fff14c80"), lit("000001ba")),
      (shipped + 1).cast("int"))
    val body = transform(sequence(lit(0L), lit(63L)), i =>
      lpad(lower(hex(
        when(pmod(col("doc_id"), lit(5)) === 0, pmod(col("doc_id") * 7, lit(256)))
          .otherwise(pmod(
            shiftright({
              val v = pmod(((col("doc_id") / 4).cast("bigint") * 2 +
                (i / 16).cast("bigint") % 2) * lit(40503L) +
                (pmod(i, lit(16)) + 1) * lit(104729L), lit(2147483647L))
              v * v
            }, 23),
            lit(256))))), 2, "0"))
    val blobs = d.select(col("doc_id"),
      unhex(concat(magicHex, array_join(body, ""))).as("content"))
    import graft.functions.HashExprs.log2Millis
    val ent = blobs
      .select(col("doc_id"), length(col("content")).cast("bigint").as("nb"),
        posexplode(graft.ext.MultimodalOps.byteHistCounts(col("content"), 16))
          .as(Seq("bin", "c")))
      .filter(col("c") > 0L)
      .withColumn("term", col("c") * (log2Millis(col("nb")) - log2Millis(col("c"))))
      .groupBy(col("doc_id"), col("nb"))
      .agg(sum(col("term")).as("ts"))
      .select(col("doc_id"), expr("ts div nb").as("h"))
    val flatCnt = ent.filter(pmod(col("doc_id"), lit(5)) === 0 && col("h") >= 600L).count()
    val lowHi = ent.filter(pmod(col("doc_id"), lit(5)) =!= 0 && col("h") < 3000L).count()
    assert(flatCnt == 0L, s"constant-body blobs must score under 600 millibits ($flatCnt violations)")
    // the 177-stride sawtooth guarantees 16 distinct bytes per tile
    // for EVERY seed — the routing split is total, no degenerate class
    assert(lowHi == 0L, s"sawtooth blobs must stay above 3000 millibits ($lowHi below)")
    // tile join WITH the mm_bin_tiles maxDf=8 cap engaged exactly as
    // the gated row engages it. (History: the first fixture formula's
    // tile content depended on seed only mod 256, collapsing 1M docs
    // into ~7,800-doc tile classes whose uncapped join ran 20x the
    // budget — this smoke is what caught it; the mid-square formula
    // makes tiles unique per seed, and the cap stays as the guard
    // real media needs anyway.)
    val dt = blobs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      .select(col("doc_id"),
        explode(array((0 to 3).map(t =>
          expr(s"hex(substring(content, ${5 + 16 * t}, 16))")): _*)).as("tile"))
      .distinct()
    val keep = dt.groupBy(col("tile")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= 8).select(col("tile"))
    val capped = dt.join(keep, "tile")
    val nPairs = capped.as("a").join(capped.as("b"),
        col("a.tile") === col("b.tile") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
    val secs = (System.nanoTime() - t0) / 1e9
    // 250k groups of 4; each group's 5th-doc exclusions leave ~3.2
    // members -> ~3-6 pairs per group: linear, never df^2
    assert(nPairs < 2500000L, s"tile-pair explosion: $nPairs")
    assert(nPairs > 500000L, s"planted tile structure missing: $nPairs")
    assert(secs < 150.0, f"1M-doc binary fixture pipeline took $secs%.1f s (budget 150 s)")
    info(f"1M blobs minted + entropy + tile join in $secs%.1f s, $nPairs tile pairs")
  }

  test("scale smoke: blocked Jaro-Winkler linkage over 1M generated docs") {
    // The dedup_entity_jw plan at 1M rows: first-token blocking
    // equi-join + codegen'd JW verify. The generator's first tokens
    // come from a small vocab, so blocks are large — exactly the
    // worst-case the blocking join must survive; planted near-dup
    // mentions (doc_id + 2M carries the same leading 24 chars) must
    // pair at jw = 1.0.
    val d = docs(1000000, 16)
    val planted = d.filter(col("doc_id") % 1000 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
    val m = d.unionAll(planted)
      .select(col("doc_id"), substring(col("text"), 1, 24).as("mention"))
      .withColumn("blk", split(col("mention"), " ").getItem(0))
    val a = m.select(col("doc_id").as("doc_a"), col("mention").as("ma"), col("blk"))
    val b = m.select(col("doc_id").as("doc_b"), col("mention").as("mb"), col("blk"))
    val t0 = System.nanoTime()
    val exact = a.join(b, Seq("blk"))
      .filter(col("doc_b") === col("doc_a") + 2000000L)
      .withColumn("jw", graft.functions.HashExprs.jaroWinkler(col("ma"), col("mb")))
      .filter(col("jw") === 1.0)
      .count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"1M-doc blocked JW linkage (planted-pair slice): $secs%.1f s, $exact pairs")
    assert(exact == 1000L, s"every planted mention must pair at jw=1.0, got $exact")
  }

  test("feeds the dedup kernels: exact dedup over generated corpus + planted copies") {
    val d = docs(2000, 8)
    val corpus = d.unionAll(d.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val groups = corpus
      .select(graft.ext.TextOps.fingerprint(col("text")).as("fp"), col("doc_id"))
      .groupBy(col("fp")).agg(count(lit(1)).as("n"))
    // every fingerprint appears exactly 2x (original + planted copy) —
    // modulo organic generator collisions, which must be rare
    val histo = groups.groupBy(col("n")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(histo.getOrElse(2L, 0L) >= 1900, s"histogram: $histo")
  }
}
