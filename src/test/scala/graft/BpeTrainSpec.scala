package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The full BPE training loop ([[graft.ext.TextOps.bpeTrain]]):
  * hand-computed merge sequence on a pocket corpus (the oracle-gated
  * `text_bpe_train` row covers corpus scale; here the EXPECTED merges
  * are derivable on paper), early termination when the vocab is fully
  * fused, and a 1M-doc generated-corpus smoke.
  */
class BpeTrainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hand-computed merges: pair argmax, rewrite, fertility, early stop") {
    // vocab: ab ×3, abc ×2.
    //   round 1: pairs  "a b"=5, "b c"=2  → merge "a b" (5)
    //            reps   ab ×3, "ab c" ×2 → fertility (3·1+2·2)·1000/5 = 1400
    //   round 2: pairs  "ab c"=2          → merge "ab c" (2)
    //            reps   ab ×3, abc ×2     → fertility 5·1000/5 = 1000
    //   round 3: no adjacent pair left    → STOP (merges=5 requested)
    val docs = Seq("ab ab ab", "abc abc").toDF("text")
    val got = graft.ext.TextOps.bpeTrain(docs, "text", merges = 5)
      .orderBy(col("step"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == Seq(
      (1L, "a b", 5L, 1400L),
      (2L, "ab c", 2L, 1000L)),
      s"merge table mismatch: $got")
  }

  test("ties break to the lexicographically smaller pair") {
    // "xy" ×2 and "pq" ×2: both pairs count 2 — "p q" < "x y" must win
    // round 1 (the count-desc, pair-asc order the single-step oracle
    // pins).
    val docs = Seq("xy xy pq pq").toDF("text")
    val got = graft.ext.TextOps.bpeTrain(docs, "text", merges = 1).collect()
    assert(got.length == 1 && got(0).getString(1) == "p q",
      s"tie must break to 'p q': ${got.mkString(",")}")
  }

  test("scale smoke: 2 merges over 1M generated docs") {
    // Corpus scanned once (wordcount); rounds are vocab-sized. The
    // smoke pins completion + sanity (positive counts, fertility
    // decreasing) — exact values are the oracle row's job.
    val d = spark.read.format("graft-docs")
      .option("rows", 1000000L).option("partitions", 32).load()
    val t = graft.ext.TextOps.bpeTrain(d, "text", merges = 2)
      .orderBy(col("step")).collect()
    assert(t.length == 2)
    assert(t.forall(_.getLong(2) > 0L), "merge counts must be positive")
    assert(t(1).getLong(3) < t(0).getLong(3),
      "fertility must strictly decrease while merges apply")
  }

  test("scale smoke: held-out application over 1M generated docs") {
    // The text_bpe_heldout shape at generator scale: train 2 merges on
    // the even half, apply to the odd half as one collapsed projection
    // computing all per-step folds in a single vocab-sized aggregate.
    // Pins: completion, held-out fertility strictly decreasing while
    // merges apply (the generator's halves are distribution-identical,
    // so trained merges must generalize), and zero OOV characters
    // (same generator alphabet on both halves).
    val d = spark.read.format("graft-docs")
      .option("rows", 1000000L).option("partitions", 32).load()
    val train = d.filter(col("doc_id") % 2 === 0)
    val held = d.filter(col("doc_id") % 2 === 1)
    val pairs = graft.ext.TextOps.bpeTrain(train, "text", merges = 2)
      .orderBy(col("step")).collect().map(_.getString(1)).toSeq
    assert(pairs.length == 2)
    val hw = held
      .select(explode(graft.ext.TextOps.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val base = array_join(split(col("w"), ""), " ")
    val reps = pairs.scanLeft(base: org.apache.spark.sql.Column)((r, p) =>
      call_function("replace", r, lit(p), lit(p.replace(" ", ""))))
    val symCols = reps.zipWithIndex.map { case (r, k) =>
      sum(col("cnt") * size(split(r, " "))).as(s"m$k") }
    val agg = hw.agg(symCols.head, symCols.tail :+ sum(col("cnt")).as("tot"): _*).head()
    val ferts = reps.indices.map(k => 1000L * agg.getAs[Long](s"m$k") / agg.getAs[Long]("tot"))
    assert(ferts(1) < ferts(0) && ferts(2) < ferts(1),
      s"held-out fertility must strictly decrease: $ferts")
    val trainChars = train
      .select(explode(graft.ext.TextOps.tokens(col("text"))).as("w"))
      .select(explode(split(col("w"), "")).as("c")).distinct()
    val oov = hw.select(explode(split(col("w"), "")).as("c")).distinct()
      .join(trainChars, Seq("c"), "left_anti").count()
    assert(oov == 0L, s"generator halves share an alphabet; got $oov OOV chars")
  }
}
