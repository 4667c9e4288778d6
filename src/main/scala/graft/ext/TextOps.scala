package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column library for large-scale training-data pipelines
  * (extension beyond the reference surface — SURVEY.md §2.2). Everything
  * here is pure `org.apache.spark.sql.functions` composition: codegen'd,
  * whole-stage-fusable, no UDFs — the shape that survives a 100 TB scan.
  *
  * Determinism contract: every function is bit-reproducible and has an
  * exact DuckDB spelling (integer counts, int/int IEEE division, or the
  * left-fold polynomial hash), so results hash-match the oracle.
  */
object TextOps {

  /** Split on single spaces, dropping empty tokens (leading/trailing/
    * double spaces). DuckDB: list_filter(string_split(c,' '), t -> t <> ''). */
  def tokens(c: Column): Column =
    filter(split(c, " "), t => t =!= lit(""))

  /** Token count as BIGINT (DuckDB len() is BIGINT; Spark size() is INT). */
  def tokenCount(c: Column): Column = size(tokens(c)).cast("bigint")

  /** Mean token length: exact integer sum / integer count → one IEEE
    * division, deterministic across engines. */
  def avgTokenLen(toks: Column): Column =
    aggregate(transform(toks, t => length(t).cast("bigint")), lit(0L), (a, b) => a + b) /
      size(toks).cast("bigint")

  /** Fraction of tokens belonging to `words` (e.g. stopwords). */
  def wordRatio(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*))).cast("bigint") / size(toks).cast("bigint")

  /** Count of tokens belonging to `words`. */
  def wordCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*))).cast("bigint")

  /** Rolling polynomial document fingerprint over characters:
    * fold(h = (h*31 + codepoint) mod 1e9+7). A content-addressable id
    * that both engines compute identically (left fold over codepoints,
    * single-pass native expression — see graft.functions.HashExprs).
    * DuckDB: list_reduce(list_prepend(0, list_transform(string_split(c,''),
    *   ch -> CAST(unicode(ch) AS BIGINT))), (a,b) -> (a*31+b) % 1000000007).
    */
  def fingerprint(c: Column): Column = graft.functions.HashExprs.fingerprint(c)

  /** Count-min-sketch token frequencies — the mergeable heavy-hitter
    * sketch completing the approximate family (HLL distincts, GK
    * quantiles, CMS counts): per-partition sketches of width ⌈2/eps⌉
    * (Spark's CountMinSketchImpl sizing, not stream-lib's ⌈e/eps⌉)
    * merge associatively map-side, so the exchange carries ONE
    * fixed-size sketch per task instead of the token vocabulary — the
    * 100 TB trade against the exact [[graft.queries.TextQueries
    * .textTokenFreq]] wordcount. Deterministic (fixed seed). Returns
    * the merged sketch; estimates are one-sided: est ≥ true, and
    * est ≤ true + eps·N with probability `confidence` (the spec bounds
    * both on the real corpus against exact counts). */
  def tokenFreqSketch(docs: org.apache.spark.sql.DataFrame,
      eps: Double = 0.0001, confidence: Double = 0.99)
      : org.apache.spark.util.sketch.CountMinSketch = {
    val bytes = docs.select(explode(tokens(col("text"))).as("token"))
      .agg(expr(s"count_min_sketch(token, ${eps}d, ${confidence}d, 42)").as("sk"))
      .head().getAs[Array[Byte]](0)
    org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
  }

  /** Word k-gram shingles over a token array (1-based element access in
    * both engines). The unit of near-duplicate detection. Guarded for
    * docs shorter than k tokens (Spark's sequence(1, 0) would generate a
    * DESCENDING range, not an empty one — DuckDB's range(1, 1) is empty). */
  def shingles(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + j)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Language marker-word lexicons for the heuristic language ID.
    * (The driver's synthetic corpus shares one vocabulary across its
    * `lang` labels, so these markers are drawn from that vocabulary to
    * produce a varied, deterministic classification — the operator shape
    * is what matters: per-language token-hit scoring + argmax.) */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("group", "key", "hash", "merge"),
    "en" -> Seq("the", "a", "data", "table"),
    "es" -> Seq("line", "row", "column", "value"),
    "fr" -> Seq("sort", "filter", "join", "window"),
    "zh" -> Seq("spark", "query", "stream", "batch"))

  /** Argmax over marker-hit counts with deterministic first-wins
    * tie-break in lexicographic language order (de,en,es,fr,zh). */
  def langId(toks: Column): Column = {
    val scores = langMarkers.map { case (lang, ws) => lang -> wordCount(toks, ws) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((lang, s), els) => when(s === best && s > 0, lang).otherwise(els) }
  }

  /** Per-domain admission cap — the C4/Gopher-style "at most k docs per
    * domain" guard against a single crawl host dominating the training
    * mix. Keeps the k best rows per `domainCol` under the deterministic
    * priority `ord` (pass a tie-breaking column last — a non-total
    * order would make admission nondeterministic across runs), with the
    * rank exposed as `rk`. Scale: a rank-filter window, but Spark plans
    * `rank <= k` as WindowGroupLimit — each map task pre-trims to its
    * local top-k per domain BEFORE the exchange, so the shuffle carries
    * ≤ k·|domains| rows per task, not the corpus (PlanSpec-pinned).
    * A pathological single domain costs one k-bounded heap per task —
    * never a full-domain sort. */
  def perDomainCap(df: org.apache.spark.sql.DataFrame, domainCol: String,
      k: Int, ord: Seq[Column]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("rk", row_number().over(
        Window.partitionBy(col(domainCol)).orderBy(ord: _*)).cast("bigint"))
      .filter(col("rk") <= k)
  }

  /** FULL BPE tokenizer-training loop (Sennrich et al. 2016) — the
    * library composition of the oracle-pinned single step
    * (graft.queries.TextQueries.textBpeMergeStep), the
    * [[SimOps.kmeans]]-vs-`sim_kmeans` pattern: the corpus collapses
    * ONCE to its distinct-word vocab weighted by counts; every merge
    * round is then vocab-sized work — count adjacent symbol pairs
    * weighted by word count (map-side combined), take the modal pair
    * (count desc, pair asc — a 1-row TakeOrdered, the only driver
    * materialization per round beside the 1-row fertility fold), and
    * rewrite every word's representation with the non-overlapping
    * left-to-right `replace`. Each round's vocab is localCheckpoint'ed
    * and the superseded round's blocks are dropped (the
    * [[DedupOps.dupClusters]] cache discipline), so lineage stays flat
    * at any merge count. Stops early when no adjacent pair remains
    * (every word fused to one symbol).
    *
    * Returns the MERGE TABLE — the trained tokenizer artifact:
    * (step, merged_pair, pcount, fertility_milli), where
    * fertility_milli = 1000·Σ cnt·|symbols| div Σ cnt AFTER applying
    * that step's merge — the curve a tokenizer team reads to pick
    * vocab size (where fertility flattens, merges stop paying).
    * 100 TB posture: the corpus is scanned exactly once (wordcount);
    * rounds touch only the vocab relation; the merge table itself is
    * `merges` rows on the driver — the model, not data. */
  def bpeTrain(docs: org.apache.spark.sql.DataFrame, textCol: String,
      merges: Int): org.apache.spark.sql.DataFrame = {
    require(merges >= 1, s"merges must be >= 1, got $merges")
    val spark = docs.sparkSession
    import spark.implicits._
    val sc = spark.sparkContext
    def ckptId(df: org.apache.spark.sql.DataFrame): Option[Int] =
      df.queryExecution.analyzed.collectFirst {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
      }
    def drop(id: Option[Int]): Unit =
      id.foreach(i => sc.getPersistentRDDs.get(i).foreach(_.unpersist(blocking = false)))
    var reps = docs.select(explode(tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(col("cnt"), array_join(split(col("w"), ""), " ").as("rep"))
      .localCheckpoint()
    var cur = ckptId(reps)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long, Long)]
    var step = 1L
    var exhausted = false
    while (step <= merges && !exhausted) {
      val syms = split(col("rep"), " ")
      val pairsArr = zip_with(
        slice(syms, lit(1), size(syms) - 1), slice(syms, lit(2), size(syms) - 1),
        (a, b) => concat(a, lit(" "), b))
      val top = reps.select(col("cnt"), explode(pairsArr).as("pair"))
        .groupBy(col("pair")).agg(sum(col("cnt")).as("pcount"))
        .orderBy(col("pcount").desc, col("pair").asc).limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val pair = top(0).getString(0)
        val pcount = top(0).getLong(1)
        // lit()-bound arguments (not string-spliced SQL): corpus tokens
        // may contain quotes/backslashes.
        val next = reps.select(col("cnt"),
            call_function("replace", col("rep"), lit(pair),
              lit(pair.replace(" ", ""))).as("rep"))
          .localCheckpoint()
        val nid = ckptId(next)
        drop(cur)
        reps = next
        cur = nid
        val fert = reps
          .agg(expr("(1000 * sum(cnt * size(split(rep, ' ')))) div sum(cnt)"))
          .head().getLong(0)
        out += ((step, pair, pcount, fert))
        step += 1
      }
    }
    drop(cur) // the merge table is driver-side; the final vocab is scratch
    out.toSeq.toDF("step", "merged_pair", "pcount", "fertility_milli")
  }
}
