package graft.queries

import graft.ext.TextOps
import graft.ext.TextOps._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables._

/** Text-analysis suite over the `documents` table: quality stats,
  * polynomial fingerprinting, heuristic language ID, corpus token
  * frequencies. All pure column expressions (codegen, no UDF).
  */
object TextQueries {

  /** Per-document quality stats: token count, mean token length,
    * stopword ratio, distinct-token ratio (lexical diversity). */
  def textStats(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = load(spark, sfDir, "documents")
    val toks = tokens(col("text"))
    docs.select(
      col("doc_id"),
      col("n_chars"),
      tokenCount(col("text")).as("n_tokens"),
      avgTokenLen(toks).as("avg_token_len"),
      wordRatio(toks, Seq("the", "a")).as("stop_ratio"),
      (size(array_distinct(toks)).cast("bigint") / size(toks).cast("bigint")).as("distinct_ratio"))
  }

  /** Content-addressable rolling-hash fingerprint per document. */
  def textFingerprint(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "documents")
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))

  /** Heuristic language ID (marker-token argmax) vs. the labeled lang. */
  def textLangId(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = load(spark, sfDir, "documents")
    docs.select(col("doc_id"), col("lang"),
      langId(tokens(col("text"))).as("pred_lang"))
  }

  /** Corpus-wide token frequency, top 20 (count desc, token asc) —
    * the canonical map-side-combine wordcount: explode shuffles only
    * (token, partial count) pairs after partial aggregation. */
  def textTokenFreq(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = load(spark, sfDir, "documents")
    val freq = docs.select(explode(tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    freq.withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("token"))).cast("bigint"))
      .filter(col("rank") <= 20)
      .select(col("rank"), col("token"), col("cnt"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_stats" -> (textStats _),
    "text_fingerprint" -> (textFingerprint _),
    "text_lang_id" -> (textLangId _),
    "text_token_freq" -> (textTokenFreq _))

  private val toksSql = "list_filter(string_split(text, ' '), t -> t <> '')"

  private def markerSql(ws: Seq[String]): String =
    s"CAST(len(list_filter($toksSql, t -> t IN (${ws.map(w => s"'$w'").mkString(",")}))) AS BIGINT)"

  private val langCase: String = {
    val whens = TextOps.langMarkers
      .map { case (l, _) => s"WHEN score_$l = best AND score_$l > 0 THEN '$l'" }.mkString(" ")
    s"CASE $whens ELSE 'und' END"
  }

  val oracleSql: Map[String, String] = Map(
    "text_stats" ->
      s"""SELECT doc_id, n_chars,
         |  CAST(len($toksSql) AS BIGINT) AS n_tokens,
         |  CAST(list_sum(list_transform($toksSql, t -> CAST(length(t) AS BIGINT))) AS BIGINT)
         |    / CAST(len($toksSql) AS BIGINT) AS avg_token_len,
         |  CAST(len(list_filter($toksSql, t -> t IN ('the','a'))) AS BIGINT)
         |    / CAST(len($toksSql) AS BIGINT) AS stop_ratio,
         |  CAST(len(list_distinct($toksSql)) AS BIGINT)
         |    / CAST(len($toksSql) AS BIGINT) AS distinct_ratio
         |FROM documents""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(text, ''), ch -> CAST(unicode(ch) AS BIGINT))),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS fp
        |FROM documents""".stripMargin,
    "text_lang_id" ->
      s"""SELECT doc_id, lang, $langCase AS pred_lang
         |FROM (SELECT *,
         |        GREATEST(${TextOps.langMarkers.map { case (l, _) => s"score_$l" }.mkString(", ")}) AS best
         |      FROM (SELECT doc_id, lang,
         |              ${TextOps.langMarkers.map { case (l, ws) => s"${markerSql(ws)} AS score_$l" }.mkString(", ")}
         |            FROM documents))""".stripMargin,
    "text_token_freq" ->
      """SELECT rank, token, cnt FROM (
        |  SELECT token, cnt,
        |    CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS BIGINT) AS rank
        |  FROM (SELECT token, COUNT(*) AS cnt
        |        FROM (SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
        |              FROM documents)
        |        GROUP BY token)
        |) WHERE rank <= 20""".stripMargin)
}
