package graft

import graft.functions.HashExprs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Gopher rule bundle's moving parts, beyond the oracle gate:
  * the linear modal-n-gram kernel against a naive Scala oracle, and
  * the duplicate-line rule — quiet on the natural synthetic corpus
  * (every doc's 5-token pseudo-lines are distinct at sf0.01) — fired
  * by a planted degenerate document, so the rule's trip wire is
  * actually exercised somewhere in the suite.
  */
class GopherSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def naiveModal(toks: Seq[String], k: Int): Long =
    if (toks.length < k) 0L
    else toks.sliding(k).toSeq.groupBy(_.mkString(" ")).values.map(_.size).max.toLong

  test("modalNgramCount: linear kernel equals the naive sliding-count oracle") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val vocab = Vector("a", "b", "cc", "ddd", "spam", "x")
    val docs = (0 until 40).map { i =>
      (i.toLong, Seq.fill(rng.nextInt(30))(vocab(rng.nextInt(vocab.size))))
    } :+ (100L, Seq.empty[String]) :+ (101L, Seq("one"))
    val df = docs.toDF("id", "tk")
    for (k <- Seq(1, 2, 3)) {
      val got = df.select(col("id"), HashExprs.modalNgramCount(col("tk"), k).as("m"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      docs.foreach { case (id, tk) =>
        assert(got(id) == naiveModal(tk, k), s"k=$k id=$id tokens=$tk")
      }
    }
  }

  test("duplicate-line rule trips on a planted degenerate doc, passes a clean one") {
    import spark.implicits._
    // degenerate: the same 5-token line 4x + 2 distinct lines → dup
    // fraction 3/6 = 0.5 > 0.30; clean: 6 distinct lines → 0
    val spamLine = "buy now click here today"
    val clean = (1 to 30).map(i => s"w$i").mkString(" ")
    val degen = (Seq.fill(4)(spamLine) ++ Seq("one two three four five",
      "six seven eight nine ten")).mkString(" ")
    val df = Seq((0L, degen), (1L, clean)).toDF("doc_id", "text")
    val lines = transform(
      sequence(lit(0), ((size(split(col("text"), " ")) - 1) / 5).cast("int")),
      i => array_join(slice(split(col("text"), " "), i * lit(5) + lit(1), lit(5)), " "))
    val sig = df.select(col("doc_id"), size(lines).cast("bigint").as("n_lines"),
        (size(lines) - size(array_distinct(lines))).cast("bigint").as("dup_lines"))
      .withColumn("ok_dupline", lit(10L) * col("dup_lines") <= lit(3L) * col("n_lines"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(sig(0L) == ((6L, 3L, false)), s"degenerate doc must trip: ${sig(0L)}")
    assert(sig(1L) == ((6L, 0L, true)), s"clean doc must pass: ${sig(1L)}")
  }

  test("curate_gopher on sf0.001: rule bands are live, flags internally consistent") {
    val got = SparkEntry.queries("curate_gopher")(spark, "/root/testdata/sf0.001").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val pass = r.getAs[Boolean]("pass")
      val flags = Seq("ok_count", "ok_mwl", "ok_stop", "ok_dupline", "ok_bigram")
        .map(r.getAs[Boolean])
      assert(pass == flags.forall(identity), s"pass must be the AND of the rules: $r")
    }
    assert(got.exists(!_.getAs[Boolean]("pass")), "some doc must fail somewhere")
    assert(got.exists(_.getAs[Boolean]("pass")), "some doc must pass")
  }
}
