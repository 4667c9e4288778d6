package graft

import graft.ext.SimOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ANN quality: recall of the LSH paths against the exact top-k ground
  * truth, and the multi-probe recall dominance property.
  */
class SimRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  private def topkSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, vs) => q -> vs.map(_._2).toSet }

  test("multi-probe LSH recall >= single-probe recall; both nonzero") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val exact = topkSet(SimOps.topkBrute(e, q, 10))
    val single = topkSet(SimOps.topkLsh(e, q, 10, 4))
    val multi = topkSet(SimOps.topkLshMultiProbe(e, q, 10, 4))
    def recall(approx: Map[Long, Set[Long]]): Double = {
      val hits = exact.map { case (qid, truth) =>
        approx.getOrElse(qid, Set.empty).count(truth.contains).toDouble / truth.size
      }
      hits.sum / hits.size
    }
    val rs = recall(single)
    val rm = recall(multi)
    assert(rs > 0.0, "single-probe must find some true neighbors")
    assert(rm >= rs, f"multi-probe recall $rm%.2f must dominate single-probe $rs%.2f")
    // Floor calibrated to HONEST (decorrelated) hyperplanes: 5 probes
    // over 2^4 near-uniform buckets reach ~5/16 of the corpus plus the
    // angle-correlation bonus (~0.48 measured on this table). The old
    // linear plane hash produced near-duplicate planes whose collapsed
    // buckets inflated recall past 0.5 — skew masquerading as quality.
    assert(rm >= 0.4, f"multi-probe recall too low: $rm%.2f")
  }

  test("knnGraph: maxBucket drops hot buckets whole; capped edges are a subset") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    def edges(maxBucket: Int) =
      SimOps.knnGraph(e, k = 3, bits = 4, maxBucket = maxBucket)
        .select(col("vec_id"), col("nbr_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = edges(0)
    // 500 vectors over 2^4 buckets: pigeonhole guarantees a bucket of
    // ≥ 32 members, so a 25-cap always binds somewhere
    val capped = edges(25)
    val uncappedByBigLimit = edges(1000000)
    assert(full.nonEmpty)
    // subset holds BECAUSE buckets partition the corpus: a surviving
    // vector's candidate set (its bucket-mates) is unchanged by the
    // cap, so its top-k is identical; a dropped vector loses all edges.
    // (In banded LSH a cap can PROMOTE lower-ranked candidates — not here.)
    assert(capped.subsetOf(full), "cap must only REMOVE edges, never invent them")
    assert(capped.size < full.size, "a 25-cap must drop at least one hot bucket here")
    assert(uncappedByBigLimit == full, "a never-binding cap must be a no-op")
  }

  test("IVF search: probing all centroids equals exact; fewer probes still finds neighbors") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val corpus = e.select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val cents = SimOps.labelCentroids(e, "label")
    val nCents = cents.count().toInt
    val exact = topkSet(SimOps.topkBrute(corpus, q, 10))
    // nprobe = all centroids → every posting list scanned → exact result
    val full = topkSet(SimOps.topkIvf(corpus, q, cents, 10, nCents))
    assert(full == exact, "nprobe=all must recover the exact top-k")
    // nprobe = 2: random labels carry no cluster structure, so recall is
    // partial — require it nonzero and bounded work
    val probed = topkSet(SimOps.topkIvf(corpus, q, cents, 10, 2))
    val hits = exact.map { case (qid, truth) =>
      probed.getOrElse(qid, Set.empty).count(truth.contains).toDouble / truth.size }
    assert(hits.sum / hits.size > 0.0)
  }

  test("kmeans: Lloyd objective non-decreasing per round; deterministic; partitions the corpus") {
    // Spherical k-means monotonicity: re-centering (decimal-exact mean
    // direction) then re-assigning can never lower the summed cosine.
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
    def objective(iters: Int): Double =
      graft.ext.SimOps.kmeans(e, 8, iters)
        .agg(org.apache.spark.sql.functions.sum("cos")).head().getDouble(0)
    val o = (1 to 3).map(objective)
    assert(o(1) >= o(0) - 1e-9 && o(2) >= o(1) - 1e-9, s"objective regressed: $o")
    assert(objective(2) == o(1), "same seeds + same data must reproduce exactly")
    val a = graft.ext.SimOps.kmeans(e, 8, 2)
    assert(a.count() == e.count(), "every vector assigned exactly once")
    assert(a.select("c_id").distinct().count() <= 8)
  }

  test("int8 quantization round-trips within half a quantization step per element") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val rows = graft.queries.SimQueries.quantized(e)
      .join(e.select(col("vec_id"), col("embedding")), "vec_id")
      .select(col("scale"), col("q"), col("embedding"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scale = r.getDouble(0)
      val q = r.getSeq[Int](1)
      val v = r.getSeq[Float](2)
      assert(q.length == v.length && scale > 0.0)
      assert(q.forall(x => x >= -127 && x <= 127), "int8 range")
      // dequantized error bounded by half a step (rounding), per element
      q.zip(v).foreach { case (qi, vi) =>
        val deq = qi / scale
        assert(math.abs(deq - vi) <= 0.5 / scale + 1e-9,
          s"dequant error ${math.abs(deq - vi)} exceeds half-step ${0.5 / scale}")
      }
    }
  }

  test("PQ ADC search: identical vectors share codes, twins retrieved at the self distance") {
    // Encode corpus + planted exact copies; ADC distance depends ONLY
    // on the codes, so a vector and its copy must score identically
    // against every query — the twin always ranks alongside the self
    // match in the approximate top-k.
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val corpus = e.unionAll(
      e.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
    val cb = SimOps.pqSeedCodebook(e, kCodes = 4, m = 8, sub = 8)
    val codes = SimOps.pqEncode(corpus, cb, m = 8, sub = 8)
    // every vector gets exactly M code rows
    val bad = codes.groupBy(col("vec_id")).count()
      .filter(col("count") =!= 8).count()
    assert(bad == 0, s"$bad vectors missing subspace codes")
    val queries = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val top = SimOps.pqTopk(codes, queries, cb, k = 10, m = 8, sub = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byQ = top.groupBy(_._1)
    queries.select(col("q_id")).collect().map(_.getLong(0)).foreach { q =>
      val rows = byQ.getOrElse(q, Array.empty)
      val self = rows.find(_._2 == q)
      val twin = rows.find(_._2 == q + 1000000L)
      assert(self.isDefined && twin.isDefined,
        s"query $q: self/twin missing from approximate top-10: ${rows.mkString(",")}")
      assert(self.get._3 == twin.get._3,
        s"query $q: identical codes must give identical ADC distance")
    }
  }

  test("gramMatrix: sums match a driver-side exact computation on a toy corpus") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 2.0f, 3.0f)),
      (1L, Array(-1.0f, 0.5f, 2.0f)),
      (2L, Array(0.0f, -2.0f, 1.0f)))
    val df = vecs.toDF("vec_id", "embedding")
    val got = SimOps.gramMatrix(df, "embedding", 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    for (i <- 0 until 3; j <- i until 3) {
      val want = vecs.map { case (_, v) => v(i).toDouble * v(j).toDouble }.sum
      val (n, s) = got((i.toLong, j.toLong))
      assert(n == 3L, s"cell ($i,$j) count")
      assert(math.abs(s - want) < 1e-6, s"cell ($i,$j): got $s want $want")
    }
    assert(got.size == 6, "upper triangle only: d(d+1)/2 cells")
  }

  test("incremental IVF admission: planted dups flagged with their original, novels admitted") {
    val got = SparkEntry.queries("sim_incremental_ivf")(spark, "/root/testdata/sf0.001")
      .collect()
    val dups = got.filter(_.getAs[Long]("batch_id") < 2000000L)
    val novels = got.filter(_.getAs[Long]("batch_id") >= 2000000L)
    assert(dups.nonEmpty && novels.nonEmpty)
    dups.foreach { r =>
      assert(r.getAs[Boolean]("is_dup"), s"planted dup missed: $r")
      assert(r.getAs[Long]("dup_of") == r.getAs[Long]("batch_id") - 1000000L,
        s"dup must match its original, not a neighbor: $r")
    }
    // reversed embeddings are unrelated directions: none may collide at 0.99
    novels.foreach { r => assert(!r.getAs[Boolean]("is_dup"), s"novel misflagged: $r") }
    // nprobe=1 screen: candidates checked is the cell size, well under the corpus
    val n = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").count()
    got.foreach { r => assert(r.getAs[Long]("n_cand") < n, s"cell screen wider than corpus: $r") }
  }
}
