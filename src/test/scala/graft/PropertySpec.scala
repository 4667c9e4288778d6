package graft

import graft.core.GraftImplicits._
import org.apache.spark.sql.SparkSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based operator tests vs Scala-collection oracles — the
  * ScalaCheck mirror of the reference's Hypothesis suite
  * (pypeln/process/api/map_process_test.py:14-42: random int lists,
  * MAX_EXAMPLES=10, pipeline result == plain map/filter/comprehension).
  * Unordered comparisons are multiset (sorted) — pypeln's concurrent
  * backends make the same guarantee (process/api/map.py:85); `ordered`
  * restores exact sequence order.
  */
class PropertySpec extends AnyFunSuite {
  private lazy implicit val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private val MaxExamples = 10
  private val listGen: Gen[List[Int]] =
    Gen.listOf(Gen.chooseNum(-1000000, 1000000))

  /** Deterministic sample stream: seed 0..MAX_EXAMPLES-1, sizes 0..~60. */
  private def examples: Seq[List[Int]] =
    (0 until MaxExamples).map { i =>
      listGen(Gen.Parameters.default.withSize(i * 7), Seed(i.toLong)).getOrElse(Nil)
    }

  test("prop: map identity and square equal Seq oracle (map_process_test.py:14-42)") {
    examples.foreach { xs =>
      assert(xs.toStage.map(identity[Int]).collectValues().sorted == xs.sorted)
      assert(xs.toStage.map(x => x * x).collectValues().sorted == xs.map(x => x * x).sorted)
    }
  }

  test("prop: filter equals Seq oracle") {
    examples.foreach { xs =>
      assert(xs.toStage.filter(_ % 3 == 0).collectValues().sorted ==
        xs.filter(_ % 3 == 0).sorted)
    }
  }

  test("prop: flatMap variable expansion equals Seq oracle") {
    val f = (x: Int) => List.fill(math.abs(x) % 3)(x)
    examples.foreach { xs =>
      assert(xs.toStage.flatMap(f).collectValues().sorted == xs.flatMap(f).sorted)
    }
  }

  test("prop: concat equals list concatenation (multiset)") {
    examples.grouped(2).foreach {
      case Seq(a, b) =>
        assert(a.toStage.concat(b.toStage).collectValues().sorted == (a ++ b).sorted)
      case _ => ()
    }
  }

  test("prop: map |> filter |> ordered equals the sequential pipeline exactly") {
    examples.foreach { xs =>
      val got = xs.toStage.map(_ * 2 + 1).filter(_ % 7 != 0).ordered.collectValues()
      assert(got == xs.map(_ * 2 + 1).filter(_ % 7 != 0))
    }
  }

  test("prop: mapEx under worker fan-out preserves the multiset") {
    examples.foreach { xs =>
      val got = xs.toStage.mapEx[Null, Int]((x, _) => x - 1, workers = 5)
        .collectValues().sorted
      assert(got == xs.map(_ - 1).sorted)
    }
  }

  test("prop: toIterable drains every element") {
    examples.foreach { xs =>
      assert(xs.toStage.toIterable.toList.sorted == xs.sorted)
    }
  }

  test("prop: banded editWithin == full-DP levenshtein <= k (incl. non-ASCII codepoints)") {
    import org.apache.spark.unsafe.types.UTF8String
    // reference: classic O(n·m) DP over CODEPOINTS (Spark's levenshtein
    // semantics; the banded kernel must agree for every k)
    def lev(s: String, t: String): Int = {
      val a = s.codePoints().toArray; val b = t.codePoints().toArray
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prevDiag = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val tmp = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prevDiag + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prevDiag = tmp
        }
      }
      dp(a.length)
    }
    val rng = new scala.util.Random(42)
    // element-wise (not charAt) so the non-BMP 🎉 never splits into a
    // lone surrogate; tiny alphabet forces collisions
    val alphabet = Array("a", "b", " ", "c", "🎉", "é")
    def randStr(maxLen: Int): String =
      Seq.fill(rng.nextInt(maxLen + 1))(alphabet(rng.nextInt(alphabet.length))).mkString
    for (_ <- 0 until 300) {
      val (s, t) = (randStr(25), randStr(25))
      val k = rng.nextInt(12)
      val expected = lev(s, t) <= k
      val got = graft.functions.HashKernels.editWithin(
        UTF8String.fromString(s), UTF8String.fromString(t), k)
      assert(got == expected,
        s"editWithin('$s','$t',$k)=$got but lev=${lev(s, t)}")
    }
  }

  test("jaroWinkler matches DuckDB jaro_winkler_similarity on pinned pairs") {
    import org.apache.spark.unsafe.types.UTF8String
    def jw(a: String, b: String): Double = graft.functions.HashKernels
      .jaroWinkler(UTF8String.fromString(a), UTF8String.fromString(b))
    // exact doubles read off DuckDB 1.0.0 (the oracle engine) — the
    // kernel's contract is BIT equality, so == on doubles is the point
    assert(jw("martha", "marhta") == 0.9611111111111111) // 2 transpositions + prefix 3
    assert(jw("dixon", "dicksonx") == 0.8133333333333332) // unequal lengths
    assert(jw("abcdef", "abczzz") == 0.6666666666666666) // jaro < 0.7 → NO winkler boost
    assert(jw("jellyfish", "smellyfish") == 0.8962962962962964) // boost, prefix 0
    assert(jw("ab", "ba") == 0.0) // window 0: adjacent transposition can't match
    assert(jw("a", "a") == 1.0)
    assert(jw("", "x") == 0.0)
    assert(jw("", "") == 0.0) // DuckDB quirk: both-empty is 0, not 1
    assert(jw("key agg row", "key agg row") == 1.0)
    // prefix boost caps at 4 shared chars: identical 10-char prefix on
    // differing tails must use p=4, not p=10
    val j = jw("abcdefghij", "abcdefghiX")
    assert(j > 0.9 && j < 1.0)
  }

  test("prop: winnowMins guarantee — shared substring >= w+k-1 yields a common fingerprint") {
    import org.apache.spark.unsafe.types.UTF8String
    val (k, w) = (5, 4)
    def selected(s: String): Set[Long] = {
      val fps = graft.functions.HashKernels.charShingleFps(UTF8String.fromString(s), k)
      val mins = graft.functions.HashKernels.winnowMins(fps, w)
      (0 until mins.numElements()).map(mins.getLong).toSet
    }
    val rng = new scala.util.Random(7)
    val alphabet = "abc d"
    def randStr(len: Int): String =
      Seq.fill(len)(alphabet(rng.nextInt(alphabet.length))).mkString
    // the winnowing theorem: any match of length >= w + k - 1 is caught
    val span = randStr(w + k - 1)
    for (_ <- 0 until 50) {
      val s1 = randStr(rng.nextInt(20)) + span + randStr(rng.nextInt(20))
      val s2 = randStr(rng.nextInt(20)) + span + randStr(rng.nextInt(20))
      assert(selected(s1).intersect(selected(s2)).nonEmpty,
        s"shared ${w + k - 1}-char span must yield a common selected fp: '$s1' vs '$s2'")
    }
    // density: selection keeps far fewer than all n-k+1 fingerprints
    val long = randStr(400)
    val nAll = graft.functions.HashKernels
      .charShingleFps(UTF8String.fromString(long), k).numElements()
    assert(selected(long).size < nAll / 2, s"selection must thin the fps (${selected(long).size}/$nAll)")
    // edge cases: fewer fps than the window -> one global min; empty -> empty
    assert(selected("abcde").size == 1)
    assert(selected("ab").isEmpty)
  }

  test("prop: zInterleave de-interleaves back to its inputs and preserves box order") {
    // Roundtrip: extracting even/odd bits of z recovers (a, b) exactly —
    // the bijectivity that makes z-range partitioning lossless. Plus the
    // locality property q_zorder relies on: within a power-of-2 aligned
    // box, z is minimized at the box's corner (min-a, min-b).
    def deinterleave(z: Long): (Long, Long) = {
      var (a, b) = (0L, 0L)
      for (i <- 0 until 16) {
        a |= ((z >>> (2 * i)) & 1L) << i
        b |= ((z >>> (2 * i + 1)) & 1L) << i
      }
      (a, b)
    }
    val rng = new scala.util.Random(7)
    for (_ <- 0 until 500) {
      val a = rng.nextInt(1 << 16).toLong
      val b = rng.nextInt(1 << 16).toLong
      val z = graft.functions.HashKernels.zInterleave(a, b, 16)
      assert(deinterleave(z) == (a, b), s"roundtrip failed for ($a, $b) -> $z")
      // corner dominance: clearing low bits of both dims never raises z
      val mask = ~((1L << rng.nextInt(8)) - 1L)
      assert(graft.functions.HashKernels.zInterleave(a & mask, b & mask, 16) <= z)
    }
  }

  test("prop: charEntropyBound equals a reference fold; bound laws hold on random strings") {
    import org.apache.spark.unsafe.types.UTF8String
    def reference(s: String): (Long, Long, Long) = {
      val cps = s.codePoints().toArray
      val counts = cps.groupBy(identity).view.mapValues(_.length.toLong)
      val n = cps.length.toLong
      val bound = counts.values.map(k =>
        k * (63 - java.lang.Long.numberOfLeadingZeros(n / k))).sum
      (n, counts.size.toLong, bound)
    }
    val rng = new scala.util.Random(13)
    val alphabets = Seq("ab", "abcdefgh", "aaaaaaab", "xyζ𝄞", " etaoinshrdlu.")
    for (_ <- 0 until 300) {
      val alpha = alphabets(rng.nextInt(alphabets.length))
      val cps = alpha.codePoints().toArray
      val s = new String((0 until rng.nextInt(80)).flatMap(_ =>
        Character.toChars(cps(rng.nextInt(cps.length)))).toArray)
      val got = graft.functions.HashKernels.charEntropyBound(
        UTF8String.fromString(s)).toLongArray()
      val (n, d, bound) = reference(s)
      assert(got.toSeq == Seq(n, d, bound), s"kernel mismatch on '$s'")
      // entropy laws: 0 ≤ bound ≤ n·⌈log2 distinct⌉; single-char → 0
      assert(bound >= 0L)
      if (d > 0)
        assert(bound <= n * (64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, d - 1))),
          s"bound $bound exceeds n·ceil(log2 d) for n=$n d=$d")
      if (d == 1) assert(bound == 0L)
    }
  }

  test("prop: log2Millis tracks real log2 within the piecewise-linear error bound") {
    // The within-binade linear interpolation is the CHORD of a concave
    // function, so it sits at or below the true log2 everywhere; its
    // worst gap is max(log2(1+f) − f) ≈ 0.0861 bits at f = 1/ln2 − 1,
    // and millibit truncation adds < 0.001. Properties: one-sided
    // error in [0, 0.0872], exact on powers of two, monotone
    // non-decreasing.
    val gen = Gen.chooseNum(1L, (1L << 52) - 1)
    val qs = (0 until 300).flatMap(i => gen(Gen.Parameters.default, Seed(i.toLong))) ++
      Seq(1L, 2L, 3L, 1023L, 1024L, 1025L, (1L << 52) - 1)
    var prevQ = 0L
    var prevMb = Long.MinValue
    qs.sorted.foreach { q =>
      val mb = graft.functions.HashKernels.log2Millis(q)
      val real = math.log(q.toDouble) / math.log(2.0)
      assert(mb / 1000.0 <= real + 1e-9, s"q=$q mb=$mb over log2=$real")
      assert(real - mb / 1000.0 <= 0.0872, s"q=$q error ${real - mb / 1000.0}")
      if ((q & (q - 1)) == 0L) // exact power of two
        assert(mb == 1000L * (63 - java.lang.Long.numberOfLeadingZeros(q)))
      if (q > prevQ) { assert(mb >= prevMb, s"non-monotone at $q"); prevQ = q; prevMb = mb }
    }
  }
}
