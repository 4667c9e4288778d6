package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the dedup / similarity hash kernels.
  *
  * Why native and not `functions._` composition: the sketch math
  * (shingle fingerprints → n minhashes → banded keys) nests three
  * higher-order functions. Spark HOFs are interpreted (never codegen'd)
  * AND re-evaluate their array argument on every lambda invocation once
  * CollapseProject inlines the producing expression — so the composed
  * column form recomputes the full shingle+fingerprint pipeline
  * `bands × hashes` times per row (measured: a 1000-doc corpus wedged
  * for >15 min). Each expression below is ONE imperative pass over its
  * input, evaluating children exactly once per row — the preference
  * order mandated by the build rules: native Expression > UDF > HOF
  * nest, for anything on a 100 TB hot path.
  *
  * Every kernel's arithmetic is spelled identically in the DuckDB
  * oracle SQL (see graft.queries.DedupQueries / SimQueries): 64-bit
  * modular arithmetic and IEEE double left-folds are engine-portable,
  * so results hash-match bit-exactly.
  */
object HashExprs {
  /** Shared prime modulus (products stay inside 64 bits). */
  val P = 1000000007L

  private val LongArray = ArrayType(LongType, containsNull = false)

  /** Polynomial fold h = (h*31 + codepoint) mod P over a string's
    * unicode codepoints — matches DuckDB
    * list_reduce over string_split(s,'') + unicode(). */
  @inline private[functions] def foldFp(s: UTF8String, h0: Long): Long = {
    val str = s.toString
    var h = h0
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h = (h * 31 + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  /** fingerprint(text): whole-string polynomial content hash. */
  case class FingerprintExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      foldFp(input.asInstanceOf[UTF8String], 0L)
    override protected def withNewChildInternal(c: Expression): FingerprintExpr = copy(child = c)
    override def prettyName: String = "graft_fingerprint"
  }

  /** token_fps(tokens): per-token polynomial fingerprints. */
  case class TokenFpsExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongArray
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val out = new Array[Long](n)
      var i = 0
      while (i < n) { out(i) = foldFp(arr.getUTF8String(i), 0L); i += 1 }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): TokenFpsExpr = copy(child = c)
    override def prettyName: String = "graft_token_fps"
  }

  /** shingle_fps(tokens, k): fingerprint of each k-gram of tokens
    * joined by single spaces — one pass, no k-gram strings allocated
    * (the space separator is folded in as codepoint 32). Fewer than k
    * tokens → empty array (matches the guarded HOF/DuckDB spelling). */
  case class ShingleFpsExpr(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    require(k >= 1)
    override def dataType: DataType = LongArray
    override def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[ArrayData]
      val n = toks.numElements()
      if (n < k) return new GenericArrayData(Array.emptyLongArray)
      val out = new Array[Long](n - k + 1)
      var i = 0
      while (i <= n - k) {
        var h = 0L
        var j = 0
        while (j < k) {
          if (j > 0) h = (h * 31 + 32) % P
          h = foldFp(toks.getUTF8String(i + j), h)
          j += 1
        }
        out(i) = h
        i += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): ShingleFpsExpr = copy(child = c)
    override def prettyName: String = "graft_shingle_fps"
  }

  /** minhash_sig(fps, n): Broder sketch — n permutation-hashes
    * h_i(f) = (f*(2i+1) + 104729*(i+1)) mod P, min over the fp set;
    * empty set → sentinel P. */
  case class MinHashSigExpr(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongArray
    override def nullSafeEval(input: Any): Any = {
      val fps = input.asInstanceOf[ArrayData]
      val m = fps.numElements()
      val out = Array.fill(n)(P)
      var j = 0
      while (j < m) {
        val f = fps.getLong(j)
        var i = 0
        while (i < n) {
          val h = (f * (2L * i + 1) + 104729L * (i + 1)) % P
          if (h < out(i)) out(i) = h
          i += 1
        }
        j += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): MinHashSigExpr = copy(child = c)
    override def prettyName: String = "graft_minhash_sig"
  }

  /** band_keys(sig, b, r): LSH banding — band j's key is the seeded
    * fold s = j; s = (s*1000003 + sig[j*r + t]) mod P over the band's
    * r signature rows. */
  case class BandKeysExpr(child: Expression, b: Int, r: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongArray
    override def nullSafeEval(input: Any): Any = {
      val sig = input.asInstanceOf[ArrayData]
      val out = new Array[Long](b)
      var j = 0
      while (j < b) {
        var s = j.toLong
        var t = 0
        while (t < r && j * r + t < sig.numElements()) {
          s = (s * 1000003L + sig.getLong(j * r + t)) % P
          t += 1
        }
        out(j) = s
        j += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): BandKeysExpr = copy(child = c)
    override def prettyName: String = "graft_band_keys"
  }

  /** simhash(fps, bits): bit j of the signature is set iff the sum of
    * per-fp votes (+1 if bit j of fp set, else −1) is positive. */
  case class SimHashExpr(child: Expression, bits: Int)
      extends UnaryExpression with CodegenFallback {
    require(bits >= 1 && bits <= 62)
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val fps = input.asInstanceOf[ArrayData]
      val m = fps.numElements()
      val votes = new Array[Long](bits)
      var i = 0
      while (i < m) {
        val f = fps.getLong(i)
        var j = 0
        while (j < bits) {
          votes(j) += (if (((f >> j) & 1L) == 1L) 1L else -1L)
          j += 1
        }
        i += 1
      }
      var sig = 0L
      var j = 0
      while (j < bits) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
      sig
    }
    override protected def withNewChildInternal(c: Expression): SimHashExpr = copy(child = c)
    override def prettyName: String = "graft_simhash"
  }

  /** cosine(a, b) over float vectors: the three sums (dot, |a|², |b|²)
    * accumulate left-to-right in double (float→double casts are exact),
    * then one sqrt·sqrt and one division — bit-identical to DuckDB's
    * list_reduce spelling at any parallelism, because nothing crosses
    * rows. */
  case class CosineExpr(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    private def reader(e: Expression): (ArrayData, Int) => Double =
      e.dataType.asInstanceOf[ArrayType].elementType match {
        case FloatType => (a, i) => a.getFloat(i).toDouble
        case _         => (a, i) => a.getDouble(i)
      }
    @transient private lazy val readL = reader(left)
    @transient private lazy val readR = reader(right)
    override def nullSafeEval(a: Any, b: Any): Any = {
      val va = a.asInstanceOf[ArrayData]
      val vb = b.asInstanceOf[ArrayData]
      val n = math.min(va.numElements(), vb.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = readL(va, i)
        val y = readR(vb, i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineExpr =
      copy(left = l, right = r)
    override def prettyName: String = "graft_cosine"
  }

  /** srp_bucket(v, bits): sign-random-projection LSH bucket (Charikar).
    * Hyperplane component for plane p, dim d is a deterministic integer
    * hash mapped into [-1, 1): ((p*1315423911 + d*2654435761 + 97531)
    * mod 1000003) / 500001.5 − 1. Bucket id folds the projection signs
    * MSB-first: acc = acc*2 + (proj > 0). */
  case class SrpBucketExpr(child: Expression, bits: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val n = v.numElements()
      var acc = 0L
      var p = 0
      while (p < bits) {
        var proj = 0.0
        var d = 0
        while (d < n) {
          val hv = (p.toLong * 1315423911L + d.toLong * 2654435761L + 97531L) % 1000003L
          proj += v.getFloat(d).toDouble * (hv / 500001.5 - 1.0)
          d += 1
        }
        acc = acc * 2 + (if (proj > 0) 1L else 0L)
        p += 1
      }
      acc
    }
    override protected def withNewChildInternal(c: Expression): SrpBucketExpr = copy(child = c)
    override def prettyName: String = "graft_srp_bucket"
  }

  // ---- Column-facing wrappers --------------------------------------
  def fingerprint(c: Column): Column = toColumn(FingerprintExpr(toExpression(c)))
  def tokenFps(toks: Column): Column = toColumn(TokenFpsExpr(toExpression(toks)))
  def shingleFps(toks: Column, k: Int): Column = toColumn(ShingleFpsExpr(toExpression(toks), k))
  def minhashSig(fps: Column, n: Int): Column = toColumn(MinHashSigExpr(toExpression(fps), n))
  def bandKeys(sig: Column, b: Int, r: Int): Column = toColumn(BandKeysExpr(toExpression(sig), b, r))
  def simhash(fps: Column, bits: Int): Column = toColumn(SimHashExpr(toExpression(fps), bits))
  def cosineSim(a: Column, b: Column): Column = toColumn(CosineExpr(toExpression(a), toExpression(b)))
  def srpBucket(v: Column, bits: Int): Column = toColumn(SrpBucketExpr(toExpression(v), bits))
}
