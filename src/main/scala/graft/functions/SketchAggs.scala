package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator`s for the sketch family — the custom-UDAF surface
  * SURVEY §2.3 reserves for extension ops (the reference has no UDAF;
  * scalar kernels stay native Catalyst expressions in [[HashExprs]]).
  * An Aggregator gets map-side partial aggregation for free: `reduce`
  * folds rows inside each task, `merge` combines partials across the
  * exchange — exactly the mergeable-sketch contract.
  */
object SketchAggs {

  /** MinHash UNION sketch: the element-wise minimum of per-row MinHash
    * signatures. The union of sets has, per hash function, the minimum
    * over members' minima — so folding signatures with element-wise min
    * yields the signature OF THE UNION of all grouped documents'
    * shingle sets. Per-group output lets cross-group Jaccard be
    * estimated from two group sketches alone (the Broder estimator on
    * the folded signatures) — how corpus-level source-overlap is
    * scored without touching documents twice. Empty buffer = identity
    * (first signature wins), making `merge` associative and
    * commutative at any parallelism.
    */
  object MinHashUnion extends Aggregator[Seq[Long], Seq[Long], Seq[Long]] {
    override def zero: Seq[Long] = Seq.empty
    private def emin(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      if (a.isEmpty) b else if (b.isEmpty) a
      else a.lazyZip(b).map(math.min)
    override def reduce(buf: Seq[Long], sig: Seq[Long]): Seq[Long] = emin(buf, sig)
    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = emin(a, b)
    override def finish(buf: Seq[Long]): Seq[Long] = buf
    override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  }

  /** Column-facing form of [[MinHashUnion]]. */
  val minhashUnion: Column => Column = {
    val f = udaf(MinHashUnion)
    (c: Column) => f(c)
  }
}
