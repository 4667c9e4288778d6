package graft.core

/** The unit of data flowing through a graft pipeline.
  *
  * Mirrors the reference's `Element(index, value)` record
  * (reference: pypeln/utils.py:46-66): `index` is the creation-order
  * coordinate assigned at the source and extended by one dimension per
  * `flatMap` child (reference: pypeln/process/api/flat_map.py:22-28).
  * Lexicographic comparison of `index` (shorter-prefix-first, i.e.
  * Seq(1) < Seq(1, 0)) matches Python tuple comparison, so `ordered`
  * can restore source order after any operator chain.
  *
  * Spark-side, an `Element[T]` is a two-column row
  * (`index: array<bigint>`, `value: T`); Spark's native ArrayType
  * ordering is lexicographic with the same prefix rule, so `ordered`
  * is a plain `Sort` — no custom comparator needed.
  */
final case class Element[T](index: Seq[Long], value: T) {
  def set[B](v: B): Element[B] = Element(index, v)
  def push(i: Long): Seq[Long] = index :+ i
}

object Element {
  /** Tuple-style lexicographic ordering on index paths (prefix rule:
    * a strict prefix sorts first), identical to Python tuple compare
    * used by the reference's `ordered` (pypeln/process/api/ordered.py:12-20).
    */
  val indexOrdering: Ordering[Seq[Long]] = (a: Seq[Long], b: Seq[Long]) => {
    val it = a.iterator.zip(b.iterator)
    var r = 0
    while (r == 0 && it.hasNext) { val (x, y) = it.next(); r = java.lang.Long.compare(x, y) }
    if (r != 0) r else Integer.compare(a.length, b.length)
  }
}
