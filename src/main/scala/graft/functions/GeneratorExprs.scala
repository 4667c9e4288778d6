package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL-side flat_map: a real Catalyst [[Generator]] (SURVEY §2.3),
  * giving the pure-SQL surface 1→N row expansion WITHOUT a pre-built
  * array column — `LATERAL VIEW graft_explode_shingles(text, 3) s AS
  * pos, shingle`. The reference's flat_map contract (pypeln/process/
  * api/flat_map.py:19-28) appends the child position to the parent
  * index (`parent + (i,)`); `pos` is that `i`, emitted alongside each
  * child so SQL consumers keep the same index dimension the DSL's
  * `flatMap` tracks.
  *
  * Planner shape: resolves under ExtractGenerators into a `Generate`
  * node — per-row expansion inside the scan's partition, no shuffle,
  * no driver involvement; at 100 TB this is a streaming map-side
  * operator exactly like `explode`. Eval-mode (CodegenFallback): the
  * split+slide work per row dwarfs the boxing cost, and GenerateExec
  * runs non-codegen generators in-partition anyway.
  */
case class ExplodeShinglesExpr(child: Expression, k: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(k >= 1, s"shingle width must be >= 1, got $k")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("shingle", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_explode_shingles expects a STRING column, got $other")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Nil
    else {
      // split(" ", -1) keeps empty tokens — the DuckDB string_split
      // parity contract shared with the DSL op_flat_map oracle.
      val toks = t.asInstanceOf[UTF8String].toString.split(" ", -1)
      if (toks.length < k) Nil
      else new Iterator[InternalRow] {
        private var i = 0
        override def hasNext: Boolean = i <= toks.length - k
        override def next(): InternalRow = {
          val sb = new java.lang.StringBuilder(toks(i))
          var j = i + 1
          while (j < i + k) { sb.append(' ').append(toks(j)); j += 1 }
          val row = InternalRow(i, UTF8String.fromString(sb.toString))
          i += 1
          row
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ExplodeShinglesExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_explode_shingles"
}

/** Media-frame UDTF — the multimodal sibling of
  * [[ExplodeShinglesExpr]]: `LATERAL VIEW graft_explode_frames(
  * content, 8) f AS frame_idx, frame_bytes` cuts a binary blob into
  * `n` equal frames (frame size = max(1, len/n), the
  * [[graft.ext.MultimodalOps.sampleFrames]] byte math) so pure-SQL
  * consumers get per-frame rows without the DSL. Same planner shape:
  * a `Generate` node expanding in-partition — the blob is sliced
  * where it was scanned, nothing wide shuffles. */
case class ExplodeFramesExpr(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(n >= 1, s"frame count must be >= 1, got $n")

  override def elementSchema: StructType = StructType(Seq(
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame_bytes", BinaryType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_explode_frames expects a BINARY column, got $other")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val bs = v.asInstanceOf[Array[Byte]]
      val sz = math.max(1, bs.length / n)
      (0 until n).iterator.map { i =>
        val from = math.min(i * sz, bs.length)
        val until = math.min(from + sz, bs.length)
        InternalRow(i, java.util.Arrays.copyOfRange(bs, from, until))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ExplodeFramesExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_explode_frames"
}

/** Bigram UDTF — the n-gram-LM workhorse as a true [[Generator]]:
  * `LATERAL VIEW graft_explode_bigrams(text) b AS pos, w1, w2`. The
  * composed spelling every LM query previously used —
  * `explode(transform(sequence(0, size(tk) − 2), i → struct(tk[i],
  * tk[i+1])))` — MATERIALIZES the full array of bigram structs per
  * document before Generate streams it out; this generator slides a
  * 2-token window over the split directly, one live row at a time —
  * the allocation profile that matters when documents are megabytes.
  * Tokenization is the [[graft.ext.TextOps.tokens]] contract (split
  * on single spaces, empties DROPPED — unlike the shingle UDTF's
  * keep-empties flat_map parity contract), so `w1/w2` match the
  * unigram relations those queries join against. Same planner shape:
  * a `Generate` node expanding in-partition, no shuffle. */
case class ExplodeBigramsExpr(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("w1", StringType, nullable = false),
    StructField("w2", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_explode_bigrams expects a STRING column, got $other")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Nil
    else {
      val toks = t.asInstanceOf[UTF8String].toString
        .split(" ", -1).filter(_.nonEmpty)
      if (toks.length < 2) Nil
      else new Iterator[InternalRow] {
        private var i = 0
        override def hasNext: Boolean = i <= toks.length - 2
        override def next(): InternalRow = {
          val row = InternalRow(i,
            UTF8String.fromString(toks(i)), UTF8String.fromString(toks(i + 1)))
          i += 1
          row
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ExplodeBigramsExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_explode_bigrams"
}
