package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support (LLM-pipeline pillar #4): image/audio/
  * video payloads travel as opaque `binary` columns beside a typed
  * metadata struct; decode/resize/frame-sample run batch-at-a-time
  * inside partitions (the Scala analog of `mapInPandas` — same batch
  * shape, same executor-side placement, no driver involvement).
  *
  * REAL here: the schema convention, the byte-level feature kernels
  * (native expressions — histograms/stats over the raw bytes are
  * genuine signal and need no media libraries), the partition/batch
  * plumbing, and the frame-sampling index math.
  * STUBBED here: pixel/sample decoding — this container has no
  * image/audio codecs, so [[fakeDecode]] is a clearly-marked
  * deterministic stand-in (documented at each use). Swapping it for a
  * real JNI/javax.imageio decoder changes no schema, partitioning, or
  * call shape.
  *
  * Scale posture: media blobs are large (MB+) — never shuffle them.
  * Every operator below is map-side (scan → decode → project); outputs
  * are small typed columns (features, stats, thumbnails), and any
  * downstream join/group moves those, not the blobs. Partition sizing:
  * media tables want smaller `maxPartitionBytes` so a partition's
  * blobs fit executor memory during decode.
  */
object MultimodalOps {

  /** Typed metadata carried beside every media blob. */
  val metaSchema: StructType = StructType(Seq(
    StructField("modality", StringType, nullable = false),
    StructField("fmt", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  /** content + meta — the canonical media-table schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = false),
    StructField("meta", metaSchema, nullable = false)))

  /** Byte-level stats over a blob — one native pass, no boxing.
    * n_bytes / sum / min / max are real features (and oracle-checkable:
    * for ASCII text payloads they equal the codepoint stats DuckDB
    * computes from the string). */
  case class ByteStatsExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("n_bytes", LongType, nullable = false),
      StructField("sum_bytes", LongType, nullable = false),
      StructField("min_byte", IntegerType, nullable = false),
      StructField("max_byte", IntegerType, nullable = false)))
    override def nullSafeEval(input: Any): Any =
      graft.functions.HashKernels.byteStats(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.byteStats($c)")
    override protected def withNewChildInternal(c: Expression): ByteStatsExpr = copy(child = c)
    override def prettyName: String = "graft_byte_stats"
  }

  /** Normalized byte histogram (`bins` buckets) as float features —
    * the real, codec-free feature vector for any modality; feeds
    * straight into [[SimOps]] cosine / SRP-LSH. */
  case class ByteHistExpr(child: Expression, bins: Int) extends UnaryExpression {
    require(bins > 0 && 256 % bins == 0)
    override def dataType: DataType = ArrayType(FloatType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      graft.functions.HashKernels.byteHist(input.asInstanceOf[Array[Byte]], bins)
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.byteHist($c, $bins)")
    override protected def withNewChildInternal(c: Expression): ByteHistExpr = copy(child = c)
    override def prettyName: String = "graft_byte_hist"
  }

  /** Integer twin of [[ByteHistExpr]]: raw bucket counts — the
    * all-integer histogram for exact arithmetic downstream (frame L1
    * distances in [[graft.queries.MultimodalQueries.mmSceneCuts]]
    * never touch a float, so the scene verdict can't flip on ulp). */
  case class ByteHistCountsExpr(child: Expression, bins: Int) extends UnaryExpression {
    require(bins > 0 && 256 % bins == 0)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      graft.functions.HashKernels.byteHistCounts(input.asInstanceOf[Array[Byte]], bins)
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.byteHistCounts($c, $bins)")
    override protected def withNewChildInternal(c: Expression): ByteHistCountsExpr = copy(child = c)
    override def prettyName: String = "graft_byte_hist_counts"
  }

  /** Perceptual hash over raw bytes — dHash's structure (gradients
    * between downscaled regions) applied codec-free: `segs` equal
    * byte segments, one MEAN-gradient bit per adjacent pair
    * ([[graft.functions.HashKernels.byteSegGradHash]], all-integer).
    * Stable under tail-local edits (an edit inside one segment can
    * flip at most its two adjacent gradient bits), discriminative
    * across blobs (positional structure, unlike a global histogram —
    * on the test corpus a 32-bin histogram hash collapses 500 docs
    * to 4 values while this spreads them to 500). Pairs via
    * [[DedupOps.hammingPairs]] banding — never all-pairs. */
  case class ByteSegGradHashExpr(child: Expression, segs: Int) extends UnaryExpression {
    require(segs >= 2 && segs <= 63, s"segs must be in [2, 63], got $segs")
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      graft.functions.HashKernels.byteSegGradHash(input.asInstanceOf[Array[Byte]], segs)
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.byteSegGradHash($c, $segs)")
    override protected def withNewChildInternal(c: Expression): ByteSegGradHashExpr = copy(child = c)
    override def prettyName: String = "graft_byte_seg_grad_hash"
  }

  /** Run-length profile — the silence/stuck-frame/padding screen
    * ([[graft.functions.HashKernels.byteRunStats]]): long constant
    * runs are dead air in audio, frozen frames in video, padding in
    * containers — content that costs storage and feature compute but
    * trains nothing. Codegen struct expression like
    * [[ByteStatsExpr]]. */
  case class ByteRunStatsExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("n_runs", LongType, nullable = false),
      StructField("max_run", LongType, nullable = false),
      StructField("run8_bytes", LongType, nullable = false)))
    override def nullSafeEval(input: Any): Any =
      graft.functions.HashKernels.byteRunStats(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.byteRunStats($c)")
    override protected def withNewChildInternal(c: Expression): ByteRunStatsExpr =
      copy(child = c)
    override def prettyName: String = "graft_byte_runs"
  }

  /** Sharpness/blur screen over raw bytes — discrete-Laplacian energy
    * ([[graft.functions.HashKernels.byteLaplacianEnergy]], all-integer
    * one-pass): the quality gate a media-curation pipeline runs before
    * admitting an asset (blur ≈ low second-difference energy). Codegen
    * UnaryExpression like the other byte kernels — stays inside
    * whole-stage, the blob never leaves its scan partition. */
  case class ByteLaplacianExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      graft.functions.HashKernels.byteLaplacianEnergy(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.byteLaplacianEnergy($c)")
    override protected def withNewChildInternal(c: Expression): ByteLaplacianExpr =
      copy(child = c)
    override def prettyName: String = "graft_byte_laplacian"
  }

  /** Audio-fingerprint analog over raw bytes: Haitsma–Kalker band-energy
    * bits ([[graft.functions.HashKernels.byteBandEnergyHash]] — `frames`
    * time windows × `bands` byte-value energy bands, one
    * second-order-difference sign bit per adjacent (frame, band) pair).
    * This is the generic acoustic-fingerprint SHAPE with the FFT swapped
    * for byte-value banding (no codecs in this container); a real
    * spectral frontend drops in at the kernel with the same
    * (bytes → Long) signature. Pairs via [[DedupOps.hammingPairs]] —
    * bucket equi-join, never all-pairs. */
  case class ByteBandEnergyHashExpr(child: Expression, frames: Int, bands: Int)
      extends UnaryExpression {
    require(frames >= 2 && bands >= 2 && 256 % bands == 0 &&
      (frames - 1) * (bands - 1) <= 62,
      s"need 2<=frames, 2<=bands|256, (frames-1)*(bands-1)<=62; got $frames, $bands")
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      graft.functions.HashKernels.byteBandEnergyHash(
        input.asInstanceOf[Array[Byte]], frames, bands)
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.HashKernels.byteBandEnergyHash($c, $frames, $bands)")
    override protected def withNewChildInternal(c: Expression): ByteBandEnergyHashExpr =
      copy(child = c)
    override def prettyName: String = "graft_byte_bandhash"
  }

  /** Native resize over an already-decoded pixel column: area-average
    * box filter ([[graft.functions.HashKernels.resizeArea]] — exact
    * integer block bounds, deterministic float accumulation), source
    * dims per ROW (`w`/`h` are expressions — media tables mix sizes),
    * target dims plan-time. Codegen'd; stays inside whole-stage like
    * the byte kernels. */
  case class ResizePixelsExpr(pixels: Expression, w: Expression, h: Expression,
      ow: Int, oh: Int)
      extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
    require(ow >= 1 && oh >= 1, s"target dims must be >= 1, got ${ow}x$oh")
    override def first: Expression = pixels
    override def second: Expression = w
    override def third: Expression = h
    override def dataType: DataType = ArrayType(FloatType, containsNull = false)
    override protected def nullSafeEval(p: Any, ww: Any, hh: Any): Any =
      graft.functions.HashKernels.resizePixels(
        p.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        ww.asInstanceOf[Int], hh.asInstanceOf[Int], ow, oh)
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      defineCodeGen(ctx, ev, (p, ww, hh) =>
        s"graft.functions.HashKernels.resizePixels($p, $ww, $hh, $ow, $oh)")
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): ResizePixelsExpr =
      copy(pixels = f, w = s, h = t)
    override def prettyName: String = "graft_resize"
  }

  def resizePixels(px: Column, w: Column, h: Column, ow: Int, oh: Int): Column =
    toColumn(ResizePixelsExpr(toExpression(px), toExpression(w), toExpression(h), ow, oh))

  def byteStats(c: Column): Column = toColumn(ByteStatsExpr(toExpression(c)))
  def byteHist(c: Column, bins: Int): Column = toColumn(ByteHistExpr(toExpression(c), bins))
  def byteHistCounts(c: Column, bins: Int): Column =
    toColumn(ByteHistCountsExpr(toExpression(c), bins))
  def byteSegGradHash(c: Column, segs: Int): Column =
    toColumn(ByteSegGradHashExpr(toExpression(c), segs))
  def byteLaplacian(c: Column): Column = toColumn(ByteLaplacianExpr(toExpression(c)))
  def byteRunStats(c: Column): Column = toColumn(ByteRunStatsExpr(toExpression(c)))
  def byteBandEnergyHash(c: Column, frames: Int, bands: Int): Column =
    toColumn(ByteBandEnergyHashExpr(toExpression(c), frames, bands))

  /** DETERMINISTIC FAKE decoder — stands in for libjpeg/ffmpeg (absent
    * in this container). Produces `w*h` floats in [0,1) from a
    * splitmix-style hash of the bytes; bit-reproducible, so tests can
    * assert end-to-end plumbing. A real decoder drops in with the same
    * (Array[Byte], Int, Int) => Array[Float] signature. */
  def fakeDecode(bytes: Array[Byte], w: Int, h: Int): Array[Float] = {
    var seed = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < bytes.length) { seed = (seed ^ (bytes(i) & 0xffL)) * 0x100000001b3L; i += 1 }
    val out = new Array[Float](w * h)
    i = 0
    while (i < out.length) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      out(i) = ((seed >>> 40).toInt & 0xffffff) / 16777216.0f
      i += 1
    }
    out
  }

  /** Decode each blob to pixel features, batch-at-a-time inside the
    * partition — the `mapInPandas` shape: elements are staged into
    * `batchSize` groups so a real decoder can amortize codec setup
    * (and a vectorized library can process a batch per call). Output:
    * (media_id, pixels: array<float>) — blobs never leave the scan. */
  def decodeToPixels(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("pixels", ArrayType(FloatType, containsNull = false), nullable = false)))
    df.select(col("media_id"), col("content"), col("meta.width"), col("meta.height"))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // one "codec call" per batch (stubbed: fakeDecode per element)
          batch.iterator.map { r =>
            val px = fakeDecode(r.getAs[Array[Byte]](1), r.getInt(2), r.getInt(3))
            Row(r.getLong(0), px.toSeq)
          }
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Decode + resize in ONE partition-local batch pass — the production
    * thumbnail pipeline: the blob is decoded and immediately downsampled
    * inside the same batch loop, so the full-resolution pixel array
    * never rematerializes between operators (at media scale the decoded
    * frame is the big object, not the blob). Output:
    * (media_id, thumb: array<float> of `ow`×`oh`). Same batch shape /
    * stub-decoder contract as [[decodeToPixels]]. */
  def thumbnails(df: DataFrame, ow: Int, oh: Int, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("thumb", ArrayType(FloatType, containsNull = false), nullable = false)))
    df.select(col("media_id"), col("content"), col("meta.width"), col("meta.height"))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { r =>
            val w = r.getInt(2); val h = r.getInt(3)
            val px = fakeDecode(r.getAs[Array[Byte]](1), w, h)
            Row(r.getLong(0),
              graft.functions.HashKernels.resizeArea(px, w, h, ow, oh).toSeq)
          }
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Deterministic frame sampling for video blobs: every `every`-th
    * frame index plus always the last — the index math is real; the
    * per-frame byte ranges assume fixed-size frames (n_bytes/n_frames),
    * which holds for raw containers and stands in for a demuxer. */
  def sampleFrameIndices(nFrames: Int, every: Int): Seq[Int] = {
    if (nFrames <= 0) Seq.empty
    else ((0 until nFrames by every) ++ Seq(nFrames - 1)).distinct
  }

  /** Explode sampled frames: (media_id, frame_idx, frame_bytes).
    * Pure column expressions end-to-end (round-4 advice: the former
    * index/slice UDFs broke whole-stage codegen on a path that scans
    * every blob): the index set is a stepped `sequence` plus the final
    * frame, first-occurrence-dedup'd by `array_distinct` — exactly
    * [[sampleFrameIndices]] — and the slice is `substr` on the binary
    * column, which clamps at the blob end like `Array.slice`. Slicing
    * is real byte math over the blob; decode of each frame would chain
    * [[decodeToPixels]]. */
  def sampleFrames(df: DataFrame, every: Int): DataFrame = {
    require(every >= 1, s"every must be >= 1, got $every")
    val nf = col("nf")
    val idx = when(nf <= 0, array().cast("array<int>"))
      .otherwise(array_distinct(concat(
        sequence(lit(0), nf - 1, lit(every)), array(nf - 1))))
    val sz = greatest(lit(1),
      floor(length(col("content")) / greatest(nf, lit(1))).cast("int"))
    df.select(col("media_id"), col("content"), col("meta.n_frames").as("nf"))
      .withColumn("frame_idx", explode(idx))
      .select(col("media_id"), col("frame_idx"),
        col("content").substr(col("frame_idx") * sz + lit(1), sz).as("frame_bytes"))
  }
}
