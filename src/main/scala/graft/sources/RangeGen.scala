package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Shared scaffold for the deterministic id-range generator sources
  * ([[DocGenSource]], [[VecGenSource]], [[EventGenSource]]): a
  * batch-readable table over the id range [0, rows), split into
  * `partitions` contiguous input partitions, each materializing its
  * rows executor-side via the source's row function — zero storage, no
  * driver materialization, embarrassingly parallel.
  *
  * The scan implements BOTH DSv2 pushdowns, because a generator can
  * honor them EXACTLY — the same contracts a parquet scan offers:
  *
  *   - `SupportsPushDownFilters`: comparisons against the id column
  *     narrow the generated range itself (ids ARE the values, so
  *     `doc_id < N` is not a post-filter — rows above N are never
  *     produced, and input partitions whose chunk falls entirely
  *     outside the range are never planned: generator-side partition
  *     pruning, observable as a smaller `rdd.getNumPartitions`).
  *     Everything else is returned as residual for Spark to evaluate.
  *   - `SupportsPushDownRequiredColumns`: the row function is built
  *     FOR the pruned schema, so an un-requested payload column
  *     (document text, embedding array, event row) is never generated
  *     at all — the generator analog of parquet's column skipping, and
  *     the reason `count(*)` over a 10^9-row generated corpus does no
  *     string work.
  *   - `SupportsReportStatistics`: the scan reports exact row count
  *     and an estimated byte size for the (filter-narrowed) range, so
  *     Catalyst's join planning sees a small generated dimension as
  *     broadcastable WITHOUT an explicit `broadcast()` hint — the
  *     optimizer integration that makes these sources behave like
  *     catalog tables with fresh ANALYZE stats.
  *   - `SupportsPushDownAggregates` (COMPLETE pushdown): an ungrouped
  *     COUNT(*) / MIN(id) / MAX(id) is a closed-form function of the
  *     (already filter-narrowed) range — count = hi−lo, min = lo,
  *     max = hi−1 — so the scan answers it with ONE plan-time row and
  *     zero generation: `count()` over a 10^12-row generator returns
  *     instantly (the metadata-only count parquet footers give a
  *     warehouse, stated for a generator). Spark only attempts this
  *     after every filter is pushed, so the narrowed range is the
  *     correct base; any other aggregate/groupBy is refused and runs
  *     as a normal scan.
  *
  * `rowFnFor(prunedSchema)` ships inside each input partition, so it
  * must capture only serializable values (the sources close over
  * object methods and primitive options). */
private[sources] class RangeGenTable(
    tableName: String, rows: Long, partitions: Int, tschema: StructType,
    idCol: String, rowFnFor: StructType => Long => InternalRow)
  extends Table with SupportsRead {
  require(rows >= 0, s"$tableName: rows must be >= 0, got $rows")
  require(partitions >= 1, s"$tableName: partitions must be >= 1, got $partitions")
  override def name(): String = tableName
  override def schema(): StructType = tschema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch
      with SupportsPushDownFilters with SupportsPushDownRequiredColumns
      with SupportsPushDownAggregates with SupportsReportStatistics {
      private var lo = 0L          // inclusive
      private var hi = rows        // exclusive
      private var pushed: Array[Filter] = Array.empty
      private var pruned: StructType = tschema
      private var aggFns: Option[Seq[AggregateFunc]] = None

      // INTEGRAL boxed types only: a fractional comparison value (e.g.
      // id < 5.5) truncated via longValue() would silently drop id=5,
      // which satisfies the predicate — leave non-integral Numbers as
      // residual filters for Spark to evaluate. (Spark's filter
      // translation casts literals to the LONG column's type first, so
      // fractional values are unexpected here — this is defense, not a
      // hot path.)
      private def longOf(v: Any): Option[Long] = v match {
        case n: java.lang.Long => Some(n.longValue())
        case n: java.lang.Integer => Some(n.longValue())
        case n: java.lang.Short => Some(n.longValue())
        case n: java.lang.Byte => Some(n.longValue())
        case _ => None
      }

      // x + 1 with an overflow guard: EqualTo/LessThanOrEqual at
      // Long.MaxValue must clamp the exclusive bound to MaxValue (the
      // range generator's domain is [0, rows) with rows ≤ MaxValue, so
      // the clamp loses nothing), not wrap negative and empty the range.
      private def succ(x: Long): Long =
        if (x == Long.MaxValue) Long.MaxValue else x + 1

      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        val residual = filters.filter {
          case EqualTo(c, v) if c == idCol && longOf(v).isDefined =>
            val x = longOf(v).get
            lo = math.max(lo, x); hi = math.min(hi, succ(x)); false
          case GreaterThan(c, v) if c == idCol && longOf(v).isDefined =>
            lo = math.max(lo, succ(longOf(v).get)); false
          case GreaterThanOrEqual(c, v) if c == idCol && longOf(v).isDefined =>
            lo = math.max(lo, longOf(v).get); false
          case LessThan(c, v) if c == idCol && longOf(v).isDefined =>
            hi = math.min(hi, longOf(v).get); false
          case LessThanOrEqual(c, v) if c == idCol && longOf(v).isDefined =>
            hi = math.min(hi, succ(longOf(v).get)); false
          case _ => true
        }
        pushed = filters.diff(residual)
        residual
      }
      override def pushedFilters(): Array[Filter] = pushed

      override def pruneColumns(requiredSchema: StructType): Unit =
        pruned = requiredSchema

      private def isIdRef(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
        e match {
          case nr: NamedReference => nr.fieldNames.sameElements(Array(idCol))
          case _ => false
        }
      private def canAnswer(agg: Aggregation): Boolean =
        agg.groupByExpressions().isEmpty &&
          agg.aggregateExpressions().forall {
            case _: CountStar => true
            case m: Min => isIdRef(m.column)
            case m: Max => isIdRef(m.column)
            case _ => false
          }
      override def supportCompletePushDown(agg: Aggregation): Boolean = canAnswer(agg)
      override def pushAggregation(agg: Aggregation): Boolean =
        if (canAnswer(agg)) { aggFns = Some(agg.aggregateExpressions().toSeq); true }
        else false

      override def estimateStatistics(): Statistics = new Statistics {
        private val n = math.max(0L, hi - lo)
        // conservative per-row width from the PRUNED schema (defaultSize
        // overestimates strings slightly — safe for broadcast decisions)
        private val width = math.max(8, readSchema().map(_.dataType.defaultSize).sum)
        override def sizeInBytes(): java.util.OptionalLong =
          java.util.OptionalLong.of(math.max(1L, n * width))
        override def numRows(): java.util.OptionalLong = java.util.OptionalLong.of(n)
      }

      override def build(): Scan = this
      override def readSchema(): StructType = aggFns match {
        case Some(fns) => StructType(fns.zipWithIndex.map {
          case (_: CountStar, i) =>
            org.apache.spark.sql.types.StructField(s"count_$i",
              org.apache.spark.sql.types.LongType, nullable = false)
          case (_, i) =>
            org.apache.spark.sql.types.StructField(s"minmax_$i",
              org.apache.spark.sql.types.LongType, nullable = true)
        })
        case None => pruned
      }
      override def toBatch: Batch = this
      override def description(): String =
        s"$tableName range=[$lo, $hi) pushed=${pushed.mkString(",")} " +
          s"columns=${pruned.fieldNames.mkString(",")}"
      override def planInputPartitions(): Array[InputPartition] = aggFns match {
        case Some(fns) =>
          // closed-form answer: one partition, one row, zero generation
          val n = math.max(0L, hi - lo)
          val vals: IndexedSeq[Any] = fns.toIndexedSeq.map {
            case _: CountStar => n
            case _: Min => if (n == 0L) null else lo
            case _: Max => if (n == 0L) null else hi - 1
          }
          val row = InternalRow.fromSeq(vals)
          Array(RangeGenPartition(0L, 1L, _ => row))
        case None =>
          // clip the ORIGINAL partition grid to the pushed range so a
          // narrowed scan also plans fewer tasks (partition pruning),
          // not just fewer rows per task
          val per = (rows + partitions - 1) / partitions
          val fn = rowFnFor(pruned)
          (0 until partitions).flatMap { i =>
            val s = math.max(lo, i * per)
            val e = math.min(hi, math.min(rows, (i + 1) * per))
            if (s < e) Some(RangeGenPartition(s, e, fn): InputPartition) else None
          }.toArray
      }
      override def createReaderFactory(): PartitionReaderFactory = RangeGenReaderFactory()
    }
}

private case class RangeGenPartition(start: Long, end: Long,
    rowFn: Long => InternalRow) extends InputPartition

private case class RangeGenReaderFactory() extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RangeGenPartition]
    new PartitionReader[InternalRow] {
      private var cur = p.start - 1
      override def next(): Boolean = { cur += 1; cur < p.end }
      override def get(): InternalRow = p.rowFn(cur)
      override def close(): Unit = ()
    }
  }
}
