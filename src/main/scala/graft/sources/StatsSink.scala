package graft.sources

import java.util
import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE path: a stats-collecting sink — the lakehouse
  * writer's metadata side as a standalone connector:
  *
  *   df.write.format("graft-stats").option("name", "t1").save()
  *   ds.writeStream.format("graft-stats").option("name", "t1")...
  *
  * Every writer task folds its partition into (a) per-column ZONE MAPS
  * (min/max/null-count — the file-footer stats that power data
  * skipping: a reader prunes a partition whose [min,max] can't satisfy
  * a predicate, exactly what q_bloom_prune demonstrates query-side)
  * and (b) the TABLE CHECKSUM in q_table_checksum's exact form (sum of
  * row fingerprints over "|"-joined long/string fields — commutative,
  * so task/partition order can't change it). Tasks ship ONLY these
  * bounded summaries as commit messages; the driver merge in
  * `commit()` is min/min, max/max, sum/sum over ≤ ncols entries per
  * task — a 1000-executor write commits KBs of metadata however many
  * TBs of rows flowed. Results land in [[StatsSink.stats]] keyed by
  * the `name` option (a registry standing in for the lake catalog's
  * stats store); streaming epochs MERGE into the existing entry, the
  * batch path replaces it (or merges with option("merge", "true")).
  *
  * The checksum contract is cross-checked against the Catalyst kernel:
  * DocGenSourceSpec computes sum(graft_fp(concat_ws("|", cols))) over
  * the same rows and the two independent implementations (per-row JVM
  * fold here, codegen'd expression there) must agree to the digit.
  *
  * Reference analog: the terminal side-effecting stage —
  * `each`/`run` as a sink (process/api/each.py:15-38) — here as a
  * first-class V2 connector with commit semantics instead of a
  * driver-side forEach.
  */
class StatsSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-stats"
  // Write-only source: the schema is whatever the query writes.
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StructType(Nil)
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new StatsSinkTable(properties.getOrDefault("name", "default"),
      properties.getOrDefault("merge", "false").toBoolean, schema)
}

private class StatsSinkTable(name0: String, mergeBatch: Boolean, schema0: StructType)
    extends Table with SupportsWrite {
  override def name(): String = s"graft-stats($name0)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new StatsWrite(name0, mergeBatch, info.schema())
    }
}

private class StatsWrite(name0: String, mergeBatch: Boolean, schema: StructType)
    extends Write with BatchWrite with StreamingWrite {
  override def toBatch: BatchWrite = this
  override def toStreaming: StreamingWrite = this
  // Both parent traits default this; Scala requires the diamond be
  // resolved explicitly. No coordination needed — commits are
  // idempotent merges of task summaries.
  override def useCommitCoordinator(): Boolean = false

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new StatsWriterFactory(schema)
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new StatsWriterFactory(schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val merged = StatsSink.merge(schema, messages)
    if (mergeBatch)
      StatsSink.stats.updateWith(name0) {
        case Some(prev) => Some(StatsSink.combine(prev, merged))
        case None => Some(merged)
      }
    else StatsSink.stats.put(name0, merged)
  }
  /** Streaming epochs always accumulate — each epoch is a delta. */
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val merged = StatsSink.merge(schema, messages)
    StatsSink.stats.updateWith(name0) {
      case Some(prev) => Some(StatsSink.combine(prev, merged))
      case None => Some(merged)
    }
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

private class StatsWriterFactory(schema: StructType)
    extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new StatsDataWriter(schema)
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new StatsDataWriter(schema)
}

/** Per-task fold. Zone maps cover LONG / DOUBLE / STRING fields; the
  * checksum covers LONG / STRING fields (double-to-string rendering is
  * not engine-portable, so doubles stay out of the hashed surface —
  * same reasoning that keeps ln() out of the HLL sketch). */
private class StatsDataWriter(schema: StructType) extends DataWriter[InternalRow] {
  private val n = schema.length
  private var rows = 0L
  private var checksum = BigInt(0)
  private val nulls = new Array[Long](n)
  private val lo = new Array[Any](n)
  private val hi = new Array[Any](n)

  override def write(row: InternalRow): Unit = {
    rows += 1
    val sb = new java.lang.StringBuilder
    var first = true
    var i = 0
    while (i < n) {
      val dt = schema(i).dataType
      if (row.isNullAt(i)) nulls(i) += 1
      else dt match {
        case LongType =>
          val v = row.getLong(i)
          if (lo(i) == null || v < lo(i).asInstanceOf[Long]) lo(i) = v
          if (hi(i) == null || v > hi(i).asInstanceOf[Long]) hi(i) = v
        case DoubleType =>
          val v = row.getDouble(i)
          if (lo(i) == null || v < lo(i).asInstanceOf[Double]) lo(i) = v
          if (hi(i) == null || v > hi(i).asInstanceOf[Double]) hi(i) = v
        case StringType =>
          // compare as UTF8String (UTF-8 byte order) — Java String '<'
          // is UTF-16 code-unit order, which disagrees for supplementary
          // characters and would desync the zone map from engine min/max.
          // clone(): getUTF8String may alias a reused row buffer.
          val v = row.getUTF8String(i)
          if (lo(i) == null || v.compareTo(lo(i).asInstanceOf[org.apache.spark.unsafe.types.UTF8String]) < 0)
            lo(i) = v.clone()
          if (hi(i) == null || v.compareTo(hi(i).asInstanceOf[org.apache.spark.unsafe.types.UTF8String]) > 0)
            hi(i) = v.clone()
        case _ => () // other types: counted in `rows`, no zone entry
      }
      dt match {
        case LongType | StringType =>
          // concat_ws semantics: null fields are SKIPPED, separator only
          // between present fields — keeps the JVM fold equal to
          // concat_ws("|", ...) under the Catalyst kernel.
          if (!row.isNullAt(i)) {
            if (!first) sb.append('|')
            if (dt == LongType) sb.append(row.getLong(i))
            else sb.append(row.getUTF8String(i).toString)
            first = false
          }
        case _ => ()
      }
      i += 1
    }
    checksum += BigInt(graft.functions.HashKernels.fingerprint(
      org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)))
  }

  override def commit(): WriterCommitMessage = {
    // UTF8String → String only here, at the task boundary; ordering
    // decisions all happened in UTF-8 byte order above and happen again
    // via UTF8String.fromString in the driver-side merge.
    def surface(a: Array[Any]): Array[Any] = a.map {
      case u: org.apache.spark.unsafe.types.UTF8String => u.toString
      case x => x
    }
    StatsSink.TaskStats(rows, checksum, nulls.clone(), surface(lo), surface(hi))
  }
  override def abort(): Unit = ()
  override def close(): Unit = ()
}

object StatsSink {
  /** One writer task's bounded summary (the commit message). */
  case class TaskStats(rows: Long, checksum: BigInt, nulls: Array[Long],
      lo: Array[Any], hi: Array[Any]) extends WriterCommitMessage

  case class ColZone(name: String, nulls: Long, lo: Any, hi: Any)
  case class TableStats(rows: Long, checksum: BigInt, zones: Seq[ColZone])

  /** The catalog stand-in: committed stats by sink `name` option. */
  val stats: TrieMap[String, TableStats] = TrieMap.empty

  private def lt(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Long, y: Long) => x < y
    case (x: Double, y: Double) => x < y
    case (x: String, y: String) =>
      // driver-side merge must use the SAME UTF-8 byte order as the
      // task-side fold, not Java's UTF-16 code-unit order
      org.apache.spark.unsafe.types.UTF8String.fromString(x)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(y)) < 0
    case _ => false
  }

  private[sources] def merge(schema: StructType,
      messages: Array[WriterCommitMessage]): TableStats = {
    val ts = messages.collect { case t: TaskStats => t }
    val n = schema.length
    val zones = (0 until n).map { i =>
      val present = ts.filter(t => t.lo(i) != null)
      ColZone(schema(i).name, ts.map(_.nulls(i)).sum,
        if (present.isEmpty) null else present.map(_.lo(i)).reduce((a, b) => if (lt(a, b)) a else b),
        if (present.isEmpty) null else present.map(_.hi(i)).reduce((a, b) => if (lt(a, b)) b else a))
    }
    TableStats(ts.map(_.rows).sum, ts.map(_.checksum).sum, zones)
  }

  private[sources] def combine(a: TableStats, b: TableStats): TableStats = {
    val zb = b.zones.map(z => z.name -> z).toMap
    TableStats(a.rows + b.rows, a.checksum + b.checksum,
      a.zones.map { za =>
        zb.get(za.name) match {
          case Some(z) => ColZone(za.name, za.nulls + z.nulls,
            if (za.lo == null) z.lo else if (z.lo == null) za.lo
            else if (lt(za.lo, z.lo)) za.lo else z.lo,
            if (za.hi == null) z.hi else if (z.hi == null) za.hi
            else if (lt(za.hi, z.hi)) z.hi else za.hi)
          case None => za
        }
      })
  }
}
