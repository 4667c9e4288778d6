package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 synthetic event-stream generator — completes the
  * generator family ([[DocGenSource]] documents, [[VecGenSource]]
  * embeddings) with the event-time fact shape:
  *
  *   spark.read.format("graft-events")
  *     .option("rows", 50000000).option("partitions", 32)
  *     .option("users", 1000000).option("days", 30).load()
  *
  * → (event_id BIGINT, ts BIGINT nanos, user_id BIGINT, event_type
  * STRING, value DOUBLE) — the driver testdata `events` schema (minus
  * props), so the event-time suite's transforms run unchanged over a
  * generated corpus of any size. Deterministic splitmix-style hash of
  * event_id drives user assignment, type mix, timestamp placement and
  * value, so every partitioning yields identical rows — zero storage,
  * no driver materialization, each input partition generates only its
  * id range executor-side (the scale-testing feed for sessionization /
  * retention / SCD smokes).
  *
  * Reference analog: `from_iterable` over a generator (pypeln
  * benchmarks stream generated inputs,
  * benchmarks/100_million_downloads/client-pypeln-io.py:11-12).
  */
class EventGenSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-events"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = EventGenSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val rows = properties.getOrDefault("rows", "1000").toLong
    val users = properties.getOrDefault("users", "1000").toLong
    val days = properties.getOrDefault("days", "30").toInt
    // fail at table resolution, not as a floorMod ArithmeticException
    // inside an executor task
    require(users >= 1, s"graft-events: users must be >= 1, got $users")
    require(days >= 1, s"graft-events: days must be >= 1, got $days")
    new RangeGenTable(s"graft-events($rows)", rows,
      properties.getOrDefault("partitions", "8").toInt, EventGenSource.schema,
      "event_id",
      // event fields all derive from ONE rng stream, so generation cost
      // is indivisible — pruning here projects the value array (the
      // row stays narrow on the wire; the saving is downstream width)
      pruned => {
        val idx = pruned.fieldNames.toIndexedSeq
          .map(EventGenSource.schema.fieldIndex)
        id => {
          val full = EventGenSource.valuesFor(id, users, days)
          InternalRow.fromSeq(idx.map(full))
        }
      })
  }
}

object EventGenSource {
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  private val types: Array[UTF8String] =
    Array("view", "click", "purchase", "signup", "error").map(UTF8String.fromString)

  /** 2024-01-01T00:00:00Z in nanoseconds. */
  private val Epoch = 1704067200L * 1000000000L

  /** Deterministic event for an id. Skewed realism: user ids are
    * hash-uniform but type mix is weighted (views dominate), values
    * are mostly small with rare spikes — the shape the spike/anomaly/
    * gap-fill ops key on. */
  def rowFor(id: Long, users: Long, days: Int): InternalRow =
    InternalRow.fromSeq(valuesFor(id, users, days).toIndexedSeq)

  /** The row as a positional value array (schema order) — the pruning
    * projection picks from it without re-deriving the rng stream. */
  def valuesFor(id: Long, users: Long, days: Int): Array[Any] = {
    var s = id * 0x9e3779b97f4a7c15L + 0x100000001b3L
    def next(): Long = { s ^= s << 13; s ^= s >>> 7; s ^= s << 17; s }
    val user = Math.floorMod(next(), users)
    val t = Math.floorMod(next(), 100L)
    val typ = if (t < 45) 0 else if (t < 75) 1 else if (t < 85) 2 else if (t < 93) 3 else 4
    val ns = Epoch + Math.floorMod(next(), days.toLong * 86400L) * 1000000000L +
      Math.floorMod(next(), 1000000000L)
    val base = Math.floorMod(next(), 10000L) / 100.0
    val value = if (Math.floorMod(next(), 50L) == 0L) base * 5.0 else base
    Array[Any](id, ns, user, types(typ), value)
  }
}
