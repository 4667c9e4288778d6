package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 synthetic document generator:
  *
  *   spark.read.format("graft-docs")
  *     .option("rows", 100000).option("partitions", 32).load()
  *
  * → (doc_id BIGINT, text STRING) — deterministic (splitmix-style hash
  * of doc_id seeds a small vocabulary sampler), embarrassingly
  * parallel: each of the `partitions` input partitions generates only
  * its id-range on its executor, so a 10^9-document corpus needs zero
  * storage and no driver materialization — the scale-testing feed for
  * the dedup/text kernels (same shape as the driver's `documents`
  * table).
  *
  * Reference analog: `from_iterable` over a generator — the unbounded
  * synthetic-input idiom (pypeln benchmarks stream generated URLs,
  * benchmarks/100_million_downloads/client-pypeln-io.py:11-12) — here
  * as a first-class partitioned Spark source instead of a driver-side
  * iterator.
  */
class DocGenSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-docs"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = DocGenSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val rows = properties.getOrDefault("rows", "1000").toLong
    new RangeGenTable(s"graft-docs($rows)", rows,
      properties.getOrDefault("partitions", "8").toInt, DocGenSource.schema,
      "doc_id",
      // pruned-schema row builder: when `text` is not requested the
      // string is never GENERATED — the whole point of column pushdown
      // on a generator (a count/id-only scan does zero text work)
      pruned => {
        val fields = pruned.fieldNames.toIndexedSeq
        id => InternalRow.fromSeq(fields.map {
          case "doc_id" => id
          case "text" => UTF8String.fromString(DocGenSource.textFor(id))
        })
      })
  }
}

object DocGenSource {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))

  private val vocab: Array[String] = Array(
    "the", "a", "data", "table", "spark", "query", "stream", "batch",
    "group", "key", "hash", "merge", "sort", "filter", "join", "window",
    "line", "row", "column", "value", "scan", "shuffle", "plan", "stage")

  /** Deterministic text for a doc id: 20–83 vocab words. */
  def textFor(id: Long): String = {
    var s = id * 0x9e3779b97f4a7c15L + 0x100000001b3L
    def next(): Long = { s ^= s << 13; s ^= s >>> 7; s ^= s << 17; s }
    val n = 20 + (Math.floorMod(next(), 64L)).toInt
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(vocab(Math.floorMod(next(), vocab.length.toLong).toInt))
      i += 1
    }
    sb.toString
  }
}

