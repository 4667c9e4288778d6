package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Shared scaffold for the deterministic id-range generator sources
  * ([[DocGenSource]], [[VecGenSource]]): a batch-readable table over
  * the id range [0, rows), split into `partitions` contiguous input
  * partitions, each materializing its rows executor-side via `rowFn` —
  * zero storage, no driver materialization, embarrassingly parallel.
  * `rowFn` ships inside each input partition, so it must capture only
  * serializable values (both sources close over object methods and
  * primitive options). */
private[sources] class RangeGenTable(
    tableName: String, rows: Long, partitions: Int, tschema: StructType,
    rowFn: Long => InternalRow) extends Table with SupportsRead {
  require(rows >= 0, s"$tableName: rows must be >= 0, got $rows")
  require(partitions >= 1, s"$tableName: partitions must be >= 1, got $partitions")
  override def name(): String = tableName
  override def schema(): StructType = tschema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = tschema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        val per = (rows + partitions - 1) / partitions
        (0 until partitions).map { i =>
          RangeGenPartition(i * per, math.min(rows, (i + 1) * per), rowFn): InputPartition
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
