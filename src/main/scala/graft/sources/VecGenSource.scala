package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 synthetic embedding generator — the vector-pillar
  * sibling of [[DocGenSource]]:
  *
  *   spark.read.format("graft-vecs")
  *     .option("rows", 10000000).option("partitions", 64)
  *     .option("dims", 32).load()
  *
  * → (vec_id BIGINT, embedding ARRAY&lt;FLOAT&gt;) — deterministic
  * (splitmix-style hash of (vec_id, dim) drives each component,
  * uniform in [-1, 1)), embarrassingly parallel: each input partition
  * generates only its id-range executor-side, so a 10^9-vector corpus
  * needs zero storage and no driver materialization. The scale-testing
  * feed for the ANN kernels (same shape as the driver's `embeddings`
  * table); at 32 dims random vectors are near-orthogonal (cos sd
  * ≈ 1/√dims), so high-threshold organic pairs are rare and planted
  * duplicates dominate — the property the SRP smoke tests rely on.
  *
  * Reference analog: `from_iterable` over a generator (the synthetic
  * unbounded-input idiom, pypeln
  * benchmarks/100_million_downloads/client-pypeln-io.py:11-12), as a
  * partitioned first-class source.
  */
class VecGenSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-vecs"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = VecGenSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val rows = properties.getOrDefault("rows", "1000").toLong
    val dims = properties.getOrDefault("dims", "32").toInt
    require(dims >= 1, s"graft-vecs: dims must be >= 1, got $dims")
    new RangeGenTable(s"graft-vecs($rows x $dims)", rows,
      properties.getOrDefault("partitions", "8").toInt, VecGenSource.schema,
      "vec_id",
      // pruned-schema row builder: an id-only scan never materializes
      // the `dims`-float embedding
      pruned => {
        val fields = pruned.fieldNames.toIndexedSeq
        id => InternalRow.fromSeq(fields.map {
          case "vec_id" => id
          case "embedding" => new GenericArrayData(VecGenSource.vecFor(id, dims))
        })
      })
  }
}

object VecGenSource {
  val schema: StructType = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Deterministic embedding for a vector id: `dims` floats in [-1, 1). */
  def vecFor(id: Long, dims: Int): Array[Float] = {
    val out = new Array[Float](dims)
    var s = id * 0x9e3779b97f4a7c15L + 0x100000001b3L
    var d = 0
    while (d < dims) {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      // top 24 bits → [0, 1) → [-1, 1)
      out(d) = (((s >>> 40).toInt.toFloat / (1 << 24)) * 2f) - 1f
      d += 1
    }
    out
  }
}

