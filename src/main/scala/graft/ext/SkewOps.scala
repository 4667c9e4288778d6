package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for the joins AQE can't fix on its own.
  *
  * Spark's own ladder comes first: map-side partial aggregation
  * absorbs skewed groupBy keys; AQE skew-join splits oversized
  * sort-merge partitions at runtime. What remains is the hot-key join
  * where one probe-side key floods a partition and the build side is
  * too big to broadcast — there, salting is the standard fix:
  * replicate the build side `salts` ways and scatter the probe side
  * deterministically across the replicas, turning one hot partition
  * into `salts` even ones at the cost of a `salts`× build-side
  * blow-up. Use a salt count near the observed skew factor, not the
  * cluster size.
  */
object SkewOps {

  /** Inner equi-join of `big` (skewed probe side) with `small` (build
    * side, too big to broadcast, small enough to replicate) on
    * `key`. Deterministic scatter: the salt is a hash of the probe
    * row's `scatterCol` (any well-distributed column — an id, not the
    * skewed key itself), so results are reproducible run-to-run. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      scatterCol: String, salts: Int): DataFrame = {
    val bigS = big.withColumn("_salt", pmod(hash(col(scatterCol)), lit(salts)))
    val smallS = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(smallS, Seq(key, "_salt")).drop("_salt")
  }
}
