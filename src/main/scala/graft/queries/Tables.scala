package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Table loaders + oracle-parity numeric helpers shared by all query
  * modules. Correctness contract: every value we emit must hash-equal
  * what DuckDB computes from the same parquet, so floating-point
  * aggregation must be association-proof (see [[dsum]]).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Association-proof sum of a double column: accumulate as
    * DECIMAL(38,6) (exact, order-independent — safe under any Spark
    * partial-aggregation/shuffle order AND equal to DuckDB's serial
    * sum), then surface as double. The initial double→decimal cast
    * rounds each input identically in both engines (same IEEE double in,
    * same decimal out), so the aggregate is bit-reproducible at any
    * parallelism — this is the 100 TB-safe way to sum doubles.
    * DuckDB oracle spelling: CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE).
    */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(38, 6))).cast(DoubleType)

  /** Association-proof mean: exact decimal sum cast to double, divided
    * by the count in double — one deterministic IEEE division.
    * DuckDB: CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*).
    */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** Association-proof windowed sum (running totals): same decimal
    * trick — DuckDB computes window sums with a segment tree (pairwise
    * association), Spark left-to-right; decimal makes both exact. */
  def dsumOver(c: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    sum(c.cast(DecimalType(38, 6))).over(w).cast(DoubleType)
}
