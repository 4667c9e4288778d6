package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * `queries` is the declared operator inventory (SURVEY.md §2 parity
  * surface + extension suites); `oracleSql` gives the DuckDB-equivalent
  * for every SQL-expressible entry, with column names aligned.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Pricing(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParityOps.queries ++ Relational.queries ++ TextQueries.queries ++
      DedupQueries.queries ++ SimQueries.queries ++ EventQueries.queries ++
      MultimodalQueries.queries ++ GeoQueries.queries

  def oracleSql: Map[String, String] =
    ParityOps.oracleSql ++ Relational.oracleSql ++ TextQueries.oracleSql ++
      DedupQueries.oracleSql ++ SimQueries.oracleSql ++ EventQueries.oracleSql ++
      MultimodalQueries.oracleSql ++ GeoQueries.oracleSql
}
