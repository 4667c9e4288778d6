package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite (the Deequ/dbt-test shape)
  * — validation is the first stage of any 100 TB ingest, and the engine
  * should run a whole suite in as few passes as the checks allow:
  *
  *   - every ROW-LEVEL check (completeness, range, accepted values)
  *     compiles to one conditional-sum column of a SINGLE aggregate
  *     over ONE scan of the table — adding a check adds a column, not
  *     a pass, and the partial aggregate combines map-side, so the
  *     exchange carries one row per partition regardless of table size;
  *   - `Unique` adds an exact `count(c) − count(DISTINCT c)` (Catalyst
  *     plans the distinct via Expand in the same scan); at 100 TB
  *     swap to `approx_count_distinct` when an HLL bound is enough —
  *     the exact spelling is kept here because the oracle gate needs
  *     bit-exact numbers;
  *   - each `RefIntegrity` is a LEFT ANTI join against the DISTINCT
  *     key projection of the dimension, counting only misses — the
  *     anti join shuffles fixed-width keys, never payloads, and the
  *     [[SkewOps.bloomPrunedSemiJoin]] sketch pair is the drop-in
  *     upgrade when the dimension is too big to hash cleanly.
  *
  * Report: one row per check — (check_name, violations, total, pass).
  */
object QualityOps {

  sealed trait Check { def name: String }
  /** Null count of `column` must be 0. */
  final case class Completeness(column: String) extends Check {
    def name = s"completeness:$column"
  }
  /** `column` must have no duplicate non-null values. */
  final case class Unique(column: String) extends Check {
    def name = s"unique:$column"
  }
  /** Non-null values of `column` must lie in [lo, hi]. */
  final case class InRange(column: String, lo: Double, hi: Double) extends Check {
    def name = s"range:$column"
  }
  /** Non-null values of `column` must be one of `values`. */
  final case class AcceptedValues(column: String, values: Seq[String]) extends Check {
    def name = s"accepted:$column"
  }
  /** Non-null values of `column` must exist in `dim.dimColumn`. */
  final case class RefIntegrity(column: String, dimName: String,
      dim: DataFrame, dimColumn: String) extends Check {
    def name = s"ref:$column->$dimName.$dimColumn"
  }

  /** Run `checks` over `df`. `maxViolations`: a check passes when its
    * violation count is ≤ this bound (0 = zero-tolerance). */
  def report(df: DataFrame, checks: Seq[Check],
      maxViolations: Long = 0L): DataFrame = {
    require(checks.nonEmpty, "empty check suite")
    val scalar = checks.filter(!_.isInstanceOf[RefIntegrity])
    val refs = checks.collect { case r: RefIntegrity => r }
    val violExprs = scalar.zipWithIndex.map { case (c, i) =>
      val v = c match {
        case Completeness(cn) =>
          sum(when(col(cn).isNull, 1L).otherwise(0L))
        case Unique(cn) =>
          count(col(cn)) - count_distinct(col(cn))
        case InRange(cn, lo, hi) =>
          sum(when(col(cn).isNotNull &&
            (col(cn) < lit(lo) || col(cn) > lit(hi)), 1L).otherwise(0L))
        case AcceptedValues(cn, vals) =>
          sum(when(col(cn).isNotNull &&
            !col(cn).isin(vals: _*), 1L).otherwise(0L))
        case r: RefIntegrity =>
          throw new IllegalStateException(s"unreachable: $r")
      }
      v.cast("bigint").as(s"_v$i")
    }
    // ONE aggregate row holds the total and every scalar violation
    // count; tiny (1 row) but feeds |scalar| report rows and every ref
    // row's total, so it is query-scope persisted.
    val aggRow = graft.core.QueryCaches.track(
      df.agg(count(lit(1)).as("_n"), violExprs: _*))
    val scalarRows = aggRow.select(col("_n").as("total"),
      explode(array(scalar.zipWithIndex.map { case (c, i) =>
        struct(lit(c.name).as("check_name"), col(s"_v$i").as("violations"))
      }: _*)).as("_c"))
      .select(col("_c.check_name").as("check_name"),
        col("_c.violations").as("violations"), col("total"))
    val refRows = refs.map { r =>
      df.select(col(r.column).as("_k")).filter(col("_k").isNotNull)
        .join(r.dim.select(col(r.dimColumn).as("_k")).distinct(),
          Seq("_k"), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .crossJoin(broadcast(aggRow.select(col("_n").as("total"))))
        .select(lit(r.name).as("check_name"), col("violations"), col("total"))
    }
    refRows.foldLeft(scalarRows)(_ unionByName _)
      .withColumn("pass", col("violations") <= lit(maxViolations))
  }
}
