package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal same-package bridge: `Dataset.ofRows` (the only public-API
  * gap when a library introduces its own `LogicalPlan` node) is
  * `private[sql]`, so custom-operator front-ends — here
  * graft.ext.AsOfJoin.asOfNative building a graft.plans.AsOfJoinPlan —
  * need one accessor compiled inside the `sql` package. Nothing else
  * lives here on purpose: every other Spark surface the library uses
  * is public API.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
