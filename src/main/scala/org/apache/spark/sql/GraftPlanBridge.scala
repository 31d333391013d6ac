package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one place graft touches a `private[sql]` API: constructing a
  * DataFrame from a custom [[LogicalPlan]] node requires
  * `Dataset.ofRows`, which Spark exposes only inside its own package —
  * the standard bridge every Catalyst-extending library ships (same
  * access trick the public extension ecosystems use). Kept to a single
  * forwarding call so the private-API surface is auditable.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
