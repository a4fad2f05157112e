package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one sanctioned crack in the `private[sql]` wall: building a
  * DataFrame from a custom LogicalPlan (graft.plans.TopKPerKeyNode)
  * requires `Dataset.ofRows`, which Spark scopes to its own package —
  * so this bridge lives inside it, the same pattern every LogicalPlan-
  * extending Spark library uses. Nothing else from the internal API
  * is touched here. */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
