package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway this library uses: constructing a
  * DataFrame from a custom [[LogicalPlan]] node
  * ([[graft.plans.TopKPerGroupNode]]) has no public API, and every
  * Spark-native library that ships its own plan nodes opens the same
  * door (a bridge object inside `org.apache.spark.sql`). Nothing else
  * in the library reaches past the public surface. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
