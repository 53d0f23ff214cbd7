package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** `Dataset.ofRows` is `private[sql]` in Spark 4 — this is the standard way
  * an extension library turns a custom [[LogicalPlan]] node into a user
  * `DataFrame` (the Column/Dataset API has no public constructor for plans
  * since the Connect split). */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
