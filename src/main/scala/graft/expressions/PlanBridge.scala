package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** LogicalPlan ↔ DataFrame bridge. `Dataset.ofRows` and `queryExecution`
  * live behind `private[sql]`/classic walls, so — like [[ColumnBridge]] —
  * the two one-line adapters sit inside the sql package tree and the rest
  * of the library stays in `graft.*`. Used by the custom-operator tier
  * ([[graft.plans.AsOfJoinPlan]]) to wrap a hand-built logical node into
  * a normal DataFrame. */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed
}
