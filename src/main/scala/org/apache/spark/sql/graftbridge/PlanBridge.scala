package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge into `private[sql]` plan↔DataFrame conversion: lets library code
  * (package `graft`) build a DataFrame from a custom LogicalPlan node. In
  * Spark 4 the user-facing Dataset/SparkSession are thin api types; the
  * classic implementations carry the query-execution machinery.
  */
object PlanBridge {
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Expose the strategies an extensions object would inject (test hook for
    * the `spark.sql.extensions` registration path).
    */
  def plannerStrategies(ext: org.apache.spark.sql.SparkSessionExtensions,
                        spark: SparkSession): Seq[org.apache.spark.sql.execution.SparkStrategy] =
    ext.buildPlannerStrategies(spark.asInstanceOf[classic.SparkSession])
}
