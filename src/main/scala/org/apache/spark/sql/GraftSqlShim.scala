package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway a custom logical operator needs: turn
  * a hand-built LogicalPlan into a DataFrame. This is the standard
  * extension-library shim (a file compiled into the org.apache.spark.sql
  * package) — everything else in graft.plans uses only public APIs.
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def analyzedPlan(df: DataFrame): LogicalPlan = df.queryExecution.analyzed
}
