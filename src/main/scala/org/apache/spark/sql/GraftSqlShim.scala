package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/**
 * Minimal `private[sql]` bridge for the graft engine: build a DataFrame
 * from a hand-constructed logical plan (the documented pattern for Spark
 * extension libraries that add custom operators — the constructor is
 * session-internal but the capability is part of the extension surface).
 */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
