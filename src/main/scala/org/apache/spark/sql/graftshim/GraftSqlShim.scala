package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one place graft touches `private[sql]` surface: constructing a
  * DataFrame from a custom logical node (`Dataset.ofRows` has no public
  * equivalent). Standard practice for Spark extension libraries — kept
  * to a single shim so the dependency is auditable. */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
