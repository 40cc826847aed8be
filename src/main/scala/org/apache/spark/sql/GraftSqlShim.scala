package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ClassicConversions._

/** `Dataset.ofRows` is private[sql]; extensions that build their own
  * logical plans (graft.plans.AsOfJoin) need this one-line bridge to
  * wrap a plan into a user-facing DataFrame. Standard practice for
  * Spark extension libraries.
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Column → catalyst Expression (ExpressionUtils is private[sql]). */
  def expr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
