package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, ExpressionUtils, SparkSession => ClassicSession}

/**
 * Bridge into `private[sql]` Spark internals (plan→DataFrame and
 * Column↔Expression conversion). Lives under org.apache.spark.sql so the
 * access checks pass — the same technique Spark connector libraries use.
 */
object SparkShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  def column(e: Expression): Column = ExpressionUtils.column(e)
}
