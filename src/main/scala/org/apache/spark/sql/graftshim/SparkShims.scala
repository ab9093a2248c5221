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

  def logicalPlan(df: DataFrame): LogicalPlan =
    df.queryExecution.logical

  /** DataFrame from InternalRows (e.g. re-planning a streaming
    * micro-batch through the batch write path, or wrapping a batch plan
    * as a streaming getBatch result). */
  def internalCreateDataFrame(
      spark: SparkSession,
      rows: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType,
      isStreaming: Boolean = false): DataFrame =
    spark.asInstanceOf[ClassicSession]
      .internalCreateDataFrame(rows, schema, isStreaming)
}
