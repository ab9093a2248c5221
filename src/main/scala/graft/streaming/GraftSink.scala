package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.streaming.OutputMode

import graft.commands.WriteIntoGraft
import graft.log.GraftLog

/**
 * Exactly-once streaming sink: each micro-batch commits transactionally
 * with a `SetTransaction(queryId, batchId)` watermark, so a replayed
 * batch after restart is a no-op. Complete mode overwrites the table.
 * (Reference concept: sources/DeltaSink.scala:51-170 — re-designed.)
 */
class GraftSink(
    sqlContext: SQLContext,
    path: String,
    partitionColumns: Seq[String],
    outputMode: OutputMode,
    options: Map[String, String]) extends Sink {

  // Update mode emits only the CHANGED rows of stateful operators;
  // appending those accumulates one conflicting row per key per batch.
  // The table format cannot upsert from a sink, so reject at
  // construction (the reference sink does the same) instead of quietly
  // writing wrong data.
  require(outputMode == OutputMode.Append() || outputMode == OutputMode.Complete(),
    s"graft sink supports Append and Complete output modes, not $outputMode")

  private def spark: SparkSession = sqlContext.sparkSession

  override def addBatch(batchId: Long, data: Dataset[Row]): Unit = {
    val queryId = sqlContext.sparkContext
      .getLocalProperty("sql.streaming.queryId")
    require(queryId != null, "GraftSink requires a streaming query id")
    // The incoming Dataset is a streaming frame; re-plan its rows through
    // the batch write path.
    val batchDf = org.apache.spark.sql.graftshim.SparkShims
      .internalCreateDataFrame(
        spark, data.queryExecution.toRdd.map(_.copy()), data.schema)
    WriteIntoGraft(
      spark, path, batchDf,
      mode = if (outputMode == OutputMode.Complete()) "overwrite" else "append",
      partitionBy = partitionColumns,
      mergeSchema = options.get("mergeSchema").exists(_.toBoolean),
      txnAppId = Some(queryId),
      txnVersion = Some(batchId))
  }

  override def name(): String = s"GraftSink[$path]"

  override def toString: String = name()
}
