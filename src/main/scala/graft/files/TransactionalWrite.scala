package graft.files

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}
import org.apache.spark.sql.execution.datasources.FileFormatWriter
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.log.AddFile
import graft.stats.FooterStats

/**
 * Physical write of a DataFrame as new Parquet files under the table root,
 * returning the `AddFile`s to commit. Uses Spark's `FileFormatWriter`
 * directly (no directory listing, no rename) with a log-only commit
 * protocol — the write is invisible until the log commit lands.
 * (Reference concept: files/TransactionalWrite.scala:247 — re-designed.)
 */
object TransactionalWrite {

  /**
   * @param optimizeWrite when true and the table is partitioned, shuffle
   *   rows by partition key first so each table-partition is written by a
   *   bounded number of tasks instead of (tasks × partitions) small files.
   *   At 100 TB this is the difference between 1e5 and 1e8 files.
   */
  def writeFiles(
      spark: SparkSession,
      tablePath: Path,
      data: DataFrame,
      partitionColumns: Seq[String],
      dataSchema: StructType,
      collectStats: Boolean = true,
      optimizeWrite: Boolean = true,
      statsColumns: FooterStats.StatsColumns = FooterStats.StatsColumns()): Seq[AddFile] = {
    val classic = spark.asInstanceOf[ClassicSession]
    val resolver = spark.sessionState.analyzer.resolver

    val df =
      if (optimizeWrite && partitionColumns.nonEmpty) {
        // One shuffle keyed on the partition columns: map-side this also
        // gives AQE a chance to coalesce tiny partitions.
        data.repartition(partitionColumns.map(col): _*)
      } else data

    val qe = df.queryExecution
    val output: Seq[Attribute] = qe.analyzed.output
    val partAttrs = partitionColumns.map { name =>
      output.find(a => resolver(a.name, name)).getOrElse(
        throw new IllegalArgumentException(
          s"Partition column $name not found in ${output.map(_.name)}"))
    }

    val committer = new GraftCommitProtocol(UUID.randomUUID.toString, tablePath.toString)
    // Write timestamps as annotated TIMESTAMP_MICROS, not Spark's default
    // INT96: INT96 min/max footer stats have no defined ordering (Parquet
    // spec), so INT96 files would carry no usable timestamp skipping stats.
    val tsKey = "spark.sql.parquet.outputTimestampType"
    val prevTs = spark.conf.getOption(tsKey)
    spark.conf.set(tsKey, "TIMESTAMP_MICROS")
    try {
      FileFormatWriter.write(
        sparkSession = classic,
        plan = qe.executedPlan,
        fileFormat = new ParquetFileFormat,
        committer = committer,
        outputSpec = FileFormatWriter.OutputSpec(tablePath.toString, Map.empty, output),
        hadoopConf = spark.sessionState.newHadoopConf(),
        partitionColumns = partAttrs,
        bucketSpec = None,
        statsTrackers = Nil,
        options = Map.empty)
    } finally {
      prevTs match {
        case Some(v) => spark.conf.set(tsKey, v)
        case None => spark.conf.unset(tsKey)
      }
    }

    val adds = committer.addedFiles
    if (collectStats)
      FooterStats.withStats(spark, tablePath, adds, dataSchema, statsColumns)
    else adds
  }
}
