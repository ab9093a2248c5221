package graft.commands

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.files.TransactionalWrite
import graft.log._

/**
 * Change Data Feed plumbing: DML commands write row-level change files
 * under `_change_data/`; readers union them with plain add/remove commits.
 * (Reference concept: commands/cdc/CDCReader.scala:64-230 — re-designed.)
 */
object Cdc {
  val CHANGE_TYPE = "_change_type"
  val COMMIT_VERSION = "_commit_version"
  val COMMIT_TIMESTAMP = "_commit_timestamp"

  def isEnabled(metadata: Metadata): Boolean =
    metadata.configuration.getOrElse("graft.enableChangeDataFeed", "false").toBoolean

  /** Write change rows (must carry a `_change_type` column). Data columns
    * are stored under their PHYSICAL names: those never change, so change
    * files written before a RENAME COLUMN stay readable after it. */
  def writeChangeFiles(
      spark: SparkSession,
      log: GraftLog,
      changes: DataFrame): Seq[AddCdcFile] = {
    import graft.schema.ColumnMapping
    val m = log.snapshot.metadata
    val physCols = changes.columns.toSeq.map { c =>
      m.schema.fields.find(_.name.equalsIgnoreCase(c))
        .map(f => org.apache.spark.sql.functions.col(c).as(ColumnMapping.physicalName(f)))
        .getOrElse(org.apache.spark.sql.functions.col(c))
    }
    val phys = changes.select(physCols: _*)
    val dir = new Path(log.dataPath, "_change_data")
    val adds = TransactionalWrite.writeFiles(
      spark, dir, phys, partitionColumns = Nil,
      dataSchema = phys.schema, collectStats = false, optimizeWrite = false)
    adds.map(a => AddCdcFile(s"_change_data/${a.path}", a.partitionValues, a.size))
  }

  /** Batch CDF read across a version range (inclusive). */
  def changes(
      spark: SparkSession,
      log: GraftLog,
      startVersion: Long,
      endVersion: Long): DataFrame = {
    val snap = log.snapshot
    val end = math.min(endVersion, snap.version)
    val schema = snap.metadata.schema
    val timestamps = log.listCommitTimestamps().toMap
    val frames = (startVersion to end).flatMap { v =>
      val actions = log.readCommit(v)
      val ts = new java.sql.Timestamp(timestamps.getOrElse(v, 0L))
      val cdcFiles = actions.collect { case c: AddCdcFile => c }
      val tag = (df: DataFrame, tpe: Option[String]) => {
        val base = tpe.map(t => df.withColumn(CHANGE_TYPE, lit(t))).getOrElse(df)
        base.withColumn(COMMIT_VERSION, lit(v))
          .withColumn(COMMIT_TIMESTAMP, lit(ts))
      }
      if (cdcFiles.nonEmpty) {
        import graft.schema.ColumnMapping
        val m = snap.metadata
        val paths = cdcFiles.map(c => new Path(log.dataPath, c.path).toString)
        val physFull = StructType(m.schema.fields.map(ColumnMapping.physicalField))
        val df = spark.read
          .schema(StructType(physFull.fields :+ StructField(CHANGE_TYPE, StringType)))
          .parquet(paths: _*)
          .select((m.schema.fields.toSeq.map(f =>
            col(ColumnMapping.physicalName(f)).as(f.name)) :+ col(CHANGE_TYPE)): _*)
        Seq(tag(df, None))
      } else {
        val adds = actions.collect { case a: AddFile if a.dataChange => a }
        val removes = actions.collect { case r: RemoveFile if r.dataChange => r }
        val insertDf =
          if (adds.isEmpty) Nil
          // adds in this commit, read with the current schema
          else Seq(tag(readFiles(spark, log, schema, adds.map(_.path)), Some("insert")))
        val deleteDf =
          if (removes.isEmpty) Nil
          else Seq(tag(readFiles(spark, log, schema, removes.map(_.path),
            removes.map(r => r.path -> Option(r.partitionValues).getOrElse(Map.empty)).toMap),
            Some("delete")))
        insertDf ++ deleteDf
      }
    }
    val empty = {
      val s = StructType(schema.fields ++ Seq(
        StructField(CHANGE_TYPE, StringType),
        StructField(COMMIT_VERSION, org.apache.spark.sql.types.LongType),
        StructField(COMMIT_TIMESTAMP, org.apache.spark.sql.types.TimestampType)))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
    }
    frames.foldLeft(empty)(_ unionByName _)
  }

  /** Read table-relative file paths with partition values re-attached.
    * Files are read under PHYSICAL column names (stable across renames)
    * and projected back to the current logical names. */
  private def readFiles(
      spark: SparkSession,
      log: GraftLog,
      schema: StructType,
      relPaths: Seq[String],
      partitionValues: Map[String, Map[String, String]] = Map.empty): DataFrame = {
    import graft.schema.ColumnMapping
    val meta = log.snapshot.metadata
    val partCols = meta.partitionColumns
    val dataSchema = ColumnMapping.physicalDataSchema(meta)
    val paths = relPaths.map(p => new Path(log.dataPath, p).toString)
    var df = spark.read.schema(dataSchema).parquet(paths: _*)
    if (partCols.nonEmpty) {
      // Recover partition values from the file path (hive-style dirs,
      // physical directory names).
      df = df.withColumn("__path", input_file_name())
      partCols.foreach { c =>
        val field = schema(c)
        val phys = ColumnMapping.physicalName(field)
        df = df.withColumn(phys,
          regexp_extract(url_decode(col("__path")), s"/$phys=([^/]*)/", 1)
            .cast(field.dataType))
      }
      df = df.drop("__path")
    }
    df.select(schema.fields.toIndexedSeq.map(f =>
      col(ColumnMapping.physicalName(f)).as(f.name)): _*)
  }
}
