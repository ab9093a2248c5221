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
      dataSchema = phys.schema, collectStats = false, optimizeWrite = Some(false))
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

    // ONE scan per change class for the whole range — a per-version
    // union would grow the plan linearly with the range (a 10k-commit
    // CDF read must not build a 20k-way union). Per-file commit version
    // and timestamp attach via a broadcast lookup on the file path.
    val cdcF = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    val addF = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    val remF = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    (startVersion to end).foreach { v =>
      val actions = log.readCommit(v)
      val ts = timestamps.getOrElse(v, 0L)
      val cdcFiles = actions.collect { case c: AddCdcFile => c }
      if (cdcFiles.nonEmpty) cdcFiles.foreach(c => cdcF += ((c.path, v, ts)))
      else {
        actions.collect { case a: AddFile if a.dataChange => a }
          .foreach(a => addF += ((a.path, v, ts)))
        actions.collect { case r: RemoveFile if r.dataChange => r }
          .foreach(r => remF += ((r.path, v, ts)))
      }
    }

    def attach(df: DataFrame, entries: Seq[(String, Long, Long)]): DataFrame = {
      import spark.implicits._
      val lookup = broadcast(entries.map { case (rel, v, ts) =>
        (new Path(log.dataPath, rel).toUri.getPath, v, ts)
      }.toDF("__p", "__v", "__ts"))
      df.withColumn("__np",
          graft.dv.DeletionVectors.normFileCol(input_file_name()))
        .join(lookup, col("__np") === col("__p"))
        .withColumn(COMMIT_VERSION, col("__v"))
        .withColumn(COMMIT_TIMESTAMP, timestamp_millis(col("__ts")))
        .drop("__np", "__p", "__v", "__ts")
    }

    val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    if (cdcF.nonEmpty) {
      import graft.schema.ColumnMapping
      val m = snap.metadata
      val physFull = StructType(m.schema.fields.map(ColumnMapping.physicalField))
      val df = spark.read
        .schema(StructType(physFull.fields :+ StructField(CHANGE_TYPE, StringType)))
        .parquet(cdcF.map(e => new Path(log.dataPath, e._1).toString).distinct.toSeq: _*)
        .select((m.schema.fields.toSeq.map(f =>
          col(ColumnMapping.physicalName(f)).as(f.name)) :+ col(CHANGE_TYPE)): _*)
      frames += attach(df, cdcF.toSeq)
    }
    if (addF.nonEmpty) {
      frames += attach(
        readFiles(spark, log, schema, addF.map(_._1).distinct.toSeq)
          .withColumn(CHANGE_TYPE, lit("insert")),
        addF.toSeq)
    }
    if (remF.nonEmpty) {
      frames += attach(
        readFiles(spark, log, schema, remF.map(_._1).distinct.toSeq)
          .withColumn(CHANGE_TYPE, lit("delete")),
        remF.toSeq)
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
