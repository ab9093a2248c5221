package graft.log

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/**
 * Row tracking: every row gets a stable 64-bit id. Fresh rows take
 * `baseRowId + row_index` (the AddFile's id range, assigned at commit
 * from a high watermark kept in the `graft.rowTracking` metadata domain);
 * rewrites that must preserve identity (OPTIMIZE / clustering) carry the
 * ids forward in a materialized `_graft_row_id` column, and reads
 * coalesce the materialized value over the computed default. Row ids are
 * stable under deletion-vector deletes for free — surviving rows keep
 * their physical positions. (Reference concept: Delta row tracking —
 * RowId.scala + DomainMetadata high watermark + materialized row id
 * column — re-designed: default ids come from the parquet reader's own
 * `_metadata.row_index`, materialization is a plain extra parquet column
 * readers outside the feature never request.)
 */
object RowTracking {

  val DOMAIN = "graft.rowTracking"
  val ROW_ID_COL = "_graft_row_id"
  val ROW_COMMIT_COL = "_graft_row_commit"

  def isEnabled(m: Metadata): Boolean =
    m.configuration.getOrElse("graft.enableRowTracking", "false").toBoolean

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def highWaterMark(domains: Map[String, String]): Long =
    domains.get(DOMAIN)
      .map(c => mapper.readTree(c).path("rowIdHighWaterMark").asLong(-1L))
      .getOrElse(-1L)

  private def numRecords(a: AddFile): Long =
    Option(a.stats).map(s => mapper.readTree(s).path("numRecords"))
      .filter(_.isNumber).map(_.asLong).getOrElse(-1L)

  /**
   * Assign fresh base row ids to AddFiles that lack one. Returns the
   * updated actions plus the domain watermark action to ride the commit,
   * or None when nothing needed assignment.
   */
  def assign(
      actions: Seq[Action],
      domains: Map[String, String]): (Seq[Action], Option[DomainMetadata]) = {
    val hwm0 = highWaterMark(domains)
    var hwm = hwm0
    val out = actions.map {
      case a: AddFile if a.baseRowId.isEmpty =>
        val n = numRecords(a)
        if (n < 0) a
        else { val base = hwm + 1; hwm += math.max(n, 1); a.copy(baseRowId = Some(base)) }
      case other => other
    }
    if (hwm == hwm0) (actions, None)
    else (out, Some(DomainMetadata(DOMAIN, s"""{"rowIdHighWaterMark":$hwm}""")))
  }

  /** Stamp the commit version onto freshly-tracked AddFiles (called per
    * commit attempt — the version moves on conflict retry). */
  def stampCommitVersion(actions: Seq[Action], version: Long): Seq[Action] =
    actions.map {
      case a: AddFile if a.baseRowId.isDefined && a.defaultRowCommitVersion.isEmpty =>
        a.copy(defaultRowCommitVersion = Some(version))
      case other => other
    }

  /**
   * Scan `files` with `_graft_row_id` / `_graft_row_commit` columns
   * appended (after the logical schema). Deletion vectors are applied;
   * materialized id columns in rewritten files win over the computed
   * `baseRowId + row_index` default.
   */
  def scanWithRowIds(
      spark: SparkSession,
      log: GraftLog,
      snapshot: Snapshot,
      files: Seq[AddFile]): DataFrame = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
    import org.apache.spark.sql.graftshim.SparkShims
    import graft.dv.DeletionVectors
    import graft.files.GraftFileIndex
    import graft.schema.ColumnMapping

    val m = snapshot.metadata
    val index = new GraftFileIndex(spark, log, snapshot, Some(files))
    // Extended read schema: files written before materialization (or
    // never rewritten) null-fill the extra columns.
    val dataSchema = StructType(
      ColumnMapping.physicalDataSchema(m).fields ++
        Seq(StructField(ROW_ID_COL, LongType), StructField(ROW_COMMIT_COL, LongType)))
    val relation = HadoopFsRelation(
      location = index,
      partitionSchema = index.partitionSchema,
      dataSchema = dataSchema,
      bucketSpec = None,
      fileFormat = DeletionVectors.readerFormat(log, files)
        .getOrElse(new ParquetFileFormat),
      options = Map.empty)(spark)
    var df = SparkShims.ofRows(spark, LogicalRelation(relation))
      .withColumn("__f", DeletionVectors.normFileCol(col("_metadata.file_path")))
      .withColumn("__i", col("_metadata.row_index"))

    // file -> (baseRowId, defaultRowCommitVersion), broadcast-joined on
    // the normalized file key (file count is metadata-scale).
    import spark.implicits._
    val lookup = spark.createDataset(files.map { f =>
      (DeletionVectors.fileKey(log, f),
        f.baseRowId.getOrElse(-1L),
        f.defaultRowCommitVersion.getOrElse(-1L))
    }).toDF("__rt_file", "__rt_base", "__rt_ver")
    df = df.join(broadcast(lookup), df("__f") === lookup("__rt_file"), "left")
      .withColumn(ROW_ID_COL,
        coalesce(col(ROW_ID_COL),
          when(col("__rt_base") >= 0, col("__rt_base") + col("__i"))))
      .withColumn(ROW_COMMIT_COL,
        coalesce(col(ROW_COMMIT_COL),
          when(col("__rt_ver") >= 0, col("__rt_ver"))))
      .drop("__f", "__i", "__rt_file", "__rt_base", "__rt_ver")
    // physical -> logical rename (nested fields rename via struct cast),
    // keeping the id columns last
    val byPhysical = m.schema.fields.map(f => ColumnMapping.physicalName(f) -> f).toMap
    df.select(df.columns.filterNot(Set(ROW_ID_COL, ROW_COMMIT_COL)).map { c =>
      byPhysical.get(c) match {
        case Some(f) =>
          val pt = ColumnMapping.physicalType(f.dataType)
          (if (pt == f.dataType) col(c) else col(c).cast(f.dataType)).as(f.name)
        case None => col(c)
      }
    } ++ Seq(col(ROW_ID_COL), col(ROW_COMMIT_COL)): _*)
  }
}
