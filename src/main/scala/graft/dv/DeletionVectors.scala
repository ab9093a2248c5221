package graft.dv

import java.io.{DataInputStream, DataOutputStream}
import java.util.UUID

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.SerializableConfiguration
import org.roaringbitmap.RoaringBitmap

import graft.log.{AddFile, GraftLog, Metadata, Snapshot}

/**
 * Deletion vectors: per-file RoaringBitmap sidecars of deleted row
 * indexes under `_dv/`, so a point DELETE on a 1 GB file writes a few-KB
 * bitmap instead of rewriting the file. Read-side application is an
 * anti-join of the scan (keyed by `_metadata.file_path` +
 * `_metadata.row_index`) against the exploded bitmaps — broadcast when
 * the total cardinality is small, shuffled otherwise, so the filter
 * scales with deleted-row count, not table size.
 * (Reference concept: deletionvectors/RoaringBitmapArray.scala:46 +
 * DMLWithDeletionVectorsHelper.scala:132-448 + RowIndexMarkingFilters —
 * re-designed: the reference splices a row-filter into its parquet
 * reader; Spark-first we join on the parquet reader's own row_index
 * metadata column and let Catalyst pick the join strategy.)
 */
object DeletionVectors {

  val DIR = "_dv"
  /** Below this many deleted rows the anti-join side is broadcast. */
  val BROADCAST_MAX_CARDINALITY = 4L * 1000 * 1000

  def isEnabled(m: Metadata): Boolean =
    m.configuration.getOrElse("graft.enableDeletionVectors", "false").toBoolean

  /** Normalize a file URI/path to a bare absolute path, matching
    * `new Path(root, rel).toUri.getPath` on the driver side. */
  def normFileCol(c: Column): Column =
    regexp_replace(url_decode(c), "^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/")

  def fileKey(log: GraftLog, f: AddFile): String = {
    val p = new Path(f.path)
    val abs = if (p.isAbsolute) p else new Path(log.dataPath, f.path)
    abs.toUri.getPath
  }

  // ---- sidecar IO ---------------------------------------------------------

  def writeBitmap(path: Path, conf: Configuration, bm: RoaringBitmap): Long = {
    bm.runOptimize()
    val fs = path.getFileSystem(conf)
    fs.mkdirs(path.getParent)
    val out = new DataOutputStream(fs.create(path, false))
    try bm.serialize(out) finally out.close()
    fs.getFileStatus(path).getLen
  }

  def readBitmap(path: Path, conf: Configuration): RoaringBitmap = {
    val fs = path.getFileSystem(conf)
    val in = new DataInputStream(fs.open(path))
    try { val bm = new RoaringBitmap(); bm.deserialize(in); bm } finally in.close()
  }

  // ---- read path ----------------------------------------------------------

  /** (fileKey, rowIndex) rows of every DV among `files`, read distributed. */
  private def dvEntries(
      spark: SparkSession,
      log: GraftLog,
      dvFiles: Seq[AddFile]): DataFrame = {
    import spark.implicits._
    val confBc = new SerializableConfiguration(spark.sessionState.newHadoopConf())
    val root = log.dataPath.toString
    val pairs = dvFiles.map(f => (fileKey(log, f), f.dvPath.get))
    spark.createDataset(pairs)
      .repartition(math.max(1, math.min(pairs.size, 64)))
      .flatMap { case (key, rel) =>
        val bm = readBitmap(new Path(new Path(root), rel), confBc.value)
        val it = bm.iterator
        val buf = mutable.ArrayBuffer.empty[(String, Long)]
        while (it.hasNext) buf += ((key, (it.next().toLong) & 0xFFFFFFFFL))
        buf
      }
      .toDF("__dv_file", "__dv_idx")
  }

  /** Anti-join a scan that already carries __f/__i row-identity columns. */
  def antiJoin(
      spark: SparkSession,
      log: GraftLog,
      df: DataFrame,
      files: Seq[AddFile]): DataFrame = {
    val dvFiles = files.filter(_.dvPath.isDefined)
    if (dvFiles.isEmpty) return df
    val entries = dvEntries(spark, log, dvFiles)
    val total = dvFiles.flatMap(_.dvCardinality).sum
    val right = if (total <= BROADCAST_MAX_CARDINALITY) broadcast(entries) else entries
    df.join(right,
      df("__f") === right("__dv_file") && df("__i") === right("__dv_idx"),
      "left_anti")
  }

  /** Apply DVs to a plain scan DataFrame (schema preserved). */
  def filterDeleted(
      spark: SparkSession,
      log: GraftLog,
      df: DataFrame,
      files: Seq[AddFile]): DataFrame = {
    if (!files.exists(_.dvPath.isDefined)) return df
    val withIds = df
      .withColumn("__f", normFileCol(col("_metadata.file_path")))
      .withColumn("__i", col("_metadata.row_index"))
    antiJoin(spark, log, withIds, files).drop("__f", "__i")
  }

  // ---- write path (DELETE) ------------------------------------------------

  /**
   * Write merged deletion vectors for `matched` (rows of a DV-filtered
   * scan of `touched` carrying __f/__i). Bitmaps are built per file on
   * the executors (rows arrive clustered by __f), merged with any
   * existing DV, and committed as RemoveFile + AddFile-with-DV — no data
   * file is written.
   */
  def writeDeletionVectors(
      spark: SparkSession,
      log: GraftLog,
      touched: Seq[AddFile],
      matched: DataFrame): (Seq[graft.log.RemoveFile], Seq[AddFile], Long) = {
    import spark.implicits._
    val confBc = new SerializableConfiguration(spark.sessionState.newHadoopConf())
    val root = log.dataPath.toString
    val byKey = touched.map(f => fileKey(log, f) -> f).toMap
    val oldDvByKey = touched.filter(_.dvPath.isDefined)
      .map(f => fileKey(log, f) -> f.dvPath.get).toMap
    val oldDvBc = spark.sparkContext.broadcast(oldDvByKey)

    val written: Array[(String, String, Long)] = matched
      .select(col("__f").as[String], col("__i").as[Long])
      .repartition(col("__f"))
      .sortWithinPartitions("__f", "__i")
      .mapPartitions { it =>
        val conf = confBc.value
        val out = mutable.ArrayBuffer.empty[(String, String, Long)]
        var current: String = null
        var bm: RoaringBitmap = null
        def flush(): Unit = if (current != null) {
          oldDvBc.value.get(current).foreach { oldRel =>
            bm.or(readBitmap(new Path(new Path(root), oldRel), conf))
          }
          val rel = s"$DIR/dv-${UUID.randomUUID}.bin"
          writeBitmap(new Path(new Path(root), rel), conf, bm)
          out += ((current, rel, bm.getLongCardinality))
        }
        it.foreach { case (f, i) =>
          if (f != current) { flush(); current = f; bm = new RoaringBitmap() }
          bm.add(i.toInt)
        }
        flush()
        out.iterator
      }.collect()

    val now = System.currentTimeMillis()
    val removes = written.toSeq.map { case (key, _, _) => byKey(key).remove(now) }
    val adds = written.toSeq.map { case (key, rel, card) =>
      byKey(key).copy(dvPath = Some(rel), dvCardinality = Some(card),
        modificationTime = now, dataChange = true)
    }
    val newlyDeleted = written.map { case (key, _, card) =>
      card - byKey(key).dvCardinality.getOrElse(0L)
    }.sum
    (removes, adds, newlyDeleted)
  }
}
