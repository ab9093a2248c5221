package graft.dv

import java.io.{DataInputStream, DataOutputStream}
import java.util.UUID

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.SerializableConfiguration

import graft.log.{AddFile, GraftLog, Metadata, Snapshot}

/**
 * Deletion vectors: per-file [[Bitmap64]] sidecars of deleted row
 * indexes under `_dv/`, so a point DELETE on a 1 GB file writes a few-KB
 * bitmap instead of rewriting the file. Read-side application is spliced
 * into the parquet reader itself ([[GraftParquetFileFormat]]): each task
 * consults the bitmap for its own file against the reader-generated row
 * index — a narrow per-split filter, no join and no shuffle at any
 * deleted-row cardinality.
 * (Reference concept: deletionvectors/RoaringBitmapArray.scala:46 +
 * DMLWithDeletionVectorsHelper.scala:132-448 +
 * DeltaParquetFileFormat.scala:161-266 — re-designed.)
 */
object DeletionVectors {

  val DIR = "_dv"

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

  /** Materialize a DETERMINISTICALLY-NAMED sidecar, crash- and
    * race-safe: trust an existing file only when its length matches the
    * expected serialization (a writer killed mid-create leaves a
    * truncated file behind the deterministic name), else write a temp
    * sibling and rename atomically — never create in place. Racing
    * retries produce identical bytes, so any rename winner is correct.
    * The ONE copy of this dance — convert re-encode and Delta-mirror
    * export both go through it. */
  def materializeSidecar(fs: org.apache.hadoop.fs.FileSystem, target: Path,
      expectedLen: Long)(write: Path => Unit): Unit = {
    val valid = try fs.getFileStatus(target).getLen == expectedLen
      catch { case _: java.io.FileNotFoundException => false }
    if (!valid) {
      val tmp = new Path(target.getParent,
        s".${target.getName}.${UUID.randomUUID()}.tmp")
      write(tmp)
      try {
        if (fs.exists(target)) fs.delete(target, false)
        if (!fs.rename(tmp, target))
          require(fs.exists(target),
            s"could not materialize DV sidecar $target")
      } finally if (fs.exists(tmp)) fs.delete(tmp, false)
    }
  }

  def writeBitmap(path: Path, conf: Configuration, bm: Bitmap64): Long = {
    bm.runOptimize()
    val fs = path.getFileSystem(conf)
    fs.mkdirs(path.getParent)
    val out = new DataOutputStream(fs.create(path, false))
    try bm.serialize(out) finally out.close()
    fs.getFileStatus(path).getLen
  }

  def readBitmap(path: Path, conf: Configuration): Bitmap64 = {
    val fs = path.getFileSystem(conf)
    val in = new DataInputStream(fs.open(path))
    try Bitmap64.deserialize(in) finally in.close()
  }

  // ---- read path ----------------------------------------------------------

  /** The DV-splicing parquet format for `files`, or None when no file
    * carries a DV (callers keep the plain columnar ParquetFileFormat). */
  def readerFormat(
      log: GraftLog,
      files: Seq[AddFile]): Option[GraftParquetFileFormat] = {
    val dvFiles = files.filter(_.dvPath.isDefined)
    if (dvFiles.isEmpty) None
    else Some(new GraftParquetFileFormat(
      log.dataPath.toString,
      dvFiles.map(f => fileKey(log, f) -> f.dvPath.get).toMap))
  }

  /** Executor-side LRU of deserialized bitmaps, so multiple splits of the
    * same file (or retries) load the sidecar once. Bitmaps are immutable
    * after load. */
  private val bitmapCache =
    new java.util.LinkedHashMap[String, Bitmap64](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Bitmap64]): Boolean = size() > 256
    }

  def cachedBitmap(root: String, rel: String, conf: Configuration): Bitmap64 = {
    val key = s"$root/$rel"
    bitmapCache.synchronized {
      val hit = bitmapCache.get(key)
      if (hit != null) return hit
    }
    val bm = readBitmap(new Path(new Path(root), rel), conf)
    bitmapCache.synchronized { bitmapCache.put(key, bm) }
    bm
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
        var bm: Bitmap64 = null
        def flush(): Unit = if (current != null) {
          oldDvBc.value.get(current).foreach { oldRel =>
            bm.or(readBitmap(new Path(new Path(root), oldRel), conf))
          }
          val rel = s"$DIR/dv-${UUID.randomUUID}.bin"
          writeBitmap(new Path(new Path(root), rel), conf, bm)
          out += ((current, rel, bm.cardinality))
        }
        it.foreach { case (f, i) =>
          if (f != current) { flush(); current = f; bm = new Bitmap64() }
          bm.add(i)
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
