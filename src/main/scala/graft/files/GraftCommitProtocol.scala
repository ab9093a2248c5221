package graft.files

import java.util.UUID

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{JobContext, TaskAttemptContext}
import org.apache.spark.internal.io.{FileCommitProtocol, FileNameSpec}
import org.apache.spark.internal.io.FileCommitProtocol.TaskCommitMessage
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils

import graft.log.AddFile

/**
 * Commit protocol that writes data files directly to their final location
 * with globally-unique names, and reports them back to the driver as
 * `AddFile`s instead of committing anything to the filesystem. Visibility
 * is controlled solely by the transaction log, so no renames are needed —
 * crucial on object stores where rename is a copy. (Reference concept:
 * DelayedCommitProtocol, /root/reference/spark/.../files/
 * DelayedCommitProtocol.scala:53-250 — re-implemented.)
 */
class GraftCommitProtocol(
    jobId: String,
    tablePath: String,
    randomPrefixLength: Option[Int] = None)
    extends FileCommitProtocol with Serializable {

  // Driver-side result, populated by commitJob.
  @transient var addedFiles: Seq[AddFile] = Nil

  // Task-side staging: (partitionDir, relativePath, absolutePath). The
  // partition dir is tracked separately from the path: with randomized
  // prefixes the hive-style dir never appears on disk (partition values
  // live only in the log).
  @transient private var taskFiles: ArrayBuffer[(Option[String], String, Path)] = _

  override def setupJob(jobContext: JobContext): Unit = ()

  override def commitJob(
      jobContext: JobContext,
      taskCommits: Seq[TaskCommitMessage]): Unit = {
    addedFiles = taskCommits.flatMap(_.obj.asInstanceOf[Seq[AddFile]])
  }

  override def abortJob(jobContext: JobContext): Unit = ()

  override def setupTask(taskContext: TaskAttemptContext): Unit = {
    taskFiles = new ArrayBuffer[(Option[String], String, Path)]
  }

  override def newTaskTempFile(
      taskContext: TaskAttemptContext,
      dir: Option[String],
      spec: FileNameSpec): String = {
    val split = taskContext.getTaskAttemptID.getTaskID.getId
    val name =
      f"${spec.prefix}part-$split%05d-${UUID.randomUUID}${spec.suffix}"
    // Randomized prefixes (graft.randomizeFilePrefixes) REPLACE the
    // hive-style partition dir on disk: object stores shard their key
    // ranges by prefix, so a write-heavy table fans its load across
    // prefixes instead of hammering one partition's range (reference
    // concept: DelayedCommitProtocol randomPrefixLength — re-designed).
    // Partition values still ride the log; nothing reads them from paths.
    val relPath = randomPrefixLength
      .map(n => s"${GraftCommitProtocol.randomPrefix(n)}/$name")
      .orElse(dir.map(d => s"$d/$name"))
      .getOrElse(name)
    val abs = new Path(tablePath, relPath)
    taskFiles += ((dir, relPath, abs))
    abs.toString
  }

  override def newTaskTempFile(
      taskContext: TaskAttemptContext,
      dir: Option[String],
      ext: String): String =
    newTaskTempFile(taskContext, dir, FileNameSpec("", ext))

  override def newTaskTempFileAbsPath(
      taskContext: TaskAttemptContext,
      absoluteDir: String,
      ext: String): String =
    throw new UnsupportedOperationException(
      "graft does not support absolute-path writes")

  override def commitTask(taskContext: TaskAttemptContext): TaskCommitMessage = {
    val conf = taskContext.getConfiguration
    val adds: Seq[AddFile] = taskFiles.toSeq.map { case (dir, rel, path) =>
      val fs = path.getFileSystem(conf)
      val status = fs.getFileStatus(path)
      AddFile(
        path = rel,
        partitionValues = dir.map(GraftCommitProtocol.parsePartitions).getOrElse(Map.empty),
        size = status.getLen,
        modificationTime = status.getModificationTime,
        dataChange = true)
    }
    new TaskCommitMessage(adds)
  }

  override def abortTask(taskContext: TaskAttemptContext): Unit = {
    if (taskFiles != null) taskFiles.foreach { case (_, _, path) =>
      try path.getFileSystem(taskContext.getConfiguration).delete(path, false)
      catch { case _: Throwable => }
    }
  }
}

object GraftCommitProtocol {
  private val PREFIX_CHARS =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
  def randomPrefix(n: Int): String = {
    val r = java.util.concurrent.ThreadLocalRandom.current()
    val sb = new StringBuilder(n)
    var i = 0
    while (i < n) { sb.append(PREFIX_CHARS.charAt(r.nextInt(PREFIX_CHARS.length))); i += 1 }
    sb.toString
  }

  /** Parse a hive-style partition dir ("a=1/b=x%20y") into values. */
  def parsePartitions(dir: String): Map[String, String] = {
    dir.split("/").filter(_.nonEmpty).map { seg =>
      val i = seg.indexOf('=')
      require(i > 0, s"Invalid partition path segment: $seg")
      val k = ExternalCatalogUtils.unescapePathName(seg.take(i))
      val raw = seg.drop(i + 1)
      val v = if (raw == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) null
              else ExternalCatalogUtils.unescapePathName(raw)
      k -> v
    }.toMap
  }
}
