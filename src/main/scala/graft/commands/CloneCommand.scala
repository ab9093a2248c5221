package graft.commands

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftTable
import graft.log._

/**
 * SHALLOW CLONE: the destination's commit 0 references the source's data
 * files by absolute path — zero data movement; later writes land in the
 * clone's own directory. (Reference: commands/CloneTableCommand.scala:312.)
 */
object CloneCommand {
  def run(spark: SparkSession, src: GraftLog, dest: String,
      versionAsOf: Option[Long] = None): GraftTable = {
    val destLog = GraftLog.forTable(spark, dest)
    require(!destLog.tableExists, s"$dest already exists")
    val snap = versionAsOf match {
      case Some(v) => src.getSnapshotAt(v)
      case None => src.update()
    }
    // Absolutize BOTH the data path and any deletion-vector sidecar: a
    // relative dvPath would resolve against the clone's root and read a
    // bitmap that is not there (resurrecting deleted rows at best,
    // failing the scan at worst).
    val adds = snap.allFiles.map { f =>
      f.copy(
        path = new Path(src.dataPath, f.path).toString,
        dvPath = f.dvPath.map(dv => new Path(src.dataPath, dv).toString))
    }
    destLog.withNewTransaction { txn =>
      txn.updateMetadata(snap.metadata.copy(
        id = java.util.UUID.randomUUID.toString,
        createdTime = Some(System.currentTimeMillis())))
      txn.commit(adds, "CLONE",
        operationParameters = Map("source" -> src.dataPath.toString),
        operationMetrics = Map("numClonedFiles" -> adds.size.toString))
    }
    new GraftTable(spark, destLog)
  }
}

/**
 * GENERATE symlink_format_manifest: per-partition text files listing the
 * absolute data-file paths of the current snapshot (for engines that read
 * manifests). (Reference: hooks/GenerateSymlinkManifest.scala:50-102.)
 */
object ManifestCommand {
  def run(spark: SparkSession, log: GraftLog): Unit = {
    val snap = log.update()
    val base = new Path(log.dataPath, "_symlink_format_manifest")
    val store = log.store
    val byPartition = snap.allFiles.groupBy { f =>
      f.partitionValues.toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k=${Option(v).getOrElse("__HIVE_DEFAULT_PARTITION__")}" }
        .mkString("/")
    }
    byPartition.foreach { case (rel, files) =>
      val dir = if (rel.isEmpty) base else new Path(base, rel)
      val content = files
        .map(f => new Path(log.dataPath, f.path).toString).sorted.mkString("\n")
      store.writeOverwrite(new Path(dir, "manifest"), content + "\n")
    }
  }
}
