package graft

import java.nio.file.{Files => JFiles}

import org.apache.spark.sql.functions._

/** checkpointProtection feature: DROP FEATURE ... TRUNCATE HISTORY seals
  * the log at a boundary checkpoint; cleanup below the boundary is
  * all-or-nothing. */
class CheckpointProtectionSuite extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def tmpDir(): String = JFiles.createTempDirectory("graft-ckprot").toString

  test("DROP FEATURE TRUNCATE HISTORY seals and truncates the log") {
    val dir = tmpDir()
    Graft.write(spark.range(100).toDF("id"), dir,
      configuration = Map("graft.enableDeletionVectors" -> "true"))
    val t = GraftTable.forPath(spark, dir)
    t.delete($"id" < 20)
    t.reorgPurge()
    spark.sql(
      s"ALTER TABLE graft.`$dir` DROP FEATURE deletionVectors TRUNCATE HISTORY")
    val snap = GraftTable.forPath(spark, dir).snapshot
    assert(!snap.protocol.writerFeatures.exists(_.contains("deletionVectors")))
    assert(snap.protocol.writerFeatures.exists(_.contains("checkpointProtection")),
      s"expected checkpointProtection in ${snap.protocol}")
    val boundary = snap.metadata.configuration(
      "graft.requireCheckpointProtectionBeforeVersion").toLong
    // every pre-boundary commit is gone from the log directory
    val logFiles = new java.io.File(s"$dir/_graft_log").listFiles().map(_.getName)
    val survivingDeltas = logFiles.flatMap(graft.log.FileNames.deltaVersion(_))
    assert(survivingDeltas.nonEmpty && survivingDeltas.forall(_ >= boundary - 1),
      s"pre-boundary deltas survived: ${survivingDeltas.sorted.toSeq} vs $boundary")
    // cold load reads from the boundary checkpoint
    graft.log.GraftLog.clearCache()
    assert(Graft.read(spark, dir).count() === 80)
    // history below the boundary is gone by design
    intercept[Exception] { Graft.readVersion(spark, dir, 0).count() }
  }

  test("cleanup below the boundary is all-or-nothing") {
    val dir = tmpDir()
    (0 until 12).foreach(_ => Graft.write(spark.range(5).toDF("id"), dir))
    val log = graft.log.GraftLog.forTable(spark, dir)
    val cpVersion = log.update().version // checkpoint hook fired at v9
    // boundary ABOVE the latest checkpoint: nothing below it may go, even
    // though every file is expired
    GraftTable.forPath(spark, dir).upsertProperties(Map(
      "graft.requireCheckpointProtectionBeforeVersion" -> (cpVersion + 100).toString))
    assert(log.cleanUpExpiredLogs(retentionMillis = -60000L) === 0)
    // boundary at/below the latest checkpoint: the full prefix sweeps
    GraftTable.forPath(spark, dir).upsertProperties(Map(
      "graft.requireCheckpointProtectionBeforeVersion" -> "3"))
    assert(log.cleanUpExpiredLogs(retentionMillis = -60000L) > 0)
    graft.log.GraftLog.clearCache()
    assert(Graft.read(spark, dir).count() === 60)
  }
}
