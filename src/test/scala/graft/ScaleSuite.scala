package graft

import java.nio.file.Files

import org.apache.spark.sql.types.{LongType, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.log._

/** Driver-memory behavior at large file counts: the checkpoint fold must
  * stream (no whole-checkpoint collect) and state maps must not be
  * quadratic in file count. */
class ScaleSuite extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("1M-AddFile checkpoint cold-loads and advances without collect") {
    val dir = Files.createTempDirectory("graft-scale").toString
    Graft.create(spark, dir, new StructType().add("id", LongType))
    val log = GraftLog.forTable(spark, dir)
    val meta = log.snapshot.metadata
    log.writeCommit(1, Seq(CommitInfo(timestamp = 1L, operation = "NOOP")))

    // Fabricate a 1M-file checkpoint at v1 (building a real 1M-file table
    // would dominate the suite's runtime; the load path can't tell).
    val n = 1000000
    import spark.implicits._
    val adds = (0 until n).iterator
      .map(i => AddFile(f"part-$i%07d.parquet", Map.empty, 100L, 0L,
        dataChange = true).wrap)
    val cpRows = Iterator(Protocol().wrap, meta.wrap) ++ adds
    spark.createDataset(cpRows.toSeq).repartition(8)
      .write.mode("overwrite")
      .parquet(FileNames.checkpointFile(log.logPath, 1L).toString)
    log.store.writeOverwrite(FileNames.lastCheckpointFile(log.logPath),
      s"""{"version":1,"size":${n + 2}}""")
    // keep the fabricated state consistent with v1's checksum sidecar
    log.store.writeOverwrite(FileNames.checksumFile(log.logPath, 1L),
      s"""{"tableSizeBytes":${n * 100L},"numFiles":$n}""")

    GraftLog.clearCache()
    val t0 = System.nanoTime()
    val cold = GraftLog.forTable(spark, dir).update()
    val loadSecs = (System.nanoTime() - t0) / 1e9
    assert(cold.version === 1L)
    assert(cold.numFiles === n)
    info(f"cold 1M-file checkpoint load: $loadSecs%.1f s")
    assert(loadSecs < 120.0, s"checkpoint load too slow: $loadSecs s")

    // Incremental advance on top of the large state stays incremental.
    val log2 = GraftLog.forTable(spark, dir)
    log2.writeCommit(2, Seq(AddFile("extra.parquet", Map.empty, 1L, 0L,
      dataChange = true)))
    assert(log2.snapshot.numFiles === n + 1)
    assert(log2.snapshot.getAddFile("part-0999999.parquet").isDefined)
  }
}
