package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.log.GraftLog

class RowTrackingSuite extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def tmpDir(): String = Files.createTempDirectory("graft-rt").toString

  private val rtConf = Map(
    "graft.enableRowTracking" -> "true",
    "graft.enableDeletionVectors" -> "true")

  private def idsOf(dir: String): Map[Long, Long] =
    GraftTable.forPath(spark, dir).toDFWithRowIds
      .select($"id", $"_graft_row_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("fresh rows get sequential ids across appends") {
    val dir = tmpDir()
    Graft.write(spark.range(10).toDF("id").orderBy("id").coalesce(1), dir,
      configuration = rtConf)
    Graft.write(spark.range(10, 15).toDF("id").orderBy("id").coalesce(1), dir)
    val ids = idsOf(dir)
    assert(ids.values.toSet.size === 15)           // all distinct
    assert(ids.values.min === 0L && ids.values.max === 14L)
    assert((0L until 10L).map(ids) === (0L until 10L))   // first file 0..9
    // commit version stamped
    val vers = GraftTable.forPath(spark, dir).toDFWithRowIds
      .select($"_graft_row_commit").distinct().as[Long].collect().toSet
    assert(vers === Set(0L, 1L))
  }

  test("row ids survive DV deletes and OPTIMIZE compaction") {
    val dir = tmpDir()
    Graft.write(spark.range(10).toDF("id").orderBy("id").coalesce(1), dir,
      configuration = rtConf)
    Graft.write(spark.range(10, 20).toDF("id").orderBy("id").coalesce(1), dir)
    val before = idsOf(dir)
    GraftTable.forPath(spark, dir).delete($"id" % 4 === 1)
    val afterDelete = idsOf(dir)
    assert(afterDelete === before.filter { case (k, _) => k % 4 != 1 })
    // compaction materializes the ids into the rewritten file
    GraftTable.forPath(spark, dir).optimize().executeCompaction()
    assert(GraftTable.forPath(spark, dir).snapshot.allFiles.size === 1)
    assert(idsOf(dir) === afterDelete)
  }

  test("watermark survives checkpoint and cold reload") {
    val dir = tmpDir()
    Graft.write(spark.range(5).toDF("id").coalesce(1), dir,
      configuration = rtConf ++ Map("graft.checkpointInterval" -> "2"))
    (0 until 3).foreach(i =>
      Graft.write(spark.range(5 + i, 6 + i).toDF("id").coalesce(1), dir))
    GraftLog.clearCache()
    Graft.write(spark.range(90, 92).toDF("id").coalesce(1), dir)
    val ids = idsOf(dir).values.toSeq
    assert(ids.size === 10 && ids.toSet.size === 10)   // no id reuse after reload
  }

  test("ZORDER preserves row ids via materialization") {
    val dir = tmpDir()
    Graft.write(spark.range(100).toDF("id")
      .withColumn("x", ($"id" * 37) % 100).orderBy("id").coalesce(1), dir,
      configuration = rtConf)
    Graft.write(spark.range(100, 200).toDF("id")
      .withColumn("x", ($"id" * 37) % 100).orderBy("id").coalesce(1), dir)
    val before = GraftTable.forPath(spark, dir).toDFWithRowIds
      .select($"id", $"_graft_row_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    GraftTable.forPath(spark, dir).optimize().executeZOrderBy("x", "id")
    val after = GraftTable.forPath(spark, dir).toDFWithRowIds
      .select($"id", $"_graft_row_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after === before)
  }
}
