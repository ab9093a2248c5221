package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.log.GraftLog

/**
 * Cross-feature STREAMING matrix: the same source lifecycle — initial
 * snapshot (after a delete), restart, appends, a skipped change commit —
 * under {deletion vectors on/off} x {column mapping none/name/id}.
 * Single-feature streaming tests pass while compositions break (a DV
 * bitmap applied to an initial snapshot of a renamed table, offsets
 * replayed across physical-name changes), mirroring the reference's
 * generated cross-config suites. Expected state is an independent
 * in-memory model.
 */
class StreamingMatrixSuite extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(): String =
    Files.createTempDirectory("graft-stmx").toString

  for {
    dv <- Seq(false, true)
    mapping <- Seq("none", "name", "id")
  } test(s"stream lifecycle: dv=$dv mapping=$mapping") {
    import spark.implicits._
    val conf = Map.newBuilder[String, String]
    if (dv) conf += "graft.enableDeletionVectors" -> "true"
    if (mapping != "none") conf += "graft.columnMapping.mode" -> mapping
    val src = tmp(); val out = tmp(); val ckpt = tmp()

    def rows(a: Long, b: Long) = spark.range(a, b).select(
      col("id"), concat(lit("t"), col("id")).as("tag"))
    Graft.write(rows(0, 100), src, configuration = conf.result()) // v0

    val tagCol = if (mapping != "none") "label" else "tag"
    if (mapping != "none")
      GraftTable.forPath(spark, src).renameColumn("tag", "label")
    GraftTable.forPath(spark, src).delete(col("id") % 10 === 3)
    if (dv) assert(GraftLog.forTable(spark, src).update()
      .allFiles.exists(_.dvPath.isDefined))

    def drain(): Unit = {
      val q = spark.readStream.format("graft")
        .option("skipChangeCommits", "true").load(src)
        .writeStream.format("graft").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "drain timed out")
    }

    // Initial snapshot: post-delete state, DVs applied in-snapshot.
    drain()
    var model: Set[(Long, String)] =
      (0L until 100L).filter(_ % 10 != 3).map(id => (id, s"t$id")).toSet
    def got(): Set[(Long, String)] = Graft.read(spark, out)
      .select(col("id"), col(tagCol)).as[(Long, String)].collect().toSet
    assert(got() === model, s"initial snapshot (dv=$dv mapping=$mapping)")

    // Tail: append, a change commit (skipped), another append; the
    // restarted query resumes from the checkpoint across all of it.
    Graft.write(rows(100, 110)
      .withColumnRenamed("tag", tagCol), src)
    GraftTable.forPath(spark, src).delete(col("id") < 10)
    Graft.write(rows(110, 120)
      .withColumnRenamed("tag", tagCol), src)
    drain()
    model ++= (100L until 120L).map(id => (id, s"t$id"))
    assert(got() === model, s"tail after restart (dv=$dv mapping=$mapping)")
  }

  test("stream lifecycle: CDF x schema tracking x AvailableNow") {
    // The 3-way composition the per-feature tests don't cover: a CDF
    // stream with a schema-tracking log, driven entirely by AvailableNow
    // drains. Mid-stream schema evolution must drain-then-adopt: the
    // pre-change commit's CDF rows land, the query fails at the barrier
    // AFTER persisting the new schema, and the restarted query serves the
    // post-change commits with the widened schema.
    import spark.implicits._
    val src = tmp(); val out = tmp(); val ckpt = tmp(); val track = tmp()
    Graft.write(spark.range(10).select(col("id"), lit(0L).as("v")), src,
      configuration = Map("graft.enableChangeDataFeed" -> "true"))  // v0
    def drain(): Unit = {
      val q = spark.readStream.format("graft")
        .option("readChangeFeed", "true")
        .option("schemaTrackingLocation", track)
        .load(src)
        .writeStream.format("graft").option("path", out)
        .option("checkpointLocation", ckpt)
        .option("mergeSchema", "true")
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "drain timed out")
    }
    def byType(): Map[String, Long] = Graft.read(spark, out)
      .groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap
    // drain 1: the initial snapshot replays as CDF inserts
    drain()
    assert(byType() === Map("insert" -> 10L), "initial CDF snapshot")
    // v1: old-schema change commit; v2: additive schema evolution
    GraftTable.forPath(spark, src).delete(col("id") >= 8)           // v1
    Graft.write(spark.range(20, 23).select(col("id"), lit(1L).as("v"),
      lit("x").as("extra")), src, mergeSchema = true)               // v2
    // drain 2: v1's deletes land, then the schema barrier fails the query
    val barrier = intercept[Exception] { drain() }
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")) ++ Iterator(""))
        .mkString(" | ")
    assert(rootMsg(barrier).contains("Schema change"), rootMsg(barrier))
    assert(byType() === Map("insert" -> 10L, "delete" -> 2L),
      "pre-barrier commit must drain before adoption")
    assert(!Graft.read(spark, out).columns.contains("extra"))
    // drain 3 (restart): the adopted schema serves v2's inserts
    drain()
    assert(byType() === Map("insert" -> 13L, "delete" -> 2L))
    val widened = Graft.read(spark, out)
    assert(widened.columns.contains("extra"))
    assert(widened.where(col("extra") === "x").count() === 3)
    assert(widened.where(col("_commit_version") === 2).count() === 3)
  }
}
