package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/**
 * Randomized CDF-streaming lifecycle fuzz: seeded random interleavings of
 * append / delete / update / AvailableNow-drain against one source table,
 * checked against an independent in-memory model of BOTH the exact change
 * feed (per-commit change-type counts) and the final table state. The
 * fixed-scenario suites pin known compositions; this explores the
 * orderings nobody wrote down — a drain mid-update-burst, restarts
 * between every op, deletes of already-updated stripes.
 */
class StreamingFuzzSuite extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(): String = Files.createTempDirectory("graft-stfz").toString

  for (iter <- 0 until 3) test(s"randomized CDF stream lifecycle (seed ${9000 + iter})") {
    import spark.implicits._
    val r = new scala.util.Random(9000 + iter)
    val src = tmp(); val out = tmp(); val ckpt = tmp()
    Graft.write(spark.range(20).select($"id", ($"id" * 2).as("v")), src,
      configuration = Map("graft.enableChangeDataFeed" -> "true")) // v0
    val live = scala.collection.mutable.Map[Long, Long](
      (0L until 20L).map(i => i -> i * 2): _*)
    var nextId = 100L
    val expected = scala.collection.mutable.Map[(Long, String), Long]()
    def version(): Long =
      graft.log.GraftLog.forTable(spark, src).update().version
    def drain(): Unit = {
      // startingVersion=1 skips the snapshot replay, so every drained row
      // is the CDF of exactly one modeled commit
      val q = spark.readStream.format("graft")
        .option("readChangeFeed", "true")
        .option("startingVersion", "1")
        .load(src)
        .writeStream.format("graft").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "drain timed out")
    }
    val t = GraftTable.forPath(spark, src)
    for (_ <- 0 until 10) r.nextInt(4) match {
      case 0 =>
        val n = 1 + r.nextInt(15)
        val rows = (nextId until nextId + n).map(i => (i, i * 2))
        // the write returns ITS commit version — keying the model off it
        // (not a log re-read) is immune to any interleaved commit
        val ver = Graft.write(rows.toDF("id", "v"), src)
        rows.foreach { case (i, vv) => live(i) = vv }
        expected((ver, "insert")) = n.toLong
        nextId += n
      case 1 =>
        val mod = 2 + r.nextInt(5); val c = r.nextInt(mod)
        val victims = live.keys.toSeq.filter(_ % mod == c)
        if (victims.nonEmpty) {
          t.delete(col("id") % mod === c)
          victims.foreach(live.remove)
          expected((version(), "delete")) = victims.size.toLong
        }
      case 2 =>
        val mod = 2 + r.nextInt(5); val c = r.nextInt(mod)
        val vic = live.keys.toSeq.filter(_ % mod == c)
        if (vic.nonEmpty) {
          t.update(col("id") % mod === c, Map("v" -> (col("v") + 1)))
          vic.foreach(i => live(i) = live(i) + 1)
          val ver = version()
          expected((ver, "update_preimage")) = vic.size.toLong
          expected((ver, "update_postimage")) = vic.size.toLong
        }
      case 3 => drain()
    }
    drain()
    val got = Graft.read(spark, out)
      .groupBy("_commit_version", "_change_type").count()
      .collect().map(rr => (rr.getLong(0), rr.getString(1)) -> rr.getLong(2))
      .toMap
    assert(got === expected.toMap,
      s"change feed diverged from the model (seed ${9000 + iter})")
    val state = Graft.read(spark, src).select($"id", $"v")
      .as[(Long, Long)].collect().toMap
    assert(state === live.toMap)
  }
}
