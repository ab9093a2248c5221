package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Randomized maintenance-lifecycle fuzz: seeded random interleavings of
 * content ops (append / delete / update / RESTORE) and content-NEUTRAL
 * maintenance (OPTIMIZE, ZORDER, vacuum, checkpoint) on one table, with
 * an independent model recording the exact content AT EVERY COMMITTED
 * VERSION. After the run, the live table must equal the model's head
 * and time travel to random recorded versions must reproduce each
 * historical state byte-for-byte — the core lakehouse invariant that
 * maintenance must never move data, only files.
 */
class MaintenanceFuzzSuite extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(): String = Files.createTempDirectory("graft-mtfz").toString

  for (iter <- 0 until 3) test(s"randomized maintenance lifecycle (seed ${4200 + iter})") {
    import spark.implicits._
    val r = new scala.util.Random(4200 + iter)
    val dir = tmp()
    var live = (0L until 30L).map(i => i -> i * 2).toMap
    Graft.write(live.toSeq.toDF("id", "v"), dir,
      // interval-3 checkpoints so time travel crosses checkpoint replays
      configuration = Map("graft.checkpointInterval" -> "3"))
    def version(): Long =
      graft.log.GraftLog.forTable(spark, dir).update().version
    // content at every committed version (maintenance commits repeat the
    // previous content — dataChange=false must not change results)
    val history = scala.collection.mutable.Map[Long, Map[Long, Long]](
      version() -> live)
    var nextId = 1000L
    val t = GraftTable.forPath(spark, dir)
    def record(): Unit = { history(version()) = live }
    for (_ <- 0 until 14) r.nextInt(9) match {
      case 0 =>
        val n = 1 + r.nextInt(10)
        val rows = (nextId until nextId + n).map(i => (i, i * 2))
        Graft.write(rows.toDF("id", "v"), dir)
        live = live ++ rows
        nextId += n
        record()
      case 1 =>
        val mod = 2 + r.nextInt(4); val c = r.nextInt(mod)
        if (live.keys.exists(_ % mod == c)) {
          t.delete(col("id") % mod === c)
          live = live.filter { case (i, _) => i % mod != c }
          record()
        }
      case 2 =>
        val mod = 2 + r.nextInt(4); val c = r.nextInt(mod)
        if (live.keys.exists(_ % mod == c)) {
          t.update(col("id") % mod === c, Map("v" -> (col("v") + 1)))
          live = live.map { case (i, v) =>
            i -> (if (i % mod == c) v + 1 else v) }
          record()
        }
      case 3 =>
        t.optimize().executeCompaction()
        record() // content-neutral, but a version may still commit
      case 4 =>
        t.optimize().executeZOrderBy("id")
        record()
      case 5 =>
        t.vacuum() // default retention: removes nothing this young
        record()
      case 6 =>
        // restore to a random RECORDED version: content snaps back
        val versions = history.keys.toSeq.sorted
        val target = versions(r.nextInt(versions.size))
        if (target != version()) {
          t.restoreToVersion(target)
          live = history(target)
          record()
        }
      case 7 =>
        t.recomputeStats() // content-neutral footer re-derivation
        record()
      case 8 =>
        // row-tracking lifecycle: late enable (auto-backfill) or full drop
        // (suspend + unbackfill + downgrade) — both content-neutral
        val m = graft.log.GraftLog.forTable(spark, dir).update().metadata
        if (graft.log.RowTracking.isEnabled(m)) t.dropFeature("rowTracking")
        else t.upsertProperties(Map("graft.enableRowTracking" -> "true"))
        record()
    }
    // head state equals the model — from a COLD load, so the checksum
    // chain written by every op (incl. replacing-add commits) validates
    graft.log.GraftLog.clearCache()
    def read(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.select($"id", $"v").as[(Long, Long)].collect().toMap
    assert(read(Graft.read(spark, dir)) === live,
      s"seed ${4200 + iter}: head diverged")
    // time travel to 4 random recorded versions reproduces each state
    val versions = history.keys.toSeq.sorted
    val picks = r.shuffle(versions).take(4) :+ versions.max
    picks.distinct.foreach { ver =>
      assert(read(Graft.readVersion(spark, dir, ver)) === history(ver),
        s"seed ${4200 + iter}: time travel to v$ver diverged")
    }
  }
}
