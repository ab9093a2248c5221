package graft

import java.nio.file.Files
import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.log.{FileNames, GraftLog, TableFeatures}
import graft.tx.{CommitCoordinator, CommitCoordinators, CoordinatedCommitConflictException}

class CoordinatedCommitSuite extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(): String =
    Files.createTempDirectory("graft-coord").toString

  private val COORD_PROP = "graft.coordinatedCommits.coordinator"

  test("commits on a coordinated table flow through the coordinator") {
    // counting wrapper around the in-process coordinator
    val count = new java.util.concurrent.atomic.AtomicInteger()
    CommitCoordinators.register("counting", new CommitCoordinator {
      override def commit(log: GraftLog, version: Long, content: String): Unit = {
        count.incrementAndGet()
        graft.tx.InProcessCoordinator.commit(log, version, content)
      }
    })
    val dir = tmp()
    Graft.write(spark.range(10).toDF("id"), dir,
      configuration = Map(COORD_PROP -> "counting"))
    GraftTable.forPath(spark, dir).delete(col("id") < 3)
    assert(count.get() === 2, "create + delete must both arbitrate")
    assert(Graft.read(spark, dir).count() === 7)
    // synchronous backfill: a plain cold reader sees the published log
    GraftLog.clearCache()
    assert(Graft.read(spark, dir).count() === 7)
  }

  test("coordinated table carries the writer-gating feature") {
    val dir = tmp()
    Graft.write(spark.range(5).toDF("id"), dir,
      configuration = Map(COORD_PROP -> "in-process"))
    val proto = GraftLog.forTable(spark, dir).update().protocol
    assert(proto.writerFeatureNames.contains("coordinatedCommits"))
    // a writer that lacks the feature is locked out by the protocol gate
    assert(!TableFeatures.writable(proto, 7,
      TableFeatures.supportedWriterFeatures - "coordinatedCommits"))
    // readers need no coordinator (backfill is synchronous)
    assert(TableFeatures.readable(proto, 3,
      TableFeatures.supportedReaderFeatures))
  }

  test("catalogManaged (CCv2): protocol alignment, routing, no downgrade") {
    // counting wrapper proves commits arbitrate through the catalog seam
    val count = new java.util.concurrent.atomic.AtomicInteger()
    CommitCoordinators.register("cat-counting", new CommitCoordinator {
      override def commit(log: GraftLog, version: Long, content: String): Unit = {
        count.incrementAndGet()
        graft.tx.InProcessCoordinator.commit(log, version, content)
      }
    })
    val dir = tmp()
    Graft.write(spark.range(10).toDF("id"), dir,
      configuration = Map("graft.catalogManaged.coordinator" -> "cat-counting"))
    val t = GraftTable.forPath(spark, dir)
    val proto = t.snapshot.protocol
    // reader-writer feature + the reference's requiredFeatures
    // (CatalogOwnedTableFeature: inCommitTimestamp + vacuumProtocolCheck)
    assert(proto.minReaderVersion === 3)
    assert(proto.readerFeatureNames.contains("catalogManaged"))
    assert(proto.writerFeatureNames.contains("catalogManaged"))
    assert(proto.writerFeatureNames.contains("inCommitTimestamp"))
    assert(proto.readerFeatureNames.contains("vacuumProtocolCheck"))
    // live ICT semantics auto-enable with catalog ownership
    assert(t.snapshot.metadata.configuration
      .get("graft.enableInCommitTimestamps").contains("true"))
    // commits route through the coordinator; a plain cold read of the
    // synchronously-backfilled log still serves the table
    t.delete(org.apache.spark.sql.functions.col("id") < 3)
    assert(count.get() === 2, "create + delete must both arbitrate")
    GraftLog.clearCache()
    assert(Graft.read(spark, dir).count() === 7)
    // a reader that lacks the feature is locked out by the protocol gate
    assert(!TableFeatures.readable(proto, 3,
      TableFeatures.supportedReaderFeatures - "catalogManaged"))
    // no downgrade path (reference preDowngrade throws)
    intercept[IllegalArgumentException] {
      GraftTable.forPath(spark, dir).dropFeature("catalogManaged")
    }
    // the mirror never exports catalog ownership: enable the mirror and
    // the exported protocol/metadata must not name the feature or leak
    // the coordinator property
    GraftTable.forPath(spark, dir).upsertProperties(Map(
      graft.commands.DeltaMirror.PROP -> "delta"))
    Graft.write(spark.range(10, 12).toDF("id"), dir)
    val logDir = java.nio.file.Paths.get(dir, "_delta_log")
    val mirrored = java.nio.file.Files.list(logDir).toArray.map(_.toString)
      .filter(_.endsWith(".json")).sorted.map(p =>
        java.nio.file.Files.readString(java.nio.file.Paths.get(p)))
      .mkString("\n")
    assert(!mirrored.contains("catalogManaged"), "mirror leaked CCv2 feature")
    assert(!mirrored.contains("graft.catalogManaged.coordinator"),
      "mirror leaked the coordinator property")
  }

  test("crash between arbitration and backfill: next reader/writer heals") {
    // The catalog/ledger accepted the commit (durable on its side) but
    // the writer died before the synchronous backfill put the file in
    // the log directory. The refresh-side ensureBackfilled leg must
    // republish from the ledger so the next reader/writer observes the
    // arbitrated commit instead of the stale FS log (reference concept:
    // getCommits consulted on every snapshot refresh).
    val ledger =
      new java.util.concurrent.ConcurrentHashMap[(String, Long), String]()
    val crash = new java.util.concurrent.atomic.AtomicBoolean(false)
    CommitCoordinators.register("ledger", new CommitCoordinator {
      override def commit(log: GraftLog, version: Long, content: String): Unit =
        this.synchronized {
          val key = (log.logPath.toString, version)
          if (ledger.containsKey(key) ||
              log.store.exists(FileNames.deltaFile(log.logPath, version)))
            throw new CoordinatedCommitConflictException(version)
          ledger.put(key, content) // the catalog accepted: durable
          if (crash.get())
            throw new RuntimeException("writer died before backfill")
          log.store.writeOverwrite(
            FileNames.deltaFile(log.logPath, version), content)
        }
      override def ensureBackfilled(log: GraftLog): Boolean = this.synchronized {
        var any = false
        ledger.forEach { (k, content) =>
          if (k._1 == log.logPath.toString) {
            val target = FileNames.deltaFile(log.logPath, k._2)
            if (!log.store.exists(target)) {
              log.store.writeOverwrite(target, content)
              any = true
            }
          }
        }
        any
      }
    })
    val dir = tmp()
    Graft.write(spark.range(10).toDF("id"), dir,
      configuration = Map(COORD_PROP -> "ledger")) // v0
    crash.set(true)
    val died = intercept[RuntimeException] {
      Graft.write(spark.range(10, 20).toDF("id"), dir) // v1: accepted, dies
    }
    assert(died.getMessage.contains("died before backfill"))
    crash.set(false)
    val v1 = FileNames.deltaFile(
      GraftLog.forTable(spark, dir).logPath, 1L)
    GraftLog.clearCache()
    // the FS log is stale — v1 lives only in the ledger
    assert(!new java.io.File(v1.toUri.getPath).exists(),
      "crash injection failed: v1 reached the FS log")
    // a cold reader heals and serves the arbitrated commit
    assert(Graft.read(spark, dir).count() === 20)
    assert(new java.io.File(v1.toUri.getPath).exists(),
      "heal did not republish the commit file")
    // a subsequent writer proceeds past the healed version
    Graft.write(spark.range(20, 25).toDF("id"), dir)
    GraftLog.clearCache()
    assert(Graft.read(spark, dir).count() === 25)
  }

  test("streaming sink exactly-once survives writer death before backfill") {
    // The sink's micro-batch commit carries SetTransaction(queryId,
    // batchId). If the writer dies after the coordinator accepted that
    // commit, the restarted query replays the batch — the refresh-side
    // heal must surface the crashed commit (watermark included) FIRST,
    // so the replay no-ops via the idempotent-write check instead of
    // double-applying the batch.
    val ledger =
      new java.util.concurrent.ConcurrentHashMap[(String, Long), String]()
    val crash = new java.util.concurrent.atomic.AtomicBoolean(false)
    CommitCoordinators.register("ledger-stream", new CommitCoordinator {
      override def commit(log: GraftLog, version: Long, content: String): Unit =
        this.synchronized {
          val key = (log.logPath.toString, version)
          if (ledger.containsKey(key) ||
              log.store.exists(FileNames.deltaFile(log.logPath, version)))
            throw new CoordinatedCommitConflictException(version)
          ledger.put(key, content)
          if (crash.getAndSet(false)) // one-shot: only this writer dies
            throw new RuntimeException("writer died before backfill")
          log.store.writeOverwrite(
            FileNames.deltaFile(log.logPath, version), content)
        }
      override def ensureBackfilled(log: GraftLog): Boolean = this.synchronized {
        var any = false
        ledger.forEach { (k, content) =>
          if (k._1 == log.logPath.toString) {
            val target = FileNames.deltaFile(log.logPath, k._2)
            if (!log.store.exists(target)) {
              log.store.writeOverwrite(target, content); any = true
            }
          }
        }
        any
      }
    })
    val srcDir = tmp(); val outDir = tmp(); val ckpt = tmp()
    Graft.write(spark.range(40).toDF("id"), srcDir)
    Graft.write(spark.range(0).toDF("id"), outDir,
      configuration = Map(COORD_PROP -> "ledger-stream"))
    crash.set(true) // the first micro-batch commit dies post-arbitration
    def run() = spark.readStream.format("graft").load(srcDir)
      .writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(outDir)
    val q = run()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination(120000); q.processAllAvailable()
    }
    // restart from the same checkpoint: the replayed batch must no-op
    val q2 = run()
    q2.awaitTermination(120000)
    GraftLog.clearCache()
    assert(Graft.read(spark, outDir).count() === 40,
      "crashed-then-healed micro-batch was dropped or double-applied")
  }

  test("catalogManaged: an explicit ICT 'false' is overridden, not honored") {
    // A catalog-owned table orders commits by the catalog's clock; file
    // mtimes would fork time travel from that ordering, so the reference
    // blocks disabling ICT on catalog-owned tables. An explicit 'false'
    // alongside the coordinator property must not slip past the funnel
    // that handles the absent-key case.
    val dir = tmp()
    Graft.write(spark.range(5).toDF("id"), dir,
      configuration = Map(
        "graft.catalogManaged.coordinator" -> "in-process",
        "graft.enableInCommitTimestamps" -> "false"))
    val conf = GraftTable.forPath(spark, dir).snapshot.metadata.configuration
    assert(conf.get("graft.enableInCommitTimestamps").contains("true"),
      s"explicit false survived the CCv2 ICT funnel: $conf")
  }

  test("unregistered coordinator fails the write loudly") {
    val dir = tmp()
    val e = intercept[Exception] {
      Graft.write(spark.range(5).toDF("id"), dir,
        configuration = Map(COORD_PROP -> "no-such-coordinator"))
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => Option(c.getMessage)
        .exists(_.contains("no-such-coordinator"))), e.toString)
  }

  test("8 racing appenders all land through coordinator arbitration") {
    val dir = tmp()
    Graft.write(spark.range(0).toDF("id"), dir,
      configuration = Map(COORD_PROP -> "in-process"))
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = (0 until 8).map { i =>
        Future {
          Graft.write(
            spark.range(i * 100, i * 100 + 100).toDF("id"), dir)
        }
      }
      Await.result(Future.sequence(futures), 120.seconds)
    } finally pool.shutdown()
    val snap = GraftLog.forTable(spark, dir).update()
    assert(snap.version === 8L, s"expected 9 sequential commits, got ${snap.version}")
    assert(Graft.read(spark, dir).count() === 800)
    assert(Graft.read(spark, dir).agg(sum(col("id"))).head.getLong(0) ===
      (0L until 800L).map(i => (i / 100) * 100 + i % 100).sum)
  }

  test("coordinator conflict surfaces as a retryable version clash") {
    val dir = tmp()
    Graft.write(spark.range(5).toDF("id"), dir,
      configuration = Map(COORD_PROP -> "in-process"))
    val log = GraftLog.forTable(spark, dir)
    intercept[CoordinatedCommitConflictException] {
      // version 1 == next; write it twice directly through the coordinator
      graft.tx.InProcessCoordinator.commit(log, 0L, "{}")
    }
  }
}
