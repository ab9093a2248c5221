package graft

import java.nio.file.Files
import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._
import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.log.GraftLog

/**
 * Seeded concurrency fuzzer (reference concept: the transaction-phase
 * fuzzer under fuzzer/ — re-designed around key-space ownership instead
 * of phase locks): K threads each run a random serial program of
 * APPEND / DELETE / UPDATE / OPTIMIZE ops against ONE table, where every
 * thread's DML touches only its own key range. Cross-thread ops then
 * commute, so the expected final state is the union of each thread's
 * serial model restricted to the ops that actually committed — ops
 * aborted by the conflict checker must have had NO effect (atomicity),
 * retried ops must have exactly-once effect.
 *
 * Invariants checked per seed:
 *   1. per-key final values == committed-ops model (no lost updates,
 *      no double applies, no resurrection from concurrent rewrites)
 *   2. a cold log reload (checkpoint + checksum validation included)
 *      equals the incrementally maintained snapshot
 */
class ConcurrencyFuzzSuite extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val THREADS = 4
  private val OPS_PER_THREAD = 5

  sealed trait Op
  case class Append(lo: Long, n: Int) extends Op
  case class Delete(mod: Int, rem: Int) extends Op
  case class Update(mod: Int, rem: Int) extends Op
  case object Optimize extends Op

  /** Writer-death injection for the coordinated configs: thrown AFTER
    * the ledger accepted (the commit is durable catalog-side) but
    * BEFORE the synchronous backfill reaches the log directory. */
  class WriterDiedBeforeBackfill extends RuntimeException("injected crash")

  // Later configs re-run the program space under DV marking and/or
  // external commit-store arbitration: cross-feature compositions
  // single-config fuzzing cannot reach. (seed=7 dv+ext caught a real
  // torn-PUT data-loss race in round 6.) The `coord` configs arbitrate
  // every commit through a ledger-backed coordinator that randomly
  // kills the writer between arbitration and backfill — a
  // coordinator-ACCEPTED commit is durable even when its writer died,
  // so crashed ops count as committed in the model and must surface
  // through the refresh-side heal (ensureBackfilled), exactly once.
  for ((seed, dv, ext, coord) <- Seq(
      (11, false, false, false), (42, false, false, false),
      (20260813, false, false, false), (13, true, false, false),
      (99, false, true, false), (7, true, true, false),
      (2027, true, true, false),
      (31, false, false, true), (77, true, false, true),
      (5, false, true, true))) // coordinator arbitration OVER the
                               // external store: claims never gate a
                               // coordinated commit, heal composes with
                               // the store's own fix-up recovery
  test(s"fuzz seed=$seed dv=$dv externalStore=$ext coordinated=$coord") {
    val dir = Files.createTempDirectory(s"graft-fuzz$seed").toString
    if (ext) spark.conf.set("spark.graft.logStore.impl",
      "graft.log.ExternalLogStore")
    val crashArmed = new java.util.concurrent.atomic.AtomicBoolean(false)
    if (coord) {
      val crashRng = new Random(seed * 31)
      val ledger = new java.util.concurrent.ConcurrentHashMap[
        (String, Long), String]()
      graft.tx.CommitCoordinators.register(s"fuzz-ledger-$seed",
        new graft.tx.CommitCoordinator {
          override def commit(log: GraftLog, version: Long,
              content: String): Unit = this.synchronized {
            val key = (log.logPath.toString, version)
            if (ledger.containsKey(key) || log.store.exists(
                graft.log.FileNames.deltaFile(log.logPath, version)))
              throw new graft.tx.CoordinatedCommitConflictException(version)
            ledger.put(key, content) // accepted: durable catalog-side
            if (crashArmed.get() && crashRng.nextInt(5) == 0)
              throw new WriterDiedBeforeBackfill
            log.store.writeOverwrite(
              graft.log.FileNames.deltaFile(log.logPath, version), content)
          }
          override def ensureBackfilled(log: GraftLog): Boolean =
            this.synchronized {
              var any = false
              ledger.forEach { (k, content) =>
                if (k._1 == log.logPath.toString) {
                  val target =
                    graft.log.FileNames.deltaFile(log.logPath, k._2)
                  if (!log.store.exists(target)) {
                    log.store.writeOverwrite(target, content)
                    any = true
                  }
                }
              }
              any
            }
        })
    }
    try {
    Graft.write(spark.range(0).select(col("id"), lit(0L).as("v")), dir,
      configuration = (if (dv) Map("graft.enableDeletionVectors" -> "true")
         else Map.empty[String, String]) ++
        (if (coord) Map(
           "graft.coordinatedCommits.coordinator" -> s"fuzz-ledger-$seed")
         else Map.empty[String, String]))
    crashArmed.set(true) // never kill the table-creating commit itself

    // generate each thread's serial program up front (deterministic)
    val rng = new Random(seed)
    val programs: Seq[Seq[Op]] = (0 until THREADS).map { t =>
      var nextBlock = 0
      (0 until OPS_PER_THREAD).map { _ =>
        rng.nextInt(4) match {
          case 0 | 1 =>
            val lo = t * 1000000L + nextBlock * 1000L
            nextBlock += 1
            Append(lo, 20 + rng.nextInt(30))
          case 2 => Delete(3 + rng.nextInt(3), rng.nextInt(3))
          case 3 => Update(3 + rng.nextInt(3), rng.nextInt(3))
        }
      }
    }

    def keyRange(t: Int) =
      (col("id") >= t * 1000000L) && (col("id") < (t + 1) * 1000000L)

    val pool = Executors.newFixedThreadPool(THREADS)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val committed: Seq[Seq[Op]] =
      try {
        val fs = (0 until THREADS).map { t =>
          Future {
            programs(t).flatMap { op =>
              try {
                op match {
                  case Append(lo, n) =>
                    Graft.write(spark.range(lo, lo + n)
                      .select(col("id"), (col("id") % 7).as("v")), dir)
                  case Delete(mod, rem) =>
                    GraftTable.forPath(spark, dir).delete(
                      keyRange(t) && col("id") % mod === rem)
                  case Update(mod, rem) =>
                    GraftTable.forPath(spark, dir).update(
                      keyRange(t) && col("id") % mod === rem,
                      Map("v" -> (col("v") + 1000)))
                  case Optimize =>
                    GraftTable.forPath(spark, dir).optimize().executeCompaction()
                }
                Some(op)
              } catch {
                // conflict-checker abort: the op must have had no effect
                case _: graft.tx.GraftConcurrentModificationException => None
                // writer died AFTER arbitration: the ledger holds the
                // commit, so the op IS committed — it must surface via
                // the refresh-side heal with exactly-once effect
                case _: WriterDiedBeforeBackfill => Some(op)
              }
            }
          }
        }
        Await.result(Future.sequence(fs), 300.seconds)
      } finally pool.shutdown()

    // serial model per thread over ITS committed ops only
    val model = scala.collection.mutable.Map.empty[Long, Long]
    for (t <- 0 until THREADS; op <- committed(t)) op match {
      case Append(lo, n) =>
        (lo until lo + n).foreach(k => model(k) = k % 7)
      case Delete(mod, rem) =>
        model.keys.filter(k =>
          k >= t * 1000000L && k < (t + 1) * 1000000L && k % mod == rem)
          .toSeq.foreach(model.remove)
      case Update(mod, rem) =>
        model.keys.filter(k =>
          k >= t * 1000000L && k < (t + 1) * 1000000L && k % mod == rem)
          .toSeq.foreach(k => model(k) = model(k) + 1000)
      case Optimize =>
    }

    import spark.implicits._
    val got = Graft.read(spark, dir)
      .select("id", "v").as[(Long, Long)].collect().toMap
    val missing = model.keySet -- got.keySet
    val extra = got.keySet -- model.keySet
    val wrong = model.keys.filter(k =>
      got.contains(k) && got(k) != model(k)).take(5)
    assert(missing.isEmpty && extra.isEmpty && wrong.isEmpty,
      s"seed=$seed missing=${missing.take(5)} extra=${extra.take(5)} " +
        s"wrongValues=${wrong.map(k => (k, got.get(k), model(k)))} " +
        s"committed=${committed.map(_.size)}")

    // cold reload (checksum-validated) agrees with the warm snapshot
    val warmVersion = GraftLog.forTable(spark, dir).update().version
    GraftLog.clearCache()
    val cold = GraftLog.forTable(spark, dir).update()
    assert(cold.version === warmVersion)
    val coldRows = Graft.read(spark, dir)
      .select("id", "v").as[(Long, Long)].collect().toMap
    assert(coldRows === got)
    } finally if (ext) spark.conf.unset("spark.graft.logStore.impl")
  }
}
