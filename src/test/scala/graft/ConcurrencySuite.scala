package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.log._
import graft.tx._

/**
 * Deterministic conflict interleavings: each test pins transaction A,
 * then uses A's `onCommitAttempt` hook to inject a winning commit at the
 * exact moment A is about to write its commit file — so every
 * Concurrent*Exception class is provoked at a precise phase boundary,
 * single-threaded, with no sleeps and no timing dependence.
 * (Reference concept: fuzzer/PhaseLockingTransactionExecutionObserver.scala
 * + concurrency/TransactionExecutionTestMixin.scala — re-designed as a
 * pre-attempt callback instead of thread barriers.)
 */
class ConcurrencySuite extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  def tmpDir(): String = Files.createTempDirectory("graft-conc").toString

  override def afterAll(): Unit = GraftLog.clearCache()

  /** Fresh partitioned table; returns its log. */
  private def freshTable(): GraftLog = {
    val dir = tmpDir()
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_returnflag")
      .limit(200)
    Graft.write(df, dir, partitionBy = Seq("l_returnflag"))
    GraftLog.forTable(spark, dir)
  }

  /** Arm `txn` so that, on its FIRST commit attempt only, `winner` runs
    * (committing ahead of it) — forcing the conflict-check path. */
  private def injectOnFirstAttempt(txn: OptimisticTransaction)(winner: => Unit): Unit = {
    var fired = false
    txn.onCommitAttempt = _ => if (!fired) { fired = true; winner }
  }

  private def addFileFor(log: GraftLog, flag: String): AddFile = {
    // A real (tiny) parquet file so later snapshot reads stay valid.
    val df = spark.range(1).select(
      lit(999999L).as("l_orderkey"), lit(1.0).as("l_quantity"),
      lit(flag).as("l_returnflag"))
    val txn = log.startTransaction()
    val adds = txn.writeFiles(df)
    adds.head.copy(partitionValues = Map("l_returnflag" -> flag))
  }

  test("ConcurrentAppendException: winner appends into A's read set at the attempt boundary") {
    val log = freshTable()
    val a = log.startTransaction()
    a.filterFiles() // whole-table read under Serializable
    val newAdd = addFileFor(log, "R")
    injectOnFirstAttempt(a) {
      val b = log.startTransaction()
      b.commit(Seq(newAdd), "APPEND")
    }
    val e = intercept[ConcurrentAppendException] {
      a.commit(Seq(addFileFor(log, "A")), "APPEND")
    }
    assert(e.getMessage.contains("overlap the read set"))
  }

  test("append into a DIFFERENT partition retries and succeeds") {
    val log = freshTable()
    val a = log.startTransaction()
    // A reads only partition R — record the predicate.
    val expr = org.apache.spark.sql.catalyst.expressions.EqualTo(
      org.apache.spark.sql.catalyst.expressions.AttributeReference(
        "l_returnflag", org.apache.spark.sql.types.StringType)(),
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString("R"),
        org.apache.spark.sql.types.StringType))
    a.filterFiles(partitionFilters = Seq(expr))
    val newAdd = addFileFor(log, "A") // disjoint partition
    injectOnFirstAttempt(a) {
      val b = log.startTransaction()
      b.commit(Seq(newAdd), "APPEND")
    }
    val v0 = log.update().version
    val committed = a.commit(Seq(addFileFor(log, "R")), "APPEND")
    assert(committed === v0 + 2) // lost v0+1 to B, retried onto v0+2
  }

  test("ConcurrentDeleteReadException: winner removes a file A read") {
    val log = freshTable()
    val a = log.startTransaction()
    val read = a.filterFiles()
    val victim = read.head
    injectOnFirstAttempt(a) {
      val b = log.startTransaction()
      b.commit(Seq(victim.remove(System.currentTimeMillis())), "DELETE")
    }
    intercept[ConcurrentDeleteReadException] {
      a.commit(Seq(addFileFor(log, "R")), "APPEND")
    }
  }

  test("re-add of a winner-removed file conflicts at every isolation level") {
    // backfill-shaped commit: an EXISTING path re-added with no paired
    // remove and dataChange=false (effective isolation SnapshotIsolation)
    // — committing after a winner tombstoned the file would resurrect it,
    // so the conflict must fire even at the weakest level.
    val log = freshTable()
    val a = log.startTransaction()
    val victim = a.snapshot.allFiles.head
    injectOnFirstAttempt(a) {
      val b = log.startTransaction()
      b.commit(Seq(victim.remove(System.currentTimeMillis())), "DELETE")
    }
    intercept[ConcurrentDeleteReadException] {
      a.commit(Seq(victim.copy(dataChange = false, baseRowId = Some(0L))),
        "ROW TRACKING BACKFILL")
    }
  }

  test("SnapshotIsolation permits write skew: delete under A's read commits clean") {
    val log = freshTable()
    log.withNewTransaction { t =>
      t.updateMetadata(t.metadata.copy(configuration =
        t.metadata.configuration + ("graft.isolationLevel" -> "SnapshotIsolation")))
      t.commit(Nil, "SET TBLPROPERTIES")
    }
    val a = log.startTransaction()
    val victim = a.filterFiles().head
    injectOnFirstAttempt(a) {
      val b = log.startTransaction()
      b.commit(Seq(victim.remove(System.currentTimeMillis())), "DELETE")
    }
    // Same interleaving as above, but SnapshotIsolation admits it.
    a.commit(Seq(addFileFor(log, "R")), "APPEND")
  }

  test("ConcurrentDeleteDeleteException: both sides tombstone the same file") {
    val log = freshTable()
    val a = log.startTransaction()
    // Not via filterFiles: a file in A's read set trips the more severe
    // delete-read check first; delete-delete is the pure compaction race.
    val victim = a.snapshot.allFiles.head
    injectOnFirstAttempt(a) {
      val b = log.startTransaction()
      b.commit(Seq(victim.remove(System.currentTimeMillis())), "DELETE")
    }
    intercept[ConcurrentDeleteDeleteException] {
      a.commit(Seq(victim.remove(System.currentTimeMillis())), "DELETE")
    }
  }

  test("MetadataChangedException: winner alters table metadata") {
    val log = freshTable()
    val a = log.startTransaction()
    a.filterFiles()
    injectOnFirstAttempt(a) {
      val b = log.startTransaction()
      b.updateMetadata(b.metadata.copy(configuration =
        b.metadata.configuration + ("graft.other" -> "x")))
      b.commit(Nil, "SET TBLPROPERTIES")
    }
    intercept[MetadataChangedException] {
      a.commit(Seq(addFileFor(log, "R")), "APPEND")
    }
  }

  test("racing redirect enable beats an in-flight write: MetadataChanged, not a stale append") {
    // a writer mid-commit must not slip a data commit UNDER a redirect
    // that another session just enabled — the metadata conflict aborts it
    val log = freshTable()
    val dst = tmpDir()
    Graft.write(spark.range(3).toDF("id"), dst)
    val a = log.startTransaction()
    a.filterFiles()
    injectOnFirstAttempt(a) {
      GraftTable.forPath(spark, log.dataPath.toString)
        .enableRedirect(dst)
    }
    intercept[MetadataChangedException] {
      a.commit(Seq(addFileFor(log, "R")), "APPEND")
    }
    // ... and a FRESH write attempt refuses on the redirect gate by name
    val e = intercept[UnsupportedOperationException] {
      log.withNewTransaction(t => t.commit(Seq(addFileFor(log, "R")), "APPEND"))
    }
    assert(e.getMessage.contains("redirected"), e.getMessage)
  }

  test("racing ENABLE vs ENABLE (different destinations): loser aborts, winner stands") {
    // two sessions race to redirect the same source to DIFFERENT
    // destinations: the loser's metadata commit aborts on the property
    // conflict, and its public-API retry refuses on the state machine —
    // the redirect can never fork
    val src = tmpDir(); val dstA = tmpDir(); val dstB = tmpDir()
    Graft.write(spark.range(0, 3).toDF("id"), src)
    Graft.write(spark.range(10, 13).toDF("id"), dstA)
    Graft.write(spark.range(20, 23).toDF("id"), dstB)
    val log = GraftLog.forTableNoRedirect(spark, src)
    val a = log.startTransaction()
    val m = a.metadata
    a.updateMetadata(m.copy(configuration = m.configuration +
      (TableRedirect.PROP ->
        TableRedirect.propertyJson(TableRedirect.STATE_ENABLE, dstA))))
    injectOnFirstAttempt(a) {
      GraftTable.forPath(spark, src).enableRedirect(dstB)
    }
    intercept[MetadataChangedException] { a.commit(Nil, "REDIRECT ENABLE") }
    // the winner's ENABLE stands, pointing at ITS destination
    val live = TableRedirect.get(log.update().metadata)
    assert(live.exists(r =>
      r.state == TableRedirect.STATE_ENABLE && r.dest == dstB), live)
    // a fresh public-API retry of the loser refuses by name
    val e = intercept[IllegalArgumentException] {
      GraftTable.forPath(spark, src).enableRedirect(dstA)
    }
    assert(e.getMessage.contains("invalid redirect transition"), e.getMessage)
    GraftTable.forPath(spark, src).cancelRedirect()
  }

  test("DROP racing a destination write: independent logs, nothing lost, no abort") {
    // a writer resolved through the public path lands at the DESTINATION
    // log, so it cannot conflict with (or be lost to) the source-side
    // DROP commit happening at the same moment — the write survives at
    // the destination and the source returns to its own frozen data
    val src = tmpDir(); val dst = tmpDir()
    Graft.write(spark.range(0, 3).toDF("id"), src)
    Graft.write(spark.range(10, 13).toDF("id"), dst)
    GraftTable.forPath(spark, src).redirectTo(dst)
    val srcLog = GraftLog.forTableNoRedirect(spark, src)
    val a = srcLog.startTransaction()
    val m = a.metadata
    a.updateMetadata(m.copy(configuration = m.configuration +
      (TableRedirect.PROP ->
        TableRedirect.propertyJson(TableRedirect.STATE_DROP, dst))))
    injectOnFirstAttempt(a) {
      // mid-DROP (still READY on disk): the public path serves the dest
      Graft.write(spark.range(100, 102).toDF("id"), src)
    }
    // no FileAlreadyExists at the source log: first attempt commits
    a.commit(Nil, "REDIRECT DROP")
    // second transition clears via the validated route
    GraftTable.forPathNoRedirect(spark, src)
      .removeProperties(Seq(TableRedirect.PROP))
    def idsAt(p: String): Set[Long] =
      Graft.read(spark, p).select("id").collect().map(_.getLong(0)).toSet
    assert(idsAt(dst) === ((10L until 13L) ++ (100L until 102L)).toSet)
    assert(idsAt(src) === (0L until 3L).toSet)
  }

  test("ProtocolChangedException: winner upgrades the protocol") {
    val log = freshTable()
    val a = log.startTransaction()
    a.filterFiles()
    injectOnFirstAttempt(a) {
      val b = log.startTransaction()
      b.commit(Seq(log.update().protocol.copy(minWriterVersion = 3)), "UPGRADE")
    }
    intercept[ProtocolChangedException] {
      a.commit(Seq(addFileFor(log, "R")), "APPEND")
    }
  }

  test("ConcurrentTransactionException: same idempotent appId wins first") {
    val log = freshTable()
    val a = log.startTransaction()
    injectOnFirstAttempt(a) {
      val b = log.startTransaction()
      b.commit(Seq(SetTransaction("job-1", 7)), "WRITE")
    }
    intercept[ConcurrentTransactionException] {
      a.commit(Seq(SetTransaction("job-1", 7), addFileFor(log, "R")), "WRITE")
    }
  }

  test("ConcurrentTransactionException: same metadata domain advanced by both") {
    val log = freshTable()
    val a = log.startTransaction()
    injectOnFirstAttempt(a) {
      val b = log.startTransaction()
      b.commit(Seq(DomainMetadata("graft.domain.test", """{"v":1}""")), "DOMAIN")
    }
    intercept[ConcurrentTransactionException] {
      a.commit(Seq(DomainMetadata("graft.domain.test", """{"v":2}""")), "DOMAIN")
    }
  }

  test("hook fires on every retry attempt: two straight losses then success") {
    val log = freshTable()
    val a = log.startTransaction()
    // Disjoint-partition appends: A never conflicts, only loses the race
    // twice, so the loop must walk v+1 → v+2 → v+3.
    val adds = Seq(addFileFor(log, "A"), addFileFor(log, "N"))
    var n = 0
    a.onCommitAttempt = _ => if (n < 2) {
      val add = adds(n); n += 1
      val b = log.startTransaction()
      b.commit(Seq(add), "APPEND")
    }
    val v0 = log.update().version
    assert(a.commit(Seq(addFileFor(log, "R")), "APPEND") === v0 + 3)
  }
}
