package graft

import java.nio.file.{FileAlreadyExistsException, Files}
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.log._

/** The object-store commit protocol: external arbitration gives mutual
  * exclusion on stores with no put-if-absent, and readers repair the
  * claimed-but-uncopied crash window. */
class ExternalLogStoreSuite extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def newStore(): ExternalLogStore =
    new ExternalLogStore(spark.sessionState.newHadoopConf(), InMemoryCommitStore)

  private def tmp(): Path =
    new Path("file:" + Files.createTempDirectory("graft-extls").toString)

  test("write/read roundtrip; duplicate write loses") {
    val store = newStore()
    val dir = tmp()
    val p = new Path(dir, "00000000000000000000.json")
    store.write(p, """{"v":0}""")
    assert(store.read(p) === """{"v":0}""")
    intercept[FileAlreadyExistsException] { store.write(p, """{"v":"dup"}""") }
    assert(store.read(p) === """{"v":0}""")
    // temp objects are invisible to listings
    assert(store.list(dir).map(_.getPath.getName) ===
      Seq("00000000000000000000.json"))
  }

  test("16 concurrent writers of one version: exactly one wins") {
    val dir = tmp()
    val p = new Path(dir, "00000000000000000007.json")
    val pool = Executors.newFixedThreadPool(16)
    val start = new CountDownLatch(1)
    val wins = new AtomicInteger(0)
    val losses = new AtomicInteger(0)
    (0 until 16).foreach { i =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          val store = newStore() // each "writer" has its own client
          start.await()
          try { store.write(p, s"""{"writer":$i}"""); wins.incrementAndGet(); () }
          catch { case _: FileAlreadyExistsException => losses.incrementAndGet(); () }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(60, TimeUnit.SECONDS))
    assert(wins.get() === 1, s"wins=${wins.get()} losses=${losses.get()}")
    assert(losses.get() === 15)
    val store = newStore()
    assert(store.read(p).startsWith("""{"writer":"""))
  }

  test("crash after claim, before copy: readers repair from the temp object") {
    val store = newStore()
    val dir = tmp()
    val p0 = new Path(dir, "00000000000000000000.json")
    store.write(p0, """{"v":0}""")
    val p1 = new Path(dir, "00000000000000000001.json")
    store.crashBeforeCopy = true
    store.write(p1, """{"v":1}""") // claims, then "dies"
    store.crashBeforeCopy = false
    // the final object is genuinely missing on the "object store"
    assert(!store.fs(p1).exists(p1))
    // a fresh reader lists the directory: fixup copies temp -> final
    val reader = newStore()
    val names = reader.list(dir).map(_.getPath.getName)
    assert(names.contains("00000000000000000001.json"))
    assert(reader.read(p1) === """{"v":1}""")
    // and the next writer proceeds normally at version 2
    val p2 = new Path(dir, "00000000000000000002.json")
    newStore().write(p2, """{"v":2}""")
    assert(reader.read(p2) === """{"v":2}""")
  }

  test("concurrent table appends through the external store all land") {
    val dir = Files.createTempDirectory("graft-extls-conc").toString
    spark.conf.set("spark.graft.logStore.impl", "graft.log.ExternalLogStore")
    try {
      Graft.write(spark.range(1).toDF("id"), dir)
      val pool = Executors.newFixedThreadPool(6)
      val start = new CountDownLatch(1)
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      (0 until 6).foreach { i =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            start.await()
            try Graft.write(
              spark.range(i * 100, i * 100 + 10).toDF("id"), dir)
            catch { case t: Throwable => failures.add(t); () }
          }
        })
      }
      start.countDown()
      pool.shutdown()
      assert(pool.awaitTermination(120, TimeUnit.SECONDS))
      assert(failures.isEmpty, s"concurrent appends failed: ${failures.peek()}")
      // every append retried through arbitration and landed exactly once
      assert(Graft.read(spark, dir).count() === 61)
      assert(graft.log.GraftLog.forTable(spark, dir).update().version === 6L)
    } finally spark.conf.unset("spark.graft.logStore.impl")
  }

  test("end-to-end: graft commits arbitrate through the external store") {
    val dir = Files.createTempDirectory("graft-extls-e2e").toString
    spark.conf.set("spark.graft.logStore.impl", "graft.log.ExternalLogStore")
    try {
      Graft.write(spark.range(10).toDF("id"), dir)
      Graft.write(spark.range(10, 20).toDF("id"), dir)
      GraftTable.forPath(spark, dir).delete("id >= 15")
      assert(Graft.read(spark, dir).count() === 15)
      // the arbitration table saw every commit
      val logDir = new Path("file:" + dir, "_graft_log").toString
      val claimed = (0L to 2L).flatMap(v =>
        InMemoryCommitStore.get(logDir, f"$v%020d.json"))
      assert(claimed.size === 3)
      assert(claimed.forall(_.complete))
    } finally spark.conf.unset("spark.graft.logStore.impl")
  }
}
