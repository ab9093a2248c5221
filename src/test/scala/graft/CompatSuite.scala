package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.log.GraftLog

/**
 * Log-format evolvability: the tables under `src/test/resources/compat`
 * were written by a FROZEN build ([[CompatFixturesGen]]) and are
 * committed to the repo — this suite cold-reads them with the current
 * build. If a change to action serialization, checkpoint layout, DV
 * encoding, or column-mapping metadata breaks these reads, every table
 * written by an earlier build is orphaned: that must fail CI, never
 * ship. (Reference concept: EvolvabilitySuite + committed
 * delta-0.1.0/golden tables — re-designed.)
 */
class CompatSuite extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = new java.io.File("src/test/resources/compat").getAbsolutePath
  private def table(name: String): String = {
    val d = new java.io.File(base, name)
    assert(d.isDirectory, s"compat fixture $name missing at $d — run " +
      "`sbt \"Test/runMain graft.CompatFixturesGen\"` and commit the result")
    GraftLog.clearCache()
    d.toString
  }

  test("frozen basic table: classic checkpoint + crc cold-read + time travel") {
    val dir = table("basic")
    val t = GraftTable.forPath(spark, dir)
    // v0: 100 rows; v1: delete ids % 10 == 0; v2: append 100..119
    assert(t.toDF.count() === 110)
    assert(t.toDF.where($"id" % 10 === 0).count() ===
      2) // only 100 and 110 from the post-delete append
    assert(Graft.readVersion(spark, dir, 0).count() === 100)
    assert(Graft.readVersion(spark, dir, 1).count() === 90)
    assert(t.history().count() === 3)
  }

  test("frozen v2-checkpoint table: sidecar manifest cold-read") {
    val dir = table("v2cp")
    assert(new java.io.File(dir, "_graft_log/_sidecars").isDirectory,
      "fixture lost its sidecar layout")
    assert(Graft.read(spark, dir).as[Long].collect().sorted.toSeq ===
      (0L until 90L))
  }

  test("frozen DV table: bitmap splice + CDF cold-read") {
    val dir = table("dv")
    val t = GraftTable.forPath(spark, dir)
    assert(t.snapshot.allFiles.exists(_.dvPath.isDefined),
      "fixture lost its deletion vector")
    assert(t.toDF.select("id").as[Long].collect().sorted.toSeq ===
      (15L until 60L))
    val types = t.changes(1, 1).groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap
    assert(types === Map("delete" -> 15L))
  }

  test("frozen column-mapped table: physical names + DEFAULT survive") {
    val dir = table("mapped")
    val df = Graft.read(spark, dir)
    assert(df.columns.toSeq === Seq("id", "origin"))
    val byOrigin = df.groupBy("origin").count()
      .as[(String, Long)].collect().toMap
    assert(byOrigin === Map("web" -> 40L, "api" -> 10L))
  }
}
