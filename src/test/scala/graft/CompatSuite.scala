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

  test("frozen incremental-index pair: banding properties + cold dedup") {
    val dir = table("mhidx")
    val conf = GraftLog.forTable(spark, s"$dir/buckets").update()
      .metadata.configuration
    assert(conf.get("graft.minhash.numHashes").contains("64"))
    assert(conf.get("graft.minhash.bands").contains("16"))
    assert(Graft.read(spark, s"$dir/sigs").count() === 3) // 2 corpus + 1 batch
    assert(Graft.read(spark, s"$dir/buckets").count() === 3 * 16)
    // a new batch still dedups against the frozen index (no update)
    val r = graft.ml.Dedup.dedupAgainstIndex(
      Seq((20L, "completely novel text zz yy xx ww vv uu tt ss rr qq pp oo"),
          (21L, "some fresh unseen content about graphs and matrices"))
        .toDF("doc_id", "text"),
      $"doc_id", $"text", dir, numHashes = 64, bands = 16, shingleSize = 3)
      .as[(Long, Boolean)].collect().toMap
    assert(r === Map(20L -> true, 21L -> false))
  }

  test("frozen mirrored table: graft + delta logs cold-read to the same rows") {
    val dir = table("mirrored")
    assert(new java.io.File(dir, "_delta_log").isDirectory,
      "fixture lost its delta mirror")
    assert(new java.io.File(dir, "_delta_log/_last_checkpoint").exists,
      "fixture lost its mirror checkpoint")
    assert(Graft.read(spark, dir).count() === 80)
    // a pure Delta reader's view (data + _delta_log only) converts to the
    // same rows — the frozen mirror format stays importable forever
    val view = java.nio.file.Files.createTempDirectory("compat-mirror").toFile
    def walk(s: java.io.File, d: java.io.File): Unit = {
      d.mkdirs()
      s.listFiles().foreach { f =>
        if (f.isDirectory) {
          if (f.getName != "_graft_log") walk(f, new java.io.File(d, f.getName))
        } else java.nio.file.Files.copy(f.toPath,
          new java.io.File(d, f.getName).toPath)
      }
    }
    walk(new java.io.File(dir), view)
    Graft.convertFromDelta(spark, view.toString)
    assert(Graft.read(spark, view.toString).select("id").as[Long]
      .collect().sorted.toSeq === (0L until 80L))
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
