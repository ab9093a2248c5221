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

  test("frozen bloom decontamination: hash + bit-indexing drift fails here") {
    // recompute over the same literal corpus and compare to the frozen
    // rows — a change to the shingle hash, the bloom word/bit layout, or
    // the k derivation shifts which grams hit and breaks the equality
    val dir = table("bloom")
    val frozen = spark.read.parquet(dir)
      .as[(Long, Long)].collect().toMap
    val (train, bench) = CompatSuite.bloomCorpus(spark)
    val now = graft.ml.Dedup.decontaminateBloom(train, bench,
        $"doc_id", $"text", n = 3, fpp = 0.01)
      .as[(Long, Long)].collect().toMap
    assert(now === frozen)
    assert(frozen.nonEmpty && frozen.contains(101L),
      "fixture lost the planted contaminated doc")
  }

  test("frozen sequence packing: prefix-sum boundary drift fails here") {
    val dir = table("packing")
    val frozen = spark.read.parquet(dir)
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    val now = graft.ml.Curation.packSequences(
        CompatSuite.packingCorpus(spark),
        $"doc_id", $"n_tokens", seqLen = 128, buckets = 8)
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    assert(now === frozen)
    // structural sanity on the frozen shape itself: slices tile each
    // sequence exactly (every seq except the last sums to seqLen)
    val bySeq = frozen.groupBy(_._2).view.mapValues(_.map(_._5).sum)
    val lastSeq = bySeq.keys.max
    assert(bySeq.filter(_._1 != lastSeq).values.forall(_ == 128L))
  }
}

object CompatSuite {
  /** Literal corpus for the frozen bloom fixture: 6 train docs, 2 bench
    * docs; doc 101 copies bench text (must hit), others share no 3-gram. */
  def bloomCorpus(spark: org.apache.spark.sql.SparkSession)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    val bench = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven")).toDF("doc_id", "text")
    val train = Seq(
      (100L, "totally unrelated words appear in this document body"),
      (101L, "prefix alpha beta gamma delta suffix"),     // shares 3-grams
      (102L, "two three unrelated four five"),            // no full 3-gram? "two three unrelated" no; shares none
      (103L, "seven six five four three two one"),        // reversed: no 3-gram
      (104L, "one two three overlapping here"),           // shares "one two three"
      (105L, "nothing in common with anything at all")
    ).toDF("doc_id", "text")
    (train, bench)
  }

  /** Deterministic doc/token-count corpus for the frozen packing fixture:
    * 100 docs, lengths cycling (id * 37) % 190 + 1 — crosses many 128-token
    * sequence boundaries at varied offsets. */
  def packingCorpus(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    (1L to 100L).map(id => (id, (id * 37) % 190 + 1))
      .toDF("doc_id", "n_tokens")
  }
}
