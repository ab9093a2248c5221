package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * CONVERT FROM DELTA against the reference's VERSIONED compat fixtures —
 * logs written by historical writers (delta 0.1.0 / 0.2.0 / 1.2.1,
 * DBR 8.0/8.1, "writer version 5") plus DV and variant-stats layouts.
 * These pin legacy log shapes the golden tables don't: pre-feature
 * protocols carrying vestigial generation/identity metadata, checkpoints
 * with extra legacy columns, unknown actions in delta files, name-prefixed
 * and absolute-escaped DV paths. Expected values come from the reference's
 * own documented test constants (DeletionVectorsSuite:843-879,
 * EvolvabilitySuiteBase:40-58, IdentityColumnSuite:258-283,
 * GeneratedColumnCompatibilitySuite:40-67); assertions written
 * independently.
 */
class VersionedCompatSuite extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base =
    new java.io.File("src/test/resources/compat/versioned").getAbsolutePath

  /** Copy a fixture to scratch (convert writes `_graft_log` + DV sidecars
    * next to the data). `substitute` rewrites log text on the way (the
    * special-char fixture ships a `{{FOLDER_WITH_SPECIAL_CHAR}}`
    * placeholder the reference's own tests substitute at runtime). */
  private def fixtureCopy(
      name: String,
      substitute: Map[String, String] = Map.empty): String = {
    val src = new java.io.File(base, name)
    assert(src.isDirectory, s"fixture $name missing at $src")
    val dst = java.nio.file.Files.createTempDirectory(
      s"vcompat-${name.take(12)}").toFile
    def walk(s: java.io.File, d: java.io.File): Unit = {
      d.mkdirs()
      s.listFiles().foreach { f =>
        if (f.isDirectory) walk(f, new java.io.File(d, f.getName))
        else if (!f.getName.endsWith(".crc")) {
          val out = new java.io.File(d, f.getName)
          if (substitute.nonEmpty && f.getName.endsWith(".json")) {
            var text = new String(
              java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
            substitute.foreach { case (k, v) => text = text.replace(k, v) }
            java.nio.file.Files.write(out.toPath, text.getBytes("UTF-8"))
          } else java.nio.file.Files.copy(f.toPath, out.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
      }
    }
    walk(src, dst)
    graft.log.GraftLog.clearCache()
    dst.toString
  }

  test("delta-0.1.0: pre-1.0 log, repartitioned REPLACE, txn action") {
    val dir = fixtureCopy("delta-0.1.0")
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.select($"id".cast("int"), $"value").as[(Int, String)]
      .collect().toSet === Set(4 -> "d", 5 -> "e", 6 -> "f"))
    val s = graft.log.GraftLog.forTable(spark, dir).update()
    assert(s.metadata.partitionColumns === Seq("id"))
    // the SetTransaction from commit 2 carries over
    assert(s.txnVersion("txnId") === 0L)
    // partition pruning fires on the translated partition column
    assert(df.where($"id" === 5)
      .select(input_file_name()).distinct().count() === 1)
  }

  test("delta-1.2.1: legacy checkpoint with extra numRecords column folds") {
    val dir = fixtureCopy("delta-1.2.1")
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    // reference EvolvabilitySuite:263 (issue 1229) pins this exact probe
    assert(df.where($"col1" === 8).count() === 9L)
    assert(df.count() === 33L)
  }

  test("history/delta-0.2.0: 0.2.0-written log converts and reads whole") {
    val dir = fixtureCopy("history-delta-0.2.0")
    Graft.convertFromDelta(spark, dir)
    // delta-0.2.0 wrote values 1..3 twice (two appends of the same range)
    assert(Graft.read(spark, dir).as[Int].collect().sorted.toSeq
      === Seq(1, 1, 2, 2, 3, 3))
  }

  test("transaction_log_schema_evolvability: unknown action + checkpoint column tolerated") {
    // the delta files carry {"some_new_feature":{"a":1}} rows and the
    // checkpoint an extra `unknown` boolean column
    // (EvolvabilitySuiteBase.generateTransactionLogWithExtraColumn)
    val dir = fixtureCopy("transaction_log_schema_evolvability")
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.columns.toSeq === Seq("key", "value"))
    assert(df.count() === 18L)
  }

  test("dbr_8_0: generation expression under writer v2 is vestigial, not enforced") {
    val dir = fixtureCopy("dbr_8_0_non_generated_columns")
    Graft.convertFromDelta(spark, dir)
    assert(Graft.read(spark, dir).count() === 0)
    // explicit c2 that violates "c1 + 1" must be accepted as-is
    Graft.write(Seq((1, 10)).toDF("c1", "c2"), dir)
    // c2 omitted: null-filled, never computed
    Graft.write(Seq(Tuple1(2)).toDF("c1"), dir)
    val got = Graft.read(spark, dir)
      .select($"c1", $"c2").collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) None else Some(r.getInt(1))))
      .toSet
    assert(got === Set((1, Some(10)), (2, None)))
  }

  test("dbr_8_1: generation expression under writer v4 is live and enforced") {
    val dir = fixtureCopy("dbr_8_1_generated_columns")
    Graft.convertFromDelta(spark, dir)
    // c2 omitted: computed as c1 + 1
    Graft.write(Seq(Tuple1(1)).toDF("c1"), dir)
    assert(Graft.read(spark, dir).select($"c1", $"c2").as[(Int, Int)]
      .collect().toSet === Set(1 -> 2))
    // explicit value violating the expression is refused
    val e = intercept[Exception] {
      Graft.write(Seq((5, 99)).toDF("c1", "c2"), dir)
    }
    assert(e.getMessage != null)
    assert(Graft.read(spark, dir).count() === 1)
  }

  test("identity written by writer v5: identity metadata is vestigial, not enforced") {
    val dir = fixtureCopy("identity_test_written_by_version_5")
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.select($"id".cast("long"), $"part".cast("int"), $"value")
      .as[(Long, Int, String)].collect().toSet ===
      Set((1L, 1, "one"), (2L, 2, "two"), (4L, 3, "three")))
    // explicit id passes through untouched (reference IdentityColumnSuite
    // "compatibility": INSERT (5,5,'five') keeps id=5)
    Graft.write(Seq((5L, 5, "five")).toDF("id", "part", "value"), dir)
    assert(Graft.read(spark, dir).select(countDistinct($"id")).head.getLong(0) === 4L)
    assert(Graft.read(spark, dir).where($"id" === 5L).count() === 1L)
  }

  // ---- DV fixtures (DeletionVectorsSuite:843-879 documents the data) ----

  test("table-with-dv-small: name-prefixed u-DV resolves by uuid") {
    val dir = fixtureCopy("table-with-dv-small")
    Graft.convertFromDelta(spark, dir)
    assert(Graft.read(spark, dir).as[Int].collect().sorted.toSeq === (1 to 8))
  }

  test("table-with-dv-large: five versions of DV add/remove fold to V4") {
    val dir = fixtureCopy("table-with-dv-large")
    Graft.convertFromDelta(spark, dir)
    // the reference's documented history arithmetic
    val v0 = Seq.range(0, 2000)
    val v1 = v0.filterNot(Set(0, 180, 300, 700, 1800))
    val v2 = v1 ++ Seq(300, 700)
    val v3 = v2.filterNot(Set(300, 250, 350, 900, 1353, 1567, 1800))
    val v4 = v3 ++ Seq(900, 1567)
    assert(Graft.read(spark, dir).as[Int].collect().sorted.toSeq
      === v4.sorted)
  }

  test("partitioned-table-with-dv-large: DVs under partitions, pruning intact") {
    val dir = fixtureCopy("partitioned-table-with-dv-large")
    Graft.convertFromDelta(spark, dir)
    val v0 = Seq.range(0, 2000)
    val v1 = v0.filterNot(Set(0, 180, 308, 225, 756, 1007, 1503))
    val v2 = v1 ++ Seq(308, 756)
    val v3 = v2.filterNot(Set(300, 257, 399, 786, 1353, 1567, 1800))
    val v4 = v3 ++ Seq(1353, 1567)
    val df = Graft.read(spark, dir)
    assert(df.select($"id".cast("int")).as[Int].collect().sorted.toSeq
      === v4.sorted)
    val part4 = v4.filter(_ % 10 == 4).sorted
    val pruned = df.where($"partCol" === 4)
    assert(pruned.select($"id".cast("int")).as[Int].collect().sorted.toSeq
      === part4)
    assert(pruned.select(input_file_name()).distinct().count() <
      df.select(input_file_name()).distinct().count(),
      "partition filter did not prune files")
  }

  test("table-with-dv-special-char: escaped absolute p-DV path decodes") {
    // the reference substitutes the placeholder at runtime with the
    // url-ENCODED absolute folder path
    // (DeletionVectorsSuite.writeTableHavingSpecialCharInDVPath)
    val dir = fixtureCopy("table-with-dv-special-char")
    val log = new java.io.File(dir, "_delta_log/00000000000000000000.json")
    val folder = new java.io.File(dir, "folder&with%25special%20char")
      .getCanonicalPath
    val text = new String(
      java.nio.file.Files.readAllBytes(log.toPath), "UTF-8")
      .replace("{{FOLDER_WITH_SPECIAL_CHAR}}", folder)
    java.nio.file.Files.write(log.toPath, text.getBytes("UTF-8"))
    graft.log.GraftLog.clearCache()
    Graft.convertFromDelta(spark, dir)
    // range(0,10) with all even numbers deleted
    assert(Graft.read(spark, dir).as[Long].collect().sorted.toSeq
      === Seq(1L, 3L, 5L, 7L, 9L))
  }

  test("table-with-dv-gigantic: missing DV sidecar refuses loudly by uuid") {
    // the fixture ships only the log (2B-numRecords AddFile + 2.1M-row
    // DV); a convert must fail NAMING the missing sidecar — silently
    // dropping the DV would resurrect 2,147,484 deleted rows
    val dir = fixtureCopy("table-with-dv-gigantic")
    val e = intercept[Exception] { Graft.convertFromDelta(spark, dir) }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(t => t.getMessage != null &&
      t.getMessage.contains("deletion_vector_")), e.getMessage)
  }

  // ---- variant-stats fixtures (CheckpointsSuite:1248-1551) --------------

  test("variant-stats-no-checkpoint: variant columns + stats convert and read") {
    val dir = fixtureCopy("variant-stats-no-checkpoint")
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.count() === 10L)
    // extract a typed field from the variant column
    val ids = df.select(expr("variant_get(v, '$.id', 'int')").as[Int])
      .collect().sorted.toSeq
    assert(ids === (0 until 10))
    // graft checkpoint over the converted variant table round-trips
    val log = graft.log.GraftLog.forTable(spark, dir)
    log.checkpoint()
    graft.log.GraftLog.clearCache()
    assert(Graft.read(spark, dir).count() === 10L)
  }

  test("variant-stats-with-struct and nested: variant inside struct/array") {
    val d1 = fixtureCopy("variant-stats-with-struct-no-checkpoint")
    Graft.convertFromDelta(spark, d1)
    val df1 = Graft.read(spark, d1)
    assert(df1.count() === 10L)
    assert(df1.select(expr("variant_get(v, '$.key', 'int')").as[Int])
      .collect().sorted.toSeq === (200 until 210))
    val d2 = fixtureCopy("variant-stats-nested-no-checkpoint")
    Graft.convertFromDelta(spark, d2)
    assert(Graft.read(spark, d2).count() === 10L)
  }

  test("variant-stats-state-reconstruction: single-row variant table folds") {
    val dir = fixtureCopy("variant-stats-state-reconstruction")
    Graft.convertFromDelta(spark, dir)
    assert(Graft.read(spark, dir).count() === 1L)
  }
}
