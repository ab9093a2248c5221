package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.log.GraftLog

/**
 * Cross-feature DML matrix: the same DELETE -> UPDATE -> MERGE lifecycle
 * under every combination of {deletion vectors on/off} x {change data
 * feed on/off} x {column mapping none/name/id} — 12 configs. Single-
 * feature suites pass while cross-feature composition breaks (a DV
 * bitmap resolved against a renamed physical column, CDF rows emitted
 * from a DV-filtered scan, ...), which is exactly where the reference's
 * generated suite matrix catches bugs. Every config folds the same
 * in-memory model of the table, so the expected state is derived
 * independently of any engine code path.
 */
class DmlMatrixSuite extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(): String =
    Files.createTempDirectory("graft-dmlmx").toString

  for {
    dv <- Seq(false, true)
    cdf <- Seq(false, true)
    mapping <- Seq("none", "name", "id")
  } test(s"dml lifecycle: dv=$dv cdf=$cdf mapping=$mapping") {
    import spark.implicits._
    val conf = Map.newBuilder[String, String]
    if (dv) conf += "graft.enableDeletionVectors" -> "true"
    if (cdf) conf += "graft.enableChangeDataFeed" -> "true"
    if (mapping != "none") conf += "graft.columnMapping.mode" -> mapping
    val path = tmp()

    val df = spark.range(100).select(
      col("id"),
      (col("id") % 5).cast("int").as("k"),
      col("id").cast("double").as("v"),
      concat(lit("t"), col("id")).as("tag"))
    Graft.write(df, path, configuration = conf.result())        // v0

    // Schema surgery first (mapping modes only): all later DML and CDF
    // must resolve the renamed logical column across the boundary.
    val tagCol = if (mapping != "none") "label" else "tag"
    if (mapping != "none")
      GraftTable.forPath(spark, path).renameColumn("tag", "label")
    val dmlBase = if (mapping != "none") 2L else 1L // first DML version

    GraftTable.forPath(spark, path).delete(col("id") % 10 === 3)
    if (dv) {
      // DV delete marks rows, it does not rewrite data files
      val snap = GraftLog.forTable(spark, path).update()
      assert(snap.allFiles.exists(_.dvPath.isDefined),
        "DV-enabled DELETE wrote no deletion vector")
    }
    GraftTable.forPath(spark, path)
      .update(col("id") % 7 === 0, Map("v" -> (col("v") + 100)))
    val src = spark.range(90, 110).select(
      col("id"),
      (col("id") % 5).cast("int").as("k"),
      lit(-1.0).as("v"),
      concat(lit("n"), col("id")).as(tagCol))
    GraftTable.forPath(spark, path)
      .merge(src, expr("t.id = s.id"))
      .whenMatched().updateAll()
      .whenNotMatched().insertAll()
      .execute()

    // Independent model of the same lifecycle.
    var m: Map[Long, (Int, Double, String)] =
      (0L until 100L).map(id => id -> ((id % 5).toInt, id.toDouble, s"t$id")).toMap
    m = m.filter { case (id, _) => id % 10 != 3 }
    m = m.map { case (id, (k, v, t)) =>
      id -> (if (id % 7 == 0) (k, v + 100, t) else (k, v, t))
    }
    (90L until 110L).foreach { id =>
      m += id -> ((id % 5).toInt, -1.0, s"n$id")
    }

    val got = Graft.read(spark, path)
      .select(col("id"), col("k"), col("v"), col(tagCol))
      .as[(Long, Int, Double, String)].collect().sortBy(_._1).toSeq
    val want = m.toSeq.map { case (id, (k, v, t)) => (id, k, v, t) }.sortBy(_._1)
    assert(got === want)

    if (cdf) {
      def types(ver: Long): Map[String, Long] =
        GraftTable.forPath(spark, path).changes(ver, ver)
          .groupBy("_change_type").count()
          .as[(String, Long)].collect().toMap
      // DELETE: ids ending in 3 -> 10 delete rows
      assert(types(dmlBase) === Map("delete" -> 10L))
      // UPDATE: multiples of 7 in 0..99 minus deleted 63 -> 14 pairs
      assert(types(dmlBase + 1) ===
        Map("update_preimage" -> 14L, "update_postimage" -> 14L))
      // MERGE: 90..99 present except 93 -> 9 matched pairs; 100..109
      // plus deleted 93 -> 11 inserts
      assert(types(dmlBase + 2) === Map("update_preimage" -> 9L,
        "update_postimage" -> 9L, "insert" -> 11L))
      // CDF rows carry the LOGICAL column name after a rename
      val cdfCols = GraftTable.forPath(spark, path)
        .changes(dmlBase, dmlBase).columns
      assert(cdfCols.contains(tagCol), s"CDF schema missing $tagCol")
    }

    // Re-read through a cold log (checkpoint-free replay) for good measure
    GraftLog.clearCache()
    assert(Graft.read(spark, path).count() === m.size)
  }

  test("everything-on composite: dv+cdf+mapping+DEFAULT+shredded variant") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val path = tmp()
    Graft.create(spark, path, StructType(Seq(
      StructField("id", LongType),
      StructField("v", DoubleType),
      graft.schema.ColumnDefaults.defaultField("src", StringType, "'web'"),
      StructField("payload", VariantType))),
      configuration = Map(
        "graft.enableDeletionVectors" -> "true",
        "graft.enableChangeDataFeed" -> "true",
        "graft.columnMapping.mode" -> "name",
        "graft.enableVariantShredding" -> "true"))
    // append OMITS src -> the default fills under mapping + shredding
    Graft.write(spark.range(40).select($"id", $"id".cast("double").as("v"),
      parse_json(concat(lit("""{"n":"""), $"id", lit("}"))).as("payload")), path)
    GraftTable.forPath(spark, path).renameColumn("src", "origin")
    GraftTable.forPath(spark, path).delete($"id" % 4 === 1)
    GraftTable.forPath(spark, path)
      .update($"id" % 5 === 0, Map("v" -> ($"v" + 1000)))
    val mergeSrc = spark.range(35, 45).select($"id",
      lit(-1.0).as("v"), lit("api").as("origin"),
      parse_json(concat(lit("""{"n":"""), $"id", lit("}"))).as("payload"))
    GraftTable.forPath(spark, path).merge(mergeSrc, expr("t.id = s.id"))
      .whenMatched().updateAll().whenNotMatched().insertAll().execute()

    var m: Map[Long, (Double, String)] =
      (0L until 40L).map(id => id -> ((id.toDouble, "web"))).toMap
    m = m.filter { case (id, _) => id % 4 != 1 }
    m = m.map { case (id, (v, s)) =>
      id -> (if (id % 5 == 0) (v + 1000, s) else (v, s)) }
    (35L until 45L).foreach(id => m += id -> ((-1.0, "api")))

    val got = Graft.read(spark, path)
      .select($"id", $"v", $"origin",
        variant_get($"payload", "$.n", "long").as("n"))
      .as[(Long, Double, String, Long)].collect().sortBy(_._1).toSeq
    assert(got === m.toSeq.map { case (id, (v, s)) => (id, v, s, id) }.sortBy(_._1))
    // protocol carries the whole feature stack
    val p = GraftTable.forPath(spark, path).snapshot.protocol
    Seq("deletionVectors", "changeDataFeed", "columnMapping",
      "allowColumnDefaults", "variantShredding").foreach(f =>
      assert(p.writerFeatureNames.contains(f) || p.readerFeatureNames.contains(f),
        s"missing $f in $p"))
    // CDF across the stack resolves logical names
    assert(GraftTable.forPath(spark, path).changes(0, 100)
      .columns.contains("origin"))
  }

  // ---- MERGE multi-match semantics (reference:
  // MergeIntoCommandBase.scala:267-283, ClassicMergeExecutor.scala:158-180)

  for (dv <- Seq(false, true)) {
    def mkTable(cdf: Boolean = false): String = {
      import spark.implicits._
      val path = tmp()
      val conf = Map.newBuilder[String, String]
      if (dv) conf += "graft.enableDeletionVectors" -> "true"
      if (cdf) conf += "graft.enableChangeDataFeed" -> "true"
      Graft.write(spark.range(10).select(col("id"),
        col("id").cast("double").as("v")), path, configuration = conf.result())
      path
    }
    // source with ids 3 and 5 duplicated
    def dupSource = {
      import spark.implicits._
      Seq(3L, 3L, 5L, 5L, 7L).toDF("id")
        .withColumn("v", lit(-1.0))
    }

    test(s"merge multi-match: sole unconditional DELETE is legal (dv=$dv)") {
      import spark.implicits._
      val path = mkTable()
      val metrics = GraftTable.forPath(spark, path)
        .merge(dupSource, expr("t.id = s.id"))
        .whenMatched().delete()
        .execute()
      val left = Graft.read(spark, path).select("id").as[Long].collect().sorted
      assert(left.toSeq === Seq(0L, 1L, 2L, 4L, 6L, 8L, 9L))
      // each duplicated target row deletes ONCE in the metrics
      assert(metrics("numTargetRowsDeleted") === "3")
    }

    test(s"merge multi-match: update clause still throws (dv=$dv)") {
      val path = mkTable()
      val e = intercept[IllegalStateException] {
        GraftTable.forPath(spark, path)
          .merge(dupSource, expr("t.id = s.id"))
          .whenMatched().update(Map("v" -> lit(0.0)))
          .execute()
      }
      assert(e.getMessage.contains("multiple source rows"))
    }

    test(s"merge multi-match: CONDITIONAL delete still throws (dv=$dv)") {
      val path = mkTable()
      val e = intercept[IllegalStateException] {
        GraftTable.forPath(spark, path)
          .merge(dupSource, expr("t.id = s.id"))
          .whenMatched(expr("s.v < 0")).delete()
          .execute()
      }
      assert(e.getMessage.contains("multiple source rows"))
    }

    test(s"merge multi-match: NMBS-only merge throws, no duplicate copies (dv=$dv)") {
      val path = mkTable()
      intercept[IllegalStateException] {
        GraftTable.forPath(spark, path)
          .merge(dupSource, expr("t.id = s.id"))
          .whenNotMatchedBySource().delete()
          .execute()
      }
      // table untouched by the failed merge
      assert(Graft.read(spark, path).count() === 10)
    }

    test(s"merge multi-match: duplicates all failing the clause are no-ops (dv=$dv)") {
      import spark.implicits._
      val path = mkTable()
      // every duplicate carries v = -1.0, so s.v > 0 fails for all of them:
      // no pair qualifies, the merge is a legal no-op (reference concept:
      // ClassicMergeExecutor.scala:105-110 matchedPredicate pruning)
      val metrics = GraftTable.forPath(spark, path)
        .merge(dupSource, expr("t.id = s.id"))
        .whenMatched(expr("s.v > 0")).update(Map("v" -> lit(0.0)))
        .execute()
      val got = Graft.read(spark, path).select($"id", $"v")
        .as[(Long, Double)].collect().sorted
      assert(got.toSeq === (0L until 10L).map(i => (i, i.toDouble)))
      assert(metrics("numTargetRowsUpdated") === "0")
    }

    test(s"merge multi-match: one passing duplicate updates once, no copies (dv=$dv)") {
      import spark.implicits._
      val path = mkTable()
      // id 3 matches two source rows but only one satisfies the clause —
      // unambiguous: the passing row updates, the failing row is a no-op
      val src = Seq((3L, 1), (3L, 0), (7L, 1)).toDF("id", "w")
        .withColumn("v", lit(-1.0))
      val metrics = GraftTable.forPath(spark, path)
        .merge(src, expr("t.id = s.id"))
        .whenMatched(expr("s.w = 1")).update(Map("v" -> lit(0.0)))
        .execute()
      val got = Graft.read(spark, path).select($"id", $"v")
        .as[(Long, Double)].collect().sorted
      assert(got.toSeq === (0L until 10L).map(i =>
        (i, if (i == 3 || i == 7) 0.0 else i.toDouble)))
      assert(metrics("numTargetRowsUpdated") === "2")
      // two passing duplicates stay ambiguous
      val e = intercept[IllegalStateException] {
        GraftTable.forPath(spark, path)
          .merge(Seq((3L, 1), (3L, 1)).toDF("id", "w").withColumn("v", lit(-1.0)),
            expr("t.id = s.id"))
          .whenMatched(expr("s.w = 1")).update(Map("v" -> lit(0.0)))
          .execute()
      }
      assert(e.getMessage.contains("multiple source rows"))
    }

    test(s"merge multi-match delete-only: CDF emits one delete per target row (dv=$dv)") {
      import spark.implicits._
      val path = mkTable(cdf = true)
      GraftTable.forPath(spark, path)
        .merge(dupSource, expr("t.id = s.id"))
        .whenMatched().delete()
        .execute()
      val types = GraftTable.forPath(spark, path).changes(1, 1)
        .groupBy("_change_type").count().as[(String, Long)].collect().toMap
      assert(types === Map("delete" -> 3L))
    }
  }

  test("merge matched-only: file whose matches all fail the clause condition is not rewritten") {
    import spark.implicits._
    val path = tmp()
    // two files: ids 0-4 (small v) and 100-104 (big v)
    Graft.write(spark.range(5).select(col("id"), col("id").cast("double").as("v"))
      .repartition(1), path)
    Graft.write(spark.range(100, 105).select(col("id"), col("id").cast("double").as("v"))
      .repartition(1), path, mode = "append")
    val before = GraftLog.forTable(spark, path).update().allFiles.map(_.path).toSet
    // source matches rows in BOTH files, but the clause condition only
    // holds for the big-v file
    val src = Seq(2L, 102L).toDF("id")
    GraftTable.forPath(spark, path)
      .merge(src, expr("t.id = s.id"))
      .whenMatched(expr("t.v >= 100")).update(Map("v" -> lit(0.0)))
      .execute()
    val after = GraftLog.forTable(spark, path).update().allFiles.map(_.path).toSet
    // the small-v file survived untouched
    assert(before.intersect(after).size === 1,
      s"expected exactly one untouched file, before=$before after=$after")
    val got = Graft.read(spark, path).select("id", "v")
      .as[(Long, Double)].collect().toMap
    assert(got(2L) === 2.0 && got(102L) === 0.0)
  }
}
