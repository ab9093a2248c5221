package graft

import java.nio.file.{Files => JFiles}

class NestedMappingSuite extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  def tmpDir(): String = JFiles.createTempDirectory("graft-nest").toString

  test("rename and drop nested struct fields are metadata-only") {
    val dir = tmpDir()
    val df = spark.range(5).select($"id",
      struct($"id".as("a"), ($"id" * 2).as("b"),
        struct(($"id" * 3).as("x")).as("inner")).as("s"))
    Graft.write(df, dir)
    val tbl = GraftTable.forPath(spark, dir)
    tbl.renameColumn("s.b", "bee")
    val out1 = Graft.read(spark, dir)
    assert(out1.select($"s.bee").as[Long].collect().sorted.toSeq
      === Seq(0L, 2L, 4L, 6L, 8L))
    tbl.renameColumn("s.inner.x", "ex")
    assert(Graft.read(spark, dir).select($"s.inner.ex").as[Long]
      .collect().sorted.toSeq === Seq(0L, 3L, 6L, 9L, 12L))
    // drop a nested field: physically still present, logically gone
    tbl.dropColumn("s.bee")
    val out2 = Graft.read(spark, dir)
    assert(out2.select($"s.*").columns.toSeq === Seq("a", "inner"))
    // appends after nested rename round-trip through physical names
    Graft.write(spark.range(5, 7).select($"id",
      struct($"id".as("a"),
        struct(($"id" * 3).as("ex")).as("inner")).as("s")), dir)
    assert(Graft.read(spark, dir).count() === 7)
    assert(Graft.read(spark, dir).select(sum($"s.inner.ex")).head.getLong(0)
      === (0 until 7).map(_ * 3).sum)
    // re-adding the dropped name must not resurrect old data... top-level
    // add only supports top-level; nested re-add is via full struct write
  }

  test("UPDATE on nested struct fields via API and SQL") {
    val dir = tmpDir()
    Graft.write(spark.range(6).select($"id",
      struct(($"id" * 10).as("a"),
        struct(lit("k").as("tag"), ($"id" * 100).as("deep")).as("inner")).as("s")), dir)
    val tbl = GraftTable.forPath(spark, dir)
    tbl.update($"id" >= 3, Map("s.a" -> lit(-1L)))
    val a = Graft.read(spark, dir).orderBy("id").select($"s.a").as[Long].collect()
    assert(a.toSeq === Seq(0L, 10L, 20L, -1L, -1L, -1L))
    spark.sql(s"UPDATE graft.`$dir` SET s.inner.deep = 7 WHERE id = 1")
    val deep = Graft.read(spark, dir).orderBy("id").select($"s.inner.deep").as[Long].collect()
    assert(deep.toSeq === Seq(0L, 7L, 200L, 300L, 400L, 500L))
    // untouched sibling fields survive the struct rebuild
    assert(Graft.read(spark, dir).select($"s.inner.tag").distinct().as[String]
      .collect().toSeq === Seq("k"))
    // alias-qualified top-level SET still resolves to the plain column
    spark.sql(s"UPDATE graft.`$dir` AS t SET t.id = 99 WHERE id = 5")
    assert(Graft.read(spark, dir).filter($"id" === 99).count() === 1)
  }

  test("nested rename via SQL dotted path") {
    val dir = tmpDir()
    Graft.write(spark.range(3).select($"id",
      struct($"id".as("u"), lit("k").as("v")).as("s")), dir)
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN s.u TO uu")
    assert(Graft.read(spark, dir).select(sum($"s.uu")).head.getLong(0) === 3L)
  }
}

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.schema.ColumnDefaults

class FeatureSuite extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  def tmpDir(): String = Files.createTempDirectory("graft-feat").toString

  test("check constraint blocks violating writes") {
    val dir = tmpDir()
    Graft.write(spark.range(5).select(col("id"), lit(10).as("x")), dir)
    val t = GraftTable.forPath(spark, dir)
    t.addCheckConstraint("x_positive", "x > 0")
    // valid write passes
    Graft.write(spark.range(5, 8).select(col("id"), lit(3).as("x")), dir)
    assert(Graft.read(spark, dir).count() === 8)
    // violating write fails
    val err = intercept[Exception] {
      Graft.write(spark.range(8, 9).select(col("id"), lit(-1).as("x")), dir)
    }
    assert(err.getMessage.contains("x_positive") ||
      Option(err.getCause).exists(_.getMessage.contains("x_positive")))
    // cannot add constraint violated by existing data
    intercept[IllegalArgumentException] {
      t.addCheckConstraint("id_small", "id < 3")
    }
    t.dropCheckConstraint("x_positive")
    Graft.write(spark.range(9, 10).select(col("id"), lit(-5).as("x")), dir)
    assert(Graft.read(spark, dir).count() === 9)
  }

  test("generated columns compute on write and verify when provided") {
    val dir = tmpDir()
    val schema = StructType(Seq(
      StructField("id", LongType),
      ColumnDefaults.generatedField("id2", LongType, "id * 2")))
    Graft.create(spark, dir, schema)
    Graft.write(spark.range(5).toDF("id"), dir)
    val got = Graft.read(spark, dir).orderBy("id").collect()
    assert(got.map(_.getLong(1)).toSeq === Seq(0L, 2L, 4L, 6L, 8L))
    // providing a wrong value fails the equality check
    intercept[Exception] {
      Graft.write(spark.range(9, 10).select(col("id"), lit(5L).as("id2")), dir)
    }
    // providing the right value passes
    Graft.write(spark.range(10, 11).select(col("id"), (col("id") * 2).as("id2")), dir)
    assert(Graft.read(spark, dir).count() === 6)
  }

  test("identity columns assign advancing unique values") {
    val dir = tmpDir()
    val schema = StructType(Seq(
      ColumnDefaults.identityField("rid", start = 1, step = 1),
      StructField("payload", StringType)))
    Graft.create(spark, dir, schema)
    Graft.write(spark.range(10).select(concat(lit("p"), col("id")).as("payload")), dir)
    val first = Graft.read(spark, dir).select("rid").collect().map(_.getLong(0))
    assert(first.distinct.length === 10)
    Graft.write(spark.range(5).select(concat(lit("q"), col("id")).as("payload")), dir)
    val all = Graft.read(spark, dir).select("rid").collect().map(_.getLong(0))
    assert(all.distinct.length === 15)
    // second batch strictly above the first watermark
    val second = all.diff(first)
    assert(second.min > first.max)
  }

  test("shallow clone shares files, diverges after write") {
    val dir = tmpDir(); val dest = tmpDir() + "/clone"
    Graft.write(spark.range(100).toDF("id"), dir)
    val cloned = GraftTable.forPath(spark, dir).shallowCloneTo(dest)
    assert(cloned.toDF.count() === 100)
    Graft.write(spark.range(100, 150).toDF("id"), dest)
    assert(Graft.read(spark, dest).count() === 150)
    assert(Graft.read(spark, dir).count() === 100)   // source untouched
  }

  test("deletion vectors compose with column mapping renames") {
    import org.apache.spark.sql.functions._
    val dir = tmpDir()
    Graft.write(spark.range(40).select(col("id"), (col("id") * 2).as("v")), dir,
      configuration = Map("graft.enableDeletionVectors" -> "true"))
    val t = GraftTable.forPath(spark, dir)
    t.renameColumn("v", "value")               // physical name stays "v"
    t.delete(col("value") < 20)                // DV delete via LOGICAL name
    assert(Graft.read(spark, dir).count() === 30)
    assert(t.log.update().allFiles.exists(_.dvPath.isDefined),
      "expected a DV, not a rewrite")
    t.update(col("value") === 40, Map("value" -> lit(999L)))
    assert(Graft.read(spark, dir).where(col("value") === 999L).count() === 1)
    assert(Graft.read(spark, dir).count() === 30)
    // compaction purges the DV rows under the mapped schema
    t.optimize().executeCompaction()
    assert(t.log.update().allFiles.forall(_.dvPath.isEmpty))
    assert(Graft.read(spark, dir).count() === 30)
  }

  test("RESTORE across a DV delete resurrects the rows") {
    import org.apache.spark.sql.functions._
    val dir = tmpDir()
    Graft.write(spark.range(50).toDF("id"), dir,
      configuration = Map("graft.enableDeletionVectors" -> "true"))
    val t = GraftTable.forPath(spark, dir)
    t.delete(col("id") < 20)             // v1: DV only, no file rewrite
    assert(Graft.read(spark, dir).count() === 30)
    t.restoreToVersion(0)
    // the same data file now carries NO deletion vector again
    assert(Graft.read(spark, dir).count() === 50)
    assert(t.log.update().allFiles.forall(_.dvPath.isEmpty))
  }

  test("shallow clone of a DV table resolves sidecars against the source") {
    import org.apache.spark.sql.functions._
    val dir = tmpDir(); val dest = tmpDir() + "/dvclone"
    Graft.write(spark.range(100).toDF("id"), dir,
      configuration = Map("graft.enableDeletionVectors" -> "true"))
    GraftTable.forPath(spark, dir).delete(col("id") < 30)
    val cloned = GraftTable.forPath(spark, dir).shallowCloneTo(dest)
    // deleted rows must STAY deleted through the clone's absolute dvPath
    assert(cloned.toDF.count() === 70)
    assert(Graft.read(spark, dest).agg(min(col("id"))).head.getLong(0) === 30L)
    // the clone inherits the DV-bearing protocol
    val p = graft.log.GraftLog.forTable(spark, dest).update().protocol
    assert(p.readerFeatureNames.contains("deletionVectors"))
    // and a delete on the clone merges with the source-rooted bitmap
    GraftTable.forPath(spark, dest).delete(col("id") === 99)
    assert(Graft.read(spark, dest).count() === 69)
    assert(Graft.read(spark, dir).count() === 70)    // source untouched
  }

  test("metadata-only count and limit pushdown rules") {
    val ext = spark   // TestSpark registers GraftSparkSessionExtension
    val dir = tmpDir()
    (0 until 3).foreach(i => Graft.write(
      ext.range(i * 100, i * 100 + 100).toDF("id"), dir))
    val counted = Graft.read(ext, dir).count()
    assert(counted === 300)
    // plan must be metadata-only: answered from a LocalRelation
    val plan = Graft.read(ext, dir).groupBy().count()
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("LocalRelation"), s"expected LocalRelation in:\n$plan")
    // metadata-only MIN/MAX from footer stats (mixed with count)
    val mm = Graft.read(ext, dir)
      .agg(org.apache.spark.sql.functions.min("id"),
        org.apache.spark.sql.functions.max("id"),
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)))
    assert(mm.queryExecution.optimizedPlan.toString.contains("LocalRelation"),
      s"expected metadata-only plan:\n${mm.queryExecution.optimizedPlan}")
    val r = mm.head
    assert(r.getLong(0) === 0L && r.getLong(1) === 299L && r.getLong(2) === 300L)
    // partition-column MIN/MAX answers from partition values
    val pdir = tmpDir()
    Graft.write(ext.range(10).selectExpr("id", "id % 3 AS p"), pdir,
      partitionBy = Seq("p"))
    val pm = Graft.read(ext, pdir)
      .agg(org.apache.spark.sql.functions.min("p"),
        org.apache.spark.sql.functions.max("p"))
    assert(pm.queryExecution.optimizedPlan.toString.contains("LocalRelation"))
    assert(pm.head.getLong(0) === 0L && pm.head.getLong(1) === 2L)
    // with a deletion vector present, MIN/MAX must fall back to a scan
    val ddir = tmpDir()
    Graft.write(ext.range(10).toDF("id"), ddir,
      configuration = Map("graft.enableDeletionVectors" -> "true"))
    GraftTable.forPath(ext, ddir).delete(org.apache.spark.sql.functions.col("id") === 9)
    val dm = Graft.read(ext, ddir).agg(org.apache.spark.sql.functions.max("id"))
    assert(dm.head.getLong(0) === 8L)   // correct despite non-tight bounds
    // limit pushdown: scan over a pinned subset of files
    val limited = Graft.read(ext, dir).limit(5)
    assert(limited.count() === 5)
    assert(limited.queryExecution.optimizedPlan.collectLeaves().exists {
      case org.apache.spark.sql.execution.datasources.LogicalRelation(
        fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation, _, _, _, _) =>
        fs.location.asInstanceOf[graft.files.GraftFileIndex].pinnedFiles
          .exists(_.size < 3)
      case _ => false
    })
  }

  test("column mapping: rename and drop are metadata-only; re-add is fresh") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, StringType, StructField}
    val dir = tmpDir()
    Graft.write(spark.range(10).select(col("id"),
      concat(lit("v"), col("id")).as("tag"), (col("id") % 2).as("p")), dir,
      partitionBy = Seq("p"))
    val t = GraftTable.forPath(spark, dir)
    val filesBefore = t.snapshot.allFiles.map(_.path).toSet

    t.renameColumn("tag", "label")
    assert(Graft.read(spark, dir).columns.toSeq === Seq("id", "label", "p"))
    assert(Graft.read(spark, dir).filter(col("label") === "v3").count() === 1)
    // rename of a partition column is metadata-only too
    t.renameColumn("p", "bucket")
    assert(Graft.read(spark, dir).filter(col("bucket") === 1).count() === 5)
    t.dropColumn("label")
    assert(Graft.read(spark, dir).columns.toSeq === Seq("id", "bucket"))
    // nothing was rewritten across any of those
    assert(GraftTable.forPath(spark, dir).snapshot.allFiles.map(_.path).toSet
      === filesBefore)
    // re-adding the dropped name yields nulls, not resurrected data
    t.addColumn(StructField("label", StringType))
    assert(Graft.read(spark, dir).filter(col("label").isNull).count() === 10)

    // writes and DML through the mapping: append + update + delete
    Graft.write(spark.range(100, 103).select(col("id"),
      (col("id") % 2).as("bucket"), lit("new").as("label")), dir)
    assert(Graft.read(spark, dir).count() === 13)
    t.update(col("id") === 100, Map("label" -> lit("upd")))
    assert(Graft.read(spark, dir).filter(col("label") === "upd").count() === 1)
    t.delete(col("id") === 0)
    assert(Graft.read(spark, dir).count() === 12)
    // data skipping on the renamed column still prunes by physical stats
    assert(Graft.read(spark, dir).filter(col("id") === 101).count() === 1)
  }

  test("column mapping id mode: field ids in footers, id-resolved reads") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{IntegerType, StructField}
    val dir = tmpDir()
    Graft.write(spark.range(10).select(col("id"),
        concat(lit("v"), col("id")).as("tag")), dir,
      configuration = Map("graft.columnMapping.mode" -> "id"))
    val t = GraftTable.forPath(spark, dir)
    // every written parquet footer carries a field id per column
    val conf = spark.sessionState.newHadoopConf()
    t.snapshot.allFiles.foreach { f =>
      val p = new org.apache.hadoop.fs.Path(t.log.dataPath, f.path)
      val footer = org.apache.parquet.hadoop.ParquetFileReader
        .readFooter(conf, p)
      footer.getFileMetaData.getSchema.getFields.forEach { fld =>
        assert(fld.getId != null, s"missing field id on ${fld.getName} in $p")
      }
    }
    // metadata-only rename/drop/re-add round-trip under id resolution
    t.renameColumn("tag", "label")
    assert(Graft.read(spark, dir).filter(col("label") === "v3").count() === 1)
    t.dropColumn("label")
    t.addColumn(StructField("label2", IntegerType))
    assert(Graft.read(spark, dir).filter(col("label2").isNull).count() === 10)
    // appended files after evolution still resolve by id
    Graft.write(spark.range(100, 103).toDF("id")
      .withColumn("label2", lit(7)), dir)
    assert(Graft.read(spark, dir).filter(col("label2") === 7).count() === 3)
    // retrofitting id mode onto a table with id-less files is refused
    val dir2 = tmpDir()
    Graft.write(spark.range(5).toDF("id"), dir2)
    val e = intercept[IllegalArgumentException] {
      GraftTable.forPath(spark, dir2)
        .upsertProperties(Map("graft.columnMapping.mode" -> "id"))
    }
    assert(e.getMessage.contains("creation"))
  }

  test("change data feed survives column rename (physical-name change files)") {
    import org.apache.spark.sql.functions._
    val dir = tmpDir()
    Graft.write(spark.range(10).select(col("id"), lit(0L).as("v")), dir,
      configuration = Map("graft.enableChangeDataFeed" -> "true"))
    val t = GraftTable.forPath(spark, dir)
    t.update(col("id") === 1, Map("v" -> lit(5L)))          // v1: pre-rename CDF
    t.renameColumn("v", "val")                              // v2
    GraftTable.forPath(spark, dir)
      .update(col("id") === 2, Map("val" -> lit(9L)))       // v3: post-rename CDF
    val ch = GraftTable.forPath(spark, dir).changes(1, 3)
    assert(ch.columns.contains("val") && !ch.columns.contains("v"))
    // pre-rename change rows readable under the NEW logical name
    val pre = ch.filter(col("_commit_version") === 1 &&
      col("_change_type") === "update_postimage").head
    assert(pre.getAs[Long]("val") === 5L)
    val post = ch.filter(col("_commit_version") === 3 &&
      col("_change_type") === "update_postimage").head
    assert(post.getAs[Long]("val") === 9L)
  }

  test("cluster cubes: stable cubes are never revisited, small ones merge") {
    import org.apache.spark.sql.functions._
    val dir = tmpDir()
    // tiny target so the first pass already produces a STABLE cube
    Graft.write(spark.range(1000).select(col("id"), (col("id") % 10).as("k")),
      dir, configuration = Map("graft.clusterBy" -> "id",
        "graft.cluster.targetCubeSize" -> "1"))
    val t = GraftTable.forPath(spark, dir)
    t.optimize().executeCompaction()
    val cube1 = GraftTable.forPath(spark, dir).snapshot.allFiles
      .flatMap(f => Option(f.tags).flatMap(_.get("clusterCube"))).distinct
    assert(cube1.size === 1)
    // new data: the stable cube must be untouched; only the new files
    // cluster, into a SECOND cube
    Graft.write(spark.range(1000, 1100).select(col("id"), (col("id") % 10).as("k")), dir)
    t.optimize().executeCompaction()
    val snap = GraftTable.forPath(spark, dir).snapshot
    val cubes = snap.allFiles
      .flatMap(f => Option(f.tags).flatMap(_.get("clusterCube"))).distinct
    assert(cubes.size === 2, s"stable cube was rewritten: $cubes")
    assert(cubes.contains(cube1.head), "first cube id must survive")
    assert(Graft.read(spark, dir).count() === 1100)
    // repeated OPTIMIZE with nothing new: no churn (both cubes stable
    // under the tiny target)
    val again = t.optimize().executeCompaction().collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(again("numFilesClustered") === "0")
  }

  test("clusterBy tables: OPTIMIZE clusters incrementally (new files only)") {
    import org.apache.spark.sql.functions._
    val dir = tmpDir()
    Graft.write(spark.range(100).select(col("id"), (col("id") * 7 % 100).as("k")),
      dir, configuration = Map("graft.clusterBy" -> "id,k"))
    Graft.write(spark.range(100, 200).select(col("id"), (col("id") * 7 % 100).as("k")), dir)
    val t = GraftTable.forPath(spark, dir)
    val r1 = t.optimize().executeCompaction().collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(r1("numFilesClustered").toInt > 0)
    assert(r1("clusterBy") === "id,k")
    val snap1 = GraftTable.forPath(spark, dir).snapshot
    assert(snap1.allFiles.forall(f =>
      Option(f.tags).exists(_.get("clustered").contains("true"))))
    assert(Graft.read(spark, dir).count() === 200)
    // steady state: nothing new to cluster
    val r2 = t.optimize().executeCompaction().collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(r2("numFilesClustered") === "0")
    // a new write is unclustered until the next OPTIMIZE; that pass
    // merges it WITH the undersized cube from the first pass (cubes
    // below graft.cluster.targetCubeSize stay eligible), so locality
    // converges instead of freezing many small early cubes
    Graft.write(spark.range(200, 210).select(col("id"), lit(0L).as("k")), dir)
    val unclustered = GraftTable.forPath(spark, dir).snapshot.allFiles
      .count(f => !Option(f.tags).exists(_.get("clustered").contains("true")))
    assert(unclustered > 0)
    val r3 = t.optimize().executeCompaction().collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(r3("numFilesClustered").toInt >= unclustered)
    assert(Graft.read(spark, dir).count() === 210)
    // all files now share ONE cube id
    val cubeIds = GraftTable.forPath(spark, dir).snapshot.allFiles
      .flatMap(f => Option(f.tags).flatMap(_.get("clusterCube"))).distinct
    assert(cubeIds.size === 1, s"expected one merged cube, got $cubeIds")
    // OPTIMIZE FULL re-clusters EVERYTHING, already-tagged files included
    val total = GraftTable.forPath(spark, dir).snapshot.numFiles
    val rf = spark.sql(s"OPTIMIZE '$dir' FULL").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rf("numFilesClustered").toLong === total,
      s"FULL clustered ${rf("numFilesClustered")} of $total")
    assert(Graft.read(spark, dir).count() === 210)
  }

  test("auto compact fires past the small-file threshold") {
    val dir = tmpDir()
    (0 until 6).foreach { i =>
      Graft.write(spark.range(i * 10, i * 10 + 10).toDF("id"), dir,
        configuration = if (i == 0) Map(
          "graft.autoCompact" -> "true",
          "graft.autoCompact.minNumFiles" -> "5") else Map.empty)
    }
    val t = GraftTable.forPath(spark, dir)
    val ops = t.history().select("operation").collect().map(_.getString(0))
    assert(ops.contains("OPTIMIZE"), s"no auto compact in ${ops.toSeq}")
    assert(t.snapshot.numFiles < 6)
    assert(Graft.read(spark, dir).count() === 60)
  }

  test("auto compact targets only the pressured partition") {
    val dir = tmpDir()
    // seed both partitions, then churn ONLY p=0
    Graft.write(spark.range(20).selectExpr("id", "id % 2 AS p").repartition(1),
      dir, partitionBy = Seq("p"), configuration = Map(
        "graft.autoCompact" -> "true",
        "graft.autoCompact.minNumFiles" -> "6"))
    (0 until 6).foreach { i =>
      Graft.write(spark.range(100 + i * 5L, 105 + i * 5L)
        .selectExpr("id", "CAST(0 AS BIGINT) AS p").repartition(1), dir)
    }
    val t = GraftTable.forPath(spark, dir)
    val ops = t.history().collect()
    val opt = ops.find(_.getAs[String]("operation") == "OPTIMIZE")
    assert(opt.isDefined, "auto compact never fired")
    val byPart = t.snapshot.allFiles.groupBy(_.partitionValues("p"))
    // the churned partition compacted; the cold one kept its single file
    assert(byPart("0").size <= 2,
      s"hot partition not compacted: ${byPart("0").size} files")
    assert(byPart("1").size === 1,
      s"cold partition was rewritten: ${byPart("1").map(_.path)}")
    assert(Graft.read(spark, dir).count() === 50)
  }

  test("auto compact compacts quote/backslash partition values in escaped-literals mode") {
    val dir = tmpDir()
    // With spark.sql.parser.escapedStringLiterals=true the parser keeps
    // \' and '' verbatim inside string literals, so the OPTIMIZE
    // predicate cannot carry this value as a plain literal — it must
    // survive via the hex encoding.
    val hostile = "a'b\\c"
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    try {
      (0 until 6).foreach { i =>
        Graft.write(
          spark.range(i * 10L, i * 10L + 10, 1, 1).toDF("id")
            .withColumn("p", org.apache.spark.sql.functions.lit(hostile)),
          dir, partitionBy = Seq("p"),
          configuration = if (i == 0) Map(
            "graft.autoCompact" -> "true",
            "graft.autoCompact.minNumFiles" -> "5") else Map.empty)
      }
      val t = GraftTable.forPath(spark, dir)
      val ops = t.history().select("operation").collect().map(_.getString(0))
      assert(ops.contains("OPTIMIZE"), s"no auto compact in ${ops.toSeq}")
      // the predicate actually MATCHED the hostile partition: its small
      // files merged instead of surviving a no-op OPTIMIZE
      assert(t.snapshot.numFiles < 6,
        s"predicate missed the partition: ${t.snapshot.numFiles} files remain")
      assert(Graft.read(spark, dir).count() === 60)
    } finally spark.conf.unset("spark.sql.parser.escapedStringLiterals")
  }

  test("auto compact pressure survives a GraftLog cache clear (restart)") {
    val dir = tmpDir()
    // 4 single-small-file commits — below the threshold of 5
    (0 until 4).foreach { i =>
      Graft.write(spark.range(i * 10L, i * 10L + 10, 1, 1).toDF("id"), dir,
        configuration = if (i == 0) Map(
          "graft.autoCompact" -> "true",
          "graft.autoCompact.minNumFiles" -> "5") else Map.empty)
    }
    assert(!GraftTable.forPath(spark, dir).history().collect()
      .exists(_.getAs[String]("operation") == "OPTIMIZE"))
    // simulate a writer restart: the in-memory pressure map is gone
    graft.log.GraftLog.clearCache()
    // the restarted writer's FIRST commit re-derives pressure from the
    // tail and crosses the threshold — without seeding it would need 5
    // more commits
    Graft.write(spark.range(40, 50, 1, 1).toDF("id"), dir)
    val t = GraftTable.forPath(spark, dir)
    val ops = t.history().select("operation").collect().map(_.getString(0))
    assert(ops.contains("OPTIMIZE"),
      s"pressure lost across restart — no auto compact in ${ops.toSeq}")
    assert(Graft.read(spark, dir).count() === 50)
  }

  test("manifest generation lists all live files") {
    val dir = tmpDir()
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    Graft.write(li, dir, partitionBy = Seq("l_returnflag"))
    val t = GraftTable.forPath(spark, dir)
    t.generateSymlinkManifest()
    val base = new java.io.File(dir, "_symlink_format_manifest")
    assert(base.exists)
    val manifests = java.nio.file.Files.walk(base.toPath).iterator()
    var paths = Seq.empty[String]
    manifests.forEachRemaining { p =>
      if (p.getFileName.toString == "manifest")
        paths ++= new String(java.nio.file.Files.readAllBytes(p)).split("\n").filter(_.nonEmpty)
    }
    assert(paths.size.toLong === t.snapshot.numFiles)
  }

  test("dataSkippingStatsColumns: explicit list controls collection and skipping") {
    val dir = tmpDir()
    // 40-column-wide table: y sits past the 32-col default cutoff, x is
    // inside it but EXCLUDED by the explicit list.
    val wide = spark.range(100).select(
      (col("id").as("x") +: (0 until 37).map(i => lit(i).as(s"pad$i"))) :+
        col("id").multiply(2).as("y"): _*)
    Graft.write(wide, dir,
      configuration = Map("graft.dataSkippingStatsColumns" -> "y"))
    val t = GraftTable.forPath(spark, dir)
    val stats = t.snapshot.allFiles.flatMap(f => Option(f.stats))
    assert(stats.nonEmpty)
    assert(stats.forall(s => s.contains("\"y\"") && !s.contains("\"x\"") &&
      !s.contains("pad0")), s"unexpected stats: ${stats.head}")
    // more files with disjoint y ranges -> a y predicate must prune
    Graft.write(spark.range(100, 200).select(
      (col("id").as("x") +: (0 until 37).map(i => lit(i).as(s"pad$i"))) :+
        col("id").multiply(2).as("y"): _*), dir)
    val log = graft.log.GraftLog.forTable(spark, dir)
    val txn = log.startTransaction()
    val yPred = org.apache.spark.sql.catalyst.expressions.LessThan(
      org.apache.spark.sql.catalyst.expressions.AttributeReference(
        "y", LongType)(),
      org.apache.spark.sql.catalyst.expressions.Literal(100L))
    val pruned = txn.filterFiles(dataFilters = Seq(yPred))
    assert(pruned.size < log.update().numFiles,
      "y predicate did not prune despite explicit stats column")
    // unknown column in the list fails loudly, not silently
    intercept[IllegalArgumentException] {
      Graft.write(wide, tmpDir(),
        configuration = Map("graft.dataSkippingStatsColumns" -> "nope"))
    }
    // correctness unchanged
    assert(Graft.read(spark, dir).where(col("y") < 100).count() === 50)
  }

  test("type- and config-gated features land in the protocol vectors") {
    import graft.log.TableFeatures
    // timestamp_ntz is reader-gating: foreign readers that cannot decode
    // it must be locked out by protocol, not by a runtime decode error
    val dir = tmpDir()
    Graft.write(spark.range(3).select(col("id"),
      expr("timestamp_ntz '2024-01-02 03:04:05'").as("ts")), dir)
    val p = GraftTable.forPath(spark, dir).snapshot.protocol
    assert(p.minReaderVersion === 3)
    assert(p.readerFeatureNames.contains("timestampNtz"))
    assert(p.writerFeatureNames.contains("timestampNtz"))
    assert(Graft.read(spark, dir).count() === 3)

    // clustering + rowTracking are writer-only: readers stay legacy
    val dir2 = tmpDir()
    Graft.write(spark.range(3).toDF("id"), dir2, configuration = Map(
      "graft.clusterBy" -> "id", "graft.enableRowTracking" -> "true"))
    val p2 = GraftTable.forPath(spark, dir2).snapshot.protocol
    assert(p2.minReaderVersion === 1)
    assert(p2.writerFeatureNames.contains("clustering"))
    assert(p2.writerFeatureNames.contains("rowTracking"))
    assert(p2.writerFeatureNames.contains("domainMetadata"))

    // activeFeatures sees variant inside nested types
    val m = graft.log.Metadata(schemaString = StructType(Seq(
      StructField("a", ArrayType(StructType(Seq(
        StructField("v", VariantType))))))).json)
    assert(TableFeatures.activeFeatures(m).map(_.name).contains("variantType"))

    // inCommitTimestamps is writer-gating via its table property;
    // vacuumProtocolCheck enables protocol-only (no metadata trigger)
    val dir3 = tmpDir()
    Graft.write(spark.range(3).toDF("id"), dir3, configuration = Map(
      "graft.enableInCommitTimestamps" -> "true"))
    val t3 = GraftTable.forPath(spark, dir3)
    assert(t3.snapshot.protocol.writerFeatureNames.contains("inCommitTimestamp"))
    assert(t3.snapshot.protocol.minReaderVersion === 1)
    t3.addFeatureSupport("vacuumProtocolCheck")
    val p3 = t3.snapshot.protocol
    assert(p3.minReaderVersion === 3)
    assert(p3.readerFeatureNames.contains("vacuumProtocolCheck"))
    assert(Graft.read(spark, dir3).count() === 3)
  }

  test("materializePartitionColumns writes partition columns into the data parquet") {
    // Default layout: partition columns are elided from the data files
    // (they ride in AddFile.partitionValues and the directory names).
    val plain = tmpDir()
    val df = spark.range(20).select(col("id"),
      (col("id") % 3).cast("string").as("k"))
    Graft.write(df, plain, partitionBy = Seq("k"))
    val plainFiles = GraftTable.forPath(spark, plain).snapshot.allFiles
    assert(!spark.read.parquet(plain + "/" + plainFiles.head.path)
      .columns.contains("k"))

    // Feature on: every data file physically carries the partition
    // column, appended after the data columns (the reference layout),
    // and its single value matches the file's logged partitionValues.
    val dir = tmpDir()
    Graft.write(df, dir, partitionBy = Seq("k"), configuration = Map(
      "graft.enableMaterializePartitionColumnsFeature" -> "true"))
    val t = GraftTable.forPath(spark, dir)
    assert(t.snapshot.protocol.writerFeatureNames
      .contains("materializePartitionColumns"))
    assert(t.snapshot.protocol.minReaderVersion === 1) // writer-only
    for (f <- t.snapshot.allFiles) {
      val raw = spark.read.parquet(dir + "/" + f.path)
      assert(raw.columns.toSeq === Seq("id", "k"))
      val vals = raw.select("k").distinct().as[String](org.apache.spark.sql.Encoders.STRING).collect()
      assert(vals.toSeq === Seq(f.partitionValues("k")))
    }
    // engine reads are unaffected (values come from the log, not the
    // physical copy) and a DML rewrite keeps materializing
    assert(Graft.read(spark, dir).groupBy("k").count().count() === 3)
    spark.sql(s"DELETE FROM graft.`$dir` WHERE id % 2 = 0")
    val t2 = GraftTable.forPath(spark, dir)
    for (f <- t2.snapshot.allFiles) {
      val raw = spark.read.parquet(dir + "/" + f.path)
      assert(raw.columns.contains("k"))
      assert(raw.select("k").distinct().as[String](org.apache.spark.sql.Encoders.STRING).collect().toSeq ===
        Seq(f.partitionValues("k")))
    }
    assert(Graft.read(spark, dir).select("id").as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().sorted
      .toSeq === (0L until 20L).filter(_ % 2 == 1))

    // The standalone per-table knob materializes without the feature
    val dir2 = tmpDir()
    Graft.write(df, dir2, partitionBy = Seq("k"), configuration = Map(
      "graft.writePartitionColumnsToParquet" -> "true"))
    val t3 = GraftTable.forPath(spark, dir2)
    assert(!t3.snapshot.protocol.writerFeatureNames
      .contains("materializePartitionColumns"))
    assert(spark.read.parquet(dir2 + "/" + t3.snapshot.allFiles.head.path)
      .columns.contains("k"))

    // Late enablement on an EXISTING table upgrades the protocol in the
    // same commit (reference automaticallyUpdateProtocolOfExistingTables)
    // and the next write honors the new layout; files written before the
    // switch stay elided — the feature promises only files written AFTER.
    val t4 = GraftTable.forPath(spark, plain)
    t4.upsertProperties(Map(
      "graft.enableMaterializePartitionColumnsFeature" -> "true"))
    assert(t4.log.update().protocol.writerFeatureNames
      .contains("materializePartitionColumns"))
    Graft.write(spark.range(20, 25).select(col("id"),
      (col("id") % 3).cast("string").as("k")), plain)
    val late = GraftTable.forPath(spark, plain).snapshot.allFiles
      .filter(f => !plainFiles.map(_.path).contains(f.path))
    assert(late.nonEmpty)
    for (f <- late)
      assert(spark.read.parquet(plain + "/" + f.path).columns.contains("k"))
  }

  test("materializePartitionColumns composes with column mapping and renames") {
    import org.apache.spark.sql.Encoders
    val dir = tmpDir()
    val df = spark.range(12).select(col("id"),
      (col("id") % 2).cast("string").as("k"))
    Graft.write(df, dir, partitionBy = Seq("k"), configuration = Map(
      "graft.columnMapping.mode" -> "name",
      "graft.enableMaterializePartitionColumnsFeature" -> "true"))
    val t = GraftTable.forPath(spark, dir)
    // the physical copy is written under the PHYSICAL name, so a rename
    // of the partition column stays metadata-only and old files keep
    // reading (the whole point of column mapping)
    val physK = graft.schema.ColumnMapping.physicalName(
      t.snapshot.metadata.schema("k"))
    for (f <- t.snapshot.allFiles) {
      val raw = spark.read.parquet(dir + "/" + f.path)
      assert(raw.columns.contains(physK), (f.path, raw.columns.toSeq))
      assert(raw.select(physK).distinct().count() === 1)
    }
    t.renameColumn("k", "bucket")
    // engine read resolves the renamed partition column from the log
    assert(Graft.read(spark, dir).groupBy("bucket").count().count() === 2)
    // post-rename writes keep materializing under the SAME physical name
    Graft.write(spark.range(12, 18).select(col("id"),
      (col("id") % 2).cast("string").as("bucket")), dir)
    val t2 = GraftTable.forPath(spark, dir)
    for (f <- t2.snapshot.allFiles) {
      val raw = spark.read.parquet(dir + "/" + f.path)
      assert(raw.columns.contains(physK), (f.path, raw.columns.toSeq))
    }
    // DML under the mapped+materialized layout
    t2.delete(col("bucket") === "0")
    assert(Graft.read(spark, dir).select("id")
      .as[Long](Encoders.scalaLong).collect().sorted.toSeq ===
      (0L until 18L).filter(_ % 2 == 1))
    for (f <- GraftTable.forPath(spark, dir).snapshot.allFiles)
      assert(spark.read.parquet(dir + "/" + f.path).columns.contains(physK))
  }

  test("vacuumProtocolCheck runs the full writer gate before deleting") {
    val dir = tmpDir()
    Graft.write(spark.range(10).toDF("id"), dir)
    val t = GraftTable.forPath(spark, dir)
    t.addFeatureSupport("vacuumProtocolCheck")
    // every listed feature is known -> vacuum proceeds
    t.vacuum(7 * 24, dryRun = true)
    // a future client lists a writer feature this build does not know;
    // with vacuumProtocolCheck active we must refuse to unlink files
    val log = graft.log.GraftLog.forTable(spark, dir)
    val v = log.update().version + 1
    log.store.write(graft.log.FileNames.deltaFile(log.logPath, v),
      graft.log.Actions.toJson(graft.log.Protocol(3, 7,
        readerFeatures = Some(Seq("vacuumProtocolCheck")),
        writerFeatures = Some(Seq("futureIndexFeature", "vacuumProtocolCheck")))))
    val e = intercept[IllegalArgumentException] {
      GraftTable.forPath(spark, dir).vacuum(7 * 24, dryRun = true)
    }
    assert(e.getMessage.contains("vacuumProtocolCheck"))
  }

  test("frames read from a mapped table create clean target tables") {
    // Regression: the stream/CTAS output of a column-mapped table carries
    // physicalName/field-id metadata in its schema; a target table that
    // inherits it aliases logical columns onto foreign physical names
    // (observed: a renamed column reverting to its physical name in the
    // sink table).
    val src = tmpDir(); val dst = tmpDir()
    Graft.write(spark.range(5).select(col("id"),
        concat(lit("t"), col("id")).as("tag")), src,
      configuration = Map("graft.columnMapping.mode" -> "name"))
    GraftTable.forPath(spark, src).renameColumn("tag", "label")
    Graft.write(Graft.read(spark, src), dst) // unmapped target
    val out = Graft.read(spark, dst)
    assert(out.columns.toSeq === Seq("id", "label"))
    assert(out.schema.fields.forall(f =>
      !f.metadata.contains(graft.schema.ColumnMapping.PHYS_KEY)))
    assert(out.where(col("label") === "t3").count() === 1)
  }

  test("collated string columns: round-trip, and stats skipping stands down") {
    val dir = tmpDir()
    // two files with byte-disjoint ranges: under UTF8_LCASE, 'A' matches
    // the 'a' file even though 'A' < min('a') in byte order — pruning on
    // byte-ordered stats would silently drop the match.
    Graft.write(spark.range(1).select(
      expr("collate('a', 'UTF8_LCASE')").as("s"), lit(1L).as("id")), dir)
    Graft.write(spark.range(1).select(
      expr("collate('B', 'UTF8_LCASE')").as("s"), lit(2L).as("id")), dir)
    val back = Graft.read(spark, dir)
    assert(back.schema("s").dataType.sql.contains("COLLATE"),
      s"collation lost in round-trip: ${back.schema("s").dataType.sql}")
    assert(back.where(col("s") === expr("collate('A', 'UTF8_LCASE')"))
      .count() === 1)
    // the skipping compiler must refuse collated comparisons outright
    val collated = StructType(Seq(StructField("s",
      back.schema("s").dataType), StructField("id", LongType)))
    val pred = org.apache.spark.sql.catalyst.expressions.EqualTo(
      org.apache.spark.sql.catalyst.expressions.AttributeReference(
        "s", back.schema("s").dataType)(),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        org.apache.spark.unsafe.types.UTF8String.fromString("A"),
        back.schema("s").dataType))
    assert(graft.stats.StatsSkipping.compile(pred, collated).isEmpty,
      "stats compiler emitted a byte-order predicate for a collated column")
    // default-collation strings still compile (skipping not lost generally)
    val plain = StructType(Seq(StructField("s", StringType)))
    val plainPred = org.apache.spark.sql.catalyst.expressions.EqualTo(
      org.apache.spark.sql.catalyst.expressions.AttributeReference(
        "s", StringType)(),
      org.apache.spark.sql.catalyst.expressions.Literal("A"))
    assert(graft.stats.StatsSkipping.compile(plainPred, plain).isDefined)
  }

  test("randomizeFilePrefixes shards data files across random key prefixes") {
    val dir = java.nio.file.Files.createTempDirectory("randpfx").toString
    Graft.write(spark.range(100).select(col("id"), (col("id") % 4).as("p")),
      dir, partitionBy = Seq("p"),
      configuration = Map("graft.randomizeFilePrefixes" -> "true",
        "graft.randomPrefixLength" -> "3"))
    val s = GraftTable.forPath(spark, dir).snapshot
    // every data file sits under a 3-char random prefix, NOT a hive dir
    assert(s.allFiles.forall(_.path.matches("[0-9A-Za-z]{3}/part-.*\\.parquet")),
      s.allFiles.map(_.path).mkString(", "))
    // partition values live in the log; pruning and reads are unaffected
    assert(s.allFiles.forall(_.partitionValues.keySet == Set("p")))
    assert(Graft.read(spark, dir).count() === 100)
    assert(Graft.read(spark, dir).where(col("p") === 2).count() === 25)
    // DML and time travel still work over prefixed files
    GraftTable.forPath(spark, dir).delete(col("id") < 10)
    assert(Graft.read(spark, dir).count() === 90)
    assert(GraftTable.forPath(spark, dir).asOfVersion(0).count() === 100)
    // VACUUM's walker anti-joins fine across the prefix dirs
    GraftTable.forPath(spark, dir).vacuum(retentionHours = 200, dryRun = true)
  }

  test("overwrite-with-configuration installs the feature gate in the same commit") {
    val dir = java.nio.file.Files.createTempDirectory("owgate").toString
    Graft.write(spark.range(10).toDF("id"), dir)
    val before = GraftTable.forPath(spark, dir).snapshot.protocol
    assert(!before.writerFeatureNames.contains("deletionVectors"))
    // overwrite that flips on DVs: the SAME commit must carry the
    // protocol gate, never hand feature-gated state to ungated readers
    Graft.write(spark.range(5).toDF("id"), dir, mode = "overwrite",
      configuration = Map("graft.enableDeletionVectors" -> "true"))
    val s = GraftTable.forPath(spark, dir).snapshot
    assert(s.metadata.configuration("graft.enableDeletionVectors") === "true")
    val commit = GraftTable.forPath(spark, dir).log.readCommit(s.version)
    assert(commit.exists(_.isInstanceOf[graft.log.Protocol]),
      "feature-enabling overwrite committed without its protocol gate")
    // and the feature actually works afterwards
    GraftTable.forPath(spark, dir).delete(col("id") < 2)
    assert(GraftTable.forPath(spark, dir).snapshot.allFiles
      .exists(_.dvPath.isDefined))
  }

  test("interrupted rowTracking drop leaves a recoverable suspension flag") {
    val dir = java.nio.file.Files.createTempDirectory("rtsusp").toString
    Graft.write(spark.range(10).toDF("id"), dir)
    // simulate the interrupted dropFeature: suspension set, drop never ran
    GraftTable.forPath(spark, dir).upsertProperties(Map(
      "graft.enableRowTracking" -> "false",
      "graft.rowTrackingSuspended" -> "true"))
    // direct backfill refuses loudly instead of looping
    val e = intercept[IllegalArgumentException] {
      GraftTable.forPath(spark, dir).backfillRowTracking()
    }
    assert(e.getMessage.contains("suspended"), e.getMessage)
    // re-enabling through the property clears the flag and backfills
    GraftTable.forPath(spark, dir)
      .upsertProperties(Map("graft.enableRowTracking" -> "true"))
    val s = GraftTable.forPath(spark, dir).snapshot
    assert(!s.metadata.configuration.contains("graft.rowTrackingSuspended"))
    val ids = GraftTable.forPath(spark, dir).toDFWithRowIds
      .select(col("_graft_row_id")).collect().map(_.getLong(0))
    assert(ids.length === 10 && ids.distinct.length === 10)
  }

  test("dropFeature(columnMapping) rewrites renamed tables under plain names") {
    val dir = java.nio.file.Files.createTempDirectory("cmdrop").toString
    Graft.write(spark.range(20).select(col("id"), (col("id") * 2).as("a")),
      dir, configuration = Map("graft.columnMapping.mode" -> "name"))
    val t = GraftTable.forPath(spark, dir)
    t.renameColumn("a", "b")
    assert(Graft.read(spark, dir).columns.toSeq === Seq("id", "b"))
    // names diverged (b's physical name is still a's) — dropping the
    // feature must REWRITE, not refuse
    t.dropFeature("columnMapping")
    val s = GraftTable.forPath(spark, dir).snapshot
    assert(!s.metadata.configuration.contains("graft.columnMapping.mode"))
    assert(s.metadata.schema.fieldNames.toSeq === Seq("id", "b"))
    import graft.schema.ColumnMapping
    assert(s.metadata.schema.fields.forall(f =>
      ColumnMapping.physicalName(f) == f.name))
    // content survives, reads work under the plain physical names
    val got = Graft.read(spark, dir).select(col("id"), col("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 20 && got(3L) === 6L)
    // the rewrite is dataChange=false: invisible to change semantics
    val commit = GraftTable.forPath(spark, dir).log.readCommit(s.version - 1)
    assert(commit.collect { case a: graft.log.AddFile => a }
      .forall(!_.dataChange))
    // and the table stays fully writable without mapping
    Graft.write(spark.range(20, 25)
      .select(col("id"), (col("id") * 2).as("b")), dir)
    assert(Graft.read(spark, dir).count() === 25)
  }

  test("parquet-invalid column names refuse without mapping, work with it") {
    import spark.implicits._
    val bad = spark.range(5).select($"id", ($"id" * 2).as("col with space"),
      lit("x").as("a,b;c{}()"))
    // without mapping: the logical names WOULD be parquet field names —
    // refused at metadata commit, exactly like the reference
    val dir1 = java.nio.file.Files.createTempDirectory("badnames1").toString
    val e = intercept[IllegalArgumentException] { Graft.write(bad, dir1) }
    assert(e.getMessage.contains("col with space") &&
      e.getMessage.contains("column mapping"), e.getMessage)
    // with name mapping: physical names are generated, everything works
    val dir2 = java.nio.file.Files.createTempDirectory("badnames2").toString
    Graft.write(bad, dir2,
      configuration = Map("graft.columnMapping.mode" -> "name"))
    val back = Graft.read(spark, dir2)
    assert(back.columns.toSeq === Seq("id", "col with space", "a,b;c{}()"))
    assert(back.where(col("`col with space`") > 2).count() === 3)
    spark.sql(s"UPDATE graft.`$dir2` SET `a,b;c{}()` = 'y' WHERE id = 1")
    assert(Graft.read(spark, dir2).where(col("`a,b;c{}()`") === "y")
      .count() === 1)
    // evolution cannot smuggle a bad name into an unmapped table either
    val dir3 = java.nio.file.Files.createTempDirectory("badnames3").toString
    Graft.write(spark.range(3).toDF("id"), dir3)
    val e2 = intercept[IllegalArgumentException] {
      Graft.write(spark.range(3).select($"id", lit(1L).as("new col")),
        dir3, mergeSchema = true)
    }
    assert(e2.getMessage.contains("new col"), e2.getMessage)
    // bad names hide under ANY container shape: array<array<struct>>,
    // map keys, map<_, array<struct>>
    val dir4 = java.nio.file.Files.createTempDirectory("badnames4").toString
    val deepBad = spark.range(2).select($"id",
      array(array(struct(lit(1).as("a b")))).as("aa"))
    val e3 = intercept[IllegalArgumentException] { Graft.write(deepBad, dir4) }
    assert(e3.getMessage.contains("a b"), e3.getMessage)
    val mapBad = spark.range(2).select($"id",
      map(struct(lit(1).as("k;y")), array(struct(lit(2).as("ok")))).as("m"))
    val e4 = intercept[IllegalArgumentException] { Graft.write(mapBad, dir4) }
    assert(e4.getMessage.contains("k;y"), e4.getMessage)
    val mapValBad = spark.range(2).select($"id",
      map(lit("k"), array(struct(lit(2).as("v{}")))).as("m"))
    val e5 = intercept[IllegalArgumentException] { Graft.write(mapValBad, dir4) }
    assert(e5.getMessage.contains("v{}"), e5.getMessage)
  }
}
