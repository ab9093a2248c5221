package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.schema.ColumnDefaults

/** Round-4 surface additions: appendOnly, overwriteSchema, userMetadata,
  * excludeRegex, SYNC IDENTITY, SHOW COLUMNS, dataSkippingNumIndexedCols. */
class Round4Suite extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def tmpDir(): String = Files.createTempDirectory("graft-r4").toString

  test("appendOnly tables reject data-changing removes, allow OPTIMIZE") {
    val dir = tmpDir()
    Graft.write(spark.range(10).toDF("id"), dir,
      configuration = Map("graft.appendOnly" -> "true"))
    Graft.write(spark.range(10, 20).toDF("id"), dir)      // appends fine
    val t = GraftTable.forPath(spark, dir)
    val e = intercept[UnsupportedOperationException] { t.delete("id < 5") }
    assert(e.getMessage.contains("append-only"))
    intercept[UnsupportedOperationException] {
      Graft.write(spark.range(3).toDF("id"), dir, mode = "overwrite")
    }
    // dataChange=false maintenance still allowed
    t.optimize().executeCompaction()
    assert(Graft.read(spark, dir).count() === 20)
  }

  test("overwriteSchema replaces schema and partitioning on overwrite") {
    val dir = tmpDir()
    Graft.write(spark.range(5).toDF("id"), dir)
    // incompatible schema without the option fails
    intercept[IllegalArgumentException] {
      Graft.write(spark.range(5).select($"id".cast("string").as("name")), dir,
        mode = "overwrite")
    }
    Graft.write(
      spark.range(5).select($"id".cast("string").as("name"), ($"id" % 2).as("p")),
      dir, mode = "overwrite", partitionBy = Seq("p"), overwriteSchema = true)
    val back = Graft.read(spark, dir)
    assert(back.columns.toSeq === Seq("name", "p"))
    assert(back.count() === 5)
    val log = graft.log.GraftLog.forTable(spark, dir)
    assert(log.update().metadata.partitionColumns === Seq("p"))
  }

  test("userMetadata session conf lands in commit info / history") {
    val dir = tmpDir()
    spark.conf.set("graft.commitInfo.userMetadata", "ingest-job-42")
    try Graft.write(spark.range(5).toDF("id"), dir)
    finally spark.conf.unset("graft.commitInfo.userMetadata")
    Graft.write(spark.range(5, 8).toDF("id"), dir)
    val infos = graft.log.GraftLog.forTable(spark, dir).update()
      .version
    val commits = (0L to infos).flatMap(v =>
      graft.log.GraftLog.forTable(spark, dir).readCommit(v).collect {
        case c: graft.log.CommitInfo => c.userMetadata
      })
    assert(commits.flatten === Seq("ingest-job-42"))
  }

  test("streaming excludeRegex hides matching files from the source") {
    val dir = tmpDir()
    val ckpt = tmpDir()
    Graft.write(spark.range(10).select($"id", lit("a").as("p")), dir,
      partitionBy = Seq("p"))
    Graft.write(spark.range(10, 14).select($"id", lit("b").as("p")), dir)
    val q = spark.readStream.format("graft")
      .option("excludeRegex", "p=b")
      .load(dir)
      .writeStream.format("memory").queryName("excl_rows")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(spark.table("excl_rows").count() === 10)
  }

  test("SYNC IDENTITY recomputes the high watermark from data") {
    val dir = tmpDir()
    val schema = StructType(Seq(
      ColumnDefaults.identityField("rid", start = 1, step = 1),
      StructField("payload", StringType)))
    Graft.create(spark, dir, schema)
    Graft.write(spark.range(10).select(concat(lit("p"), $"id").as("payload")), dir)
    val t = GraftTable.forPath(spark, dir)
    // simulate a lost watermark (e.g. after CONVERT or manual ingest)
    t.removeProperties(Seq("graft.identity.rid.highWatermark"))
    spark.sql(s"ALTER TABLE graft.`$dir` SYNC IDENTITY")
    Graft.write(spark.range(5).select(concat(lit("q"), $"id").as("payload")), dir)
    val ids = Graft.read(spark, dir).select("rid").as[Long].collect()
    assert(ids.distinct.length === 15, s"identity collision: ${ids.sorted.toSeq}")
  }

  test("SHOW COLUMNS lists the table's columns") {
    val dir = tmpDir()
    Graft.write(spark.range(3).select($"id", ($"id" * 2).as("v")), dir)
    val cols = spark.sql(s"SHOW COLUMNS IN graft.`$dir`")
      .collect().map(_.getString(0)).toSeq
    assert(cols === Seq("id", "v"))
  }

  test("table builder creates with generated, identity, and partition columns") {
    val dir = tmpDir()
    val t = Graft.build(spark)
      .location(dir)
      .addColumn(Graft.columnBuilder("id").dataType("BIGINT")
        .generatedAlwaysAsIdentity(start = 5, step = 5))
      .addColumn(Graft.columnBuilder("ts").dataType(TimestampType).nullable(true))
      .addColumn(Graft.columnBuilder("d").dataType(DateType)
        .generatedAlwaysAs("CAST(ts AS DATE)"))
      .addColumn("payload", StringType)
      .partitionedBy("d")
      .property("graft.appendOnly", "true")
      .createIfNotExists()
      .execute()
    Graft.write(
      spark.range(4).select(
        lit(java.sql.Timestamp.valueOf("2024-05-01 10:00:00")).as("ts"),
        concat(lit("x"), $"id").as("payload")),
      dir)
    val got = Graft.read(spark, dir)
    assert(got.columns.toSeq === Seq("id", "ts", "d", "payload"))
    // identity values are unique and on the start/step lattice (gaps are
    // allowed: assignment is partition-offset based, like the reference)
    val ids = got.select("id").as[Long].collect()
    assert(ids.distinct.length === 4)
    assert(ids.forall(v => v >= 5 && (v - 5) % 5 == 0), ids.toSeq.toString)
    assert(got.select("d").distinct.count() === 1)
    assert(t.snapshot.metadata.configuration("graft.appendOnly") === "true")
    // idempotent with createIfNotExists
    Graft.build(spark).location(dir)
      .addColumn("whatever", StringType).createIfNotExists().execute()
    assert(Graft.read(spark, dir).columns.length === 4)
  }

  test("builder replace modes swap the definition atomically") {
    val dir = tmpDir()
    Graft.write(spark.range(10).toDF("id"), dir)
    // createOrReplace on an existing table: new schema, old data gone,
    // history continuous (same table id, version advances)
    val idBefore = GraftTable.forPath(spark, dir).snapshot.metadata.id
    Graft.build(spark).location(dir)
      .addColumn("k", LongType).addColumn("v", StringType)
      .createOrReplace().execute()
    val s = GraftTable.forPath(spark, dir).snapshot
    assert(s.metadata.schema.fieldNames.toSeq === Seq("k", "v"))
    assert(s.metadata.id === idBefore)
    assert(Graft.read(spark, dir).count() === 0)
    assert(s.version > 0)
    // replace() requires existence
    val e = intercept[IllegalArgumentException] {
      Graft.build(spark).location(tmpDir() + "/nope")
        .addColumn("x", LongType).replace().execute()
    }
    assert(e.getMessage.contains("REPLACE"), e.getMessage)
    // time travel still reads the pre-replace data
    assert(GraftTable.forPath(spark, dir).asOfVersion(0).count() === 10)
    // cloneAtTimestamp clones the pinned historical version
    val ts = new java.sql.Timestamp(System.currentTimeMillis() + 60000)
    val dest = tmpDir() + "/tclone"
    GraftTable.forPath(spark, dir).cloneAtTimestamp(ts.toString, dest)
    assert(Graft.read(spark, dest).columns.toSeq === Seq("k", "v"))
  }

  test("batch readChangeFeed options and table_changes_by_path") {
    val dir = tmpDir()
    Graft.write(spark.range(5).toDF("id"), dir,
      configuration = Map("graft.enableChangeDataFeed" -> "true"))
    GraftTable.forPath(spark, dir).delete("id >= 3")
    Graft.write(spark.range(5, 7).toDF("id"), dir)
    val cdf = spark.read.format("graft")
      .option("readChangeFeed", "true")
      .option("startingVersion", "1")
      .load(dir)
    val byType = cdf.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType === Map("delete" -> 2L, "insert" -> 2L))
    val viaTvf = spark.sql(
      s"SELECT count(*) FROM table_changes_by_path('$dir', 1)").head.getLong(0)
    assert(viaTvf === 4L)
  }

  test("forName, cloneAtVersion, restoreToTimestamp, upgradeTableProtocol") {
    val dir = tmpDir()
    Graft.write(spark.range(5).toDF("id"), dir)        // v0
    Graft.write(spark.range(5, 9).toDF("id"), dir)     // v1
    val t = GraftTable.forPath(spark, dir)
    val cdir = tmpDir() + "/c"
    t.cloneAtVersion(0, cdir)
    assert(Graft.read(spark, cdir).count() === 5)
    t.upgradeTableProtocol(2, 2)
    assert(t.snapshot.protocol.minReaderVersion === 2)
    intercept[IllegalArgumentException] { t.upgradeTableProtocol(1, 1) }
    val ts0 = new java.sql.Timestamp(
      graft.log.GraftLog.forTable(spark, dir).listCommitTimestamps()
        .find(_._1 == 0L).get._2)
    t.restoreToTimestamp(ts0.toString)
    assert(Graft.read(spark, dir).count() === 5)
    val name = s"r4names_${System.nanoTime}"
    spark.sql(s"CREATE TABLE $name (x BIGINT) USING graft LOCATION '${tmpDir()}/n'")
    spark.sql(s"INSERT INTO $name VALUES (1), (2)")
    assert(GraftTable.forName(spark, name).toDF.count() === 2)
  }

  test("dataSkippingNumIndexedCols bounds stats collection and skipping") {
    val dir = tmpDir()
    Graft.write(
      spark.range(100).select($"id", ($"id" * 3).as("v")), dir,
      configuration = Map("graft.dataSkippingNumIndexedCols" -> "1"))
    val log = graft.log.GraftLog.forTable(spark, dir)
    val statsJsons = log.update().allFiles.flatMap(f => Option(f.stats))
    assert(statsJsons.nonEmpty)
    // stats cover `id` but not `v`
    assert(statsJsons.forall(_.contains("\"id\"")))
    assert(!statsJsons.exists(_.contains("\"v\"")))
    // filters on the un-indexed column still answer correctly
    assert(Graft.read(spark, dir).filter($"v" === 30).count() === 1)
  }

  test("VACUUM USING INVENTORY deletes only inventoried, unreferenced files") {
    val dir = tmpDir()
    Graft.write(spark.range(100).toDF("id"), dir)
    val t = GraftTable.forPath(spark, dir)
    t.delete(col("id") < 50)
    // orphan file the log never saw
    val orphan = new java.io.File(dir, "orphan-data.parquet")
    Files.write(orphan.toPath, Array[Byte](1, 2, 3))
    val stale = System.currentTimeMillis() - 1000
    orphan.setLastModified(stale)
    // a stale file OUTSIDE the table root (bucket-wide inventory reports
    // include the whole bucket): vacuum must never touch it
    val outside = java.io.File.createTempFile("graft-outside", ".parquet")
    Files.write(outside.toPath, Array[Byte](9, 9))
    outside.setLastModified(stale)
    // inventory names the orphan plus one LIVE file (which must survive)
    val live = graft.log.GraftLog.forTable(spark, dir).update().allFiles.head.path
    val inv = Seq(
      (orphan.getAbsolutePath, 3L, false, stale),
      (outside.getAbsolutePath, 2L, false, stale),
      (new java.io.File(dir, live).getAbsolutePath, 1L, false, stale),
      (dir + "/some-sub-dir", 0L, true, stale)    // dirs are ignored
    ).toDF("path", "length", "isDir", "modificationTime")
    spark.conf.set(graft.commands.VacuumCommand.retentionCheckConf, "false")
    try {
      // timestamp-typed modificationTime must read as epoch millis, not
      // seconds: a dry run over a FUTURE-stamped inventory deletes nothing
      val futureInv = Seq((orphan.getAbsolutePath, 3L, false,
        new java.sql.Timestamp(System.currentTimeMillis() + 3600 * 1000)))
        .toDF("path", "length", "isDir", "modificationTime")
      assert(t.vacuum(retentionHours = 0.0, dryRun = true,
        inventory = Some(futureInv)).count() === 0)
      val deleted = t.vacuum(retentionHours = 0.0, inventory = Some(inv))
      assert(deleted.as[String].collect().toSet ===
        Set("file:" + orphan.getAbsolutePath))
      assert(!orphan.exists())
      assert(outside.exists(), "vacuum deleted a file outside the table root")
      outside.delete()
      assert(Graft.read(spark, dir).count() === 50)
      // tombstoned-but-unlisted files are untouched: inventory is the
      // listing, not the snapshot
      assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet")) >= 1)
    } finally {
      spark.conf.set(graft.commands.VacuumCommand.retentionCheckConf, "true")
    }
  }
}
