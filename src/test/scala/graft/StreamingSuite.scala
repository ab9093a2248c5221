package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

class StreamingSuite extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  def tmpDir(): String = Files.createTempDirectory("graft-stream").toString

  /** getBatch returns a streaming plan; flip the flag so a test can run
    * actions on it outside a streaming query. */
  private def materialize(df: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val plan = df.queryExecution.logical.transform {
      case lr: LogicalRelation if lr.isStreaming => lr.copy(isStreaming = false)
    }
    org.apache.spark.sql.graftshim.SparkShims.ofRows(spark, plan)
  }

  test("format(graft) batch write and read with time travel options") {
    val dir = tmpDir()
    spark.range(10).toDF("id").write.format("graft").save(dir)
    spark.range(10, 20).toDF("id").write.format("graft")
      .mode("append").save(dir)
    assert(spark.read.format("graft").load(dir).count() === 20)
    assert(spark.read.format("graft").option("versionAsOf", "0")
      .load(dir).count() === 10)
    // path@v<version> suffix syntax
    assert(spark.read.format("graft").load(s"$dir@v0").count() === 10)
    assert(spark.read.format("graft").load(s"$dir@v1").count() === 20)
    // path@yyyyMMddHHmmssSSS timestamp suffix: a far-future timestamp
    // resolves to the latest version
    assert(spark.read.format("graft").load(s"$dir@29990101000000000")
      .count() === 20)
    // a suffix pointing past the log fails as a missing version
    intercept[Exception] {
      spark.read.format("graft").load(s"$dir@v99").collect()
    }
    // suffix + explicit option is ambiguous -> error, never a silent pick
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft").option("versionAsOf", "0")
        .load(s"$dir@v1").collect()
    }
    assert(e.getMessage.contains("Cannot combine"))
  }

  test("format(graft) read applies deletion vectors") {
    val dir = tmpDir()
    Graft.write(spark.range(100).toDF("id"), dir,
      configuration = Map("graft.enableDeletionVectors" -> "true"))
    GraftTable.forPath(spark, dir).delete("id < 30")
    // the delete wrote DVs, not rewritten files; the DSv1 read must
    // filter the marked rows rather than resurrect them
    val log = graft.log.GraftLog.forTable(spark, dir)
    assert(log.update().allFiles.exists(_.dvPath.isDefined))
    val got = spark.read.format("graft").load(dir)
    assert(got.count() === 70)
    assert(got.agg(org.apache.spark.sql.functions.min("id"))
      .head.getLong(0) === 30)
    // time travel back to v0 still sees everything
    assert(spark.read.format("graft").load(s"$dir@v0").count() === 100)
  }

  test("streaming initial snapshot applies deletion vectors") {
    val dir = tmpDir()
    val ckpt = tmpDir()
    Graft.write(spark.range(100).toDF("id"), dir,
      configuration = Map("graft.enableDeletionVectors" -> "true"))
    GraftTable.forPath(spark, dir).delete("id < 30")
    assert(graft.log.GraftLog.forTable(spark, dir).update()
      .allFiles.exists(_.dvPath.isDefined))
    val q = spark.readStream.format("graft").load(dir)
      .writeStream.format("memory").queryName("dv_stream_rows")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("dv_stream_rows").collect().map(_.getLong(0))
    assert(got.length === 70, s"expected 70 live rows, got ${got.length}")
    assert(got.min === 30)
  }

  test("format(graft) partitioned write via writer API") {
    val dir = tmpDir()
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    li.write.format("graft").partitionBy("l_returnflag").save(dir)
    val back = spark.read.format("graft").load(dir)
    assert(back.count() === li.count())
    assert(back.filter(col("l_returnflag") === "A").count() ===
      li.filter(col("l_returnflag") === "A").count())
  }

  test("streaming source: initial snapshot then appended commits") {
    val dir = tmpDir()
    val ckpt = tmpDir()
    Graft.write(spark.range(10).toDF("id"), dir)
    Graft.write(spark.range(10, 25).toDF("id"), dir)
    val q = spark.readStream.format("graft").load(dir)
      .groupBy().count()
      .writeStream.format("memory").queryName("src_counts")
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val n = spark.table("src_counts").head.getLong(0)
    assert(n === 25)
  }

  test("streaming source with maxFilesPerTrigger admission") {
    val dir = tmpDir()
    val ckpt = tmpDir()
    (0 until 4).foreach(i => Graft.write(spark.range(i * 10, i * 10 + 10).toDF("id"), dir))
    val q = spark.readStream.format("graft")
      .option("maxFilesPerTrigger", "1")
      .load(dir)
      .writeStream.format("memory").queryName("adm_rows")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(spark.table("adm_rows").count() === 40)
  }

  test("Trigger.AvailableNow drains in multiple admission-bounded batches") {
    val dir = tmpDir()
    val ckpt = tmpDir()
    (0 until 3).foreach(i =>
      Graft.write(spark.range(i * 10, i * 10 + 10).toDF("id").coalesce(1), dir))
    val q = spark.readStream.format("graft")
      .option("maxFilesPerTrigger", "1")
      .load(dir)
      .writeStream.format("memory").queryName("an_rows")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(spark.table("an_rows").count() === 30)
    // One file per batch: the source implements SupportsTriggerAvailableNow,
    // so AvailableNow must NOT fall back to one mega-batch.
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length >= 3, s"expected >=3 admission-bounded batches, " +
      s"got ${batches.length}")
  }

  test("dropDuplicatesWithinWatermark bounds dedup state via eviction") {
    import org.apache.spark.sql.functions.timestamp_seconds
    val dir = tmpDir()
    val ckpt = tmpDir()
    val t0 = 1700000000L
    // three commits an hour apart; commit 2 carries in-batch duplicates
    Graft.write(spark.range(100).toDF("id")
      .withColumn("ts", timestamp_seconds(lit(t0))).coalesce(1), dir)
    Graft.write(spark.range(100, 150).union(spark.range(100, 150)).toDF("id")
      .withColumn("ts", timestamp_seconds(lit(t0 + 3600))).coalesce(1), dir)
    Graft.write(spark.range(200, 210).toDF("id")
      .withColumn("ts", timestamp_seconds(lit(t0 + 7200))).coalesce(1), dir)
    val q = spark.readStream.format("graft")
      .option("maxFilesPerTrigger", "1")
      .load(dir)
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
      .writeStream.format("memory").queryName("wm_dedup")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // in-batch duplicates collapse; all distinct ids emit exactly once
    assert(spark.table("wm_dedup").count() === 160)
    // bounded state: the watermark evicted commit-1's 100 digests once it
    // advanced past t0 + delay — the state never holds the whole history
    // (plain dropDuplicates would sit at 160 forever)
    val lastState = q.recentProgress
      .filter(_.stateOperators.nonEmpty).last.stateOperators.head
    assert(lastState.numRowsTotal < 100,
      s"dedup state held ${lastState.numRowsTotal} rows — watermark never evicted")
  }

  test("dataChange=false rewrites are invisible to a tailing stream") {
    val dir = tmpDir()
    val ckpt = tmpDir()
    Graft.write(spark.range(10).toDF("id"), dir)
    // manual compaction: same rows, new layout, flagged as no data change
    val current = Graft.read(spark, dir)
    Graft.write(current.coalesce(1), dir, mode = "overwrite", dataChange = false)
    intercept[IllegalArgumentException] {
      Graft.write(current, dir, mode = "overwrite",
        replaceWhere = Some("id < 5"), dataChange = false)
    }
    Graft.write(spark.range(10, 15).toDF("id"), dir)
    // a stream from v1 (the rewrite) sees only the later append, not the
    // rearranged copies of rows it would otherwise double-read
    val q = spark.readStream.format("graft")
      .option("startingVersion", "1")
      .load(dir)
      .writeStream.format("memory").queryName("dc_rows")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(spark.table("dc_rows").collect().map(_.getLong(0)).sorted.toSeq ===
      (10L until 15L))
    assert(Graft.read(spark, dir).count() === 15)
  }

  test("streaming sink: exactly-once into graft table") {
    val srcDir = tmpDir()
    val outDir = tmpDir()
    val ckpt = tmpDir()
    Graft.write(spark.range(30).toDF("id"), srcDir)
    val q = spark.readStream.format("graft").load(srcDir)
      .withColumn("doubled", col("id") * 2)
      .writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start(outDir)
    q.awaitTermination(120000)
    val out = Graft.read(spark, outDir)
    assert(out.count() === 30)
    assert(out.agg(sum("doubled")).head.getLong(0) === (0 until 30).map(_ * 2).sum)
    // restart with same checkpoint: no duplicate writes
    val q2 = spark.readStream.format("graft").load(srcDir)
      .withColumn("doubled", col("id") * 2)
      .writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start(outDir)
    q2.awaitTermination(120000)
    assert(Graft.read(spark, outDir).count() === 30)
  }

  test("streaming CDF from a mid-stream startingVersion") {
    val dir = tmpDir(); val ckpt = tmpDir()
    Graft.write(spark.range(10).select(col("id"), lit(0L).as("v")), dir,
      configuration = Map("graft.enableChangeDataFeed" -> "true"))     // v0
    val t = GraftTable.forPath(spark, dir)
    t.delete(col("id") >= 8)                                           // v1
    t.update(col("id") === 0, Map("v" -> lit(5L)))                     // v2
    Graft.write(spark.range(20, 23).select(col("id"), lit(1L).as("v")), dir) // v3
    val outDir = tmpDir()
    def run() = spark.readStream.format("graft")
      .option("readChangeFeed", "true")
      .option("startingVersion", "1")
      .load(dir)
      .writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start(outDir)
    run().awaitTermination(120000)
    val rows = Graft.read(spark, outDir)
    val byType = rows.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType("delete") === 2)
    assert(byType("update_preimage") === 1)
    assert(byType("update_postimage") === 1)
    assert(byType("insert") === 3)
    assert(rows.select("_commit_version").distinct().count() === 3)
    // incremental restart: one more update flows as a new CDF batch
    t.update(col("id") === 1, Map("v" -> lit(7L)))                     // v4
    run().awaitTermination(120000)
    assert(Graft.read(spark, outDir)
      .filter(col("_commit_version") === 4).count() === 2)
  }

  test("streaming CDF replays the initial snapshot as inserts") {
    val dir = tmpDir(); val ckpt = tmpDir()
    Graft.write(spark.range(5).toDF("id"), dir,
      configuration = Map("graft.enableChangeDataFeed" -> "true"))
    GraftTable.forPath(spark, dir).delete(col("id") === 0)
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true")
      .load(dir)
      .writeStream.format("memory").queryName("cdf_snap")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // snapshot-at-init (v1: 4 surviving rows) replays as insert
    val rows = spark.table("cdf_snap")
    assert(rows.filter(col("_change_type") === "insert").count() === 4)
    assert(rows.count() === 4)
  }

  test("startingTimestamp picks the first commit at or after the timestamp") {
    val dir = tmpDir(); val ckpt = tmpDir()
    Graft.write(spark.range(5).toDF("id"), dir)           // v0
    Thread.sleep(1500)
    val mid = new java.sql.Timestamp(System.currentTimeMillis())
    Thread.sleep(1500)
    Graft.write(spark.range(10, 13).toDF("id"), dir)      // v1
    val q = spark.readStream.format("graft")
      .option("startingTimestamp", mid.toString)
      .load(dir)
      .writeStream.format("memory").queryName("ts_rows")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // only v1's rows: v0 predates the timestamp
    assert(spark.table("ts_rows").select("id").collect().map(_.getLong(0)).toSet
      === Set(10L, 11L, 12L))
  }

  test("schema change mid-stream drains, records in the tracking log, restart adopts") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val src = tmpDir(); val out = tmpDir(); val ckpt = tmpDir()
    Graft.write(spark.range(5).toDF("id"), src)
    // a long-lived source instance pins the schema at creation and seeds
    // the tracking log with it
    val source = new graft.streaming.GraftSource(spark,
      graft.log.GraftLog.forTable(spark, src),
      Map("schemaTrackingLocation" -> ckpt))
    val end = source.latestOffset(null, ReadLimit.allAvailable())
    assert(end != null)
    // one more old-schema commit, THEN the schema change: the source must
    // drain the old-schema files before adopting
    Graft.write(spark.range(100, 102).toDF("id"), src, mode = "append")
    Graft.write(spark.range(5, 8).toDF("id").withColumn("extra", lit("x")),
      src, mergeSchema = true)
    // first call admits the pre-change commit (no failure yet)
    val mid = source.latestOffset(end, ReadLimit.allAvailable())
    assert(graft.streaming.GraftSourceOffset.convert(mid)
      .reservoirVersion < 2 ||
      graft.streaming.GraftSourceOffset.convert(mid).json != end.json)
    assert(materialize(source.getBatch(Some(end.asInstanceOf[
        org.apache.spark.sql.execution.streaming.Offset]),
      mid.asInstanceOf[org.apache.spark.sql.execution.streaming.Offset]))
      .count() === 2)
    // drained: the next call hits the barrier, persists, and fails
    val err = intercept[UnsupportedOperationException] {
      source.latestOffset(mid, ReadLimit.allAvailable())
    }
    assert(err.getMessage.contains("Schema change"))
    assert(err.getMessage.contains("Restart"))
    // restart: a fresh source pins the ADOPTED schema from the log
    val restarted = new graft.streaming.GraftSource(spark,
      graft.log.GraftLog.forTable(spark, src),
      Map("schemaTrackingLocation" -> ckpt))
    assert(restarted.schema.fieldNames.contains("extra"))
    val tl = new graft.streaming.SchemaTrackingLog(
      graft.log.GraftLog.forTable(spark, src).store,
      new org.apache.hadoop.fs.Path(ckpt))
    val latest = tl.latest().get
    assert(latest.seqNum === 1L)
    assert(latest.metadata.schema.fieldNames.contains("extra"))
    // the restarted source serves the post-change commit with new schema
    val end2 = restarted.latestOffset(mid, ReadLimit.allAvailable())
    val batch = restarted.getBatch(Some(mid.asInstanceOf[
        org.apache.spark.sql.execution.streaming.Offset]),
      end2.asInstanceOf[org.apache.spark.sql.execution.streaming.Offset])
    assert(batch.columns.contains("extra"))
    // end-to-end: a restarted query drains everything under the new schema
    val q = spark.readStream.format("graft").load(src)
      .writeStream.format("graft").option("path", out)
      .option("checkpointLocation", ckpt + "/q")
      .option("mergeSchema", "true")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val result = Graft.read(spark, out)
    assert(result.count() === 10)
    assert(result.columns.contains("extra"))
    assert(result.filter(col("extra").isNull).count() === 7)
  }

  test("non-additive schema change requires allowSourceColumnRenameAndDrop") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val src = tmpDir(); val ckpt = tmpDir()
    Graft.write(spark.range(5).toDF("id").withColumn("tag", lit("a")), src)
    val source = new graft.streaming.GraftSource(spark,
      graft.log.GraftLog.forTable(spark, src),
      Map("schemaTrackingLocation" -> ckpt))
    val end = source.latestOffset(null, ReadLimit.allAvailable())
    // drop `tag`
    GraftTable.forPath(spark, src).dropColumn("tag")
    Graft.write(spark.range(5, 7).toDF("id"), src, mode = "append")
    // without the unblock option, adoption is refused with a clear error
    val refused = intercept[UnsupportedOperationException] {
      source.latestOffset(end, ReadLimit.allAvailable())
    }
    assert(refused.getMessage.contains("allowSourceColumnRenameAndDrop"))
    // tracking log still holds only the seed entry
    val tl = new graft.streaming.SchemaTrackingLog(
      graft.log.GraftLog.forTable(spark, src).store,
      new org.apache.hadoop.fs.Path(ckpt))
    assert(tl.latest().get.seqNum === 0L)
    // with the option, the change is recorded and the stream restarts
    val unblocked = new graft.streaming.GraftSource(spark,
      graft.log.GraftLog.forTable(spark, src),
      Map("schemaTrackingLocation" -> ckpt,
        "allowSourceColumnRenameAndDrop" -> "true"))
    val adopted = intercept[UnsupportedOperationException] {
      unblocked.latestOffset(end, ReadLimit.allAvailable())
    }
    assert(adopted.getMessage.contains("Restart"))
    assert(tl.latest().get.seqNum === 1L)
    assert(!tl.latest().get.metadata.schema.fieldNames.contains("tag"))
    // restart serves the post-drop commit with the adopted (narrower) schema
    val restarted = new graft.streaming.GraftSource(spark,
      graft.log.GraftLog.forTable(spark, src),
      Map("schemaTrackingLocation" -> ckpt))
    assert(restarted.schema.fieldNames.toSeq === Seq("id"))
    val end2 = restarted.latestOffset(end, ReadLimit.allAvailable())
    val batch = restarted.getBatch(Some(end.asInstanceOf[
        org.apache.spark.sql.execution.streaming.Offset]),
      end2.asInstanceOf[org.apache.spark.sql.execution.streaming.Offset])
    assert(batch.columns.toSeq === Seq("id"))
    assert(materialize(batch).count() === 2)
  }

  test("source fails on change commits unless skipChangeCommits") {
    val dir = tmpDir()
    val ckpt = tmpDir()
    val outDir = tmpDir()
    Graft.write(spark.range(10).toDF("id"), dir)
    def run(extra: Map[String, String] = Map.empty) = {
      var r = spark.readStream.format("graft")
      extra.foreach { case (k, v) => r = r.option(k, v) }
      r.load(dir)
        .writeStream.format("graft")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start(outDir)
    }
    run().awaitTermination(120000)          // consumes initial snapshot @v0
    assert(Graft.read(spark, outDir).count() === 10)
    GraftTable.forPath(spark, dir).delete(col("id") < 3)  // v1: change commit
    val q2 = run()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.awaitTermination()
    }
    assert(err.getMessage.contains("ignoreChanges") ||
      Option(err.getCause).exists(_.getMessage.contains("ignoreChanges")))
    // resuming with skipChangeCommits passes over the change commit,
    // then a plain append (v2) flows through
    Graft.write(spark.range(100, 105).toDF("id"), dir)
    val q3 = run(Map("skipChangeCommits" -> "true"))
    q3.awaitTermination(120000)
    assert(Graft.read(spark, outDir).count() === 15)
  }

  test("batch-0 replay after restart pins the END offset's snapshot version") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    import org.apache.spark.sql.execution.streaming.{Offset => ExecOffset}
    val src = tmpDir()
    Graft.write(spark.range(0, 12).toDF("id").repartition(3), src)
    val source = new graft.streaming.GraftSource(spark,
      graft.log.GraftLog.forTable(spark, src), Map.empty)
    val end = source.latestOffset(null, ReadLimit.maxFiles(2))
    val expected = materialize(source.getBatch(None,
      end.asInstanceOf[ExecOffset])).select("id").collect().map(_.getLong(0)).toSet
    assert(expected.nonEmpty && expected.size < 12)
    // the table moves on: a DELETE rewrites early files, so the CURRENT
    // snapshot's sorted file list differs from the one batch 0 admitted
    GraftTable.forPath(spark, src).delete("id % 2 = 0")
    // crash-restart: a FRESH source replays the WAL-committed batch 0
    graft.log.GraftLog.clearCache()
    val restarted = new graft.streaming.GraftSource(spark,
      graft.log.GraftLog.forTable(spark, src), Map.empty)
    val replayed = materialize(restarted.getBatch(None,
      end.asInstanceOf[ExecOffset])).select("id").collect().map(_.getLong(0)).toSet
    assert(replayed === expected,
      "restart replayed batch 0 from the current table version, not the " +
        s"offset's snapshot: got $replayed, expected $expected")
  }

  test("startingVersion=latest batch-0 replay survives restart via offset origin") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    import org.apache.spark.sql.execution.streaming.{Offset => ExecOffset}
    val src = tmpDir()
    Graft.write(spark.range(0, 5).toDF("id"), src) // v0 (pre-stream)
    val source = new graft.streaming.GraftSource(spark,
      graft.log.GraftLog.forTable(spark, src),
      Map("startingVersion" -> "latest"))
    Graft.write(spark.range(100, 103).toDF("id"), src, mode = "append") // v1
    val end = source.latestOffset(null, ReadLimit.allAvailable())
    assert(end != null)
    // the offset carries the stream origin and round-trips through json
    val goff = graft.streaming.GraftSourceOffset.convert(end)
    assert(goff.startVersion === Some(1L))
    assert(graft.streaming.GraftSourceOffset.fromJson(goff.json) === goff)
    // restart BEFORE batch 0 commits: the re-derived "latest" would point
    // past v1; replay must come from the offset's origin instead
    graft.log.GraftLog.clearCache()
    val restarted = new graft.streaming.GraftSource(spark,
      graft.log.GraftLog.forTable(spark, src),
      Map("startingVersion" -> "latest"))
    val replayed = materialize(restarted.getBatch(None,
      end.asInstanceOf[ExecOffset])).select("id").collect().map(_.getLong(0)).toSet
    assert(replayed === Set(100L, 101L, 102L),
      s"restart lost the WAL-committed batch: $replayed")
    // pre-fix offsets (no startVersion field) still parse
    val legacy = graft.streaming.GraftSourceOffset.fromJson(
      """{"reservoirVersion":3,"index":7,"isInitialSnapshot":false}""")
    assert(legacy === graft.streaming.GraftSourceOffset(3L, 7L,
      isInitialSnapshot = false))
  }

  test("admission cap stops BEFORE peeking into a change commit") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val src = tmpDir()
    Graft.write(spark.range(0, 9).toDF("id").repartition(3), src) // v0: 3 files
    val source = new graft.streaming.GraftSource(spark,
      graft.log.GraftLog.forTable(spark, src), Map.empty)
    GraftTable.forPath(spark, src).delete("id < 3") // v1: update commit
    // the snapshot's 3 files fill the cap exactly; latestOffset must
    // deliver them WITHOUT walking into v1 (whose update would throw)
    val end = source.latestOffset(null, ReadLimit.maxFiles(3))
    assert(end != null)
    assert(graft.streaming.GraftSourceOffset.convert(end).isInitialSnapshot)
    // the next call does reach v1 and fails loudly as before
    val e = intercept[UnsupportedOperationException] {
      source.latestOffset(end, ReadLimit.maxFiles(3))
    }
    assert(e.getMessage.contains("update/delete"))
  }

  test("graft sink rejects Update output mode at construction") {
    import org.apache.spark.sql.streaming.OutputMode
    val e = intercept[IllegalArgumentException] {
      new graft.streaming.GraftSink(
        spark.sqlContext, tmpDir(), Nil, OutputMode.Update(), Map.empty)
    }
    assert(e.getMessage.contains("Append and Complete"))
  }
}
