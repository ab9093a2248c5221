package graft

import java.nio.file.{Files => JFiles, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/**
 * CONVERT FROM DELTA against hand-authored `_delta_log` directories that
 * follow the PUBLIC Delta protocol layout (JSON commits, classic and
 * multi-part checkpoints, delta.* table properties, column-mapping field
 * metadata) — no Delta library involved on either side.
 */
class DeltaConvertSuite extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(): String =
    JFiles.createTempDirectory("graft-deltacnv").toString

  /** Write `df` as exactly one parquet file at tableDir/name. */
  private def writeFile(df: DataFrame, tableDir: String, name: String): Long = {
    val t = JFiles.createTempDirectory("dcnv-part").toString
    df.coalesce(1).write.mode("overwrite").parquet(t)
    val part = new java.io.File(t).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val dest = Paths.get(tableDir, name)
    JFiles.createDirectories(dest.getParent)
    JFiles.move(part.toPath, dest, StandardCopyOption.REPLACE_EXISTING)
    JFiles.size(dest)
  }

  private def writeLog(tableDir: String, version: Long, lines: Seq[String]): Unit = {
    val log = Paths.get(tableDir, "_delta_log")
    JFiles.createDirectories(log)
    JFiles.writeString(log.resolve(f"$version%020d.json"),
      lines.mkString("", "\n", "\n"))
  }

  private def protoLine(r: Int = 1, w: Int = 2): String =
    s"""{"protocol":{"minReaderVersion":$r,"minWriterVersion":$w}}"""

  private def metaLine(schema: StructType, partCols: Seq[String] = Nil,
      conf: Map[String, String] = Map.empty): String = {
    val confJson = conf.map { case (k, v) => s""""$k":"$v"""" }.mkString(",")
    val pc = partCols.map(c => s""""$c"""").mkString(",")
    s"""{"metaData":{"id":"11111111-2222-3333-4444-555555555555",""" +
      s""""format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${com.fasterxml.jackson.databind.json.JsonMapper.builder.build
        .writeValueAsString(schema.json)},""" +
      s""""partitionColumns":[$pc],"configuration":{$confJson},""" +
      s""""createdTime":1700000000000}}"""
  }

  private def addLine(path: String, size: Long, stats: String = null,
      pv: String = "{}"): String = {
    val statsPart = if (stats == null) ""
      else s""","stats":${com.fasterxml.jackson.databind.json.JsonMapper.builder.build
        .writeValueAsString(stats)}"""
    s"""{"add":{"path":"$path","partitionValues":$pv,"size":$size,""" +
      s""""modificationTime":1700000000000,"dataChange":true$statsPart}}"""
  }

  test("two-commit delta table converts zero-copy and stays fully writable") {
    val dir = tmpDir()
    val schema = new StructType().add("id", LongType).add("v", StringType)
    val s1 = writeFile(spark.range(0, 10).select($"id", concat(lit("a"), $"id").as("v")), dir, "f1.parquet")
    val s2 = writeFile(spark.range(10, 30).select($"id", concat(lit("b"), $"id").as("v")), dir, "f2.parquet")
    val s3 = writeFile(spark.range(30, 35).select($"id", concat(lit("c"), $"id").as("v")), dir, "f3.parquet")
    writeLog(dir, 0, Seq(
      """{"commitInfo":{"timestamp":1700000000000,"operation":"WRITE"}}""",
      protoLine(), metaLine(schema),
      addLine("f1.parquet", s1,
        """{"numRecords":10,"minValues":{"id":0},"maxValues":{"id":9},"nullCount":{"id":0}}"""),
      addLine("f2.parquet", s2,
        """{"numRecords":20,"minValues":{"id":10},"maxValues":{"id":29},"nullCount":{"id":0}}""")))
    writeLog(dir, 1, Seq(
      """{"commitInfo":{"timestamp":1700000001000,"operation":"DELETE"}}""",
      """{"remove":{"path":"f1.parquet","deletionTimestamp":1700000001000,"dataChange":true}}""",
      addLine("f3.parquet", s3,
        """{"numRecords":5,"minValues":{"id":30},"maxValues":{"id":34},"nullCount":{"id":0}}""")))

    val t = Graft.convertFromDelta(spark, dir)
    assert(t.snapshot.numFiles === 2)
    val got = Graft.read(spark, dir).orderBy("id").as[(Long, String)].collect()
    assert(got.map(_._1).toSeq === ((10L until 35L).toSeq))
    assert(got.head === ((10L, "b10")))
    // carried-over stats drive skipping immediately
    val kept = graft.stats.StatsSkipping.pruneAndFilter(
      spark, t.snapshot, None, new StructType(), Nil,
      new StructType().add("id", LongType),
      Seq(org.apache.spark.sql.catalyst.expressions.EqualTo(
        org.apache.spark.sql.catalyst.expressions.AttributeReference(
          "id", LongType)(), org.apache.spark.sql.catalyst.expressions.Literal(33L))))
    assert(kept.map(_.path) === Seq("f3.parquet"))
    // the converted table is a first-class graft table: DML on it works
    spark.sql(s"DELETE FROM graft.`$dir` WHERE id >= 30")
    assert(Graft.read(spark, dir).count() === 20)
  }

  test("classic multi-part checkpoint + JSON tail fold correctly") {
    val dir = tmpDir()
    val schema = new StructType().add("id", LongType)
    val s1 = writeFile(spark.range(0, 5).toDF("id"), dir, "a.parquet")
    val s2 = writeFile(spark.range(5, 9).toDF("id"), dir, "b.parquet")
    val s3 = writeFile(spark.range(9, 12).toDF("id"), dir, "c.parquet")
    // checkpoint at v1 covering {a,b} (delta-shaped columns via JSON read)
    val cpSchema = StructType(Seq(
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("partitionValues", MapType(StringType, StringType)),
        StructField("size", LongType),
        StructField("modificationTime", LongType),
        StructField("dataChange", BooleanType),
        StructField("stats", StringType)))),
      StructField("metaData", StructType(Seq(
        StructField("id", StringType),
        StructField("schemaString", StringType),
        StructField("partitionColumns", ArrayType(StringType)),
        StructField("configuration", MapType(StringType, StringType))))),
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion", IntegerType),
        StructField("minWriterVersion", IntegerType))))))
    val part1 = Seq(protoLine(), metaLine(schema))
    val part2 = Seq(addLine("a.parquet", s1), addLine("b.parquet", s2))
    // part files must carry delta's exact multi-part names
    writeFileAs(spark.read.schema(cpSchema).json(part1.toDS), dir,
      f"_delta_log/${1L}%020d.checkpoint.${1}%010d.${2}%010d.parquet")
    writeFileAs(spark.read.schema(cpSchema).json(part2.toDS), dir,
      f"_delta_log/${1L}%020d.checkpoint.${2}%010d.${2}%010d.parquet")
    JFiles.writeString(Paths.get(dir, "_delta_log", "_last_checkpoint"),
      """{"version":1,"size":4,"parts":2}""")
    // tail commit: drop a, add c
    writeLog(dir, 2, Seq(
      """{"remove":{"path":"a.parquet","deletionTimestamp":1700000002000,"dataChange":true}}""",
      addLine("c.parquet", s3)))

    Graft.convertFromDelta(spark, dir)
    assert(Graft.read(spark, dir).orderBy("id").as[Long].collect().toSeq ===
      ((5L until 12L).toSeq))
  }

  private def writeFileAs(df: DataFrame, tableDir: String, rel: String): Unit =
    writeFile(df, tableDir, rel)

  test("partitioned delta table incl. null partition value") {
    val dir = tmpDir()
    val schema = new StructType().add("id", LongType).add("p", StringType)
    // delta data files exclude partition columns
    val s1 = writeFile(spark.range(0, 3).toDF("id"), dir, "p=x/f1.parquet")
    val s2 = writeFile(spark.range(3, 5).toDF("id"), dir, "p=y/f2.parquet")
    val s3 = writeFile(spark.range(5, 6).toDF("id"), dir, "np/f3.parquet")
    writeLog(dir, 0, Seq(
      protoLine(), metaLine(schema, partCols = Seq("p")),
      addLine("p=x/f1.parquet", s1, pv = """{"p":"x"}"""),
      addLine("p=y/f2.parquet", s2, pv = """{"p":"y"}"""),
      addLine("np/f3.parquet", s3, pv = """{"p":null}""")))
    Graft.convertFromDelta(spark, dir)
    val got = Graft.read(spark, dir).orderBy("id")
      .as[(Long, Option[String])].collect()
    assert(got.map(_._2).toSeq === Seq(Some("x"), Some("x"), Some("x"),
      Some("y"), Some("y"), None))
    // partition pruning through the log's partitionValues
    assert(Graft.read(spark, dir).where($"p" === "y").count() === 2)
  }

  test("column mapping (name mode) translates physical names") {
    val dir = tmpDir()
    // physical column name differs from the logical one
    writeFile(spark.range(0, 4).select($"id".as("col-abc123")), dir, "m1.parquet")
    val s1 = JFiles.size(Paths.get(dir, "m1.parquet"))
    val mapped = StructField("renamed_id", LongType, nullable = true,
      new MetadataBuilder()
        .putString("delta.columnMapping.physicalName", "col-abc123")
        .putLong("delta.columnMapping.id", 1L).build())
    writeLog(dir, 0, Seq(
      protoLine(2, 5), metaLine(StructType(Seq(mapped)),
        conf = Map("delta.columnMapping.mode" -> "name",
          "delta.columnMapping.maxColumnId" -> "1")),
      addLine("m1.parquet", s1)))
    val t = Graft.convertFromDelta(spark, dir)
    assert(Graft.read(spark, dir).columns.toSeq === Seq("renamed_id"))
    assert(Graft.read(spark, dir).agg(sum($"renamed_id")).head.getLong(0) === 6L)
    // mapping survives further graft DDL
    t.renameColumn("renamed_id", "rid2")
    assert(Graft.read(spark, dir).columns.toSeq === Seq("rid2"))
  }

  test("live inline deletion vectors import as graft DV sidecars") {
    val dir = tmpDir()
    val schema = new StructType().add("id", LongType)
    val s1 = writeFile(spark.range(0, 20).toDF("id"), dir, "d1.parquet")
    // DV over rows {3, 4, 7}: inline descriptor built with the same
    // spec formats the importer decodes
    val bm = new graft.dv.Bitmap64()
    Seq(3L, 4L, 7L).foreach(bm.add)
    val data = graft.dv.Bitmap64.toDeltaPortable(bm)
    val inline = graft.dv.DeltaDvCodec.z85Encode(data)
    writeLog(dir, 0, Seq(
      protoLine(3, 7), metaLine(schema),
      s"""{"add":{"path":"d1.parquet","partitionValues":{},"size":$s1,""" +
        s""""modificationTime":1,"dataChange":true,"stats":"{\\"numRecords\\":20}","deletionVector":""" +
        s"""{"storageType":"i","pathOrInlineDv":"$inline","sizeInBytes":${data.length},"cardinality":3}}}"""))
    val t = Graft.convertFromDelta(spark, dir)
    assert(t.snapshot.allFiles.head.dvPath.isDefined)
    assert(t.snapshot.protocol.readerFeatureNames.contains("deletionVectors"))
    assert(Graft.read(spark, dir).orderBy("id").as[Long].collect().toSeq ===
      (0L until 20L).filterNot(Seq(3L, 4L, 7L).contains))
    // the converted table keeps DV-deleting
    GraftTable.forPath(spark, dir).delete($"id" === 10L)
    assert(Graft.read(spark, dir).count() === 16)
  }

  test("properties translate (appendOnly + constraints)") {
    val schema = new StructType().add("id", LongType)
    // fresh table: appendOnly + constraint translation
    val dir2 = tmpDir()
    val s2 = writeFile(spark.range(1, 4).toDF("id"), dir2, "ok.parquet")
    writeLog(dir2, 0, Seq(
      protoLine(1, 3), metaLine(schema, conf = Map(
        "delta.appendOnly" -> "true",
        "delta.constraints.positive" -> "id > 0")),
      addLine("ok.parquet", s2)))
    Graft.convertFromDelta(spark, dir2)
    val snap = GraftTable.forPath(spark, dir2).snapshot
    assert(snap.metadata.configuration("graft.appendOnly") === "true")
    assert(snap.metadata.configuration(
      graft.constraints.Constraints.PROP_PREFIX + "positive") === "id > 0")
    // CHECK enforced on new writes; append-only blocks deletes
    intercept[Exception] { Graft.write(Seq(-5L).toDF("id"), dir2) }
    intercept[Exception] {
      GraftTable.forPath(spark, dir2).delete($"id" === 1L)
    }
    Graft.write(Seq(9L).toDF("id"), dir2)
    assert(Graft.read(spark, dir2).count() === 4)
  }

  /** Protocol-shaped action schema for hand-authored checkpoint parquet
    * (PROTOCOL.md checkpoint schema, projected). */
  private val actionDdl =
    """add STRUCT<path: STRING, partitionValues: MAP<STRING,STRING>, size: BIGINT,
         modificationTime: BIGINT, dataChange: BOOLEAN, stats: STRING>,
       remove STRUCT<path: STRING, deletionTimestamp: BIGINT, dataChange: BOOLEAN>,
       metaData STRUCT<id: STRING, format: STRUCT<provider: STRING,
         options: MAP<STRING,STRING>>, schemaString: STRING,
         partitionColumns: ARRAY<STRING>, configuration: MAP<STRING,STRING>,
         createdTime: BIGINT>,
       protocol STRUCT<minReaderVersion: INT, minWriterVersion: INT,
         readerFeatures: ARRAY<STRING>, writerFeatures: ARRAY<STRING>>,
       checkpointMetadata STRUCT<version: BIGINT>,
       sidecar STRUCT<path: STRING, sizeInBytes: BIGINT, modificationTime: BIGINT>"""

  /** Write action JSON `lines` as ONE parquet file at _delta_log/name
    * (name may contain a subdirectory, e.g. _sidecars/...). */
  private def writeActionParquet(tableDir: String, name: String,
      lines: Seq[String]): Long = {
    val schema = DataType.fromDDL(actionDdl).asInstanceOf[StructType]
    val t = JFiles.createTempDirectory("dcnv-cp").toString
    spark.read.schema(schema).json(lines.toDS)
      .coalesce(1).write.mode("overwrite").parquet(t)
    val part = new java.io.File(t).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val dest = Paths.get(tableDir, "_delta_log", name)
    JFiles.createDirectories(dest.getParent)
    JFiles.move(part.toPath, dest, StandardCopyOption.REPLACE_EXISTING)
    JFiles.size(dest)
  }

  test("uuid-named v2 checkpoint with sidecars converts past truncated history") {
    val dir = tmpDir()
    val schema = new StructType().add("id", LongType)
    val s1 = writeFile(spark.range(0, 6).toDF("id"), dir, "a.parquet")
    val s2 = writeFile(spark.range(6, 10).toDF("id"), dir, "b.parquet")
    val s3 = writeFile(spark.range(10, 13).toDF("id"), dir, "c.parquet")
    val scSize = writeActionParquet(dir, "_sidecars/sc-001.parquet",
      Seq(addLine("a.parquet", s1), addLine("b.parquet", s2)))
    writeActionParquet(dir,
      "00000000000000000001.checkpoint.80a083e8-7026-4e79-81be-64bd76c43a11.parquet",
      Seq(protoLine(3, 7), metaLine(schema),
        """{"checkpointMetadata":{"version":1}}""",
        s"""{"sidecar":{"path":"sc-001.parquet","sizeInBytes":$scSize,"modificationTime":1}}"""))
    JFiles.writeString(Paths.get(dir, "_delta_log", "_last_checkpoint"),
      """{"version":1,"size":4}""")
    // history CLEANED past version 1: only the tail commit exists
    writeLog(dir, 2, Seq(addLine("c.parquet", s3)))
    Graft.convertFromDelta(spark, dir)
    assert(Graft.read(spark, dir).orderBy("id").as[Long].collect().toSeq ===
      (0L until 13L))
  }

  test("JSON v2 manifest with parquet sidecars reads the sidecars as parquet") {
    val dir = tmpDir()
    val schema = new StructType().add("id", LongType)
    val s1 = writeFile(spark.range(0, 7).toDF("id"), dir, "j1.parquet")
    val s2 = writeFile(spark.range(7, 9).toDF("id"), dir, "j2.parquet")
    val scSize = writeActionParquet(dir, "_sidecars/sc-j.parquet",
      Seq(addLine("j1.parquet", s1)))
    // the manifest itself is a JSON file; its sidecars are still parquet
    JFiles.writeString(Paths.get(dir, "_delta_log",
      "00000000000000000001.checkpoint.1b78a3e0-1111-2222-3333-444455556666.json"),
      Seq(protoLine(3, 7), metaLine(schema),
        """{"checkpointMetadata":{"version":1}}""",
        s"""{"sidecar":{"path":"sc-j.parquet","sizeInBytes":$scSize,"modificationTime":1}}""")
        .mkString("", "\n", "\n"))
    JFiles.writeString(Paths.get(dir, "_delta_log", "_last_checkpoint"),
      """{"version":1,"size":3}""")
    writeLog(dir, 2, Seq(addLine("j2.parquet", s2)))
    Graft.convertFromDelta(spark, dir)
    assert(Graft.read(spark, dir).orderBy("id").as[Long].collect().toSeq ===
      (0L until 9L))
  }

  test("classic-NAMED v2 checkpoint (sidecar layout) reads its sidecars") {
    val dir = tmpDir()
    val schema = new StructType().add("id", LongType)
    val s1 = writeFile(spark.range(0, 8).toDF("id"), dir, "x.parquet")
    val s2 = writeFile(spark.range(8, 11).toDF("id"), dir, "y.parquet")
    // the spec allows a v2 checkpoint under the CLASSIC name: manifest
    // carries protocol+metaData+pointers, file actions live in sidecars
    val scSize = writeActionParquet(dir, "_sidecars/sc-x.parquet",
      Seq(addLine("x.parquet", s1)))
    writeActionParquet(dir, "00000000000000000001.checkpoint.parquet",
      Seq(protoLine(3, 7), metaLine(schema),
        """{"checkpointMetadata":{"version":1}}""",
        s"""{"sidecar":{"path":"sc-x.parquet","sizeInBytes":$scSize,"modificationTime":1}}"""))
    JFiles.writeString(Paths.get(dir, "_delta_log", "_last_checkpoint"),
      """{"version":1,"size":3}""")
    writeLog(dir, 2, Seq(addLine("y.parquet", s2)))
    Graft.convertFromDelta(spark, dir)
    // the sidecar-held base file must NOT be silently dropped
    assert(Graft.read(spark, dir).orderBy("id").as[Long].collect().toSeq ===
      (0L until 11L))
  }

  test("stale _last_checkpoint: newest complete checkpoint found by listing") {
    val dir = tmpDir()
    val schema = new StructType().add("id", LongType)
    val s1 = writeFile(spark.range(0, 5).toDF("id"), dir, "l1.parquet")
    writeActionParquet(dir, "00000000000000000001.checkpoint.parquet",
      Seq(protoLine(), metaLine(schema), addLine("l1.parquet", s1)))
    // pointer names version 9, which has no checkpoint and no JSON either
    JFiles.writeString(Paths.get(dir, "_delta_log", "_last_checkpoint"),
      """{"version":9,"size":3}""")
    Graft.convertFromDelta(spark, dir)
    assert(Graft.read(spark, dir).count() === 5)
  }

  test("stale pointer naming an OLDER checkpoint: newest complete wins") {
    val dir = tmpDir()
    val schema = new StructType().add("id", LongType)
    val s1 = writeFile(spark.range(0, 5).toDF("id"), dir, "a.parquet")
    val s2 = writeFile(spark.range(5, 8).toDF("id"), dir, "b.parquet")
    val s3 = writeFile(spark.range(8, 10).toDF("id"), dir, "c.parquet")
    writeActionParquet(dir, "00000000000000000002.checkpoint.parquet",
      Seq(protoLine(), metaLine(schema), addLine("a.parquet", s1)))
    writeActionParquet(dir, "00000000000000000004.checkpoint.parquet",
      Seq(protoLine(), metaLine(schema),
        addLine("a.parquet", s1), addLine("b.parquet", s2)))
    // a writer died before updating the pointer, and cleanup driven by
    // checkpoint 4 already removed commits 3-4: folding from the stale
    // pointer's version 2 would see a non-contiguous tail and refuse
    JFiles.writeString(Paths.get(dir, "_delta_log", "_last_checkpoint"),
      """{"version":2,"size":3}""")
    writeLog(dir, 5, Seq(addLine("c.parquet", s3)))
    Graft.convertFromDelta(spark, dir)
    assert(Graft.read(spark, dir).count() === 10)
  }

  test("writeStatsAsJson=false checkpoint: stats_parsed struct rebuilds JSON stats") {
    val dir = tmpDir()
    val schema = new StructType().add("id", LongType)
    val s1 = writeFile(spark.range(0, 10).toDF("id"), dir, "sp1.parquet")
    val s2 = writeFile(spark.range(100, 110).toDF("id"), dir, "sp2.parquet")
    // checkpoint carries ONLY the typed stats struct, no stats JSON
    val ddl =
      """add STRUCT<path: STRING, partitionValues: MAP<STRING,STRING>, size: BIGINT,
           modificationTime: BIGINT, dataChange: BOOLEAN,
           stats_parsed: STRUCT<numRecords: BIGINT, minValues: STRUCT<id: BIGINT>,
             maxValues: STRUCT<id: BIGINT>, nullCount: STRUCT<id: BIGINT>>>,
         metaData STRUCT<id: STRING, format: STRUCT<provider: STRING,
           options: MAP<STRING,STRING>>, schemaString: STRING,
           partitionColumns: ARRAY<STRING>, configuration: MAP<STRING,STRING>,
           createdTime: BIGINT>,
         protocol STRUCT<minReaderVersion: INT, minWriterVersion: INT>"""
    def spAdd(p: String, size: Long, lo: Long, hi: Long): String =
      s"""{"add":{"path":"$p","partitionValues":{},"size":$size,""" +
        s""""modificationTime":1,"dataChange":true,"stats_parsed":""" +
        s"""{"numRecords":10,"minValues":{"id":$lo},"maxValues":{"id":$hi},"nullCount":{"id":0}}}}"""
    val t0 = JFiles.createTempDirectory("dcnv-sp").toString
    spark.read.schema(DataType.fromDDL(ddl).asInstanceOf[StructType])
      .json(Seq(protoLine(), metaLine(schema),
        spAdd("sp1.parquet", s1, 0, 9), spAdd("sp2.parquet", s2, 100, 109)).toDS)
      .coalesce(1).write.mode("overwrite").parquet(t0)
    val part = new java.io.File(t0).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val dest = Paths.get(dir, "_delta_log", "00000000000000000001.checkpoint.parquet")
    JFiles.createDirectories(dest.getParent)
    JFiles.move(part.toPath, dest, StandardCopyOption.REPLACE_EXISTING)
    JFiles.writeString(Paths.get(dir, "_delta_log", "_last_checkpoint"),
      """{"version":1,"size":4}""")
    val t = Graft.convertFromDelta(spark, dir)
    assert(t.snapshot.allFiles.forall(f =>
      f.stats != null && f.stats.contains("numRecords")),
      s"stats_parsed not rebuilt: ${t.snapshot.allFiles.map(_.stats)}")
    // the rebuilt stats drive skipping immediately
    val kept = graft.stats.StatsSkipping.pruneAndFilter(
      spark, t.snapshot, None, new StructType(), Nil,
      new StructType().add("id", LongType),
      Seq(org.apache.spark.sql.catalyst.expressions.EqualTo(
        org.apache.spark.sql.catalyst.expressions.AttributeReference(
          "id", LongType)(), org.apache.spark.sql.catalyst.expressions.Literal(105L))))
    assert(kept.map(_.path) === Seq("sp2.parquet"))
    assert(Graft.read(spark, dir).count() === 20)
  }

  test("distributed convert of a fully-emptied table yields an empty graft table") {
    val dir = tmpDir()
    val schema = new StructType().add("id", LongType)
    // checkpoint state = one tombstone, zero live adds
    writeActionParquet(dir, "00000000000000000001.checkpoint.parquet",
      Seq(protoLine(), metaLine(schema),
        """{"remove":{"path":"gone.parquet","deletionTimestamp":1700000001000,"dataChange":true}}"""))
    JFiles.writeString(Paths.get(dir, "_delta_log", "_last_checkpoint"),
      """{"version":1,"size":3}""")
    spark.conf.set(
      graft.commands.ConvertFromDeltaCommand.DRIVER_CONVERT_THRESHOLD_CONF, "1")
    try {
      val t = Graft.convertFromDelta(spark, dir)
      assert(t.snapshot.numFiles === 0)
      assert(Graft.read(spark, dir).count() === 0)
    } finally spark.conf.unset(
      graft.commands.ConvertFromDeltaCommand.DRIVER_CONVERT_THRESHOLD_CONF)
  }

  test("distributed fold reconciles differently-spelled paths (canonical key)") {
    // add(`file:/abs/a`) in the checkpoint, remove(`/abs/a`) in the tail
    // (and the reverse spelling for b): the window fold must key on the
    // CANONICAL path or each remove lands in a different partition than
    // its add and the deleted file resurrects — the same replay rule the
    // driver fold applies via decodePath.
    val dir = tmpDir()
    val schema = new StructType().add("id", LongType)
    val sa = writeFile(spark.range(0, 5).toDF("id"), dir, "a.parquet")
    val sb = writeFile(spark.range(5, 9).toDF("id"), dir, "b.parquet")
    val sk = writeFile(spark.range(9, 12).toDF("id"), dir, "keep.parquet")
    writeActionParquet(dir, "00000000000000000001.checkpoint.parquet",
      Seq(protoLine(), metaLine(schema),
        addLine(s"file:$dir/a.parquet", sa),
        addLine(s"$dir/b.parquet", sb),
        addLine("keep.parquet", sk)))
    JFiles.writeString(Paths.get(dir, "_delta_log", "_last_checkpoint"),
      """{"version":1,"size":5}""")
    writeLog(dir, 2, Seq(
      s"""{"remove":{"path":"$dir/a.parquet","deletionTimestamp":1700000002000,"dataChange":true}}""",
      s"""{"remove":{"path":"file://$dir/b.parquet","deletionTimestamp":1700000002000,"dataChange":true}}"""))
    spark.conf.set(
      graft.commands.ConvertFromDeltaCommand.DRIVER_CONVERT_THRESHOLD_CONF, "1")
    try {
      val t = Graft.convertFromDelta(spark, dir)
      assert(t.snapshot.numFiles === 1,
        s"resurrected: ${t.snapshot.allFiles.map(_.path)}")
      assert(Graft.read(spark, dir).count() === 3)
    } finally spark.conf.unset(
      graft.commands.ConvertFromDeltaCommand.DRIVER_CONVERT_THRESHOLD_CONF)
  }

  test("DV-rewriting commit keeps the live file regardless of line order") {
    val dir = tmpDir()
    val schema = new StructType().add("id", LongType)
    val s1 = writeFile(spark.range(0, 20).toDF("id"), dir, "d1.parquet")
    val bm = new graft.dv.Bitmap64()
    Seq(3L, 4L, 7L).foreach(bm.add)
    val data = graft.dv.Bitmap64.toDeltaPortable(bm)
    val inline = graft.dv.DeltaDvCodec.z85Encode(data)
    writeLog(dir, 0, Seq(protoLine(3, 7), metaLine(schema),
      addLine("d1.parquet", s1)))
    // the replay key is (path, dv uniqueId): the add carries the new DV,
    // the remove supersedes only the DV-less version — and the add line
    // legally comes FIRST
    writeLog(dir, 1, Seq(
      s"""{"add":{"path":"d1.parquet","partitionValues":{},"size":$s1,""" +
        s""""modificationTime":1,"dataChange":true,"deletionVector":""" +
        s"""{"storageType":"i","pathOrInlineDv":"$inline","sizeInBytes":${data.length},"cardinality":3}}}""",
      """{"remove":{"path":"d1.parquet","deletionTimestamp":1700000001000,"dataChange":true}}"""))
    val t = Graft.convertFromDelta(spark, dir)
    assert(t.snapshot.numFiles === 1)
    assert(t.snapshot.allFiles.head.dvPath.isDefined,
      "the DV-bearing live version was dropped by the fold")
    assert(Graft.read(spark, dir).orderBy("id").as[Long].collect().toSeq ===
      (0L until 20L).filterNot(Seq(3L, 4L, 7L).contains))
  }

  test("v2/UUID checkpoint falls back to full JSON replay") {
    val dir = tmpDir()
    val schema = new StructType().add("id", LongType)
    val s1 = writeFile(spark.range(0, 6).toDF("id"), dir, "v.parquet")
    writeLog(dir, 0, Seq(protoLine(), metaLine(schema),
      addLine("v.parquet", s1)))
    writeLog(dir, 1, Seq(addLine("v.parquet", s1))) // idempotent re-add
    // _last_checkpoint names a v2 checkpoint whose classic-name file does
    // not exist (UUID-named manifests are not read by this convert)
    JFiles.writeString(Paths.get(dir, "_delta_log", "_last_checkpoint"),
      """{"version":1,"size":3,"v2Checkpoint":true}""")
    Graft.convertFromDelta(spark, dir)
    assert(Graft.read(spark, dir).count() === 6)
  }

  test("row tracking and idempotent-writer watermarks import") {
    val dir = tmpDir()
    val schema = new StructType().add("id", LongType)
    val s1 = writeFile(spark.range(0, 10).toDF("id"), dir, "r1.parquet")
    val s2 = writeFile(spark.range(10, 15).toDF("id"), dir, "r2.parquet")
    writeLog(dir, 0, Seq(
      protoLine(1, 7), metaLine(schema,
        conf = Map("delta.enableRowTracking" -> "true")),
      """{"txn":{"appId":"stream-42","version":17}}""",
      """{"domainMetadata":{"domain":"delta.rowTracking","configuration":"{\"rowIdHighWaterMark\":14}","removed":false}}""",
      s"""{"add":{"path":"r1.parquet","partitionValues":{},"size":$s1,"modificationTime":1,"dataChange":true,"stats":"{\\"numRecords\\":10}","baseRowId":0,"defaultRowCommitVersion":3}}""",
      s"""{"add":{"path":"r2.parquet","partitionValues":{},"size":$s2,"modificationTime":1,"dataChange":true,"stats":"{\\"numRecords\\":5}","baseRowId":10,"defaultRowCommitVersion":5}}"""))
    val t = Graft.convertFromDelta(spark, dir)
    val snap = t.snapshot
    // idempotent watermark survives: a writer at version <= 17 must skip
    assert(snap.txnVersion("stream-42") === 17L)
    // row ids carry over file-for-file; the watermark domain translates
    assert(graft.log.RowTracking.highWaterMark(snap.domains) === 14L)
    val ids = t.toDFWithRowIds.select("id", "_graft_row_id")
      .as[(Long, Long)].collect().toMap
    assert(ids(0L) === 0L && ids(9L) === 9L && ids(10L) === 10L && ids(14L) === 14L)
    // fresh appends take ids ABOVE the imported watermark
    Graft.write(spark.range(100, 103).toDF("id"), dir)
    val ids2 = GraftTable.forPath(spark, dir).toDFWithRowIds
      .select("id", "_graft_row_id").as[(Long, Long)].collect().toMap
    assert(Seq(100L, 101L, 102L).map(ids2).forall(_ > 14L))
    assert(ids2.values.toSeq.distinct.size === ids2.size, "row id collision")
  }

  test("vacuumProtocolCheck in readerFeatures converts (acknowledge-only)") {
    // Delta 3.x enables vacuumProtocolCheck broadly; per PROTOCOL.md
    // readers only acknowledge it, so convert must not reject the table.
    val dir = tmpDir()
    val schema = new StructType().add("id", LongType)
    val s1 = writeFile(spark.range(0, 12).toDF("id"), dir, "vp.parquet")
    writeLog(dir, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["vacuumProtocolCheck"],""" +
        """"writerFeatures":["vacuumProtocolCheck"]}}""",
      metaLine(schema), addLine("vp.parquet", s1)))
    val t = Graft.convertFromDelta(spark, dir)
    assert(Graft.read(spark, dir).count() === 12)
    // and the converted table is writable
    spark.sql(s"DELETE FROM graft.`$dir` WHERE id >= 10")
    assert(Graft.read(spark, dir).count() === 10)
  }

  test("catalogManaged (CCv2) source refuses conversion BY NAME") {
    // The managing catalog may hold the newest commits with only a
    // backfilled prefix in _delta_log — folding the log alone could
    // register a stale snapshot, so the refusal names the feature and
    // the remedy instead of the generic unknown-feature message.
    val dir = tmpDir()
    val schema = new StructType().add("id", LongType)
    val s1 = writeFile(spark.range(0, 5).toDF("id"), dir, "cm.parquet")
    writeLog(dir, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["catalogManaged","inCommitTimestamp","vacuumProtocolCheck"],""" +
        """"writerFeatures":["catalogManaged","inCommitTimestamp","vacuumProtocolCheck"]}}""",
      metaLine(schema), addLine("cm.parquet", s1)))
    val e = intercept[IllegalArgumentException] {
      Graft.convertFromDelta(spark, dir)
    }
    assert(e.getMessage.contains("catalogManaged"), e.getMessage)
    assert(e.getMessage.contains("stale"), e.getMessage)
  }

  test("materializePartitionColumns source converts; writes keep the layout") {
    // Writer-only feature (reference TableFeature.scala:1155-1169):
    // readers never gate, so convert accepts it; the translated property
    // re-arms the feature on the graft side, and every graft write after
    // the convert keeps the materialized layout the source promised.
    val dir = tmpDir()
    val schema = new StructType().add("id", LongType).add("k", StringType)
    // the source honored the feature: partition column physically present
    val s1 = writeFile(spark.range(0, 8).select($"id", lit("a").as("k")),
      dir, "k=a/mp.parquet")
    writeLog(dir, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
        """"writerFeatures":["materializePartitionColumns"]}}""",
      metaLine(schema, partCols = Seq("k"),
        conf = Map("delta.enableMaterializePartitionColumnsFeature" -> "true")),
      addLine("k=a/mp.parquet", s1, pv = """{"k":"a"}""")))
    val t = Graft.convertFromDelta(spark, dir)
    assert(t.snapshot.protocol.writerFeatureNames
      .contains("materializePartitionColumns"))
    assert(t.snapshot.metadata.configuration.get(
      "graft.enableMaterializePartitionColumnsFeature").contains("true"))
    assert(Graft.read(spark, dir).count() === 8)
    // a post-convert graft write keeps materializing
    Graft.write(spark.range(8, 12).select($"id", lit("b").as("k")), dir)
    val newFile = GraftTable.forPath(spark, dir).snapshot.allFiles
      .find(_.partitionValues.get("k").contains("b")).get
    assert(spark.read.parquet(dir + "/" + newFile.path).columns.contains("k"))
  }

  test("materializePartitionColumns: FEATURE without property still forces " +
      "the layout after convert") {
    // Set-then-unset shape: the property was removed without DROP FEATURE,
    // so the source protocol still carries the writer feature and the
    // reference keeps enforcing materialization (reference
    // TransactionalWrite.scala:479 isFeatureSupported). Convert must carry
    // the enforcement, not just the (absent) property — otherwise
    // post-convert writes silently elide partition columns and break the
    // raw-parquet layout promise external readers of the directory rely on.
    val dir = tmpDir()
    val schema = new StructType().add("id", LongType).add("k", StringType)
    val s1 = writeFile(spark.range(0, 8).select($"id", lit("a").as("k")),
      dir, "k=a/mp.parquet")
    writeLog(dir, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
        """"writerFeatures":["materializePartitionColumns"]}}""",
      metaLine(schema, partCols = Seq("k")), // NO enabling property
      addLine("k=a/mp.parquet", s1, pv = """{"k":"a"}""")))
    val t = Graft.convertFromDelta(spark, dir)
    assert(t.snapshot.metadata.configuration.get(
      "graft.enableMaterializePartitionColumnsFeature").contains("true"))
    assert(t.snapshot.protocol.writerFeatureNames
      .contains("materializePartitionColumns"))
    Graft.write(spark.range(8, 12).select($"id", lit("b").as("k")), dir)
    val newFile = GraftTable.forPath(spark, dir).snapshot.allFiles
      .find(_.partitionValues.get("k").contains("b")).get
    assert(spark.read.parquet(dir + "/" + newFile.path).columns.contains("k"),
      "post-convert write elided the partition column from the data file")
  }

  /** A redirect property value, escaped for embedding in metaLine's
    * configuration map (the property value is itself JSON text). */
  private def redirectProp(dest: String, state: String,
      rules: String = ""): String = {
    val m = com.fasterxml.jackson.databind.json.JsonMapper.builder.build
    val spec = m.writeValueAsString(s"""{"tablePath":"$dest"}""")
    val rulesPart =
      if (rules.isEmpty) "" else s""","noRedirectRules":$rules"""
    val raw = s"""{"type":"PathBasedRedirect","state":"$state",""" +
      s""""spec":$spec$rulesPart}"""
    val quoted = m.writeValueAsString(raw)
    quoted.substring(1, quoted.length - 1)
  }

  private def writeRedirectSource(
      dest: String, state: String = "REDIRECT-READY",
      writerOnly: Boolean = false, rules: String = ""): String = {
    val schema = new StructType().add("id", LongType)
    val key = if (writerOnly) "delta.redirectWriterOnly-preview"
      else "delta.redirectReaderWriter-preview"
    val feature = if (writerOnly) "redirectWriterOnly-preview"
      else "redirectReaderWriter-preview"
    val dir = tmpDir()
    val s1 = writeFile(spark.range(0, 5).toDF("id"), dir, "r.parquet")
    val readerFeatures =
      if (writerOnly) "" else s""""readerFeatures":["$feature"],"""
    writeLog(dir, 0, Seq(
      s"""{"protocol":{"minReaderVersion":${if (writerOnly) 1 else 3},""" +
        s""""minWriterVersion":7,$readerFeatures""" +
        s""""writerFeatures":["$feature"]}}""",
      metaLine(schema, conf = Map(key -> redirectProp(dest, state, rules))),
      addLine("r.parquet", s1)))
    dir
  }

  test("redirected delta source FOLLOWS the pointer to the destination") {
    // reference redirect/TableRedirect.scala: queries on the source are
    // served by the destination table — convert re-enters there.
    val schema = new StructType().add("id", LongType)
    val dest = tmpDir()
    val sd = writeFile(spark.range(100, 112).toDF("id"), dest, "d.parquet")
    writeLog(dest, 0, Seq(protoLine(), metaLine(schema),
      addLine("d.parquet", sd)))
    val src = writeRedirectSource(dest)
    val t = Graft.convertFromDelta(spark, src)
    // the DESTINATION converted; the source shell did not
    assert(t.log.dataPath.toUri.getPath ===
      new org.apache.hadoop.fs.Path(dest).toUri.getPath)
    assert(Graft.read(spark, dest).as[Long].collect().sorted.toSeq
      === (100L until 112L))
    assert(!new java.io.File(src, "_graft_log").exists,
      "convert wrote a log into the redirect SOURCE shell")
  }

  test("redirect: writer-only READY follows like reader-writer; transitions refuse") {
    val schema = new StructType().add("id", LongType)
    val dest = tmpDir()
    val sd = writeFile(spark.range(0, 3).toDF("id"), dest, "d.parquet")
    writeLog(dest, 0, Seq(protoLine(), metaLine(schema),
      addLine("d.parquet", sd)))
    // writer-only routes identically for a redirect-aware engine (the
    // reference's needRedirect checks only the state, never the kind) —
    // converting the frozen source would fork away from live writes, so
    // the convert re-enters at the destination
    val wo = writeRedirectSource(dest, writerOnly = true)
    val t = Graft.convertFromDelta(spark, wo)
    assert(t.log.dataPath.toUri.getPath ===
      new org.apache.hadoop.fs.Path(dest).toUri.getPath)
    assert(!new java.io.File(wo, "_graft_log").exists(),
      "convert wrote a log into the writer-only redirect SOURCE shell")
    // mid-transition states refuse, for BOTH kinds
    for {
      st <- Seq("ENABLE-REDIRECT-IN-PROGRESS", "DROP-REDIRECT-IN-PROGRESS")
      wOnly <- Seq(false, true)
    } {
      val src = writeRedirectSource(dest, state = st, writerOnly = wOnly)
      val e = intercept[IllegalArgumentException] {
        Graft.convertFromDelta(spark, src)
      }
      assert(e.getMessage.contains(st), e.getMessage)
    }
  }

  test("noRedirectRules: an exempt application converts the SOURCE; rules translate") {
    // reference TableRedirect.scala:258-268: a session whose app name
    // matches a noRedirectRule resolves the SOURCE even when READY — so
    // convert imports the frozen source, and the redirect property (rules
    // included) translates into the graft table where the same gates
    // re-apply.
    val schema = new StructType().add("id", LongType)
    val dest = tmpDir()
    val sd = writeFile(spark.range(100, 103).toDF("id"), dest, "d.parquet")
    writeLog(dest, 0, Seq(protoLine(), metaLine(schema),
      addLine("d.parquet", sd)))
    val src = writeRedirectSource(dest, rules =
      """[{"appName":"graft-test","allowedOperations":["DELETE"]}]""")
    val t = Graft.convertFromDelta(spark, src)
    // the SOURCE converted in place (this app is exempt) — no follow
    assert(t.log.dataPath.toUri.getPath ===
      new org.apache.hadoop.fs.Path(src).toUri.getPath)
    assert(Graft.read(spark, src).as[Long].collect().toSet ===
      (0L until 5L).toSet)
    // property translated key-for-key with the rules intact
    val live = graft.log.TableRedirect.get(t.snapshot.metadata).get
    assert(live.state === graft.log.TableRedirect.STATE_READY)
    assert(live.noRedirectRules === Seq(graft.log.TableRedirect
      .NoRedirectRule(Some("graft-test"), Set("DELETE"))))
    // graft-side write gate re-applies: rule-listed DELETE commits at the
    // source, anything else stays frozen
    GraftTable.forPathNoRedirect(spark, src).delete($"id" === 4L)
    assert(Graft.read(spark, src).as[Long].collect().toSet ===
      (0L until 4L).toSet)
    val e = intercept[UnsupportedOperationException] {
      Graft.write(spark.range(10, 11).toDF("id"), src)
    }
    assert(e.getMessage.contains("redirected"), e.getMessage)
    // a NON-matching rule set still follows to the destination
    val src2 = writeRedirectSource(dest, rules =
      """[{"appName":"someone-else","allowedOperations":["WRITE"]}]""")
    val t2 = Graft.convertFromDelta(spark, src2)
    assert(t2.log.dataPath.toUri.getPath ===
      new org.apache.hadoop.fs.Path(dest).toUri.getPath)
  }

  test("recomputeStats gives a stats-less converted table data skipping") {
    val dir = tmpDir()
    val schema = new StructType().add("id", LongType)
    val s1 = writeFile(spark.range(0, 100).toDF("id"), dir, "lo.parquet")
    val s2 = writeFile(spark.range(1000, 1100).toDF("id"), dir, "hi.parquet")
    // hand-authored delta log WITHOUT stats
    writeLog(dir, 0, Seq(protoLine(), metaLine(schema),
      addLine("lo.parquet", s1), addLine("hi.parquet", s2)))
    Graft.convertFromDelta(spark, dir)
    val t = GraftTable.forPath(spark, dir)
    assert(t.snapshot.allFiles.forall(f => Option(f.stats).isEmpty))
    def keptFiles(snap: graft.log.Snapshot): Seq[String] =
      graft.stats.StatsSkipping.pruneAndFilter(
        spark, snap, None, new StructType(), Nil,
        new StructType().add("id", LongType),
        Seq(org.apache.spark.sql.catalyst.expressions.EqualTo(
          org.apache.spark.sql.catalyst.expressions.AttributeReference(
            "id", LongType)(),
          org.apache.spark.sql.catalyst.expressions.Literal(1050L))))
        .map(_.path).sorted
    // stats-less files cannot be skipped: BOTH survive the point predicate
    assert(keptFiles(t.snapshot) === Seq("hi.parquet", "lo.parquet"))
    t.recomputeStats(onlyMissing = true)
    graft.log.GraftLog.clearCache()
    val s = GraftTable.forPath(spark, dir).snapshot
    assert(s.allFiles.forall(f => Option(f.stats).isDefined))
    // stats commit is dataChange=false and content is untouched
    assert(Graft.read(spark, dir).count() === 200)
    val commit = GraftTable.forPath(spark, dir).log.readCommit(s.version)
    assert(commit.collect { case a: graft.log.AddFile => a }
      .forall(!_.dataChange))
    // the same point predicate now prunes to the one bracketing file
    assert(keptFiles(s) === Seq("hi.parquet"))
    assert(Graft.read(spark, dir).where($"id" === 1050L).count() === 1)
  }

  test("late row tracking on a stats-less converted table backfills via footers") {
    val dir = tmpDir()
    val schema = new StructType().add("id", LongType)
    val s1 = writeFile(spark.range(0, 7).toDF("id"), dir, "a.parquet")
    val s2 = writeFile(spark.range(100, 105).toDF("id"), dir, "b.parquet")
    writeLog(dir, 0, Seq(protoLine(), metaLine(schema),
      addLine("a.parquet", s1), addLine("b.parquet", s2)))
    Graft.convertFromDelta(spark, dir)
    // no stats => the backfill's id assignment cannot read numRecords
    // from the log; it must fall back to parquet footers
    assert(GraftTable.forPath(spark, dir).snapshot.allFiles
      .forall(f => Option(f.stats).isEmpty))
    GraftTable.forPath(spark, dir)
      .upsertProperties(Map("graft.enableRowTracking" -> "true"))
    val ids = GraftTable.forPath(spark, dir).toDFWithRowIds
      .select(col("_graft_row_id")).collect().map(_.getLong(0))
    assert(ids.length === 12 && ids.distinct.length === 12)
  }

  test("redirect cycles are detected, not followed forever") {
    // a -> b -> a
    val a = tmpDir(); val b = tmpDir()
    val schema = new StructType().add("id", LongType)
    def redirectLogAt(dir: String, dest: String): Unit = {
      val s1 = writeFile(spark.range(0, 2).toDF("id"), dir, "r.parquet")
      writeLog(dir, 0, Seq(
        """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
          """"readerFeatures":["redirectReaderWriter-preview"],""" +
          """"writerFeatures":["redirectReaderWriter-preview"]}}""",
        metaLine(schema, conf = Map("delta.redirectReaderWriter-preview" ->
          redirectProp(dest, "REDIRECT-READY"))),
        addLine("r.parquet", s1)))
    }
    redirectLogAt(a, b); redirectLogAt(b, a)
    val e = intercept[IllegalArgumentException] {
      Graft.convertFromDelta(spark, a)
    }
    assert(e.getMessage.contains("cycle"), e.getMessage)
  }

  /** Hand-author a geometry/geography-ANNOTATED parquet file (what a
    * real Delta geo writer produces; Spark 4.1 itself cannot write one)
    * with rows (id, wkbPoint(id, id*2) in both geo columns). */
  private def writeGeoFile(tableDir: String, name: String, n: Int,
      idBase: Int = 0, idCol: String = "id", geomCol: String = "geom",
      geogCol: String = "geog"): Long = {
    import org.apache.parquet.schema._
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.io.api.Binary
    val mt = Types.buildMessage()
      .addField(Types.required(PrimitiveType.PrimitiveTypeName.INT64).named(idCol))
      .addField(Types.optional(PrimitiveType.PrimitiveTypeName.BINARY)
        .as(LogicalTypeAnnotation.geometryType("OGC:CRS84")).named(geomCol))
      .addField(Types.optional(PrimitiveType.PrimitiveTypeName.BINARY)
        .as(LogicalTypeAnnotation.geographyType()).named(geogCol))
      .named("spark_schema")
    val dest = Paths.get(tableDir, name)
    JFiles.createDirectories(dest.getParent)
    val w = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(dest.toString)).withType(mt)
      .withConf(spark.sessionState.newHadoopConf()).build()
    val gf = new SimpleGroupFactory(mt)
    (idBase until idBase + n).foreach { i =>
      val g = gf.newGroup()
      g.append(idCol, i.toLong)
      g.append(geomCol, Binary.fromConstantByteArray(wkbPoint(i, i * 2)))
      g.append(geogCol, Binary.fromConstantByteArray(wkbPoint(i, i * 2)))
      w.write(g)
    }
    w.close()
    JFiles.size(dest)
  }

  /** Little-endian WKB for POINT(x y). */
  private def wkbPoint(x: Double, y: Double): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(21)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte); bb.putInt(1); bb.putDouble(x); bb.putDouble(y)
    bb.array()
  }

  test("geospatial delta source imports READ-ONLY: WKB reads back, writes refuse") {
    // reference DeltaGeoSpatial.scala: GEOMETRY/GEOGRAPHY gated behind the
    // `geospatial` (stable) / `geospatial-dev` (preview) features. Both
    // import with the geo columns translated to WKB binary.
    Seq("geospatial", "geospatial-dev").foreach { feature =>
      val dir = tmpDir()
      val s1 = writeGeoFile(dir, "g.parquet", 3)
      val s2 = writeGeoFile(dir, "g2.parquet", 2, idBase = 3)
      val schema = new StructType().add("id", LongType)
        .add("geom", org.apache.spark.sql.types.GeometryType(4326))
        .add("geog", org.apache.spark.sql.types.GeographyType(4326))
      writeLog(dir, 0, Seq(
        s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
          s""""readerFeatures":["$feature"],"writerFeatures":["$feature"]}}""",
        metaLine(schema), addLine("g.parquet", s1), addLine("g2.parquet", s2)))
      Graft.convertFromDelta(spark, dir)
      val df = Graft.read(spark, dir)
      // translated schema: binary + the declared source type in metadata
      val gf = df.schema("geom")
      assert(gf.dataType === org.apache.spark.sql.types.BinaryType)
      assert(gf.metadata.getString(graft.schema.GeoSupport.GEO_KEY)
        .contains("geometry"), gf.metadata.json)
      assert(df.schema("geog").metadata
        .getString(graft.schema.GeoSupport.GEO_KEY).contains("geography"))
      // WKB-level equality with what the source writer put in the file
      val rows = df.orderBy("id").collect()
      assert(rows.length === 5)
      rows.zipWithIndex.foreach { case (r, i) =>
        assert(java.util.Arrays.equals(
          r.getAs[Array[Byte]]("geom"), wkbPoint(i, i * 2)), s"geom row $i")
        assert(java.util.Arrays.equals(
          r.getAs[Array[Byte]]("geog"), wkbPoint(i, i * 2)), s"geog row $i")
      }
      // a predicate on the geo column cannot be stats-pruned (binary is
      // outside the stats space) but must still evaluate correctly
      assert(df.filter($"geom" === lit(wkbPoint(2, 4))).count() === 1)
      // writes and DML refuse with a NAMED error; metadata-only ops work
      val t = GraftTable.forPath(spark, dir)
      val e1 = intercept[UnsupportedOperationException] {
        Graft.write(df.limit(1), dir)
      }
      assert(e1.getMessage.contains("GEOMETRY/GEOGRAPHY") &&
        e1.getMessage.contains("read-only"), e1.getMessage)
      val e2 = intercept[UnsupportedOperationException] { t.delete($"id" === 1L) }
      assert(e2.getMessage.contains("read-only"), e2.getMessage)
      val e3 = intercept[UnsupportedOperationException] {
        t.optimize().executeCompaction()
      }
      assert(e3.getMessage.contains("read-only"), e3.getMessage)
      t.upsertProperties(Map("graft.myNote" -> "geo"))  // metadata-only: fine
      assert(Graft.read(spark, dir).count() === 5)
    }
  }

  test("geospatial + column mapping: physical names resolve, WKB reads back") {
    val dir = tmpDir()
    val s1 = writeGeoFile(dir, "gm.parquet", 4,
      idCol = "col-pid", geomCol = "col-geo1", geogCol = "col-geo2")
    def mapped(name: String, dt: org.apache.spark.sql.types.DataType,
        phys: String, id: Long) =
      StructField(name, dt, nullable = true, new MetadataBuilder()
        .putString("delta.columnMapping.physicalName", phys)
        .putLong("delta.columnMapping.id", id).build())
    val schema = StructType(Seq(
      mapped("pid", LongType, "col-pid", 1L),
      mapped("location", org.apache.spark.sql.types.GeometryType(4326),
        "col-geo1", 2L),
      mapped("region_geo", org.apache.spark.sql.types.GeographyType(4326),
        "col-geo2", 3L)))
    writeLog(dir, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["geospatial","columnMapping"],""" +
        """"writerFeatures":["geospatial","columnMapping"]}}""",
      metaLine(schema, conf = Map("delta.columnMapping.mode" -> "name",
        "delta.columnMapping.maxColumnId" -> "3")),
      addLine("gm.parquet", s1)))
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.columns.toSeq === Seq("pid", "location", "region_geo"))
    assert(df.schema("location").dataType ===
      org.apache.spark.sql.types.BinaryType)
    assert(df.schema("location").metadata
      .getString(graft.schema.GeoSupport.GEO_KEY).contains("geometry"))
    val rows = df.orderBy("pid").collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(java.util.Arrays.equals(
        r.getAs[Array[Byte]]("location"), wkbPoint(i, i * 2)), s"row $i")
    }
    val e = intercept[UnsupportedOperationException] {
      GraftTable.forPath(spark, dir).delete($"pid" === 1L)
    }
    assert(e.getMessage.contains("read-only"), e.getMessage)
  }

  test("CANARY: Spark parquet still cannot serve native geo types " +
      "(a pass here means upgrade the WKB import to typed geo)") {
    // GeoSupport's WKB-binary import is the documented ceiling of this
    // Spark version's parquet geo support (GeoSupport.scala:6-23). This
    // canary pins BOTH probed limitations; when a Spark upgrade lifts
    // either, the intercept fails loudly and the fix is to restore typed
    // columns in ConvertFromDelta by rehydrating GeoSupport.GEO_KEY
    // metadata back to GeometryType/GeographyType instead of BinaryType.
    val geoSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("geom", org.apache.spark.sql.types.GeometryType(4326))))
    // (1) WRITE: a GeometryType column cannot reach a parquet file.
    val wErr = intercept[Throwable] {
      spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], geoSchema)
        .write.mode("overwrite").parquet(tmpDir() + "/geo_write_canary")
    }
    assert(wErr != null,
      "Spark now WRITES native geo parquet - lift GeoSupport's ceiling")
    // (2) READ: a geometry-annotated file cannot be read under the
    // native GeometryType schema (only the BinaryType fallback decodes).
    val dir = tmpDir()
    writeGeoFile(dir, "canary.parquet", 2)
    val geoReadSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("geom", org.apache.spark.sql.types.GeometryType(4326)),
      StructField("geog", org.apache.spark.sql.types.GeographyType(4326))))
    val rErr = intercept[Throwable] {
      spark.read.schema(geoReadSchema)
        .parquet(s"$dir/canary.parquet").collect()
    }
    assert(rErr != null,
      "Spark now READS native geo parquet - lift GeoSupport's ceiling")
    // (3) and the load-bearing fallback STILL works: the same file
    // decodes as BinaryType with the exact WKB payload.
    val rows = spark.read.schema(StructType(Seq(
        StructField("id", LongType),
        StructField("geom", BinaryType),
        StructField("geog", BinaryType))))
      .parquet(s"$dir/canary.parquet").orderBy("id").collect()
    assert(rows.length === 2)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(java.util.Arrays.equals(
        r.getAs[Array[Byte]]("geom"), wkbPoint(i, i * 2)), s"row $i")
    }
  }

  test("shredded-variant delta source converts and variant reads match") {
    // Author genuinely SHREDDED parquet through the engine's own shredding
    // writer, then wrap it in a hand-authored delta log that declares the
    // variantShredding reader feature (PROTOCOL.md:1941-1966).
    val src = tmpDir()
    Graft.write(spark.range(0, 20, 1, 1).select($"id", parse_json(concat(
        lit("""{"n":"""), $"id", lit(""","s":"x"""), $"id", lit(""""}""")))
      .as("payload")), src,
      configuration = Map("graft.enableVariantShredding" -> "true"))
    val part = new java.io.File(src).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val dir = tmpDir()
    JFiles.copy(part.toPath, Paths.get(dir, "sv.parquet"))
    val schema = new StructType().add("id", LongType).add("payload", VariantType)
    writeLog(dir, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["variantType","variantShredding"],""" +
        """"writerFeatures":["variantType","variantShredding"]}}""",
      metaLine(schema, conf = Map("delta.enableVariantShredding" -> "true")),
      addLine("sv.parquet", JFiles.size(Paths.get(dir, "sv.parquet")))))
    val t = Graft.convertFromDelta(spark, dir)
    // the shredding contract carries over to the graft side
    assert(t.snapshot.metadata.configuration
      .get("graft.enableVariantShredding").contains("true"))
    assert(t.snapshot.protocol.readerFeatures.exists(_.contains("variantShredding")),
      s"expected variantShredding in ${t.snapshot.protocol}")
    val got = Graft.read(spark, dir)
      .select($"id", variant_get($"payload", "$.n", "long").as("n"),
        variant_get($"payload", "$.s", "string").as("s"))
      .orderBy("id").as[(Long, Long, String)].collect()
    assert(got.length === 20)
    got.foreach { case (id, n, s) => assert(n === id && s === s"x$id") }
  }

  test("delta.clustering domain translates to graft.clusterBy (physical->logical)") {
    val dir = tmpDir()
    // column-mapped schema: logical "v" has physical name "col-7f3a"
    val schema = new StructType()
      .add("id", LongType, nullable = true,
        new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("delta.columnMapping.id", 1)
          .putString("delta.columnMapping.physicalName", "col-1a2b").build())
      .add("v", LongType, nullable = true,
        new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("delta.columnMapping.id", 2)
          .putString("delta.columnMapping.physicalName", "col-7f3a").build())
    val s1 = writeFile(spark.range(0, 9)
      .select($"id".as("col-1a2b"), ($"id" * 2).as("col-7f3a")), dir, "c1.parquet")
    writeLog(dir, 0, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":7,""" +
        """"writerFeatures":["columnMapping","clustering","domainMetadata"]}}""",
      metaLine(schema, conf = Map(
        "delta.columnMapping.mode" -> "name",
        "delta.columnMapping.maxColumnId" -> "2")),
      """{"domainMetadata":{"domain":"delta.clustering",""" +
        """"configuration":"{\"clusteringColumns\":[[\"col-7f3a\"]]}","removed":false}}""",
      addLine("c1.parquet", s1)))
    val t = Graft.convertFromDelta(spark, dir)
    // the clustering spec survives with LOGICAL names
    assert(t.snapshot.metadata.configuration.get("graft.clusterBy").contains("v"))
    assert(t.snapshot.protocol.writerFeatureNames.contains("clustering"),
      s"clustering feature missing from ${t.snapshot.protocol}")
    assert(Graft.read(spark, dir).select("id", "v")
      .as[(Long, Long)].collect().sorted.toSeq === (0L until 9L).map(i => (i, i * 2)))
    // and the next OPTIMIZE clusters incrementally (liquid path engages)
    GraftTable.forPath(spark, dir).optimize()
    assert(Graft.read(spark, dir).count() === 9)
  }

  test("SQL surface: CONVERT TO GRAFT delta.`path`") {
    val dir = tmpDir()
    val schema = new StructType().add("id", LongType)
    val s1 = writeFile(spark.range(0, 7).toDF("id"), dir, "q.parquet")
    writeLog(dir, 0, Seq(protoLine(), metaLine(schema),
      addLine("q.parquet", s1)))
    spark.sql(s"CONVERT TO GRAFT delta.`$dir`")
    assert(Graft.read(spark, dir).count() === 7)
  }

  // ---- incremental CONVERT SYNC ---------------------------------------

  test("sync folds appended delta commits; idempotent when up to date") {
    val dir = tmpDir()
    val schema = new StructType().add("id", LongType)
    val s1 = writeFile(spark.range(0, 10).toDF("id"), dir, "f1.parquet")
    writeLog(dir, 0, Seq(protoLine(), metaLine(schema),
      addLine("f1.parquet", s1)))
    Graft.convertFromDelta(spark, dir)
    assert(Graft.read(spark, dir).count() === 10)
    // Delta keeps writing: two more appends after the convert
    val s2 = writeFile(spark.range(10, 25).toDF("id"), dir, "f2.parquet")
    val s3 = writeFile(spark.range(25, 30).toDF("id"), dir, "f3.parquet")
    writeLog(dir, 1, Seq(addLine("f2.parquet", s2,
      """{"numRecords":15,"minValues":{"id":10},"maxValues":{"id":24},"nullCount":{"id":0}}""")))
    writeLog(dir, 2, Seq(addLine("f3.parquet", s3,
      """{"numRecords":5,"minValues":{"id":25},"maxValues":{"id":29},"nullCount":{"id":0}}""")))
    val t = Graft.syncFromDelta(spark, dir)
    assert(Graft.read(spark, dir).select($"id").as[Long].collect().sorted
      .toSeq === (0L until 30L))
    val v = t.snapshot.version
    assert(t.snapshot.metadata.configuration(
      graft.commands.ConvertFromDeltaCommand.SOURCE_VERSION_PROP) === "2")
    // carried-over stats on the synced file drive skipping
    val kept = graft.stats.StatsSkipping.pruneAndFilter(
      spark, t.snapshot, None, new StructType(), Nil,
      new StructType().add("id", LongType),
      Seq(org.apache.spark.sql.catalyst.expressions.EqualTo(
        org.apache.spark.sql.catalyst.expressions.AttributeReference(
          "id", LongType)(), org.apache.spark.sql.catalyst.expressions.Literal(12L))))
    // f2 (stats cover 12) stays, f3 (stats 25-29) skips; f1 carries no
    // stats from the original convert so it can never be skipped
    assert(kept.map(_.path).contains("f2.parquet"))
    assert(!kept.map(_.path).contains("f3.parquet"))
    // no new delta commits -> sync is a no-op at the same graft version
    assert(Graft.syncFromDelta(spark, dir).snapshot.version === v)
  }

  test("sync applies deletes, rewrites and DV updates from the delta tail") {
    val dir = tmpDir()
    val schema = new StructType().add("id", LongType)
    val s1 = writeFile(spark.range(0, 10).toDF("id"), dir, "g1.parquet")
    val s2 = writeFile(spark.range(10, 20).toDF("id"), dir, "g2.parquet")
    writeLog(dir, 0, Seq(protoLine(3, 7), metaLine(schema),
      addLine("g1.parquet", s1), addLine("g2.parquet", s2)))
    Graft.convertFromDelta(spark, dir)
    // delta commit 1: rewrite g1 -> g3 (delete + add)
    val s3 = writeFile(spark.range(0, 5).toDF("id"), dir, "g3.parquet")
    writeLog(dir, 1, Seq(
      """{"remove":{"path":"g1.parquet","deletionTimestamp":1700000001000,"dataChange":true}}""",
      addLine("g3.parquet", s3)))
    // delta commit 2: DV-delete ids 12, 14 from g2 (add new DV, remove bare)
    val bm = new graft.dv.Bitmap64()
    Seq(2L, 4L).foreach(bm.add) // row indexes of ids 12, 14
    val data = graft.dv.Bitmap64.toDeltaPortable(bm)
    val inline = graft.dv.DeltaDvCodec.z85Encode(data)
    writeLog(dir, 2, Seq(
      s"""{"add":{"path":"g2.parquet","partitionValues":{},"size":$s2,""" +
        s""""modificationTime":2,"dataChange":true,"deletionVector":""" +
        s"""{"storageType":"i","pathOrInlineDv":"$inline","sizeInBytes":${data.length},"cardinality":2}}}""",
      """{"remove":{"path":"g2.parquet","deletionTimestamp":1700000002000,"dataChange":true}}"""))
    val t = Graft.syncFromDelta(spark, dir)
    assert(t.snapshot.numFiles === 2)
    assert(Graft.read(spark, dir).select($"id").as[Long].collect().sorted
      .toSeq === ((0L until 5L) ++ (10L until 20L).filterNot(Seq(12L, 14L).contains)))
    assert(t.snapshot.allFiles.find(_.path == "g2.parquet")
      .exists(_.dvCardinality.contains(2L)))
  }

  test("sync picks up schema evolution from the delta window") {
    val dir = tmpDir()
    val schema = new StructType().add("id", LongType)
    val s1 = writeFile(spark.range(0, 5).toDF("id"), dir, "h1.parquet")
    writeLog(dir, 0, Seq(protoLine(), metaLine(schema),
      addLine("h1.parquet", s1)))
    Graft.convertFromDelta(spark, dir)
    val wide = new StructType().add("id", LongType).add("tag", StringType)
    val s2 = writeFile(spark.range(5, 8).toDF("id")
      .withColumn("tag", concat(lit("t"), $"id")), dir, "h2.parquet")
    writeLog(dir, 1, Seq(metaLine(wide), addLine("h2.parquet", s2)))
    Graft.syncFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.columns.toSeq === Seq("id", "tag"))
    assert(df.where($"tag".isNull).count() === 5)
    assert(df.where($"tag" === "t6").count() === 1)
  }

  test("sync refuses a gapped window and non-converted tables") {
    val dir = tmpDir()
    val schema = new StructType().add("id", LongType)
    val s1 = writeFile(spark.range(0, 5).toDF("id"), dir, "k1.parquet")
    writeLog(dir, 0, Seq(protoLine(), metaLine(schema),
      addLine("k1.parquet", s1)))
    Graft.convertFromDelta(spark, dir)
    // delta writes versions 1 and 2, then 1 is lost (premature cleanup)
    writeLog(dir, 1, Seq(addLine("k1.parquet", s1)))
    writeLog(dir, 2, Seq(addLine("k1.parquet", s1)))
    JFiles.delete(Paths.get(dir, "_delta_log", f"${1L}%020d.json"))
    val e = intercept[IllegalArgumentException] {
      Graft.syncFromDelta(spark, dir)
    }
    assert(e.getMessage.contains("no longer has version 1"), e.getMessage)
    // a plain graft table (not born from CONVERT) refuses
    val plain = tmpDir()
    Graft.write(spark.range(3).toDF("id"), plain)
    val e2 = intercept[IllegalArgumentException] {
      Graft.syncFromDelta(spark, plain)
    }
    assert(e2.getMessage.contains("was not created by CONVERT"), e2.getMessage)
  }

  test("sync composes with native graft DML between syncs") {
    val dir = tmpDir()
    val schema = new StructType().add("id", LongType)
    val s1 = writeFile(spark.range(0, 10).toDF("id"), dir, "m1.parquet")
    val s2 = writeFile(spark.range(10, 20).toDF("id"), dir, "m2.parquet")
    writeLog(dir, 0, Seq(protoLine(), metaLine(schema),
      addLine("m1.parquet", s1), addLine("m2.parquet", s2)))
    Graft.convertFromDelta(spark, dir)
    // native graft DML rewrites m1 (id < 10 all deleted -> file dropped)
    spark.sql(s"DELETE FROM graft.`$dir` WHERE id < 10")
    assert(Graft.read(spark, dir).count() === 10)
    // the delta side ALSO removes m1 later; the sync's membership guard
    // must not emit a remove for a file graft no longer holds
    writeLog(dir, 1, Seq(
      """{"remove":{"path":"m1.parquet","deletionTimestamp":1700000001000,"dataChange":true}}"""))
    val t = Graft.syncFromDelta(spark, dir)
    assert(Graft.read(spark, dir).select($"id").as[Long].collect().sorted
      .toSeq === (10L until 20L))
    assert(!t.snapshot.allFiles.exists(_.path == "m1.parquet"))
  }

  test("sync is gated by the GRAFT table's own redirect state") {
    // The Delta-side redirectCheck inspects only the window's metaNode; a
    // redirect set on the GRAFT side must gate sync commits like any
    // other writer (in-progress always refuses; READY requires a rule
    // listing the sync operation) — otherwise a sync forks a frozen
    // source whose readers are served by the destination.
    val dir = tmpDir()
    val schema = new StructType().add("id", LongType)
    val s1 = writeFile(spark.range(0, 10).toDF("id"), dir, "rg1.parquet")
    writeLog(dir, 0, Seq(protoLine(), metaLine(schema),
      addLine("rg1.parquet", s1)))
    Graft.convertFromDelta(spark, dir)
    val destG = tmpDir()
    Graft.write(spark.range(0, 10).toDF("id"), destG)
    // mid-transition: routing still serves the source, so ANY session
    // reaches it — the freeze must refuse the sync's file actions
    GraftTable.forPath(spark, dir).enableRedirect(destG)
    val s2 = writeFile(spark.range(10, 15).toDF("id"), dir, "rg2.parquet")
    writeLog(dir, 1, Seq(addLine("rg2.parquet", s2)))
    val e1 = intercept[UnsupportedOperationException] {
      Graft.syncFromDelta(spark, dir)
    }
    assert(e1.getMessage.contains("redirected"), e1.getMessage)
    GraftTable.forPath(spark, dir).cancelRedirect()
    // READY with an exemption that routes this app to the source but does
    // NOT list the sync operation: routing reaches the source, the commit
    // gate still refuses (case-sensitive op match, like the reference)
    import graft.log.TableRedirect.NoRedirectRule
    GraftTable.forPath(spark, dir).redirectTo(destG,
      Seq(NoRedirectRule(Some("graft-test"), Set("DELETE"))))
    val e2 = intercept[UnsupportedOperationException] {
      Graft.syncFromDelta(spark, dir)
    }
    assert(e2.getMessage.contains("redirected"), e2.getMessage)
    // a rule listing the exact operation admits the sync at the source
    GraftTable.forPathNoRedirect(spark, dir).dropRedirect()
    GraftTable.forPath(spark, dir).redirectTo(destG,
      Seq(NoRedirectRule(Some("graft-test"),
        Set("CONVERT FROM DELTA SYNC"))))
    Graft.syncFromDelta(spark, dir)
    assert(Graft.read(spark, dir).select($"id").as[Long].collect().sorted
      .toSeq === (0L until 15L))
  }

  test("CONVERT TO GRAFT ... SYNC via SQL") {
    val dir = tmpDir()
    val schema = new StructType().add("id", LongType)
    val s1 = writeFile(spark.range(0, 4).toDF("id"), dir, "s1.parquet")
    writeLog(dir, 0, Seq(protoLine(), metaLine(schema),
      addLine("s1.parquet", s1)))
    spark.sql(s"CONVERT TO GRAFT delta.`$dir`")
    val s2 = writeFile(spark.range(4, 9).toDF("id"), dir, "s2.parquet")
    writeLog(dir, 1, Seq(addLine("s2.parquet", s2)))
    spark.sql(s"CONVERT TO GRAFT delta.`$dir` SYNC")
    assert(Graft.read(spark, dir).count() === 9)
  }
}
