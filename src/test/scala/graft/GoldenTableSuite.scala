package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * CONVERT FROM DELTA against REAL reference-written golden tables — logs
 * and parquet produced by the reference implementation itself (committed
 * from its public golden-tables test resources), not hand-authored
 * fixtures. Expected values derive from the public generator
 * (reference connectors/golden-tables/src/test/scala/io/delta/golden/
 * GoldenTables.scala); the assertions here are written independently.
 */
class GoldenTableSuite extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = new java.io.File("src/test/resources/golden").getAbsolutePath

  /** Copy the committed golden table to a scratch dir — CONVERT writes a
    * `_graft_log` (and DV sidecars) next to the data, and the committed
    * resources must stay pristine. */
  private def goldenCopy(name: String): String = {
    val src = new java.io.File(base, name)
    assert(src.isDirectory, s"golden fixture $name missing at $src")
    val dst = java.nio.file.Files.createTempDirectory(
      s"golden-${name.replace('/', '_')}").toFile
    def walk(s: java.io.File, d: java.io.File): Unit = {
      d.mkdirs()
      s.listFiles().foreach { f =>
        if (f.isDirectory) walk(f, new java.io.File(d, f.getName))
        // Hadoop-local .crc sidecars are not part of the table; some
        // fixtures ship stale ones that fail ChecksumFileSystem reads.
        else if (!f.getName.endsWith(".crc"))
          java.nio.file.Files.copy(f.toPath,
            new java.io.File(d, f.getName).toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    walk(src, dst)
    graft.log.GraftLog.clearCache()
    dst.toString
  }

  test("golden: data-reader-primitives — every primitive type + null row") {
    val dir = goldenCopy("data-reader-primitives")
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.count() === 11) // rows 0..9 + one all-null row
    assert(df.where($"as_int".isNull).count() === 1)
    val r = df.where($"as_int" === 7)
      .select($"as_long", $"as_byte", $"as_short", $"as_boolean",
        $"as_float", $"as_double", $"as_string", $"as_big_decimal")
      .head()
    assert(r.getLong(0) === 7L && r.getByte(1) === 7.toByte &&
      r.getShort(2) === 7.toShort && !r.getBoolean(3) &&
      r.getFloat(4) === 7.0f && r.getDouble(5) === 7.0 &&
      r.getString(6) === "7" && r.getDecimal(7).intValueExact() === 7)
    assert(df.agg(sum($"as_int")).head.getLong(0) === 45L)
  }

  test("golden: data-reader-array-primitives — arrays of every primitive") {
    val dir = goldenCopy("data-reader-array-primitives")
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.count() === 10)
    val got = df.select(element_at($"as_array_int", 1).as("i"),
        element_at($"as_array_long", 1).as("l"),
        element_at($"as_array_string", 1).as("s"))
      .as[(Int, Long, String)].collect().sortBy(_._1)
    assert(got.toSeq === (0 until 10).map(i => (i, i.toLong, i.toString)))
  }

  test("golden: data-reader-nested-struct — nested structs read whole") {
    val dir = goldenCopy("data-reader-nested-struct")
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.count() === 10)
    val got = df.select($"b", $"a.aa", $"a.ac.aca", $"a.ac.acb")
      .as[(Int, String, Int, Long)].collect().sortBy(_._1)
    assert(got.toSeq === (0 until 10).map(i => (i, i.toString, i, i.toLong)))
  }

  test("golden: data-reader-partition-values — 12 partition types incl. all-null") {
    val dir = goldenCopy("data-reader-partition-values")
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.count() === 3)
    // null partition row: every partition column null, data columns present
    val nullRow = df.where($"as_int".isNull)
    assert(nullRow.count() === 1)
    assert(nullRow.select($"value").head.getString(0) === "2")
    assert(nullRow.select($"as_string_lit_null").head.isNullAt(0))
    // the string partition VALUE "null" survives as the literal string
    assert(df.where($"as_string_lit_null" === "null").count() === 2)
    val r = df.where($"as_int" === 1)
      .select($"as_long", $"as_boolean", $"as_date".cast("string"),
        $"as_timestamp".cast("string"), $"as_big_decimal", $"value")
      .head()
    assert(r.getLong(0) === 1L && !r.getBoolean(1))
    assert(r.getString(2) === "2021-09-08")
    assert(r.getString(3) === "2021-09-08 11:11:11")
    assert(r.getDecimal(4).intValueExact() === 1)
    assert(r.getString(5) === "1")
    // partition pruning still works over converted partition values
    assert(df.where($"as_int" === 0).count() === 1)
  }

  test("golden: basic-with-vacuum-protocol-check-feature converts and stays writable") {
    val dir = goldenCopy("basic-with-vacuum-protocol-check-feature")
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.count() === 100)
    assert(df.where($"id" === 42).select($"str").head.getString(0) === "val=42")
    spark.sql(s"DELETE FROM graft.`$dir` WHERE id >= 90")
    assert(Graft.read(spark, dir).count() === 90)
  }

  test("golden: time-travel table — three appended commits fold in order") {
    val dir = goldenCopy("time-travel-start-start20-start40")
    Graft.convertFromDelta(spark, dir)
    // v0: 0..9, v1: +10..19, v2: +20..29 — the converted table is the fold
    assert(Graft.read(spark, dir).select($"id").as[Long].collect().sorted.toSeq
      === (0L until 30L))
  }

  test("golden: dv-partitioned-with-checkpoint — checkpoint + DVs + partitions") {
    val dir = goldenCopy("dv-partitioned-with-checkpoint")
    // 15 DELETE commits on a DV-enabled table: the log has a reference
    // checkpoint AND live deletion vectors; col1 = 0,2,..,28 are deleted
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.count() === 35)
    assert(df.agg(sum($"col1")).head.getLong(0) === 1015L) // 1225 - 210
    assert(df.where($"col1" % 2 === 0 && $"col1" < 30).count() === 0)
    // partition column survived; pruning on it still selects correctly
    assert(df.where($"part" === 3).select($"col1").as[Long].collect().sorted
      .toSeq === Seq(3L, 13L, 23L, 33L, 43L))
  }

  test("golden: data-reader-map — map columns of every key/value shape") {
    val dir = goldenCopy("data-reader-map")
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.count() === 10)
    val r = df.where($"i" === 3).select(
      element_at($"a", 3), element_at($"b", 3L),
      element_at($"c", lit(3.toShort)), element_at($"e", "3"),
      size(element_at($"f", 3))).head()
    assert(r.getInt(0) === 3 && r.getByte(1) === 3.toByte &&
      r.getBoolean(2) === false && r.getDecimal(3).intValueExact() === 3 &&
      r.getInt(4) === 3)
  }

  test("golden: data-reader-escaped-chars — %-escaped partition directory names") {
    val dir = goldenCopy("data-reader-escaped-chars")
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.count() === 3)
    // partition VALUES keep their raw form; only the directory name is
    // percent-encoded on disk
    assert(df.select($"_2").as[String].collect().sorted.toSeq ===
      Seq("bar+%21", "bar+%22", "bar+%23"))
    assert(df.where($"_2" === "bar+%22").select($"_1").head.getString(0) === "foo2")
  }

  test("golden: dv-with-columnmapping — DVs under name-mapped physical columns") {
    val dir = goldenCopy("dv-with-columnmapping")
    // 50 rows, then 15 DELETEs of col1 = 0,2,...,28 through deletion vectors
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.count() === 35)
    assert(df.agg(sum($"col1")).head.getLong(0) === 1015L) // 1225 - 210
    assert(df.where($"col1" % 2 === 0 && $"col1" < 30).count() === 0)
    // logical->physical mapping survives for data AND partition columns
    assert(df.where($"part" === 7).select($"col1").as[Int].collect().sorted
      .toSeq === Seq(7, 17, 27, 37, 47))
    assert(df.where($"col2" === "foo3").count() ===
      df.where($"col1" % 5 === 3).count())
  }

  test("golden: multi-part-checkpoint — reference multi-part layout folds whole") {
    val dir = goldenCopy("multi-part-checkpoint")
    Graft.convertFromDelta(spark, dir)
    // v0: range(1), v1: +range(30) — id 0 twice, 1..29 once
    val got = Graft.read(spark, dir).select($"id").as[Long].collect().sorted.toSeq
    assert(got === (0L +: (0L until 30L)).sorted)
  }

  test("golden: v2-checkpoint-parquet — uuid checkpoint + sidecars fold whole") {
    val dir = goldenCopy("v2-checkpoint-parquet")
    Graft.convertFromDelta(spark, dir)
    assert(Graft.read(spark, dir).select($"id").as[Long].collect().sorted.toSeq
      === (0L until 10L))
  }

  test("golden: table-with-columnmapping-mode-id — id-mode mapping, deep nesting") {
    val dir = goldenCopy("table-with-columnmapping-mode-id")
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.count() === 6) // rows 0..4 + one all-null row
    assert(df.where($"IntegerType".isNull).count() === 1)
    val r = df.where($"IntegerType" === 2).select(
      $"LongType", $"StringType", $"decimal",
      $"nested_struct.aa", $"nested_struct.ac.aca",
      element_at($"array_of_prims", 2),
      element_at($"map_of_prims", 2),
      element_at($"map_of_rows", 3).getField("ab")).head()
    assert(r.getLong(0) === 2L && r.getString(1) === "2" &&
      r.getDecimal(2).intValueExact() === 2 &&
      r.getString(3) === "2" && r.getInt(4) === 2 &&
      r.getInt(5) === 3 && r.getLong(6) === 3L && r.getLong(7) === 40L)
  }

  test("golden: v2-checkpoint-json — json-manifest v2 checkpoint folds whole") {
    val dir = goldenCopy("v2-checkpoint-json")
    Graft.convertFromDelta(spark, dir)
    assert(Graft.read(spark, dir).select($"id").as[Long].collect().sorted.toSeq
      === (0L until 10L))
  }

  test("golden: versions-not-contiguous — convert refuses a gapped log") {
    val dir = goldenCopy("versions-not-contiguous")
    val e = intercept[IllegalArgumentException] {
      Graft.convertFromDelta(spark, dir)
    }
    assert(e.getMessage.contains("non-contiguous"), e.getMessage)
  }

  test("golden: data-reader-timestamp_ntz-id-mode — ntz data AND partition values") {
    val dir = goldenCopy("data-reader-timestamp_ntz-id-mode")
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.count() === 9)
    assert(df.where($"tsNtz".isNull).count() === 3)
    assert(df.where($"tsNtzPartition".isNull).count() === 3)
    // NTZ values survive exactly (no session-zone shift) in data AND
    // partition columns, under id-mode physical names
    assert(df.where($"id" === 0).select($"tsNtz".cast("string")).head.getString(0)
      === "2021-11-18 02:30:00.123456")
    assert(df.where($"tsNtzPartition".cast("string") === "2013-07-05 17:01:00.123456")
      .select($"id").as[Int].collect().sorted.toSeq === Seq(3, 4, 5))
  }

  test("golden: basic-with-inserts-deletes-checkpoint — rewrite deletes across checkpoints") {
    val dir = goldenCopy("basic-with-inserts-deletes-checkpoint")
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    // inserts 0..79; deletes 5-9,15-19,25-29,35-39,45-49 and >=66
    assert(df.count() === 41)
    assert(df.agg(sum($"id")).head.getLong(0) === 1470L)
    assert(df.where($"id" >= 66).count() === 0)
    assert(df.where($"id".between(50, 65)).count() === 16)
  }

  test("golden: canonicalized-paths — file:/abs and /abs reconcile in replay") {
    // add(`/abs/path`) then remove(`file:/abs/path`) (and the `file://`
    // variant, and both with spaces + special chars): the same file in
    // different URI spellings must cancel, leaving ZERO live files.
    Seq("canonicalized-paths-normal-a", "canonicalized-paths-normal-b",
        "canonicalized-paths-special-a", "canonicalized-paths-special-b")
      .foreach { name =>
        val dir = goldenCopy(name)
        Graft.convertFromDelta(spark, dir)
        val t = GraftTable.forPath(spark, dir)
        assert(t.snapshot.numFiles === 0,
          s"$name: removed file resurrected as ${t.snapshot.allFiles.map(_.path)}")
      }
  }

  test("golden: delete-re-add-same-file-different-transactions") {
    val dir = goldenCopy("delete-re-add-same-file-different-transactions")
    Graft.convertFromDelta(spark, dir)
    val t = GraftTable.forPath(spark, dir)
    // foo added, removed, re-added (newer mtime), plus bar: both live
    val files = t.snapshot.allFiles.map(f => f.path -> f.modificationTime).toMap
    assert(files.keySet === Set("foo", "bar"))
    assert(files("foo") === 1700000000000L, "stale first add won the replay")
  }

  test("golden: corrupted-last-checkpoint — empty pointer, checkpoint still found") {
    val dir = goldenCopy("corrupted-last-checkpoint")
    // _last_checkpoint is an EMPTY file; discovery must fall back to the
    // listing and find checkpoint 10 (the fixture is log-only, so the
    // assertions run against the folded state, not a data read)
    Graft.convertFromDelta(spark, dir)
    val snap = GraftTable.forPath(spark, dir).snapshot
    // 11 single-file appends (commits 0..10), checkpointed at 10
    assert(snap.numFiles === 11, s"fold lost files: ${snap.numFiles}")
  }

  test("golden: logs missing required protocol/metaData actions are refused") {
    val m = intercept[IllegalArgumentException] {
      Graft.convertFromDelta(spark,
        goldenCopy("deltalog-state-reconstruction-without-metadata"))
    }
    assert(m.getMessage.contains("no metaData action"), m.getMessage)
    val pr = intercept[IllegalArgumentException] {
      Graft.convertFromDelta(spark,
        goldenCopy("deltalog-state-reconstruction-without-protocol"))
    }
    assert(pr.getMessage.contains("no protocol action"), pr.getMessage)
  }

  test("golden: log-replay-dv-key-cases — DV rewrites replay on (path, dvUid)") {
    // range(50) in ONE file, then three DELETEs (ids 0, 7, 14) each
    // REWRITING the file's DV: add(path, dvNew) + remove(path, dvOld) in
    // one commit — the spec's uniqueId replay rule, written by the
    // reference itself.
    val dir = goldenCopy("log-replay-dv-key-cases")
    val t = Graft.convertFromDelta(spark, dir)
    assert(t.snapshot.numFiles === 1)
    val df = Graft.read(spark, dir)
    assert(df.count() === 47)
    assert(df.agg(sum($"id")).head.getLong(0) === 1204L) // 1225 - (0+7+14)
  }

  test("golden: log-replay-special-characters — %-encoded paths decode in replay") {
    // -a: add(`special%20p@%23h`) then remove (encoded) -> zero live files
    val a = goldenCopy("log-replay-special-characters-a")
    Graft.convertFromDelta(spark, a)
    assert(GraftTable.forPath(spark, a).snapshot.numFiles === 0)
    // -b: add only -> one live file whose path DECODED to `special p@#h`
    val b = goldenCopy("log-replay-special-characters-b")
    Graft.convertFromDelta(spark, b)
    val files = GraftTable.forPath(spark, b).snapshot.allFiles
    assert(files.map(_.path) === Seq("special p@#h"))
  }

  test("golden: log-replay-latest-metadata-protocol — last schema + (3,7) upgrade win") {
    val dir = goldenCopy("log-replay-latest-metadata-protocol")
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.columns.toSeq === Seq("col1", "col2"))
    assert(df.count() === 40)
    // first write predates col2: exactly its 20 rows read back null
    assert(df.where($"col2".isNull).count() === 20)
    assert(df.where($"col2" === 1).count() === 10) // odd ids of the second write
  }

  test("golden: data-skipping-basic-stats-all-types — imported stats skip files") {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, GreaterThan, Literal}
    import org.apache.spark.sql.types.{IntegerType, StructType}
    Seq("data-skipping-basic-stats-all-types",
        "data-skipping-basic-stats-all-types-checkpoint").foreach { name =>
      val dir = goldenCopy(name)
      val t = Graft.convertFromDelta(spark, dir)
      assert(Graft.read(spark, dir).count() === 1, name)
      val dataSchema = new StructType().add("as_int", IntegerType)
      def kept(pred: org.apache.spark.sql.catalyst.expressions.Expression) =
        graft.stats.StatsSkipping.pruneAndFilter(
          spark, t.snapshot, None, new StructType(), Nil, dataSchema, Seq(pred))
      val ref = AttributeReference("as_int", IntegerType)()
      // the single row is all zeros: >100 skips the only file, =0 keeps it
      assert(kept(GreaterThan(ref, Literal(100))).isEmpty, name)
      assert(kept(EqualTo(ref, Literal(0))).size === 1, name)
    }
  }

  test("golden: data-skipping-all-types under id column mapping reads + filters") {
    val dir = goldenCopy("data-skipping-basic-stats-all-types-columnmapping-id")
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.count() === 1)
    assert(df.where($"as_int" > 100).count() === 0)
    assert(df.where($"as_int" === 0 && $"as_string" === "0").count() === 1)
  }

  test("golden: type-widening — preview reader feature, widened reads of narrow files") {
    // v0 writes narrow types (byte/int/float/date), v1 enables
    // typeWidening-PREVIEW (the suffix must not refuse the convert), v2
    // commits the widened schema + a second file at the wide extremes.
    val dir = goldenCopy("type-widening")
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.count() === 2)
    assert(df.schema("byte_long").dataType.typeName === "long")
    assert(df.schema("int_double").dataType.typeName === "double")
    assert(df.schema("date_timestamp_ntz").dataType.typeName === "timestamp_ntz")
    // the OLD narrow file reads through the widened schema
    val longs = df.select($"byte_long").as[Long].collect().sorted
    assert(longs.toSeq === Seq(1L, Long.MaxValue))
  }

  test("golden: type-widening-nested — widening inside struct/array/map") {
    val dir = goldenCopy("type-widening-nested")
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.count() === 2)
    // every nested leaf reads through the widened types without error
    assert(df.selectExpr("*").collect().length === 2)
  }

  test("golden: spark-variant-checkpoint — variant-preview feature + checkpoint fold") {
    val dir = goldenCopy("spark-variant-checkpoint")
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.count() === 102) // 100 + re-appended ids 0 and 1
    // variant payloads survive: every row's v.key equals its id
    val bad = df.selectExpr("id",
        "variant_get(v, '$.key', 'long') as k")
      .where($"id" =!= $"k")
    assert(bad.count() === 0)
    // variants nested in arrays/structs/maps decode too
    val n = df.selectExpr(
      "variant_get(array_of_variants[0], '$.key', 'long') as a",
      "variant_get(struct_of_variants.v, '$.key', 'long') as s")
      .where($"a".isNull || $"s".isNull).count()
    assert(n === 0)
  }

  test("golden: basic-decimal-table — decimal data AND decimal partition values") {
    val dir = goldenCopy("basic-decimal-table")
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.count() === 4)
    val got = df.select($"part".cast("string"), $"col1".cast("string"))
      .as[(String, String)].collect().toMap
    assert(got("234.00000") === "1.00")
    assert(got("0.00004") === "0.00")  // 0.001 rounds into (5,2) as 0.00
    assert(got("-2342342.23423") === "-999.99")
    // col2 is (10,5): 0.000002 quantizes to 0.00000 on write, so the sum
    // is exactly 2 + 22222.22222 + 0 - 99999.99999
    assert(df.agg(sum($"col2").cast("string")).head.getString(0) ===
      "-77775.77777")
  }

  test("golden: decimal-various-scale-precision — every precision/scale shape") {
    val dir = goldenCopy("decimal-various-scale-precision")
    val t = Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.count() === 3)
    // the first generated row is all-null: every column carries nulls
    df.schema.fields.foreach { f =>
      assert(df.where(col(f.name).isNull).count() >= 1, f.name)
    }
    // converted read equals a direct parquet read of the live files
    val raw = spark.read.parquet(
      t.snapshot.allFiles.map(f => s"$dir/${f.path}"): _*)
    assert(df.exceptAll(raw).count() === 0)
    assert(raw.exceptAll(df).count() === 0)
  }

  test("golden: deltalog-invalid-protocol-version — reader 99 refused") {
    val e = intercept[IllegalArgumentException] {
      Graft.convertFromDelta(spark,
        goldenCopy("deltalog-invalid-protocol-version"))
    }
    assert(e.getMessage.contains("reader version"), e.getMessage)
  }

  test("golden: collations-table — collation metadata survives the convert") {
    val dir = goldenCopy("collations-table")
    val t = Graft.convertFromDelta(spark, dir)
    val sch = t.snapshot.metadata.schema
    assert(sch.fieldNames.toSeq ===
      Seq("id", "utf8_binary_col", "utf8_lcase_col", "unicode_col"))
    // the reference stores collations as __COLLATIONS field metadata;
    // Spark parses that into the StringType itself, and the translated
    // schemaString re-serializes it — both ends must carry the collation
    assert(sch("utf8_lcase_col").dataType.sql.contains("UTF8_LCASE"),
      sch("utf8_lcase_col").dataType.toString)
    assert(sch("unicode_col").dataType.sql.contains("UNICODE"),
      sch("unicode_col").dataType.toString)
    assert(t.snapshot.metadata.schemaString.contains("__COLLATIONS"))
  }

  test("golden: only-checkpoint-files — interval-1 checkpoints, delete + append fold") {
    // range(10) in 10 files, DELETE id<5 (file removes), append range(20):
    // ids 5..9 + 0..19, with a reference checkpoint at every version
    val dir = goldenCopy("only-checkpoint-files")
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.count() === 25)
    assert(df.agg(sum($"id")).head.getLong(0) === 225L) // 35 + 190
  }

  test("golden: snapshot family — overwrite, delete, dataChange=false, vacuum") {
    // data0 append + data1 append, data2 OVERWRITE, data3 append(20),
    // then DELETE col2 like 'data-2-%': exactly data-3-0..19 survive
    val a = goldenCopy("snapshot-data2-deleted")
    Graft.convertFromDelta(spark, a)
    val dfa = Graft.read(spark, a)
    assert(dfa.count() === 20)
    assert(dfa.where($"col2".startsWith("data-3-")).count() === 20)
    // ...then a dataChange=false repartition overwrite and VACUUM(0):
    // same rows, only the rearranged files remain on disk
    val b = goldenCopy("snapshot-vacuumed")
    Graft.convertFromDelta(spark, b)
    val dfb = Graft.read(spark, b)
    assert(dfb.count() === 20)
    assert(dfb.agg(sum($"col1")).head.getLong(0) === 190L)
    assert(dfb.where(!$"col2".startsWith("data-3-")).count() === 0)
  }

  test("golden: basic-with-inserts-overwrite-restore — RESTORE folds to v1 state") {
    val dir = goldenCopy("basic-with-inserts-overwrite-restore")
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    // append 0..99, append 100..199, overwrite 500..999, RESTORE to v1
    assert(df.select($"id").as[Long].collect().sorted.toSeq === (0L until 200L))
  }

  test("golden: basic-with-inserts-updates — UPDATE rewrite state") {
    val dir = goldenCopy("basic-with-inserts-updates")
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.count() === 100)
    assert(df.where($"str" === "N/A").count() === 50)
    assert(df.where($"id" >= 50 && $"str" === concat(lit("val="), $"id"))
      .count() === 50)
  }

  test("golden: basic-with-inserts-merge — three-clause MERGE state") {
    val dir = goldenCopy("basic-with-inserts-merge")
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    // target 0..99 merged with source 50..149: matched -> 'N/A',
    // not-matched -> 'EXT' inserts, not-matched-by-source AND id<10 -> delete
    assert(df.count() === 140)
    assert(df.where($"id" < 10).count() === 0)
    assert(df.where($"str" === "N/A").count() === 50)
    assert(df.where($"str" === "EXT").count() === 50)
    assert(df.where($"id".between(10, 49) &&
      $"str" === concat(lit("val="), $"id")).count() === 40)
  }

  test("golden: 125-iterator-bug — empty-dataframe commits interleaved") {
    val dir = goldenCopy("125-iterator-bug")
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.select($"col1").as[Int].collect().sorted.toSeq === (1 to 5))
  }

  test("golden: kernel-timestamp — MICROS and INT96 physical formats, ts partitions") {
    Seq("kernel-timestamp-TIMESTAMP_MICROS", "kernel-timestamp-INT96")
      .foreach { name =>
        val dir = goldenCopy(name)
        Graft.convertFromDelta(spark, dir)
        val df = Graft.read(spark, dir)
        assert(df.count() === 5, name)
        assert(df.where($"time".isNull && $"part".isNull).count() === 1, name)
        // pre-epoch INT96 value reads exactly (session TZ is UTC)
        assert(df.where($"id" === 3).select($"time".cast("string"))
          .head.getString(0) === "1969-01-01 00:00:00", name)
        // the timestamp PARTITION value with fractional seconds decodes
        assert(df.where($"id" === 0).select($"part".cast("string"))
          .head.getString(0) === "2020-01-01 08:09:10.001", name)
        // partition filtering on a timestamp partition column
        assert(df.where($"part" === lit("2021-10-01 08:09:20").cast("timestamp"))
          .select($"id").as[Int].collect().sorted.toSeq === Seq(1, 2), name)
      }
  }

  test("golden: data-reader-date-types-UTC — UTC-written timestamp and date") {
    val dir = goldenCopy("data-reader-date-types-UTC")
    Graft.convertFromDelta(spark, dir)
    val r = Graft.read(spark, dir)
      .select($"timestamp".cast("string"), $"date".cast("string")).head()
    assert(r.getString(0) === "2020-01-01 08:09:10")
    assert(r.getString(1) === "2020-01-01")
  }

  test("golden: time-travel-schema-changes-b — mergeSchema append fold") {
    val dir = goldenCopy("time-travel-schema-changes-b")
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.columns.toSeq === Seq("id", "part"))
    assert(df.count() === 20)
    assert(df.where($"part".isNull).count() === 10) // pre-evolution rows
    assert(df.where($"part" === $"id").count() === 10)
  }

  test("golden: update-deleted-directory — checkpoint-only fake-file log folds") {
    val dir = goldenCopy("update-deleted-directory")
    Graft.convertFromDelta(spark, dir)
    val snap = GraftTable.forPath(spark, dir).snapshot
    assert(snap.numFiles === 10)
    assert(snap.allFiles.map(_.path).sorted === (1 to 10).map(_.toString).sorted)
  }

  test("golden: deltalog-getChanges — cdc actions are replay-invisible") {
    // txn2 commits an AddCDCFile + the remove of the only data file; txn3
    // re-commits protocol + a SetTransaction. The fold must skip `cdc`
    // actions entirely and keep the txn watermark.
    val dir = goldenCopy("deltalog-getChanges")
    Graft.convertFromDelta(spark, dir)
    val snap = GraftTable.forPath(spark, dir).snapshot
    assert(snap.numFiles === 0)
    assert(snap.txnVersion("fakeAppId") === 3L)
  }

  test("golden: parquet-decimal-dictionaries — dictionary-encoded decimals at 1M rows") {
    val dir = goldenCopy("parquet-decimal-dictionaries")
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.count() === 1000000L)
    // col1 = i%5, col2 = i%6, col3 = i%2 over 0..999999
    val r = df.agg(sum($"col1"), sum($"col2"), sum($"col3")).head()
    assert(r.getDecimal(0).longValueExact() === 2000000L)
    assert(r.getDecimal(1).longValueExact() === 2499996L)
    assert(r.getDecimal(2).longValueExact() === 500000L)
  }

  test("golden: data-reader-array-complex-objects — deep arrays, maps, structs") {
    val dir = goldenCopy("data-reader-array-complex-objects")
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.count() === 10)
    val got = df.selectExpr("i",
        "`3d_int_list`[0][1][2] as a3",
        "`4d_int_list`[1][0][1][0] as a4",
        "list_of_maps[1][string(i)] as m",
        "list_of_records[2].val as r")
      .as[(Int, Int, Int, Long, Int)].collect().sortBy(_._1)
    assert(got.toSeq === (0 until 10).map(i => (i, i, i, i.toLong, i)))
  }

  test("golden: snapshot family — append, overwrite, append, dataChange=false fold") {
    // data0: append data-0-{0..9}; data1: +data-1; data2: OVERWRITE with
    // data-2; data3: +20 data-3 rows; repartitioned: (data3 minus the
    // deleted data-2 rows) rewritten into 2 files with dataChange=false.
    def prefixes(dir: String): (Long, Set[String]) = {
      Graft.convertFromDelta(spark, dir)
      val df = Graft.read(spark, dir)
      (df.count(),
        df.select(regexp_extract($"col2", "data-(\\d)-", 1)).distinct()
          .as[String].collect().toSet)
    }
    assert(prefixes(goldenCopy("snapshot-data0")) === ((10L, Set("0"))))
    assert(prefixes(goldenCopy("snapshot-data1")) === ((20L, Set("0", "1"))))
    assert(prefixes(goldenCopy("snapshot-data2")) === ((10L, Set("2"))))
    assert(prefixes(goldenCopy("snapshot-data3")) === ((30L, Set("2", "3"))))
    val rep = goldenCopy("snapshot-repartitioned")
    assert(prefixes(rep) === ((20L, Set("3"))))
    assert(GraftTable.forPath(spark, rep).snapshot.numFiles === 2)
  }

  test("golden: time-travel prefixes — each copyDir stage folds to its length") {
    val a = goldenCopy("time-travel-start")
    Graft.convertFromDelta(spark, a)
    assert(Graft.read(spark, a).select($"id").as[Long].collect().sorted.toSeq
      === (0L until 10L))
    val b = goldenCopy("time-travel-start-start20")
    Graft.convertFromDelta(spark, b)
    assert(Graft.read(spark, b).select($"id").as[Long].collect().sorted.toSeq
      === (0L until 20L))
  }

  test("golden: time-travel-schema-changes-a — pre-evolution single column") {
    val dir = goldenCopy("time-travel-schema-changes-a")
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.columns.toSeq === Seq("id"))
    assert(df.select($"id").as[Long].collect().sorted.toSeq === (0L until 10L))
  }

  test("golden: time-travel-partition-changes — overwriteSchema swaps partitioning") {
    // -a: range(10) partitioned by part5 = id % 5
    val a = goldenCopy("time-travel-partition-changes-a")
    Graft.convertFromDelta(spark, a)
    val dfa = Graft.read(spark, a)
    assert(dfa.columns.sorted.toSeq === Seq("id", "part5"))
    assert(dfa.count() === 10)
    assert(dfa.where($"part5" === 3).select($"id").as[Long].collect().sorted
      .toSeq === Seq(3L, 8L))
    // -b: overwriteSchema replaces it whole: rows 10..19, part2 = id % 2 —
    // the OLD part5 schema and its files must be gone from the fold
    val b = goldenCopy("time-travel-partition-changes-b")
    Graft.convertFromDelta(spark, b)
    val dfb = Graft.read(spark, b)
    assert(dfb.columns.sorted.toSeq === Seq("id", "part2"))
    assert(dfb.select($"id").as[Long].collect().sorted.toSeq === (10L until 20L))
    assert(dfb.where($"part2" === 1).count() === 5)
  }

  test("golden: data-reader-timestamp_ntz — plain and name-mode mapping") {
    Seq("data-reader-timestamp_ntz", "data-reader-timestamp_ntz-name-mode")
      .foreach { name =>
        val dir = goldenCopy(name)
        Graft.convertFromDelta(spark, dir)
        val df = Graft.read(spark, dir)
        assert(df.count() === 9, name)
        assert(df.where($"tsNtz".isNull).count() === 3, name)
        assert(df.where($"tsNtzPartition".isNull).count() === 3, name)
        assert(df.where($"id" === 0).select($"tsNtz".cast("string"))
          .head.getString(0) === "2021-11-18 02:30:00.123456", name)
        assert(df.where($"tsNtzPartition".cast("string")
            === "2013-07-05 17:01:00.123456")
          .select($"id").as[Int].collect().sorted.toSeq === Seq(3, 4, 5), name)
      }
  }

  test("golden: data-reader-date-types-PST — zone-written instant reads in UTC") {
    // written with JVM default TZ = PST: Timestamp.valueOf("2020-01-01
    // 08:09:10") is the instant 2020-01-01T16:09:10Z; the UTC session must
    // render exactly that shift. DateType is zone-free and stays put.
    val dir = goldenCopy("data-reader-date-types-PST")
    Graft.convertFromDelta(spark, dir)
    val r = Graft.read(spark, dir)
      .select($"timestamp".cast("string"), $"date".cast("string")).head()
    assert(r.getString(0) === "2020-01-01 16:09:10")
    assert(r.getString(1) === "2020-01-01")
  }

  test("golden: data-skipping-partition-and-data-column — stats on both columns") {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Literal}
    import org.apache.spark.sql.types.{IntegerType, StructType}
    val dir = goldenCopy("data-skipping-partition-and-data-column")
    val t = Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.count() === 4)
    assert(df.where($"part" === 1 && $"id" === 0).count() === 1)
    // per-file min=max stats: the (part=1, id=0) pair keeps only the one
    // file that holds it
    val dataSchema = new StructType().add("part", IntegerType).add("id", IntegerType)
    val part = AttributeReference("part", IntegerType)()
    val id = AttributeReference("id", IntegerType)()
    val kept = graft.stats.StatsSkipping.pruneAndFilter(
      spark, t.snapshot, None, new StructType(), Nil, dataSchema,
      Seq(EqualTo(part, Literal(1)), EqualTo(id, Literal(0))))
    assert(kept.size === 1, s"kept ${kept.size} files")
  }

  test("golden: data-skipping-change-stats-collected-across-versions") {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, GreaterThanOrEqual, Literal}
    import org.apache.spark.sql.types.{IntegerType, StructType}
    // three identical (0,0) rows; dataSkippingNumIndexedCols drops from
    // all -> 1 -> 0 across commits, so later files carry partial/no stats
    val dir = goldenCopy("data-skipping-change-stats-collected-across-versions")
    val t = Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.count() === 3)
    assert(df.where($"col2" === 0).count() === 3)
    // col1 >= 1: files WITH col1 stats (max 0) skip; the no-stats file
    // cannot be skipped and must survive pruning (returning rows = 0 is
    // the scan's job, not skipping's)
    val dataSchema = new StructType().add("col1", IntegerType).add("col2", IntegerType)
    val col1 = AttributeReference("col1", IntegerType)()
    val kept = graft.stats.StatsSkipping.pruneAndFilter(
      spark, t.snapshot, None, new StructType(), Nil, dataSchema,
      Seq(GreaterThanOrEqual(col1, Literal(1))))
    val total = t.snapshot.numFiles
    assert(kept.size < total, "stats-carrying files were not skipped")
    assert(kept.nonEmpty, "a stats-less file was wrongly skipped")
    assert(df.where($"col1" >= 1).count() === 0)
  }

  test("golden: data-skipping-all-types under NAME column mapping reads + filters") {
    val dir = goldenCopy("data-skipping-basic-stats-all-types-columnmapping-name")
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.count() === 1)
    assert(df.where($"as_int" > 100).count() === 0)
    assert(df.where($"as_int" === 0 && $"as_string" === "0").count() === 1)
  }

  test("golden: checkpoint — 15 add/remove commits fold to one live file") {
    val dir = goldenCopy("checkpoint")
    Graft.convertFromDelta(spark, dir)
    val snap = GraftTable.forPath(spark, dir).snapshot
    assert(snap.numFiles === 1)
    assert(snap.allFiles.head.path === "15")
  }

  test("golden: deltalog-commit-info — rich commitInfo + schemaless metadata fold") {
    // version 0 carries a CommitInfo with every optional field (job,
    // notebook, tags, engineInfo) and a metaData WITHOUT schemaString —
    // replay must ignore the former and tolerate the latter
    val dir = goldenCopy("deltalog-commit-info")
    Graft.convertFromDelta(spark, dir)
    val snap = GraftTable.forPath(spark, dir).snapshot
    assert(snap.numFiles === 1)
    assert(snap.allFiles.head.path === "abc")
  }

  test("golden: checkpoints missing protocol/metaData are refused") {
    Seq("deltalog-state-reconstruction-from-checkpoint-missing-metadata",
        "deltalog-state-reconstruction-from-checkpoint-missing-protocol")
      .foreach { name =>
        val e = intercept[Exception] {
          Graft.convertFromDelta(spark, goldenCopy(name))
        }
        assert(e.getMessage != null && (
            e.getMessage.contains("metaData") || e.getMessage.contains("protocol")),
          s"$name: ${e.getMessage}")
      }
  }

  test("golden: no-delta-log-folder — plain parquet dir refused by name") {
    val e = intercept[Exception] {
      Graft.convertFromDelta(spark, goldenCopy("no-delta-log-folder"))
    }
    assert(e.getMessage != null && e.getMessage.toLowerCase.contains("log"),
      e.getMessage)
  }

  test("golden: 124-decimal-decode-bug — large unscaled decimal decodes") {
    val dir = goldenCopy("124-decimal-decode-bug")
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.count() === 1)
    assert(df.select($"large_decimal").head.getDecimal(0).longValueExact()
      === 1000000L)
  }

  test("golden: basic-decimal-table-legacy — legacy parquet format decimals") {
    val dir = goldenCopy("basic-decimal-table-legacy")
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.count() === 4)
    val got = df.select($"part".cast("string"), $"col1".cast("string"))
      .as[(String, String)].collect().toMap
    assert(got("234.00000") === "1.00")
    assert(got("-2342342.23423") === "-999.99")
    assert(df.agg(sum($"col2").cast("string")).head.getString(0) ===
      "-77775.77777")
  }

  test("golden: parquet-decimal-dictionaries v1 AND v2 writer formats") {
    // the reference ships -v1 log-only (no data file); -v2 carries data
    val v1 = goldenCopy("parquet-decimal-dictionaries-v1")
    Graft.convertFromDelta(spark, v1)
    assert(GraftTable.forPath(spark, v1).snapshot.numFiles === 1)
    val dir = goldenCopy("parquet-decimal-dictionaries-v2")
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.count() === 1000000L)
    val r = df.agg(sum($"col1"), sum($"col2"), sum($"col3")).head()
    assert(r.getDecimal(0).longValueExact() === 2000000L)
    assert(r.getDecimal(1).longValueExact() === 2499996L)
    assert(r.getDecimal(2).longValueExact() === 500000L)
  }

  test("golden: parquet-all-types — 13 primitive types + nested, 200 rows") {
    val dir = goldenCopy("parquet-all-types")
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.count() === 200)
    // generator nulls: as_int null iff i % 23 == 0 (9 of 0..199)
    assert(df.where(col("IntegerType").isNull).count() === 9)
    val r = df.where(col("IntegerType") === 7)
      .select(col("LongType"), col("StringType"), col("BooleanType"),
        col("nested_struct.aa"), element_at(col("map_of_prims"), 7))
      .head()
    assert(r.getLong(0) === 8L)      // long = i + 1
    assert(r.getString(1) === "7")
    assert(!r.getBoolean(2))         // 7 % 2 != 0
    assert(r.getString(3) === "7")
  }

  test("golden: table-with-columnmapping-mode-name — name-mode physical columns") {
    val dir = goldenCopy("table-with-columnmapping-mode-name")
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.count() === 6)
    assert(df.where($"IntegerType".isNull).count() === 1)
    val r = df.where($"IntegerType" === 2).select(
      $"LongType", $"StringType", $"nested_struct.aa",
      element_at($"array_of_prims", 2)).head()
    assert(r.getLong(0) === 2L && r.getString(1) === "2" &&
      r.getString(2) === "2" && r.getInt(3) === 3)
  }

  test("golden: table-with-icebegCompatV2Enabled — writer feature tolerated") {
    // icebergCompatV2 + columnMapping(id) writer features: only READER
    // features gate a convert, so the table folds and reads whole
    val dir = goldenCopy("table-with-icebegCompatV2Enabled")
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.count() === 6)
    assert(df.where($"IntegerType" === 2).select($"StringType")
      .head.getString(0) === "2")
  }

  test("golden: data-reader-date-types — five more writer zones, UTC instants") {
    // each table holds ONE (timestamp, date) row written with a different
    // JVM default TZ; the stored instant shifts by the writer's offset,
    // the DateType value never does
    Seq(
      "data-reader-date-types-Iceland" -> "2020-01-01 08:09:10",          // UTC+0
      "data-reader-date-types-America/Los_Angeles" -> "2020-01-01 16:09:10", // UTC-8
      "data-reader-date-types-Etc/GMT+9" -> "2020-01-01 17:09:10",       // POSIX: UTC-9
      "data-reader-date-types-Asia/Beirut" -> "2020-01-01 06:09:10",     // UTC+2
      "data-reader-date-types-JST" -> "2019-12-31 23:09:10"              // UTC+9
    ).foreach { case (name, expected) =>
      val dir = goldenCopy(name)
      Graft.convertFromDelta(spark, dir)
      val r = Graft.read(spark, dir)
        .select($"timestamp".cast("string"), $"date".cast("string")).head()
      assert(r.getString(0) === expected, name)
      assert(r.getString(1) === "2020-01-01", name)
    }
  }

  test("golden: kernel-timestamp-PST and TIMESTAMP_MILLIS physical variants") {
    // MILLIS: UTC-written like the MICROS/INT96 tables — same expectations
    val m = goldenCopy("kernel-timestamp-TIMESTAMP_MILLIS")
    Graft.convertFromDelta(spark, m)
    val dfm = Graft.read(spark, m)
    assert(dfm.count() === 5)
    assert(dfm.where($"id" === 3).select($"time".cast("string"))
      .head.getString(0) === "1969-01-01 00:00:00")
    assert(dfm.where($"id" === 0).select($"part".cast("string"))
      .head.getString(0) === "2020-01-01 08:09:10.001")
    // PST-written: the DATA instant shifts by the writer offset; the
    // PARTITION string was serialized writer-local and reads back
    // verbatim under the UTC session (Delta's documented timestamp-
    // partition timezone caveat)
    val p = goldenCopy("kernel-timestamp-PST")
    Graft.convertFromDelta(spark, p)
    val dfp = Graft.read(spark, p)
    assert(dfp.count() === 5)
    assert(dfp.where($"id" === 3).select($"time".cast("string"))
      .head.getString(0) === "1969-01-01 08:00:00")
    assert(dfp.where($"id" === 0).select($"part".cast("string"))
      .head.getString(0) === "2020-01-01 08:09:10.001")
  }

  test("golden: kernel-timestamp-partition-col-ISO8601 — Z-suffixed partition values") {
    // partition values serialized as 2024-01-01T10:00:00.000000Z instead
    // of the space-separated local form: decoding must accept ISO-8601
    val dir = goldenCopy("kernel-timestamp-partition-col-ISO8601")
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.count() === 2)
    val parts = df.select($"ts".cast("string")).as[String].collect().sorted
    assert(parts.toSeq === Seq("2024-01-01 10:00:00", "2024-01-02 12:30:00"))
    assert(df.where($"ts" === lit("2024-01-01 10:00:00").cast("timestamp"))
      .count() === 1)
  }

  test("golden: data-reader-nullable-field-invalid-schema-key") {
    // one row whose array column is [null, null, null]
    val dir = goldenCopy("data-reader-nullable-field-invalid-schema-key")
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.count() === 1)
    val arr = df.select($"array_can_contain_null").head.getSeq[String](0)
    assert(arr.size === 3 && arr.forall(_ == null))
  }

  test("golden: corrupted-last-checkpoint-kernel — empty pointer, data reads whole") {
    val dir = goldenCopy("corrupted-last-checkpoint-kernel")
    Graft.convertFromDelta(spark, dir)
    // 11 appends of range(10) then overwrite with range(100)
    assert(Graft.read(spark, dir).select($"id").as[Long].collect().sorted
      .toSeq === (0L until 100L))
  }

  test("golden: commit-info-containing-arbitrary-operationParams-types") {
    // CTAS + INSERT + OPTIMIZE ZORDER: the optimize commitInfo carries
    // non-string operationParameters (zOrderBy array) — replay must not
    // choke on them
    val dir = goldenCopy("commit-info-containing-arbitrary-operationParams-types")
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.select($"id", $"month").as[(Int, Int)].collect().sorted
      .toSeq === Seq((1, 1), (2, 2)))
  }

  test("golden: collations-preview-table — preview feature + collated schema") {
    val dir = goldenCopy("collations-preview-table")
    val t = Graft.convertFromDelta(spark, dir)
    assert(t.snapshot.numFiles === 0) // log-only fixture
    val sch = t.snapshot.metadata.schema
    assert(sch("utf8_lcase_col").dataType.sql.contains("UTF8_LCASE"))
    assert(sch("unicode_col").dataType.sql.contains("UNICODE"))
  }

  test("golden: log-store-read / log-store-listFrom — raw store primitives") {
    // not delta logs: loose numbered content files exercising the
    // LogStore read/listFrom contract the reference pins in
    // ReadOnlyLogStoreSuite
    val rd = goldenCopy("log-store-read")
    val store = graft.log.GraftLog.forTable(spark, rd).store
    assert(store.read(new org.apache.hadoop.fs.Path(rd, "0"))
      .linesIterator.toSeq === Seq("zero", "none"))
    assert(store.read(new org.apache.hadoop.fs.Path(rd, "1"))
      .linesIterator.toSeq === Seq("one"))
    val lf = goldenCopy("log-store-listFrom")
    val store2 = graft.log.GraftLog.forTable(spark, lf).store
    def names(from: String): Seq[String] =
      store2.listFrom(new org.apache.hadoop.fs.Path(lf), from)
        .map(_.getPath.getName).filterNot(_.startsWith("_")).toSeq.sorted
    assert(names("0") === Seq("1", "2", "3"))
    assert(names("2") === Seq("2", "3"))
    assert(names("4") === Seq.empty)
  }

  test("golden: hive connector tables — every deltatbl-* fixture converts") {
    def conv(sub: String): org.apache.spark.sql.DataFrame = {
      val dir = goldenCopy(s"hive/$sub")
      Graft.convertFromDelta(spark, dir)
      Graft.read(spark, dir)
    }
    // plain + partitioned 10-row (c1, c2=foo{c1%2}) tables
    Seq("deltatbl-non-partitioned", "deltatbl-partitioned",
        "deltatbl-deleted-path", "deltatbl-touch-files-needed-for-partitioned",
        "deltatbl-not-allow-write").foreach { sub =>
      val df = conv(sub)
      assert(df.count() === 10, sub)
      val cols = df.columns.map(_.toLowerCase).toSeq
      val (a, b) = (df.col(df.columns(0)), df.col(df.columns(1)))
      assert(df.where(b === "foo1").count() === 5, s"$sub $cols")
    }
    // incorrect-format-config uses (a, b) names
    assert(conv("deltatbl-incorrect-format-config").where($"b" === "foo0")
      .count() === 5)
    // schema-match: 3 columns, partitioned by b
    val sm = conv("deltatbl-schema-match")
    assert(sm.where($"b" === "foo1" && $"c" === "test2").count() >= 1)
    // partition pruning over (date, city)
    val pp = conv("deltatbl-partition-prune")
    assert(pp.count() === 5)
    assert(pp.where($"city" === "hz" && $"date" === "20180520")
      .select($"name", $"cnt").as[(String, Int)].head() === (("Jim", 3)))
    // special chars in partition VALUES decode ("+ =%0", "+ =%1")
    val sc = conv("deltatbl-special-chars-in-partition-column")
    assert(sc.select($"c2").distinct().as[String].collect().sorted.toSeq
      === Seq("+ =%0", "+ =%1"))
    assert(sc.where($"c2" === "+ =%1").count() === 5)
    // case-insensitive column names
    val ci = conv("deltatbl-column-names-case-insensitive")
    assert(ci.columns.toSeq === Seq("FooBar", "BarFoo"))
    assert(ci.where(col("barfoo") === "foo0").count() === 5)
    // every supported hive type maps correctly
    val mt = conv("deltatbl-map-types-correctly")
    val r = mt.select($"c1", $"c5", $"c6", $"c9",
      element_at($"c14", "foo"), $"c15.f2").head()
    assert(r.getByte(0) === 97.toByte && r.getLong(1) === 5L &&
      r.getString(2) === "foo" && r.getShort(3) === 8.toShort &&
      r.getLong(4) === 123L && r.getLong(5) === 456L)
  }

  test("golden: parquet-all-types-legacy-format — legacy writer layout") {
    val dir = goldenCopy("parquet-all-types-legacy-format")
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    assert(df.count() === 200)
    assert(df.where(col("IntegerType").isNull).count() === 9)
    val r = df.where(col("IntegerType") === 7)
      .select(col("LongType"), col("StringType")).head()
    assert(r.getLong(0) === 8L && r.getString(1) === "7")
  }

  test("golden: parquet-decimal-type — INT32/INT64/FLBA physical decimals") {
    val dir = goldenCopy("parquet-decimal-type")
    Graft.convertFromDelta(spark, dir)
    val df = Graft.read(spark, dir)
    val n = df.count()
    assert(n > 0)
    // converted read equals a direct parquet read of the live files
    val t = GraftTable.forPath(spark, dir)
    val raw = spark.read.parquet(
      t.snapshot.allFiles.map(f => s"$dir/${f.path}"): _*)
    assert(raw.count() === n)
    assert(df.exceptAll(raw).count() === 0)
  }

  test("golden: metadata-less log (absolute-paths fixture) refused loudly") {
    // the reference's data-reader-absolute-paths-escaped-chars log has NO
    // metaData action at all; convert refuses instead of guessing a schema
    val e = intercept[IllegalArgumentException] {
      Graft.convertFromDelta(spark,
        goldenCopy("data-reader-absolute-paths-escaped-chars"))
    }
    assert(e.getMessage.contains("no metaData action"), e.getMessage)
  }
}
