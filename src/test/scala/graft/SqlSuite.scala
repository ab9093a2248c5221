package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL surface: DML through spark.sql over `graft.`/path`` targets plus
  * the hand-parsed maintenance statements. */
class SqlSuite extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def tmpDir(): String = Files.createTempDirectory("graft-sql").toString

  test("SELECT over graft.`path`") {
    val dir = tmpDir()
    Graft.write(spark.range(10).toDF("id"), dir)
    val n = spark.sql(s"SELECT count(*) AS n FROM graft.`$dir`").head().getLong(0)
    assert(n === 10)
  }

  test("SQL time travel: VERSION AS OF / TIMESTAMP AS OF on paths and named tables") {
    val dir = tmpDir()
    Graft.write(spark.range(2).toDF("id"), dir)   // v0
    Graft.write(spark.range(2, 5).toDF("id"), dir) // v1
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.`$dir` VERSION AS OF 0")
      .head.getLong(0) === 2)
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.`$dir` VERSION AS OF 1")
      .head.getLong(0) === 5)
    // a timestamp beyond the last commit resolves to the latest version
    assert(spark.sql(
      s"SELECT count(*) AS n FROM graft.`$dir` TIMESTAMP AS OF '2999-01-01'")
      .head.getLong(0) === 5)
    val tbl = "graft_tt_" + (System.nanoTime() % 1000000)
    spark.sql(s"CREATE TABLE $tbl USING graft LOCATION '$dir'")
    try {
      assert(spark.sql(s"SELECT count(*) AS n FROM $tbl VERSION AS OF 0")
        .head.getLong(0) === 2)
      assert(spark.sql(
        s"SELECT count(*) AS n FROM $tbl TIMESTAMP AS OF '2999-01-01 00:00:00'")
        .head.getLong(0) === 5)
      // joins of two travel points of the same table resolve independently
      assert(spark.sql(
        s"""SELECT count(*) AS n FROM $tbl VERSION AS OF 1 a
            JOIN $tbl VERSION AS OF 0 b USING (id)""").head.getLong(0) === 2)
    } finally spark.sql(s"DROP TABLE $tbl")
  }

  test("SQL DML returns num_affected_rows") {
    val dir = tmpDir()
    Graft.write(spark.range(100).toDF("id"), dir)
    assert(spark.sql(s"DELETE FROM graft.`$dir` WHERE id < 30")
      .head.getLong(0) === 30)
    assert(spark.sql(s"UPDATE graft.`$dir` SET id = id + 1000 WHERE id >= 90")
      .head.getLong(0) === 10)
    assert(spark.sql(s"UPDATE graft.`$dir` SET id = 0 WHERE id = -5")
      .head.getLong(0) === 0)
    // DV paths report exact counts too
    val dvDir = tmpDir()
    Graft.write(spark.range(50).toDF("id"), dvDir,
      configuration = Map("graft.enableDeletionVectors" -> "true"))
    assert(spark.sql(s"DELETE FROM graft.`$dvDir` WHERE id % 5 = 0")
      .head.getLong(0) === 10)
    assert(spark.sql(s"UPDATE graft.`$dvDir` SET id = id + 100 WHERE id = 1")
      .head.getLong(0) === 1)
    // whole-table delete: counted from file stats, no scan
    assert(spark.sql(s"DELETE FROM graft.`$dir`").head.getLong(0) === 70)
    // MERGE returns (affected, updated, deleted, inserted) — exact on
    // both rewrite and DV paths
    for (conf <- Seq(Map.empty[String, String],
        Map("graft.enableDeletionVectors" -> "true"))) {
      val md = tmpDir()
      Graft.write(spark.range(5).select($"id", lit("old").as("tag")), md,
        configuration = conf)
      spark.range(3, 8).select($"id", lit("new").as("tag"))
        .createOrReplaceTempView("cnt_src")
      val r = spark.sql(
        s"""MERGE INTO graft.`$md` t USING cnt_src s ON t.id = s.id
           |WHEN MATCHED AND t.id = 4 THEN DELETE
           |WHEN MATCHED THEN UPDATE SET tag = s.tag
           |WHEN NOT MATCHED THEN INSERT *
           |""".stripMargin).head
      assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
        ((5L, 1L, 1L, 3L)), s"conf=$conf")
    }
  }

  test("sql DELETE with and without WHERE") {
    val dir = tmpDir()
    Graft.write(spark.range(10).select($"id", ($"id" % 2).as("p")), dir)
    spark.sql(s"DELETE FROM graft.`$dir` WHERE id >= 6")
    assert(Graft.read(spark, dir).count() === 6)
    spark.sql(s"DELETE FROM graft.`$dir`")
    assert(Graft.read(spark, dir).count() === 0)
  }

  test("sql UPDATE with assignments") {
    val dir = tmpDir()
    Graft.write(spark.range(10).select($"id", lit(0L).as("v")), dir)
    spark.sql(s"UPDATE graft.`$dir` SET v = id * 10 WHERE id < 3")
    val got = Graft.read(spark, dir).orderBy("id").select("v").as[Long].collect()
    assert(got.take(3).toSeq === Seq(0L, 10L, 20L))
    assert(got.drop(3).forall(_ === 0L))
  }

  test("sql MERGE upsert + delete clause") {
    val dir = tmpDir()
    Graft.write(spark.range(5).select($"id", lit("old").as("tag")), dir)
    spark.range(3, 8).select($"id", lit("new").as("tag"))
      .createOrReplaceTempView("merge_src")
    spark.sql(
      s"""MERGE INTO graft.`$dir` AS t USING merge_src AS s ON t.id = s.id
         |WHEN MATCHED AND t.id = 4 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET tag = s.tag
         |WHEN NOT MATCHED THEN INSERT *
         |""".stripMargin)
    val got = Graft.read(spark, dir).orderBy("id")
      .select("id", "tag").as[(Long, String)].collect().toSeq
    assert(got === Seq(0L -> "old", 1L -> "old", 2L -> "old",
      3L -> "new", 5L -> "new", 6L -> "new", 7L -> "new"))
  }

  test("sql MERGE not matched by source") {
    val dir = tmpDir()
    Graft.write(spark.range(6).select($"id", lit(1L).as("v")), dir)
    spark.range(3).toDF("id").createOrReplaceTempView("merge_src2")
    spark.sql(
      s"""MERGE INTO graft.`$dir` t USING merge_src2 s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = 2
         |WHEN NOT MATCHED BY SOURCE THEN DELETE
         |""".stripMargin)
    val got = Graft.read(spark, dir).orderBy("id")
      .select("id", "v").as[(Long, Long)].collect().toSeq
    assert(got === Seq(0L -> 2L, 1L -> 2L, 2L -> 2L))
  }

  test("OPTIMIZE / VACUUM / DESCRIBE HISTORY statements") {
    val dir = tmpDir()
    (0 until 4).foreach(_ => Graft.write(spark.range(100).toDF("id"), dir))
    val opt = spark.sql(s"OPTIMIZE '$dir'").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(opt("numFilesRemoved").toInt > 0)
    // vacuum dry run within retention: compacted originals not yet deletable
    val dry = spark.sql(s"VACUUM '$dir' RETAIN 200 HOURS DRY RUN")
    assert(dry.columns.toSeq === Seq("path"))
    assert(dry.count() === 0)
    val hist = spark.sql(s"DESCRIBE HISTORY graft.`$dir` LIMIT 3").collect()
    assert(hist.length === 3)
    assert(hist.head.getAs[String]("operation") === "OPTIMIZE")
    // zorder form parses and runs
    Graft.write(spark.range(50).select($"id", ($"id" * 2).as("k")), s"$dir-z")
    val z = spark.sql(s"OPTIMIZE '$dir-z' ZORDER BY (id, k)").collect()
    assert(z.map(_.getString(0)).contains("zOrderBy"))
  }

  test("DESCRIBE DETAIL / RESTORE / REORG statements") {
    val dir = tmpDir()
    Graft.write(spark.range(10).toDF("id"), dir,
      configuration = Map("graft.enableDeletionVectors" -> "true"))
    spark.sql(s"DELETE FROM graft.`$dir` WHERE id < 4")          // v1 (DV)
    val detail = spark.sql(s"DESCRIBE DETAIL '$dir'").head()
    assert(detail.getAs[String]("format") === "graft")
    assert(detail.getAs[Long]("version") === 1L)
    val reorg = spark.sql(s"REORG TABLE '$dir' APPLY (PURGE)").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(reorg("numFilesRewritten").toInt > 0)
    assert(Graft.read(spark, dir).count() === 6)
    spark.sql(s"RESTORE TABLE '$dir' TO VERSION AS OF 0")
    assert(Graft.read(spark, dir).count() === 10)
  }

  test("REORG WHERE purges only the selected partition") {
    val dir = tmpDir()
    Graft.write(spark.range(40).select($"id", ($"id" % 2).cast("string").as("p")),
      dir, partitionBy = Seq("p"),
      configuration = Map("graft.enableDeletionVectors" -> "true"))
    spark.sql(s"DELETE FROM graft.`$dir` WHERE id < 10")   // DVs in BOTH partitions
    val before = GraftTable.forPath(spark, dir).snapshot.allFiles
    assert(before.count(_.dvPath.isDefined) >= 2)
    spark.sql(s"REORG TABLE '$dir' WHERE p = '0' APPLY (PURGE)")
    val after = GraftTable.forPath(spark, dir).snapshot.allFiles
    // partition 0's DVs materialized; partition 1's remain
    assert(after.filter(_.partitionValues("p") == "0").forall(_.dvPath.isEmpty))
    assert(after.exists(f =>
      f.partitionValues("p") == "1" && f.dvPath.isDefined))
    assert(Graft.read(spark, dir).count() === 30)
    // data-column predicates refuse loudly
    val e = intercept[Exception] {
      spark.sql(s"REORG TABLE '$dir' WHERE id < 5 APPLY (PURGE)")
    }
    assert(e.getMessage.contains("partition predicates"), e.getMessage)
  }

  test("ALTER TABLE CLUSTER BY sets and clears the clustering columns") {
    val dir = tmpDir()
    Graft.write(spark.range(50).select($"id", ($"id" * 3 % 7).as("k")), dir)
    spark.sql(s"ALTER TABLE graft.`$dir` CLUSTER BY (k, id)")
    assert(GraftTable.forPath(spark, dir).snapshot.metadata
      .configuration("graft.clusterBy") === "k,id")
    // clustering drives OPTIMIZE's layout choice
    spark.sql(s"OPTIMIZE '$dir'")
    val hist = spark.sql(s"DESCRIBE HISTORY '$dir'").collect()
      .map(_.getAs[String]("operation"))
    assert(hist.exists(_.startsWith("OPTIMIZE")))
    spark.sql(s"ALTER TABLE graft.`$dir` CLUSTER BY NONE")
    assert(!GraftTable.forPath(spark, dir).snapshot.metadata
      .configuration.contains("graft.clusterBy"))
  }

  test("CONVERT TO GRAFT / GENERATE / SHOW PARTITIONS statements") {
    val dir = tmpDir()
    spark.range(10).selectExpr("id", "id % 2 AS p").write
      .mode("overwrite").partitionBy("p").parquet(dir)
    spark.sql(s"CONVERT TO GRAFT parquet.`$dir`")
    assert(Graft.read(spark, dir).count() === 10)
    val parts = spark.sql(s"SHOW PARTITIONS '$dir'").collect()
      .map(_.getMap[String, String](0)("p")).sorted
    assert(parts.toSeq === Seq("0", "1"))
    spark.sql(s"GENERATE symlink_format_manifest FOR TABLE '$dir'")
    assert(new java.io.File(dir, "_symlink_format_manifest").exists)
  }

  test("ALTER TABLE column DDL over graft paths and named tables") {
    val dir = tmpDir()
    Graft.write(spark.range(5).select($"id", lit("x").as("tag")), dir)
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN tag TO label")
    assert(Graft.read(spark, dir).columns.toSeq === Seq("id", "label"))
    spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMN (score DOUBLE)")
    assert(Graft.read(spark, dir).columns.toSeq === Seq("id", "label", "score"))
    spark.sql(s"ALTER TABLE graft.`$dir` DROP COLUMN label")
    assert(Graft.read(spark, dir).columns.toSeq === Seq("id", "score"))
    // named-table variant commits to the LOG, not just the metastore
    spark.sql("DROP TABLE IF EXISTS graft_alter_t")
    spark.range(3).select($"id", lit(1L).as("v")).write.format("graft")
      .saveAsTable("graft_alter_t")
    try {
      spark.sql("ALTER TABLE graft_alter_t RENAME COLUMN v TO w")
      val loc = spark.sql("DESCRIBE EXTENDED graft_alter_t")
        .filter($"col_name" === "Location").head.getString(1)
      assert(GraftTable.forPath(spark, new java.net.URI(loc).getPath)
        .snapshot.metadata.schema.fieldNames.contains("w"))
    } finally spark.sql("DROP TABLE IF EXISTS graft_alter_t")
  }

  test("named tables: saveAsTable, spark.table, transactional DML via catalog") {
    val dir = tmpDir()
    spark.sql("DROP TABLE IF EXISTS graft_named_t")
    Graft.write(spark.range(7).toDF("id"), dir)
    spark.sql(s"CREATE TABLE graft_named_t USING graft LOCATION '$dir'")
    try {
      assert(spark.table("graft_named_t").count() === 7)
      spark.sql("DELETE FROM graft_named_t WHERE id = 0")
      assert(spark.table("graft_named_t").count() === 6)   // cache invalidated
      // INSERT routes through the transactional write (a raw
      // InsertIntoHadoopFsRelationCommand would write invisible files)
      spark.sql("INSERT INTO graft_named_t VALUES (100), (101)")
      assert(spark.table("graft_named_t").count() === 8)
      assert(spark.table("graft_named_t").filter($"id" >= 100).count() === 2)
      spark.sql("UPDATE graft_named_t SET id = 999 WHERE id = 1")
      assert(spark.table("graft_named_t").filter($"id" === 999).count() === 1)
      spark.range(200, 203).toDF("id").createOrReplaceTempView("named_src")
      spark.sql("""MERGE INTO graft_named_t t USING named_src s ON t.id = s.id
                   WHEN NOT MATCHED THEN INSERT *""")
      assert(spark.table("graft_named_t").count() === 11)
      spark.sql("INSERT OVERWRITE graft_named_t VALUES (1), (2)")
      assert(spark.table("graft_named_t").count() === 2)
      // every one of those was a log commit
      val ops = GraftTable.forPath(spark, dir).history()
        .select("operation").as[String].collect().toSeq
      assert(ops.count(_ == "DELETE") === 1)
      assert(ops.count(_ == "MERGE") === 1)
      assert(ops.count(_ == "UPDATE") === 1)
    } finally spark.sql("DROP TABLE IF EXISTS graft_named_t")
    // managed table via saveAsTable
    spark.sql("DROP TABLE IF EXISTS graft_named_m")
    spark.range(5).toDF("id").write.format("graft").saveAsTable("graft_named_m")
    try {
      spark.sql("DELETE FROM graft_named_m WHERE id < 2")
      assert(spark.table("graft_named_m").count() === 3)
    } finally spark.sql("DROP TABLE IF EXISTS graft_named_m")
  }

  test("sql DELETE over a path-resolved relation keeps Spark behavior for non-graft") {
    // A plain parquet path must NOT be intercepted by the graft rule.
    val dir = tmpDir()
    spark.range(5).toDF("id").write.mode("overwrite").parquet(dir)
    intercept[Exception] { spark.sql(s"DELETE FROM parquet.`$dir` WHERE id = 1") }
  }
}
