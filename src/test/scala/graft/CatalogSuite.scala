package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** DSv2 catalog surface: CREATE TABLE / CTAS / REPLACE / properties /
  * constraints / static-partition INSERT / table_changes TVF. */
class CatalogSuite extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def tmpDir(): String = Files.createTempDirectory("graft-cat").toString

  private def fresh(prefix: String): String =
    s"${prefix}_${System.nanoTime()}"

  test("CTAS external and managed; DROP TABLE keeps external data") {
    val dir = tmpDir()
    val ext = fresh("cat_ext")
    val man = fresh("cat_man")
    spark.range(10).toDF("id").createOrReplaceTempView("cat_src10")
    spark.sql(s"CREATE TABLE $ext USING graft LOCATION '$dir/t' AS SELECT * FROM cat_src10")
    assert(spark.table(ext).count() === 10)
    assert(GraftTable.isGraftTable(spark, s"$dir/t"))
    spark.sql(s"CREATE TABLE $man USING graft AS SELECT * FROM cat_src10 WHERE id < 4")
    assert(spark.table(man).count() === 4)
    spark.sql(s"DROP TABLE $ext")
    assert(GraftTable.isGraftTable(spark, s"$dir/t"))   // external: data stays
    spark.sql(s"DROP TABLE $man")
  }

  test("CREATE TABLE with schema + PARTITIONED BY creates the log; static-partition INSERT") {
    val dir = tmpDir()
    val t = fresh("cat_part")
    spark.sql(s"CREATE TABLE $t (a INT, b STRING) USING graft PARTITIONED BY (b) LOCATION '$dir/t'")
    assert(GraftTable.forPath(spark, s"$dir/t").snapshot.metadata.partitionColumns === Seq("b"))
    spark.sql(s"INSERT INTO $t PARTITION (b='x') VALUES (1)")
    spark.sql(s"INSERT INTO $t PARTITION (b='y') VALUES (5)")
    spark.sql(s"INSERT OVERWRITE $t PARTITION (b='x') VALUES (9)")
    val rows = spark.table(t).collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(rows === Set((9, "x"), (5, "y")))
    spark.sql(s"DROP TABLE $t")
  }

  test("CREATE OR REPLACE swaps schema and data atomically") {
    val dir = tmpDir()
    val t = fresh("cat_cor")
    spark.range(10).toDF("id").createOrReplaceTempView("cat_cor_src")
    spark.sql(s"CREATE OR REPLACE TABLE $t USING graft LOCATION '$dir/t' AS SELECT id FROM cat_cor_src WHERE id < 5")
    assert(spark.table(t).count() === 5)
    spark.sql(s"CREATE OR REPLACE TABLE $t USING graft LOCATION '$dir/t' AS " +
      "SELECT id, id * 2 AS dbl FROM cat_cor_src")
    assert(spark.table(t).count() === 10)
    assert(spark.table(t).columns.toSeq === Seq("id", "dbl"))
    // old files are tombstoned, not resurrected
    assert(GraftTable.forPath(spark, s"$dir/t").snapshot.version === 1)
    spark.sql(s"DROP TABLE $t")
  }

  test("TBLPROPERTIES reach the log at create and via ALTER SET/UNSET") {
    val dir = tmpDir()
    val t = fresh("cat_props")
    spark.range(3).toDF("id").createOrReplaceTempView("cat_props_src")
    spark.sql(s"CREATE TABLE $t USING graft LOCATION '$dir/t' " +
      "TBLPROPERTIES ('graft.enableChangeDataFeed'='true') AS SELECT * FROM cat_props_src")
    def cfg = GraftTable.forPath(spark, s"$dir/t").snapshot.metadata.configuration
    assert(cfg.get("graft.enableChangeDataFeed").contains("true"))
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('foo'='bar')")
    assert(cfg.get("foo").contains("bar"))
    spark.sql(s"ALTER TABLE $t UNSET TBLPROPERTIES ('foo')")
    assert(!cfg.contains("foo"))
    // path-addressed form too
    spark.sql(s"ALTER TABLE graft.`$dir/t` SET TBLPROPERTIES ('k2'='v2')")
    assert(cfg.get("k2").contains("v2"))
    spark.sql(s"DROP TABLE $t")
  }

  test("ADD/DROP CONSTRAINT via SQL enforces on writes") {
    val dir = tmpDir()
    Graft.write(spark.range(5).toDF("id"), dir)
    spark.sql(s"ALTER TABLE graft.`$dir` ADD CONSTRAINT pos CHECK (id >= 0)")
    val err = intercept[Exception] {
      Graft.write(Seq(-1L).toDF("id"), dir)
    }
    assert(err.getMessage != null)
    spark.sql(s"ALTER TABLE graft.`$dir` DROP CONSTRAINT pos")
    Graft.write(Seq(-1L).toDF("id"), dir)
    assert(Graft.read(spark, dir).count() === 6)
  }

  test("ALTER TABLE DROP FEATURE via SQL downgrades the protocol") {
    val dir = tmpDir()
    Graft.write(spark.range(20).toDF("id"), dir,
      configuration = Map("graft.enableDeletionVectors" -> "true"))
    val t = GraftTable.forPath(spark, dir)
    t.delete(org.apache.spark.sql.functions.col("id") < 5)
    assert(t.log.update().protocol.minReaderVersion === 3)
    t.reorgPurge()
    spark.sql(s"ALTER TABLE graft.`$dir` DROP FEATURE deletionVectors")
    val p = t.log.update().protocol
    assert(p.minReaderVersion === 1 && p.readerFeatures.isEmpty)
    assert(Graft.read(spark, dir).count() === 15)
  }

  test("table_changes TVF over path and named table") {
    val dir = tmpDir()
    val t = fresh("cat_cdf")
    spark.range(10).toDF("id").createOrReplaceTempView("cat_cdf_src")
    spark.sql(s"CREATE TABLE $t USING graft LOCATION '$dir/t' " +
      "TBLPROPERTIES ('graft.enableChangeDataFeed'='true') AS SELECT * FROM cat_cdf_src")
    spark.sql(s"DELETE FROM $t WHERE id >= 7")
    val byType = spark.sql(s"SELECT _change_type, count(*) AS n FROM table_changes('$t', 1) GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType === Map("delete" -> 3L))
    val all = spark.sql(s"SELECT count(*) AS n FROM table_changes('$dir/t', 0)").head.getLong(0)
    assert(all === 13L)  // 10 inserts + 3 deletes
    // timestamp bounds: each bound resolves to the last commit at or
    // before that wall-clock time (string and typed timestamp forms)
    val log = graft.log.GraftLog.forTable(spark, s"$dir/t")
    val t1 = new java.sql.Timestamp(
      log.listCommitTimestamps().toMap.apply(1L)).toString
    val byTs = spark.sql(
      s"SELECT count(*) AS n FROM table_changes('$dir/t', '$t1')").head.getLong(0)
    assert(byTs === 3L)   // from the delete commit on
    val byTsTyped = spark.sql(
      s"SELECT count(*) AS n FROM table_changes('$dir/t', TIMESTAMP'$t1')")
      .head.getLong(0)
    assert(byTsTyped === 3L)
    // mixed bounds: version start, timestamp end spanning everything
    val future = new java.sql.Timestamp(System.currentTimeMillis() + 60000).toString
    val mixed = spark.sql(
      s"SELECT count(*) AS n FROM table_changes('$dir/t', 0, '$future')")
      .head.getLong(0)
    assert(mixed === 13L)
    spark.sql(s"DROP TABLE $t")
  }

  test("partitioned CTAS records partitioning in the log") {
    val dir = tmpDir()
    val t = fresh("cat_pctas")
    spark.range(10).toDF("id").createOrReplaceTempView("cat_pctas_src")
    spark.sql(s"CREATE TABLE $t USING graft PARTITIONED BY (b) LOCATION '$dir/t' AS " +
      "SELECT id AS a, CAST(id % 3 AS STRING) AS b FROM cat_pctas_src")
    assert(GraftTable.forPath(spark, s"$dir/t").snapshot.metadata.partitionColumns === Seq("b"))
    assert(spark.table(t).groupBy("b").count().count() === 3)
    spark.sql(s"DROP TABLE $t")
  }

  test("maintenance SQL accepts named tables") {
    val dir = tmpDir()
    val t = fresh("cat_maint")
    spark.range(20).toDF("id").createOrReplaceTempView("cat_maint_src")
    spark.sql(s"CREATE TABLE $t USING graft LOCATION '$dir/t' AS SELECT * FROM cat_maint_src")
    spark.sql(s"INSERT INTO $t SELECT * FROM cat_maint_src")
    assert(spark.sql(s"DESCRIBE HISTORY $t").count() === 2)
    assert(spark.sql(s"DESC DETAIL $t").head.getAs[Long]("version") === 1L)
    spark.sql(s"OPTIMIZE $t")
    assert(GraftTable.forPath(spark, s"$dir/t").snapshot.allFiles.size === 1)
    spark.sql(s"VACUUM $t DRY RUN")
    spark.sql(s"RESTORE TABLE $t VERSION AS OF 0")
    assert(spark.table(t).count() === 20)
    spark.sql(s"DROP TABLE $t")
  }

  test("VACUUM LITE reclaims tombstoned files from the log, no listing") {
    val dir = tmpDir()
    Graft.write(spark.range(10).select($"id", ($"id" % 2).as("p")), dir)
    GraftTable.forPath(spark, dir).delete($"id" < 5)   // rewrites -> tombstones
    val tombs = GraftTable.forPath(spark, dir).snapshot.tombstones.map(_.path)
    assert(tombs.nonEmpty)
    spark.conf.set("spark.graft.vacuum.retentionCheck.enabled", "false")
    try {
      val dry = spark.sql(s"VACUUM graft.`$dir` RETAIN 0 HOURS LITE DRY RUN")
        .collect().map(_.getString(0)).toSet
      assert(tombs.forall(t => dry.exists(_.endsWith(t))))
      spark.sql(s"VACUUM graft.`$dir` RETAIN 0 HOURS LITE")
      tombs.foreach { t =>
        assert(!new java.io.File(s"$dir/$t").exists(), s"$t not deleted")
      }
      assert(Graft.read(spark, dir).count() === 5)   // table unharmed
    } finally spark.conf.unset("spark.graft.vacuum.retentionCheck.enabled")
  }

  test("RESTORE TIMESTAMP AS OF") {
    val dir = tmpDir()
    Graft.write(spark.range(5).toDF("id"), dir)
    Thread.sleep(20)
    val cut = new java.sql.Timestamp(System.currentTimeMillis())
    Thread.sleep(20)
    Graft.write(spark.range(5, 30).toDF("id"), dir)
    spark.sql(s"RESTORE TABLE graft.`$dir` TIMESTAMP AS OF '$cut'")
    assert(Graft.read(spark, dir).count() === 5)
  }

  test("SHOW TBLPROPERTIES, CREATE TABLE LIKE, and SHALLOW CLONE SQL") {
    val dir = tmpDir()
    val src = fresh("cat_src")
    spark.range(8).toDF("id").createOrReplaceTempView("cat_like_src")
    spark.sql(s"CREATE TABLE $src USING graft LOCATION '$dir/src' " +
      "TBLPROPERTIES ('graft.enableChangeDataFeed'='true') AS SELECT * FROM cat_like_src")
    val props = spark.sql(s"SHOW TBLPROPERTIES $src").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("graft.enableChangeDataFeed").contains("true"))
    // LIKE: same definition, no data
    val like = fresh("cat_like")
    spark.sql(s"CREATE TABLE $like LIKE $src USING graft LOCATION '$dir/like'")
    assert(spark.table(like).count() === 0)
    assert(spark.table(like).columns.toSeq === Seq("id"))
    assert(GraftTable.forPath(spark, s"$dir/like").snapshot.metadata
      .configuration.get("graft.enableChangeDataFeed").contains("true"))
    // SHALLOW CLONE: same definition + the source's files by reference
    val cl = fresh("cat_clone")
    spark.sql(s"CREATE TABLE $cl SHALLOW CLONE $src LOCATION '$dir/clone'")
    assert(spark.table(cl).count() === 8)
    // clone is independent: deleting from it leaves the source alone
    spark.sql(s"DELETE FROM $cl WHERE id < 4")
    assert(spark.table(cl).count() === 4)
    assert(spark.table(src).count() === 8)
    // time-travel clone: VERSION AS OF pins the source's PRE-delete state
    spark.sql(s"DELETE FROM $src WHERE id >= 6")            // src v1
    val cl0 = fresh("cat_clone_v0")
    spark.sql(s"CREATE TABLE $cl0 SHALLOW CLONE $src VERSION AS OF 0 " +
      s"LOCATION '$dir/clone_v0'")
    assert(spark.table(cl0).count() === 8)
    assert(spark.table(src).count() === 6)
    Seq(src, like, cl, cl0).foreach(t => spark.sql(s"DROP TABLE $t"))
  }

  test("CREATE TABLE LIKE carries partitioning; refuses a non-graft source") {
    val dir = tmpDir()
    import org.apache.spark.sql.functions.col
    Graft.write(spark.range(10).toDF("id").withColumn("p", col("id") % 2),
      s"$dir/psrc", partitionBy = Seq("p"))
    spark.sql(s"CREATE TABLE graft.`$dir/plike` LIKE graft.`$dir/psrc`")
    val m = GraftTable.forPath(spark, s"$dir/plike").snapshot.metadata
    assert(m.partitionColumns === Seq("p"))
    assert(spark.read.format("graft").load(s"$dir/plike").count() === 0)
    // a plain parquet dir is not a graft table: named refusal, no debris
    spark.range(3).toDF("id").write.parquet(s"$dir/raw")
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`$dir/rawlike` LIKE graft.`$dir/raw`")
    }
    assert(e.getMessage.contains("not a graft table"))
    assert(!new java.io.File(s"$dir/rawlike/_graft_log").exists())
  }

  test("CREATE TABLE with IDENTITY and GENERATED columns via SQL") {
    val dir = tmpDir()
    val t = fresh("cat_idgen")
    spark.sql(s"""CREATE TABLE $t (
      id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 10 INCREMENT BY 2),
      x INT,
      dbl INT GENERATED ALWAYS AS (x * 2)
    ) USING graft LOCATION '$dir/t'""")
    spark.sql(s"INSERT INTO $t (x) SELECT 5")
    // identity assigned from the declared start/step; generated computed
    spark.sql(s"INSERT INTO $t (x) SELECT 7")
    val rows = spark.table(t).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(rows.map(_._2).toSet === Set(5, 7))
    assert(rows.forall { case (_, x, d) => d === x * 2 })
    val ids = rows.map(_._1)
    assert(ids.distinct.length === 2 && ids.forall(i => i >= 10 && (i - 10) % 2 === 0),
      s"ids=$ids")
    spark.sql(s"DROP TABLE $t")
  }

  test("CREATE TABLE CLUSTER BY drives incremental clustering") {
    val dir = tmpDir()
    val t = fresh("cat_cluster")
    spark.sql(s"CREATE TABLE $t (a BIGINT, b BIGINT) USING graft " +
      s"CLUSTER BY (a, b) LOCATION '$dir/t'")
    val cfg = GraftTable.forPath(spark, s"$dir/t").snapshot.metadata.configuration
    assert(cfg.get("graft.clusterBy").contains("a,b"), s"cfg=$cfg")
    spark.range(100).selectExpr("id AS a", "id * 3 AS b")
      .write.format("graft").mode("append").save(s"$dir/t")
    spark.sql(s"OPTIMIZE $t")
    // the clustered rewrite tags its output files
    val tags = GraftTable.forPath(spark, s"$dir/t").snapshot.allFiles
      .flatMap(f => Option(f.tags)).flatMap(_.get("clustered"))
    assert(tags.nonEmpty && tags.forall(_ == "true"))
    spark.sql(s"DROP TABLE $t")
  }

  test("CREATE TABLE with a CHECK constraint enforces on writes") {
    val dir = tmpDir()
    val t = fresh("cat_check")
    spark.sql(s"CREATE TABLE $t (id BIGINT, CONSTRAINT pos CHECK (id >= 0)) " +
      s"USING graft LOCATION '$dir/t'")
    spark.sql(s"INSERT INTO $t VALUES (3)")
    val err = intercept[Exception] {
      spark.sql(s"INSERT INTO $t VALUES (-1)")
    }
    assert(err.getMessage != null)
    assert(spark.table(t).count() === 1)
    spark.sql(s"DROP TABLE $t")
  }

  test("MERGE WITH SCHEMA EVOLUTION adds source columns") {
    val dir = tmpDir()
    Graft.write(spark.range(5).selectExpr("id AS k", "id * 10 AS v"), dir)
    // API path
    val src = spark.range(3, 8).selectExpr("id AS k", "id * 100 AS v", "'x' AS extra")
    GraftTable.forPath(spark, dir)
      .merge(src, org.apache.spark.sql.functions.expr("t.k = s.k"))
      .withSchemaEvolution()
      .whenMatched().updateAll()
      .whenNotMatched().insertAll()
      .execute()
    val out = Graft.read(spark, dir).orderBy("k")
    assert(out.columns.toSeq === Seq("k", "v", "extra"))
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.length === 8)
    assert(rows.filter(_._1 < 3).forall(_._3 == null))       // untouched rows null-fill
    assert(rows.filter(_._1 >= 3).forall(_._3 == "x"))       // updated + inserted
    assert(rows.find(_._1 == 4).get._2 === 400L)
    // SQL path: WITH SCHEMA EVOLUTION keyword
    spark.range(8, 10).selectExpr("id AS k", "id AS v", "'y' AS extra", "id * 2 AS extra2")
      .createOrReplaceTempView("merge_evo_src")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO graft.`$dir` AS t
         |USING merge_evo_src AS s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *
         |""".stripMargin)
    val out2 = Graft.read(spark, dir)
    assert(out2.columns.toSeq === Seq("k", "v", "extra", "extra2"))
    assert(out2.count() === 10)
    assert(out2.filter("k >= 8").selectExpr("sum(extra2)").head.getLong(0) === 34L)
  }

  test("REPLACE TABLE without AS SELECT empties and redefines") {
    val dir = tmpDir()
    val t = fresh("cat_rep")
    spark.range(6).toDF("id").createOrReplaceTempView("cat_rep_src")
    spark.sql(s"CREATE TABLE $t USING graft LOCATION '$dir/t' AS SELECT * FROM cat_rep_src")
    spark.sql(s"REPLACE TABLE $t (x INT, y STRING) USING graft LOCATION '$dir/t'")
    assert(spark.table(t).count() === 0)
    assert(GraftTable.forPath(spark, s"$dir/t").snapshot.metadata.schema.fieldNames.toSeq
      === Seq("x", "y"))
    spark.sql(s"DROP TABLE $t")
  }
  test("DataFrameWriterV2: append, overwrite by filter, dynamic overwrite") {
    import org.apache.spark.sql.functions._
    val dir = tmpDir()
    val t = fresh("cat_wv2")
    spark.sql(s"CREATE TABLE $t (id BIGINT, p STRING) USING graft " +
      s"PARTITIONED BY (p) LOCATION '$dir/t'")
    try {
      spark.range(3).select(col("id"), lit("a").as("p")).writeTo(t).append()
      spark.range(3, 5).select(col("id"), lit("b").as("p")).writeTo(t).append()
      assert(spark.table(t).count() === 5)
      // overwrite by filter = transactional replaceWhere
      spark.range(10, 12).select(col("id"), lit("a").as("p"))
        .writeTo(t).overwrite(col("p") === "a")
      assert(spark.table(t).where(col("p") === "a").select("id")
        .as[Long].collect().sorted.toSeq === Seq(10L, 11L))
      assert(spark.table(t).where(col("p") === "b").count() === 2)
      // dynamic partition overwrite touches only partitions in the data
      spark.range(20, 21).select(col("id"), lit("b").as("p"))
        .writeTo(t).overwritePartitions()
      assert(spark.table(t).where(col("p") === "a").count() === 2)
      assert(spark.table(t).where(col("p") === "b").select("id")
        .as[Long].head === 20L)
      // every v2 write committed through the log
      val hist = GraftTable.forPath(spark, s"$dir/t").history()
      assert(hist.count() >= 5)
    } finally spark.sql(s"DROP TABLE $t")
  }

  test("spark.read.table with versionAsOf; readStream.table v1 fallback") {
    import org.apache.spark.sql.functions._
    val dir = tmpDir()
    val t = fresh("cat_ttv2")
    spark.sql(s"CREATE TABLE $t (id BIGINT) USING graft LOCATION '$dir/t'")
    try {
      spark.sql(s"INSERT INTO $t VALUES (1), (2)") // v1
      spark.sql(s"INSERT INTO $t VALUES (3)")      // v2
      assert(spark.read.option("versionAsOf", "1").table(t).count() === 2)
      assert(spark.read.table(t).count() === 3)
      // streaming from the NAMED table falls back to the DSv1 source
      val ckpt = tmpDir()
      val q = spark.readStream.table(t)
        .writeStream.format("memory").queryName("cat_ttv2_rows")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      assert(spark.table("cat_ttv2_rows").count() === 3)
    } finally spark.sql(s"DROP TABLE $t")
  }

}
