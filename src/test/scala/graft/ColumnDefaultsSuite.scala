package graft

import java.nio.file.{Files => JFiles}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column DEFAULT values (`allowColumnDefaults` writer feature): fill on
  * omitted columns, provided values win, constant-expression validation,
  * SQL ALTER COLUMN SET/DROP DEFAULT and ADD COLUMN ... DEFAULT. */
class ColumnDefaultsSuite extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def tmpDir(): String = JFiles.createTempDirectory("graft-default").toString

  test("builder default fills omitted column; provided values win") {
    val dir = tmpDir()
    Graft.build(spark)
      .location(dir)
      .addColumn("id", LongType)
      .addColumn(Graft.columnBuilder("status")
        .dataType(StringType).defaultValue("'new'"))
      .execute()
    // omitted -> default
    Graft.write(spark.range(3).toDF("id"), dir)
    // provided -> provided wins (even null)
    Graft.write(Seq((100L, "done"), (101L, null.asInstanceOf[String]))
      .toDF("id", "status"), dir)
    val rows = Graft.read(spark, dir).orderBy("id")
      .as[(Long, Option[String])].collect().toSeq
    assert(rows === Seq((0L, Some("new")), (1L, Some("new")), (2L, Some("new")),
      (100L, Some("done")), (101L, None)))
    // the writer feature is active in the protocol
    val p = GraftTable.forPath(spark, dir).snapshot.protocol
    assert(p.writerFeatures.exists(_.contains("allowColumnDefaults")),
      s"expected allowColumnDefaults in $p")
  }

  test("SQL SET DEFAULT / DROP DEFAULT on an existing table") {
    val dir = tmpDir()
    Graft.write(spark.range(2).select($"id", lit("x").as("tag")), dir)
    spark.sql(s"ALTER TABLE graft.`$dir` ALTER COLUMN tag SET DEFAULT 'filled'")
    Graft.write(spark.range(10, 12).toDF("id"), dir)
    val afterSet = Graft.read(spark, dir).filter($"id" >= 10)
      .select("tag").as[String].collect().toSeq
    assert(afterSet === Seq("filled", "filled"))
    spark.sql(s"ALTER TABLE graft.`$dir` ALTER COLUMN tag DROP DEFAULT")
    Graft.write(spark.range(20, 21).toDF("id"), dir)
    val afterDrop = Graft.read(spark, dir).filter($"id" === 20)
      .select("tag").as[Option[String]].collect().toSeq
    assert(afterDrop === Seq(None))
  }

  test("SQL ADD COLUMN with DEFAULT null-fills old rows, defaults new ones") {
    val dir = tmpDir()
    Graft.write(spark.range(3).toDF("id"), dir)
    spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMN score INT DEFAULT 42")
    // pre-existing rows read as null (metadata-only add, like the reference)
    val old = Graft.read(spark, dir).select("score").as[Option[Int]]
      .collect().toSeq
    assert(old === Seq(None, None, None))
    Graft.write(spark.range(10, 12).toDF("id"), dir)
    val nw = Graft.read(spark, dir).filter($"id" >= 10)
      .select("score").as[Option[Int]].collect().toSeq
    assert(nw === Seq(Some(42), Some(42)))
  }

  test("non-constant or ill-typed DEFAULT is rejected") {
    val dir = tmpDir()
    Graft.write(spark.range(2).select($"id", lit(1.0).as("v")), dir)
    val tbl = GraftTable.forPath(spark, dir)
    intercept[IllegalArgumentException] {
      tbl.alterColumnDefault("v", Some("id + 1")) // column reference
    }
    intercept[IllegalArgumentException] {
      tbl.alterColumnDefault("nope", Some("1")) // unknown column
    }
    // constant function expressions are fine
    tbl.alterColumnDefault("v", Some("1.5 * 2"))
    Graft.write(spark.range(5, 6).toDF("id"), dir)
    assert(Graft.read(spark, dir).filter($"id" === 5)
      .select("v").as[Double].head() === 3.0)
  }

  test("generated/identity columns cannot also carry a DEFAULT") {
    val dir = tmpDir()
    Graft.build(spark)
      .location(dir)
      .addColumn("id", LongType)
      .addColumn(Graft.columnBuilder("twice")
        .dataType(LongType).generatedAlwaysAs("id * 2"))
      .execute()
    val tbl = GraftTable.forPath(spark, dir)
    intercept[IllegalArgumentException] {
      tbl.alterColumnDefault("twice", Some("0"))
    }
  }
}
