package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class TypeWideningSuite extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def tmpDir(): String = Files.createTempDirectory("graft-tw").toString

  test("int->long: old int files read as long, new long appends mix in") {
    val dir = tmpDir()
    Graft.write(spark.range(10).select($"id".cast("int").as("k"),
      ($"id" * 2).cast("int").as("v")), dir)
    GraftTable.forPath(spark, dir).alterColumnType("v", LongType)
    assert(Graft.read(spark, dir).schema("v").dataType === LongType)
    Graft.write(spark.range(10, 13).select($"id".cast("int").as("k"),
      lit(5000000000L).as("v")), dir)
    val out = Graft.read(spark, dir)
    assert(out.count() === 13)
    assert(out.agg(max($"v")).head.getLong(0) === 5000000000L)
    assert(out.agg(sum($"v")).head.getLong(0) === 90L + 3 * 5000000000L)
    // predicate over the widened column still scans both file generations
    assert(out.filter($"v" >= 4L).count() === 11)
  }

  test("float->double and int->double widenings") {
    val dir = tmpDir()
    Graft.write(spark.range(5).select($"id".cast("int").as("a"),
      ($"id" / 2.0).cast("float").as("f")), dir)
    val tbl = GraftTable.forPath(spark, dir)
    tbl.alterColumnType("f", DoubleType)
    tbl.alterColumnType("a", DoubleType)
    val out = Graft.read(spark, dir)
    assert(out.schema("f").dataType === DoubleType)
    assert(out.schema("a").dataType === DoubleType)
    assert(out.agg(sum($"a")).head.getDouble(0) === 10.0)
  }

  test("narrowing and partition columns are rejected") {
    val dir = tmpDir()
    Graft.write(spark.range(5).select($"id".cast("long").as("k"),
      ($"id" % 2).cast("int").as("p")), dir, partitionBy = Seq("p"))
    val tbl = GraftTable.forPath(spark, dir)
    intercept[IllegalArgumentException](tbl.alterColumnType("k", IntegerType))
    intercept[IllegalArgumentException](tbl.alterColumnType("p", LongType))
  }

  test("SQL ALTER COLUMN TYPE routes through the log") {
    val dir = tmpDir()
    Graft.write(spark.range(6).select($"id".cast("int").as("x")), dir)
    spark.sql(s"ALTER TABLE graft.`$dir` ALTER COLUMN x TYPE BIGINT")
    assert(GraftTable.forPath(spark, dir).snapshot.metadata.schema("x").dataType
      === LongType)
    assert(Graft.read(spark, dir).agg(sum($"x")).head.getLong(0) === 15L)
  }
}
