package graft

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
}
