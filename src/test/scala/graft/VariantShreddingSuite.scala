package graft

import java.nio.file.{Files => JFiles}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** variantShredding feature: variant columns physically shred into typed
  * parquet sub-columns on write; reads reassemble; the reader-gating
  * feature installs. */
class VariantShreddingSuite extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(): String =
    JFiles.createTempDirectory("graft-shred").toString

  private def footerSchema(dir: String): String = {
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val in = HadoopInputFile.fromPath(new Path(f.getPath), new Configuration())
    val r = ParquetFileReader.open(in)
    try r.getFooter.getFileMetaData.getSchema.toString finally r.close()
  }

  private def variantDf(n: Int) = spark.range(n)
    .select($"id", parse_json(concat(
      lit("""{"k":"v"""), $"id", lit("""","n":"""), $"id", lit("}")))
      .as("payload"))

  test("shredded write: typed sub-columns in the footer, exact read-back") {
    val dir = tmpDir()
    Graft.write(variantDf(100), dir,
      configuration = Map("graft.enableVariantShredding" -> "true"))
    val snap = GraftTable.forPath(spark, dir).snapshot
    assert(snap.protocol.readerFeatures.exists(_.contains("variantShredding")),
      s"expected variantShredding reader feature in ${snap.protocol}")
    val schema = footerSchema(dir)
    assert(schema.contains("typed_value"),
      s"footer shows no shredded typed_value columns:\n$schema")
    val got = Graft.read(spark, dir)
      .select($"id",
        variant_get($"payload", "$.n", "long").as("n"),
        variant_get($"payload", "$.k", "string").as("k"))
      .orderBy("id").as[(Long, Long, String)].collect()
    assert(got.length === 100)
    got.foreach { case (id, n, k) => assert(n === id && k === s"v$id") }
  }

  test("without the property, writes stay unshredded") {
    val dir = tmpDir()
    Graft.write(variantDf(10), dir)
    val snap = GraftTable.forPath(spark, dir).snapshot
    assert(!snap.protocol.readerFeatures.exists(_.contains("variantShredding")))
    assert(snap.protocol.readerFeatures.exists(_.contains("variantType")))
    assert(!footerSchema(dir).contains("typed_value"))
    assert(Graft.read(spark, dir).count() === 10)
  }
}
