package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.log.GraftLog

/**
 * Collated string columns: schema round trip (the collation rides in the
 * schema JSON's __COLLATIONS metadata), the writer-gating `collations`
 * table feature, collation-correct DML semantics, and the stats-skipping
 * refusal that keeps byte-ordered min/max from pruning collated matches.
 * (Reference concept: the collations table feature.)
 */
class CollationSuite extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(): String = Files.createTempDirectory("graft-coll").toString

  private def collatedDf = spark.range(100).selectExpr(
    "id",
    // mixed-case values; equality under UTF8_LCASE ignores case
    "collate(concat(CASE WHEN id % 2 = 0 THEN 'A' ELSE 'a' END, " +
      "CAST(id % 10 AS STRING)), 'UTF8_LCASE') AS s")

  test("collated column survives the log schema round trip") {
    val dir = tmp()
    Graft.write(collatedDf, dir)
    val back = Graft.read(spark, dir)
    val st = back.schema("s").dataType
    assert(st != org.apache.spark.sql.types.StringType &&
      st.isInstanceOf[org.apache.spark.sql.types.StringType],
      s"collation lost: $st")
    // case-insensitive equality: 'a7' matches both 'A7' and 'a7'
    assert(back.where("s = collate('a7', 'UTF8_LCASE')").count() === 10)
    // case-insensitive grouping: 10 groups, not 20
    assert(back.groupBy("s").count().count() === 10)
  }

  test("collated schema raises the collations writer feature") {
    val dir = tmp()
    Graft.write(collatedDf, dir)
    val proto = GraftLog.forTable(spark, dir).update().protocol
    assert(proto.writerFeatureNames.contains("collations"), proto)
    // reader-safe: no reader gate beyond the vector version itself
    assert(!proto.readerFeatureNames.contains("collations"))
    val plain = tmp()
    Graft.write(spark.range(5).selectExpr("id", "CAST(id AS STRING) AS s"), plain)
    val plainProto = GraftLog.forTable(spark, plain).update().protocol
    assert(!plainProto.writerFeatureNames.contains("collations"))
  }

  test("DML honors collation semantics end to end") {
    val dir = tmp()
    Graft.write(collatedDf, dir)
    // case-insensitive DELETE removes BOTH 'A3' and 'a3' rows
    GraftTable.forPath(spark, dir).delete(
      col("s") === expr("collate('a3', 'UTF8_LCASE')"))
    assert(Graft.read(spark, dir).count() === 90)
    assert(Graft.read(spark, dir)
      .where("lower(CAST(s AS STRING COLLATE UTF8_BINARY)) = 'a3'")
      .count() === 0)
    // case-insensitive MERGE key: source 'aN' matches target 'AN'
    val src = spark.range(4).selectExpr(
      "collate(concat('a', CAST(id AS STRING)), 'UTF8_LCASE') AS s",
      "999L AS mark")
    val tgt = GraftTable.forPath(spark, dir)
    tgt.toDF // force schema
    GraftTable.forPath(spark, dir)
      .merge(src.selectExpr("s AS key", "mark"), expr("t.s = s.key"))
      .whenMatched().updateExpr(Map("id" -> "s.mark"))
      .execute()
    // ids 0,1,2 (x2 case variants each, 10 rows per digit minus nothing)
    val marked = Graft.read(spark, dir).where("id = 999").count()
    assert(marked === 30, s"collated merge matched $marked rows") // digits 0,1,2 (3 was deleted): 3 digits x 10 rows
  }

  test("stats skipping never prunes on a collated column") {
    val dir = tmp()
    // two files with disjoint byte ranges of MIXED case: byte-ordered
    // min/max would wrongly prune lowercase probes on an uppercase file
    Graft.write(spark.range(50).selectExpr(
      "id", "collate(concat('A', CAST(id AS STRING)), 'UTF8_LCASE') AS s")
      .repartition(1), dir)
    Graft.write(spark.range(50, 100).selectExpr(
      "id", "collate(concat('a', CAST(id AS STRING)), 'UTF8_LCASE') AS s")
      .repartition(1), dir)
    val hits = Graft.read(spark, dir)
      .where("s = collate('A63', 'UTF8_LCASE')")
    // 'A63' byte-compares below 'a...' mins; collation-blind skipping
    // would drop the second file and lose the real match 'a63'
    assert(hits.count() === 1)
    assert(hits.select("id").head.getLong(0) === 63L)
  }
}
