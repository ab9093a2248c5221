package graft

import org.apache.spark.sql.functions._

/**
 * One-shot generator for the frozen log-format compatibility fixtures
 * under `src/test/resources/compat` (reference concept:
 * EvolvabilitySuite's committed old-version tables — re-designed). Run
 * with `sbt "Test/runMain graft.CompatFixturesGen"` ONLY when
 * intentionally refreshing the corpus; [[CompatSuite]] cold-reads the
 * committed artifacts forever, so an accidental serialization change
 * fails CI instead of silently orphaning every existing table.
 */
object CompatFixturesGen {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("src/test/resources/compat")
    val spark = TestSpark.spark
    import spark.implicits._

    def fresh(name: String): String = {
      val d = new java.io.File(out, name)
      require(!d.exists,
        s"$d already exists — delete it first if you really mean to regenerate")
      d.toString
    }

    // 1. basic: append + delete-rewrite + append, classic checkpoint + crc
    val basic = fresh("basic")
    Graft.write(spark.range(100).select($"id", ($"id" % 7).as("k"))
      .repartition(1), basic,
      configuration = Map("graft.checkpointInterval" -> "2"))
    GraftTable.forPath(spark, basic).delete(expr("id % 10 = 0"))
    Graft.write(spark.range(100, 120).select($"id", ($"id" % 7).as("k"))
      .repartition(1), basic)

    // 2. v2cp: v2 sidecar-bucketed checkpoint policy
    val v2 = fresh("v2cp")
    Graft.write(spark.range(50).toDF("id").repartition(1), v2,
      configuration = Map(
        "graft.checkpointPolicy" -> "v2",
        "graft.checkpointNumSidecars" -> "4",
        "graft.checkpointInterval" -> "2"))
    Graft.write(spark.range(50, 80).toDF("id").repartition(1), v2)
    Graft.write(spark.range(80, 90).toDF("id").repartition(1), v2)

    // 3. dv: deletion vectors + change data feed
    val dv = fresh("dv")
    Graft.write(spark.range(60).select($"id", ($"id" * 2).as("v"))
      .repartition(1), dv,
      configuration = Map(
        "graft.enableDeletionVectors" -> "true",
        "graft.enableChangeDataFeed" -> "true"))
    GraftTable.forPath(spark, dv).delete($"id" < 15)

    // 4. mapped: column mapping (name mode) + rename + column DEFAULT
    val mapped = fresh("mapped")
    Graft.create(spark, mapped, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      graft.schema.ColumnDefaults.defaultField("src",
        org.apache.spark.sql.types.StringType, "'web'"))),
      configuration = Map("graft.columnMapping.mode" -> "name"))
    Graft.write(spark.range(40).toDF("id"), mapped)
    GraftTable.forPath(spark, mapped).renameColumn("src", "origin")
    Graft.write(spark.range(40, 50).select($"id", lit("api").as("origin")),
      mapped)

    println(s"compat fixtures written under $out")
    spark.stop()
  }
}
