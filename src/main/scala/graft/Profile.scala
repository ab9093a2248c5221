package graft

import org.apache.spark.sql.SparkSession

/** Scratch cold/warm profiler for SparkEntry queries (manual; not part of
  * the driver contract). Runs each named query twice in one JVM so the
  * steady-state (warm) cost separates from one-time codegen/planning. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names =
      if (args.nonEmpty) args.toSeq
      else sys.env.getOrElse("SPARK_GRAFT_PROFILE",
        "dedup_minhash_lsh").split(",").map(_.trim).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.sql.GraftSparkSessionExtension")
      .config("spark.sql.catalog.spark_catalog", "graft.catalog.GraftCatalog")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n =>
      val cold = run(n); val warm = run(n); val warm2 = run(n)
      println(f"[profile] $n%-28s cold=$cold%7.3f warm=$warm%7.3f warm2=$warm2%7.3f")
    }
    spark.stop()
  }
}
