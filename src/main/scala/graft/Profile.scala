package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-by-stage profiler (manual; not part of driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.eventLog.enabled", "true")
      .config("spark.eventLog.dir", "/tmp/sparkevents")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val perturbed = d.select((col("doc_id") + 100000).as("doc_id"),
      concat(col("text"), lit(" q")).as("text"))
    val all = d.select("doc_id", "text").unionByName(perturbed)
    all.cache(); all.count()
    time("warm")(ml.Dedup.minHashSignatures(all, col("doc_id"), col("text"), 8, 3).count())
    spark.sparkContext.setJobGroup("NGRAM", "ngram")
    time("ngramJaccardPairs")(
      ml.Dedup.ngramJaccardPairs(all, col("doc_id"), col("text"), n = 3, threshold = 0.8).count())
    spark.stop()
  }
}
