// Scale-factor ladder generator: replicate the driver's sf0.1 tables
// K times with key-space shifting so every join relationship survives
// (replica i shifts each key column by i * (max_key + 1) of its table).
// nation/region are fixed dimensions and copy through. Document text and
// embeddings get a per-replica perturbation so the dedup/ANN operators
// see a 10x corpus, not 10 exact copies of the same one.
//
// Usage:
//   /opt/spark/bin/spark-shell --master 'local[16]' \
//     --conf spark.ui.enabled=false \
//     --conf spark.sql.legacy.parquet.nanosAsLong=true \
//     -i tools/gen_sf.scala
// Env: SRC (default /root/testdata/sf0.1), DST (default /tmp/sf1),
//      K (default 10)
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

val src = sys.env.getOrElse("SRC", "/root/testdata/sf0.1")
val dst = sys.env.getOrElse("DST", "/tmp/sf1")
val k = sys.env.getOrElse("K", "10").toInt

def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")

def stride(df: DataFrame, col0: String): Long =
  df.agg(max(col(col0))).head.getLong(0) + 1L

def replicate(t: String, shifts: Map[String, Long],
    extra: (DataFrame, Int) => DataFrame = (d, _) => d): Unit = {
  val base = read(t)
  val out = (0 until k).map { i =>
    val shifted = shifts.foldLeft(base) { case (d, (c, s)) =>
      d.withColumn(c, col(c) + lit(i * s))
    }
    extra(shifted, i)
  }.reduce(_.unionByName(_))
  out.repartition(16).write.mode("overwrite").parquet(s"$dst/$t.parquet")
  println(s"GEN $t: ${spark.read.parquet(s"$dst/$t.parquet").count()} rows")
}

val sC = stride(read("customer"), "c_custkey")
val sS = stride(read("supplier"), "s_suppkey")
val sP = stride(read("part"), "p_partkey")
val sO = stride(read("orders"), "o_orderkey")
val sE = stride(read("events"), "event_id")
val sU = stride(read("events"), "user_id")
val sD = stride(read("documents"), "doc_id")
val sV = stride(read("embeddings"), "vec_id")

replicate("customer", Map("c_custkey" -> sC))
replicate("supplier", Map("s_suppkey" -> sS))
replicate("part", Map("p_partkey" -> sP))
replicate("orders", Map("o_orderkey" -> sO, "o_custkey" -> sC))
replicate("lineitem", Map("l_orderkey" -> sO, "l_partkey" -> sP, "l_suppkey" -> sS))
replicate("events", Map("event_id" -> sE, "user_id" -> sU))
// per-replica text suffix: replicas are near-dups, not byte-dups
replicate("documents", Map("doc_id" -> sD), (d, i) =>
  if (i == 0) d
  else d.withColumn("text", concat(col("text"), lit(s" r$i")))
    .withColumn("n_chars", col("n_chars") + lit(3 + (if (i >= 10) 1 else 0))))
// per-replica deterministic jitter on EVERY coordinate makes replica
// vectors genuinely distinct (a tiny one-coordinate nudge would flood
// the corpus with near-exact duplicates -- a degenerate shape that tells
// you nothing about scaling and breaks the capped/banded dedup oracles)
replicate("embeddings", Map("vec_id" -> sV), (d, i) =>
  if (i == 0) d
  else d.withColumn("embedding",
    transform(col("embedding"),
      // keep the element type float: bare arithmetic would widen the
      // whole array to double and break every Array[Float] consumer
      (x, j) => (x + pmod(j * 17 + lit(i * 31), lit(97)) / lit(485.0)
        - lit(0.1)).cast("float"))))
Seq("nation", "region").foreach { t =>
  read(t).write.mode("overwrite").parquet(s"$dst/$t.parquet")
  println(s"GEN $t: copied")
}
println("GEN done -> " + dst)
System.exit(0)
