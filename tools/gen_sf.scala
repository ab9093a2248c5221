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
// Per-replica text perturbation that keeps the TRUE near-dup pair count
// LINEAR in K: replica i replaces the token class (position = i mod 16)
// with a replica marker and appends one marker token (the append covers
// docs shorter than one class stride). Any two replicas of the same base
// doc then sit ~0.68 trigram-Jaccard apart -- below the 0.8 near-dup
// gate -- while pairs planted WITHIN a replica keep their original
// similarity (same positions, same marker on both sides). The earlier
// suffix-only scheme left replicas mutually >=0.8 similar, so a K-deep
// corpus made every unbounded pair-listing query's OUTPUT (and any
// engine's runtime) grow K^2: that benchmarks result size, not engine
// scaling. Always replicate from the BASE corpus with a larger K rather
// than chaining gen_sf runs -- chained perturbations compound and can
// re-collide (same class re-marked, jitters summing symmetrically).
replicate("documents", Map("doc_id" -> sD), (d, i) =>
  if (i == 0) d
  else {
    val toks = filter(split(col("text"), "\\s+"), t => length(t) > 0)
    val marked = transform(toks, (t, p) =>
      when(pmod(p, lit(16)) === lit(i % 16), lit(s"z$i")).otherwise(t))
    d.withColumn("text",
        concat_ws(" ", concat(marked, array(lit(s"z$i")))))
      .withColumn("n_chars", length(col("text")).cast("long"))
  })
// per-replica deterministic jitter on EVERY coordinate makes replica
// vectors genuinely distinct (a tiny one-coordinate nudge would flood
// the corpus with near-exact duplicates -- a degenerate shape that tells
// you nothing about scaling and breaks the capped/banded dedup oracles).
// Modulus 997 (prime) keeps i*31 distinct per replica up to K=997; the
// old mod-97 jitter collided replicas 97+ with replica 0.
replicate("embeddings", Map("vec_id" -> sV), (d, i) =>
  if (i == 0) d
  else d.withColumn("embedding",
    transform(col("embedding"),
      // keep the element type float: bare arithmetic would widen the
      // whole array to double and break every Array[Float] consumer
      (x, j) => (x + pmod(j * 17 + lit(i * 31), lit(997)) / lit(4985.0)
        - lit(0.1)).cast("float"))))
Seq("nation", "region").foreach { t =>
  read(t).write.mode("overwrite").parquet(s"$dst/$t.parquet")
  println(s"GEN $t: copied")
}
println("GEN done -> " + dst)
System.exit(0)
