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
// Replica i's events shift into their own disjoint 31-day window: a K-x
// corpus models K months of history at the BASE event density, which is
// how real traffic grows. Replicating timestamps in place instead
// multiplies density K-fold, and every time-band workload (clicks
// within 1h of a purchase, session windows) then does K^2 the pair work
// of the base corpus -- true quadratic OUTPUT growth that benchmarks the
// degenerate corpus, not the engine.
replicate("events", Map("event_id" -> sE, "user_id" -> sU), (d, i) =>
  if (i == 0) d
  else d.withColumn("ts", expr(s"ts + INTERVAL ${i * 31} DAYS")))
// Replica i's document text tags EVERY token with a replica prefix
// (empty docs get a lone marker token so they too stay distinct across
// replicas): within a replica, all planted structure -- exact dups,
// near-dup pairs, duplicated substrings -- survives verbatim (both
// sides transform identically, and no extra token is appended, so even
// a pair sitting exactly at the J=0.8 boundary keeps its Jaccard),
// while ACROSS replicas documents share no token and no
// shingle. That keeps the true pair count of every unbounded
// pair-listing operator linear in K. Anything softer does not: replicas
// at 0.68 trigram-Jaccard (6% token replacement) still flood permissive
// LSH gates (r=2 minhash bands pass J=0.68 with p~1.0; unigram simhash
// stays within hamming<=3), so candidate volume -- and any engine's
// runtime -- grows K^2. Always replicate from the BASE corpus with a
// larger K rather than chaining gen_sf runs: chained perturbations
// compound unpredictably.
replicate("documents", Map("doc_id" -> sD), (d, i) =>
  if (i == 0) d
  else {
    val toks = filter(split(col("text"), "\\s+"), t => length(t) > 0)
    val tagged = transform(toks, t => concat(lit(s"g$i~"), t))
    d.withColumn("text",
        concat_ws(" ",
          when(size(tagged) > 0, tagged).otherwise(array(lit(s"g$i~")))))
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
