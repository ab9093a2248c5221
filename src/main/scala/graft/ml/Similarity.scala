package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (`array<float>`), built from higher-order functions (codegen'd, no
 * UDFs):
 *
 *  - brute-force: broadcast the (small) query set, one pass over the
 *    corpus, per-query top-k via window rank — the exact baseline
 *  - LSH path: random-hyperplane sign buckets computed from a
 *    deterministic seed; bucket-join restricts candidates so the corpus
 *    is never cross-joined — the 100 TB-scale path
 */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d > 0, dot(a, b) / d).otherwise(lit(0.0))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * hash -> uniform in [-1, 1). */
  private def planeComponent(plane: Int, dim: Column): Column =
    (pmod(xxhash64(lit(plane), dim), lit(1000000L)).cast("double") / 500000.0) - 1.0

  /** Sign-bit bucket over `planes` hyperplanes (a coarse quantizer). */
  def hyperplaneBucket(emb: Column, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(emb, sequence(lit(0), size(emb) - 1),
          (v, i) => v * planeComponent(p, i)),
        lit(0.0d), (acc, v) => acc + v)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /**
   * Exact top-k cosine neighbors for each query. The query set is
   * broadcast; the corpus streams through one projection + one
   * partial-topk shuffle.
   */
  def bruteForceTopK(
      corpus: DataFrame,
      corpusId: Column,
      corpusEmb: Column,
      queries: DataFrame,
      queryId: Column,
      queryEmb: Column,
      k: Int): DataFrame = {
    val c = corpus.select(corpusId.as("cid"), corpusEmb.as("cemb"))
    val q = queries.select(queryId.as("qid"), queryEmb.as("qemb"))
    val scored = c.crossJoin(broadcast(q))
      .select(col("qid"), col("cid"), cosine(col("qemb"), col("cemb")).as("score"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /**
   * LSH-bucketed approximate top-k: queries join only their bucket's
   * corpus slice. Recall trades off with `planes`; multi-probe can be
   * added by exploding neighbor buckets.
   */
  def lshTopK(
      corpus: DataFrame,
      corpusId: Column,
      corpusEmb: Column,
      queries: DataFrame,
      queryId: Column,
      queryEmb: Column,
      k: Int,
      planes: Int = 8): DataFrame = {
    val c = corpus.select(corpusId.as("cid"), corpusEmb.as("cemb"),
      hyperplaneBucket(corpusEmb, planes).as("bucket"))
    val q = queries.select(queryId.as("qid"), queryEmb.as("qemb"),
      hyperplaneBucket(queryEmb, planes).as("bucket"))
    val scored = c.join(broadcast(q), "bucket")
      .select(col("qid"), col("cid"), cosine(col("qemb"), col("cemb")).as("score"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }
}
