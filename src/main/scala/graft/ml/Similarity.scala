package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.SparkShims

import graft.expressions.{CosineSimilarity, HyperplaneBucket}

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (`array<float>`):
 *
 *  - brute-force: broadcast the (small) query set, one pass over the
 *    corpus, per-query top-k via window rank — the exact baseline
 *  - LSH path: random-hyperplane sign buckets + 1-bit multi-probe;
 *    the bucket-join restricts candidates so the corpus is never
 *    cross-joined — the 100 TB-scale path
 *
 * The scoring kernels are custom codegen Expressions
 * ([[graft.expressions.CosineSimilarity]] /
 * [[graft.expressions.HyperplaneBucket]]): the earlier
 * `aggregate`/`zip_with` higher-order-function forms are CodegenFallback
 * and ran interpreted per candidate pair.
 */
object Similarity {

  val defaultSeed = 42L

  def cosine(a: Column, b: Column): Column =
    SparkShims.column(
      CosineSimilarity(SparkShims.expression(a), SparkShims.expression(b)))

  /** Sign-bit bucket over `planes` hyperplanes (a coarse quantizer). */
  def hyperplaneBucket(emb: Column, planes: Int, seed: Long = defaultSeed): Column =
    SparkShims.column(
      HyperplaneBucket(SparkShims.expression(emb), planes, seed))

  /** The bucket plus its `planes` 1-bit neighbors — multi-probe: a vector
    * whose true neighbors straddle one hyperplane is still found. */
  def probeBuckets(bucket: Column, planes: Int): Column =
    array((bucket +: (0 until planes).map(p =>
      bucket.bitwiseXOR(lit(1L << p)))): _*)

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
   * IVF-Flat approximate top-k: a coarse quantizer of `nlist` centroids
   * (a deterministic hash-ordered sample of the corpus — k-means
   * assignment without the iterations), the corpus partitioned by
   * nearest centroid, and each query probing its `nprobe` nearest
   * centroid lists. Data-adaptive alternative to the hyperplane LSH
   * buckets: list sizes follow the data distribution, so clustered
   * corpora don't collapse into a few hot hyperplane cells. Assignment
   * is one codegen'd argmax kernel over the broadcast centroid matrix
   * ([[graft.expressions.NearestCentroids]]) — O(nlist * dim) per row,
   * the same cost real IVF pays, with a constant-size plan at any nlist.
   */
  def ivfTopK(
      corpus: DataFrame,
      corpusId: Column,
      corpusEmb: Column,
      queries: DataFrame,
      queryId: Column,
      queryEmb: Column,
      k: Int,
      nlist: Int = -1,
      nprobe: Int = -1): DataFrame = {
    // Centroid collection and the argmax kernel read float elements;
    // double-typed embedding columns narrow here instead of crashing.
    // Null embeddings are routine in curation pipelines (failed encoder
    // rows); without the guard one in the centroid sample NPEs
    // CentroidMatrix.build on the driver (kMeans carries the same guard).
    val base = corpus.select(corpusId.as("cid"),
      corpusEmb.cast("array<float>").as("cemb"))
      .where(col("cemb").isNotNull)
    // Auto-tuning (when not pinned): nlist ~ sqrt(n) keeps list size and
    // centroid-scan cost balanced; probing nlist/4 lists holds recall as
    // the corpus grows. One count job, amortized over the search.
    val nlist0 =
      if (nlist > 0) nlist
      else math.max(4, math.ceil(math.sqrt(base.count().toDouble)).toInt)
    val nprobe0 = if (nprobe > 0) nprobe else math.max(4, nlist0 / 4)
    val centroids: Array[Seq[Float]] = base
      .select(col("cemb"), xxhash64(col("cid")).as("__r"))
      .orderBy("__r").limit(nlist0)
      .collect().map(_.getSeq[Float](0))
    // ONE codegen kernel looping over the broadcast matrix — a plan node
    // of constant size at any nlist (the earlier greatest-of-nlist-structs
    // form blew up codegen past a few thousand centroids).
    val matrixBc = corpus.sparkSession.sparkContext.broadcast(
      graft.expressions.CentroidMatrix.build(centroids))
    def nearestLists(emb: Column, probes: Int): Column =
      SparkShims.column(graft.expressions.NearestCentroids(
        SparkShims.expression(emb), matrixBc, probes))
    val c = base.withColumn("list", element_at(nearestLists(col("cemb"), 1), 1))
    val probes = math.min(nprobe0, centroids.length)
    val q = queries.select(queryId.as("qid"),
        queryEmb.cast("array<float>").as("qemb"))
      .withColumn("list", explode(nearestLists(col("qemb"), probes)))
    val scored = c.join(broadcast(q), "list")
      .select(col("qid"), col("cid"), cosine(col("qemb"), col("cemb")).as("score"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /**
   * LSH-bucketed approximate top-k: each query probes its own bucket and
   * the `planes` 1-bit neighbors; candidates are the union of those
   * buckets' corpus slices. Each (query, corpus) pair can match at most
   * one probe (a corpus row has exactly one bucket), so no dedup pass.
   */
  def lshTopK(
      corpus: DataFrame,
      corpusId: Column,
      corpusEmb: Column,
      queries: DataFrame,
      queryId: Column,
      queryEmb: Column,
      k: Int,
      planes: Int = -1,
      seed: Long = defaultSeed): DataFrame = {
    val base = corpus.select(corpusId.as("cid"), corpusEmb.as("cemb"))
    // Auto-tuning (when not pinned): pick planes so a bucket holds
    // ~max(8, 2k) vectors — enough candidates per probe for a top-k
    // answer; more planes than that trades recall for nothing here.
    val planes0 =
      if (planes > 0) planes
      else {
        val n = base.count().toDouble
        math.max(2, math.min(20,
          (math.log(n / math.max(8, 2 * k)) / math.log(2)).floor.toInt))
      }
    val c = base.withColumn("bucket",
      hyperplaneBucket(col("cemb"), planes0, seed))
    val q = queries
      .select(queryId.as("qid"), queryEmb.as("qemb"),
        hyperplaneBucket(queryEmb, planes0, seed).as("b0"))
      .select(col("qid"), col("qemb"),
        explode(probeBuckets(col("b0"), planes0)).as("bucket"))
    val scored = c.join(broadcast(q), "bucket")
      .select(col("qid"), col("cid"), cosine(col("qemb"), col("cemb")).as("score"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }
}
