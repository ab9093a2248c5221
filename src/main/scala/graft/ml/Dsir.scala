package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/**
 * DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
 * "Data Selection for Language Models via Importance Resampling"): score
 * every raw document by how much more likely its n-gram features are
 * under a TARGET distribution (a trusted/high-quality slice) than under
 * the raw corpus, then keep the top of the weight distribution. The
 * standard pre-training data-selection pass alongside perplexity
 * filtering ([[graft.text.NgramLm]]) — where the LM scores fluency
 * against one reference, DSIR scores the LIKELIHOOD RATIO between two
 * corpora, which is what importance resampling needs.
 *
 * Features are unigrams + bigrams of whitespace tokens over
 * `lower(text)` (the paper's feature map), in two venues:
 *
 *  - [[importanceWeights]]: EXACT gram-level ratios. Count tables are
 *    distinct-gram-sized distributed aggregates (map-side combined);
 *    scoring is a shuffle join on the gram string. Fully deterministic
 *    and SQL-expressible (the oracle path).
 *  - [[importanceWeightsHashed]]: the paper's hashed variant — grams
 *    bucket by `xxhash64 mod B`, the two count vectors collapse to a
 *    B-sized log-ratio array BROADCAST to executors, and each document
 *    scores in ONE codegen kernel pass (zero shuffle, zero explode).
 *    The 100 TB path: B = 65536 doubles = 512 KB resident per executor,
 *    scoring cost linear in corpus tokens with no join at all.
 *
 * Smoothing: Laplace(alpha) over the feature space (union vocabulary V
 * for the exact path, B buckets for the hashed path):
 *   log w(x) = sum_g c_x(g) * [ log (c_t(g)+a)/(T+aV) - log (c_r(g)+a)/(R+aV) ]
 * Grams absent from both corpora contribute the constant
 * log (R+aV)/(T+aV) per occurrence (can only happen when scoring
 * documents outside `raw`).
 */
object Dsir {

  private def toks(text: Column): Column = TextFunctions.tokens(lower(text))

  /** Unigram + bigram feature stream, one array per document. */
  private[ml] def features(text: Column): Column = {
    val tk = toks(text)
    val bigrams = when(size(tk) >= 2,
      zip_with(slice(tk, lit(1), size(tk) - 1), slice(tk, lit(2), size(tk) - 1),
        (a, b) => concat_ws(" ", a, b)))
      .otherwise(array().cast("array<string>"))
    concat(tk, bigrams)
  }

  /**
   * Exact-gram importance weights: (doc_id, n_feats, log_weight).
   * `target` and `raw` provide the two count distributions; `df` is the
   * corpus being scored (typically `raw` itself). One aggregate per
   * distribution plus one scoring join — the NgramLm shape; shuffle
   * volume is bounded by distinct-gram counts, not corpus tokens, and a
   * hot gram skews only the probe side (AQE skew split applies).
   */
  def importanceWeights(
      df: DataFrame,
      id: Column,
      text: Column,
      target: DataFrame,
      targetText: Column,
      raw: DataFrame,
      rawText: Column,
      alpha: Double = 1.0): DataFrame = {
    require(alpha > 0, "alpha must be positive")
    def counts(src: DataFrame, t: Column): DataFrame =
      src.select(explode(features(t)).as("g"))
        .groupBy("g").agg(count(lit(1)).as("c"))
    val ct = counts(target, targetText)
    val cr = counts(raw, rawText)
    // three scalars: totals and the union vocabulary size. One tiny job;
    // the driver holds three longs.
    val joinedCounts = ct.select(col("g"), col("c").as("ct"))
      .join(cr.select(col("g"), col("c").as("cr")), Seq("g"), "full_outer")
    val Array(tTot, rTot, vocab) = joinedCounts.agg(
        sum(coalesce(col("ct"), lit(0L))),
        sum(coalesce(col("cr"), lit(0L))),
        count(lit(1)))
      .collect()(0).toSeq.map(v => v.asInstanceOf[Long]).toArray
    val ratios = joinedCounts.select(col("g"),
      (log((coalesce(col("ct"), lit(0L)) + alpha) / (tTot + alpha * vocab)) -
        log((coalesce(col("cr"), lit(0L)) + alpha) / (rTot + alpha * vocab)))
        .as("lr"))
    val unseen = math.log((alpha / (tTot + alpha * vocab)) /
      (alpha / (rTot + alpha * vocab)))
    df.select(id.as("doc_id"), explode(features(text)).as("g"))
      .join(ratios, Seq("g"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"),
        sum(coalesce(col("lr"), lit(unseen))).as("log_weight"))
  }

  /**
   * Hashed-bucket importance weights (the paper's estimator): grams
   * bucket by `xxhash64(g) mod buckets`; the per-bucket log ratios
   * broadcast as one double array and every document scores in a single
   * kernel pass. Returns (doc_id, n_feats, log_weight).
   */
  def importanceWeightsHashed(
      df: DataFrame,
      id: Column,
      text: Column,
      target: DataFrame,
      targetText: Column,
      raw: DataFrame,
      rawText: Column,
      buckets: Int = 65536,
      alpha: Double = 1.0): DataFrame = {
    require(buckets > 0 && alpha > 0)
    import org.apache.spark.sql.graftshim.SparkShims
    val spark = df.sparkSession
    // Count vectors build through the SAME kernel feature map that
    // scores documents (bucket ids per doc -> explode -> map-side
    // combined count); only `buckets` rows reach the driver.
    def bucketCounts(src: DataFrame, t: Column): Array[Long] = {
      val rows = src.select(explode(SparkShims.column(
          graft.expressions.NgramBucketIds(
            SparkShims.expression(lower(t)), buckets))).as("b"))
        .groupBy("b").agg(count(lit(1)).as("c"))
        .collect()
      val arr = new Array[Long](buckets)
      rows.foreach(r => arr(r.getInt(0)) = r.getLong(1))
      arr
    }
    val ct = bucketCounts(target, targetText)
    val cr = bucketCounts(raw, rawText)
    val tTot = ct.sum; val rTot = cr.sum
    val lr = new Array[Double](buckets)
    var i = 0
    while (i < buckets) {
      lr(i) = math.log((ct(i) + alpha) / (tTot + alpha * buckets)) -
        math.log((cr(i) + alpha) / (rTot + alpha * buckets))
      i += 1
    }
    val bc = spark.sparkContext.broadcast(lr)
    df.select(id.as("doc_id"),
      SparkShims.column(graft.expressions.HashedNgramScore(
        SparkShims.expression(lower(text)), bc)).as("__s"))
      .select(col("doc_id"),
        col("__s.n_feats").as("n_feats"),
        col("__s.log_weight").as("log_weight"))
  }

  /**
   * Importance RESAMPLING, deterministically: keep the documents whose
   * Gumbel-perturbed log weight clears the corpus' `keepFrac` quantile —
   * the paper's top-k-of-(log w + Gumbel noise) selection with seeded,
   * reproducible noise (hash-derived uniforms, so re-running selects the
   * same set). One approxQuantile sketch pass; no global sort.
   */
  def resample(
      scored: DataFrame,
      id: Column,
      logWeight: Column,
      keepFrac: Double,
      seed: Long = 0L): DataFrame = {
    require(keepFrac > 0 && keepFrac < 1, "need 0 < keepFrac < 1")
    // uniform in (0,1) from the 64-bit hash: strictly positive so the
    // double log never sees 0
    val u = (pmod(xxhash64(id, lit(seed)), lit(1L << 52)).cast("double") +
      lit(0.5)) / lit((1L << 52).toDouble)
    val g = -log(-log(u))
    val perturbed = scored.withColumn("__g", logWeight + g)
    val Array(cut) =
      perturbed.stat.approxQuantile("__g", Array(1.0 - keepFrac), 0.0001)
    perturbed.where(col("__g") >= cut).drop("__g")
  }
}
