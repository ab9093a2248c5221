package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * CCNet-style n-gram language-model scoring (Wenzek et al. 2020,
 * "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
 * Data"): train a smoothed bigram LM on a trusted reference slice, score
 * every document by cross-entropy under that model, and bucket the corpus
 * into head/middle/tail quality tiers. The canonical pre-training corpus
 * filter (CCNet, Gopher, LLaMA, FineWeb all gate on LM perplexity).
 *
 * Model: Laplace-smoothed bigram over whitespace tokens of
 * `lower(text)` — P(w|v) = (c(v,w) + 1) / (c(v) + V), with c(·) counts
 * from the training slice and V its unigram vocabulary size. Documents
 * score as the mean negative log-probability over their bigrams
 * (cross-entropy in nats); perplexity = exp(cross-entropy). Fully
 * deterministic from the formula — no RNG, no floats in the model itself.
 *
 * Scale shape: training is two explode+groupBy aggregates (one shuffle
 * each, map-side combined — shuffle volume is the DISTINCT gram count,
 * not corpus tokens). Scoring is two shuffle hash joins keyed on the
 * gram/prefix strings against the count tables; a hot bigram ("of the")
 * skews only the probe side, which AQE's skew-join splitting handles.
 * Nothing collects to the driver except the scalar vocabulary size.
 */
object NgramLm {

  /** Distributed model state: count tables stay Datasets (persisted —
    * training aggregates run once, not once per downstream join). */
  final case class Model(unigrams: DataFrame, bigrams: DataFrame, vocab: Long) {
    def unpersist(): Unit = { unigrams.unpersist(); bigrams.unpersist() }
  }

  private def toks(text: Column): Column = TextFunctions.tokens(lower(text))

  /** Adjacent-pair array [(w1, "w1 w2"), ...] — zip of the two shifted
    * slices, empty for docs under two tokens. Pure codegen projection. */
  private def bigramPairs(tk: Column): Column =
    when(size(tk) >= 2,
      zip_with(slice(tk, lit(1), size(tk) - 1), slice(tk, lit(2), size(tk) - 1),
        (a, b) => struct(a.as("w1"), concat_ws(" ", a, b).as("g"))))
      .otherwise(array().cast("array<struct<w1:string,g:string>>"))

  /** Count tables from the training slice. Triggers one job (vocabulary
    * count); the persisted aggregates are reused by every scoring pass. */
  def train(docs: DataFrame, text: Column): Model = {
    val tk = toks(text)
    val uni = docs.select(explode(tk).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val bi = docs.select(explode(bigramPairs(tk)).as("p"))
      .select(col("p.g").as("g"))
      .groupBy("g").agg(count(lit(1)).as("c"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    Model(uni, bi, uni.count())
  }

  /**
   * Score each document: (id, n_bigrams, cross_entropy, ppl). Documents
   * with fewer than two tokens have no bigrams and are excluded — they
   * carry no evidence under a bigram model.
   */
  def crossEntropy(df: DataFrame, id: Column, text: Column, model: Model): DataFrame = {
    val pairs = df.select(id.as("doc_id"), explode(bigramPairs(toks(text))).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.g").as("g"))
    val joined = pairs
      .join(model.bigrams.select(col("g"), col("c").as("__cbg")), Seq("g"), "left")
      .join(model.unigrams.select(col("w").as("w1"), col("c").as("__cu")), Seq("w1"), "left")
    val lp = log(
      (coalesce(col("__cbg"), lit(0L)) + lit(1.0)) /
        (coalesce(col("__cu"), lit(0L)) + lit(model.vocab).cast("double")))
    joined.groupBy("doc_id").agg(
      count(lit(1)).as("n_bigrams"),
      (-avg(lp)).as("cross_entropy"))
      .withColumn("ppl", exp(col("cross_entropy")))
  }

  /**
   * CCNet's head/middle/tail split: thresholds are the `headFrac` and
   * `1 - tailFrac` quantiles of the scored corpus' cross-entropy
   * (approxQuantile — one sketch pass, driver holds two doubles). Lower
   * cross-entropy = closer to the reference slice = "head".
   */
  def bucket(scored: DataFrame, ce: Column, headFrac: Double, tailFrac: Double): DataFrame = {
    require(headFrac > 0 && tailFrac > 0 && headFrac + tailFrac < 1,
      "need 0 < headFrac, 0 < tailFrac, headFrac + tailFrac < 1")
    val probed = scored.withColumn("__ce", ce)
    val Array(lo, hi) =
      probed.stat.approxQuantile("__ce", Array(headFrac, 1 - tailFrac), 0.001)
    probed.withColumn("lm_bucket",
      when(col("__ce") <= lo, "head")
        .when(col("__ce") >= hi, "tail")
        .otherwise("middle"))
      .drop("__ce")
  }
}
