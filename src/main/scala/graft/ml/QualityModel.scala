package graft.ml

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions._

/**
 * Model-based document quality scoring: a logistic regression over the
 * SAME codegen text kernels the heuristic tier uses (length, entropy,
 * repetition, top-gram concentration), trained with weak supervision —
 * the given corpus as positives vs deterministic corruptions of itself
 * (boilerplate repetition, fragment spam) as negatives. No labels, no
 * external model.
 *
 * Scale shape: training fits k≈6 weights on a bounded sample (driver
 * state is the weight vector); scoring is ONE codegen projection — the
 * feature kernels plus an inlined dot product + sigmoid, no UDF, no
 * MLlib on the hot path — so it runs at corpus scale like every other
 * text signal.
 */
object QualityModel {

  /** Fitted scorer: weights over [[featureColumns]] + intercept. */
  final case class Model(weights: Array[Double], intercept: Double)

  /** The feature projections, in weight order. */
  def featureColumns(text: Column): Seq[Column] = Seq(
    log1p(tokenCount(text).cast("double")),
    charEntropy(text),
    dupTokenFrac(text),
    topNgramFrac(text, 1),
    topNgramFrac(text, 2),
    qualityScore(text))

  /** Deterministic negatives: half the sample becomes repeated-fragment
    * boilerplate, half becomes token spam of its own first word. */
  private def corrupt(text: Column, id: Column): Column =
    when(id % 2 === 0,
      // the first ~18 chars repeated — high top-gram mass, low entropy
      concat_ws(" ", array_repeat(substring(text, 1, 18), 40)))
    .otherwise(
      // one token repeated — maximal dup-token fraction
      concat_ws(" ", array_repeat(split(text, " ").getItem(0), 60)))

  /** Fit on up to `maxSample` docs (positives) + as many corruptions
    * (negatives). Returns the weight vector only — nothing distributed
    * survives training. */
  def train(docs: DataFrame, id: Column, text: Column,
      maxSample: Int = 10000): Model = {
    val spark = docs.sparkSession
    // Null/empty text rows (routine in raw crawl data) produce all-null
    // feature rows, and Row.getDouble on a null aborts training — filter
    // them out of the sample instead.
    val base = docs.select(id.as("__id"), text.as("__t"))
      .where(col("__t").isNotNull && length(col("__t")) > 0)
      .limit(maxSample)
    val labeled =
      base.select(lit(1.0).as("label"), col("__t"), col("__id"))
        .unionByName(base.select(lit(0.0).as("label"),
          corrupt(col("__t"), col("__id")).as("__t"), col("__id")))
    val feats = featureColumns(col("__t"))
    val rows = labeled.select(col("label") +: feats: _*).collect()
    import spark.implicits._
    val training = rows.toSeq.map { r =>
      (r.getDouble(0), Vectors.dense(
        (1 until r.length).map(i => r.getDouble(i)).toArray))
    }.toDF("label", "features")
    val lr = new LogisticRegression()
      .setMaxIter(50).setRegParam(0.01).setStandardization(true)
    val m = lr.fit(training)
    Model(m.coefficients.toArray, m.intercept)
  }

  /** Score as one projection: sigmoid(w · features + b) in [0, 1],
    * higher = more natural-language-like. */
  def score(df: DataFrame, text: Column, model: Model): Column = {
    val feats = featureColumns(text)
    require(feats.size == model.weights.length, "feature/weight arity")
    val z = feats.zip(model.weights)
      .map { case (c, w) => c * lit(w) }
      .foldLeft(lit(model.intercept))(_ + _)
    lit(1.0) / (lit(1.0) + exp(-z))
  }
}
