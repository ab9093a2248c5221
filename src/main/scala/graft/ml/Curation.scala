package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Training-corpus curation operators: deterministic splits, per-group
 * caps, and token-budget shard packing — the bookkeeping every LLM data
 * pipeline runs after dedup/quality filtering. All are projections or
 * single-window passes: nothing shuffles more than once, nothing
 * collects to the driver.
 * (The reference engine ships no curation operators; these compose
 * Spark built-ins per the task's custom-operator preference order.)
 */
object Curation {

  /**
   * Deterministic train/val/test assignment by arithmetic hash of a
   * stable id — pure projection (no shuffle, no RNG state), identical
   * on every run and every engine. Buckets = Knuth multiplicative hash
   * mod 1000; `weights` are permille cut points in label order.
   */

  /** Stable numeric key behind every arithmetic hash here: ids that cast
    * to long keep the documented engine-portable Knuth formula; anything
    * else (UUIDs, URLs) falls back to xxhash64 — without the fallback the
    * cast yields null and every comparison below silently drops (or
    * mislabels) the row. */
  private def hashKey(id: Column): Column =
    coalesce(id.try_cast("long"),
      // bounded below 2^31 so the Knuth multiply stays in Long under
      // ANSI overflow checking
      pmod(xxhash64(id.cast("string")), lit(1000000007L)))

  def deterministicSplit(
      df: DataFrame,
      id: Column,
      weights: Seq[(String, Int)] = Seq("train" -> 980, "val" -> 10, "test" -> 10)
  ): DataFrame = {
    require(weights.map(_._2).sum == 1000, "weights must sum to 1000 permille")
    val bucket = pmod(hashKey(id) * 2654435761L, lit(1000L))
    val cuts = weights.scanLeft(0)(_ + _._2).tail
    val label = weights.zip(cuts).foldRight(lit(weights.last._1): Column) {
      case (((name, _), cut), els) => when(bucket < cut, name).otherwise(els)
    }
    df.withColumn("split", label)
  }

  /**
   * Keep at most `k` rows per group, preferring the `order` ranking —
   * domain/source balancing (a boilerplate-heavy crawl domain cannot
   * drown the corpus). One hash shuffle on the group key; per-group
   * work is a local top-k sort.
   */
  def capPerGroup(
      df: DataFrame,
      group: Column,
      order: Seq[Column],
      k: Int): DataFrame = {
    val w = Window.partitionBy(group).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .drop("__rn")
  }

  /**
   * Deterministic Bernoulli sample by arithmetic hash: keep a row iff
   * its id's Knuth-hash bucket (mod 1000) falls below `permille`. Pure
   * filter — no shuffle, no RNG state, reproducible on any engine from
   * the formula alone (unlike `df.sample`, whose output depends on
   * partition layout).
   */
  def hashSample(df: DataFrame, id: Column, permille: Int): DataFrame = {
    require(permille >= 0 && permille <= 1000)
    df.where(pmod(hashKey(id) * 2654435761L, lit(1000L)) < permille)
  }

  /**
   * Stratified variant: per-stratum keep rates (permille), e.g. downsample
   * an over-represented language while keeping all of a rare one. Same
   * zero-shuffle hash filter; the stratum column only selects the rate.
   */
  def stratifiedHashSample(
      df: DataFrame,
      id: Column,
      stratum: Column,
      rates: Map[String, Int],
      defaultPermille: Int): DataFrame = {
    require((defaultPermille +: rates.values.toSeq).forall(r => r >= 0 && r <= 1000))
    val rate = rates.foldRight(lit(defaultPermille): Column) {
      case ((s, r), els) => when(stratum === s, r).otherwise(els)
    }
    df.where(pmod(hashKey(id) * 2654435761L, lit(1000L)) < rate)
  }

  /**
   * Token-budget shard packing: within each `partitionBy` group, order
   * documents deterministically and assign each to the shard its
   * cumulative start offset falls in — `shard = floor(startOffset /
   * budget)`. One window pass per group; groups pack in parallel, so
   * the scale unit is the grouping key (e.g. language), never a global
   * sort. Deterministic given (group, order).
   */
  def packShards(
      df: DataFrame,
      partitionBy: Column,
      order: Column,
      tokenCount: Column,
      budget: Long): DataFrame = {
    require(budget > 0)
    val w = Window.partitionBy(partitionBy).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // pure long arithmetic: `/` on longs is double division, which past
    // 2^53 cumulative tokens would misassign boundary documents
    val start = col("__start")
    df.withColumn("__start", sum(tokenCount).over(w) - tokenCount)
      .withColumn("shard",
        ((start - pmod(start, lit(budget))).cast("decimal(38,0)")
          / budget).cast("long"))
      .drop("__start")
  }

  /**
   * Corpus mixture sampling: select documents so the output matches a
   * target per-source token mixture (the Pile/LLaMA-style "data recipe").
   * The achievable corpus is capped by the scarcest source relative to
   * its weight — N = min over sources of T_s / p_s — and each source
   * contributes a token budget of floor(p_s * N), filled by taking its
   * documents in deterministic Knuth-hash order until the budget is hit
   * (the first document crossing the budget is excluded). Sources not in
   * `weights` are dropped.
   *
   * Shape: one aggregate for per-source totals (rows = |sources|,
   * driver-sized by contract), budgets folded back in as a literal CASE,
   * then one window pass per source for the running sum. The window
   * partitions by source, so the parallel unit is the source — fine for
   * recipe-sized mixtures (tens of sources); for a single giant source,
   * pre-bucket by hash range the way [[packShards]] groups do.
   */
  def mixtureSample(
      df: DataFrame,
      id: Column,
      source: Column,
      tokenCount: Column,
      weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0))
    val norm = weights.values.sum
    val p = weights.map { case (s, w) => s -> w / norm }
    val totals = df.where(source.isInCollection(p.keys.toSeq))
      .groupBy(source.as("__src")).agg(sum(tokenCount).as("__t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(totals.nonEmpty,
      s"mixtureSample: none of the weighted sources " +
        s"[${p.keys.mkString(", ")}] appear in the input")
    val n = p.collect {
      case (s, w) if totals.contains(s) => totals(s) / w
    }.min
    val budgetCol = p.foldRight(lit(-1L): Column) { case ((s, w), els) =>
      when(source === s, lit(math.floor(w * n).toLong)).otherwise(els)
    }
    val hashOrd = pmod(hashKey(id) * 2654435761L, lit(1000000007L))
    val w = Window.partitionBy(source).orderBy(hashOrd, id)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.where(source.isInCollection(p.keys.toSeq))
      .withColumn("__cum", sum(tokenCount).over(w))
      .where(col("__cum") <= budgetCol)
      .drop("__cum")
  }

  /**
   * Sliding-window document chunking: split `text` into whitespace
   * tokens and emit one row per window of `size` tokens advancing by
   * `stride` (overlap = size - stride), the standard
   * training-sample-construction step before packing. Every token is
   * covered; the final chunk may be short. Pure projection + explode —
   * no shuffle, no UDF; chunk count per document is
   * max(0, ceil((tokens-size)/stride)) + 1 so output scales linearly
   * with corpus token count at any document length.
   *
   * The last window is the FIRST start whose window reaches the final
   * token — starts beyond that would emit strict suffixes of the
   * previous chunk (pure re-reads of already-covered text), duplicating
   * up to floor((size-1)/stride) tails per document into the training
   * set.
   *
   * Output: input columns plus `chunk_id` (0-based) and `chunk`
   * (array of tokens).
   */
  /**
   * Pre-training sequence packing (concat-and-chunk): lay every
   * document's tokens out on one global token stream in `id` order and
   * cut the stream every `seqLen` tokens — the standard GPT-style
   * sample construction, where a document can span a sequence boundary
   * and a sequence holds slices of several documents. Output is the
   * (document × sequence) assignment table a loader needs to
   * materialize batches:
   *
   *   doc_id, seq_id, doc_offset (slice start within the document),
   *   seq_offset (slice start within the sequence), n_tokens (slice
   *   length)
   *
   * Deterministic from (id order, token counts) alone. Zero-token
   * documents occupy no stream positions and emit no slices.
   *
   * Scale shape — the global running offset is a two-phase distributed
   * prefix sum, NOT a single-partition global window:
   *   1. one sample pass picks `buckets` contiguous id ranges
   *      (approxQuantile; the OUTPUT is invariant to where the
   *      boundaries land — they only set the fan-out);
   *   2. per-bucket token totals aggregate (rows = buckets) and their
   *      running sum folds back in as a broadcast literal map;
   *   3. each bucket computes its intra-bucket cumulative sum in an
   *      ordinary partitioned window, adds its bucket offset, and
   *      explodes the per-document slice list.
   * One aggregate + one window shuffle + a bounded driver array —
   * holds at any corpus size; parallelism is `buckets`.
   */
  def packSequences(
      df: DataFrame,
      id: Column,
      tokenCount: Column,
      seqLen: Long,
      buckets: Int = 256): DataFrame = {
    require(seqLen > 0 && buckets > 0)
    val base = df.select(id.cast("long").as("__id"),
        tokenCount.cast("long").as("__n"))
      .where(col("__n") > 0)
    val probes = (1 until buckets).map(_.toDouble / buckets).toArray
    val bounds: Array[Long] =
      if (probes.isEmpty) Array.empty
      else base.stat.approxQuantile("__id", probes, 0.001).map(_.toLong)
    val bkt =
      if (bounds.isEmpty) lit(0)
      else size(filter(lit(bounds), b => b < col("__id")))
    val bucketed = base.withColumn("__b", bkt)
    // running offset of each bucket = sum of all earlier buckets' tokens
    val perBucket = bucketed.groupBy("__b").agg(sum("__n").as("__t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 to bounds.length).scanLeft(0L) {
      (acc, b) => acc + perBucket.getOrElse(b, 0L)
    }.dropRight(1)
    val bucketOffset =
      element_at(map_from_arrays(
        lit(offsets.indices.toArray), lit(offsets.toArray)), col("__b"))
    val w = Window.partitionBy("__b").orderBy("__id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val start = col("__start")
    // long-exact floor division (same decimal idiom as packShards)
    def fdiv(c: Column): Column =
      ((c - pmod(c, lit(seqLen))).cast("decimal(38,0)") / seqLen).cast("long")
    val sliceStart = greatest(start, col("seq_id") * seqLen)
    bucketed
      .withColumn("__start", bucketOffset + sum("__n").over(w) - col("__n"))
      .withColumn("seq_id",
        explode(sequence(fdiv(start), fdiv(start + col("__n") - 1))))
      .select(
        col("__id").as("doc_id"),
        col("seq_id"),
        (sliceStart - start).as("doc_offset"),
        (sliceStart - col("seq_id") * seqLen).as("seq_offset"),
        (least(start + col("__n"), (col("seq_id") + 1) * seqLen) - sliceStart)
          .as("n_tokens"))
  }

  def chunk(df: DataFrame, text: Column, size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      "need 0 < stride <= size")
    val words = split(trim(text), "\\s+")
    // token counts are far below 2^53: double ceil-div is exact here
    val lastChunk = greatest(lit(0),
      ceil((org.apache.spark.sql.functions.size(col("__w")) - lit(size))
        .cast("double") / stride).cast("int"))
    df.where(length(trim(text)) > 0)
      .withColumn("__w", words)
      .withColumn("chunk_id", explode(sequence(lit(0), lastChunk)))
      .withColumn("chunk",
        slice(col("__w"), col("chunk_id") * stride + 1, lit(size)))
      .drop("__w")
  }
}
