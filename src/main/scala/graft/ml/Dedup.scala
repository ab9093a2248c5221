package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextFunctions._

/**
 * Deduplication operators for training-data pipelines, all built on
 * shuffle-on-key primitives that scale horizontally:
 *
 *  - exact:    hash-groupBy on content digest (one shuffle on md5)
 *  - minhash:  shingle -> minhash signature -> banded LSH -> bucket join;
 *              candidate pairs are verified with signature similarity, so
 *              the cross-product never materializes (the classic
 *              MMDS ch.3 LSH construction)
 *  - simhash:  64-bit fingerprint, banded into 16-bit chunks; Hamming
 *              verification on candidates
 *  - ngram:    exact Jaccard over n-gram shingle sets, restricted to
 *              LSH candidate pairs
 */
object Dedup {

  /** Keep one row per distinct value of `on` (lowest `orderBy` wins).
    * One hash shuffle; no window over the whole table at scale — the
    * groupBy(min) + semi-join form keeps partial aggregation map-side. */
  // NOTE on persisting shared intermediates: measured at sf0.1 (warm JVM,
  // A/B with a runtime toggle), persist()+eager count of the signature /
  // shingle-set tables is NEVER faster than recomputation here — Spark's
  // ReuseExchange already dedups the shared shuffle subtrees that both
  // self-join sides and the verification join sit on, so the cache only
  // adds a full extra materialization pass (minhash 2.6-3.5s uncached vs
  // 3.1-4.5s cached; ngram 3.9 vs 4.4; simhash/embedding equal). Keep
  // these pipelines declarative and let the optimizer share the exchange.

  /** Materialize a frame consumed by several separate ACTIONS (exchange
    * reuse never crosses action boundaries): always `localCheckpoint` —
    * these frames are consumed within the same command invocation, and a
    * reliable checkpoint would leak one never-deleted checkpoint dir per
    * batch (Spark does not clean reliable checkpoint files by default),
    * unbounded for a continuous-ingestion caller. The cost is the
    * documented localCheckpoint contract: losing an executor mid-command
    * fails the consuming action LOUDLY (no silent recompute) and the
    * caller re-runs — the index appends are exactly-once under
    * txnAppId/txnVersion, so a re-run heals rather than duplicates. */
  private def materialize(df: DataFrame): DataFrame =
    df.localCheckpoint(true)

  def exact(df: DataFrame, on: Column, orderBy: Column): DataFrame = {
    val keyed = df.withColumn("__dk", on).withColumn("__ord", orderBy)
    val winners = keyed.groupBy(col("__dk"))
      .agg(min(struct(col("__ord"), col("__dk"))).as("__w"))
      .select(col("__w.__ord").as("__ord"), col("__w.__dk").as("__dk"))
    keyed.join(winners, Seq("__dk", "__ord"), "left_semi")
      // The semi-join keeps EVERY row tying on the minimum order key —
      // and exact duplicates (byte-identical rows) always tie, which is
      // precisely the case this function exists for. Collapse survivors
      // to one row per key; the extra shuffle is output-sized (post-dedup)
      // and the pick among tied rows is arbitrary only when the tied rows
      // genuinely differ outside (on, orderBy).
      .dropDuplicates("__dk")
      .drop("__dk", "__ord")
  }

  /**
   * MinHash signatures in ONE codegen'd kernel per document
   * ([[graft.expressions.MinHashSignature]]): tokenize, rolling-shingle,
   * and k mins all inside a single projection — zero shuffles and zero
   * exploded rows, where the earlier explode + window + k-min-aggregate
   * pipeline shuffled token-grain rows twice. Null-text documents drop
   * out (no signature), matching the pipeline form.
   *
   * @return (id, _m0.._m{k-1}) one signature component per column
   */
  def minHashSignatures(
      df: DataFrame,
      id: Column,
      text: Column,
      numHashes: Int,
      shingleSize: Int): DataFrame = {
    import org.apache.spark.sql.graftshim.SparkShims
    val sig = SparkShims.column(graft.expressions.MinHashSignature(
      SparkShims.expression(trim(text)), numHashes, shingleSize))
    df.select(id.as("id"), sig.as("__sig"))
      .where(col("__sig").isNotNull)
      .select(col("id") +:
        (0 until numHashes).map(i =>
          element_at(col("__sig"), i + 1).as(s"_m$i")): _*)
  }

  /**
   * MinHash-LSH candidate duplicate pairs.
   *
   * Two phases. Pair generation is an ids-only bucket group-by
   * ([[bandedCandidates]]): each (band, bucket) group collects just its
   * member IDS and explodes the in-bucket pairs locally, then distincts
   * pairs that collided in several bands. Verification joins the
   * signatures back onto the (deduped) candidates. Keeping the 64-long
   * signatures OUT of the explode matters: the first posexplode
   * duplicates the whole bucket payload onto every output row, so
   * signatures-in-bucket materializes O(sum bucketSize^2 * sigBytes) —
   * measured 2.7x slower at 100k docs with 20-way near-dup families
   * (36 s -> 11-14 s) than exploding bare ids and re-joining. A
   * self-join instead of the group-by would be worse still: AQE does
   * not reuse the exchange across two join sides of the signature
   * pipeline (measured: every scan/agg ran twice). The signature
   * agreement count is a codegen'd sum of element comparisons (the
   * `zip_with`/`filter` HOF form is CodegenFallback — interpreted).
   *
   * @return (idA, idB, estJaccard) with idA < idB, estJaccard >= threshold
   */
  def minHashPairs(
      df: DataFrame,
      id: Column,
      text: Column,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3,
      threshold: Double = 0.5,
      maxBucketSize: Int = 10000): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val cand = bandedCandidates(df, id, text, numHashes, bands, shingleSize,
      maxBucketSize)
    val sigs = minHashSignatures(df, id, text, numHashes, shingleSize)
    val sigArr = sigs.select(col("id"),
      array((0 until numHashes).map(i => col(s"_m$i")): _*).as("sig"))
    val agree = sigAgreement(numHashes)
    cand
      .join(sigArr.select(col("id").as("idA"), col("sig").as("sigA")), "idA")
      .join(sigArr.select(col("id").as("idB"), col("sig").as("sigB")), "idB")
      .select(col("idA"), col("idB"),
        (agree.cast("double") / numHashes).as("estJaccard"))
      .where(col("estJaccard") >= threshold)
  }

  /** The shared LSH pair-generation shape: one shuffle on (band, bucket),
    * each group collected once with the given member payload, then the
    * in-bucket pairs explode locally as columns `a` and `b` (pa < pb).
    * Oversized buckets — near-identical boilerplate whose members pair
    * many times over in other bands — are dropped whole (the standard
    * hot-bucket skew guard); `cap <= 0` means uncapped. */
  private def bucketPairs(
      banded: DataFrame,
      member: Column,
      cap: Int): DataFrame = {
    val effCap = if (cap > 0) cap else Int.MaxValue
    banded.groupBy(col("band"), col("bucket"))
      .agg(collect_list(member).as("ms"))
      .where(size(col("ms")).between(2, effCap))
      .select(col("ms"), posexplode(col("ms"))).withColumnRenamed("pos", "pa")
      .withColumnRenamed("col", "a")
      .select(col("a"), col("pa"), posexplode(col("ms"))).withColumnRenamed("pos", "pb")
      .withColumnRenamed("col", "b")
      .where(col("pa") < col("pb"))
  }

  /**
   * 64-bit SimHash fingerprints via explode + 64 codegen'd sum aggregates:
   * each token is hashed once, each bit votes +1/-1 by the hash bit, and the
   * sign of the per-id vote sum becomes the fingerprint bit. Linear-scan +
   * one partial-aggregated shuffle instead of interpreted per-row HOFs.
   * Documents with empty or null text get fp = 0 (zero votes on every
   * bit): the null token from explode_outer must be guarded BEFORE
   * hashing, because Spark's hash expressions never return null —
   * xxhash64(null) is the seed, which would give empty docs a shared
   * nonzero fingerprint.
   *
   * @return (id, fp)
   */
  def simHashes(df: DataFrame, id: Column, text: Column): DataFrame = {
    // One codegen'd pass per document ([[graft.expressions.SimHash64]]):
    // no token explode, no 64-sum aggregation shuffle. Null/empty text
    // fingerprints to 0, as before.
    import org.apache.spark.sql.graftshim.SparkShims
    val fp = SparkShims.column(graft.expressions.SimHash64(
      SparkShims.expression(text)))
    df.select(id.as("id"), coalesce(fp, lit(0L)).as("fp"))
  }

  /** SimHash near-dup candidates: equal 16-bit band -> verify Hamming.
    * Same single-pipeline bucket-group shape as [[minHashPairs]]. */
  def simHashPairs(
      df: DataFrame,
      id: Column,
      text: Column,
      maxHamming: Int = 3,
      maxBucketSize: Int = 10000): DataFrame = {
    val f = simHashes(df, id, text)
    val banded = f.select(col("id"), col("fp"),
      posexplode(transform(sequence(lit(0), lit(3)),
        b => call_function("shiftrightunsigned", col("fp"),
          (b * 16).cast("int")).bitwiseAND(lit(0xFFFFL)))))
      .select(col("id"), col("fp"), col("pos").as("band"), col("col").as("bucket"))
    bucketPairs(banded, struct(col("id"), col("fp")), maxBucketSize)
      .select(
        least(col("a.id"), col("b.id")).as("idA"),
        greatest(col("a.id"), col("b.id")).as("idB"),
        bit_count(col("a.fp").bitwiseXOR(col("b.fp"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Codegen'd per-component agreement count of two signature arrays
    * `sigA`/`sigB` — shared by pairwise and index verification so the
    * two dedup modes can never diverge. */
  private def sigAgreement(numHashes: Int): Column =
    (0 until numHashes).map { i =>
      when(col("sigA").getItem(i) === col("sigB").getItem(i), 1).otherwise(0)
    }.reduce(_ + _)

  // ---- incremental dedup against a persisted index ---------------------

  /** LSH band buckets derived from a signature-ARRAY frame (id, sig). */
  private def bucketsOf(sigArr: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val rows = numHashes / bands
    val bucketCols = (0 until bands).map { bId =>
      xxhash64(lit(bId) +:
        (0 until rows).map(r => element_at(col("sig"), bId * rows + r + 1)): _*)
    }
    sigArr.select(col("id"), posexplode(array(bucketCols: _*)))
      .select(col("id"), col("pos").as("band"), col("col").as("bucket"))
  }

  private def sigArray(df: DataFrame, id: Column, text: Column,
      numHashes: Int, shingleSize: Int): DataFrame =
    minHashSignatures(df, id, text, numHashes, shingleSize)
      .select(col("id"),
        array((0 until numHashes).map(i => col(s"_m$i")): _*).as("sig"))

  /**
   * Build (overwrite) a persisted MinHash-LSH index over `df` at
   * `indexPath`: two graft tables — `buckets` (band, bucket, id; one row
   * per document band) and `sigs` (id, sig) — that later batches dedup
   * AGAINST without ever touching the corpus text again. The
   * continuous-ingestion shape at 100 TB: per-batch cost scales with the
   * batch (its signatures + one join against the bucket table), never
   * with corpus size, and the index grows by appends.
   */
  def buildMinHashIndex(
      df: DataFrame,
      id: Column,
      text: Column,
      indexPath: String,
      numHashes: Int = 64,
      bands: Int = 8,
      shingleSize: Int = 4): Unit = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    // The build parameters are part of the index's identity: a batch
    // deduped with different banding would silently generate zero
    // candidates, so they are recorded as table properties and validated
    // on every use.
    val params = Map(
      "graft.minhash.numHashes" -> numHashes.toString,
      "graft.minhash.bands" -> bands.toString,
      "graft.minhash.shingleSize" -> shingleSize.toString)
    val sigs = sigArray(df, id, text, numHashes, shingleSize)
    val sigsV = writeIndexTable(sigs, s"$indexPath/sigs", params)
    // Buckets derive from the sigs table just written, not from a second
    // MinHash pass over the corpus text: the signature table is a few
    // hundred bytes per document vs re-tokenizing and re-hashing every
    // shingle — at corpus scale that swap turns a full text pass into a
    // metadata-sized read (signatures round-trip parquet exactly, so the
    // bucket keys are bit-identical). Pinned to the version the overwrite
    // just committed: a concurrent append landing between the two writes
    // must not leak into the buckets table and diverge the pair.
    val sigsBack = graft.Graft.readVersion(df.sparkSession,
        s"$indexPath/sigs", sigsV)
      .select(col("id"), col("sig"))
    writeIndexTable(bucketsOf(sigsBack, numHashes, bands),
      s"$indexPath/buckets", params, partitionBy = Seq("band"))
  }

  /** Overwrite an index table with its identity properties riding the
    * SAME commit (Graft.write overwrite merges `configuration` into the
    * metadata atomically): a rebuild-in-place with different banding can
    * never — not even to a crash or a concurrent reader — expose new data
    * under old parameters, whose bucket keys could silently match
    * nothing. */
  private def writeIndexTable(
      df: DataFrame,
      path: String,
      params: Map[String, String],
      partitionBy: Seq[String] = Nil): Long =
    graft.Graft.write(df, path, mode = "overwrite",
      configuration = params, partitionBy = partitionBy)

  /** The shared incremental-index dedup protocol — ONE implementation so
    * the minhash and embedding modes can never diverge: pin both table
    * versions pre-append, validate the recorded build parameters, narrow
    * the index to the batch's touched buckets through a broadcast join,
    * drop current-batch rows BEFORE the hot-bucket count (the index is
    * "the corpus before this batch"; counting a retried append's own rows
    * would inflate buckets past the cap and flip verdicts vs the first
    * run), cap hot buckets, candidate-join, verify via the caller's
    * predicate, optionally append exactly-once, and report (id, is_dup)
    * for every batch row. */
  private def indexDedupCore(
      indexPath: String,
      keysSub: String,
      payloadSub: String,
      keyCols: Seq[String],
      expectedParams: Map[String, String],
      batchKeys: DataFrame,
      batchPayload: DataFrame,
      maxBucketSize: Int,
      updateIndex: Boolean,
      txnAppId: Option[String],
      txnVersion: Option[Long],
      verify: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val spark = batchKeys.sparkSession
    val keysPath = s"$indexPath/$keysSub"
    val payloadPath = s"$indexPath/$payloadSub"
    val kSnap = graft.log.GraftLog.forTable(spark, keysPath).update()
    val kv = kSnap.version
    val pv = graft.log.GraftLog.forTable(spark, payloadPath).update().version
    val conf = kSnap.metadata.configuration
    expectedParams.foreach { case (k, v) =>
      conf.get(k) match {
        case Some(stored) => require(stored == v,
          s"index at $indexPath was built with ${k.split('.').last}=$stored, " +
            s"called with $v — mismatched banding would silently miss " +
            "every duplicate")
        case None => throw new IllegalArgumentException(
          s"index at $indexPath carries no recorded $k — rebuild it with " +
            "buildMinHashIndex/buildEmbeddingIndex; deduping against an " +
            "index with unknown parameters would silently lose recall")
      }
    }
    val idx0 = graft.Graft.readVersion(spark, keysPath, kv)
      .select(keyCols.map(col) :+ col("id").as("cid"): _*)
    val corpusPayload = graft.Graft.readVersion(spark, payloadPath, pv)
    val batchIds = batchKeys.select(col("id").as("cid")).distinct()
    val touched = batchKeys.select(keyCols.map(col): _*).distinct()
    val idxTouched = idx0.join(broadcast(touched), keyCols)
      .join(batchIds, Seq("cid"), "left_anti")
    val hot = idxTouched.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n")).where(col("n") > maxBucketSize)
      .select(keyCols.map(col): _*)
    val idx = idxTouched.join(broadcast(hot), keyCols, "left_anti")
    val cand = batchKeys.join(idx, keyCols)
      .select(col("id"), col("cid")).distinct()
    val verified = verify(cand, corpusPayload)
    if (updateIndex) {
      // Two tables, two commits: with a txn id the retry of a crashed
      // update completes exactly the missing half (idempotent-writer
      // watermarks are per table), healing the index.
      graft.Graft.write(batchPayload, payloadPath,
        txnAppId = txnAppId, txnVersion = txnVersion)
      graft.Graft.write(batchKeys, keysPath, partitionBy = Seq("band"),
        txnAppId = txnAppId, txnVersion = txnVersion)
    }
    batchPayload.select(col("id"))
      .join(verified.withColumn("is_dup", lit(true)), Seq("id"), "left")
      .select(col("id"), coalesce(col("is_dup"), lit(false)).as("is_dup"))
  }

  /**
   * Dedup a NEW batch against the persisted index: banded bucket join
   * picks candidates, signature agreement verifies them. The banding
   * parameters are read back from the index's own table properties and
   * must match the call's — a mismatch would silently report every
   * document novel, so it errors instead. Returns (id, is_dup) for
   * every batch document.
   *
   * With `updateIndex=true` the batch's signatures and buckets are
   * APPENDED to the index — and the returned frame is pinned via time
   * travel to the PRE-append index versions, so a batch never matches
   * itself no matter when the caller materializes the result. Pass
   * `txnAppId`/`txnVersion` to make the append exactly-once under
   * retries: a re-run skips the half already applied (per table), and
   * candidates with `cid == id` are excluded, so even a retry that
   * re-reads its own earlier append cannot self-match.
   */
  def dedupAgainstIndex(
      batch: DataFrame,
      id: Column,
      text: Column,
      indexPath: String,
      numHashes: Int = 64,
      bands: Int = 8,
      shingleSize: Int = 4,
      threshold: Double = 0.5,
      updateIndex: Boolean = false,
      maxBucketSize: Int = 10000,
      txnAppId: Option[String] = None,
      txnVersion: Option[Long] = None): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    // The batch signatures feed FOUR separate actions (candidate join,
    // verification join, and — under updateIndex — two table appends),
    // and exchange reuse never crosses action boundaries, so unlike the
    // single-action pair pipelines (persist note at the top of this
    // object) the batch frame materializes once instead of re-running
    // the MinHash text kernel per consumer. Batches are small by design
    // (per-batch scaling is the point of the index), so the checkpoint
    // is batch-sized, never corpus-sized.
    val batchSigs = materialize(
      sigArray(batch, id, text, numHashes, shingleSize))
    val agree = sigAgreement(numHashes)
    indexDedupCore(
      indexPath, keysSub = "buckets", payloadSub = "sigs",
      keyCols = Seq("band", "bucket"),
      expectedParams = Map(
        "graft.minhash.numHashes" -> numHashes.toString,
        "graft.minhash.bands" -> bands.toString,
        "graft.minhash.shingleSize" -> shingleSize.toString),
      batchKeys = bucketsOf(batchSigs, numHashes, bands),
      batchPayload = batchSigs,
      maxBucketSize = maxBucketSize,
      updateIndex = updateIndex,
      txnAppId = txnAppId, txnVersion = txnVersion,
      verify = (cand, corpusPayload) => cand
        .join(batchSigs.select(col("id"), col("sig").as("sigA")), "id")
        .join(corpusPayload.select(col("id").as("cid"), col("sig").as("sigB")),
          "cid")
        .where((agree.cast("double") / numHashes) >= threshold)
        .select("id").distinct())
  }

  /** Banded-LSH candidate pairs by id only: same bucket-group shape as
    * [[minHashPairs]] but nothing heavier than (id, band, bucket) ever
    * enters the bucket shuffle — the shape to use when a downstream
    * exact verification makes the signature estimate redundant. */
  private[ml] def bandedCandidates(
      df: DataFrame,
      id: Column,
      text: Column,
      numHashes: Int,
      bands: Int,
      shingleSize: Int,
      maxBucketSize: Int): DataFrame = {
    val banded = bucketsOf(
      sigArray(df, id, text, numHashes, shingleSize), numHashes, bands)
    bucketPairs(banded, col("id"), maxBucketSize)
      .select(least(col("a"), col("b")).as("idA"),
        greatest(col("a"), col("b")).as("idB"))
      .distinct()
  }

  /** Exact n-gram Jaccard for candidate pairs (LSH first, then verify).
    * Candidate generation uses 2 hashes per band (16 bands over 32
    * hashes): a pair with true Jaccard >= `threshold` (0.8) misses all
    * bands with probability <= (1 - 0.8^2)^16 ~ 8e-8 — negligible even
    * summed over millions of true pairs — so the verified output equals
    * the exact cross-product answer while the join volume stays banded.
    *
    * Verification computes each candidate document's sorted distinct
    * shingle-hash set in ONE codegen'd kernel
    * ([[graft.expressions.ShingleSet]] — same tokenization and hashing
    * as the minhash gate) and the exact Jaccard per pair as a linear
    * sorted-array merge ([[graft.expressions.SortedArrayJaccard]]) — no
    * shingle-grain rows ever shuffle; the verify joins are doc-grain and
    * semi-joined down to candidate members only, so the pass costs
    * O(candidates), not O(corpus). The hash-set Jaccard equals the
    * string-set Jaccard up to a ~2^-64 per-pair collision. Nothing is
    * quadratic except the capped in-bucket pair explode. */
  def ngramJaccardPairs(
      df: DataFrame,
      id: Column,
      text: Column,
      n: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    import org.apache.spark.sql.graftshim.SparkShims
    val candidates = bandedCandidates(df, id, text, numHashes = 32,
      bands = 16, shingleSize = n, maxBucketSize = 10000)
    val memberIds = candidates.select(col("idA").as("id"))
      .unionByName(candidates.select(col("idB").as("id"))).distinct()
    // Semi-join BEFORE the ShingleSet kernel: the shingle/sort pass runs
    // over candidate members only, not the whole corpus (the optimizer
    // cannot push a join below a projection that computes the column, so
    // the order must be explicit here — guide §1.2 "don't compute things
    // you throw away").
    val sets = df.select(id.as("id"), text.as("__t"))
      .join(memberIds, "id")
      .select(col("id"),
        SparkShims.column(graft.expressions.ShingleSet(
          SparkShims.expression(col("__t")), n)).as("ss"))
    val jac = SparkShims.column(graft.expressions.SortedArrayJaccard(
      SparkShims.expression(col("ssA")), SparkShims.expression(col("ssB"))))
    candidates
      .join(sets.select(col("id").as("idA"), col("ss").as("ssA")), "idA")
      .join(sets.select(col("id").as("idB"), col("ss").as("ssB")), "idB")
      .select(col("idA"), col("idB"), jac.as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Embedding near-dup pairs by cosine similarity over multi-band
    * sign-bit LSH (the minhash-banding recipe applied to hyperplane
    * signatures): each vector emits one bucket key per independent band
    * of `planesPerBand` hyperplanes (NOTE: per-band width, not the old
    * total-signature width — passing the previous 16-plane default here
    * would band 16-wide and cost extra key replication for nothing), a
    * pair is a candidate if ANY band matches exactly, and the band count
    * derives from `threshold` so recall of true pairs AT the threshold
    * is ~98% for thresholds >= 0.9 ([[bandsFor]]; below 0.9 the band cap
    * truncates the bound — a single wide signature with 1-bit probes,
    * the previous design, lost ~half the cosine-0.95 pairs because they
    * flip >=2 of 16 sign bits). Cosine verification is the codegen'd
    * [[graft.expressions.CosineSimilarity]] kernel. */
  def embeddingPairs(
      df: DataFrame,
      id: Column,
      embedding: Column,
      threshold: Double = 0.95,
      planesPerBand: Int = 12): DataFrame = {
    val members = df.select(lit(0).as("cluster"), id.as("id"),
      embedding.cast("array<float>").as("emb"))
      .where(col("emb").isNotNull)
    clusterBandedPairs(members, threshold, planesPerBand)
      .select(col("idA"), col("idB"),
        Similarity.cosine(col("embA"), col("embB")).as("cosine"))
      // filter BEFORE distinct: the dedup shuffle then carries only
      // verified pairs, not every banded candidate
      .where(col("cosine") >= threshold)
      .distinct()
  }

  /** Independent sign-bit bands needed so a pair at cosine exactly
    * `threshold` survives candidate generation with ~98% probability:
    * each of a band's `planesPerBand` random hyperplanes separates the
    * pair with p = acos(threshold)/pi, the band matches with
    * m = (1-p)^planes, and missing every one of R bands is (1-m)^R.
    * The default cap (24 bands) holds the 2% miss bound down to
    * threshold = 0.9 at 12 planes/band; BELOW 0.9 the cap truncates and
    * recall degrades — callers needing low-cosine pairs should shrink
    * `planesPerBand` (coarser, hotter buckets) instead of trusting the
    * bound. */
  private[graft] def bandsFor(
      threshold: Double,
      planesPerBand: Int,
      maxBands: Int = 24): Int = {
    val t = math.max(-1.0, math.min(threshold, 0.999999))
    val p = math.acos(t) / math.Pi
    val m = math.pow(1.0 - p, planesPerBand)
    if (m >= 0.98) 1
    else math.min(maxBands,
      math.max(1, math.ceil(math.log(0.02) / math.log1p(-m)).toInt))
  }

  /**
   * Semantic dedup (the SemDeDup recipe, Abbas et al. 2023,
   * arXiv:2303.09540): k-means partitions the embedding space, then ONLY
   * within-cluster pairs are cosine-verified — the corpus cross-product
   * never materializes. Pairs above `threshold` collapse into duplicate
   * families via connected components and every family keeps its lowest
   * id (the paper keeps a random member; min-id is the deterministic
   * equivalent). Returns `(id, cluster, is_dup)` for every row with a
   * non-null embedding.
   *
   * 100 TB shape: clustering is [[Clustering.kMeans]] (kernel assignment,
   * k×dim driver state); candidate generation is ONE shuffle keyed on
   * `(cluster, band, sign-bits)` — multi-band hyperplane LSH
   * ([[clusterBandedPairs]], shared with [[embeddingPairs]]) applied
   * WITHIN each k-means cluster — so a hot cluster of size s costs
   * O(s · bands · avg-bucket-size) candidate rows, not O(s²), with the
   * band count derived from `threshold` to hold ~98% recall of true
   * pairs AT the threshold for thresholds >= 0.9 ([[bandsFor]]; below
   * that the band cap truncates the bound). Clusters above
   * `maxClusterSize` (an embedding-collapse pathology even with
   * banding — one degenerate direction = one hot bucket) skip pair
   * generation; their members come back KEPT (`is_dup = false`, the safe
   * failure for dedup) with `skipped_cluster = true` so the gap is
   * visible in the output rather than silently folded into "unique".
   */
  def semanticDedup(
      df: DataFrame,
      id: Column,
      emb: Column,
      k: Int,
      threshold: Double = 0.95,
      maxIter: Int = 10,
      maxClusterSize: Int = 10000,
      planesPerBand: Int = 12): DataFrame = {
    // (id, emb, cluster) straight off the final k-means assignment — no
    // corpus-vs-assignment self-join. Materialized once: the frame feeds
    // the sizes aggregate, BOTH sides of the banded pair self-join, and
    // the final report join, and Spark does not share exchanges across
    // those consumers (measured for the minhash pipeline, same shape) —
    // unmaterialized, the scan + centroid kernel would run 4x. Always a
    // LOCAL checkpoint: a reliable one would leak a corpus-sized
    // checkpoint dir per call (never auto-deleted); block loss fails the
    // consuming action loudly and the caller re-runs (same contract as
    // [[materialize]]).
    val withC = Clustering.kMeansAssigned(df, id, emb, k, maxIter)
      .localCheckpoint(true)
    val assigned = withC.select(col("id"), col("cluster"))
    // Cluster sizes: k rows, broadcast — never a corpus shuffle.
    val sizes = withC.groupBy(col("cluster")).agg(count(lit(1)).as("__n"))
    val okC = sizes.where(col("__n") <= maxClusterSize).select("cluster")
    val skippedC = sizes.where(col("__n") > maxClusterSize)
      .select(col("cluster"), lit(true).as("__skip"))
    val members = withC.join(broadcast(okC), Seq("cluster"))
    val pairs = clusterBandedPairs(members, threshold, planesPerBand)
      .where(Similarity.cosine(col("embA"), col("embB")) >= threshold)
      .select("idA", "idB").distinct()
    val families = Clustering.dedupClusters(pairs)
    // Skipped-cluster members report is_dup = FALSE (kept-by-default is
    // the safe failure for dedup — `where(!is_dup)` callers must not
    // silently drop a whole skipped cluster through a null predicate);
    // skipped_cluster = true marks the weaker verdict.
    assigned.join(
        families.where(col("id") =!= col("component"))
          .select(col("id"), lit(true).as("__d")),
        Seq("id"), "left")
      .join(broadcast(skippedC), Seq("cluster"), "left")
      .select(col("id"), col("cluster"),
        when(coalesce(col("__skip"), lit(false)), lit(false))
          .otherwise(coalesce(col("__d"), lit(false))).as("is_dup"),
        coalesce(col("__skip"), lit(false)).as("skipped_cluster"))
  }

  /** One `(band, bits)` struct per independent sign-bit band. Band seeds
    * are spaced by the 64-bit golden ratio: the hyperplane components mix
    * `seed ^ (plane*1000003 + dim)`, so ADJACENT seeds would make each
    * band a local dim-permutation of band 0 — correlated bands whose
    * signatures agree or disagree together on embeddings with locally
    * correlated components (pooled/smooth features), collapsing the
    * (1-m)^R recall model to a single band's. */
  private def bandKeyArray(
      emb: Column, bands: Int, planesPerBand: Int): Column =
    array((0 until bands).map(b =>
      struct(lit(b).as("band"),
        Similarity.hyperplaneBucket(emb, planesPerBand,
          Similarity.defaultSeed + b * 0x9E3779B97F4A7C15L).as("bits"))): _*)

  /** In-cluster multi-band LSH candidate pairs: every member emits one
    * `(band, bits)` key per independent sign-bit band ([[bandsFor]] bands
    * of `planesPerBand` hyperplanes, distinct seeds) and candidates join
    * on `(cluster, band, bits)` — a pair survives if ANY band agrees,
    * which holds ~98% recall at cosine = `threshold` while unrelated
    * members spread over 2^planes buckets per band. Exposed at package
    * scope so scale probes can count candidate rows directly. Input needs
    * `(cluster, id, emb)`; output carries `(idA, embA, idB, embB)` with
    * `idA < idB`, possibly with repeats (one per agreeing band — callers
    * dedup after filtering).
    *
    * Skew guard: a degenerate band (one collapsed embedding direction =
    * one hot bucket) concentrates an O(s²) pair explode in the single
    * task owning that join key, and AQE's skew split keys on INPUT bytes,
    * which a quadratic-OUTPUT key keeps small. A cheap ids-only
    * pre-aggregate (map-side combined, one narrow job) detects buckets
    * past `saltBlock` members; when none exist — every sane corpus — the
    * join below is exactly the historical single-exchange shape. When one
    * does, the join switches to [[saltedBucketJoin]]: hot-bucket members
    * split into deterministic sub-blocks of <= `saltBlock` and the join
    * key extends with the sub-block pair, so the same pair set emits from
    * ~G² bounded tasks instead of one. */
  private[graft] def clusterBandedPairs(
      members: DataFrame,
      threshold: Double,
      planesPerBand: Int = 12,
      saltBlock: Int = 4096): DataFrame = {
    val bands = bandsFor(threshold, planesPerBand)
    val keys = bandKeyArray(col("emb"), bands, planesPerBand)
    val withKey = members.select(col("cluster"), col("id"), col("emb"),
        explode(keys).as("__bk"))
      .select(col("cluster"), col("id"), col("emb"),
        col("__bk.band").as("band"), col("__bk.bits").as("bits"))
    val hot = withKey.groupBy(col("cluster"), col("band"), col("bits"))
      .agg(count(lit(1)).as("__n")).where(col("__n") > saltBlock)
    if (hot.limit(1).isEmpty) {
      val a = withKey.select(col("cluster"), col("band"), col("bits"),
        col("id").as("idA"), col("emb").as("embA"))
      val b = withKey.select(col("cluster"), col("band"), col("bits"),
        col("id").as("idB"), col("emb").as("embB"))
      a.join(b, Seq("cluster", "band", "bits")).where(col("idA") < col("idB"))
        .select("idA", "embA", "idB", "embB")
    } else saltedBucketJoin(withKey, hot, saltBlock)
  }

  /** The hot-bucket arm of [[clusterBandedPairs]]: emit the identical
    * pair multiset with every join task bounded at ~`saltBlock` build
    * rows. Each member of a bucket with n > saltBlock members lands in a
    * deterministic sub-block g = pmod(xxhash64(id), G), G = ceil(n/B),
    * and the bucket's pairs partition exactly over the block pairs
    * (i, j), i <= j: a member of block g replicates as the LEFT side of
    * keys (g, j), j >= g and the RIGHT side of keys (i, g), i <= g.
    * Members of cold buckets keep G = 1, whose two roles collapse to the
    * single key (0, 0) — one row, the unsalted shuffle volume. Every
    * unordered pair {a, b} of a bucket meets exactly once per agreeing
    * band: cross-block pairs at key (g_a, g_b) ordered by block (kept
    * whole, id order restored with least/greatest), same-block pairs at
    * (g, g) in both id orders (the idA < idB filter keeps one, and also
    * drops self-pairs, which only ever meet at (g, g)). */
  private def saltedBucketJoin(
      withKey: DataFrame, hot: DataFrame, saltBlock: Int): DataFrame = {
    val bk = Seq("cluster", "band", "bits")
    // G is capped so the sequence/explode stays bounded even for an
    // absurd bucket (the per-block size then grows past saltBlock, but a
    // bucket needing > 32768 blocks has a >= 2^37-pair output — the
    // quadratic output itself, not task placement, is the problem there).
    // coalesce BEFORE least: Spark's least SKIPS nulls, so a cold bucket's
    // null __n must become 1 before the cap, not after.
    val keyed = withKey.join(hot, bk, "left")
      .withColumn("__G",
        least(coalesce(ceil(col("__n") / saltBlock), lit(1L)), lit(32768L))
          .cast("int"))
    val g = pmod(xxhash64(col("id")), col("__G")).cast("int")
    val roleKeys = when(col("__G") <= 1,
        array(struct(lit(0).as("i"), lit(0).as("j"), lit(2).as("role"))))
      .otherwise(concat(
        transform(sequence(g, col("__G") - 1),
          j => struct(g.as("i"), j.cast("int").as("j"), lit(0).as("role"))),
        // i runs 0..g INCLUSIVE: the member must sit on the right side of
        // its own block's (g, g) key or same-block pairs vanish.
        transform(sequence(lit(0), g),
          i => struct(i.cast("int").as("i"), g.as("j"), lit(1).as("role")))))
    val exploded = keyed.select(col("cluster"), col("band"), col("bits"),
        col("id"), col("emb"), explode(roleKeys).as("__r"))
      .select(col("cluster"), col("band"), col("bits"),
        col("__r.i").as("__i"), col("__r.j").as("__j"),
        col("__r.role").as("__role"), col("id"), col("emb"))
    val jk = bk ++ Seq("__i", "__j")
    val a = exploded.where(col("__role") =!= 1)
      .select((jk.map(col) :+ col("id").as("idA")) :+ col("emb").as("embA"): _*)
    val b = exploded.where(col("__role") =!= 0)
      .select((jk.map(col) :+ col("id").as("idB")) :+ col("emb").as("embB"): _*)
    val lo = col("idA") <= col("idB")
    a.join(b, jk)
      .where(col("__i") < col("__j") || col("idA") < col("idB"))
      .select(
        when(lo, col("idA")).otherwise(col("idB")).as("idA"),
        when(lo, col("embA")).otherwise(col("embB")).as("embA"),
        when(lo, col("idB")).otherwise(col("idA")).as("idB"),
        when(lo, col("embB")).otherwise(col("embA")).as("embB"))
  }

  /**
   * Persist an embedding near-dup index for continuous-ingestion dedup —
   * the [[buildMinHashIndex]] recipe applied to the multi-band sign-bit
   * LSH: two graft tables under `indexPath`, `embs` (id, emb) and
   * `bands` (band, bits, id) partitioned by band. `threshold` and
   * `planesPerBand` are part of the index's identity (they fix the band
   * count and every bucket key), so they are recorded as table
   * properties and validated on every use — a batch deduped with
   * mismatched banding is an error, not silent recall loss.
   */
  def buildEmbeddingIndex(
      df: DataFrame,
      id: Column,
      emb: Column,
      indexPath: String,
      threshold: Double = 0.95,
      planesPerBand: Int = 12): Unit = {
    val params = Map(
      "graft.emblsh.threshold" -> threshold.toString,
      "graft.emblsh.planesPerBand" -> planesPerBand.toString)
    val base = df.select(id.as("id"), emb.cast("array<float>").as("emb"))
      .where(col("emb").isNotNull)
    val embsV = writeIndexTable(base, s"$indexPath/embs", params)
    // Band keys derive from the embs table just written (same swap as
    // [[buildMinHashIndex]]): floats round-trip parquet bit-exactly, so
    // the sign-bit keys are identical while the corpus projection runs
    // once instead of twice. Version-pinned like the sigs read-back.
    val baseBack = graft.Graft.readVersion(df.sparkSession,
        s"$indexPath/embs", embsV)
      .select(col("id"), col("emb"))
    writeIndexTable(embBandKeys(baseBack, threshold, planesPerBand),
      s"$indexPath/bands", params, partitionBy = Seq("band"))
  }

  /** The index's band-key projection: (band, bits, id) per band. */
  private def embBandKeys(
      base: DataFrame, threshold: Double, planesPerBand: Int): DataFrame =
    base.select(col("id"),
        explode(bandKeyArray(col("emb"),
          bandsFor(threshold, planesPerBand), planesPerBand)).as("__bk"))
      .select(col("__bk.band").as("band"), col("__bk.bits").as("bits"),
        col("id"))

  /**
   * Dedup a NEW batch of embeddings against the persisted index: the
   * batch's band keys join only the index buckets the batch touches
   * (broadcast narrow first — per-batch cost scales with the batch, not
   * corpus × bands), a hot-bucket guard drops degenerate buckets whole,
   * and candidates verify with exact cosine against the pinned
   * pre-append `embs` table. Returns `(id, is_dup)` for every batch row
   * with a non-null embedding. With `updateIndex=true` the batch appends
   * to both tables, time-travel-pinned so a batch never matches itself;
   * `txnAppId`/`txnVersion` make the append exactly-once under retries,
   * and current-batch ids are anti-joined out so a retry that re-reads
   * its own earlier append cannot self-match (same healing semantics as
   * [[dedupAgainstIndex]]).
   */
  def dedupEmbeddingsAgainstIndex(
      batch: DataFrame,
      id: Column,
      emb: Column,
      indexPath: String,
      threshold: Double = 0.95,
      planesPerBand: Int = 12,
      updateIndex: Boolean = false,
      maxBucketSize: Int = 10000,
      txnAppId: Option[String] = None,
      txnVersion: Option[Long] = None): DataFrame = {
    // Same four-action consumer shape as [[dedupAgainstIndex]]'s batch
    // signatures — materialize the batch projection once.
    val base = materialize(
      batch.select(id.as("id"), emb.cast("array<float>").as("emb"))
        .where(col("emb").isNotNull))
    indexDedupCore(
      indexPath, keysSub = "bands", payloadSub = "embs",
      keyCols = Seq("band", "bits"),
      expectedParams = Map(
        "graft.emblsh.threshold" -> threshold.toString,
        "graft.emblsh.planesPerBand" -> planesPerBand.toString),
      batchKeys = embBandKeys(base, threshold, planesPerBand),
      batchPayload = base,
      maxBucketSize = maxBucketSize,
      updateIndex = updateIndex,
      txnAppId = txnAppId, txnVersion = txnVersion,
      verify = (cand, corpusPayload) => cand
        .join(base.select(col("id"), col("emb")), "id")
        .join(corpusPayload.select(col("id").as("cid"), col("emb").as("cemb")),
          "cid")
        .where(Similarity.cosine(col("emb"), col("cemb")) >= threshold)
        .select("id").distinct())
  }

  /**
   * Benchmark decontamination: flag training documents that share any
   * word n-gram with a benchmark/eval set — the public 13-gram overlap
   * recipe (GPT-3 appendix C / The Pile), with `n` a parameter. Returns
   * `(doc_id, n_hit_grams)` for every contaminated training document.
   *
   * 100 TB shape: eval sets are tiny relative to the corpus, so the
   * benchmark's distinct-gram set builds locally and broadcasts; the
   * corpus side is one scan projection + explode into a broadcast hash
   * semi-join (no shuffle of corpus data), and the only shuffle is the
   * final per-document hit count, keyed by doc id (unskewed). Documents
   * shorter than `n` tokens contribute their whole text as one gram
   * (same fallback as [[graft.text.TextFunctions.shingles]]).
   */
  def decontaminate(
      train: DataFrame,
      bench: DataFrame,
      id: Column,
      text: Column,
      n: Int = 13): DataFrame = {
    import org.apache.spark.sql.graftshim.SparkShims
    val spark = train.sparkSession
    // Benchmark shingle hashes (distinct, sorted) broadcast once: bench
    // suites are tiny next to the corpus, so the driver collect is
    // metadata-scale. The corpus side is then ONE kernel projection per
    // document — no gram explosion, no join, no shuffle: the shape that
    // survives a 100 TB train set.
    val benchHashes = bench
      .select(explode(SparkShims.column(graft.expressions.ShingleSet(
        SparkShims.expression(lower(text)), n))).as("__h"))
      .distinct()
      .collect().map(_.getLong(0)).sorted
    val bc = spark.sparkContext.broadcast(benchHashes)
    train
      .select(id.as("doc_id"),
        SparkShims.column(graft.expressions.BroadcastShingleHits(
          SparkShims.expression(lower(text)), bc, n)).as("n_hit_grams"))
      .where(col("n_hit_grams") > 0)
  }

  /**
   * Bloom-filter decontamination — the scale path of [[decontaminate]]
   * for held-out sets too large to broadcast as an exact sorted hash
   * array (decontaminating one corpus against another, not against a
   * benchmark suite). The filter is built DISTRIBUTED (treeAggregate of
   * per-partition bit arrays OR-ed depth-2, the same shape Spark's own
   * runtime-filter BloomFilterAggregate uses); only the fixed-size bit
   * array reaches the driver and the executors. Probing is one codegen
   * kernel call per document — no gram explosion, no join, no shuffle.
   *
   * Guarantees: NO false negatives (every document sharing an n-gram
   * with the held-out set is flagged); false positives at ~`fpp` per
   * probed gram. Sizing: ~1.2 GB of bits per 1e9 distinct grams at
   * fpp=1e-3 — tune `fpp` to the broadcast budget.
   */
  def decontaminateBloom(
      train: DataFrame,
      bench: DataFrame,
      id: Column,
      text: Column,
      n: Int = 13,
      fpp: Double = 0.001): DataFrame = {
    require(fpp > 0 && fpp < 1)
    import org.apache.spark.sql.graftshim.SparkShims
    val spark = train.sparkSession
    import spark.implicits._
    val hashes = bench
      .select(explode(SparkShims.column(graft.expressions.ShingleSet(
        SparkShims.expression(lower(text)), n))).as("__h"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cnt = math.max(hashes.count(), 1L)
      val mBits = math.max(64L,
        math.ceil(-cnt * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
      val words = math.toIntExact((mBits + 63) / 64)
      val k = math.max(1,
        math.round(mBits.toDouble / cnt * math.log(2)).toInt)
      // partials and the broadcast ride in BloomBits, not Array[Long]:
      // primitive-array class tags make Spark auto-pick Kryo for the
      // tree-aggregate shuffle, and Kryo's class registration reflects
      // into java.nio — dead on a plain `java -cp` JDK17 launch
      val bits = hashes.select(col("__h")).as[Long].rdd
        .treeAggregate(graft.expressions.BloomBits(new Array[Long](words)))(
          seqOp = (acc, h) => {
            graft.expressions.TextKernels.bloomAdd(acc.bits, h, k); acc
          },
          combOp = (a, b) => {
            var i = 0
            while (i < a.bits.length) { a.bits(i) |= b.bits(i); i += 1 }
            a
          },
          depth = 2)
      val bc = spark.sparkContext.broadcast(bits)
      train
        .select(id.as("doc_id"),
          SparkShims.column(graft.expressions.BloomShingleHits(
            SparkShims.expression(lower(text)), bc, n, k)).as("n_hit_grams"))
        .where(col("n_hit_grams") > 0)
    } finally hashes.unpersist()
  }

  /**
   * Paragraph-grain exact dedup (boilerplate removal, the CCNet-style
   * pass): split each document on `sep`, keep only the corpus-wide FIRST
   * occurrence (by doc id, then position) of every distinct paragraph,
   * and reassemble documents in original paragraph order. Paragraphs
   * shorter than `minLen` chars (blank lines, markup stubs) are exempt —
   * deduping them would weld unrelated documents' structure together.
   *
   * Scale shape: ONE shuffle, keyed by the 64-bit paragraph hash (the
   * exchange hashes 8 bytes + the row, never a multi-KB string key); the
   * hash is a distribution key only — the window partitions on
   * (hash, paragraph), so a hash collision between distinct paragraphs
   * costs co-location, not correctness. Reassembly groups by doc id with
   * an in-group sort, the second (doc-grain, unskewed) shuffle.
   *
   * Returns (doc_id, text, n_paras_kept).
   */
  def dedupParagraphs(
      df: DataFrame,
      id: Column,
      text: Column,
      sep: String = "\n",
      minLen: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val paras = df.select(id.as("doc_id"),
        posexplode(split(text, java.util.regex.Pattern.quote(sep)))
          .as(Seq("__pos", "__para")))
    val w = Window
      .partitionBy(xxhash64(col("__para")), col("__para"))
      .orderBy(col("doc_id"), col("__pos"))
    paras
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 || length(col("__para")) < minLen)
      .groupBy(col("doc_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("__pos"), col("__para")))),
          x => x.getField("__para")), sep).as("text"),
        count(lit(1)).as("n_paras_kept"))
  }

  /**
   * Exact duplicate-SUBSTRING spans (Lee et al. 2021, "Deduplicating
   * Training Data Makes Language Models Better", the ExactSubstr pass):
   * flag every maximal token span whose every `window`-token gram occurs
   * at least `minCount` times corpus-wide. Where document-grain dedup
   * misses boilerplate welded into otherwise-unique pages (license
   * headers, navigation chrome, quoted tweets), this finds the repeated
   * REGION itself; downstream either drops the span or the document.
   *
   * The paper builds a corpus-global suffix array; that is a
   * single-machine construction. This is the distributed re-expression:
   * a duplicated substring of length >= window is exactly a run of
   * duplicated window-grams, so positional gram-hash counting finds the
   * same spans (plus hash-collision false positives at ~n^2/2^64 — at
   * 1e12 grams, odds ~3e-5 of ONE spurious gram corpus-wide).
   *
   * Output: (doc_id, span_start, span_end, n_tokens) — token-index
   * half-open spans, disjoint per document, adjacent-or-overlapping gram
   * intervals merged.
   *
   * Scale shape: the duplicate-gram aggregate is map-side combined and
   * skew-free (a hot boilerplate gram partially aggregates per mapper) so
   * only (hash, count) rows cross the wire; the semi-join back broadcasts
   * the surviving hash set while it fits (the position table is then
   * never shuffled — the sf0.1 plan shape), and above the broadcast
   * threshold it becomes a sort-merge semi-join keyed on the same hash,
   * where AQE skew-join splitting bounds the hot-boilerplate partitions.
   * Island merging windows over DUPLICATE positions only
   * (boilerplate fraction of the corpus, not the corpus), partitioned by
   * doc — bounded by document length. No driver materialization.
   */
  def duplicateSpans(
      df: DataFrame,
      id: Column,
      text: Column,
      window: Int,
      minCount: Long = 2L): DataFrame = {
    require(window > 0 && minCount >= 2,
      "need window > 0 and minCount >= 2")
    val w = window
    val base = df.select(id.as("doc_id"), tokens(text).as("__t"))
      .where(size(col("__t")) >= w)
    // positional gram hashes: gram i covers tokens [i, i+w). The hash is
    // a distribution/equality key only; tokens contain no whitespace (the
    // tokenizer splits on it), so the space join is injective.
    val grams = base.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), size(col("__t")) - w),
        i => xxhash64(concat_ws(" ", slice(col("__t"), i + 1, lit(w))))))
        .as(Seq("pos", "__h")))
    val dupGrams = grams.groupBy(col("__h"))
      .agg(count(lit(1)).as("__n"))
      .where(col("__n") >= minCount)
      .select("__h")
    val dupPos = grams.join(dupGrams, Seq("__h"), "left_semi")
    // gaps-and-islands: gram intervals [p, p+w) merge while the next
    // duplicated position starts within (or adjacent to) the previous
    // gram's extent; a gap > w tokens breaks the span.
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val spans = dupPos
      .withColumn("__brk",
        when(col("pos") - lag("pos", 1).over(byDoc) > w, 1).otherwise(0))
      .withColumn("__isl", sum("__brk").over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("__isl"))
      .agg(min("pos").as("__s"), (max("pos") + w).as("__e"))
    spans.select(
      col("doc_id"),
      col("__s").cast("long").as("span_start"),
      col("__e").cast("long").as("span_end"),
      (col("__e") - col("__s")).cast("long").as("n_tokens"))
  }

  /**
   * Consume [[duplicateSpans]]: remove the flagged token ranges from each
   * document and rebuild its text (Lee et al. 2021 drop the duplicated
   * region, keeping the unique remainder). `spans` must carry
   * `(doc_id, span_start, span_end)` — disjoint half-open token-index
   * ranges, exactly what [[duplicateSpans]] emits, under the SAME
   * tokenizer ([[graft.text.TextFunctions.tokens]]). Documents without
   * spans pass through with their original text untouched; documents with
   * spans are rebuilt by joining surviving tokens with single spaces.
   * Returns `(doc_id, text, n_tokens_kept, n_tokens_dropped)`.
   *
   * Scale shape: spans collapse to one array per flagged doc (bounded by
   * document length), then ONE left join keyed on doc id — the drop
   * itself is a per-row codegen'd array filter, no shuffle beyond the
   * join, no token-grain rows.
   */
  def dropSpans(
      df: DataFrame,
      id: Column,
      text: Column,
      spans: DataFrame): DataFrame = {
    val sp = spans.groupBy(col("doc_id")).agg(
      collect_list(struct(
        col("span_start").as("s"), col("span_end").as("e"))).as("__sp"),
      sum(col("span_end") - col("span_start")).as("__nd"))
    val toks = tokens(col("__text"))
    val keptToks = filter(toks, (_, i) =>
      !exists(col("__sp"),
        s => i >= s.getField("s") && i < s.getField("e")))
    df.select(id.as("doc_id"), text.as("__text"))
      .join(sp, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("__sp").isNull, col("__text"))
          .otherwise(array_join(keptToks, " ")).as("text"),
        when(col("__sp").isNull, size(toks).cast("long"))
          .otherwise(size(keptToks).cast("long")).as("n_tokens_kept"),
        coalesce(col("__nd"), lit(0L)).as("n_tokens_dropped"))
  }
}
