package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines. All are
 * composed from built-in (whole-stage-codegen'd) Spark functions — no
 * UDFs — so they vectorize inside the scan projection and scale linearly
 * with no shuffle.
 */
object TextFunctions {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword proxy: words, numbers, and punctuation runs counted
    * separately (a stable stand-in for a real tokenizer's token count). */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      size(regexp_extract_all(text, lit("[\\.,;:!\\?'\"]"), lit(0))).cast("double") /
        length(text).cast("double")).otherwise(lit(0.0))

  def upperRatio(text: Column): Column =
    when(length(text) > 0,
      size(regexp_extract_all(text, lit("[A-Z]"), lit(0))).cast("double") /
        length(text).cast("double")).otherwise(lit(0.0))

  private val STOPWORDS: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "you", "that", "it",
      "for", "a", "on", "with", "as", "at"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein",
      "zu", "den", "von", "im", "auf", "für", "sich"),
    "fr" -> Seq("le", "la", "les", "et", "de", "un", "une", "est", "pour",
      "que", "dans", "en", "du", "au", "pas"),
    "es" -> Seq("el", "la", "los", "y", "de", "un", "una", "es", "para",
      "que", "en", "del", "se", "no", "por"))

  def stopwordRatio(text: Column, lang: String = "en"): Column = {
    val sw = STOPWORDS(lang).map(lit(_))
    val toks = tokens(lower(text))
    when(size(toks) > 0,
      size(array_intersect(toks, array(sw: _*))).cast("double") /
        size(toks).cast("double")).otherwise(lit(0.0))
  }

  /**
   * Deterministic quality score in [0, 1]: length sweet-spot, sane mean
   * word length, some punctuation, bounded uppercase. A cheap filter for
   * boilerplate/garbage before expensive pipeline stages.
   */
  def qualityScore(text: Column): Column = {
    val n = length(text).cast("double")
    val words = tokenCount(text).cast("double")
    val meanWord = when(words > 0, n / words).otherwise(lit(0.0))
    val lenScore = least(n / lit(200.0), lit(1.0))
    val wordScore =
      when(meanWord.between(3.0, 12.0), lit(1.0)).otherwise(lit(0.3))
    val punctScore = when(punctRatio(text) < 0.2, lit(1.0)).otherwise(lit(0.4))
    val upperScore = when(upperRatio(text) < 0.3, lit(1.0)).otherwise(lit(0.5))
    round(lenScore * 0.4 + wordScore * 0.3 + punctScore * 0.2 + upperScore * 0.1, 4)
  }

  /** Shannon entropy in bits per character — low for repetitive noise
    * and boilerplate, ~4-4.5 for natural English. One codegen'd kernel
    * pass per document ([[graft.expressions.CharEntropy]]). */
  def charEntropy(text: Column): Column =
    org.apache.spark.sql.graftshim.SparkShims.column(
      graft.expressions.CharEntropy(
        org.apache.spark.sql.graftshim.SparkShims.expression(text)))

  /** N-gram heuristic language id over stopword hit-rates; returns the
    * best-scoring language code or 'und'. */
  def langId(text: Column): Column = {
    val scored = STOPWORDS.toSeq.sortBy(_._1).map { case (code, _) =>
      struct(stopwordRatio(text, code).as("score"), lit(code).as("code"))
    }
    val best = greatest(scored: _*)
    when(best.getField("score") > 0.0, best.getField("code")).otherwise(lit("und"))
  }

  /** 64-bit SimHash over token hashes: per bit, tokens vote +1/-1 by their
    * hash bit; the sign becomes the fingerprint bit. Pure higher-order
    * functions — no UDF, no shuffle. */
  def simHash64(toks: Column): Column = {
    val votes = aggregate(
      toks,
      array_repeat(lit(0), 64),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, sequence(lit(0), lit(63)),
          (v, i) => v + when(call_function("shiftright", h, i.cast("int"))
            .bitwiseAND(1) === 1, 1).otherwise(-1))
      })
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, i) => when(v > 0,
          call_function("shiftleft", lit(1L), i.cast("int"))).otherwise(lit(0L))),
      lit(0L), (acc, b) => acc.bitwiseOR(b))
  }

  /** Rolling-hash document fingerprint (order-sensitive, content-exact). */
  def docFingerprint(text: Column): Column = xxhash64(text)

  /** MinHash signature: k independent hash functions (seeded by position),
    * each taking the min over the token set. */
  def minHashSignature(toks: Column, k: Int): Column = {
    val sigs = (0 until k).map { seed =>
      array_min(transform(toks, t => xxhash64(t, lit(seed))))
    }
    array(sigs: _*)
  }

  /** Word n-gram shingles ("a b c", n=2 -> ["a b","b c"]). */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
      .otherwise(array(array_join(toks, " ")))

  /**
   * Gopher-style repetition signals (Rae et al. 2021, appendix A1.1):
   * documents dominated by repeated tokens or n-grams are boilerplate and
   * get filtered before training. Both are pure codegen'd projections over
   * the token array — no shuffle, no UDFs, linear per document.
   */
  /** Fraction of tokens that repeat an earlier token: 1 - distinct/total. */
  def dupTokenFrac(text: Column): Column = {
    val tk = tokens(lower(text))
    when(size(tk) > 0,
      lit(1.0) - size(array_distinct(tk)).cast("double") /
        size(tk).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Fraction of a document's word n-grams taken by its single most
    * frequent n-gram (n=1: the most common word). Work is O(distinct *
    * total) per document — fine for web-document lengths, still a scan
    * projection at corpus scale. */
  def topNgramFrac(text: Column, n: Int): Column = {
    val grams = shingles(tokens(lower(text)), n)
    when(size(grams) > 0,
      array_max(transform(array_distinct(grams),
        g => size(filter(grams, x => x === g)))).cast("double") /
        size(grams).cast("double"))
      .otherwise(lit(0.0))
  }

  /**
   * Full Gopher repetition profile (line-grain + n-gram char coverage) as
   * a 7-slot named struct, computed by ONE codegen'd kernel pass per
   * document ([[graft.expressions.RepetitionProfile]]) — the filter bank
   * Gopher applies before training (dup-line fraction/char-fraction, top
   * 2-4-gram char coverage, duplicate 5/10-gram char coverage). The
   * word-grain [[dupTokenFrac]]/[[topNgramFrac]] cover occurrence
   * fractions; this adds the character-coverage variants and line grain.
   */
  def repetitionProfile(text: Column): Column = {
    val arr = org.apache.spark.sql.graftshim.SparkShims.column(
      graft.expressions.RepetitionProfile(
        org.apache.spark.sql.graftshim.SparkShims.expression(text)))
    val names = Seq("dup_line_frac", "dup_line_char_frac",
      "top_2gram_char_frac", "top_3gram_char_frac", "top_4gram_char_frac",
      "dup_5gram_char_frac", "dup_10gram_char_frac")
    struct(names.zipWithIndex.map { case (n, i) =>
      element_at(arr, i + 1).as(n) }: _*)
  }

  /**
   * Per-document term statistics — the integer-exact core of TF-IDF:
   * each document's `topK` terms by term frequency (ties broken by term),
   * joined with the corpus document frequency. Two shuffles (doc-term
   * agg, term agg) plus a per-document top-k window; every key hashes
   * evenly, so the shape holds at corpus scale. Callers derive the float
   * score as `tf * ln(N / df)` in whatever precision they need.
   */
  def termStats(
      df: org.apache.spark.sql.DataFrame,
      id: Column,
      text: Column,
      topK: Int = 3): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df
      .select(id.as("doc_id"), explode(tokens(text)).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(col("tf").desc, col("term"))
    tf.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= topK).drop("__rn")
      .join(docFreq, "term")
      .select(col("doc_id"), col("term"), col("tf"), col("df"))
  }

  /**
   * PII scrubbing: replace emails, IPv4 addresses, and long digit runs
   * (account/phone-shaped) with typed placeholder tokens. Patterns use
   * only portable regex constructs (classes, bounded repetition) so the
   * same expressions run identically on other engines; applied in
   * specificity order — emails before digit runs, so 'a7654321@x.com'
   * scrubs as one [EMAIL], not an [EMAIL] with a [NUM] inside.
   * Pure projection, codegen'd, no shuffle.
   */
  def scrubPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+", "[EMAIL]")
    val ip = regexp_replace(email,
      "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "[IP]")
    regexp_replace(ip, "[0-9]{7,}", "[NUM]")
  }

  /**
   * URL canonicalization for URL-keyed dedup (the RefinedWeb/CCNet
   * pre-dedup step): lowercase, strip the fragment, drop tracking
   * parameters (utm_*, fbclid, gclid), sort the surviving query
   * parameters, and strip a trailing path slash — so syntactic variants
   * of the same page collapse to one key. Pure codegen'd projection
   * built from portable constructs (regex extract/replace +
   * split/filter/sort/join) so an external oracle can reproduce it
   * byte-for-byte. Dedup on the result with [[graft.ml.Dedup.exact]].
   */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    // RFC 3986 case rules: scheme and authority are case-insensitive
    // (lowercase them); path and query are NOT — /Page and /page may be
    // different resources, so they keep their case.
    val schemeHost = lower(regexp_extract(noFrag,
      "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1))
    val rest = regexp_replace(noFrag,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    val norm = concat(schemeHost, rest)
    val base = regexp_replace(
      regexp_extract(norm, "^([^?]*)", 1), "/$", "")
    val query = regexp_extract(norm, "\\?(.*)$", 1)
    // utm_* is a wildcard FAMILY (utm_source, utm_medium, ...); fbclid
    // and gclid are exact keys — prefix-matching those would strip
    // legitimate parameters that merely share the prefix (fbclid_variant)
    val params = array_sort(filter(split(query, "&"), p =>
      !(p.startsWith("utm_") ||
        p.startsWith("fbclid=") || p === "fbclid" ||
        p.startsWith("gclid=") || p === "gclid" || p === "")))
    val joined = array_join(params, "&")
    when(length(joined) > 0, concat(base, lit("?"), joined))
      .otherwise(base)
  }

  /**
   * Corpus vocabulary: the `k` most frequent lowercase alphanumeric
   * tokens with their total and document frequencies. One partial-agg
   * shuffle on the token (map-side combine absorbs the per-document
   * repetition) and a global top-k — Spark plans the final ordering as
   * TakeOrderedAndProject, so only k rows ever reach the driver side of
   * the limit, never the full vocabulary.
   */
  def vocabTopK(
      df: org.apache.spark.sql.DataFrame,
      id: Column,
      text: Column,
      k: Int = 100): org.apache.spark.sql.DataFrame = {
    df.select(id.as("__doc"),
        explode(filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0))
          .as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("tf"), count_distinct(col("__doc")).as("df"))
      .orderBy(col("tf").desc, col("token"))
      .limit(k)
  }
}
