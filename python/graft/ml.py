"""Python surface for the ML / data-pipeline operators: a thin py4j
mirror of the Scala ``graft.ml`` / ``graft.text`` objects (same binding
pattern as :mod:`graft.tables` — the engine's JVM classes must be on the
driver classpath).

Usage::

    from graft.ml import semantic_dedup, duplicate_spans, drop_spans
    flagged = semantic_dedup(df, "id", "emb", k=64, threshold=0.95)
    spans = duplicate_spans(docs, "doc_id", "text", window=15)
    cleaned = drop_spans(docs, "doc_id", "text", spans)
"""

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _jcol(c):
    return F.col(c)._jc if isinstance(c, str) else c._jc


def semantic_dedup(df, id, emb, k, threshold=0.95, max_iter=10,
                   max_cluster_size=10000, planes=12):
    """SemDeDup: k-means buckets + in-cluster multi-band LSH cosine pairs
    (planes hyperplanes per band; band count derived from threshold).
    Returns (id, cluster, is_dup, skipped_cluster). Members of clusters
    larger than max_cluster_size skip pair generation and come back KEPT
    (is_dup=False) with skipped_cluster=True."""
    spark = df.sparkSession
    jdf = spark._sc._jvm.graft.ml.Dedup.semanticDedup(
        df._jdf, _jcol(id), _jcol(emb), int(k), float(threshold),
        int(max_iter), int(max_cluster_size), int(planes))
    return DataFrame(jdf, spark)


def duplicate_spans(df, id, text, window, min_count=2):
    """Exact duplicate-substring spans (Lee et al. ExactSubstr).
    Returns (doc_id, span_start, span_end, n_tokens)."""
    spark = df.sparkSession
    jdf = spark._sc._jvm.graft.ml.Dedup.duplicateSpans(
        df._jdf, _jcol(id), _jcol(text), int(window), int(min_count))
    return DataFrame(jdf, spark)


def drop_spans(df, id, text, spans):
    """Remove flagged token ranges and rebuild each document's text.
    Returns (doc_id, text, n_tokens_kept, n_tokens_dropped)."""
    spark = df.sparkSession
    jdf = spark._sc._jvm.graft.ml.Dedup.dropSpans(
        df._jdf, _jcol(id), _jcol(text), spans._jdf)
    return DataFrame(jdf, spark)


def pack_sequences(df, id, token_count, seq_len, buckets=256):
    """GPT-style sequence packing: tile the concatenated token stream into
    fixed-length sequences. Returns one row per (doc, seq) slice:
    (doc_id, seq_id, doc_offset, seq_offset, n_tokens)."""
    spark = df.sparkSession
    jdf = spark._sc._jvm.graft.ml.Curation.packSequences(
        df._jdf, _jcol(id), _jcol(token_count), int(seq_len), int(buckets))
    return DataFrame(jdf, spark)


def build_embedding_index(df, id, emb, index_path, threshold=0.95,
                          planes_per_band=12):
    """Persist an embedding near-dup index (two graft tables) for
    continuous-ingestion dedup."""
    spark = df.sparkSession
    spark._sc._jvm.graft.ml.Dedup.buildEmbeddingIndex(
        df._jdf, _jcol(id), _jcol(emb), index_path, float(threshold),
        int(planes_per_band))


def dedup_embeddings_against_index(batch, id, emb, index_path,
                                   threshold=0.95, planes_per_band=12,
                                   update_index=False, max_bucket_size=10000,
                                   txn_app_id=None, txn_version=None):
    """Dedup a new batch against a persisted embedding index; with
    update_index=True the batch appends (pinned pre-append, so a batch
    never matches itself). Pass txn_app_id/txn_version to make the append
    exactly-once under retries. Returns (id, is_dup)."""
    spark = batch.sparkSession
    jvm = spark._sc._jvm

    def opt(v, conv):
        return jvm.scala.Option.empty() if v is None \
            else jvm.scala.Some(conv(v))
    jdf = jvm.graft.ml.Dedup.dedupEmbeddingsAgainstIndex(
        batch._jdf, _jcol(id), _jcol(emb), index_path, float(threshold),
        int(planes_per_band), bool(update_index), int(max_bucket_size),
        opt(txn_app_id, str),
        opt(txn_version, lambda v: jvm.java.lang.Long.valueOf(int(v))))
    return DataFrame(jdf, spark)


def canonicalize_url(spark, url):
    """Column expression: canonical dedup key for a URL column (lowercase,
    no fragment, tracking params dropped, query params sorted)."""
    return Column(spark._sc._jvm.graft.text.TextFunctions.canonicalizeUrl(
        _jcol(url)))


def keep_best(df, id, quality, pairs):
    """Collapse duplicate pairs into families and keep the
    highest-quality member per family (ties to lowest id). Returns
    (id, component, keep) for every row of df."""
    spark = df.sparkSession
    jdf = spark._sc._jvm.graft.ml.Clustering.keepBest(
        df._jdf, _jcol(id), _jcol(quality), pairs._jdf)
    return DataFrame(jdf, spark)


class NgramLm:
    """CCNet-style bigram language model: train on a reference corpus,
    score documents by cross-entropy, bucket head/middle/tail."""

    def __init__(self, spark, jmodel):
        self._spark = spark
        self._jmodel = jmodel

    @classmethod
    def train(cls, docs, text):
        spark = docs.sparkSession
        jm = spark._sc._jvm.graft.text.NgramLm.train(docs._jdf, _jcol(text))
        return cls(spark, jm)

    def cross_entropy(self, df, id, text):
        """Returns (doc_id, n_bigrams, cross_entropy, ppl) per document."""
        jdf = self._spark._sc._jvm.graft.text.NgramLm.crossEntropy(
            df._jdf, _jcol(id), _jcol(text), self._jmodel)
        return DataFrame(jdf, self._spark)

    def unpersist(self):
        self._jmodel.unpersist()
