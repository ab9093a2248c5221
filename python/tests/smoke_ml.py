"""Python-API smoke for the ML surface: semantic dedup, exact-substring
spans + drop, sequence packing, and the bigram LM, all through the py4j
bindings in graft/ml.py. Runnable standalone
(`python3 python/tests/smoke_ml.py`) or under pytest."""

import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(REPO, "python"))

from pyspark.sql import SparkSession  # noqa: E402
import tempfile  # noqa: E402

from graft.ml import (semantic_dedup, duplicate_spans, drop_spans,  # noqa: E402
                      pack_sequences, NgramLm, build_embedding_index,
                      dedup_embeddings_against_index, canonicalize_url,
                      keep_best)


def _spark():
    classes = os.path.join(REPO, "target", "scala-2.13", "classes")
    return (SparkSession.builder.master("local[4]")
            .config("spark.sql.shuffle.partitions", "4")
            .config("spark.ui.enabled", "false")
            .config("spark.driver.extraClassPath", classes)
            .config("spark.sql.extensions", "graft.sql.GraftSparkSessionExtension")
            .getOrCreate())


def test_ml_surface():
    spark = _spark()

    # semantic dedup: two tight families + a loner
    emb = spark.createDataFrame(
        [(10, [1.0, 0.0, 0.0]), (11, [1.0001, 0.0, 0.0]),
         (20, [0.0, 1.0, 0.0]), (21, [0.0, 1.0002, 0.0]),
         (30, [0.0, 0.0, 1.0])],
        "id long, emb array<float>")
    sd = {r["id"]: r["is_dup"]
          for r in semantic_dedup(emb, "id", "emb", k=3,
                                  threshold=0.999, max_iter=5).collect()}
    assert sd == {10: False, 11: True, 20: False, 21: True, 30: False}, sd

    # exact-substring spans + drop: shared 4-token run removed
    docs = spark.createDataFrame(
        [(1, "one two three four tail1 tail2"),
         (2, "head one two three four")],
        "doc_id long, text string")
    spans = duplicate_spans(docs, "doc_id", "text", window=4)
    assert spans.count() == 2
    cleaned = {r["doc_id"]: r["text"]
               for r in drop_spans(docs, "doc_id", "text", spans).collect()}
    assert cleaned == {1: "tail1 tail2", 2: "head"}, cleaned

    # sequence packing: 10 docs x 50 tokens into 128-token sequences
    counts = spark.createDataFrame(
        [(i, 50) for i in range(1, 11)], "doc_id long, n_tokens long")
    packed = pack_sequences(counts, "doc_id", "n_tokens",
                            seq_len=128, buckets=2)
    per_seq = {r["seq_id"]: r["total"] for r in
               packed.groupBy("seq_id").sum("n_tokens")
               .withColumnRenamed("sum(n_tokens)", "total").collect()}
    assert sum(per_seq.values()) == 500, per_seq
    full = [s for s, t in per_seq.items() if t == 128]
    assert len(full) == 3, per_seq  # 500 tokens = 3 full seqs + 116 tail

    # bigram LM: repeated-phrase doc scores lower CE than shuffled junk
    ref = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(20)],
        "id long, text string")
    lm = NgramLm.train(ref, "text")
    scored = {r["doc_id"]: r["cross_entropy"] for r in lm.cross_entropy(
        spark.createDataFrame(
            [(1, "the cat sat on the mat"), (2, "mat the on sat cat zz")],
            "id long, text string"),
        "id", "text").collect()}
    assert scored[1] < scored[2], scored
    lm.unpersist()

    # embedding index: jittered copy of an indexed vector flags as dup
    idx = tempfile.mkdtemp(prefix="graft-py-embidx")
    build_embedding_index(emb, "id", "emb", idx, threshold=0.999)
    batch = spark.createDataFrame(
        [(100, [1.0001, 0.0, 0.0]), (101, [0.0, 0.0, -1.0])],
        "id long, emb array<float>")
    flags = {r["id"]: r["is_dup"] for r in dedup_embeddings_against_index(
        batch, "id", "emb", idx, threshold=0.999).collect()}
    assert flags == {100: True, 101: False}, flags

    # url canonicalization + quality-aware survivor selection
    urls = spark.createDataFrame(
        [(1, "HTTPS://Ex.COM/a/?b=2&utm_source=x&a=1#f")], "id long, url string")
    canon = urls.select(canonicalize_url(spark, "url").alias("c")).head()["c"]
    assert canon == "https://ex.com/a?a=1&b=2", canon
    kb = {r["id"]: r["keep"] for r in keep_best(
        spark.createDataFrame([(1, 5.0), (2, 9.0), (3, 1.0)], "id long, q double"),
        "id", "q",
        spark.createDataFrame([(1, 2)], "a long, b long")).collect()}
    assert kb == {1: False, 2: True, 3: True}, kb

    spark.stop()
    print("PY-ML-SMOKE PASS")


if __name__ == "__main__":
    test_ml_surface()
