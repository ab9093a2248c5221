"""Cross-implementation validation of the Delta mirror WITHOUT network:
graft writes a mirrored table (partitioned + column mapping + DV delete
+ a second append), then `tools/delta_mirror_reader.py` — an independent
pure-Python implementation of the public Delta protocol that shares zero
code with graft — reads the `_delta_log` directly and must reproduce the
exact row set, plus the version-0 state for time travel. This is the
sealed-sandbox stand-in for the delta-spark reader leg in
smoke_delta_spark_reader.py (which needs jars/egress).

Runnable standalone (`python3 python/tests/smoke_mirror_protocol.py`) or
under pytest."""

import json
import os
import sys
import tempfile

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(REPO, "python"))
sys.path.insert(0, os.path.join(REPO, "tools"))

from pyspark.sql import SparkSession  # noqa: E402
from graft.tables import GraftTable  # noqa: E402
from delta_mirror_reader import DeltaTable  # noqa: E402


def _spark():
    classes = os.path.join(REPO, "target", "scala-2.13", "classes")
    return (SparkSession.builder.master("local[4]")
            .config("spark.sql.shuffle.partitions", "4")
            .config("spark.ui.enabled", "false")
            .config("spark.driver.extraClassPath", classes)
            .config("spark.sql.extensions",
                    "graft.sql.GraftSparkSessionExtension")
            .getOrCreate())


def test_mirror_protocol_round_trip():
    spark = _spark()
    src = tempfile.mkdtemp(prefix="graft-pymirror")
    # partitioned + column mapping + DVs, all mirrored
    (spark.range(90).selectExpr("id", "id % 3 AS k", "id * 2 AS v")
     .write.format("graft").partitionBy("k").mode("append").save(src))
    spark.sql("ALTER TABLE graft.`%s` SET TBLPROPERTIES("
              "'graft.columnMapping.mode'='name',"
              "'graft.enableDeletionVectors'='true',"
              "'graft.universalFormat.enabledFormats'='delta')" % src)
    t = GraftTable.forPath(spark, src)
    t.delete("v >= 120")                       # DV delete (60 <= id < 90 gone)
    (spark.range(90, 100).selectExpr("id", "id % 3 AS k", "id * 2 AS v")
     .write.format("graft").mode("append").save(src))  # post-mapping append
    expected = sorted((r.id, r.k, r.v) for r in t.toDF().collect())
    assert len(expected) == 70, len(expected)

    # ---- the independent reader, straight off the mirror ----
    got_rows = DeltaTable(src).rows()
    got = sorted((r["id"], r["k"], r["v"]) for r in got_rows)
    assert sorted(got_rows[0].keys()) == ["id", "k", "v"], got_rows[0]
    assert got == expected, (
        "row-set mismatch: independent reader got %d rows, graft %d; "
        "first diff: %s vs %s" % (
            len(got), len(expected),
            next((a for a, b in zip(got, expected) if a != b), None),
            next((b for a, b in zip(got, expected) if a != b), None)))

    # ---- time travel: version 0 is the pre-delete 90-row state ----
    # (version numbering: 0 = initial write; the ALTER, delete and append
    # mirror as later commits)
    v0 = DeltaTable(src, version=0).rows()
    assert len(v0) == 90, len(v0)
    assert sorted(r["id"] for r in v0) == list(range(90))

    # ---- checkpoint path: push the mirror past its 10-commit classic
    # checkpoint; a latest read must then seed from the checkpoint
    # parquet (validating its content) and still match graft exactly ----
    for i in range(10):
        (spark.range(100 + i, 101 + i)
         .selectExpr("id", "id % 3 AS k", "id * 2 AS v")
         .write.format("graft").mode("append").save(src))
    log_dir = os.path.join(src, "_delta_log")
    assert os.path.exists(os.path.join(log_dir, "_last_checkpoint")), \
        "mirror never wrote its classic checkpoint"
    expected2 = sorted((r.id, r.k, r.v) for r in
                       GraftTable.forPath(spark, src).toDF().collect())
    got2 = sorted((r["id"], r["k"], r["v"]) for r in DeltaTable(src).rows())
    assert got2 == expected2, (
        "checkpoint-seeded read mismatch: %d vs %d rows"
        % (len(got2), len(expected2)))

    spark.stop()
    print("PY-MIRROR-PROTOCOL PASS "
          "(rows + mapping + DV + time travel + checkpoint seed)")


if __name__ == "__main__":
    test_mirror_protocol_round_trip()
