"""Python-API smoke for INSERT ... REPLACE ON / USING and row-tracking
backfill. Runnable standalone (`python3 python/tests/smoke_insert_replace.py`)
or under pytest."""

import os
import sys
import tempfile

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(REPO, "python"))

from pyspark.sql import SparkSession  # noqa: E402
from graft.tables import GraftTable  # noqa: E402


def _spark():
    classes = os.path.join(REPO, "target", "scala-2.13", "classes")
    return (SparkSession.builder.master("local[4]")
            .config("spark.sql.shuffle.partitions", "4")
            .config("spark.ui.enabled", "false")
            .config("spark.driver.extraClassPath", classes)
            .config("spark.sql.extensions", "graft.sql.GraftSparkSessionExtension")
            .getOrCreate())


def test_insert_replace_and_backfill():
    spark = _spark()
    path = tempfile.mkdtemp(prefix="graft-pyir")
    spark.range(10).selectExpr("id AS k", "CAST(id AS STRING) AS v") \
        .write.format("graft").mode("append").save(path)
    t = GraftTable.forPath(spark, path)

    src = spark.createDataFrame([(3, "X"), (42, "Y")], "k LONG, v STRING")
    t.insert_replace_using(src, ["k"])
    rows = {(r.k, r.v) for r in t.toDF().collect()}
    assert (3, "X") in rows and (42, "Y") in rows and (3, "3") not in rows
    assert len(rows) == 11

    # the materialization conf passes through the session conf: `all`
    # pins the (multi-pass) source via localCheckpoint, same results
    spark.conf.set("spark.graft.dml.materializeSource", "all")
    try:
        src2 = spark.createDataFrame([(100, "Z")], "k LONG, v STRING")
        t.insert_replace_on(src2, "t.k <= s.k")  # replaces everything
        assert {(r.k, r.v) for r in t.toDF().collect()} == {(100, "Z")}
    finally:
        spark.conf.unset("spark.graft.dml.materializeSource")

    # stats recompute is callable and content-neutral
    t.recompute_stats(only_missing=True)
    assert {(r.k, r.v) for r in t.toDF().collect()} == {(100, "Z")}

    # late row-tracking enablement backfills (explicitly, then via property)
    t.backfill_row_tracking()
    spark.sql("ALTER TABLE graft.`%s` SET TBLPROPERTIES "
              "('graft.enableRowTracking'='true')" % path)
    ids = spark.sql("SELECT * FROM graft.`%s`" % path).count()
    assert ids == 1
    print("smoke_insert_replace OK")


if __name__ == "__main__":
    test_insert_replace_and_backfill()
