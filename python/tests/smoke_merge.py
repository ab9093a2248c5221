"""End-to-end Python-API smoke: write a graft table, MERGE from Python,
verify results, history, optimize and vacuum. Runnable standalone
(`python3 python/tests/smoke_merge.py`) or under pytest."""

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


def test_merge_end_to_end():
    spark = _spark()
    path = tempfile.mkdtemp(prefix="graft-pysmoke")
    df = spark.range(100).selectExpr("id", "CAST(id AS DOUBLE) AS v")
    df.write.format("graft").mode("append").save(path)

    t = GraftTable.forPath(spark, path)
    assert t.toDF().count() == 100
    t.delete("id % 10 = 3")
    assert t.toDF().count() == 90

    src = spark.range(90, 110).selectExpr("id", "CAST(-1.0 AS DOUBLE) AS v")
    metrics = (t.merge(src, "t.id = s.id")
               .whenMatchedUpdateAll()
               .whenNotMatchedInsertAll()
               .execute())
    assert int(metrics.get("numTargetFilesAdded", 0)) > 0, metrics
    rows = {r["id"]: r["v"] for r in t.toDF().collect()}
    assert len(rows) == 101
    assert rows[95] == -1.0 and rows[105] == -1.0 and rows[42] == 42.0
    assert 93 in rows and 83 not in rows

    t.update("id = 0", {"v": "v + 7"})
    assert t.toDF().filter("id = 0").head()["v"] == 7.0  # 0 + 7

    ops = [r["operation"] for r in t.history().collect()]
    assert ops[-1] == "WRITE" and "MERGE" in ops and "UPDATE" in ops

    tv = t.asOfVersion(0)
    assert tv.count() == 100

    t.optimize().executeCompaction()
    spark.conf.set("spark.graft.vacuum.retentionCheck.enabled", "false")
    t.vacuum(0.0)
    spark.conf.unset("spark.graft.vacuum.retentionCheck.enabled")
    assert t.toDF().count() == 101

    spark.stop()
    print("PY-SMOKE PASS")


if __name__ == "__main__":
    test_merge_end_to_end()
