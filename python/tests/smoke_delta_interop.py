"""Python-API smoke for the Delta interop: enable the Delta-format
mirror on a graft table, then zero-copy convert the mirror back with
GraftTable.convertFromDelta. Runnable standalone
(`python3 python/tests/smoke_delta_interop.py`) or under pytest."""

import os
import shutil
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


def test_delta_interop_round_trip():
    spark = _spark()
    src = tempfile.mkdtemp(prefix="graft-pydelta-src")
    (spark.range(60).selectExpr("id", "id % 3 AS k")
     .write.format("graft").mode("append").save(src))
    spark.sql("ALTER TABLE graft.`%s` SET TBLPROPERTIES("
              "'graft.universalFormat.enabledFormats'='delta')" % src)
    t = GraftTable.forPath(spark, src)
    # DML mirrors too (rewrite delete; DVs also mirror but need the flag)
    t.delete("id >= 50")
    assert os.path.isdir(os.path.join(src, "_delta_log"))
    mirrors = [f for f in os.listdir(os.path.join(src, "_delta_log"))
               if f.endswith(".json")]
    assert len(mirrors) == 2, mirrors

    # a pure Delta reader's view: data + _delta_log only
    view = tempfile.mkdtemp(prefix="graft-pydelta-view")
    for name in os.listdir(src):
        if name == "_graft_log":
            continue
        s = os.path.join(src, name)
        d = os.path.join(view, name)
        if os.path.isdir(s):
            shutil.copytree(s, d)
        else:
            shutil.copy2(s, d)

    t2 = GraftTable.convertFromDelta(spark, view)
    assert t2.toDF().count() == 50
    assert t2.toDF().filter("k = 1").count() >= 16

    spark.stop()
    print("PY-DELTA-SMOKE PASS")


if __name__ == "__main__":
    test_delta_interop_round_trip()
