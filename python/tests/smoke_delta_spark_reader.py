"""Independent-reader validation of the Delta mirror: the PUBLIC
delta-spark implementation (delta-io/delta, the reference's own
released artifact) reads a graft table's ``_delta_log`` mirror
directly — rows, schema, time travel, and a DV-bearing table with
column mapping. Today the mirror is otherwise validated only by the
repo's own CONVERT round-trip; an independent implementation is the
real interop oracle.

The delta-spark jars cannot be vendored into this repo (zero-egress
sandbox, and no third-party jars belong in the tree), so the smoke is
gated:

  GRAFT_DELTA_SPARK_JARS=/path/a.jar:/path/b.jar
      classpath holding delta-spark + delta-storage jars (any 3.x/4.x
      build matching the local Spark's Scala version)
  GRAFT_DELTA_SPARK_SMOKE=install
      allow a `pip install delta-spark` attempt first (needs egress)

Without either, prints ``PY-DELTA-READER SKIP`` and exits 0. The
writer phase (graft side) always runs, so the mirror artifacts the
independent reader would consume are produced and sanity-checked even
on a sealed host.

Runs standalone (`python3 python/tests/smoke_delta_spark_reader.py`)
or under pytest. The reader runs in a SUBPROCESS because a JVM's
classpath is fixed at session start — the graft writer and the delta
reader must not share one.
"""

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(REPO, "python"))


def _delta_classpath():
    """Locate delta-spark jars: env first, then an installed package."""
    env = os.environ.get("GRAFT_DELTA_SPARK_JARS", "")
    if env:
        return env
    if os.environ.get("GRAFT_DELTA_SPARK_SMOKE", "") == "install":
        subprocess.run([sys.executable, "-m", "pip", "install",
                        "--quiet", "delta-spark"], check=False)
    try:
        import importlib.util
        spec = importlib.util.find_spec("delta")
        if spec and spec.submodule_search_locations:
            # pip layout: site-packages/pyspark/jars holds the delta jars
            import pyspark
            jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
            found = [os.path.join(jars, f) for f in os.listdir(jars)
                     if f.startswith(("delta-spark", "delta-core",
                                      "delta-storage"))]
            if found:
                return ":".join(found)
    except Exception:
        pass
    return None


def _write_phase(view_dir, expected_json):
    """Graft side: mirrored table with column mapping + a DV delete,
    plus a pure-Delta view dir (data + _delta_log only)."""
    from pyspark.sql import SparkSession
    from graft.tables import GraftTable

    classes = os.path.join(REPO, "target", "scala-2.13", "classes")
    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.extraClassPath", classes)
             .config("spark.sql.extensions",
                     "graft.sql.GraftSparkSessionExtension")
             .getOrCreate())
    src = tempfile.mkdtemp(prefix="graft-pydsr-src")
    (spark.range(80).selectExpr("id", "id % 4 AS k")
     .write.format("graft").mode("append").save(src))
    spark.sql("ALTER TABLE graft.`%s` SET TBLPROPERTIES("
              "'graft.columnMapping.mode'='name',"
              "'graft.enableDeletionVectors'='true',"
              "'graft.universalFormat.enabledFormats'='delta')" % src)
    t = GraftTable.forPath(spark, src)
    t.delete("id >= 60")  # DV delete, mirrored
    assert os.path.isdir(os.path.join(src, "_delta_log")), "mirror missing"

    for name in os.listdir(src):
        if name == "_graft_log":
            continue
        s, d = os.path.join(src, name), os.path.join(view_dir, name)
        (shutil.copytree if os.path.isdir(s) else shutil.copy2)(s, d)

    rows = sorted((r.id, r.k) for r in t.toDF().collect())
    with open(expected_json, "w") as f:
        json.dump({"rows": rows, "columns": sorted(t.toDF().columns),
                   "v0_count": 80}, f)
    spark.stop()
    print("PY-DELTA-READER writer phase OK (%d live rows)" % len(rows))


def _read_phase(view_dir, expected_json, delta_cp):
    """Independent reader: public delta-spark opens the mirror."""
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.extraClassPath", delta_cp)
             .config("spark.executor.extraClassPath", delta_cp)
             .config("spark.sql.extensions",
                     "io.delta.sql.DeltaSparkSessionExtension")
             .config("spark.sql.catalog.spark_catalog",
                     "org.apache.spark.sql.delta.catalog.DeltaCatalog")
             .getOrCreate())
    with open(expected_json) as f:
        exp = json.load(f)
    df = spark.read.format("delta").load(view_dir)
    assert sorted(df.columns) == exp["columns"], (df.columns, exp["columns"])
    rows = sorted((r.id, r.k) for r in df.collect())
    assert rows == [tuple(r) for r in exp["rows"]], \
        "row-set mismatch: delta-spark read %d rows, graft wrote %d" % (
            len(rows), len(exp["rows"]))
    v0 = (spark.read.format("delta").option("versionAsOf", 0)
          .load(view_dir).count())
    assert v0 == exp["v0_count"], (v0, exp["v0_count"])
    spark.stop()
    print("PY-DELTA-READER PASS (rows + schema + DV + time travel)")


def test_delta_spark_reads_mirror():
    view = tempfile.mkdtemp(prefix="graft-pydsr-view")
    expected = os.path.join(view, "_expected.json")
    # writer runs in a subprocess so pytest's own session (if any)
    # cannot pollute either JVM's classpath
    subprocess.run([sys.executable, __file__, "--phase", "write",
                    view, expected], check=True)
    cp = _delta_classpath()
    if not cp:
        print("PY-DELTA-READER SKIP: no delta-spark jars "
              "(set GRAFT_DELTA_SPARK_JARS or GRAFT_DELTA_SPARK_SMOKE="
              "install on a host with egress)")
        return
    env = dict(os.environ, GRAFT_DELTA_CP=cp)
    subprocess.run([sys.executable, __file__, "--phase", "read",
                    view, expected], check=True, env=env)


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "--phase":
        phase, view, expected = sys.argv[2], sys.argv[3], sys.argv[4]
        if phase == "write":
            _write_phase(view, expected)
        else:
            _read_phase(view, expected, os.environ["GRAFT_DELTA_CP"])
    else:
        test_delta_spark_reads_mirror()
