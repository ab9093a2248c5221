"""Python-API smoke for round-15 features: materialized partition columns
and the catalogManaged (CCv2) convert refusal.
Runnable standalone (`python3 python/tests/smoke_features.py`) or under
pytest."""

import json
import os
import sys
import tempfile

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(REPO, "python"))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql.functions import input_file_name  # noqa: E402
from graft.tables import GraftTable  # noqa: E402


def _spark():
    classes = os.path.join(REPO, "target", "scala-2.13", "classes")
    return (SparkSession.builder.master("local[4]")
            .config("spark.sql.shuffle.partitions", "4")
            .config("spark.ui.enabled", "false")
            .config("spark.driver.extraClassPath", classes)
            .config("spark.sql.extensions",
                    "graft.sql.GraftSparkSessionExtension")
            .config("spark.sql.catalog.spark_catalog",
                    "graft.catalog.GraftCatalog")
            .getOrCreate())


def _live_files(spark, path):
    return [r[0] for r in (spark.read.format("graft").load(path)
                           .select(input_file_name()).distinct().collect())]


def test_materialize_partition_columns(spark):
    path = tempfile.mkdtemp(prefix="graft-pymat")
    (spark.range(3).selectExpr("id", "CAST(id % 3 AS STRING) AS k")
     .write.format("graft").partitionBy("k").mode("append").save(path))
    # default layout: partition column elided from the data files
    for f in _live_files(spark, path):
        assert "k" not in spark.read.parquet(f).columns
    # arm the feature on the existing table (protocol upgrades in the
    # same commit), then overwrite: every live file now carries k
    spark.sql("ALTER TABLE graft.`%s` SET TBLPROPERTIES("
              "'graft.enableMaterializePartitionColumnsFeature'='true')"
              % path)
    (spark.range(30).selectExpr("id", "CAST(id % 3 AS STRING) AS k")
     .write.format("graft").mode("overwrite").save(path))
    live = _live_files(spark, path)
    assert live, "expected live files after overwrite"
    for f in live:
        raw = spark.read.parquet(f)
        assert "k" in raw.columns, (f, raw.columns)
        # one partition directory -> exactly one physical k value
        assert raw.select("k").distinct().count() == 1, f
    print("PY-MATERIALIZE PASS")


def test_catalog_managed_convert_refusal(spark):
    src = tempfile.mkdtemp(prefix="graft-pyccv2")
    # hand-authored minimal Delta log claiming catalogManaged (CCv2)
    df = spark.range(5).selectExpr("id")
    tmp = tempfile.mkdtemp(prefix="graft-pyccv2-part")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    os.rename(os.path.join(tmp, part), os.path.join(src, "f.parquet"))
    size = os.path.getsize(os.path.join(src, "f.parquet"))
    schema = {"type": "struct", "fields": [
        {"name": "id", "type": "long", "nullable": True, "metadata": {}}]}
    lines = [
        json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["catalogManaged"],
            "writerFeatures": ["catalogManaged"]}}),
        json.dumps({"metaData": {
            "id": "00000000-0000-0000-0000-000000000000",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": [], "configuration": {},
            "createdTime": 1700000000000}}),
        json.dumps({"add": {
            "path": "f.parquet", "partitionValues": {}, "size": size,
            "modificationTime": 1700000000000, "dataChange": True}}),
    ]
    os.makedirs(os.path.join(src, "_delta_log"))
    with open(os.path.join(src, "_delta_log", "%020d.json" % 0), "w") as f:
        f.write("\n".join(lines) + "\n")
    try:
        GraftTable.convertFromDelta(spark, src)
        raise AssertionError("catalogManaged source must refuse conversion")
    except Exception as e:  # noqa: BLE001 - py4j wraps the JVM error
        msg = str(e)
        assert "catalogManaged" in msg, msg
    print("PY-CCV2-REFUSAL PASS")


if __name__ == "__main__":
    s = _spark()
    test_materialize_partition_columns(s)
    test_catalog_managed_convert_refusal(s)
    s.stop()
    print("PY-FEATURES-SMOKE PASS")
