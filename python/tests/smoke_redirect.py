"""Python-API smoke for the live-table redirect state machine.
Runnable standalone (`python3 python/tests/smoke_redirect.py`) or under
pytest."""

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


def test_redirect_roundtrip():
    spark = _spark()
    src = tempfile.mkdtemp(prefix="graft-pyredir-src")
    dst = tempfile.mkdtemp(prefix="graft-pyredir-dst")
    spark.range(0, 5).write.format("graft").mode("append").save(src)
    spark.range(100, 103).write.format("graft").mode("append").save(dst)

    GraftTable.forPath(spark, src).redirect_to(dst)
    served = {r[0] for r in spark.read.format("graft").load(src).collect()}
    assert served == {100, 101, 102}, served

    raw = GraftTable.forPathNoRedirect(spark, src)
    raw.drop_redirect()
    back = {r[0] for r in spark.read.format("graft").load(src).collect()}
    assert back == {0, 1, 2, 3, 4}, back

    # writer-only variant: same in-engine routing, writer-feature gate
    GraftTable.forPath(spark, src).redirect_to_writer_only(dst)
    wo = {r[0] for r in spark.read.format("graft").load(src).collect()}
    assert wo == {100, 101, 102}, wo
    GraftTable.forPathNoRedirect(spark, src).drop_redirect()

    # noRedirectRules: a rule naming THIS application keeps resolution at
    # the frozen source; dropping the override restores the redirect
    GraftTable.forPath(spark, src).redirect_to(
        dst, no_redirect_rules=[
            {"appName": "py-validate", "allowedOperations": ["DELETE"]}])
    followed = {r[0] for r in spark.read.format("graft").load(src).collect()}
    assert followed == {100, 101, 102}, followed
    spark.conf.set("spark.app.name", "py-validate")
    try:
        exempt = {r[0] for r in spark.read.format("graft").load(src).collect()}
        assert exempt == {0, 1, 2, 3, 4}, exempt
    finally:
        spark.conf.unset("spark.app.name")
    GraftTable.forPathNoRedirect(spark, src).drop_redirect()
    print("smoke_redirect OK")


if __name__ == "__main__":
    test_redirect_roundtrip()
