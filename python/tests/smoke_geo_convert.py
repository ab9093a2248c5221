"""Python-API smoke for the GEOMETRY/GEOGRAPHY read-through import:
author a geometry-annotated parquet file (via the JVM parquet writer --
this Spark cannot write one itself), wrap it in a hand-written delta log
declaring the geospatial feature, convert with GraftTable.convertFromDelta,
and assert the WKB bytes read back byte-identical through the python API
while DML refuses. Runnable standalone
(`python3 python/tests/smoke_geo_convert.py`) or under pytest."""

import json
import os
import struct
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


def _wkb_point(x, y):
    """Little-endian WKB for POINT(x y)."""
    return struct.pack("<BIdd", 1, 1, float(x), float(y))


def _write_geo_parquet(spark, dest, n):
    """Author a geometry/geography-ANNOTATED parquet file through the
    JVM's example writer (what a real geo-capable Delta writer produces;
    pyarrow 16 and this Spark both lack the annotation on write)."""
    jvm = spark._sc._jvm
    types = jvm.org.apache.parquet.schema.Types
    ptn = jvm.org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    lta = jvm.org.apache.parquet.schema.LogicalTypeAnnotation
    geom_f = getattr(types.optional(ptn.BINARY), "as")(
        lta.geometryType("OGC:CRS84")).named("geom")
    geog_f = getattr(types.optional(ptn.BINARY), "as")(
        lta.geographyType()).named("geog")
    # id is INT32: py4j sends python ints as java int, which makes the
    # example writer's overload resolution unambiguous
    mt = (types.buildMessage()
          .addField(types.required(ptn.INT32).named("id"))
          .addField(geom_f).addField(geog_f).named("spark_schema"))
    writer = (jvm.org.apache.parquet.hadoop.example.ExampleParquetWriter
              .builder(jvm.org.apache.hadoop.fs.Path(dest)).withType(mt)
              .withConf(spark._jsc.hadoopConfiguration()).build())
    gf = jvm.org.apache.parquet.example.data.simple.SimpleGroupFactory(mt)
    binary = jvm.org.apache.parquet.io.api.Binary
    for i in range(n):
        g = gf.newGroup()
        g.append("id", i)
        g.append("geom", binary.fromConstantByteArray(
            bytearray(_wkb_point(i, i * 2))))
        g.append("geog", binary.fromConstantByteArray(
            bytearray(_wkb_point(i, i * 2))))
        writer.write(g)
    writer.close()
    return os.path.getsize(dest)


def _geo_schema_json(spark):
    """Spark-DataType JSON for (id INT, geom GEOMETRY, geog GEOGRAPHY),
    built in the JVM so the serialized form is exactly what a geo-capable
    writer stamps into the delta log."""
    jvm = spark._sc._jvm
    t = jvm.org.apache.spark.sql.types
    st = (t.StructType()
          .add("id", t.DataTypes.IntegerType)
          .add("geom", t.GeometryType.apply(4326))
          .add("geog", t.GeographyType.apply(4326)))
    return st.json()


def test_geo_convert_read_through():
    spark = _spark()
    table = tempfile.mkdtemp(prefix="graft-pygeo")
    size = _write_geo_parquet(spark, os.path.join(table, "g.parquet"), 4)

    log_dir = os.path.join(table, "_delta_log")
    os.makedirs(log_dir)
    lines = [
        json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["geospatial"],
            "writerFeatures": ["geospatial"]}}),
        json.dumps({"metaData": {
            "id": "geo-python-smoke",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _geo_schema_json(spark),
            "partitionColumns": [], "configuration": {},
            "createdTime": 1700000000000}}),
        json.dumps({"add": {
            "path": "g.parquet", "partitionValues": {}, "size": size,
            "modificationTime": 1700000000000, "dataChange": True}}),
    ]
    with open(os.path.join(log_dir, "%020d.json" % 0), "w") as f:
        f.write("\n".join(lines) + "\n")

    t = GraftTable.convertFromDelta(spark, table)
    df = t.toDF()
    # geo columns import as binary (WKB) with the source type stamped
    fields = {f.name: f for f in df.schema.fields}
    assert fields["geom"].dataType.typeName() == "binary", fields["geom"]
    assert "geometry" in fields["geom"].metadata.get("graft.geo.sourceType")
    assert "geography" in fields["geog"].metadata.get("graft.geo.sourceType")
    rows = df.orderBy("id").collect()
    assert len(rows) == 4, rows
    for i, r in enumerate(rows):
        assert bytes(r["geom"]) == _wkb_point(i, i * 2), (i, r)
        assert bytes(r["geog"]) == _wkb_point(i, i * 2), (i, r)
    # the import is read-only: any data-changing commit refuses by name
    try:
        t.delete("id = 1")
        raise AssertionError("geo table DELETE should have refused")
    except Exception as e:  # py4j wraps the JVM error
        assert "read-only" in str(e), e

    spark.stop()
    print("PY-GEO-SMOKE PASS")


if __name__ == "__main__":
    test_geo_convert_read_through()
