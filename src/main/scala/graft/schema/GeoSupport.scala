package graft.schema

import org.apache.spark.sql.types._

/**
 * Read-only import support for GEOMETRY/GEOGRAPHY columns (reference
 * concept: DeltaGeoSpatial.scala:29 type gating + stats-exclusion —
 * re-designed). Spark 4.1's geo parquet path is incomplete in BOTH
 * directions for the native types (write: `Unsupported data type
 * GeometryType`; read: FAILED_READ_FILE even on a correctly
 * geometry-annotated file), but its parquet reader DOES decode a
 * geometry/geography-annotated column as plain {{{BinaryType}}},
 * returning the exact WKB payload. So CONVERT translates geo columns to
 * binary (WKB) and stamps the declared source type into field metadata:
 *
 *  - reads serve the WKB bytes (byte-level equality with the source);
 *  - stats skipping stands down automatically — BinaryType is not
 *    eligible for the stats space, mirroring the reference's exclusion
 *    of geo columns from stats;
 *  - every data-changing commit refuses with a named error: this engine
 *    cannot produce files in the annotated geo layout, so a write would
 *    fork the table's physical format.
 */
object GeoSupport {

  /** Field-metadata key holding the source's declared geo type (the
    * Spark DataType JSON form, e.g. `"geometry(OGC:CRS84)"`). */
  val GEO_KEY = "graft.geo.sourceType"

  def isGeoType(dt: DataType): Boolean = dt match {
    case _: GeometryType | _: GeographyType => true
    case _ => false
  }

  /** Translate any geo type in `dt` (at any nesting depth) to binary;
    * returns the translated type and whether anything changed. */
  def translateType(dt: DataType): (DataType, Boolean) = dt match {
    case g if isGeoType(g) => (BinaryType, true)
    case s: StructType =>
      val walked = s.fields.map { f =>
        val (t, c) = translateType(f.dataType)
        (stampIfChanged(f.copy(dataType = t), f.dataType, c), c)
      }
      (StructType(walked.map(_._1)), walked.exists(_._2))
    case a: ArrayType =>
      val (t, c) = translateType(a.elementType)
      (a.copy(elementType = t), c)
    case m: MapType =>
      val (kt, kc) = translateType(m.keyType)
      val (vt, vc) = translateType(m.valueType)
      (m.copy(keyType = kt, valueType = vt), kc || vc)
    case other => (other, false)
  }

  /** Stamp the ORIGINAL type's JSON into the field metadata when the
    * translation changed anything under this field. */
  def stampIfChanged(f: StructField, original: DataType,
      changed: Boolean): StructField =
    if (!changed) f
    else f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putString(GEO_KEY, original.json).build())

  /** Does the (already-translated) schema carry any imported geo
    * column? Detection is by the metadata stamp, recursively. */
  def hasGeoColumns(s: StructType): Boolean = s.fields.exists { f =>
    f.metadata.contains(GEO_KEY) || (f.dataType match {
      case st: StructType => hasGeoColumns(st)
      case ArrayType(st: StructType, _) => hasGeoColumns(st)
      case MapType(_, st: StructType, _) => hasGeoColumns(st)
      case _ => false
    })
  }

  /** Top-level names of geo-carrying columns, for error messages. */
  def geoColumnNames(s: StructType): Seq[String] = s.fields.collect {
    case f if f.metadata.contains(GEO_KEY) => f.name
    case f if (f.dataType match {
      case st: StructType => hasGeoColumns(st)
      case ArrayType(st: StructType, _) => hasGeoColumns(st)
      case MapType(_, st: StructType, _) => hasGeoColumns(st)
      case _ => false
    }) => f.name
  }.toSeq
}
