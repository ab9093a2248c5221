package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, MetadataBuilder, StructField, StructType}

import graft.log.Metadata

/**
 * Name-mode column mapping: each top-level field carries a stable
 * physical name in its metadata, decoupling the user-facing (logical)
 * name from the Parquet column name — so RENAME COLUMN and DROP COLUMN
 * are metadata-only commits, and a re-added name gets a FRESH physical
 * name so dropped data never resurrects.
 *
 * The physical/logical boundary is one projection: scans read physical
 * schemas (file listing, partition values, stats JSON are all keyed
 * physically) and rename to logical at the top; writes rename logical
 * to physical just before the file write. Enabling is always valid on
 * an existing table because stamping physicalName := current logical
 * name matches every file already written.
 * (Reference concept: DeltaColumnMapping.scala:986-1008 — re-designed,
 * scoped to top-level fields.)
 */
object ColumnMapping {

  val MODE_KEY = "graft.columnMapping.mode"
  val PHYS_KEY = "graft.columnMapping.physicalName"

  def isEnabled(m: Metadata): Boolean =
    m.configuration.get(MODE_KEY).contains("name")

  def physicalName(f: StructField): String =
    if (f.metadata.contains(PHYS_KEY)) f.metadata.getString(PHYS_KEY) else f.name

  def freshPhysicalName(): String = s"col-${java.util.UUID.randomUUID}"

  private def stamped(f: StructField, phys: String): StructField =
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putString(PHYS_KEY, phys).build())

  /** Stamp every field — including nested struct fields (also inside
    * arrays and maps) — missing a physical name. */
  private def stampRecursive(schema: StructType, phys: StructField => String): StructType =
    StructType(schema.fields.map { f =>
      val withType = f.copy(dataType = stampType(f.dataType, phys))
      if (withType.metadata.contains(PHYS_KEY)) withType
      else stamped(withType, phys(withType))
    })

  private def stampType(dt: DataType, phys: StructField => String): DataType = dt match {
    case s: StructType => stampRecursive(s, phys)
    case ArrayType(e, n) => ArrayType(stampType(e, phys), n)
    case MapType(k, v, n) => MapType(stampType(k, phys), stampType(v, phys), n)
    case other => other
  }

  /** Turn mapping on: stamp unstamped fields with their current names. */
  def enable(m: Metadata): Metadata =
    m.copy(schemaString = stampRecursive(m.schema, _.name).json,
      configuration = m.configuration + (MODE_KEY -> "name"))

  /** Stamp fields added by schema evolution with fresh physical names
    * (no-op when mapping is off or the field is already stamped). */
  def stampNewFields(m: Metadata): Metadata = {
    if (!isEnabled(m)) return m
    m.copy(schemaString = stampRecursive(m.schema, _ => freshPhysicalName()).json)
  }

  /** The fully-physical view of a type: nested struct fields renamed. */
  def physicalType(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(physicalField))
    case ArrayType(e, n) => ArrayType(physicalType(e), n)
    case MapType(k, v, n) => MapType(physicalType(k), physicalType(v), n)
    case other => other
  }

  def physicalField(f: StructField): StructField =
    f.copy(name = physicalName(f), dataType = physicalType(f.dataType))

  /** Physical view of the data (non-partition) schema. */
  def physicalDataSchema(m: Metadata): StructType =
    StructType(m.schema.fields
      .filterNot(f => m.partitionColumns.contains(f.name))
      .map(physicalField))

  /** Physical view of the partition schema (in partition-column order). */
  def physicalPartitionSchema(m: Metadata): StructType =
    StructType(m.partitionColumns.map(c => physicalField(m.schema(c))))

  def physicalPartitionColumns(m: Metadata): Seq[String] =
    m.partitionColumns.map(c => physicalName(m.schema(c)))

  /** Rename a predicate's attribute references logical -> physical. */
  def toPhysicalExpr(e: Expression, m: Metadata): Expression = {
    if (!isEnabled(m)) return e
    val byLogical = m.schema.fields.map(f => f.name.toLowerCase -> physicalName(f)).toMap
    e.transformUp {
      case a: AttributeReference =>
        byLogical.get(a.name.toLowerCase).map(p => a.withName(p)).getOrElse(a)
      case u: UnresolvedAttribute =>
        byLogical.get(u.nameParts.last.toLowerCase)
          .map(p => UnresolvedAttribute(Seq(p))).getOrElse(u)
    }
  }

  /** Rename a logical-named DataFrame to physical names for the writer.
    * Nested fields rename via a struct-to-struct cast — a positional
    * rename, fully codegen'd, no per-row interpretation. */
  def renameToPhysical(df: DataFrame, m: Metadata): DataFrame = {
    if (!isEnabled(m)) return df
    val byLogical = m.schema.fields.map(f => f.name.toLowerCase -> f).toMap
    val cols: Seq[Column] = df.columns.toSeq.map { c =>
      byLogical.get(c.toLowerCase) match {
        case Some(f) =>
          val pt = physicalType(f.dataType)
          val base = if (pt == f.dataType) col(c) else col(c).cast(pt)
          base.as(physicalName(f))
        case None => col(c)
      }
    }
    df.select(cols: _*)
  }

  /** Projection physical -> logical on top of a physical scan. */
  def toLogicalProjection(df: DataFrame, m: Metadata): DataFrame = {
    if (!isEnabled(m)) return df
    df.select(m.schema.fields.toSeq.map { f =>
      val pt = physicalType(f.dataType)
      val base = if (pt == f.dataType) col(physicalName(f))
                 else col(physicalName(f)).cast(f.dataType)
      base.as(f.name)
    }: _*)
  }
}
