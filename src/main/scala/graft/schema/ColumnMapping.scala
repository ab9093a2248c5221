package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{MetadataBuilder, StructField, StructType}

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

  /** Turn mapping on: stamp unstamped fields with their current names. */
  def enable(m: Metadata): Metadata = {
    val fields = m.schema.fields.map { f =>
      if (f.metadata.contains(PHYS_KEY)) f else stamped(f, f.name)
    }
    m.copy(schemaString = StructType(fields).json,
      configuration = m.configuration + (MODE_KEY -> "name"))
  }

  /** Stamp fields added by schema evolution with fresh physical names
    * (no-op when mapping is off or the field is already stamped). */
  def stampNewFields(m: Metadata): Metadata = {
    if (!isEnabled(m)) return m
    val fields = m.schema.fields.map { f =>
      if (f.metadata.contains(PHYS_KEY)) f
      else stamped(f, freshPhysicalName())
    }
    m.copy(schemaString = StructType(fields).json)
  }

  def physicalField(f: StructField): StructField = f.copy(name = physicalName(f))

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

  /** Rename a logical-named DataFrame to physical names for the writer. */
  def renameToPhysical(df: DataFrame, m: Metadata): DataFrame = {
    if (!isEnabled(m)) return df
    val byLogical = m.schema.fields.map(f => f.name.toLowerCase -> physicalName(f)).toMap
    val cols: Seq[Column] = df.columns.toSeq.map { c =>
      byLogical.get(c.toLowerCase) match {
        case Some(p) => col(c).as(p)
        case None => col(c)
      }
    }
    df.select(cols: _*)
  }

  /** Projection physical -> logical on top of a physical scan. */
  def toLogicalProjection(df: DataFrame, m: Metadata): DataFrame = {
    if (!isEnabled(m)) return df
    df.select(m.schema.fields.toSeq.map(f => col(physicalName(f)).as(f.name)): _*)
  }
}
