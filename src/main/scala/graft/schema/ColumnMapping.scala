package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, MetadataBuilder, StructField, StructType}

import graft.log.Metadata

/**
 * Column mapping (`name` and `id` modes): each field carries a stable
 * physical name AND a stable integer column id in its metadata,
 * decoupling the user-facing (logical) name from the Parquet column —
 * so RENAME COLUMN and DROP COLUMN are metadata-only commits, and a
 * re-added name gets a FRESH physical name + id so dropped data never
 * resurrects.
 *
 * `name` mode resolves parquet columns by physical name — always safe
 * to enable on an existing table (physicalName := current logical name
 * matches every file already written). `id` mode additionally stamps
 * `parquet.field.id` on the written file schemas and resolves reads by
 * field id (Spark's native parquet field-id matching) — the mode other
 * engines interop with — and must therefore be declared at table
 * creation, before any id-less data file exists.
 *
 * The physical/logical boundary is one projection: scans read physical
 * schemas (file listing, partition values, stats JSON are all keyed
 * physically) and rename to logical at the top; writes rename logical
 * to physical just before the file write.
 * (Reference concept: DeltaColumnMapping.scala:986-1008 — re-designed,
 * scoped: ids on top-level fields.)
 */
object ColumnMapping {

  val MODE_KEY = "graft.columnMapping.mode"
  val PHYS_KEY = "graft.columnMapping.physicalName"
  val ID_KEY = "graft.columnMapping.id"
  val MAX_ID_KEY = "graft.columnMapping.maxColumnId"
  /** Spark's parquet reader/writer field-id metadata key. */
  val PARQUET_FIELD_ID = "parquet.field.id"

  def isEnabled(m: Metadata): Boolean =
    m.configuration.get(MODE_KEY).exists(v => v == "name" || v == "id")

  def idMode(m: Metadata): Boolean =
    m.configuration.get(MODE_KEY).contains("id")

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

  /** Assign stable integer ids to top-level fields missing one,
    * continuing from the table's max-column-id watermark. */
  private def stampIds(m: Metadata): Metadata = {
    var nextId = m.configuration.get(MAX_ID_KEY).map(_.toLong).getOrElse(0L)
    val stampedFields = m.schema.fields.map { f =>
      if (f.metadata.contains(ID_KEY)) f
      else {
        nextId += 1
        f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
          .putLong(ID_KEY, nextId).build())
      }
    }
    m.copy(schemaString = StructType(stampedFields).json,
      configuration = m.configuration + (MAX_ID_KEY -> nextId.toString))
  }

  /** Turn mapping on: stamp unstamped fields with their current names
    * plus fresh column ids. Keeps an already-set mode; `mode` applies
    * only when mapping was off. */
  /** Remove mapping bookkeeping (physical name, column id, parquet field
    * id) from every nested field. An incoming DataFrame — e.g. a stream
    * read from a MAPPED table feeding an unmapped sink table — must never
    * dictate the target table's physical names; the target assigns its
    * own on enable/stampNewFields. */
  def stripMappingMetadata(schema: StructType): StructType = {
    def clean(md: org.apache.spark.sql.types.Metadata)
        : org.apache.spark.sql.types.Metadata =
      new MetadataBuilder().withMetadata(md)
        .remove(PHYS_KEY).remove(ID_KEY).remove(PARQUET_FIELD_ID).build()
    def walk(dt: DataType): DataType = dt match {
      case s: StructType => StructType(s.fields.map(f =>
        f.copy(dataType = walk(f.dataType), metadata = clean(f.metadata))))
      case ArrayType(e, n) => ArrayType(walk(e), n)
      case MapType(k, v, n) => MapType(walk(k), walk(v), n)
      case other => other
    }
    walk(schema).asInstanceOf[StructType]
  }

  def enable(m: Metadata, mode: String = "name"): Metadata = {
    val effective = m.configuration.get(MODE_KEY)
      .filter(v => v == "name" || v == "id").getOrElse(mode)
    stampIds(m.copy(
      schemaString = stampRecursive(m.schema, _.name).json,
      configuration = m.configuration + (MODE_KEY -> effective)))
  }

  /** Stamp fields added by schema evolution with fresh physical names
    * and ids (no-op when mapping is off or the field is stamped). */
  def stampNewFields(m: Metadata): Metadata = {
    if (!isEnabled(m)) return m
    stampIds(m.copy(
      schemaString = stampRecursive(m.schema, _ => freshPhysicalName()).json))
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

  /** Copy the graft column id into the parquet field-id metadata slot:
    * Spark's parquet writer then stamps it into file schemas and the
    * reader (spark.sql.parquet.fieldId.read.enabled) resolves by it. */
  private def withParquetId(f: StructField): StructField =
    if (!f.metadata.contains(ID_KEY)) f
    else f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putLong(PARQUET_FIELD_ID, f.metadata.getLong(ID_KEY)).build())

  /** Physical view of the data (non-partition) schema; under id mode the
    * fields carry parquet field ids for id-based resolution. */
  def physicalDataSchema(m: Metadata): StructType = {
    val fields = m.schema.fields
      .filterNot(f => m.partitionColumns.contains(f.name))
      .map(physicalField)
    StructType(if (idMode(m)) fields.map(withParquetId) else fields)
  }

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
    val ids = idMode(m)
    val byLogical = m.schema.fields.map(f => f.name.toLowerCase -> f).toMap
    val cols: Seq[Column] = df.columns.toSeq.map { c =>
      byLogical.get(c.toLowerCase) match {
        case Some(f) =>
          val pt = physicalType(f.dataType)
          val base = if (pt == f.dataType) col(c) else col(c).cast(pt)
          // id mode: carry the field-id metadata onto the write schema so
          // the parquet writer stamps it into the file footer
          if (ids) base.as(physicalName(f), withParquetId(f).metadata)
          else base.as(physicalName(f))
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
