package graft.schema

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Schema enforcement and evolution (reference concept:
 * schema/SchemaMergingUtils.mergeSchemas + ImplicitMetadataOperation —
 * re-implemented as plain StructType recursion).
 */
object SchemaUtils {

  /** Table schemas are always nullable: files written before a column was
    * added lack it physically, and the reader must be able to null-fill. */
  /** Characters parquet field names cannot carry (reference concept:
    * SchemaUtils.checkSchemaFieldNames / findInvalidColumnNames —
    * re-designed): without column mapping the logical name IS the parquet
    * field name, so these must be refused at metadata-commit time; with
    * mapping the physical names are generated and any logical name goes. */
  private val invalidNameChars = " ,;{}()\n\t=".toSet

  def findInvalidNames(schema: StructType): Seq[String] = {
    // Containers recurse generically — structs can hide under
    // array<array<...>>, map KEYS, map<_, array<...>>, etc.
    def walkType(dt: DataType, prefix: String): Seq[String] = dt match {
      case s: StructType => walk(s, prefix)
      case ArrayType(e, _) => walkType(e, prefix)
      case MapType(k, v, _) => walkType(k, prefix) ++ walkType(v, prefix)
      case _ => Nil
    }
    def walk(st: StructType, prefix: String): Seq[String] =
      st.fields.toSeq.flatMap { f =>
        val self =
          if (f.name.exists(invalidNameChars)) Seq(prefix + f.name) else Nil
        self ++ walkType(f.dataType, prefix + f.name + ".")
      }
    walk(schema, "")
  }

  def toNullable(schema: StructType): StructType =
    StructType(schema.fields.map(f => f.copy(
      dataType = typeToNullable(f.dataType), nullable = true)))

  private def typeToNullable(dt: DataType): DataType = dt match {
    case s: StructType => toNullable(s)
    case ArrayType(e, _) => ArrayType(typeToNullable(e), containsNull = true)
    case MapType(k, v, _) => MapType(typeToNullable(k), typeToNullable(v), true)
    case other => other
  }

  /** Merge incoming data schema into the table schema. New fields append;
    * same-name fields must have identical (or mergeable struct) types. */
  def mergeSchemas(table: StructType, data: StructType): StructType = {
    val merged = table.fields.map { tf =>
      data.fields.find(_.name.equalsIgnoreCase(tf.name)) match {
        case Some(df) => StructField(tf.name, mergeTypes(tf.name, tf.dataType, df.dataType),
          tf.nullable || df.nullable, tf.metadata)
        case None => tf
      }
    }
    val newFields = data.fields.filterNot(df =>
      table.fields.exists(_.name.equalsIgnoreCase(df.name)))
    StructType(merged ++ newFields)
  }

  private def mergeTypes(path: String, t: DataType, d: DataType): DataType = (t, d) match {
    case (a, b) if a == b => a
    case (a: StructType, b: StructType) => mergeSchemas(a, b)
    case (ArrayType(a, n1), ArrayType(b, n2)) =>
      ArrayType(mergeTypes(path, a, b), n1 || n2)
    case (MapType(k1, v1, n1), MapType(k2, v2, n2)) =>
      MapType(mergeTypes(path, k1, k2), mergeTypes(path, v1, v2), n1 || n2)
    case (NullType, b) => b
    case (a, NullType) => a
    case (a, b) =>
      throw new IllegalArgumentException(
        s"Failed to merge incompatible types for column $path: $a vs $b")
  }

  /** True when `data` can be written into a table of schema `table`:
    * every data field exists in the table with an identical type. */
  def isWriteCompatible(table: StructType, data: StructType): Boolean =
    data.fields.forall { df =>
      table.fields.find(_.name.equalsIgnoreCase(df.name))
        .exists(tf => equalsIgnoreNullability(tf.dataType, df.dataType))
    }

  def equalsIgnoreNullability(a: DataType, b: DataType): Boolean = (a, b) match {
    case (x: StructType, y: StructType) =>
      x.length == y.length && x.fields.zip(y.fields).forall { case (f, g) =>
        f.name.equalsIgnoreCase(g.name) && equalsIgnoreNullability(f.dataType, g.dataType)
      }
    case (ArrayType(x, _), ArrayType(y, _)) => equalsIgnoreNullability(x, y)
    case (MapType(xk, xv, _), MapType(yk, yv, _)) =>
      equalsIgnoreNullability(xk, yk) && equalsIgnoreNullability(xv, yv)
    case _ => a == b
  }

  /**
   * Align `df` to the table schema by name: cast matching columns, keep
   * table column order, allow missing table columns (read fills nulls via
   * Parquet schema evolution), reject extras unless evolved beforehand.
   */
  def normalize(df: DataFrame, tableSchema: StructType): DataFrame = {
    val resolver: (String, String) => Boolean = _.equalsIgnoreCase(_)
    val extras = df.schema.fields.filterNot(f =>
      tableSchema.exists(tf => resolver(tf.name, f.name)))
    if (extras.nonEmpty) {
      throw new IllegalArgumentException(
        s"Columns ${extras.map(_.name).mkString(", ")} are not in the table " +
          "schema; use mergeSchema=true to evolve it")
    }
    val cols = tableSchema.fields.flatMap { tf =>
      df.schema.fields.find(f => resolver(tf.name, f.name)).map { f =>
        if (f.dataType == tf.dataType) col(f.name)
        else col(f.name).cast(tf.dataType).as(tf.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }
}
