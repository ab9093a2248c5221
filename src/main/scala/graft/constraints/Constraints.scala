package graft.constraints

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.log.Metadata

/**
 * CHECK constraints, stored as table properties
 * `graft.constraints.<name> = <sql predicate>` and enforced row-by-row
 * during every write: the first output column is wrapped so that a
 * violating row raises, which keeps the check inside the projection and
 * immune to column pruning. NOT NULL is the special case
 * `col IS NOT NULL`. (Reference concept: constraints/Constraints.scala:61
 * + DeltaInvariantCheckerExec — re-designed as a projection guard.)
 */
object Constraints {

  val PROP_PREFIX = "graft.constraints."

  def fromMetadata(m: Metadata): Map[String, String] =
    m.configuration.collect {
      case (k, v) if k.startsWith(PROP_PREFIX) =>
        k.stripPrefix(PROP_PREFIX) -> v
    }

  def withConstraint(m: Metadata, name: String, sql: String): Metadata =
    m.copy(configuration = m.configuration + (PROP_PREFIX + name -> sql))

  def withoutConstraint(m: Metadata, name: String): Metadata =
    m.copy(configuration = m.configuration - (PROP_PREFIX + name))

  /** Wrap `df` so any constraint-violating row fails the write. */
  def enforce(df: DataFrame, m: Metadata): DataFrame = {
    val checks = fromMetadata(m)
    if (checks.isEmpty || df.columns.isEmpty) return df
    val combined = checks.map { case (name, sql) =>
      (name, coalesce(expr(sql), lit(false)))
    }
    val first = df.columns.head
    val firstType = df.schema(first).dataType
    val guarded = combined.foldLeft(col(first)) { case (acc, (name, ok)) =>
      when(ok, acc).otherwise(
        raise_error(concat(
          lit(s"CHECK constraint '$name' (${checks(name)}) violated by row: "),
          to_json(struct(df.columns.map(col).toIndexedSeq: _*))))
          .cast(firstType))
    }
    df.withColumn(first, guarded)
  }
}
