package graft.schema

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.graftshim.SparkShims
import org.apache.spark.sql.types._

import graft.log.Metadata

/**
 * Partition-predicate inference for generated partition columns: when a
 * table is partitioned by `p GENERATED ALWAYS AS (g(base))` and a query
 * filters on `base`, derive the implied filter on `p` so partition
 * pruning fires even though the user never mentioned `p`. At 100 TB with
 * thousands of date partitions this is the difference between scanning
 * one partition and scanning the table when users filter on the raw
 * timestamp. (Reference concept: GeneratedColumn +
 * optimizablePartitionExpressions.scala — re-designed: instead of a
 * per-function lookup table we classify the generation expression as
 * MONOTONE (range + equality inference) or merely deterministic
 * (equality-only inference) and evaluate g at filter literals via
 * constant folding.)
 *
 * Soundness argument: for any deterministic g, a row matching
 * `base = lit` has `p = g(lit)`, so files whose partition value differs
 * can be pruned. If g is non-decreasing, a row matching `base >= lit`
 * has `p = g(base) >= g(lit)`; range inferences carry an `OR p IS NULL`
 * guard so files where g produced null (e.g. unparseable strings) are
 * never wrongly pruned.
 */
object PartitionInference {

  private case class GenInfo(
      partField: StructField,
      physPartName: String,
      physBaseName: String,
      gen: Expression,
      monotone: Boolean)

  /** Non-decreasing shapes over the base column's natural ordering. */
  private def isMonotone(e: Expression): Boolean = e match {
    case _: UnresolvedAttribute => true
    case c: Cast =>
      (c.dataType == DateType || c.dataType.isInstanceOf[TimestampType.type]) &&
        isMonotone(c.child)
    case f: UnresolvedFunction =>
      val n = f.nameParts.last.toLowerCase
      n match {
        case "to_date" | "date" | "year" =>
          f.arguments.size == 1 && isMonotone(f.arguments.head)
        case "date_trunc" => // date_trunc(unit, ts)
          f.arguments.size == 2 && f.arguments.head.isInstanceOf[Literal] &&
            isMonotone(f.arguments(1))
        case "trunc" => // trunc(date, fmt)
          f.arguments.size == 2 && f.arguments(1).isInstanceOf[Literal] &&
            isMonotone(f.arguments.head)
        case "substring" | "substr" => // prefix only: start position 0/1
          f.arguments.size == 3 && isMonotone(f.arguments.head) &&
            (f.arguments(1) match {
              case Literal(v: Int, IntegerType) => v == 0 || v == 1
              case _ => false
            })
        case "left" =>
          f.arguments.size == 2 && isMonotone(f.arguments.head)
        case _ => false
      }
    case _ => false
  }

  /** Parse the generation expressions of the partition columns that
    * depend on exactly one data column, keyed by that column's PHYSICAL
    * name (listFiles operates in physical space). */
  private def genInfos(spark: SparkSession, m: Metadata): Seq[GenInfo] =
    m.partitionColumns.flatMap { pc =>
      val f = m.schema(pc)
      ColumnDefaults.generationExpr(f).flatMap { sql =>
        try {
          val parsed = spark.sessionState.sqlParser.parseExpression(sql)
          val refs = parsed.collect {
            case u: UnresolvedAttribute => u.nameParts.last.toLowerCase
          }.distinct
          refs match {
            case Seq(base) =>
              m.schema.fields.find(_.name.equalsIgnoreCase(base)).map { bf =>
                GenInfo(f, ColumnMapping.physicalName(f),
                  ColumnMapping.physicalName(bf).toLowerCase,
                  parsed, isMonotone(parsed))
              }
            case _ => None
          }
        } catch { case _: Exception => None }
      }
    }

  /** g(lit): substitute the base reference with the literal and constant
    * fold through the analyzer (so unresolved functions resolve exactly
    * as they would when the column is written). Returns None when the
    * result is null or non-deterministic — inference is best-effort. */
  private def evalAt(spark: SparkSession, g: GenInfo, l: Literal): Option[Literal] = {
    if (l.value == null) return None
    try {
      val sub = g.gen.transformUp { case _: UnresolvedAttribute => l }
      val ds = spark.range(1)
        .select(SparkShims.column(sub).cast(g.partField.dataType).as("v"))
      if (!ds.queryExecution.analyzed.expressions.forall(_.deterministic)) return None
      val row = ds.head()
      if (row.isNullAt(0)) None
      else Some(Literal.create(row.get(0), g.partField.dataType))
    } catch { case _: Exception => None }
  }

  private def partAttr(g: GenInfo): AttributeReference =
    AttributeReference(g.physPartName, g.partField.dataType)()

  /** Derived predicates (physical partition space) implied by one filter. */
  private def inferOne(
      spark: SparkSession,
      byBase: Map[String, Seq[GenInfo]],
      filter: Expression): Seq[Expression] = {

    def gens(a: Expression): Seq[GenInfo] = a match {
      case ar: AttributeReference => byBase.getOrElse(ar.name.toLowerCase, Nil)
      case _ => Nil
    }
    def eq(a: Expression, l: Literal): Seq[Expression] =
      gens(a).flatMap(g => evalAt(spark, g, l).map(v => EqualTo(partAttr(g), v)))
    // range inferences need monotonicity and the null guard
    def range(a: Expression, l: Literal, lower: Boolean): Seq[Expression] =
      gens(a).filter(_.monotone).flatMap { g =>
        evalAt(spark, g, l).map { v =>
          val cmp = if (lower) GreaterThanOrEqual(partAttr(g), v)
                    else LessThanOrEqual(partAttr(g), v)
          Or(cmp, IsNull(partAttr(g)))
        }
      }

    filter match {
      case EqualTo(a, l: Literal) => eq(a, l)
      case EqualTo(l: Literal, a) => eq(a, l)
      case EqualNullSafe(a, l: Literal) if l.value != null => eq(a, l)
      case EqualNullSafe(l: Literal, a) if l.value != null => eq(a, l)
      case In(a, elems) if elems.nonEmpty && elems.forall(_.isInstanceOf[Literal]) =>
        gens(a).flatMap { g =>
          val vs = elems.map(e => evalAt(spark, g, e.asInstanceOf[Literal]))
          if (vs.forall(_.isDefined)) Some(In(partAttr(g), vs.flatten.distinct))
          else None
        }
      case GreaterThan(a, l: Literal) => range(a, l, lower = true)
      case GreaterThanOrEqual(a, l: Literal) => range(a, l, lower = true)
      case LessThan(a, l: Literal) => range(a, l, lower = false)
      case LessThanOrEqual(a, l: Literal) => range(a, l, lower = false)
      case GreaterThan(l: Literal, a) => range(a, l, lower = false)
      case GreaterThanOrEqual(l: Literal, a) => range(a, l, lower = false)
      case LessThan(l: Literal, a) => range(a, l, lower = true)
      case LessThanOrEqual(l: Literal, a) => range(a, l, lower = true)
      case And(lf, rf) =>
        inferOne(spark, byBase, lf) ++ inferOne(spark, byBase, rf)
      case Or(lf, rf) =>
        val li = inferOne(spark, byBase, lf)
        val ri = inferOne(spark, byBase, rf)
        if (li.nonEmpty && ri.nonEmpty) Seq(Or(li.reduce(And), ri.reduce(And)))
        else Nil
      case _ => Nil
    }
  }

  /** Partition predicates (physical space, AttributeReference by name —
    * the shape `GraftFileIndex.prunePartitions` binds) implied by the
    * scan's data filters via generated partition columns. */
  def inferPartitionFilters(
      spark: SparkSession,
      m: Metadata,
      dataFilters: Seq[Expression]): Seq[Expression] = {
    if (m.partitionColumns.isEmpty || dataFilters.isEmpty) return Nil
    val gens = genInfos(spark, m)
    if (gens.isEmpty) return Nil
    val byBase = gens.groupBy(_.physBaseName)
    dataFilters.flatMap(f => inferOne(spark, byBase, f))
  }
}
