package graft.sql

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.files.GraftFileIndex

/**
 * Session extension (enable with
 * `spark.sql.extensions=graft.sql.GraftSparkSessionExtension`):
 *
 *  - COUNT(*) over a graft table answers from per-file `numRecords`
 *    stats — a metadata lookup instead of a scan (reference concept:
 *    perf/OptimizeMetadataOnlyDeltaQuery.scala:48-160)
 *  - LIMIT n over a bare graft table pins just enough files to satisfy n
 *    before the scan is planned (reference concept:
 *    stats/PrepareDeltaScan.scala:276-288)
 *  - SQL DML (`MERGE INTO` / `UPDATE` / `DELETE FROM` over graft targets)
 *    routed to the graft commands, plus a delegating parser for
 *    `OPTIMIZE` / `VACUUM` / `DESCRIBE HISTORY` (see GraftSqlSurface)
 */
class GraftSparkSessionExtension extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => MetadataOnlyCountRule)
    ext.injectOptimizerRule(_ => LimitFilePushdownRule)
    ext.injectResolutionRule(session => new GraftDmlRule(session))
    ext.injectParser((session, delegate) => new GraftSqlParser(session, delegate))
  }
}

object GraftRuleUtil {
  def graftIndex(plan: LogicalPlan): Option[(LogicalRelation, GraftFileIndex)] =
    plan match {
      case lr @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location match {
          case gi: GraftFileIndex => Some((lr, gi))
          case _ => None
        }
      case _ => None
    }

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** LOGICAL numRecords per file (physical stats minus deletion-vector
    * cardinality); None if any file lacks stats. */
  def numRecords(index: GraftFileIndex): Option[Seq[Long]] = {
    val counts = index.files.map { f =>
      Option(f.stats).map(s => mapper.readTree(s).path("numRecords"))
        .filter(_.isNumber)
        .map(_.asLong - f.dvCardinality.getOrElse(0L))
    }
    if (counts.forall(_.isDefined)) Some(counts.flatten) else None
  }
}

/** COUNT(*) with no filters/groups -> LocalRelation from file stats. */
object MetadataOnlyCountRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(Nil, aggExprs, child, _) if isCountOnly(aggExprs) =>
      val base = child match {
        case Project(projections, grandchild)
            if projections.forall(_.isInstanceOf[AttributeReference]) => grandchild
        case other => other
      }
      GraftRuleUtil.graftIndex(base) match {
        case Some((_, index)) =>
          GraftRuleUtil.numRecords(index) match {
            case Some(counts) =>
              val total = counts.sum
              val row = InternalRow.fromSeq(aggExprs.map(_ => total))
              LocalRelation(agg.output.map(_.asInstanceOf[AttributeReference]),
                Seq(row))
            case None => agg
          }
        case None => agg
      }
  }

  private def isCountOnly(aggExprs: Seq[NamedExpression]): Boolean =
    aggExprs.nonEmpty && aggExprs.forall {
      case Alias(AggregateExpression(Count(Seq(Literal(_, _))), _, false, None, _), _) => true
      case _ => false
    }
}

/** LIMIT n over a bare graft scan -> pin only enough files to cover n. */
object LimitFilePushdownRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case ll @ LocalLimit(Literal(n: Int, _), child) =>
      GraftRuleUtil.graftIndex(child) match {
        case Some((lr, index)) if index.pinnedFiles.isEmpty =>
          GraftRuleUtil.numRecords(index) match {
            case Some(counts) =>
              val files = index.files
              var acc = 0L
              val keep = files.zip(counts).takeWhile { case (_, c) =>
                val before = acc; acc += c; before < n.toLong
              }.map(_._1)
              val fs = lr.relation.asInstanceOf[HadoopFsRelation]
              val pinned = index.withPinned(keep)
              val newRel = fs.copy(location = pinned)(fs.sparkSession)
              ll.copy(child = lr.copy(relation = newRel))
            case None => ll
          }
        case _ => ll
      }
  }
}
