package graft.sql

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, Literal}
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graftshim.SparkShims
import org.apache.spark.sql.types._

import graft.GraftTable
import graft.commands._
import graft.files.GraftFileIndex
import graft.log.GraftLog

/**
 * SQL DML surface: Spark's own grammar already parses
 * `MERGE INTO / UPDATE / DELETE FROM graft.`/path``; this resolution rule
 * routes those logical nodes over graft targets into the existing
 * command implementations. (Reference concept: DeltaAnalysis.scala:86 +
 * PreprocessTableMerge/Update/Delete, injected at
 * AbstractDeltaSparkSessionExtension.scala:94-105 — re-designed: we
 * compile straight to RunnableCommands holding Columns; name resolution
 * happens inside the commands' own DataFrame plans.)
 */
class GraftDmlRule(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    GraftDml.rewrite(session, plan, substituteRelations = false)
}

object GraftDml {

  /**
   * Route graft-targeted DML nodes to graft commands, and (at parse time
   * only) substitute bare `graft`.`/path` relations with the log-backed
   * scan relation — Spark's own ResolveSQLOnFile rejects non-FileFormat
   * DSv1 sources for direct path queries, and it throws before injected
   * resolution rules get a look, so the parser is the reliable hook.
   */
  def rewrite(
      session: SparkSession,
      plan: LogicalPlan,
      substituteRelations: Boolean): LogicalPlan = plan.transformDown {
    case InsertIntoStatement(GraftWriteTarget(path, _), partitionSpec, userCols,
        query, overwrite, _, byName) =>
      // Without this rewrite, Spark's InsertIntoHadoopFsRelationCommand
      // writes parquet straight into the directory BEHIND the log —
      // silently invisible rows. Route through the transactional write.
      GraftInsertRun(path, rewrite(session, query, substituteRelations = true),
        overwrite, byName,
        staticPartitions = partitionSpec.collect { case (k, Some(v)) => k -> v },
        userCols = userCols)
    case DeleteFromTable(GraftWriteTarget(path, _), cond) =>
      GraftDeleteRun(path, nonTrivial(cond).map(toColumn))
    case UpdateTable(GraftWriteTarget(path, _), assignments, cond) =>
      GraftUpdateRun(path, cond.flatMap(nonTrivial).map(toColumn),
        assignments.map(a => keyPath(a.key) -> toColumn(a.value)).toMap)
    case m: MergeIntoTable if GraftWriteTarget.unapply(m.targetTable).isDefined =>
      val Some((path, targetAlias)) = GraftWriteTarget.unapply(m.targetTable)
      val sourceAlias = m.sourceTable match {
        case SubqueryAlias(id, _) => id.name
        case _ => "__graft_src"
      }
      val clauses =
        m.matchedActions.map {
          case DeleteAction(c) => MatchedDelete(c.map(toColumn))
          case UpdateAction(c, assigns, _) =>
            MatchedUpdate(c.map(toColumn),
              assigns.map(a => keyName(a.key) -> toColumn(a.value)).toMap)
          case UpdateStarAction(c) => MatchedUpdate(c.map(toColumn), null)
          case other => throw new IllegalArgumentException(
            s"Unsupported WHEN MATCHED action: $other")
        } ++ m.notMatchedActions.map {
          case InsertAction(c, assigns) =>
            NotMatchedInsert(c.map(toColumn),
              assigns.map(a => keyName(a.key) -> toColumn(a.value)).toMap)
          case InsertStarAction(c) => NotMatchedInsert(c.map(toColumn), null)
          case other => throw new IllegalArgumentException(
            s"Unsupported WHEN NOT MATCHED action: $other")
        } ++ m.notMatchedBySourceActions.map {
          case DeleteAction(c) => NotMatchedBySourceDelete(c.map(toColumn))
          case UpdateAction(c, assigns, _) =>
            NotMatchedBySourceUpdate(c.map(toColumn),
              assigns.map(a => keyName(a.key) -> toColumn(a.value)).toMap)
          case other => throw new IllegalArgumentException(
            s"Unsupported WHEN NOT MATCHED BY SOURCE action: $other")
        }
      // The source may itself reference graft tables; rewrite it too
      // (it rides the command as a field, outside transformDown's reach).
      val source = rewrite(session, m.sourceTable, substituteRelations = true)
      GraftMergeRun(path, targetAlias.getOrElse("__graft_tgt"), source,
        sourceAlias, toColumn(m.mergeCondition), clauses, m.withSchemaEvolution)
    // SQL time travel (VERSION AS OF / TIMESTAMP AS OF): Spark resolves
    // these through the DSv2 loadTable(ident, version) path, which never
    // reaches v1-registered relations — analysis would fail with
    // UNSUPPORTED_FEATURE.TIME_TRAVEL before any injected rule runs, so
    // the parser hook substitutes the pinned-version scan directly.
    case org.apache.spark.sql.catalyst.analysis.RelationTimeTravel(
        u: UnresolvedRelation, tsExpr, verOpt)
        if substituteRelations && timeTravelTarget(session, u).isDefined =>
      val path = timeTravelTarget(session, u).get
      val table = GraftTable.forPath(session, path)
      val df = verOpt match {
        case Some(v) => table.asOfVersion(v.toLong)
        case None =>
          table.asOfTimestamp(timestampString(tsExpr.getOrElse(
            throw new IllegalArgumentException(
              "time travel needs VERSION AS OF or TIMESTAMP AS OF"))))
      }
      SubqueryAlias(u.multipartIdentifier.last, SparkShims.logicalPlan(df))
    case u: UnresolvedRelation if substituteRelations &&
        GraftTarget.unapply(u).isDefined =>
      graftRelation(session, GraftTarget.unapply(u).get._1)
    // DSv2 writes (df.writeTo, or SQL inserts resolved through the v2
    // path) over graft tables: route into the transactional write.
    case AppendData(r: DataSourceV2Relation, query, _, isByName, _, _)
        if graftV2Path(r).isDefined =>
      GraftInsertRun(graftV2Path(r).get,
        rewrite(session, query, substituteRelations = true),
        overwrite = false, byName = isByName)
    case OverwriteByExpression(r: DataSourceV2Relation, deleteExpr, query,
        _, isByName, _, _) if graftV2Path(r).isDefined =>
      GraftInsertRun(graftV2Path(r).get,
        rewrite(session, query, substituteRelations = true),
        overwrite = true, byName = isByName,
        v2ReplaceWhere = nonTrivial(deleteExpr).map(_.sql))
    case OverwritePartitionsDynamic(r: DataSourceV2Relation, query, _, isByName, _)
        if graftV2Path(r).isDefined =>
      GraftInsertRun(graftV2Path(r).get,
        rewrite(session, query, substituteRelations = true),
        overwrite = true, byName = isByName, dynamicOverwrite = true)
    // DSv2 reads of named graft tables: swap in the log-backed v1 scan
    // relation (honoring a loadTable-pinned time-travel version). Parents
    // may already be resolved against the v2 relation's attribute ids, so
    // the replacement MUST present exactly those ids — a fresh relation's
    // ids would orphan every reference above (MISSING_ATTRIBUTES).
    case r: DataSourceV2Relation
        if r.table.isInstanceOf[graft.catalog.GraftTableV2] =>
      val gt = r.table.asInstanceOf[graft.catalog.GraftTableV2]
      val log = GraftLog.forTable(session, gt.path)
      val snap = gt.timeTravelVersion.map(log.getSnapshotAt)
        .getOrElse(log.update())
      val converted = SparkShims.logicalPlan(
        GraftFileIndex.dataFrame(session, log, snap))
      val byName = converted.output.map(a => a.name.toLowerCase -> a).toMap
      if (r.output.forall(o => byName.contains(o.name.toLowerCase))) {
        val aliases = r.output.map { out =>
          val src = byName(out.name.toLowerCase)
          org.apache.spark.sql.catalyst.expressions.Alias(src, out.name)(
            exprId = out.exprId, qualifier = out.qualifier)
        }
        Project(aliases, converted)
      } else converted
    // TBLPROPERTIES must land in the log (the v1 AlterTableSetProperties
    // command would otherwise touch only the metastore).
    case s @ SetTableProperties(t, props) =>
      alterTarget(session, t).map { case (path, ident) =>
        GraftAlterRun(path, ident, _.upsertProperties(props)): LogicalPlan
      }.getOrElse(s)
    case u @ UnsetTableProperties(t, keys, _) =>
      alterTarget(session, t).map { case (path, ident) =>
        GraftAlterRun(path, ident, _.removeProperties(keys)): LogicalPlan
      }.getOrElse(u)
    // ALTER TABLE column DDL (top-level fields; graft paths or named
    // graft tables — the v2 AlterTableExec path would otherwise change
    // only the metastore, diverging from the transaction log).
    case r @ RenameColumn(t, colName, newName) =>
      alterTarget(session, t).map { case (path, ident) =>
        GraftAlterRun(path, ident,
          tbl => tbl.renameColumn(fieldName(colName), newName)): LogicalPlan
      }.getOrElse(r)
    case d @ DropColumns(t, cols, _) =>
      alterTarget(session, t).map { case (path, ident) =>
        val names = cols.map(fieldName)
        GraftAlterRun(path, ident, tbl => names.foreach(tbl.dropColumn)): LogicalPlan
      }.getOrElse(d)
    case ac @ AlterColumns(t, specs)
        if specs.forall(s => s.newDataType.isDefined && s.newNullability.isEmpty &&
          s.newComment.isEmpty && s.newPosition.isEmpty &&
          s.newDefaultExpression.isEmpty && s.column.name.length == 1) =>
      alterTarget(session, t).map { case (path, ident) =>
        val changes = specs.map(s => s.column.name.head -> s.newDataType.get)
        GraftAlterRun(path, ident, tbl =>
          changes.foreach { case (c, dt) => tbl.alterColumnType(c, dt) }): LogicalPlan
      }.getOrElse(ac)
    // ALTER COLUMN ... SET DEFAULT <expr> / DROP DEFAULT
    case ac @ AlterColumns(t, specs)
        if specs.forall(s => s.newDataType.isEmpty && s.newNullability.isEmpty &&
          s.newComment.isEmpty && s.newPosition.isEmpty &&
          (s.newDefaultExpression.isDefined || s.dropDefault) &&
          s.column.name.length == 1) =>
      alterTarget(session, t).map { case (path, ident) =>
        val changes = specs.map(s => s.column.name.head ->
          (if (s.dropDefault) None else s.newDefaultExpression.map(_.originalSQL)))
        GraftAlterRun(path, ident, tbl =>
          changes.foreach { case (c, d) => tbl.alterColumnDefault(c, d) }): LogicalPlan
      }.getOrElse(ac)
    case a @ AddColumns(t, cols) =>
      alterTarget(session, t).map { case (path, ident) =>
        val fields = cols.map { c =>
          require(c.path.isEmpty && c.position.isEmpty,
            "only plain top-level ADD COLUMN is supported for graft tables")
          val base = org.apache.spark.sql.types.StructField(c.colName, c.dataType)
          c.default.map(d => base.copy(metadata =
            new org.apache.spark.sql.types.MetadataBuilder()
              .putString(graft.schema.ColumnDefaults.DEFAULT_KEY, d.originalSQL)
              .build())).getOrElse(base)
        }
        GraftAlterRun(path, ident, tbl => fields.foreach(tbl.addColumn)): LogicalPlan
      }.getOrElse(a)
  }

  private def fieldName(f: org.apache.spark.sql.catalyst.analysis.FieldName): String =
    f.name.mkString(".")

  /** ALTER targets parse as UnresolvedTable; accept graft paths and
    * catalog tables whose provider is graft (returning the identifier so
    * the command can sync the metastore's schema copy afterwards). */
  private def alterTarget(
      session: SparkSession,
      plan: LogicalPlan): Option[(String, Option[TableIdentifier])] = plan match {
    case t: org.apache.spark.sql.catalyst.analysis.UnresolvedTable
        if t.multipartIdentifier.length == 2 &&
          t.multipartIdentifier.head.equalsIgnoreCase("graft") &&
          t.multipartIdentifier(1).contains("/") =>
      Some((t.multipartIdentifier(1), None))
    case t: org.apache.spark.sql.catalyst.analysis.UnresolvedTable
        if t.multipartIdentifier.length <= 2 =>
      namedGraftLocation(session, t.multipartIdentifier)
    case _ => None
  }

  private[sql] def namedGraftLocation(
      session: SparkSession,
      ident: Seq[String]): Option[(String, Option[TableIdentifier])] = {
    try {
      val cat = session.sessionState.catalog
      val ti = ident match {
        case Seq(t) => TableIdentifier(t)
        case Seq(db, t) => TableIdentifier(t, Some(db))
        case _ => return None
      }
      if (!cat.tableExists(ti)) return None
      val meta = cat.getTableMetadata(ti)
      if (meta.provider.exists(_.equalsIgnoreCase("graft")))
        Some((meta.location.toString, Some(ti)))
      else None
    } catch { case _: Exception => None }
  }

  private def graftV2Path(r: DataSourceV2Relation): Option[String] =
    r.table match {
      case gt: graft.catalog.GraftTableV2 => Some(gt.path)
      case _ => None
    }

  /** Log-backed scan relation for `graft`.`/path` in plain queries. */
  /** The graft location a time-travel relation points at: a `graft.`
    * path or a metastore table registered with the graft provider. */
  private def timeTravelTarget(
      session: SparkSession, u: UnresolvedRelation): Option[String] =
    u.multipartIdentifier match {
      case Seq(g, p) if g.equalsIgnoreCase("graft") && p.contains("/") =>
        Some(p)
      case parts if parts.length <= 2 =>
        namedGraftLocation(session, parts).map(_._1)
      case _ => None
    }

  /** Evaluate a TIMESTAMP AS OF operand to a `Timestamp.valueOf`-shaped
    * string (date-only literals gain midnight). */
  private def timestampString(e: Expression): String = {
    val s = e.eval(null) match {
      case u8: org.apache.spark.unsafe.types.UTF8String => u8.toString
      case micros: java.lang.Long =>
        new java.sql.Timestamp(micros / 1000L).toString
      case other => String.valueOf(other)
    }
    if (s.matches("""\d{4}-\d{2}-\d{2}""")) s + " 00:00:00" else s
  }

  def graftRelation(session: SparkSession, path: String): LogicalPlan = {
    val log = GraftLog.forTable(session, path)
    require(log.tableExists, s"$path is not a graft table")
    SparkShims.logicalPlan(
      GraftFileIndex.dataFrame(session, log, log.update()))
  }

  private def nonTrivial(e: Expression): Option[Expression] = e match {
    case Literal(true, BooleanType) => None
    case other => Some(other)
  }

  /** Analysis may have bound attrs to the original plan's exprIds; the
    * commands re-scan the table with fresh ids, so strip back to names
    * (keeping alias qualifiers for merge's t./s. references). */
  private def unresolve(e: Expression): Expression = e.transform {
    case a: AttributeReference => UnresolvedAttribute(a.qualifier :+ a.name)
  }

  private def toColumn(e: Expression): Column = SparkShims.column(unresolve(e))

  /** Full dotted path of an UPDATE assignment key (nested SET support;
    * the command strips a leading alias segment against the schema). */
  private def keyPath(key: Expression): String = key match {
    case a: AttributeReference => a.name
    case u: UnresolvedAttribute => u.nameParts.mkString(".")
    case other => throw new IllegalArgumentException(s"Unsupported assignment key: $other")
  }

  private def keyName(key: Expression): String = key match {
    case a: AttributeReference => a.name
    case u: UnresolvedAttribute => u.nameParts.last
    case other => throw new IllegalArgumentException(s"Unsupported assignment key: $other")
  }
}

/** Recognize a graft table target: `graft`.`/path` identifiers (possibly
  * aliased), an already-resolved graft scan relation, or a catalog table
  * whose provider is graft (named tables resolve to
  * UnresolvedCatalogRelation during the main resolution batch — the
  * LogicalRelation conversion happens post-hoc, after our rule). */
/** DML / INSERT target matcher: everything [[GraftTarget]] accepts,
  * plus parse-time resolution of NAMED graft tables. A DML target can
  * never be a CTE (and temp views are checked explicitly), so the
  * name -> catalog lookup that would be unsafe for general relations —
  * CTEs shadow table names — is safe in target position. */
object GraftWriteTarget {
  def unapply(plan: LogicalPlan): Option[(String, Option[String])] = plan match {
    case SubqueryAlias(id, child) =>
      unapply(child).map { case (p, _) => (p, Some(id.name)) }
    case u: UnresolvedRelation =>
      GraftTarget.unapply(u).orElse {
        val session = SparkSession.active
        val noTempShadow = u.multipartIdentifier match {
          case Seq(t) => session.sessionState.catalog.getTempView(t).isEmpty
          case _ => true
        }
        if (noTempShadow)
          GraftDml.namedGraftLocation(session, u.multipartIdentifier)
            .map { case (p, _) => (p, None) }
        else None
      }
    case other => GraftTarget.unapply(other)
  }
}

object GraftTarget {
  def unapply(plan: LogicalPlan): Option[(String, Option[String])] = plan match {
    case SubqueryAlias(id, child) =>
      unapply(child).map { case (p, _) => (p, Some(id.name)) }
    case u: UnresolvedRelation
        if u.multipartIdentifier.length == 2 &&
          u.multipartIdentifier.head.equalsIgnoreCase("graft") &&
          u.multipartIdentifier(1).contains("/") =>  // a path, not a db.table
      Some((u.multipartIdentifier(1), None))
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      fs.location match {
        case gi: GraftFileIndex => Some((gi.rootPaths.head.toString, None))
        case _ => None
      }
    case r: org.apache.spark.sql.catalyst.catalog.UnresolvedCatalogRelation
        if r.tableMeta.provider.exists(_.equalsIgnoreCase("graft")) =>
      Some((r.tableMeta.location.toString, None))
    case r: DataSourceV2Relation => r.table match {
      case gt: graft.catalog.GraftTableV2 => Some((gt.path, None))
      case _ => None
    }
    case _ => None
  }
}

/** Spark's session catalog caches resolved relations (pinned at a
  * snapshot); DML through the graft commands must drop those entries or
  * named-table reads keep serving the pre-DML version. */
object GraftCatalogCache {
  def invalidate(spark: SparkSession): Unit =
    spark.sessionState.catalog.invalidateAllCachedTables()
}


/** num_affected_rows for SQL DML results (the reference's DELETE/UPDATE/
  * MERGE SQL output): read from the just-committed version's CommitInfo
  * metrics — metadata-scale, no data scan. -1 when the command recorded
  * no row count (e.g. whole-table delete by file removal). */
object GraftDmlMetrics {
  private val rowAttr = AttributeReference("num_affected_rows",
    LongType, nullable = false)()
  def output: Seq[Attribute] = Seq(rowAttr)
  def mergeOutput: Seq[Attribute] = Seq(
    AttributeReference("num_affected_rows", LongType, nullable = false)(),
    AttributeReference("num_updated_rows", LongType, nullable = false)(),
    AttributeReference("num_deleted_rows", LongType, nullable = false)(),
    AttributeReference("num_inserted_rows", LongType, nullable = false)())
  /** MERGE result row from the just-committed metrics (reference SQL
    * output shape); -1 for counts the command could not derive. */
  def mergeAffected(spark: SparkSession, path: String): Seq[Row] = {
    val log = GraftLog.forTable(spark, path)
    val metrics = log.readCommit(log.update().version).collectFirst {
      case ci: graft.log.CommitInfo => ci.operationMetrics
    }.getOrElse(Map.empty)
    def g(k: String): Long = metrics.get(k).map(_.toLong).getOrElse(-1L)
    val (u, d, i) = (g("numTargetRowsUpdated"), g("numTargetRowsDeleted"),
      g("numTargetRowsInserted"))
    val total = if (u >= 0 && d >= 0 && i >= 0) u + d + i else -1L
    Seq(Row(total, u, d, i))
  }
  def affected(spark: SparkSession, path: String, keys: Seq[String]): Seq[Row] = {
    val log = GraftLog.forTable(spark, path)
    val metrics = log.readCommit(log.update().version).collectFirst {
      case ci: graft.log.CommitInfo => ci.operationMetrics
    }.getOrElse(Map.empty)
    val n = keys.flatMap(k => metrics.get(k).map(_.toLong)).sum
    Seq(Row(if (keys.exists(metrics.contains)) n else -1L))
  }
}

case class GraftDeleteRun(path: String, cond: Option[Column])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftDmlMetrics.output
  override def run(spark: SparkSession): Seq[Row] = {
    DeleteCommand.run(spark, path, cond)
    GraftCatalogCache.invalidate(spark)
    GraftDmlMetrics.affected(spark, path, Seq("numDeletedRows"))
  }
}

case class GraftInsertRun(
    path: String, query: LogicalPlan, overwrite: Boolean, byName: Boolean,
    staticPartitions: Map[String, String] = Map.empty,
    userCols: Seq[String] = Nil,
    v2ReplaceWhere: Option[String] = None,
    dynamicOverwrite: Boolean = false)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{col, lit}
    val df = SparkShims.ofRows(spark, query)
    val m = GraftLog.forTable(spark, path).update().metadata
    val schema = m.schema
    staticPartitions.keys.foreach { k =>
      require(m.partitionColumns.exists(_.equalsIgnoreCase(k)),
        s"PARTITION column $k is not a partition column of $path")
    }
    userCols.foreach { c =>
      require(schema.fieldNames.exists(_.equalsIgnoreCase(c)),
        s"INSERT column $c is not in the table schema")
    }
    val aligned =
      if (byName) df
      else {
        // SQL INSERT is positional: the query supplies the explicit
        // column list if given, otherwise every column except the
        // statically-pinned partition values, in table order. Columns
        // left out must be fillable (generated/identity/nullable).
        val targetNames: Seq[String] =
          if (userCols.nonEmpty) userCols
          else schema.fields.filterNot(f =>
            staticPartitions.keys.exists(_.equalsIgnoreCase(f.name)))
            .map(_.name).toSeq
        require(df.columns.length == targetNames.length,
          s"INSERT column count ${df.columns.length} does not match " +
            s"expected ${targetNames.length}")
        df.toDF(targetNames: _*)
      }
    val withStatic = staticPartitions.foldLeft(aligned) { case (d, (k, v)) =>
      val f = schema.fields.find(_.name.equalsIgnoreCase(k)).get
      d.withColumn(f.name, lit(v).cast(f.dataType))
    }
    // ANSI store assignment: cast the supplied columns to the table's
    // types; omitted columns are filled downstream (generated/identity
    // defaults, then null-fill by schema normalization).
    val present = schema.fields.filter(f =>
      withStatic.columns.exists(_.equalsIgnoreCase(f.name)))
    val casted = withStatic.select(present.map(f =>
      col(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
    // INSERT OVERWRITE ... PARTITION (p='v') replaces only that partition.
    // The literal is CAST to the column type — the predicate is evaluated
    // interpreted (no analyzer implicit casts) during file selection.
    val replaceWhere =
      if (overwrite && staticPartitions.nonEmpty)
        Some(staticPartitions.map { case (k, v) =>
          val f = schema.fields.find(_.name.equalsIgnoreCase(k)).get
          s"$k = CAST('${v.replace("'", "\\'")}' AS ${f.dataType.sql})"
        }.mkString(" AND "))
      else None
    WriteIntoGraft(spark, path, casted,
      mode = if (overwrite) "overwrite" else "append",
      replaceWhere = replaceWhere.orElse(v2ReplaceWhere),
      dynamicPartitionOverwrite = dynamicOverwrite)
    GraftCatalogCache.invalidate(spark)
    Nil
  }
}

case class GraftUpdateRun(
    path: String, cond: Option[Column], set: Map[String, Column])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftDmlMetrics.output
  override def run(spark: SparkSession): Seq[Row] = {
    UpdateCommand.run(spark, path, cond, set)
    GraftCatalogCache.invalidate(spark)
    GraftDmlMetrics.affected(spark, path, Seq("numUpdatedRows"))
  }
}

case class GraftMergeRun(
    path: String,
    targetAlias: String,
    sourcePlan: LogicalPlan,
    sourceAlias: String,
    condition: Column,
    clauses: Seq[MergeClause],
    schemaEvolution: Boolean = false)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftDmlMetrics.mergeOutput
  override def run(spark: SparkSession): Seq[Row] = {
    val table = GraftTable.forPath(spark, path)
    val source = SparkShims.ofRows(spark, sourcePlan)
    MergeCommand.run(table, source, condition, clauses, targetAlias,
      sourceAlias, schemaEvolution)
    GraftCatalogCache.invalidate(spark)
    GraftDmlMetrics.mergeAffected(spark, path)
  }
}

case class GraftOptimizeRun(
    path: String, where: Option[String], zorderBy: Seq[String],
    full: Boolean = false)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("metric", StringType)(),
    AttributeReference("value", StringType)())
  override def run(spark: SparkSession): Seq[Row] = {
    var b = GraftTable.forPath(spark, path).optimize()
    if (full) b = b.full()
    where.foreach(b.where)
    val df = if (zorderBy.nonEmpty) b.executeZOrderBy(zorderBy: _*)
             else b.executeCompaction()
    GraftCatalogCache.invalidate(spark)
    df.collect().toSeq
  }
}

case class GraftVacuumRun(path: String, hours: Option[Double],
    dryRun: Boolean, lite: Boolean = false,
    inventoryQuery: Option[String] = None)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("path", StringType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val log = GraftLog.forTable(spark, path)
    VacuumCommand.run(spark, log,
      hours.getOrElse(VacuumCommand.defaultRetentionHours), dryRun, lite,
      inventoryQuery.map(spark.sql))
      .collect().toSeq
  }
}

case class GraftAlterRun(
    path: String,
    ident: Option[TableIdentifier],
    body: GraftTable => Unit)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    body(GraftTable.forPath(spark, path))
    // Keep the metastore's schema copy in step with the log (reads come
    // from the log regardless, but DESCRIBE via the metastore should
    // not show stale column names).
    ident.foreach { ti =>
      val m = GraftLog.forTable(spark, path).update().metadata
      try {
        // SessionCatalog.alterTableDataSchema refuses drops/renames, so
        // go through the external catalog; the copy is cosmetic anyway
        // (reads come from the log), so failures are non-fatal.
        val cat = spark.sessionState.catalog
        cat.externalCatalog.alterTableDataSchema(
          ti.database.getOrElse(cat.getCurrentDatabase), ti.table, m.dataSchema)
      } catch { case _: Exception => () }
    }
    GraftCatalogCache.invalidate(spark)
    Nil
  }
}

case class GraftConvertRun(path: String, provider: String = "parquet",
    sync: Boolean = false)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    if (sync) {
      require(provider.equalsIgnoreCase("delta"),
        "CONVERT ... SYNC applies only to delta sources")
      graft.Graft.syncFromDelta(spark, path)
    } else if (provider.equalsIgnoreCase("delta"))
      graft.Graft.convertFromDelta(spark, path)
    else graft.Graft.convertFromParquet(spark, path)
    Nil
  }
}

case class GraftGenerateRun(path: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    GraftTable.forPath(spark, path).generateSymlinkManifest()
    Nil
  }
}

case class GraftShowPartitionsRun(path: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("partitionValues", MapType(StringType, StringType))())
  override def run(spark: SparkSession): Seq[Row] =
    GraftTable.forPath(spark, path).showPartitions().collect().toSeq
}

case class GraftShowColumnsRun(path: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("col_name", StringType)())
  override def run(spark: SparkSession): Seq[Row] =
    graft.log.GraftLog.forTable(spark, path).update()
      .metadata.schema.fieldNames.toSeq.map(Row(_))
}

case class GraftDetailRun(path: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("format", StringType)(),
    AttributeReference("id", StringType)(),
    AttributeReference("location", StringType)(),
    AttributeReference("createdTime", LongType)(),
    AttributeReference("version", LongType)(),
    AttributeReference("partitionColumns", ArrayType(StringType))(),
    AttributeReference("numFiles", LongType)(),
    AttributeReference("sizeInBytes", LongType)(),
    AttributeReference("properties", MapType(StringType, StringType))(),
    AttributeReference("minReaderVersion", IntegerType)(),
    AttributeReference("minWriterVersion", IntegerType)(),
    AttributeReference("tableReaderFeatures", ArrayType(StringType))(),
    AttributeReference("tableWriterFeatures", ArrayType(StringType))())
  override def run(spark: SparkSession): Seq[Row] =
    GraftTable.forPath(spark, path).detail().collect().toSeq
}

case class GraftRestoreRun(path: String, version: Long)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    GraftTable.forPath(spark, path).restoreToVersion(version)
    GraftCatalogCache.invalidate(spark)
    Nil
  }
}

/** INSERT INTO t REPLACE ON <cond> <query> / REPLACE USING (cols) <query>:
  * atomically insert the query's rows and delete the existing rows they
  * match. The condition references the target as `t` and the inserted
  * rows as `s` (merge's convention). */
/** INSERT INTO t REPLACE WHERE <cond> <query>: the replaceWhere write
  * through SQL (reference DeltaSuite "INSERT INTO ... REPLACE WHERE"). */
case class GraftInsertReplaceWhereRun(
    path: String, condText: String, queryText: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    val df = spark.sql(queryText)
    WriteIntoGraft(spark, path, df, mode = "overwrite",
      replaceWhere = Some(condText))
    GraftCatalogCache.invalidate(spark)
    Nil
  }
}

case class GraftInsertReplaceRun(
    path: String,
    condText: Option[String],
    usingCols: Option[Seq[String]],
    queryText: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    val df = spark.sql(queryText)
    val t = GraftTable.forPath(spark, path)
    usingCols match {
      case Some(cs) => t.insertReplaceUsing(df, cs)
      case None => t.insertReplaceOn(df, condText.get)
    }
    Nil
  }
}

case class GraftShowPropsRun(path: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("key", StringType)(),
    AttributeReference("value", StringType)())
  override def run(spark: SparkSession): Seq[Row] =
    GraftLog.forTable(spark, path).update().metadata.configuration
      .toSeq.sortBy(_._1).map { case (k, v) => Row(k, v) }
}

/** CREATE TABLE ... LIKE src (empty table, same definition) and
  * CREATE TABLE ... SHALLOW CLONE src (same definition + the source's
  * current files by absolute reference, no data copied). The target may
  * be a catalog name (registered in the metastore) or a graft path. */
case class GraftCreateLikeRun(
    target: String, srcPath: String, location: Option[String],
    shallowClone: Boolean,
    version: Option[Long] = None, timestamp: Option[String] = None)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    val isPath = target.contains("/")
    val ident =
      if (isPath) None
      else Some(spark.sessionState.sqlParser.parseTableIdentifier(target))
    val loc = location.getOrElse {
      if (isPath) target
      else spark.sessionState.catalog.defaultTablePath(ident.get).toString
    }
    val srcLog = GraftLog.forTable(spark, srcPath)
    require(srcLog.tableExists, s"$srcPath is not a graft table")
    if (shallowClone) {
      val src = GraftTable.forPath(spark, srcPath)
      val pinned = version.orElse(timestamp.map(ts => srcLog.getVersionAtTime(
        graft.log.GraftLog.parseUserTimestamp(ts))))
      pinned match {
        case Some(v) => src.cloneAtVersion(v, loc)
        case None => src.shallowCloneTo(loc)
      }
    } else {
      val m = srcLog.update().metadata
      graft.Graft.create(spark, loc, m.schema, m.partitionColumns, m.configuration)
    }
    ident.foreach(ti => graft.catalog.GraftCatalog.register(
      spark, ti, loc, external = location.isDefined))
    GraftCatalogCache.invalidate(spark)
    Nil
  }
}

case class GraftRestoreTsRun(path: String, timestamp: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    val log = GraftLog.forTable(spark, path)
    val v = log.getVersionAtTime(
      graft.log.GraftLog.parseUserTimestamp(timestamp))
    GraftTable.forPath(spark, path).restoreToVersion(v)
    GraftCatalogCache.invalidate(spark)
    Nil
  }
}

case class GraftReorgRun(path: String, where: Option[String] = None)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("metric", StringType)(),
    AttributeReference("value", StringType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftTable.forPath(spark, path)
    val rows = where.map(t.reorgPurge).getOrElse(t.reorgPurge())
      .collect().toSeq
    GraftCatalogCache.invalidate(spark)
    rows
  }
}

case class GraftHistoryRun(path: String, limit: Option[Int])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType)(),
    AttributeReference("timestamp", TimestampType)(),
    AttributeReference("operation", StringType)(),
    AttributeReference("operationParameters", MapType(StringType, StringType))(),
    AttributeReference("readVersion", LongType)(),
    AttributeReference("operationMetrics", MapType(StringType, StringType))())
  override def run(spark: SparkSession): Seq[Row] = {
    GraftTable.forPath(spark, path)
      .history(limit.getOrElse(Int.MaxValue)).collect().toSeq
  }
}

/**
 * Hand-rolled parser for the three maintenance statements Spark's grammar
 * lacks — `OPTIMIZE`, `VACUUM`, `DESCRIBE HISTORY` — delegating everything
 * else. The grammar is small enough that regexes beat an ANTLR build
 * (reference grammar: io/delta/sql/parser/DeltaSqlBase.g4:74-125 +
 * delegating parser DeltaSqlParser.scala:74-167 — re-designed).
 */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {
  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan =
    parseMaintenance(sqlText, resolveTarget)
      .orElse(parseAlterExtras(sqlText))
      .getOrElse(GraftDml.rewrite(session, delegate.parsePlan(sqlText),
        substituteRelations = true))

  /** ALTER TABLE forms Spark's v2 path would apply to the metastore only
    * (or reject): CHECK constraints and TBLPROPERTIES must land in the
    * transaction log. Non-graft targets fall through to the delegate. */
  private def parseAlterExtras(sqlText: String): Option[LogicalPlan] = sqlText match {
    case insertReplaceWhereRe(t, cond, query) =>
      resolveTarget(t).map(p => GraftInsertReplaceWhereRun(p, cond.trim, query))
    case insertReplaceOnRe(t, cond, query) =>
      resolveTarget(t).map(p =>
        GraftInsertReplaceRun(p, Some(cond.trim), None, query))
    case insertReplaceUsingRe(t, cols, query) =>
      resolveTarget(t).map(p => GraftInsertReplaceRun(p, None,
        Some(cols.split(",").toSeq.map(c => stripQuotes(c.trim))), query))
    case showPropsRe(t) =>
      resolveTarget(t).map(GraftShowPropsRun.apply)
    case createLikeRe(tgt, src, loc) =>
      resolveTarget(src).map { srcPath =>
        GraftCreateLikeRun(targetPath(tgt), srcPath, Option(loc),
          shallowClone = false)
      }
    case cloneRe(tgt, src, ver, ts, loc) =>
      resolveTarget(src).map { srcPath =>
        GraftCreateLikeRun(targetPath(tgt), srcPath, Option(loc),
          shallowClone = true,
          version = Option(ver).map(_.toLong), timestamp = Option(ts))
      }
    case addConstraintRe(t, name, check) =>
      resolveGraft(t).map { case (path, ident) =>
        GraftAlterRun(path, ident, _.addCheckConstraint(name, check.trim))
      }
    case dropConstraintRe(t, name) =>
      resolveGraft(t).map { case (path, ident) =>
        GraftAlterRun(path, ident, _.dropCheckConstraint(name))
      }
    case clusterByRe(t, cols, none) =>
      resolveGraft(t).map { case (path, ident) =>
        GraftAlterRun(path, ident, tbl =>
          if (none != null) tbl.removeProperties(Seq("graft.clusterBy"))
          else tbl.upsertProperties(Map("graft.clusterBy" ->
            cols.split(",").map(c => stripQuotes(c.trim).stripPrefix("`")
              .stripSuffix("`")).filter(_.nonEmpty).mkString(","))))
      }
    case syncIdentityRe(t) =>
      resolveGraft(t).map { case (path, ident) =>
        GraftAlterRun(path, ident, _.syncIdentity())
      }
    case dropFeatureRe(t, feature, trunc) =>
      resolveGraft(t).map { case (path, ident) =>
        GraftAlterRun(path, ident, _.dropFeature(feature, trunc != null))
      }
    // Path targets only: named tables route through the DSv2 catalog,
    // which mirrors properties into both the log and the metastore.
    case setPropsRe(t, kvs) if targetPath(t).contains("/") =>
      Some(GraftAlterRun(targetPath(t), None, _.upsertProperties(parseKvs(kvs))))
    case unsetPropsRe(t, ks) if targetPath(t).contains("/") =>
      Some(GraftAlterRun(targetPath(t), None, _.removeProperties(
        ks.split(",").toSeq.map(k => stripQuotes(k.trim)).filter(_.nonEmpty))))
    case _ => None
  }

  /** Path targets pass through; bare names resolve to the location of a
    * graft-provider catalog table (None otherwise -> delegate). */
  private def resolveTarget(raw: String): Option[String] =
    resolveGraft(raw).map(_._1)

  private def resolveGraft(raw: String): Option[(String, Option[TableIdentifier])] = {
    val t = targetPath(raw)
    if (t.contains("/")) return Some((t, None))
    try {
      val cat = session.sessionState.catalog
      val ti = delegate.parseTableIdentifier(t)
      if (!cat.tableExists(ti)) return None
      val meta = cat.getTableMetadata(ti)
      if (meta.provider.exists(_.equalsIgnoreCase("graft")))
        Some((meta.location.toString, Some(ti)))
      else None
    } catch { case _: Exception => None }
  }

  private def parseKvs(kvs: String): Map[String, String] =
    kvs.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { kv =>
      val Array(k, v) = kv.split("=", 2)
      stripQuotes(k.trim) -> stripQuotes(v.trim)
    }.toMap

  private def stripQuotes(s: String): String =
    if (s.length >= 2 && "'\"`".contains(s.head) && s.last == s.head)
      s.substring(1, s.length - 1)
    else s

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {
  // Target forms: 'path' | "path" | `path` | graft.`path`
  private val target = """(?:'[^']+'|"[^"]+"|graft\.`[^`]+`|`[^`]+`)"""
  // ... or a plain table name, resolved through the session catalog.
  private val targetOrName = s"""(?:$target|[A-Za-z_][\\w.]*)"""
  private val optimizeRe =
    (s"""(?is)^\\s*OPTIMIZE\\s+($targetOrName)(?:\\s+(FULL))?(?:\\s+WHERE\\s+(.+?))?""" +
      s"""(?:\\s+ZORDER\\s+BY\\s+\\(?\\s*([\\w`,\\s]+?)\\s*\\)?)?\\s*;?\\s*$$""").r
  private val vacuumRe =
    (s"""(?is)^\\s*VACUUM\\s+($targetOrName)""" +
      """(?:\s+USING\s+INVENTORY\s+\((.+?)\))?""" +
      """(?:\s+RETAIN\s+([0-9.]+)\s+HOURS?)?""" +
      """(\s+LITE)?(\s+DRY\s+RUN)?\s*;?\s*$""").r
  private val historyRe =
    (s"""(?is)^\\s*(?:DESC|DESCRIBE)\\s+HISTORY\\s+($targetOrName)""" +
      """(?:\s+LIMIT\s+(\d+))?\s*;?\s*$""").r
  private val detailRe =
    s"""(?is)^\\s*(?:DESC|DESCRIBE)\\s+DETAIL\\s+($targetOrName)\\s*;?\\s*$$""".r
  private val restoreRe =
    (s"""(?is)^\\s*RESTORE\\s+(?:TABLE\\s+)?($targetOrName)\\s+(?:TO\\s+)?""" +
      """VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*$""").r
  private val restoreTsRe =
    (s"""(?is)^\\s*RESTORE\\s+(?:TABLE\\s+)?($targetOrName)\\s+(?:TO\\s+)?""" +
      """TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*$""").r
  private val reorgRe =
    (s"""(?is)^\\s*REORG\\s+(?:TABLE\\s+)?($targetOrName)""" +
      """(?:\s+WHERE\s+(.+?))?\s+APPLY\s*\(\s*PURGE\s*\)\s*;?\s*$""").r
  private val convertRe =
    (s"""(?is)^\\s*CONVERT\\s+TO\\s+GRAFT\\s+(?:(parquet|delta)\\.)?($target)""" +
      """(\s+SYNC)?\s*;?\s*$""").r
  private val generateRe =
    (s"""(?is)^\\s*GENERATE\\s+symlink_format_manifest\\s+FOR\\s+TABLE\\s+""" +
      s"""($targetOrName)\\s*;?\\s*$$""").r
  private val showPartsRe =
    s"""(?is)^\\s*SHOW\\s+PARTITIONS\\s+($targetOrName)\\s*;?\\s*$$""".r
  private val showColumnsRe =
    (s"""(?is)^\\s*SHOW\\s+COLUMNS\\s+(?:IN|FROM)\\s+($targetOrName)""" +
      """\s*;?\s*$""").r
  private val syncIdentityRe =
    (s"""(?is)^\\s*ALTER\\s+TABLE\\s+($targetOrName)\\s+SYNC\\s+IDENTITY""" +
      """\s*;?\s*$""").r
  private val dropFeatureRe =
    (s"""(?is)^\\s*ALTER\\s+TABLE\\s+($targetOrName)\\s+DROP\\s+FEATURE\\s+""" +
      """`?(\w+)`?(\s+TRUNCATE\s+HISTORY)?\s*;?\s*$""").r
  private val showPropsRe =
    s"""(?is)^\\s*SHOW\\s+TBLPROPERTIES\\s+($targetOrName)\\s*;?\\s*$$""".r
  private val createLikeRe =
    (s"""(?is)^\\s*CREATE\\s+TABLE\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?""" +
      s"""($targetOrName)\\s+LIKE\\s+($targetOrName)""" +
      """(?:\s+USING\s+graft)?(?:\s+LOCATION\s+'([^']+)')?\s*;?\s*$""").r
  private val cloneRe =
    (s"""(?is)^\\s*CREATE\\s+(?:OR\\s+REPLACE\\s+)?TABLE\\s+""" +
      s"""(?:IF\\s+NOT\\s+EXISTS\\s+)?($targetOrName)\\s+SHALLOW\\s+CLONE\\s+""" +
      s"""($targetOrName)""" +
      """(?:\s+VERSION\s+AS\s+OF\s+(\d+)|\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)')?""" +
      """(?:\s+LOCATION\s+'([^']+)')?\s*;?\s*$""").r
  private val addConstraintRe =
    (s"""(?is)^\\s*ALTER\\s+TABLE\\s+($targetOrName)\\s+ADD\\s+CONSTRAINT\\s+""" +
      """(\w+)\s+CHECK\s*\((.+)\)\s*;?\s*$""").r
  private val dropConstraintRe =
    (s"""(?is)^\\s*ALTER\\s+TABLE\\s+($targetOrName)\\s+DROP\\s+CONSTRAINT\\s+""" +
      """(?:IF\s+EXISTS\s+)?(\w+)\s*;?\s*$""").r
  // INSERT INTO t REPLACE WHERE <cond> <query>: overwrite rows matching
  // a TARGET-side predicate with the query's rows (the replaceWhere
  // write), per the reference's SQL grammar.
  private val insertReplaceWhereRe =
    (s"""(?is)^\\s*INSERT\\s+INTO\\s+($targetOrName)\\s+REPLACE\\s+WHERE\\s+""" +
      """(.+?)\s+((?:SELECT|VALUES|WITH|TABLE|FROM)\b.*?)\s*;?\s*$""").r
  // INSERT INTO t REPLACE ON <cond> <query> / REPLACE USING (c1..cn) <query>.
  // The condition runs lazily up to the query head keyword — a condition
  // containing a scalar subquery needs the Scala API.
  private val insertReplaceOnRe =
    (s"""(?is)^\\s*INSERT\\s+INTO\\s+($targetOrName)\\s+REPLACE\\s+ON\\s+""" +
      """(.+?)\s+((?:SELECT|VALUES|WITH|TABLE|FROM)\b.*?)\s*;?\s*$""").r
  private val insertReplaceUsingRe =
    (s"""(?is)^\\s*INSERT\\s+INTO\\s+($targetOrName)\\s+REPLACE\\s+USING\\s*""" +
      """\(([^)]+)\)\s*((?:SELECT|VALUES|WITH|TABLE|FROM)\b.*?)\s*;?\s*$""").r
  private val clusterByRe =
    (s"""(?is)^\\s*ALTER\\s+TABLE\\s+($targetOrName)\\s+CLUSTER\\s+BY\\s*""" +
      """(?:\(([^)]+)\)|(NONE))\s*;?\s*$""").r
  private val setPropsRe =
    (s"""(?is)^\\s*ALTER\\s+TABLE\\s+($target)\\s+SET\\s+TBLPROPERTIES\\s*""" +
      """\((.+)\)\s*;?\s*$""").r
  private val unsetPropsRe =
    (s"""(?is)^\\s*ALTER\\s+TABLE\\s+($target)\\s+UNSET\\s+TBLPROPERTIES\\s*""" +
      """(?:IF\s+EXISTS\s*)?\((.+)\)\s*;?\s*$""").r

  /** Parse a maintenance statement. `resolve` maps a raw target (path
    * form or plain table name) to the table's data path; None = not a
    * graft table, fall through to the delegate parser. */
  def parseMaintenance(
      sqlText: String,
      resolve: String => Option[String]): Option[LogicalPlan] = sqlText match {
    case convertRe(provider, t, syncKw) => Some(GraftConvertRun(targetPath(t),
      if (provider == null) "parquet" else provider.toLowerCase,
      sync = syncKw != null))
    case generateRe(t) =>
      resolve(t).map(GraftGenerateRun.apply)
    case showPartsRe(t) =>
      resolve(t).map(GraftShowPartitionsRun.apply)
    case showColumnsRe(t) =>
      resolve(t).map(GraftShowColumnsRun.apply)
    case detailRe(t) => resolve(t).map(GraftDetailRun.apply)
    case restoreRe(t, v) => resolve(t).map(p => GraftRestoreRun(p, v.toLong))
    case restoreTsRe(t, ts) => resolve(t).map(p => GraftRestoreTsRun(p, ts))
    case reorgRe(t, where) =>
      resolve(t).map(p => GraftReorgRun(p, Option(where).map(_.trim)))
    case optimizeRe(t, full, where, zorder) =>
      val z = Option(zorder).map(_.split(",").toSeq
        .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty))
        .getOrElse(Nil)
      resolve(t).map(p => GraftOptimizeRun(p, Option(where).map(_.trim), z,
        full = full != null))
    case vacuumRe(t, inv, hours, lite, dry) =>
      resolve(t).map(p => GraftVacuumRun(p,
        Option(hours).map(_.toDouble), dry != null, lite != null,
        Option(inv)))
    case historyRe(t, limit) =>
      resolve(t).map(p => GraftHistoryRun(p, Option(limit).map(_.toInt)))
    case _ => None
  }

  def targetPath(raw: String): String = {
    val t = raw.trim
    if (t.startsWith("'") || t.startsWith("\"")) t.substring(1, t.length - 1)
    else {
      val noPrefix =
        if (t.toLowerCase.startsWith("graft.")) t.substring("graft.".length) else t
      noPrefix.stripPrefix("`").stripSuffix("`")
    }
  }
}
