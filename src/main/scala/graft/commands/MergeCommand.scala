package graft.commands

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftTable
import graft.log._

sealed trait MergeClause { def condition: Option[Column] }
case class MatchedUpdate(condition: Option[Column], set: Map[String, Column])
  extends MergeClause
case class MatchedDelete(condition: Option[Column]) extends MergeClause
case class NotMatchedInsert(condition: Option[Column], values: Map[String, Column])
  extends MergeClause
case class NotMatchedBySourceUpdate(condition: Option[Column], set: Map[String, Column])
  extends MergeClause
case class NotMatchedBySourceDelete(condition: Option[Column]) extends MergeClause

/**
 * Fluent MERGE INTO API (reference concept: DeltaMergeBuilder,
 * DeltaMergeBuilder.scala:153-270 — re-designed). The target is aliased
 * `t` and the source `s` inside clause expressions, e.g.
 * `.merge(src, expr("t.id = s.id")).whenMatched().updateAll()`.
 */
class MergeBuilder(
    table: GraftTable,
    source: DataFrame,
    condition: Column,
    targetAlias: String = "t",
    sourceAlias: String = "s") {

  private val clauses = scala.collection.mutable.ArrayBuffer.empty[MergeClause]
  private var schemaEvolution = false

  /** Allow updateAll/insertAll to ADD source columns the target lacks
    * (merged into the table schema as part of the MERGE commit). */
  def withSchemaEvolution(): MergeBuilder = { schemaEvolution = true; this }

  def whenMatched(cond: Column = null): MatchedActions =
    new MatchedActions(this, Option(cond))
  def whenNotMatched(cond: Column = null): NotMatchedActions =
    new NotMatchedActions(this, Option(cond))
  def whenNotMatchedBySource(cond: Column = null): NotMatchedBySourceActions =
    new NotMatchedBySourceActions(this, Option(cond))

  private[commands] def add(c: MergeClause): MergeBuilder = { clauses += c; this }

  def execute(): Map[String, String] =
    MergeCommand.run(table, source, condition, clauses.toSeq, targetAlias,
      sourceAlias, schemaEvolution)

  class MatchedActions(b: MergeBuilder, cond: Option[Column]) {
    def updateAll(): MergeBuilder = b.add(MatchedUpdate(cond, null))
    def update(set: Map[String, Column]): MergeBuilder = b.add(MatchedUpdate(cond, set))
    def updateExpr(set: Map[String, String]): MergeBuilder =
      update(set.map { case (k, v) => k -> expr(v) })
    def updateExpr(set: java.util.Map[String, String]): MergeBuilder = {
      import scala.jdk.CollectionConverters._
      updateExpr(set.asScala.toMap)
    }
    def delete(): MergeBuilder = b.add(MatchedDelete(cond))
  }
  class NotMatchedActions(b: MergeBuilder, cond: Option[Column]) {
    def insertAll(): MergeBuilder = b.add(NotMatchedInsert(cond, null))
    def insert(values: Map[String, Column]): MergeBuilder =
      b.add(NotMatchedInsert(cond, values))
    def insertExpr(values: Map[String, String]): MergeBuilder =
      insert(values.map { case (k, v) => k -> expr(v) })
    def insertExpr(values: java.util.Map[String, String]): MergeBuilder = {
      import scala.jdk.CollectionConverters._
      insertExpr(values.asScala.toMap)
    }
  }
  class NotMatchedBySourceActions(b: MergeBuilder, cond: Option[Column]) {
    def update(set: Map[String, Column]): MergeBuilder =
      b.add(NotMatchedBySourceUpdate(cond, set))
    def updateExpr(set: Map[String, String]): MergeBuilder =
      update(set.map { case (k, v) => k -> expr(v) })
    def delete(): MergeBuilder = b.add(NotMatchedBySourceDelete(cond))
  }
}

/**
 * MERGE execution as the classic two-phase join plan:
 *
 * Phase 1 (findTouchedFiles): inner-join source with the target scan
 * carrying `input_file_name()`; the distinct file set is what gets
 * rewritten, and a groupBy over a target row id detects ambiguous
 * multi-matches. Phase 2 (writeAllChanges): outer-join the touched files
 * with the source and emit, per row, the first applicable clause's
 * projection (update/delete/insert/copy) via a single CASE WHEN chain —
 * Catalyst plans the join (broadcast or shuffle) and codegen runs the
 * projection. Insert-only merges take a left-anti-join fast path that
 * rewrites no target files.
 * (Reference concept: merge/ClassicMergeExecutor.scala:72-471 +
 * InsertOnlyMergeExecutor.scala:53 — re-designed.)
 */
object MergeCommand {

  private val OP = "__graft_op"
  private val FILE = "__graft_file"
  private val RID = "__graft_rid"
  private val SRC = "__graft_src_exists"

  def run(
      table: GraftTable,
      source: DataFrame,
      condition: Column,
      clauses: Seq[MergeClause],
      targetAlias: String,
      sourceAlias: String,
      schemaEvolution: Boolean = false): Map[String, String] = {
    // A non-deterministic source re-executed between phase 1
    // (findTouchedFiles) and phase 2 (writeAllChanges) would produce
    // divergent match sets — silently corrupting the merge. The shared
    // decision pins those for correctness; `all` additionally pins an
    // expensive deterministic source across the two phases.
    MaterializeSource.withPinned(source, passes = 2) { pinned =>
      runInternal(table, pinned, condition, clauses,
        targetAlias, sourceAlias, schemaEvolution)
    }
  }

  private def runInternal(
      table: GraftTable,
      source: DataFrame,
      condition: Column,
      clauses: Seq[MergeClause],
      targetAlias: String,
      sourceAlias: String,
      schemaEvolution: Boolean): Map[String, String] = {
    val spark = table.spark
    val log = table.log
    require(clauses.nonEmpty, "MERGE requires at least one WHEN clause")
    log.withNewTransaction { txn =>
      val m0 = txn.snapshot.metadata
      // Schema evolution: updateAll/insertAll may ADD source columns the
      // target lacks; the widened schema commits atomically with the
      // merge, and pre-existing files null-fill on read.
      val m =
        if (schemaEvolution &&
            !graft.schema.SchemaUtils.isWriteCompatible(m0.schema, source.schema)) {
          val evolved = graft.schema.ColumnMapping.stampNewFields(m0.copy(
            schemaString = graft.schema.SchemaUtils.toNullable(
              graft.schema.SchemaUtils.mergeSchemas(m0.schema, source.schema)).json))
          txn.updateMetadata(evolved)
          evolved
        } else m0
      val now = System.currentTimeMillis()
      val schema = m.schema
      // Columns the evolution just added are absent from the target scan;
      // pad them as nulls so clause projections resolve.
      val newFields = schema.fields.filterNot(f =>
        m0.schema.fieldNames.exists(_.equalsIgnoreCase(f.name)))
      def pad(df: DataFrame): DataFrame =
        newFields.foldLeft(df)((d, f) =>
          d.withColumn(f.name, lit(null).cast(f.dataType)))
      val cdf = Cdc.isEnabled(m)

      val matchedClauses = clauses.collect {
        case c: MatchedUpdate => c
        case c: MatchedDelete => c
      }
      val insertClauses = clauses.collect { case c: NotMatchedInsert => c }
      val nmbsClauses = clauses.collect {
        case c: NotMatchedBySourceUpdate => c
        case c: NotMatchedBySourceDelete => c
      }

      val candidates =
        if (nmbsClauses.nonEmpty) { txn.readWholeTable(); txn.snapshot.allFiles }
        else txn.filterFiles()
      val src = source.alias(sourceAlias)

      // ---- Insert-only fast path: no target files are rewritten.
      if (matchedClauses.isEmpty && nmbsClauses.isEmpty) {
        val target = pad(Dml.scanFiles(spark, log, txn, candidates)).alias(targetAlias)
        val inserts = src.join(target, condition, "left_anti")
        val rows = applyInsertProjection(inserts, insertClauses, schema, spark)
        val adds = txn.writeFiles(rows)
        val cdc = if (cdf && adds.nonEmpty) {
          Cdc.writeChangeFiles(spark, log,
            rows.withColumn(Cdc.CHANGE_TYPE, lit("insert")))
        } else Nil
        val metrics = Map(
          "numTargetFilesAdded" -> adds.size.toString,
          "numTargetRowsUpdated" -> "0", "numTargetRowsDeleted" -> "0") ++
          Dml.statsRowCount(adds).map("numTargetRowsInserted" -> _.toString)
        txn.commit(adds ++ cdc, "MERGE", operationMetrics = metrics)
        return metrics
      }

      // ---- Phase 1: find touched files + multi-match guard.
      val targetScan = pad(Dml.scanFiles(spark, log, txn, candidates))
        .withColumn(FILE, input_file_name())
        .withColumn(RID, monotonically_increasing_id())
      val joinedInner = targetScan.alias(targetAlias).join(src, condition, "inner")
      // First-applicable-clause op per matched row, evaluated on the SAME
      // phase-1 aggregation — exact numTargetRowsUpdated/Deleted for free.
      val matchedOp: Column = {
        var acc: Column = lit("none")
        matchedClauses.zipWithIndex.reverse.foreach { case (c, _) =>
          val cc = c.condition.map(coalesce(_, lit(false))).getOrElse(lit(true))
          val tag = c match {
            case _: MatchedUpdate => "mu"
            case _: MatchedDelete => "del"
          }
          acc = when(cc, lit(tag)).otherwise(acc)
        }
        acc
      }
      // Per-file aggregation: join-row count vs distinct target rows
      // detects multi-matches; per-target-row distinct op counts give the
      // exact update/delete metrics even when duplicates are legal.
      // Two-level rollup instead of multi-countDistinct: four distinct
      // aggregates in one groupBy would plan as a 5-way Expand of the
      // whole phase-1 join output (every joined row shuffled five times —
      // the dominant cost of a large merge). Pre-aggregating per
      // (FILE, RID) makes every distinct count a plain sum of 0/1 flags:
      // one map-side-combined shuffle at row grain, then a tiny rollup
      // over one row per matched target row.
      val perTargetRow = joinedInner
        .groupBy(col(FILE), col(RID))
        .agg(count(lit(1)).as("cnt"),
          max(when(matchedOp === "mu", 1).otherwise(0)).as("hasMu"),
          max(when(matchedOp === "del", 1).otherwise(0)).as("hasDel"),
          count(when(matchedOp =!= "none", lit(1))).as("gcnt"))
      val fileAndMatches = perTargetRow
        .groupBy(col(FILE)).agg(
          sum(col("cnt")).as("n"), count(lit(1)).as("d"),
          sum(col("hasMu")).as("mu"), sum(col("hasDel")).as("del"),
          max(when(col("gcnt") > 0, 1).otherwise(0)).as("anyApplied"),
          sum(col("gcnt")).as("gn"),
          sum(when(col("gcnt") > 0, lit(1)).otherwise(lit(0))).as("gd"))
        .collect()
      val matchedUpdated = fileAndMatches.map(_.getLong(3)).sum
      val matchedDeleted = fileAndMatches.map(_.getLong(4)).sum
      // Duplicate matches are unambiguous ONLY when the sole matched
      // clause is an unconditional DELETE: every matched row pair deletes,
      // so the duplicates change nothing (reference concept:
      // MergeIntoCommandBase.scala:267-283 isOnlyOneUnconditionalDelete —
      // re-designed). Any other clause set — including none, where the
      // outer join would emit duplicate copies — is an error.
      // In a matched-ONLY merge a duplicate pair that fails every clause
      // condition is a no-op, so only pairs satisfying some clause count
      // toward the ambiguity guard (phase 2 folds the same clause
      // disjunction into its join condition, so those no-op pairs never
      // reach the output either — reference concept:
      // ClassicMergeExecutor.scala:105-110 matchedPredicate pruning).
      val matchedOnly = insertClauses.isEmpty && nmbsClauses.isEmpty
      val isOnlyOneUnconditionalDelete =
        matchedClauses == Seq(MatchedDelete(None))
      val hasMultipleMatches =
        if (matchedOnly) fileAndMatches.exists(r => r.getLong(6) > r.getLong(7))
        else fileAndMatches.exists(r => r.getLong(1) > r.getLong(2))
      if (hasMultipleMatches && !isOnlyOneUnconditionalDelete) {
        throw new IllegalStateException(
          "MERGE failed: a target row matched multiple source rows — " +
            "results would be ambiguous (duplicate matches are only " +
            "allowed when the sole WHEN MATCHED clause is an " +
            "unconditional DELETE)")
      }
      // Matched-only merges rewrite only files where some row actually
      // satisfies a matched clause condition; a file whose matches all
      // fail every clause keeps its rows and needs no rewrite (reference
      // concept: ClassicMergeExecutor.scala:105-110 matchedPredicate
      // pruning — re-designed).
      val touchedPaths = fileAndMatches
        .filter(r => !matchedOnly || r.getInt(5) == 1)
        .map(_.getString(0)).toSet
      val touched = Dml.resolveTouched(log, candidates, touchedPaths.toSeq)
      // Files needing rewrite: touched (matched rows) plus, when
      // NOT-MATCHED-BY-SOURCE clauses exist, every candidate file.
      val rewriteFiles = if (nmbsClauses.nonEmpty) candidates else touched

      // ---- Phase 2: write all changes from one outer join. Under
      // deletion vectors the scan carries row identity (__f/__i) so
      // changed target rows can be marked in bitmaps instead of
      // rewriting their files.
      val useDv = graft.dv.DeletionVectors.isEnabled(m)
      val joinType =
        if (insertClauses.nonEmpty) "full_outer" else "left_outer"
      // Row identity rides the rewrite scan so a legal duplicate match
      // (single unconditional DELETE) can collapse its per-pair CDF
      // delete rows back to one per target row.
      val rewriteScan = pad(
        if (useDv) {
          // DV-filtered scan (in-reader bitmap splice) with row identity.
          graft.files.GraftFileIndex.dataFrame(
              spark, log, txn.snapshot, Some(rewriteFiles))
            .withColumn("__f", graft.dv.DeletionVectors.normFileCol(
              col("_metadata.file_path")))
            .withColumn("__i", col("_metadata.row_index"))
        } else Dml.scanFiles(spark, log, txn, rewriteFiles))
        .withColumn(RID, monotonically_increasing_id())
      val srcMarked = source.withColumn(SRC, lit(true)).alias(sourceAlias)
      // Matched-only: a pair failing every clause condition is a no-op;
      // fold the clause disjunction into the join condition so such target
      // rows fall out of the join as unmatched and are copied exactly once
      // even when the raw condition matches them to several source rows.
      val rewriteCondition =
        if (matchedOnly && matchedClauses.forall(_.condition.isDefined))
          condition && matchedClauses
            .map(c => coalesce(c.condition.get, lit(false))).reduce(_ || _)
        else condition
      val joined = rewriteScan.withColumn("__tgt_exists", lit(true))
        .alias(targetAlias)
        .join(srcMarked, rewriteCondition, joinType)

      val isMatched = col("__tgt_exists").isNotNull && col(SRC).isNotNull
      val isTargetOnly = col("__tgt_exists").isNotNull && col(SRC).isNull
      val isSourceOnly = col("__tgt_exists").isNull && col(SRC).isNotNull

      // Row operation: first applicable clause wins.
      var op: Column = lit("copy")
      var cases = Seq.empty[(Column, String)]
      matchedClauses.zipWithIndex.foreach { case (c, i) =>
        val cc = isMatched && c.condition.map(coalesce(_, lit(false))).getOrElse(lit(true))
        cases :+= (cc, c match {
          case _: MatchedUpdate => s"mu$i"
          case _: MatchedDelete => "del"
        })
      }
      insertClauses.zipWithIndex.foreach { case (c, i) =>
        val cc = isSourceOnly && c.condition.map(coalesce(_, lit(false))).getOrElse(lit(true))
        cases :+= (cc, s"ins$i")
      }
      nmbsClauses.zipWithIndex.foreach { case (c, i) =>
        val cc = isTargetOnly && c.condition.map(coalesce(_, lit(false))).getOrElse(lit(true))
        cases :+= (cc, c match {
          case _: NotMatchedBySourceUpdate => s"nu$i"
          case _: NotMatchedBySourceDelete => "del"
        })
      }
      // Source-only rows with no applicable insert clause are dropped.
      val opCol = cases.reverse.foldLeft(
        when(isSourceOnly, lit("drop")).otherwise(lit("copy"))) {
        case (acc, (cond, tag)) => when(cond, lit(tag)).otherwise(acc)
      }
      val withOp = joined.withColumn(OP, opCol)

      val srcCols = source.schema.fieldNames.map(_.toLowerCase).toSet
      def clauseSet(c: MergeClause): Map[String, Column] = c match {
        case MatchedUpdate(_, null) => // updateAll: t.col = s.col by name
          schema.fieldNames.filter(n => srcCols.contains(n.toLowerCase))
            .map(n => n -> col(s"$sourceAlias.$n")).toMap
        case MatchedUpdate(_, set) => set
        case NotMatchedBySourceUpdate(_, set) => set
        case NotMatchedInsert(_, null) =>
          schema.fieldNames.filter(n => srcCols.contains(n.toLowerCase))
            .map(n => n -> col(s"$sourceAlias.$n")).toMap
        case NotMatchedInsert(_, values) => values
        case _ => Map.empty
      }
      def outCol(name: String): Column = {
        val tcol = col(s"$targetAlias.$name")
        var c: Column = tcol
        def overlay(tag: String, set: Map[String, Column], default: Column): Column = {
          val v = set.collectFirst { case (k, x) if k.equalsIgnoreCase(name) => x }
            .getOrElse(default)
          v
        }
        var result = tcol
        matchedClauses.zipWithIndex.foreach {
          case (cu: MatchedUpdate, i) =>
            result = when(col(OP) === s"mu$i",
              overlay(s"mu$i", clauseSet(cu), tcol)).otherwise(result)
          case _ =>
        }
        insertClauses.zipWithIndex.foreach { case (ci, i) =>
          result = when(col(OP) === s"ins$i",
            overlay(s"ins$i", clauseSet(ci), lit(null))).otherwise(result)
        }
        nmbsClauses.zipWithIndex.foreach {
          case (cu: NotMatchedBySourceUpdate, i) =>
            result = when(col(OP) === s"nu$i",
              overlay(s"nu$i", clauseSet(cu), tcol)).otherwise(result)
          case _ =>
        }
        result.cast(schema(name).dataType).as(name)
      }

      val outCols = schema.fieldNames.map(outCol)
      // DV mode: copies stay in their original files (marked live by NOT
      // being in any bitmap); only changed rows get new versions.
      val output = withOp
        .filter(if (useDv) {
          col(OP) =!= "copy" && col(OP) =!= "del" && col(OP) =!= "drop"
        } else col(OP) =!= "del" && col(OP) =!= "drop")
        .select(outCols.toIndexedSeq: _*)
      val adds = txn.writeFiles(output)

      val cdcActions = if (cdf) {
        val changeRows = withOp.filter(col(OP) =!= "copy" && col(OP) =!= "drop")
        val post = changeRows.filter(col(OP).startsWith("mu") || col(OP).startsWith("nu") ||
            col(OP).startsWith("ins"))
          .select((schema.fieldNames.map(outCol) :+
            when(col(OP).startsWith("ins"), lit("insert"))
              .otherwise(lit("update_postimage")).as(Cdc.CHANGE_TYPE)).toIndexedSeq: _*)
        // Legal duplicate matches (sole unconditional DELETE) join each
        // deleted target row to several source rows — one CDF delete per
        // target row, not per pair (reference concept:
        // DeduplicateCDFDeletes — re-designed via the scan row id).
        val delPairs = changeRows.filter(col(OP) === "del")
        val del = (if (hasMultipleMatches) delPairs.dropDuplicates(RID)
                   else delPairs)
          .select(schema.fieldNames.map(n => col(s"$targetAlias.$n").as(n)).toIndexedSeq: _*)
          .withColumn(Cdc.CHANGE_TYPE, lit("delete"))
        // pre-images only belong to updates, not inserts; deletes emitted once
        val preU = changeRows.filter(col(OP).startsWith("mu") || col(OP).startsWith("nu"))
          .select(schema.fieldNames.map(n => col(s"$targetAlias.$n").as(n)).toIndexedSeq: _*)
          .withColumn(Cdc.CHANGE_TYPE, lit("update_preimage"))
        Cdc.writeChangeFiles(spark, log, preU.unionByName(post).unionByName(del))
      } else Nil

      if (useDv) {
        // Mark old versions of updated/deleted target rows in bitmaps;
        // untouched candidate files are left completely alone.
        val dvTargets = withOp
          .filter(col(OP) =!= "copy" && col(OP) =!= "drop" && col("__f").isNotNull)
          .select(col("__f"), col("__i"))
        val (removes, dvAdds, nChanged) = graft.dv.DeletionVectors
          .writeDeletionVectors(spark, log, rewriteFiles, dvTargets)
        val protocolBump: Seq[Action] =
          if (dvAdds.nonEmpty)
            TableFeatures.requiredUpgrade(txn.snapshot.protocol, m,
              TableFeatures.deletionVectors).toSeq
          else Nil
        // With no NOT-MATCHED-BY-SOURCE clauses, every written row is an
        // update or an insert, so inserted = written - updated (footer
        // stats; deleted rows are bitmap-marked, never written).
        val rowMetrics: Map[String, String] =
          if (nmbsClauses.isEmpty) {
            Map("numTargetRowsUpdated" -> matchedUpdated.toString,
              "numTargetRowsDeleted" -> matchedDeleted.toString) ++
              Dml.statsRowCount(adds).map(a =>
                "numTargetRowsInserted" -> (a - matchedUpdated).toString)
          } else Map.empty
        val metrics = Map(
          "numDeletionVectors" -> dvAdds.size.toString,
          "numChangedTargetRows" -> nChanged.toString,
          "numTargetFilesAdded" -> adds.size.toString) ++ rowMetrics
        txn.commit(protocolBump ++ removes ++ dvAdds ++ adds ++ cdcActions,
          "MERGE", operationMetrics = metrics)
        metrics
      } else {
        val removes = rewriteFiles.map(_.remove(now))
        // inserted = rows written - rows copied forward, where copied =
        // rows-before - updated - deleted; all from footer stats.
        val rowMetrics: Map[String, String] =
          if (nmbsClauses.isEmpty) {
            Map("numTargetRowsUpdated" -> matchedUpdated.toString,
              "numTargetRowsDeleted" -> matchedDeleted.toString) ++
              (for { a <- Dml.statsRowCount(adds)
                     b <- Dml.statsRowCount(rewriteFiles) }
                yield "numTargetRowsInserted" ->
                  (a - b + matchedDeleted).toString)
          } else Map.empty
        val metrics = Map(
          "numTargetFilesRemoved" -> removes.size.toString,
          "numTargetFilesAdded" -> adds.size.toString) ++ rowMetrics
        txn.commit(removes ++ adds ++ cdcActions, "MERGE", operationMetrics = metrics)
        metrics
      }
    }
  }

  private def applyInsertProjection(
      sourceOnly: DataFrame,
      insertClauses: Seq[NotMatchedInsert],
      schema: org.apache.spark.sql.types.StructType,
      spark: SparkSession): DataFrame = {
    require(insertClauses.nonEmpty, "insert-only MERGE needs an insert clause")
    val srcCols = sourceOnly.columns.map(_.toLowerCase).toSet
    // First applicable clause wins; rows matching none are dropped.
    val clauseConds = insertClauses.map(c =>
      c.condition.map(coalesce(_, lit(false))).getOrElse(lit(true)))
    val anyCond = clauseConds.reduce(_ || _)
    val filtered = sourceOnly.filter(anyCond)
    val outCols = schema.fieldNames.map { name =>
      var result: Column = lit(null)
      insertClauses.zip(clauseConds).reverse.foreach { case (c, cc) =>
        val values = Option(c.values).getOrElse(
          schema.fieldNames.filter(n => srcCols.contains(n.toLowerCase))
            .map(n => n -> col(n)).toMap)
        val v = values.collectFirst { case (k, x) if k.equalsIgnoreCase(name) => x }
          .getOrElse(lit(null))
        result = when(cc, v).otherwise(result)
      }
      result.cast(schema(name).dataType).as(name)
    }
    filtered.select(outCols.toIndexedSeq: _*)
  }
}
