package graft.commands

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.graftshim.SparkShims
import org.apache.spark.sql.functions._

import graft.files.GraftFileIndex
import graft.log._
import graft.tx.OptimisticTransaction

/** Shared plumbing for row-level DML rewrites. */
object Dml {
  /** Resolve the table-relative AddFiles that actually contain matching
    * rows, by scanning candidates with `input_file_name()`. */
  def findTouchedFiles(
      spark: SparkSession,
      log: GraftLog,
      txn: OptimisticTransaction,
      candidates: Seq[AddFile],
      condition: Column): Seq[AddFile] =
    findTouchedFilesWithCount(spark, log, txn, candidates, condition)._1

  /** Same single scan, but also returns the exact matched-row count (the
    * per-file counts ride the distinct-file aggregation for free) — this
    * is where UPDATE's numUpdatedRows comes from without a second pass. */
  def findTouchedFilesWithCount(
      spark: SparkSession,
      log: GraftLog,
      txn: OptimisticTransaction,
      candidates: Seq[AddFile],
      condition: Column): (Seq[AddFile], Long) = {
    if (candidates.isEmpty) return (Nil, 0L)
    val df = GraftFileIndex.dataFrame(spark, log, txn.snapshot, Some(candidates))
    val perFile = df.filter(condition)
      .groupBy(input_file_name().as("f")).count().collect()
    (resolveTouched(log, candidates, perFile.map(_.getString(0))),
      perFile.map(_.getLong(1)).sum)
  }

  /** THE one mapping from `input_file_name()` URIs back to the AddFiles
    * that produced them (normalized absolute paths both sides) — shared
    * by every command that detects touched files through a scan. */
  def resolveTouched(
      log: GraftLog,
      candidates: Seq[AddFile],
      fileUris: Seq[String]): Seq[AddFile] = {
    val byPath = candidates.map(f =>
      new Path(new Path(log.dataPath, f.path).toUri.getPath).toString -> f).toMap
    fileUris.flatMap { uri =>
      byPath.get(new Path(new java.net.URI(uri).getPath).toString)
    }
  }

  def scanFiles(
      spark: SparkSession,
      log: GraftLog,
      txn: OptimisticTransaction,
      files: Seq[AddFile]): DataFrame =
    GraftFileIndex.dataFrame(spark, log, txn.snapshot, Some(files))

  /** Exact row count of `files` from their numRecords stats — no scan.
    * None when any file lacks stats (converted tables, foreign writers). */
  def statsRowCount(files: Seq[AddFile]): Option[Long] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val counts = files.map { f =>
      Option(f.stats).flatMap { j =>
        val n = mapper.readTree(j).path("numRecords")
        if (n.isNumber) Some(n.asLong) else None
      }
    }
    if (counts.forall(_.isDefined)) Some(counts.flatten.sum) else None
  }
}

/**
 * DELETE FROM t WHERE cond, compiled to Spark scans + rewrites:
 * partition-only predicates delete files from metadata alone; otherwise
 * only files that actually contain matching rows are rewritten.
 * (Reference concept: commands/DeleteCommand.scala:112-457 — re-designed.)
 */
object DeleteCommand {

  def run(
      spark: SparkSession,
      path: String,
      condition: Option[Column]): Map[String, String] =
    run(spark, GraftLog.forTable(spark, path), condition)

  /** Log-handle form: the caller's resolution stands — a public handle
    * arrives already routed through any redirect; a no-redirect admin
    * handle stays at the source (where the commit gate refuses file
    * changes on a redirected table instead of silently re-routing). */
  def run(
      spark: SparkSession,
      log: GraftLog,
      condition: Option[Column]): Map[String, String] = {
    log.withNewTransaction { txn =>
      val m = txn.snapshot.metadata
      val now = System.currentTimeMillis()
      val cdf = Cdc.isEnabled(m)

      val (removes, adds, cdcActions, metrics) = condition match {
        case None =>
          txn.readWholeTable()
          // collected, not materialized: the remove list is a transient
          // driver Seq; a lazy checkpoint-backed snapshot stays lazy
          val all = txn.snapshot.allFilesCollected
          val cdc = if (cdf) {
            val allRows = Dml.scanFiles(spark, log, txn, all)
            Cdc.writeChangeFiles(spark, log,
              allRows.withColumn(Cdc.CHANGE_TYPE, lit("delete")))
          } else Nil
          (all.map(_.remove(now)), Nil, cdc,
            Map("numRemovedFiles" -> all.size.toString) ++
              Dml.statsRowCount(all).map("numDeletedRows" -> _.toString))
        case Some(cond) =>
          val condExpr = SparkShims.expression(cond)
          val (partF, dataF) = WriteIntoGraft.splitPredicates(condExpr, m)
          if (dataF.isEmpty && partF.nonEmpty) {
            // Metadata-only delete: no data is read at all.
            val files = txn.filterFiles(partF, Nil)
            val cdc = if (cdf && files.nonEmpty) {
              val rows = Dml.scanFiles(spark, log, txn, files)
              Cdc.writeChangeFiles(spark, log,
                rows.withColumn(Cdc.CHANGE_TYPE, lit("delete")))
            } else Nil
            (files.map(_.remove(now)), Nil, cdc,
              Map("numRemovedFiles" -> files.size.toString) ++
                Dml.statsRowCount(files).map("numDeletedRows" -> _.toString))
          } else if (graft.dv.DeletionVectors.isEnabled(m)) {
            // DV path: mark matching row indexes in a bitmap sidecar per
            // touched file; NO data file is rewritten. No findTouchedFiles
            // pre-scan: the bitmap writer derives the touched set from the
            // matched rows themselves (files without matches produce no
            // bitmap and stay untouched), so one candidate scan suffices.
            val candidates = txn.filterFiles(partF, dataF)
            if (candidates.isEmpty) (Nil, Nil, Nil, Map("numRemovedFiles" -> "0"))
            else {
              // DV-filtered scan (in-reader bitmap splice) carrying row
              // identity: __i is the physical file row index, exactly the
              // bitmap domain.
              val visible = GraftFileIndex.dataFrame(
                  spark, log, txn.snapshot, Some(candidates))
                .withColumn("__f", graft.dv.DeletionVectors.normFileCol(
                  col("_metadata.file_path")))
                .withColumn("__i", col("_metadata.row_index"))
              val matched = visible.filter(coalesce(cond, lit(false)))
              val cdc = if (cdf) {
                Cdc.writeChangeFiles(spark, log,
                  matched.drop("__f", "__i")
                    .withColumn(Cdc.CHANGE_TYPE, lit("delete")))
              } else Nil
              val (removes, adds, newlyDeleted) =
                graft.dv.DeletionVectors.writeDeletionVectors(spark, log, candidates, matched)
              (removes, adds, cdc,
                Map("numDeletionVectors" -> adds.size.toString,
                    "numDeletedRows" -> newlyDeleted.toString,
                    "numAddedDataFiles" -> "0"))
            }
          } else {
            val candidates = txn.filterFiles(partF, dataF)
            val touched = Dml.findTouchedFiles(spark, log, txn, candidates, cond)
            if (touched.isEmpty) (Nil, Nil, Nil, Map("numRemovedFiles" -> "0"))
            else {
              val base = Dml.scanFiles(spark, log, txn, touched)
              val survivors = base.filter(!coalesce(cond, lit(false)))
              val newAdds = txn.writeFiles(survivors)
              val cdc = if (cdf) {
                Cdc.writeChangeFiles(spark, log,
                  base.filter(coalesce(cond, lit(false)))
                    .withColumn(Cdc.CHANGE_TYPE, lit("delete")))
              } else Nil
              (touched.map(_.remove(now)), newAdds, cdc,
                Map("numRemovedFiles" -> touched.size.toString,
                    "numAddedFiles" -> newAdds.size.toString) ++
                  // exact deleted-row count with zero extra scans: rows in
                  // the removed files minus rows in their rewrites
                  (for { r <- Dml.statsRowCount(touched)
                         a <- Dml.statsRowCount(newAdds) }
                    yield "numDeletedRows" -> (r - a).toString))
            }
          }
      }

      // First deletion vector on this table: gate readers that would
      // otherwise ignore the dvPath field and resurrect deleted rows.
      val protocolBump: Seq[Action] =
        if (adds.exists(_.dvPath.isDefined))
          TableFeatures.requiredUpgrade(txn.snapshot.protocol, m,
            TableFeatures.deletionVectors).toSeq
        else Nil
      txn.commit(protocolBump ++ removes ++ adds ++ cdcActions, "DELETE",
        operationParameters = condition.map(c => "predicate" -> c.toString).toMap,
        operationMetrics = metrics)
      metrics
    }
  }
}

/**
 * UPDATE t SET col = expr WHERE cond — rewrite only the touched files,
 * applying `CASE WHEN cond THEN newExpr ELSE old END` per column.
 * (Reference concept: commands/UpdateCommand.scala:59-346 — re-designed.)
 */
object UpdateCommand {

  import org.apache.spark.sql.types.{DataType, StructType}

  /** Type of the (possibly nested) field at `path` inside `schema`. */
  private def fieldTypeAt(schema: StructType, path: Seq[String]): DataType =
    path match {
      case Seq(last) =>
        schema.fields.find(_.name.equalsIgnoreCase(last)).map(_.dataType)
          .getOrElse(throw new IllegalArgumentException(s"No column $last"))
      case head +: tail =>
        schema.fields.find(_.name.equalsIgnoreCase(head)).map(_.dataType) match {
          case Some(st: StructType) => fieldTypeAt(st, tail)
          case _ => throw new IllegalArgumentException(s"$head is not a struct")
        }
    }

  /** Normalize SET keys: strip a leading alias segment that is not a
    * table column (UPDATE t SET t.x = ...), keep genuine nested paths
    * (SET s.inner.x = ...). */
  private def resolveKeys(
      set: Map[String, Column], schema: StructType): Map[String, Column] =
    set.map { case (k, v) =>
      val parts = k.split('.').toSeq
      val resolved =
        if (parts.length == 1 ||
            schema.fieldNames.exists(_.equalsIgnoreCase(parts.head))) parts
        else if (parts.length > 1 &&
            schema.fieldNames.exists(_.equalsIgnoreCase(parts(1)))) parts.tail
        else Seq(parts.last)
      resolved.mkString(".") -> v
    }

  /** One output column per top-level field, applying direct and nested
    * (struct-rebuilding, via withField) SET assignments to rows where
    * `matched` holds. */
  private def updatedColumns(
      schema: StructType,
      set0: Map[String, Column],
      matched: Column): Seq[Column] = {
    val set = resolveKeys(set0, schema)
    schema.fields.toSeq.map { f =>
      val name = f.name
      val direct = set.collectFirst {
        case (k, v) if !k.contains(".") && k.equalsIgnoreCase(name) => v
      }
      val nested = set.toSeq.collect {
        case (k, v) if k.contains(".") &&
            k.split('.').head.equalsIgnoreCase(name) =>
          k.split('.').toSeq.tail -> v
      }
      (direct, nested) match {
        case (Some(e), _) =>
          when(matched, e.cast(f.dataType)).otherwise(col(name)).as(name)
        case (None, ns) if ns.nonEmpty =>
          val st = f.dataType match {
            case s: StructType => s
            case other => throw new IllegalArgumentException(
              s"Cannot SET a nested field of non-struct column $name (${other.simpleString})")
          }
          val upd = ns.foldLeft(col(name)) { case (acc, (path, v)) =>
            acc.withField(path.mkString("."), v.cast(fieldTypeAt(st, path)))
          }
          when(matched, upd).otherwise(col(name)).as(name)
        case _ => col(name)
      }
    }
  }

  def run(
      spark: SparkSession,
      path: String,
      condition: Option[Column],
      set: Map[String, Column]): Map[String, String] =
    run(spark, GraftLog.forTable(spark, path), condition, set)

  /** Log-handle form: see [[DeleteCommand.run]] — resolution is the
    * caller's, so no-redirect handles are not silently re-routed. */
  def run(
      spark: SparkSession,
      log: GraftLog,
      condition: Option[Column],
      set: Map[String, Column]): Map[String, String] = {
    log.withNewTransaction { txn =>
      val m = txn.snapshot.metadata
      val now = System.currentTimeMillis()
      val cond = condition.getOrElse(lit(true))
      val cdf = Cdc.isEnabled(m)

      val (partF, dataF) = condition match {
        case Some(c) => WriteIntoGraft.splitPredicates(SparkShims.expression(c), m)
        case None => (Nil, Nil)
      }
      val candidates = txn.filterFiles(partF, dataF)
      val metrics = scala.collection.mutable.Map.empty[String, String]

      if (candidates.isEmpty) {
        metrics += ("numUpdatedFiles" -> "0", "numUpdatedRows" -> "0")
        txn.commit(Nil, "UPDATE", operationMetrics = metrics.toMap)
      } else if (graft.dv.DeletionVectors.isEnabled(m)) {
        // DV path: mark the old versions of matched rows deleted via
        // bitmap sidecars and append a file containing ONLY the updated
        // rows — a point update on a 1 GB file writes KBs, not the GB.
        // No findTouchedFiles pre-scan: the bitmap writer derives the
        // touched set from the matched rows, so candidates scan once.
        val visible = GraftFileIndex.dataFrame(
            spark, log, txn.snapshot, Some(candidates))
          .withColumn("__f", graft.dv.DeletionVectors.normFileCol(
            col("_metadata.file_path")))
          .withColumn("__i", col("_metadata.row_index"))
        val matched = visible.filter(coalesce(cond, lit(false)))
        val updatedRows = matched.drop("__f", "__i").select(
          updatedColumns(m.schema, set, lit(true)).toIndexedSeq: _*)
        val newAdds = txn.writeFiles(updatedRows)
        val (removes, dvAdds, updatedCount) =
          graft.dv.DeletionVectors.writeDeletionVectors(spark, log, candidates, matched)
        metrics += "numUpdatedFiles" -> dvAdds.size.toString
        val cdcActions = if (cdf) {
          val pre = matched.drop("__f", "__i")
            .withColumn(Cdc.CHANGE_TYPE, lit("update_preimage"))
          val post = updatedRows.withColumn(Cdc.CHANGE_TYPE, lit("update_postimage"))
          Cdc.writeChangeFiles(spark, log, pre.unionByName(post))
        } else Nil
        val protocolBump: Seq[Action] =
          if (dvAdds.nonEmpty)
            TableFeatures.requiredUpgrade(txn.snapshot.protocol, m,
              TableFeatures.deletionVectors).toSeq
          else Nil
        metrics += ("numAddedFiles" -> newAdds.size.toString,
          "numDeletionVectors" -> dvAdds.size.toString,
          "numUpdatedRows" -> updatedCount.toString)
        txn.commit(protocolBump ++ removes ++ dvAdds ++ newAdds ++ cdcActions,
          "UPDATE",
          operationParameters = condition.map(c => "predicate" -> c.toString).toMap,
          operationMetrics = metrics.toMap)
      } else {
        // Rewrite path MUST narrow to files that actually contain matches
        // (it rewrites whole files, so an un-matched candidate would be
        // needlessly copied).
        val (touched, matchedRows) =
          Dml.findTouchedFilesWithCount(spark, log, txn, candidates, cond)
        metrics += ("numUpdatedFiles" -> touched.size.toString,
          "numUpdatedRows" -> matchedRows.toString)
        if (touched.isEmpty) {
          txn.commit(Nil, "UPDATE", operationMetrics = metrics.toMap)
        } else {
        val base = Dml.scanFiles(spark, log, txn, touched)
        val matched = coalesce(cond, lit(false))
        val updatedCols = updatedColumns(m.schema, set, matched)
        val rewritten = base.select(updatedCols.toIndexedSeq: _*)
        val newAdds = txn.writeFiles(rewritten)
        val cdcActions = if (cdf) {
          val pre = base.filter(matched)
            .withColumn(Cdc.CHANGE_TYPE, lit("update_preimage"))
          val post = base.filter(matched).select(updatedCols.toIndexedSeq: _*)
            .withColumn(Cdc.CHANGE_TYPE, lit("update_postimage"))
          Cdc.writeChangeFiles(spark, log, pre.unionByName(post))
        } else Nil
        metrics += "numAddedFiles" -> newAdds.size.toString
        txn.commit(touched.map(_.remove(now)) ++ newAdds ++ cdcActions, "UPDATE",
          operationParameters = condition.map(c => "predicate" -> c.toString).toMap,
          operationMetrics = metrics.toMap)
        }
      }
      metrics.toMap
    }
  }
}
