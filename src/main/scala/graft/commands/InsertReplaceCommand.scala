package graft.commands

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.GraftTable
import graft.files.GraftFileIndex
import graft.log._

/**
 * INSERT … REPLACE ON / REPLACE USING: append every source row and, in
 * the SAME commit, delete every existing table row that matches ANY
 * source row under the join condition — a criteria-driven replace where
 * the replaced set derives from the inserted data itself (a generalized
 * replaceWhere). `REPLACE USING (c1..cn)` is the equi-join special case.
 * (Reference concept: commands/DeltaInsertReplaceOnOrUsingCommand.scala:39
 * + the replaceOn/replaceUsing branch of WriteIntoDelta — re-designed:
 * one transaction composing the DELETE machinery's matched-row paths —
 * DV bitmaps or survivor rewrites — with the normal write path, instead
 * of an EXISTS-subquery rewrite.)
 *
 * Condition columns resolve through the `t` (target) / `s` (source)
 * aliases, the same convention as MERGE: `t.insertReplaceOn(src,
 * expr("t.k = s.k"))`.
 *
 * Scale shape: one candidate-pruned target scan joined with the source
 * (Catalyst picks broadcast vs shuffle), rewrites bounded to files that
 * actually contain matches (or KB-scale DV sidecars), and the insert is
 * the plain distributed write path. A non-deterministic source pins once
 * up front so the match phase and the insert phase see identical rows.
 */
object InsertReplaceCommand {

  def run(
      table: GraftTable,
      source: DataFrame,
      condition: Column,
      targetAlias: String = "t",
      sourceAlias: String = "s",
      pruneKeys: Seq[String] = Nil): Map[String, String] = {
    // Up to 4 passes read the source (key-range agg, match join, survivor
    // anti-join + insert write, CDF union) — the shared decision pins
    // non-deterministic sources for correctness; `all` lets an expensive
    // multi-join source compute once instead of 4x.
    MaterializeSource.withPinned(source, passes = 4) { pinned =>
      runInternal(table, pinned, condition, targetAlias, sourceAlias, pruneKeys)
    }
  }

  private def runInternal(
      table: GraftTable,
      source: DataFrame,
      condition: Column,
      targetAlias: String,
      sourceAlias: String,
      pruneKeys: Seq[String]): Map[String, String] = {
    val spark = table.spark
    val log = table.log
    log.withNewTransaction { txn =>
      val m = txn.snapshot.metadata
      require(graft.schema.SchemaUtils.isWriteCompatible(m.schema, source.schema),
        s"REPLACE ON source schema ${source.schema.simpleString} is not " +
          s"write-compatible with the table's ${m.schema.simpleString}")
      val now = System.currentTimeMillis()
      val cdf = Cdc.isEnabled(m)
      // REPLACE USING's equi-keys admit stats-space candidate pruning: a
      // target file whose per-key min/max miss the SOURCE's key range
      // cannot contain a match, so a small daily batch touches only the
      // bracketed files — replaceWhere economics on a join-derived
      // predicate. One tiny agg over the source derives the ranges; the
      // predicates also register as the conflict read set (appends
      // outside the range cannot produce matches, so they need not
      // conflict). Non-equi REPLACE ON conditions read the whole table.
      val prunable = pruneKeys.filter { k =>
        m.schema.fields.find(_.name.equalsIgnoreCase(k))
          .exists(f => f.dataType match {
            case _: org.apache.spark.sql.types.NumericType |
                 _: org.apache.spark.sql.types.StringType |
                 _: org.apache.spark.sql.types.DateType |
                 _: org.apache.spark.sql.types.TimestampType => true
            case _ => false
          })
      }
      // The replaced set is data-dependent on the source: without usable
      // key ranges this is conservatively a whole-table read for conflict
      // detection (filterFiles() with no predicates registers exactly
      // that).
      val candidates =
        if (prunable.isEmpty) txn.filterFiles()
        else {
          val aggs = prunable.flatMap(k => Seq(
            org.apache.spark.sql.functions.min(col(s"`$k`")),
            org.apache.spark.sql.functions.max(col(s"`$k`"))))
          val row = source.agg(aggs.head, aggs.tail: _*).head
          // a null min/max means the source is empty or that key is
          // all-null — either way NO target row can equal it
          if (prunable.indices.exists(i => row.isNullAt(2 * i))) Nil
          else {
            val ranges = prunable.zipWithIndex.map { case (k, i) =>
              org.apache.spark.sql.graftshim.SparkShims.expression(
                col(s"`$k`") >= lit(row.get(2 * i)) &&
                  col(s"`$k`") <= lit(row.get(2 * i + 1)))
            }
            txn.filterFiles(Nil, ranges)
          }
        }
      val src = source.alias(sourceAlias)
      val useDv = graft.dv.DeletionVectors.isEnabled(m)

      val (removes, rewriteAdds, deleteCdcRows, deletedCount) =
        if (candidates.isEmpty) {
          (Nil, Nil, None, 0L)
        } else if (useDv) {
          // matched rows keep their file identity (__f/__i) through the
          // semi join, landing directly in per-file bitmap sidecars
          val visible = GraftFileIndex.dataFrame(
              spark, log, txn.snapshot, Some(candidates))
            .withColumn("__f", graft.dv.DeletionVectors.normFileCol(
              col("_metadata.file_path")))
            .withColumn("__i", col("_metadata.row_index"))
          val matched = visible.alias(targetAlias)
            .join(src, condition, "left_semi")
          val (rm, dvAdds, n) = graft.dv.DeletionVectors
            .writeDeletionVectors(spark, log, candidates, matched)
          (rm, dvAdds,
            if (cdf) Some(matched.drop("__f", "__i")) else None, n)
        } else {
          // rewrite path: only files that actually contain matches
          val FILE = "__graft_file"
          val targetScan = Dml.scanFiles(spark, log, txn, candidates)
            .withColumn(FILE, input_file_name())
          val touchedPaths = targetScan.alias(targetAlias)
            .join(src, condition, "left_semi")
            .select(col(FILE)).distinct().collect().map(_.getString(0))
          val touched = Dml.resolveTouched(log, candidates,
            touchedPaths.toIndexedSeq)
          if (touched.isEmpty) (Nil, Nil, None, 0L)
          else {
            val base = Dml.scanFiles(spark, log, txn, touched)
            val survivors = base.alias(targetAlias).join(src, condition, "left_anti")
            val newAdds = txn.writeFiles(survivors)
            val deleted = (for {
              r <- Dml.statsRowCount(touched)
              a <- Dml.statsRowCount(newAdds)
            } yield r - a).getOrElse(-1L)
            (touched.map(_.remove(now)), newAdds,
              if (cdf) Some(base.alias(targetAlias).join(src, condition, "left_semi"))
              else None, deleted)
          }
        }

      // insert side: the normal write-path normalization
      val (withDefaults, genChecks) =
        graft.schema.ColumnDefaults.applyDefaults(source, m)
      var normalized = graft.schema.SchemaUtils.normalize(withDefaults, m.schema)
      normalized = graft.constraints.Constraints.enforce(normalized, m)
      genChecks.foreach { case (name, ok) =>
        if (normalized.columns.nonEmpty) {
          val first = normalized.columns.head
          val ft = normalized.schema(first).dataType
          normalized = normalized.withColumn(first,
            when(coalesce(ok, lit(false)), col(first)).otherwise(
              raise_error(lit(s"provided value violates $name")).cast(ft)))
        }
      }
      val insertAdds = txn.writeFiles(normalized)
      graft.schema.ColumnDefaults.advanceWatermarks(txn.metadata, insertAdds)
        .foreach(txn.updateMetadata)

      val cdcActions =
        if (cdf) {
          val deletes = deleteCdcRows.map(
            _.withColumn(Cdc.CHANGE_TYPE, lit("delete")))
          val inserts = normalized.withColumn(Cdc.CHANGE_TYPE, lit("insert"))
          Cdc.writeChangeFiles(spark, log,
            deletes.map(d => d.unionByName(inserts)).getOrElse(inserts))
        } else Nil
      val protocolBump: Seq[Action] =
        if (rewriteAdds.exists(_.dvPath.isDefined))
          TableFeatures.requiredUpgrade(txn.snapshot.protocol, m,
            TableFeatures.deletionVectors).toSeq
        else Nil

      val metrics = Map(
        "numRemovedFiles" -> removes.size.toString,
        "numAddedFiles" -> (rewriteAdds.size + insertAdds.size).toString,
        "numTargetRowsDeleted" -> deletedCount.toString) ++
        Dml.statsRowCount(insertAdds).map("numTargetRowsInserted" -> _.toString)
      txn.commit(protocolBump ++ removes ++ rewriteAdds ++ insertAdds ++ cdcActions,
        "INSERT REPLACE",
        operationParameters = Map("predicate" -> condition.toString),
        operationMetrics = metrics)
      metrics
    }
  }
}
