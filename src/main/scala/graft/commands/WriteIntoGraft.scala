package graft.commands

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.log._
import graft.schema.SchemaUtils
import graft.tx.OptimisticTransaction

/**
 * df.write semantics for a Graft table: append, overwrite, replaceWhere,
 * dynamic partition overwrite, schema create/evolve. (Reference concept:
 * commands/WriteIntoDelta.scala:81-133 — re-designed.)
 */
object WriteIntoGraft {

  def apply(
      spark: SparkSession,
      path: String,
      data: DataFrame,
      mode: String = "append",              // append | overwrite
      partitionBy: Seq[String] = Nil,
      replaceWhere: Option[String] = None,
      mergeSchema: Boolean = false,
      dynamicPartitionOverwrite: Boolean = false,
      configuration: Map[String, String] = Map.empty,
      txnAppId: Option[String] = None,
      txnVersion: Option[Long] = None): Long = {
    val log = GraftLog.forTable(spark, path)
    log.withNewTransaction { txn =>
      // Idempotent writes: skip a batch the table has already absorbed.
      for (app <- txnAppId; v <- txnVersion) {
        if (txn.txnVersion(app) >= v) return txn.readVersion
      }
      val isNew = txn.readVersion < 0
      val m0 =
        if (isNew) {
          Metadata(
            schemaString = SchemaUtils.toNullable(data.schema).json,
            partitionColumns = partitionBy,
            configuration = configuration,
            createdTime = Some(System.currentTimeMillis()))
        } else txn.snapshot.metadata
      require(isNew || partitionBy.isEmpty ||
        partitionBy == m0.partitionColumns,
        s"Partitioning ${partitionBy} differs from table's ${m0.partitionColumns}")

      val m =
        if (isNew) m0
        else if (mode == "overwrite" && mergeSchema && replaceWhere.isEmpty &&
            !SchemaUtils.isWriteCompatible(m0.schema, data.schema) &&
            configuration.isEmpty) {
          m0.copy(schemaString = SchemaUtils.toNullable(
            SchemaUtils.mergeSchemas(m0.schema, data.schema)).json)
        } else if (!SchemaUtils.isWriteCompatible(m0.schema, data.schema)) {
          if (mergeSchema)
            m0.copy(schemaString = SchemaUtils.toNullable(
              SchemaUtils.mergeSchemas(m0.schema, data.schema)).json)
          else throw new IllegalArgumentException(
            s"Schema mismatch writing to $path:\n table: ${m0.schema.simpleString}\n" +
              s" data: ${data.schema.simpleString}\nSet mergeSchema=true to evolve.")
        } else m0
      if (isNew || (m ne m0)) txn.updateMetadata(m)

      // generated/identity defaults, then schema alignment, then CHECKs
      val (withDefaults, genChecks) = graft.schema.ColumnDefaults.applyDefaults(data, m)
      var normalized = SchemaUtils.normalize(withDefaults, m.schema)
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
      val adds = txn.writeFiles(normalized)
      // identity watermark advance rides in the same commit
      graft.schema.ColumnDefaults.advanceWatermarks(txn.metadata, adds)
        .foreach(txn.updateMetadata)
      val now = System.currentTimeMillis()

      val removes: Seq[RemoveFile] = mode match {
        case "append" => Nil
        case "overwrite" =>
          replaceWhere match {
            case Some(cond) =>
              val condition = spark.sessionState.sqlParser.parseExpression(cond)
              // Validate: every incoming row must satisfy the predicate.
              val bad = normalized.filter(!coalesce(expr(cond), lit(false))).limit(1).count()
              require(bad == 0, s"Data written to $path violates replaceWhere '$cond'")
              val (partF, dataF) = splitPredicates(condition, m)
              txn.filterFiles(partF, dataF).map(_.remove(now))
            case None if dynamicPartitionOverwrite =>
              val touched = adds.map(_.partitionValues).toSet
              txn.snapshot.allFiles
                .filter(f => touched.contains(f.partitionValues)).map(_.remove(now))
            case None =>
              txn.readWholeTable()
              txn.snapshot.allFiles.map(_.remove(now))
          }
        case other => throw new IllegalArgumentException(s"Unknown mode $other")
      }

      val txnAction = for (app <- txnAppId; v <- txnVersion)
        yield SetTransaction(app, v, Some(now))

      txn.commit(
        adds ++ removes ++ txnAction.toSeq,
        operation = if (mode == "append") "WRITE" else "OVERWRITE",
        operationParameters = Map(
          "mode" -> mode) ++ replaceWhere.map("replaceWhere" -> _),
        operationMetrics = Map(
          "numAddedFiles" -> adds.size.toString,
          "numRemovedFiles" -> removes.size.toString))
    }
  }

  /** Resolve bare column names in an API/SQL predicate against the
    * table schema (UnresolvedAttribute -> typed AttributeReference). */
  def resolve(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    e.transformUp {
      case u: UnresolvedAttribute =>
        val name = u.nameParts.last
        schema.find(_.name.equalsIgnoreCase(name))
          .map(f => AttributeReference(f.name, f.dataType, f.nullable)())
          .getOrElse(u)
    }
  }

  /** Split a predicate into partition-only conjuncts and the rest. */
  def splitPredicates(
      condition: org.apache.spark.sql.catalyst.expressions.Expression,
      metadata: Metadata)
      : (Seq[org.apache.spark.sql.catalyst.expressions.Expression],
         Seq[org.apache.spark.sql.catalyst.expressions.Expression]) = {
    import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference}
    def conjuncts(e: org.apache.spark.sql.catalyst.expressions.Expression)
        : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val partCols = metadata.partitionColumns.map(_.toLowerCase).toSet
    conjuncts(resolve(condition, metadata.schema)).partition { c =>
      val refs = c.collect { case a: AttributeReference => a.name.toLowerCase }
      refs.nonEmpty && refs.forall(partCols.contains)
    }
  }
}
