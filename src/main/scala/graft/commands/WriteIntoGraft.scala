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
      txnVersion: Option[Long] = None,
      overwriteSchema: Boolean = false,
      dataChange: Boolean = true): Long = {
    val log = GraftLog.forTable(spark, path)
    log.withNewTransaction { txn =>
      run(spark, path, data, txn, mode, partitionBy, replaceWhere, mergeSchema,
        dynamicPartitionOverwrite, configuration, txnAppId, txnVersion,
        overwriteSchema, dataChange)
    }
  }

  /** Body of a write against an already-open transaction (separated so
    * concurrency tests can pin a snapshot and inject a competing commit). */
  private[graft] def run(
      spark: SparkSession,
      path: String,
      data: DataFrame,
      txn: OptimisticTransaction,
      mode: String,
      partitionBy: Seq[String] = Nil,
      replaceWhere: Option[String] = None,
      mergeSchema: Boolean = false,
      dynamicPartitionOverwrite: Boolean = false,
      configuration: Map[String, String] = Map.empty,
      txnAppId: Option[String] = None,
      txnVersion: Option[Long] = None,
      overwriteSchema: Boolean = false,
      dataChange: Boolean = true): Long = {
    {
      // dataChange=false marks a user-driven rearrangement (manual
      // compaction): same rows, new layout. Streams skip such commits.
      // Only plain append/overwrite qualify — a selective replaceWhere or
      // DPO write has no row-preservation guarantee worth asserting.
      require(dataChange || (replaceWhere.isEmpty && !dynamicPartitionOverwrite),
        "dataChange=false cannot be combined with replaceWhere or dynamic " +
          "partition overwrite")
      // Idempotent writes: skip a batch the table has already absorbed.
      for (app <- txnAppId; v <- txnVersion) {
        if (txn.txnVersion(app) >= v) return txn.readVersion
      }
      val isNew = txn.readVersion < 0
      // The incoming frame may carry column-mapping bookkeeping from the
      // table it was READ from (physical names, field ids). The target
      // table owns its mapping; inherited metadata would alias new
      // columns onto foreign physical names.
      val dataSchema = graft.schema.ColumnMapping.stripMappingMetadata(data.schema)
      val m0 =
        if (isNew) {
          val base = Metadata(
            schemaString = SchemaUtils.toNullable(dataSchema).json,
            partitionColumns = partitionBy,
            configuration = configuration,
            createdTime = Some(System.currentTimeMillis()))
          // Column mapping declared at creation (required for id mode:
          // every data file must carry field ids from the first write).
          if (graft.schema.ColumnMapping.isEnabled(base))
            graft.schema.ColumnMapping.enable(base)
          else base
        } else txn.snapshot.metadata
      val replacingSchema = !isNew && mode == "overwrite" && overwriteSchema &&
        replaceWhere.isEmpty && !dynamicPartitionOverwrite
      require(isNew || replacingSchema || partitionBy.isEmpty ||
        partitionBy == m0.partitionColumns,
        s"Partitioning ${partitionBy} differs from table's ${m0.partitionColumns}")

      val m =
        if (isNew) m0
        else if (replacingSchema) {
          // overwriteSchema: the overwrite replaces schema AND (optionally)
          // partitioning wholesale. Old columns' mapping ids are dropped
          // with the old files; new fields get fresh physical names.
          graft.schema.ColumnMapping.stampNewFields(m0.copy(
            schemaString = SchemaUtils.toNullable(dataSchema).json,
            partitionColumns =
              if (partitionBy.nonEmpty) partitionBy else m0.partitionColumns))
        }
        else if (mode == "overwrite" && mergeSchema && replaceWhere.isEmpty &&
            !SchemaUtils.isWriteCompatible(m0.schema, data.schema) &&
            configuration.isEmpty) {
          graft.schema.ColumnMapping.stampNewFields(
            m0.copy(schemaString = SchemaUtils.toNullable(
              SchemaUtils.mergeSchemas(m0.schema, dataSchema)).json))
        } else if (!SchemaUtils.isWriteCompatible(m0.schema, data.schema)) {
          if (mergeSchema)
            graft.schema.ColumnMapping.stampNewFields(
              m0.copy(schemaString = SchemaUtils.toNullable(
                SchemaUtils.mergeSchemas(m0.schema, dataSchema)).json))
          else throw new IllegalArgumentException(
            s"Schema mismatch writing to $path:\n table: ${m0.schema.simpleString}\n" +
              s" data: ${data.schema.simpleString}\nSet mergeSchema=true to evolve.")
        } else m0
      // A full overwrite that passes `configuration` refreshes the table
      // properties ATOMICALLY with the data commit: a rebuild-in-place
      // (e.g. a dedup index with new banding) must never expose new data
      // under old properties, even to a crash or a concurrent reader.
      val mFinal =
        if (!isNew && mode == "overwrite" && replaceWhere.isEmpty &&
            !dynamicPartitionOverwrite &&
            configuration.exists { case (k, v) => !m.configuration.get(k).contains(v) })
          m.copy(configuration = m.configuration ++ configuration)
        else m
      if (isNew || (mFinal ne m0)) txn.updateMetadata(mFinal)

      // generated/identity defaults, then schema alignment, then CHECKs
      val (withDefaults, genChecks) = graft.schema.ColumnDefaults.applyDefaults(data, mFinal)
      var normalized = SchemaUtils.normalize(withDefaults, mFinal.schema)
      normalized = graft.constraints.Constraints.enforce(normalized, mFinal)
      // replaceWhere validation rides the write projection itself (a
      // raise_error guard) instead of a second full scan of the input.
      if (mode == "overwrite") replaceWhere.foreach { cond =>
        if (normalized.columns.nonEmpty) {
          val first = normalized.columns.head
          val ft = normalized.schema(first).dataType
          normalized = normalized.withColumn(first,
            when(coalesce(expr(cond), lit(false)), col(first)).otherwise(
              raise_error(lit(
                s"Data written to $path violates replaceWhere '$cond'")).cast(ft)))
        }
      }
      genChecks.foreach { case (name, ok) =>
        if (normalized.columns.nonEmpty) {
          val first = normalized.columns.head
          val ft = normalized.schema(first).dataType
          normalized = normalized.withColumn(first,
            when(coalesce(ok, lit(false)), col(first)).otherwise(
              raise_error(lit(s"provided value violates $name")).cast(ft)))
        }
      }
      val adds0 = txn.writeFiles(normalized)
      val adds = if (dataChange) adds0 else adds0.map(_.copy(dataChange = false))
      // identity watermark advance rides in the same commit
      graft.schema.ColumnDefaults.advanceWatermarks(txn.metadata, adds)
        .foreach(txn.updateMetadata)
      val now = System.currentTimeMillis()

      val (removes: Seq[RemoveFile], survivorAdds: Seq[AddFile]) = mode match {
        case "append" => (Nil, Nil)
        case "overwrite" =>
          replaceWhere match {
            case Some(cond) =>
              val condition = spark.sessionState.sqlParser.parseExpression(cond)
              val (partF, dataF) = splitPredicates(condition, mFinal)
              val candidates = txn.filterFiles(partF, dataF)
              if (dataF.isEmpty) (candidates.map(_.remove(now)), Nil)
              else {
                // Arbitrary (non-partition) replaceWhere deletes only the
                // rows MATCHING the predicate: candidate files also hold
                // non-matching rows (stats selection is conservative and
                // file bounds rarely align with the predicate), so rewrite
                // the survivors instead of dropping them with the file.
                val log = txn.log
                val condCol = expr(cond)
                val touched = Dml.findTouchedFiles(
                  spark, log, txn, candidates, condCol)
                val kept = txn.writeFiles(
                  Dml.scanFiles(spark, log, txn, touched)
                    .filter(!coalesce(condCol, lit(false))))
                (touched.map(_.remove(now)), kept)
              }
            case None if dynamicPartitionOverwrite =>
              // Register the touched partitions as READ so a concurrent
              // append into an overwritten partition raises a conflict
              // instead of being silently lost.
              val touched = adds.map(_.partitionValues).toSet
              if (touched.isEmpty) (Nil, Nil)
              else {
                val pred = touchedPartitionPredicate(touched.toSeq, mFinal)
                (txn.filterFiles(Seq(pred), Nil).map(_.remove(now)), Nil)
              }
            case None =>
              txn.readWholeTable()
              (txn.snapshot.allFiles.map(_.remove(now, dataChange)), Nil)
          }
        case other => throw new IllegalArgumentException(s"Unknown mode $other")
      }

      val txnAction = for (app <- txnAppId; v <- txnVersion)
        yield SetTransaction(app, v, Some(now))

      // Any feature the (possibly configuration-merged) metadata switches
      // on installs its reader/writer gate IN THIS COMMIT — a
      // variant-shredding or row-tracking overwrite must never hand
      // feature-gated data to readers the protocol never warned.
      val featureBump: Seq[Action] =
        if (txn.readVersion < 0) Nil // first commit: minimal protocol already rides
        else TableFeatures.requiredUpgradeForMetadata(
          txn.snapshot.protocol, txn.metadata).toSeq

      txn.commit(
        featureBump ++ adds ++ survivorAdds ++ removes ++ txnAction.toSeq,
        operation = if (mode == "append") "WRITE" else "OVERWRITE",
        operationParameters = Map(
          "mode" -> mode) ++ replaceWhere.map("replaceWhere" -> _),
        operationMetrics = Map(
          "numAddedFiles" -> adds.size.toString,
          "numRemovedFiles" -> removes.size.toString))
    }
  }

  /** OR-of-ANDs partition predicate matching exactly the given partition
    * value maps (null partition values compare with IS NULL). Attributes
    * are logical (filterFiles translates); value lookup is by PHYSICAL
    * key, which is how AddFile partitionValues are written. */
  private def touchedPartitionPredicate(
      touched: Seq[Map[String, String]],
      metadata: Metadata)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val partFields = metadata.partitionColumns.map(c => metadata.schema(c))
    touched.map { pv =>
      partFields.map { f =>
        val attr = AttributeReference(f.name, f.dataType)()
        pv.get(graft.schema.ColumnMapping.physicalName(f)).flatMap(Option(_)) match {
          case Some(s) => EqualTo(attr,
            Cast(Literal(UTF8String.fromString(s), StringType), f.dataType, Some("UTC")))
          case None => IsNull(attr)
        }
      }.reduceOption[Expression](And).getOrElse(Literal(true))
    }.reduceOption[Expression](Or).getOrElse(Literal(false))
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
