package graft.catalog

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType

import graft.commands.WriteIntoGraft
import graft.log.{GraftLog, Metadata}
import graft.schema.SchemaUtils

/**
 * DSv2 session-catalog extension (enable with
 * `spark.sql.catalog.spark_catalog=graft.catalog.GraftCatalog`): routes
 * CREATE TABLE / CTAS / REPLACE TABLE / CREATE OR REPLACE over
 * `USING graft` tables into the transaction log, keeping the metastore
 * entry as a locator + cosmetic schema copy. All other providers
 * delegate untouched to the built-in session catalog.
 * (Reference concept: catalog/AbstractDeltaCatalog.scala:81-594 +
 * StagedDeltaTableV2 — re-designed: the log commit IS the atomic swap,
 * so staging only defers the metastore registration.)
 */
class GraftCatalog extends DelegatingCatalogExtension with StagingTableCatalog {

  private def spark: SparkSession = SparkSession.active

  private def isGraftProvider(properties: util.Map[String, String]): Boolean =
    Option(properties.get(TableCatalog.PROP_PROVIDER)).exists(_.equalsIgnoreCase("graft"))

  private def toV1Ident(ident: Identifier): TableIdentifier = ident.namespace() match {
    case Array() => TableIdentifier(ident.name())
    case Array(db) => TableIdentifier(ident.name(), Some(db))
    case other => throw new IllegalArgumentException(
      s"Nested namespaces are not supported for graft tables: ${other.mkString(".")}")
  }

  /** Graft-table data directory for `ident` (metastore default when the
    * statement carries no LOCATION — a managed graft table). */
  private def tableLocation(ident: Identifier, properties: util.Map[String, String]): String =
    Option(properties.get(TableCatalog.PROP_LOCATION)).getOrElse(
      spark.sessionState.catalog.defaultTablePath(toV1Ident(ident)).toString)

  /** Spark-internal keys that must not leak into the table's log config. */
  private val reservedKeys = Set(
    TableCatalog.PROP_LOCATION, TableCatalog.PROP_PROVIDER, TableCatalog.PROP_OWNER,
    TableCatalog.PROP_COMMENT, TableCatalog.PROP_EXTERNAL, "path",
    "is_managed_location", "transient_lastDdlTime")

  private def logConfig(properties: util.Map[String, String]): Map[String, String] =
    properties.asScala.toMap.filter { case (k, _) =>
      !reservedKeys.contains(k) && !k.startsWith(TableCatalog.OPTION_PREFIX)
    }

  /** Split transforms into identity partition columns and CLUSTER BY
    * columns (the latter map to `graft.clusterBy`, which makes OPTIMIZE
    * run incremental Hilbert clustering). */
  private[catalog] def splitTransforms(
      partitions: Array[Transform]): (Seq[String], Seq[String]) = {
    val (clusters, parts) = partitions.toSeq.partition(_.name() == "cluster_by")
    val clusterCols = clusters.flatMap(_.references().toSeq.map { r =>
      require(r.fieldNames().length == 1,
        s"graft tables support only top-level CLUSTER BY columns, got $r")
      r.fieldNames().head
    })
    val partCols = parts.map { t =>
      val refs = t.references()
      require(t.name() == "identity" && refs.length == 1 && refs.head.fieldNames().length == 1,
        s"graft tables support only top-level identity partitioning, got $t")
      refs.head.fieldNames().head
    }
    (partCols, clusterCols)
  }

  /** Accept GENERATED ALWAYS AS (...) and IDENTITY column DDL — the specs
    * land in StructField metadata and the write path computes/verifies. */
  override def capabilities(): util.Set[TableCatalogCapability] = {
    val caps = new util.HashSet[TableCatalogCapability](super.capabilities())
    caps.add(TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS)
    caps.add(TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_IDENTITY_COLUMNS)
    caps.add(TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT)
    caps
  }

  /** CREATE TABLE ... (cols, CONSTRAINT n CHECK (...)) — fold the check
    * constraints into the table properties the write path enforces. */
  private def withConstraintProps(
      properties: util.Map[String, String],
      constraints: Array[org.apache.spark.sql.connector.catalog.constraints.Constraint])
      : util.Map[String, String] = {
    if (constraints.isEmpty) return properties
    val out = new util.HashMap[String, String](properties)
    constraints.foreach {
      case c: org.apache.spark.sql.connector.catalog.constraints.Check =>
        out.put(graft.constraints.Constraints.PROP_PREFIX + c.name(), c.predicateSql())
      case other => throw new UnsupportedOperationException(
        s"Unsupported constraint for graft tables: $other")
    }
    out
  }

  override def createTable(
      ident: Identifier,
      info: org.apache.spark.sql.connector.catalog.TableInfo): Table =
    createTable(ident, info.columns(), info.partitions(),
      withConstraintProps(info.properties(), info.constraints()))

  override def stageCreate(
      ident: Identifier,
      info: org.apache.spark.sql.connector.catalog.TableInfo): StagedTable =
    stageCreate(ident, info.columns(), info.partitions(),
      withConstraintProps(info.properties(), info.constraints()))

  override def stageReplace(
      ident: Identifier,
      info: org.apache.spark.sql.connector.catalog.TableInfo): StagedTable =
    stageReplace(ident, info.columns(), info.partitions(),
      withConstraintProps(info.properties(), info.constraints()))

  override def stageCreateOrReplace(
      ident: Identifier,
      info: org.apache.spark.sql.connector.catalog.TableInfo): StagedTable =
    stageCreateOrReplace(ident, info.columns(), info.partitions(),
      withConstraintProps(info.properties(), info.constraints()))

  /** v2 columns -> StructType, carrying generation/identity specs into
    * the metadata keys the graft write path understands. */
  private[catalog] def columnsToSchema(columns: Array[Column]): StructType = {
    import org.apache.spark.sql.types.{MetadataBuilder, StructField}
    StructType(columns.map { c =>
      require(c.defaultValue() == null,
        s"DEFAULT values are not supported for graft column ${c.name}")
      val mb = new MetadataBuilder()
      Option(c.comment()).foreach(mb.putString("comment", _))
      Option(c.generationExpression()).foreach(
        mb.putString(graft.schema.ColumnDefaults.GEN_KEY, _))
      Option(c.identityColumnSpec()).foreach { id =>
        mb.putLong(graft.schema.ColumnDefaults.ID_START, id.getStart)
        mb.putLong(graft.schema.ColumnDefaults.ID_STEP, id.getStep)
      }
      StructField(c.name, c.dataType, c.nullable, mb.build())
    })
  }

  /** Graft tables surface as DSv2 tables (with v1 fallback wiring inside)
    * so `df.writeTo` and DSv2 time travel resolve; everything else stays
    * the delegate's V1Table. */
  override def loadTable(ident: Identifier): Table =
    wrapIfGraft(super.loadTable(ident), None)

  override def loadTable(ident: Identifier, version: String): Table = {
    val t = super.loadTable(ident)
    if (asGraft(t).isDefined) wrapIfGraft(t, Some(version.toLong))
    else super.loadTable(ident, version)
  }

  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val t = super.loadTable(ident)
    asGraft(t) match {
      case Some(ct) =>
        // DSv2 passes micros; the log resolves to the version current at
        // that wall-clock instant.
        val log = GraftLog.forTable(spark, ct.location.toString)
        wrapIfGraft(t, Some(log.getVersionAtTime(timestamp / 1000L)))
      case None => super.loadTable(ident, timestamp)
    }
  }

  private def asGraft(t: Table): Option[org.apache.spark.sql.catalyst.catalog.CatalogTable] =
    org.apache.spark.sql.graftshim.SparkShims.v1CatalogTable(t)
      .filter(_.provider.exists(_.equalsIgnoreCase("graft")))

  private def wrapIfGraft(t: Table, version: Option[Long]): Table =
    asGraft(t) match {
      case Some(ct) =>
        new GraftTableV2(spark, ct.location.toString, ct, version)
      case None => t
    }

  /** Location of an existing graft table registered under `ident`, if any. */
  private def graftLocation(ident: Identifier): Option[String] =
    try {
      org.apache.spark.sql.graftshim.SparkShims.v1CatalogTable(super.loadTable(ident))
        .filter(_.provider.exists(_.equalsIgnoreCase("graft")))
        .map(_.location.toString)
    } catch { case _: NoSuchTableException => None }

  override def createTable(
      ident: Identifier,
      columns: Array[Column],
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    if (!isGraftProvider(properties)) {
      return super.createTable(ident, columns, partitions, properties)
    }
    val schema = columnsToSchema(columns)
    val loc = tableLocation(ident, properties)
    val log = GraftLog.forTable(spark, loc)
    val (finalSchema, finalParts) =
      if (log.tableExists) {
        // CREATE TABLE over an existing graft directory adopts the log's
        // definition (the common "register an existing table" flow).
        val m = log.update().metadata
        require(schema.isEmpty || SchemaUtils.isWriteCompatible(m.schema, schema),
          s"Declared schema ${schema.simpleString} does not match existing " +
            s"graft table at $loc (${m.schema.simpleString})")
        (m.schema, m.partitionColumns)
      } else {
        require(schema.nonEmpty,
          s"CREATE TABLE needs a schema: $loc holds no graft table to adopt")
        val (partCols, clusterCols) = splitTransforms(partitions)
        val cfg = logConfig(properties) ++
          (if (clusterCols.nonEmpty)
            Map("graft.clusterBy" -> clusterCols.mkString(",")) else Map.empty)
        graft.Graft.create(spark, loc, schema, partCols, cfg)
        (schema, partCols)
      }
    registerInMetastore(ident, properties, loc)
    super.loadTable(ident)
  }

  /** Metastore entry for a graft table whose log already exists — the
    * location is expected to be non-empty, so validation is skipped
    * (V2SessionCatalog would refuse a managed location the log write
    * just created). */
  private def registerInMetastore(
      ident: Identifier,
      properties: util.Map[String, String],
      loc: String): Unit = {
    val external = properties.containsKey(TableCatalog.PROP_LOCATION) &&
      !properties.containsKey("is_managed_location")
    GraftCatalog.register(spark, toV1Ident(ident), loc, external,
      logConfig(properties))
  }

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table =
    createTable(ident, org.apache.spark.sql.graftshim.SparkShims.structTypeToV2Columns(schema), partitions, properties)

  override def stageCreate(
      ident: Identifier,
      columns: Array[Column],
      partitions: Array[Transform],
      properties: util.Map[String, String]): StagedTable =
    stage(ident, columns, partitions, properties, StagedMode.Create)

  override def stageReplace(
      ident: Identifier,
      columns: Array[Column],
      partitions: Array[Transform],
      properties: util.Map[String, String]): StagedTable =
    stage(ident, columns, partitions, properties, StagedMode.Replace)

  override def stageCreateOrReplace(
      ident: Identifier,
      columns: Array[Column],
      partitions: Array[Transform],
      properties: util.Map[String, String]): StagedTable =
    stage(ident, columns, partitions, properties, StagedMode.CreateOrReplace)

  private def stage(
      ident: Identifier,
      columns: Array[Column],
      partitions: Array[Transform],
      properties: util.Map[String, String],
      mode: StagedMode.Value): StagedTable = {
    if (isGraftProvider(properties)) {
      new StagedGraftTable(this, ident, columns, partitions, properties, mode)
    } else {
      // Non-graft staged DDL: create eagerly, drop again on abort.
      val table = super.createTable(ident, columns, partitions, properties)
      new StagedTable {
        override def name(): String = table.name()
        override def schema(): StructType = table.schema()
        override def partitioning(): Array[Transform] = table.partitioning()
        override def capabilities(): util.Set[TableCapability] = table.capabilities()
        override def properties(): util.Map[String, String] = table.properties()
        override def commitStagedChanges(): Unit = ()
        override def abortStagedChanges(): Unit = { dropTable(ident); () }
      }
    }
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    graftLocation(ident).foreach { loc =>
      val tbl = graft.GraftTable.forPath(spark, loc)
      val sets = changes.collect {
        case s: TableChange.SetProperty => s.property -> s.value
      }.toMap -- reservedKeys
      val unsets = changes.collect {
        case r: TableChange.RemoveProperty => r.property
      }.filterNot(reservedKeys.contains)
      if (sets.nonEmpty) tbl.upsertProperties(sets)
      if (unsets.nonEmpty) tbl.removeProperties(unsets)
    }
    super.alterTable(ident, changes: _*)
  }

  /** REPLACE TABLE body shared with the staged path: one log commit swaps
    * metadata and data atomically; readers see old or new, never a mix. */
  private[graft] def replaceTableData(
      loc: String,
      data: Option[DataFrame],
      declaredSchema: StructType,
      partCols: Seq[String],
      config: Map[String, String],
      mustExist: Boolean): Unit = {
    val log = GraftLog.forTable(spark, loc)
    require(!mustExist || log.tableExists, s"REPLACE TABLE: $loc is not a graft table")
    log.withNewTransaction { txn =>
      val now = System.currentTimeMillis()
      txn.readWholeTable()
      val removes = txn.snapshot.allFiles.map(_.remove(now))
      // CTAS/RTAS source frames may carry another table's column-mapping
      // bookkeeping; the new definition assigns its own.
      val schema = graft.schema.ColumnMapping.stripMappingMetadata(
        data.map(_.schema).getOrElse(declaredSchema))
      require(schema.nonEmpty, s"REPLACE TABLE needs a schema or a query")
      val keepId =
        if (txn.readVersion >= 0) txn.snapshot.metadata.id
        else java.util.UUID.randomUUID.toString
      val base = Metadata(
        id = keepId,
        schemaString = SchemaUtils.toNullable(schema).json,
        partitionColumns = partCols,
        configuration = config,
        createdTime = Some(now))
      txn.updateMetadata(
        if (graft.schema.ColumnMapping.isEnabled(base))
          graft.schema.ColumnMapping.enable(base)
        else base)
      val adds = data.map(d => txn.writeFiles(d)).getOrElse(Nil)
      txn.commit(adds ++ removes, "REPLACE TABLE",
        operationMetrics = Map(
          "numAddedFiles" -> adds.size.toString,
          "numRemovedFiles" -> removes.size.toString))
    }
  }

  /** Metastore registration after a staged commit. Never drops an existing
    * entry — for a managed table that would delete the data directory the
    * staged write just filled. */
  private[catalog] def registerStaged(
      ident: Identifier,
      partitions: Array[Transform],
      properties: util.Map[String, String],
      loc: String): Unit = {
    val m = GraftLog.forTable(spark, loc).update().metadata
    if (!super.tableExists(ident)) {
      registerInMetastore(ident, properties, loc)
    } else {
      val cat = spark.sessionState.catalog
      val ti = toV1Ident(ident)
      try {
        cat.externalCatalog.alterTableDataSchema(
          ti.database.getOrElse(cat.getCurrentDatabase), ti.table, m.dataSchema)
      } catch { case _: Exception => () } // cosmetic copy; the log is truth
    }
    graft.sql.GraftCatalogCache.invalidate(spark)
  }
}

object GraftCatalog {
  /** Register a metastore entry for an existing graft log (schema and
    * partitioning read from the log; no location validation). */
  def register(
      spark: SparkSession,
      ident: TableIdentifier,
      loc: String,
      external: Boolean,
      properties: Map[String, String] = Map.empty): Unit = {
    import org.apache.spark.sql.catalyst.catalog.{CatalogStorageFormat, CatalogTable, CatalogTableType}
    val m = GraftLog.forTable(spark, loc).update().metadata
    val table = CatalogTable(
      identifier = ident,
      tableType = if (external) CatalogTableType.EXTERNAL else CatalogTableType.MANAGED,
      storage = CatalogStorageFormat.empty.copy(
        locationUri = Some(new org.apache.hadoop.fs.Path(loc).toUri)),
      schema = m.schema,
      provider = Some("graft"),
      partitionColumnNames = m.partitionColumns,
      properties = properties)
    spark.sessionState.catalog.createTable(table,
      ignoreIfExists = false, validateLocation = false)
  }
}

private[catalog] object StagedMode extends Enumeration {
  val Create, Replace, CreateOrReplace = Value
}

/**
 * Staged CTAS / RTAS target. The data write commits to the graft log (the
 * real atomic swap); commitStagedChanges only registers the metastore
 * entry; abort leaves at most unreferenced data files for VACUUM.
 */
private[catalog] class StagedGraftTable(
    catalog: GraftCatalog,
    ident: Identifier,
    columns: Array[Column],
    partitions: Array[Transform],
    tableProps: util.Map[String, String],
    mode: StagedMode.Value) extends StagedTable with SupportsWrite {

  private def spark: SparkSession = SparkSession.active
  private val loc: String = {
    val p = Option(tableProps.get(TableCatalog.PROP_LOCATION))
    p.getOrElse(spark.sessionState.catalog.defaultTablePath(ident.namespace() match {
      case Array() => TableIdentifier(ident.name())
      case Array(db) => TableIdentifier(ident.name(), Some(db))
      case o => throw new IllegalArgumentException(o.mkString("."))
    }).toString)
  }
  private val declaredSchema = catalog.columnsToSchema(columns)
  private val (partCols: Seq[String], clusterCols: Seq[String]) =
    catalog.splitTransforms(partitions)
  private val config: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    tableProps.asScala.toMap.filter { case (k, _) =>
      !Set(TableCatalog.PROP_LOCATION, TableCatalog.PROP_PROVIDER,
        TableCatalog.PROP_OWNER, TableCatalog.PROP_COMMENT,
        TableCatalog.PROP_EXTERNAL, "path", "is_managed_location").contains(k) &&
        !k.startsWith(TableCatalog.OPTION_PREFIX)
    } ++ (if (clusterCols.nonEmpty)
      Map("graft.clusterBy" -> clusterCols.mkString(",")) else Map.empty)
  }
  private var wroteData = false

  override def name(): String = ident.toString
  override def schema(): StructType = declaredSchema
  override def partitioning(): Array[Transform] = partitions
  override def properties(): util.Map[String, String] = tableProps
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.V1_BATCH_WRITE, TableCapability.ACCEPT_ANY_SCHEMA,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.OVERWRITE_DYNAMIC).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder
        with org.apache.spark.sql.connector.write.SupportsTruncate
        with org.apache.spark.sql.connector.write.SupportsOverwrite
        with org.apache.spark.sql.connector.write.SupportsDynamicOverwrite {
      // The staged modes already define replace-vs-append semantics; the
      // planner's overwrite markers carry no extra information here.
      override def truncate(): WriteBuilder = this
      override def overwrite(filters: Array[org.apache.spark.sql.sources.Filter])
          : WriteBuilder = this
      override def overwriteDynamicPartitions(): WriteBuilder = this
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit = {
              wroteData = true
              mode match {
                case StagedMode.Create =>
                  require(!GraftLog.forTable(spark, loc).tableExists,
                    s"CREATE TABLE AS SELECT: $loc already holds a graft table " +
                      "(use CREATE OR REPLACE)")
                  WriteIntoGraft(spark, loc, data, mode = "append",
                    partitionBy = partCols, configuration = config)
                case StagedMode.Replace =>
                  catalog.replaceTableData(loc, Some(data), declaredSchema,
                    partCols, config, mustExist = true)
                case StagedMode.CreateOrReplace =>
                  catalog.replaceTableData(loc, Some(data), declaredSchema,
                    partCols, config, mustExist = false)
              }
            }
          }
      }
    }

  override def commitStagedChanges(): Unit = {
    if (!wroteData) {
      // Plain CREATE / REPLACE TABLE (no AS SELECT) through the staged path.
      mode match {
        case StagedMode.Create =>
          val log = GraftLog.forTable(spark, loc)
          if (!log.tableExists) {
            require(declaredSchema.nonEmpty,
              s"CREATE TABLE needs a schema: $loc holds no graft table to adopt")
            graft.Graft.create(spark, loc, declaredSchema, partCols, config)
          }
        case _ =>
          catalog.replaceTableData(loc, None, declaredSchema, partCols, config,
            mustExist = mode == StagedMode.Replace)
      }
    }
    catalog.registerStaged(ident, partitions, tableProps, loc)
  }

  override def abortStagedChanges(): Unit = ()
}
