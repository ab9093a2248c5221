package graft.commands

import scala.collection.mutable

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, Metadata => FieldMetadata, MetadataBuilder, StructField, StructType}

import graft.GraftTable
import graft.log._

/**
 * CONVERT FROM DELTA: register an existing Delta Lake table as a graft
 * table by folding its `_delta_log` — the `_last_checkpoint`-named
 * classic checkpoint (single or multi-part parquet) plus the newer JSON
 * commits — into graft commit 0. Data files are never copied or
 * rewritten: per-file stats come across verbatim (same min/max/nullCount
 * JSON shape, so skipping works immediately), schema and partitioning
 * carry over, and table configuration / column metadata translate
 * key-for-key (column mapping physical names and field ids, generated /
 * identity / DEFAULT columns, CHECK constraints, append-only, CDF).
 *
 * The fold follows the PUBLIC Delta protocol spec (reference
 * PROTOCOL.md; log replay rules :913-934) — no Delta code is involved.
 *
 * Live deletion vectors import too: each descriptor (inline / relative /
 * absolute, per the spec's Z85 + portable-bitmap formats) re-encodes
 * into a graft `_dv/` sidecar — metadata-scale bytes, never a data
 * rewrite. Unknown reader features abort rather than risk misreading
 * the data layout. Row tracking watermarks and in-commit timestamps do
 * not carry over (the graft table starts its own history).
 */
object ConvertFromDeltaCommand {

  private val mapper = new ObjectMapper()

  def run(spark: SparkSession, path: String): GraftTable = {
    val log = GraftLog.forTable(spark, path)
    require(!log.tableExists, s"$path is already a graft table")
    val deltaLog = new Path(log.dataPath, "_delta_log")
    val fs = log.store.fs(deltaLog)
    require(fs.exists(deltaLog), s"$path has no _delta_log — not a Delta table")

    // ---- checkpoint base (optional) ------------------------------------
    val lastCp: Option[JsonNode] =
      try Some(mapper.readTree(log.store.read(new Path(deltaLog, "_last_checkpoint"))))
      catch { case _: Exception => None }
    val cpVersion = lastCp.map(_.path("version").asLong(-1)).filter(_ >= 0)
    val adds = mutable.LinkedHashMap.empty[String, AddFile]
    var metaNode: JsonNode = null
    var protoNode: JsonNode = null
    val txns = mutable.LinkedHashMap.empty[String, Long]
    val domains = mutable.LinkedHashMap.empty[String, String]
    val pendingDvs = mutable.LinkedHashMap.empty[String, DvRef]

    var cpUsed: Option[Long] = None
    cpVersion.foreach { v =>
      val parts = lastCp.map(_.path("parts").asInt(0)).getOrElse(0)
      val cpFiles: Seq[String] =
        if (parts > 0) (1 to parts).map(i =>
          new Path(deltaLog, f"$v%020d.checkpoint.$i%010d.$parts%010d.parquet").toString)
        else Seq(new Path(deltaLog, f"$v%020d.checkpoint.parquet").toString)
      val classicPresent = cpFiles.forall(p => fs.exists(new Path(p)))
      if (classicPresent) {
        // Generic parquet read; only the action columns matter. toJSON
        // gives the same shape as the JSON commits, so one fold path
        // serves both.
        spark.read.parquet(cpFiles: _*).toJSON.collect().foreach { line =>
          applyAction(mapper.readTree(line), adds,
            m => metaNode = m, p => protoNode = p, pendingDvs, txns, domains)
        }
        if (adds.nonEmpty || metaNode != null) cpUsed = Some(v)
        else require(fs.exists(new Path(deltaLog, f"${0L}%020d.json")),
          s"checkpoint at $v held no foldable actions (v2/sidecar layout) " +
            "and the JSON history does not reach version 0 — cannot fold")
      } else {
        // v2/UUID-named checkpoint (or missing parts): fold the JSON log
        // from version 0 instead, which must then be complete.
        require(fs.exists(new Path(deltaLog, f"${0L}%020d.json")),
          s"_last_checkpoint names a checkpoint layout this convert does " +
            "not read (v2/sidecar) and the JSON history does not reach " +
            "version 0 — cannot fold")
      }
    }
    val cpVersionUsed = cpUsed

    // ---- JSON tail ------------------------------------------------------
    val deltaVersions = fs.listStatus(deltaLog).toSeq
      .flatMap(st => FileNames.deltaVersion(st.getPath.getName))
      .filter(v => cpVersionUsed.forall(v > _)).sorted
    require(cpVersionUsed.isDefined || deltaVersions.headOption.contains(0L),
      s"Delta log at $path is truncated (no checkpoint and no version 0)")
    deltaVersions.foreach { v =>
      log.store.read(new Path(deltaLog, f"$v%020d.json"))
        .linesIterator.filter(_.nonEmpty)
        .foreach(line => applyAction(mapper.readTree(line), adds,
          m => metaNode = m, p => protoNode = p, pendingDvs, txns, domains))
    }
    require(metaNode != null, s"Delta log at $path carries no metaData action")

    // ---- protocol gate --------------------------------------------------
    val understood = Set("columnMapping", "timestampNtz", "variantType",
      "typeWidening", "v2Checkpoint", "deletionVectors")
    if (protoNode != null) {
      val rf = Option(protoNode.get("readerFeatures")).toSeq
        .flatMap(n => (0 until n.size()).map(n.get(_).asText()))
      val unknown = rf.toSet -- understood
      require(unknown.isEmpty,
        s"Delta table requires reader features $unknown this convert " +
          "does not understand — converting could misread the data layout")
      require(protoNode.path("minReaderVersion").asInt(1) <= 3,
        "Delta reader version beyond 3 is not supported")
    }

    // ---- translate metadata --------------------------------------------
    val schemaString = metaNode.path("schemaString").asText(null)
    require(schemaString != null, "Delta metaData has no schemaString")
    val schema = DataType.fromJson(schemaString).asInstanceOf[StructType]
    val partitionCols = Option(metaNode.get("partitionColumns")).toSeq
      .flatMap(n => (0 until n.size()).map(n.get(_).asText()))
    val deltaConf = Option(metaNode.get("configuration")).map { n =>
      import scala.jdk.CollectionConverters._
      n.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    }.getOrElse(Map.empty[String, String])

    // Every gate has passed — only now re-encode live DVs into graft
    // sidecars (an aborted convert must never write into the source).
    val hconf = spark.sessionState.newHadoopConf()
    pendingDvs.foreach { case (p, d) =>
      if (adds.contains(p)) {
        val bm = graft.dv.DeltaDvCodec.readDescriptor(log.dataPath, hconf,
          d.storageType, d.pathOrInlineDv, d.offset, d.sizeInBytes)
        require(bm.cardinality == d.cardinality,
          s"delta DV cardinality mismatch for $p")
        val rel =
          s"${graft.dv.DeletionVectors.DIR}/dv-${java.util.UUID.randomUUID}.bin"
        graft.dv.DeletionVectors.writeBitmap(new Path(log.dataPath, rel), hconf, bm)
        adds(p) = adds(p).copy(dvPath = Some(rel),
          dvCardinality = Some(d.cardinality))
      }
    }
    // Imported DVs need the feature gate even if the source table's
    // config never declared it explicitly.
    val dvExtra =
      if (adds.values.exists(_.dvPath.isDefined))
        Map("graft.enableDeletionVectors" -> "true")
      else Map.empty[String, String]
    val translated = Metadata(
      schemaString = translateSchema(schema).json,
      partitionColumns = partitionCols,
      configuration = translateConfig(deltaConf) ++ dvExtra,
      createdTime = Some(System.currentTimeMillis()))

    val files = adds.values.toSeq
    // Row tracking imports only when EVERY live file carries a base row
    // id — a partial import would hand out fresh ids that collide with
    // the source's. Idempotent-writer watermarks (txn actions) always
    // carry over, so a streaming writer switching engines cannot
    // double-apply its last batch.
    val allTracked = files.nonEmpty && files.forall(_.baseRowId.isDefined)
    val rtDomain = if (allTracked)
      domains.get("delta.rowTracking")
        .map(c => DomainMetadata(RowTracking.DOMAIN, c)).toSeq
      else Nil
    val rtConf =
      if (rtDomain.nonEmpty) Map("graft.enableRowTracking" -> "true")
      else Map.empty[String, String]
    val txnActions = txns.map { case (app, v) => SetTransaction(app, v) }.toSeq
    val finalMeta = translated.copy(
      configuration = translated.configuration ++ rtConf)
    val strippedFiles =
      if (rtDomain.nonEmpty) files
      else files.map(_.copy(baseRowId = None, defaultRowCommitVersion = None))
    log.withNewTransaction { txn =>
      txn.updateMetadata(finalMeta)
      txn.commit(strippedFiles ++ txnActions ++ rtDomain, "CONVERT FROM DELTA",
        operationMetrics = Map(
          "numConvertedFiles" -> files.size.toString,
          "sourceVersion" ->
            (deltaVersions.lastOption.orElse(cpVersion).getOrElse(0L)).toString))
    }
    new GraftTable(spark, log)
  }

  /** Delta log paths are RFC 2396 URIs (percent-encoded); graft AddFile
    * paths are plain filesystem paths. */
  private[commands] def decodePath(p: String): String =
    try {
      val uri = new java.net.URI(p)
      if (uri.getScheme != null) new Path(uri).toString
      else if (uri.getPath != null) uri.getPath
      else p
    } catch { case _: java.net.URISyntaxException => p }

  /** Pending DV descriptor for one add, resolved AFTER validation. */
  private[commands] final case class DvRef(storageType: String,
      pathOrInlineDv: String, offset: Int, sizeInBytes: Int, cardinality: Long)

  /** Fold one delta action (JSON tree) into the running state. Live
    * deletion vectors are only RECORDED here ([[DvRef]]); re-encoding
    * into graft `_dv/` sidecars happens after every validation gate has
    * passed, so an aborted convert never writes into the source table. */
  private def applyAction(
      node: JsonNode,
      adds: mutable.LinkedHashMap[String, AddFile],
      onMeta: JsonNode => Unit,
      onProto: JsonNode => Unit,
      pendingDvs: mutable.LinkedHashMap[String, DvRef] = mutable.LinkedHashMap.empty,
      txns: mutable.LinkedHashMap[String, Long] = mutable.LinkedHashMap.empty,
      domains: mutable.LinkedHashMap[String, String] = mutable.LinkedHashMap.empty)
      : Unit = {
    val add = node.get("add")
    val remove = node.get("remove")
    val meta = node.get("metaData")
    val proto = node.get("protocol")
    val txn = node.get("txn")
    val dom = node.get("domainMetadata")
    if (txn != null && !txn.isNull)
      txns(txn.path("appId").asText()) = txn.path("version").asLong()
    if (dom != null && !dom.isNull) {
      if (dom.path("removed").asBoolean(false))
        domains.remove(dom.path("domain").asText())
      else domains(dom.path("domain").asText()) =
        dom.path("configuration").asText("{}")
    }
    if (add != null && !add.isNull) {
      val path = decodePath(add.path("path").asText())
      val dv = add.get("deletionVector")
      if (dv == null || dv.isNull || dv.path("cardinality").asLong(0) == 0)
        pendingDvs.remove(path)
      else pendingDvs(path) = DvRef(
        dv.path("storageType").asText(),
        dv.path("pathOrInlineDv").asText(),
        dv.path("offset").asInt(0),
        dv.path("sizeInBytes").asInt(0),
        dv.path("cardinality").asLong(0))
      val pv = Option(add.get("partitionValues")).map { n =>
        import scala.jdk.CollectionConverters._
        n.properties().asScala.map(e => e.getKey ->
          (if (e.getValue.isNull) null else e.getValue.asText())).toMap
      }.getOrElse(Map.empty[String, String])
      adds(path) = AddFile(
        path = path,
        partitionValues = pv,
        size = add.path("size").asLong(0),
        modificationTime = add.path("modificationTime").asLong(0),
        dataChange = true,
        stats = Option(add.get("stats")).filterNot(_.isNull)
          .map(_.asText()).orNull,
        baseRowId = Option(add.get("baseRowId")).filterNot(_.isNull)
          .map(_.asLong()),
        defaultRowCommitVersion =
          Option(add.get("defaultRowCommitVersion")).filterNot(_.isNull)
            .map(_.asLong()))
    } else if (remove != null && !remove.isNull) {
      val path = decodePath(remove.path("path").asText())
      adds.remove(path)
      pendingDvs.remove(path)
    } else if (meta != null && !meta.isNull) {
      onMeta(meta)
    } else if (proto != null && !proto.isNull) {
      onProto(proto)
    }
  }

  /** delta.* table properties -> graft equivalents (unknown keys carry
    * over untouched — provenance beats silent loss). */
  private[commands] def translateConfig(c: Map[String, String]): Map[String, String] = {
    val renames = Map(
      "delta.appendOnly" -> "graft.appendOnly",
      "delta.enableChangeDataFeed" -> "graft.enableChangeDataFeed",
      "delta.enableDeletionVectors" -> "graft.enableDeletionVectors",
      "delta.checkpointInterval" -> "graft.checkpointInterval",
      "delta.columnMapping.mode" -> graft.schema.ColumnMapping.MODE_KEY,
      "delta.columnMapping.maxColumnId" -> graft.schema.ColumnMapping.MAX_ID_KEY,
      "delta.dataSkippingNumIndexedCols" -> "graft.dataSkippingNumIndexedCols",
      "delta.deletedFileRetentionDuration" -> "", // duration syntax differs; drop
      "delta.enableRowTracking" -> "", // watermarks do not carry over
      "delta.enableInCommitTimestamps" -> "") // fresh history, fresh clock
    c.flatMap {
      case (k, v) if k.startsWith("delta.constraints.") =>
        Some(graft.constraints.Constraints.PROP_PREFIX +
          k.stripPrefix("delta.constraints.") -> v)
      case (k, v) => renames.get(k) match {
        case Some("") => None
        case Some(nk) => Some(nk -> v)
        case None => Some(k -> v)
      }
    }
  }

  /** Per-field metadata keys -> graft equivalents, recursively. */
  private def translateSchema(s: StructType): StructType =
    StructType(s.fields.map(translateField))

  private def translateField(f: StructField): StructField = {
    val dt = f.dataType match {
      case st: StructType => translateSchema(st)
      case a: org.apache.spark.sql.types.ArrayType =>
        a.elementType match {
          case st: StructType => a.copy(elementType = translateSchema(st))
          case _ => a
        }
      case m: org.apache.spark.sql.types.MapType =>
        m.valueType match {
          case st: StructType => m.copy(valueType = translateSchema(st))
          case _ => m
        }
      case other => other
    }
    f.copy(dataType = dt, metadata = translateFieldMeta(f.metadata))
  }

  private def translateFieldMeta(m: FieldMetadata): FieldMetadata = {
    val renames = Map(
      "delta.columnMapping.physicalName" -> graft.schema.ColumnMapping.PHYS_KEY,
      "delta.generationExpression" -> graft.schema.ColumnDefaults.GEN_KEY,
      "delta.identity.start" -> graft.schema.ColumnDefaults.ID_START,
      "delta.identity.step" -> graft.schema.ColumnDefaults.ID_STEP)
    var changed = false
    val mb = new MetadataBuilder().withMetadata(m)
    renames.foreach { case (dk, gk) =>
      if (m.contains(dk)) {
        changed = true
        // values are strings (physicalName, generation SQL) or longs
        // (identity start/step); copy through json round-trip to keep type
        val json = mapper.readTree(m.json)
        val v = json.get(dk)
        if (v.isNumber) mb.putLong(gk, v.asLong) else mb.putString(gk, v.asText())
        mb.remove(dk)
      }
    }
    if (m.contains("delta.columnMapping.id")) {
      changed = true
      val id = mapper.readTree(m.json).get("delta.columnMapping.id").asLong
      mb.putLong(graft.schema.ColumnMapping.ID_KEY, id)
      mb.remove("delta.columnMapping.id")
    }
    if (changed) mb.build() else m
  }
}
