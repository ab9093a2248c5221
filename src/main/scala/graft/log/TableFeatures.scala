package graft.log

/**
 * Table-feature vectors: beyond the legacy numeric versions (reader <= 2,
 * writer <= 6), capabilities are negotiated per feature — a protocol at
 * (3, 7) carries explicit `readerFeatures` / `writerFeatures` name lists
 * and a client may read/write iff it understands every listed feature,
 * independent of when each feature shipped. DROP FEATURE walks the table
 * back: once no data depends on a feature, the vectors shrink and the
 * protocol downgrades to the minimal versions the remaining features
 * need, so old readers regain access.
 * (Reference concept: actions/actions.scala:232 protocol feature fields +
 * TableFeature.scala:352-402 feature registry and
 * PreDowngradeTableFeatureCommand.scala — re-designed.)
 */
object TableFeatures {

  /** Versions at which the protocol switches to explicit feature lists. */
  val FEATURES_READER_VERSION = 3
  val FEATURES_WRITER_VERSION = 7

  /** A capability with the minimum legacy versions that imply it.
    * `minReader >= 2` means readers that ignore it would misread data
    * (reader-gating); writer-only features never block a reader. */
  final case class Feature(name: String, minReader: Int, minWriter: Int) {
    def readerGating: Boolean = minReader >= 2
  }

  val appendOnly = Feature("appendOnly", 1, 2)
  val invariants = Feature("invariants", 1, 2)
  val checkConstraints = Feature("checkConstraints", 1, 3)
  val changeDataFeed = Feature("changeDataFeed", 1, 4)
  val generatedColumns = Feature("generatedColumns", 1, 4)
  val columnMapping = Feature("columnMapping", 2, 5)
  val identityColumns = Feature("identityColumns", 1, 6)
  val deletionVectors = Feature("deletionVectors", 3, 7)
  val rowTracking = Feature("rowTracking", 1, 7)
  val typeWidening = Feature("typeWidening", 3, 7)
  val v2Checkpoint = Feature("v2Checkpoint", 3, 7)
  val domainMetadata = Feature("domainMetadata", 1, 7)
  // Writer-gating only: backfill is synchronous, so plain readers read
  // the published log; a writer without the coordinator must be locked
  // out or it would bypass the table's commit arbitration.
  val coordinatedCommits = Feature("coordinatedCommits", 1, 7)
  // CCv2 (reference TableFeature.scala:1285-1305 CatalogOwnedTableFeature):
  // the managing CATALOG owns commit arbitration, and in the reference's
  // contract the newest commits may live only in the catalog — so the
  // feature is READER-WRITER (a reader folding the filesystem log alone
  // could serve a stale snapshot), unlike the older writer-only
  // coordinatedCommits. Graft maps it onto the same CommitCoordinator
  // seam with synchronous backfill; the reader gate still stands so
  // graft tables interchange with clients that honor the stricter
  // contract. Required features per the reference: inCommitTimestamp +
  // vacuumProtocolCheck (added alongside in activeFeatures). No
  // downgrade path (the reference throws on preDowngrade), which
  // dropFeature's undroppable default already enforces.
  val catalogManaged = Feature("catalogManaged", 3, 7)
  // Writer-gating: a writer unaware of collations would strip the
  // __COLLATIONS schema metadata on its next metadata commit and
  // silently change the table's comparison semantics. Reads are safe —
  // the collation rides in the schema JSON itself.
  val collations = Feature("collations", 1, 7)
  val clustering = Feature("clustering", 1, 7)
  val timestampNtz = Feature("timestampNtz", 3, 7)
  val variantType = Feature("variantType", 3, 7)
  // Reader-gating: shredded files store variant paths as typed parquet
  // sub-columns; a reader unaware of shredding sees a struct where the
  // schema says VARIANT and fails (or worse, misreads).
  val variantShredding = Feature("variantShredding", 3, 7)
  // Writer-gating: monotone CommitInfo-sourced timestamps only stay
  // monotone if every writer stamps them; an unaware writer would fork
  // the table's time-travel ordering back to file mtimes.
  val inCommitTimestamp = Feature("inCommitTimestamp", 1, 7)
  // Both-sides gate ensuring clients honor tombstone retention before
  // vacuuming — protects tables shared with readers that pin old files.
  val vacuumProtocolCheck = Feature("vacuumProtocolCheck", 3, 7)
  // Writer-gating: a writer unaware of defaults would null-fill omitted
  // columns where the table contract says "fill with the default".
  val allowColumnDefaults = Feature("allowColumnDefaults", 1, 7)
  // Writer-gating: after DROP FEATURE ... TRUNCATE HISTORY the checkpoint
  // at the boundary version is the only readable table root — a cleaner
  // unaware of the boundary could delete it (or part of the history
  // below it) and strand readers mid-replay.
  val checkpointProtection = Feature("checkpointProtection", 1, 7)
  // Reader-gating: a reader unaware of the redirect would keep serving
  // the frozen source files while live data accrues at the destination.
  val redirectReaderWriter = Feature("redirectReaderWriter", 3, 7)
  // Writer-gating ONLY — that is the whole point of the writer-only
  // redirect: legacy readers may keep reading the frozen source, but a
  // writer unaware of the redirect would fork it instead of landing at
  // the destination (reference TableFeature.scala:757).
  val redirectWriterOnly = Feature("redirectWriterOnly", 1, 7)
  // Writer-gating: the feature's contract is that every data file written
  // AFTER it is set physically carries the partition columns (for external
  // readers that consume the raw parquet without the log); a writer
  // unaware of it would elide them and silently break that layout promise.
  // Reads never gate — partition values always ride in
  // AddFile.partitionValues (reference TableFeature.scala:1155-1169:
  // "Readers can read the data regardless").
  val materializePartitionColumns =
    Feature("materializePartitionColumns", 1, 7)

  val all: Seq[Feature] = Seq(appendOnly, invariants, checkConstraints,
    changeDataFeed, generatedColumns, columnMapping, identityColumns,
    deletionVectors, rowTracking, typeWidening, v2Checkpoint,
    domainMetadata, clustering, timestampNtz, variantType, variantShredding,
    coordinatedCommits, collations, inCommitTimestamp, vacuumProtocolCheck,
    allowColumnDefaults, checkpointProtection, redirectReaderWriter,
    redirectWriterOnly, materializePartitionColumns, catalogManaged)
  val byName: Map[String, Feature] = all.map(f => f.name -> f).toMap

  /** Every reader-gating feature this build understands. */
  val supportedReaderFeatures: Set[String] =
    all.filter(_.readerGating).map(_.name).toSet

  /** Every writer feature this build maintains. */
  val supportedWriterFeatures: Set[String] = all.map(_.name).toSet

  /** Features the table's CURRENT metadata actually exercises. */
  def activeFeatures(m: Metadata): Set[Feature] = {
    val conf = m.configuration
    def on(key: String) = conf.getOrElse(key, "false").toBoolean
    val b = Set.newBuilder[Feature]
    if (on("graft.enableDeletionVectors")) b += deletionVectors
    if (conf.contains(graft.schema.ColumnMapping.MODE_KEY)) b += columnMapping
    if (on("graft.enableChangeDataFeed")) b += changeDataFeed
    // Row tracking keeps its id watermark in a metadata domain, so the
    // domainMetadata writer capability travels with it.
    if (on("graft.enableRowTracking")) { b += rowTracking; b += domainMetadata }
    if (conf.contains("graft.clusterBy")) b += clustering
    if (on("graft.enableTypeWidening")) b += typeWidening
    if (on("graft.appendOnly")) b += appendOnly
    // A v2-checkpoint table must lock out readers that would fold the
    // small manifest as if it were the whole state (silently empty).
    if (conf.get("graft.checkpointPolicy").contains("v2")) b += v2Checkpoint
    if (conf.contains("graft.coordinatedCommits.coordinator"))
      b += coordinatedCommits
    if (conf.contains("graft.catalogManaged.coordinator")) {
      // requiredFeatures ride along (reference CatalogOwnedTableFeature
      // .requiredFeatures): the protocol must carry them even if their
      // own metadata triggers are off.
      b += catalogManaged; b += inCommitTimestamp; b += vacuumProtocolCheck
    }
    if (on("graft.enableInCommitTimestamps")) b += inCommitTimestamp
    if (conf.contains("graft.requireCheckpointProtectionBeforeVersion"))
      b += checkpointProtection
    if (conf.contains(TableRedirect.PROP)) b += redirectReaderWriter
    if (conf.contains(TableRedirect.PROP_WRITER_ONLY)) b += redirectWriterOnly
    // Auto-enabled by its metadata property, the reference's
    // FeatureAutomaticallyEnabledByMetadata contract
    // (TableFeature.scala:1180-1188): setting the property on an existing
    // table upgrades the protocol on the same commit.
    if (on("graft.enableMaterializePartitionColumnsFeature"))
      b += materializePartitionColumns
    if (conf.keys.exists(_.startsWith(graft.constraints.Constraints.PROP_PREFIX)))
      b += checkConstraints
    if (m.schemaString != null) {
      val fields = m.schema.fields
      if (fields.exists(_.metadata.contains(graft.schema.ColumnDefaults.GEN_KEY)))
        b += generatedColumns
      if (fields.exists(_.metadata.contains(graft.schema.ColumnDefaults.ID_START)))
        b += identityColumns
      if (fields.exists(_.metadata.contains(graft.schema.ColumnDefaults.DEFAULT_KEY)))
        b += allowColumnDefaults
      // Type-gated READER features: a foreign reader that cannot decode
      // these physical types must be locked out by the protocol, not by
      // a runtime decode error.
      def hasType(dt: org.apache.spark.sql.types.DataType,
          pred: org.apache.spark.sql.types.DataType => Boolean): Boolean = dt match {
        case s: org.apache.spark.sql.types.StructType =>
          s.fields.exists(f => hasType(f.dataType, pred))
        case a: org.apache.spark.sql.types.ArrayType => hasType(a.elementType, pred)
        case mp: org.apache.spark.sql.types.MapType =>
          hasType(mp.keyType, pred) || hasType(mp.valueType, pred)
        case other => pred(other)
      }
      if (hasType(m.schema,
          _.isInstanceOf[org.apache.spark.sql.types.TimestampNTZType]))
        b += timestampNtz
      if (hasType(m.schema,
          _.isInstanceOf[org.apache.spark.sql.types.VariantType])) {
        b += variantType
        if (on("graft.enableVariantShredding")) b += variantShredding
      }
      if (hasType(m.schema, {
          case st: org.apache.spark.sql.types.StringType =>
            st != org.apache.spark.sql.types.StringType
          case _ => false
        }))
        b += collations
    }
    b.result()
  }

  /** The minimal protocol supporting `features`: legacy numeric versions
    * while every feature predates the vectors; the reader version rises
    * to 3 ONLY for reader-gating vector features — a writer-only vector
    * feature (e.g. rowTracking) yields (legacyReader, 7) so old readers
    * keep access (the reference's readerFeatures-only-at-3 rule). */
  def minimalProtocol(features: Set[Feature]): Protocol = {
    val legacyReader = (features.map(_.minReader) + 1).max
    val needsReaderVectors = legacyReader >= FEATURES_READER_VERSION
    val needsWriterVectors =
      (features.map(_.minWriter) + 1).max >= FEATURES_WRITER_VERSION
    if (!needsReaderVectors && !needsWriterVectors)
      Protocol(legacyReader, (features.map(_.minWriter) + 1).max)
    else Protocol(
      if (needsReaderVectors) FEATURES_READER_VERSION else legacyReader,
      FEATURES_WRITER_VERSION,
      readerFeatures =
        if (needsReaderVectors)
          Some(features.filter(_.readerGating).map(_.name).toSeq.sorted)
        else None,
      writerFeatures = Some(features.map(_.name).toSeq.sorted))
  }

  /** The features `p` lists explicitly (vector features only). */
  def vectorFeatures(p: Protocol): Set[Feature] =
    (p.readerFeatureNames ++ p.writerFeatureNames).flatMap(byName.get)

  /** Upgrade `current` so everything the metadata exercises is
    * supported; None when no commit is needed. Vector features already
    * listed are preserved. */
  def requiredUpgradeForMetadata(
      current: Protocol, m: Metadata): Option[Protocol] = {
    val target = minimalProtocol(
      activeFeatures(m) ++ vectorFeatures(current))
    val merged = Protocol(
      math.max(current.minReaderVersion, target.minReaderVersion),
      math.max(current.minWriterVersion, target.minWriterVersion),
      mergeFeatures(current.readerFeatures, target.readerFeatures),
      mergeFeatures(current.writerFeatures, target.writerFeatures))
    if (merged == current) None else Some(merged)
  }

  /** The protocol `current` must become so `feature` (plus whatever the
    * metadata already uses) is supported; None when no commit is needed.
    * Never lowers versions, never drops an already-listed feature. */
  def requiredUpgrade(
      current: Protocol, m: Metadata, feature: Feature): Option[Protocol] = {
    val target = minimalProtocol(
      activeFeatures(m) ++ vectorFeatures(current) + feature)
    val merged = Protocol(
      math.max(current.minReaderVersion, target.minReaderVersion),
      math.max(current.minWriterVersion, target.minWriterVersion),
      mergeFeatures(current.readerFeatures, target.readerFeatures),
      mergeFeatures(current.writerFeatures, target.writerFeatures))
    if (merged == current) None else Some(merged)
  }

  private def mergeFeatures(
      a: Option[Seq[String]], b: Option[Seq[String]]): Option[Seq[String]] =
    (a, b) match {
      case (None, None) => None
      case _ => Some((a.getOrElse(Nil) ++ b.getOrElse(Nil)).distinct.sorted)
    }

  /** Reader-side gate: can a client at `version` that knows
    * `supportedFeatures` read a table at `p`? Exactly version 3 means
    * feature negotiation; anything above is from a future protocol no
    * feature list can compensate for. */
  def readable(p: Protocol, version: Int, supportedFeatures: Set[String]): Boolean =
    if (p.minReaderVersion == FEATURES_READER_VERSION)
      version >= FEATURES_READER_VERSION &&
        (p.readerFeatureNames -- supportedFeatures).isEmpty
    else p.minReaderVersion <= version

  /** Writer-side gate: writing under a feature this build does not know
    * could silently break the invariant that feature maintains (e.g. an
    * unknown index a writer must update) — refuse instead. */
  def writable(p: Protocol, version: Int, supportedFeatures: Set[String]): Boolean =
    if (p.minWriterVersion == FEATURES_WRITER_VERSION)
      version >= FEATURES_WRITER_VERSION &&
        (p.writerFeatureNames -- supportedFeatures).isEmpty
    else p.minWriterVersion <= version
}
