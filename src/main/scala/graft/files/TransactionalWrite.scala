package graft.files

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}
import org.apache.spark.sql.execution.datasources.FileFormatWriter
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.log.AddFile
import graft.stats.FooterStats

/**
 * Physical write of a DataFrame as new Parquet files under the table root,
 * returning the `AddFile`s to commit. Uses Spark's `FileFormatWriter`
 * directly (no directory listing, no rename) with a log-only commit
 * protocol — the write is invisible until the log commit lands.
 * (Reference concept: files/TransactionalWrite.scala:247 — re-designed.)
 */
object TransactionalWrite {

  /** Target shuffle-bytes per output file for optimized writes (shuffle
    * rows are uncompressed, so ~512 MB of shuffle data lands near the
    * reference's default parquet file target; reference concept:
    * perf/DeltaOptimizedWriterExec.scala:94-126 bin-packing of shuffle
    * blocks — re-designed on AQE's rebalance operator). */
  val BIN_SIZE_CONF = "spark.graft.optimizeWrite.binSizeBytes"
  val BIN_SIZE_DEFAULT: Long = 512L * 1024 * 1024

  private val TS_TYPE_CONF = "spark.sql.parquet.outputTimestampType"
  private val ADVISORY_CONF = "spark.sql.adaptive.advisoryPartitionSizeInBytes"

  /** Cached clones per caller session, keyed by (advisory override +
    * parent-conf fingerprint): cloneSession is not cheap — every clone
    * rebuilds SessionState and its eager ExecutionListenerManager
    * registers a listener on the context's SHARED listener bus, so a
    * fresh clone per write (every micro-batch, every DML rewrite)
    * accumulates listeners and bus fan-out until GC. A cached clone is
    * IMMUTABLE after creation (its conf is never mutated again), so a
    * write in flight can never see another thread's conf change
    * mid-job; when the parent's conf changes, the new fingerprint
    * simply yields a fresh clone and the old one ages out. Values are
    * weak: Spark's ExecutionListenerBus self-unregisters when its
    * session is collected, so an aged-out clone (and its listener)
    * disappears with the next GC instead of pinning the parent. */
  private final class WriteSessionEntry(
      val confs: Map[String, String],
      val ref: java.lang.ref.WeakReference[SparkSession])

  private val writeSessionCache =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, WriteSessionEntry]]()

  private[graft] def writeSession(
      spark: SparkSession, overrides: Map[String, String]): SparkSession = {
    val byOverrides = writeSessionCache.synchronized {
      var m = writeSessionCache.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, WriteSessionEntry]()
        writeSessionCache.put(spark, m)
      }
      m
    }
    val parentConfs = spark.conf.getAll
    // Write-scoped flags (advisory bin size, variant shredding layout)
    // live in the CACHE KEY, never on the parent conf: mutating the
    // parent would churn the fingerprint below and rebuild a clone —
    // and its shared-bus execution listener — on every alternating
    // write, the exact accumulation this cache exists to prevent.
    val key = overrides.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(";")
    byOverrides.synchronized {
      val hit = Option(byOverrides.get(key))
        .filter(_.confs == parentConfs) // parent conf changed -> new clone
        .flatMap(e => Option(e.ref.get()))
      hit.getOrElse {
        val ws = org.apache.spark.sql.graftshim.SparkShims.cloneSession(spark)
        // Write timestamps as annotated TIMESTAMP_MICROS, not Spark's
        // default INT96: INT96 min/max footer stats have no defined
        // ordering (Parquet spec), so INT96 files would carry no usable
        // timestamp skipping stats.
        ws.conf.set(TS_TYPE_CONF, "TIMESTAMP_MICROS")
        overrides.foreach { case (k, v) => ws.conf.set(k, v) }
        byOverrides.put(key, new WriteSessionEntry(
          parentConfs, new java.lang.ref.WeakReference(ws)))
        ws
      }
    }
  }

  /**
   * @param optimizeWrite None = table default: partitioned writes
   *   rebalance on the partition key (each table-partition written by a
   *   bounded number of size-targeted tasks instead of (tasks ×
   *   partitions) small files — at 100 TB the difference between 1e5 and
   *   1e8 files); unpartitioned writes keep their natural parallelism.
   *   Some(true) = rebalance every write, including unpartitioned
   *   (small-task coalescing); Some(false) = never shuffle.
   *
   * The rebalance is AQE's: rows hash-shuffle on the key into
   * `spark.sql.shuffle.partitions` blocks, and the runtime re-plan
   * coalesces small blocks / splits skewed ones to the advisory size —
   * so a hot partition writes totalSize/binSize files, not one giant
   * one, and a 2000-partition trickle insert writes a few bin-packed
   * files, not 2000 tiny ones.
   */
  def writeFiles(
      spark: SparkSession,
      tablePath: Path,
      data: DataFrame,
      partitionColumns: Seq[String],
      dataSchema: StructType,
      collectStats: Boolean = true,
      optimizeWrite: Option[Boolean] = None,
      statsColumns: FooterStats.StatsColumns = FooterStats.StatsColumns(),
      extraConfs: Map[String, String] = Map.empty,
      randomPrefixLength: Option[Int] = None,
      materializePartitionColumns: Boolean = false): Seq[AddFile] = {
    val resolver = spark.sessionState.analyzer.resolver
    val analyzed = data.queryExecution.analyzed

    val logical = {
      // Build RebalancePartitions directly (not the REBALANCE hint, whose
      // parameter parser mangles column names with spaces/dots).
      def rebalance(on: Seq[String]):
          org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
        val attrs = on.map(name => analyzed.output
          .find(a => resolver(a.name, name)).getOrElse(
            throw new IllegalArgumentException(
              s"Partition column $name not found in ${analyzed.output.map(_.name)}")))
        org.apache.spark.sql.catalyst.plans.logical.RebalancePartitions(
          attrs, analyzed)
      }
      if (optimizeWrite.contains(false)) analyzed
      else if (partitionColumns.nonEmpty) rebalance(partitionColumns)
      else if (optimizeWrite.contains(true)) rebalance(Nil)
      else analyzed
    }

    // materializePartitionColumns: physically write the partition columns
    // INTO the data parquet, appended after the data columns — the
    // reference's layout (files/DeltaFileFormatWriter.scala:127-128
    // `dataColumns ++ partitionColumns`) for external readers that
    // consume the files without the log. FileFormatWriter drops the
    // partition ATTRIBUTES from the data columns by exprId, so an alias
    // copy of each partition column (same name, same metadata — parquet
    // field ids under column mapping ride along) survives as a data
    // column while the original keeps driving directory partitioning.
    // Partition values still ride in AddFile.partitionValues; engine
    // reads project only the data schema, so the extra physical column
    // is never double-read.
    val logicalFinal =
      if (!materializePartitionColumns || partitionColumns.isEmpty) logical
      else {
        import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression}
        val copies = partitionColumns.map { name =>
          val a = logical.output.find(x => resolver(x.name, name)).getOrElse(
            throw new IllegalArgumentException(
              s"Partition column $name not found in ${logical.output.map(_.name)}"))
          Alias(a, a.name)(explicitMetadata = Some(a.metadata))
        }
        org.apache.spark.sql.catalyst.plans.logical.Project(
          logical.output.map(a => a: NamedExpression) ++ copies, logical)
      }

    // Per-plan conf scoping: the overrides go on a cached CLONED session
    // (shared context, forked SQLConf) that only writes plan and execute
    // against — a concurrent query or write on another thread of the
    // caller's session never inherits them.
    // Size-target the rebalance: AQE coalesces/splits shuffle blocks to
    // the advisory size, which here is the write's bin size — applied
    // ONLY to plans whose sole exchange is the rebalance itself; a DML
    // rewrite's join/aggregate shuffles keep AQE's default sizing (a
    // 512 MB advisory would re-scale them too: fewer, fatter reduce
    // partitions, lost parallelism, executor memory pressure).
    val rebalanced = logical ne analyzed
    val simplePlan = !analyzed.exists {
      case _: org.apache.spark.sql.catalyst.plans.logical.Join => true
      case _: org.apache.spark.sql.catalyst.plans.logical.Aggregate => true
      case _: org.apache.spark.sql.catalyst.plans.logical.Window => true
      case _: org.apache.spark.sql.catalyst.plans.logical.Distinct => true
      case _: org.apache.spark.sql.catalyst.plans.logical.RepartitionOperation => true
      case _ => false
    }
    // Parallelism floor: a size-targeted rebalance caps write parallelism
    // at totalShuffleBytes / binSize, which for inputs smaller than
    // cores x binSize leaves most of the cluster idle (measured: a
    // 3-valued partitionBy of sf10 lineitem wrote with ~9 of 32 cores,
    // 25x per decade instead of ~10x). Clamp the advisory so the write
    // keeps at least the default parallelism when the input is small —
    // estimated from logical stats (compressed scan bytes; x3 for the
    // uncompressed shuffle rows AQE actually bins). At real scale the
    // clamp is inert: bytes / cores exceeds the bin size long before
    // 100 TB, so files stay size-targeted exactly as before.
    val advisory =
      if (rebalanced && simplePlan) {
        val bin = spark.conf.getOption(BIN_SIZE_CONF).map(_.toLong)
          .getOrElse(BIN_SIZE_DEFAULT)
        val est = analyzed.stats.sizeInBytes
        val cores = math.max(1, spark.sparkContext.defaultParallelism)
        val floor = 16L * 1024 * 1024
        // never exceed the configured bin (an explicit small bin is a
        // request for small files); within it, keep enough bins to fill
        // the cluster, floored so tiny inserts don't shatter
        // BigInt: est.toLong * 3 overflows Long for estimates above
        // Long.MaxValue/3 (join-cardinality blowups keep isValidLong true
        // well past that), and a negative product would collapse the
        // advisory to the floor — shattering a huge rebalanced write.
        val clamped =
          if (est.isValidLong)
            BigInt(bin).min((BigInt(est.toLong) * 3 / cores)
              .max(BigInt(floor))).toLong
          else bin
        Some(clamped.toString)
      }
      else None
    val writeSession = TransactionalWrite.writeSession(spark,
      extraConfs ++ advisory.map(ADVISORY_CONF -> _))

    val wdf = org.apache.spark.sql.graftshim.SparkShims.ofRows(
      writeSession, logicalFinal)
    val qe = wdf.queryExecution
    val output: Seq[Attribute] = qe.analyzed.output
    // With materialized copies appended, two attributes share each
    // partition name: `find` picks the FIRST — the original (the Project
    // preserves order), whose exprId the alias copies do not share, so
    // only the original is claimed as a partition column.
    val partAttrs = partitionColumns.map { name =>
      output.find(a => resolver(a.name, name)).getOrElse(
        throw new IllegalArgumentException(
          s"Partition column $name not found in ${output.map(_.name)}"))
    }

    val committer = new GraftCommitProtocol(UUID.randomUUID.toString,
      tablePath.toString, randomPrefixLength)
    FileFormatWriter.write(
      sparkSession = writeSession.asInstanceOf[ClassicSession],
      plan = qe.executedPlan,
      fileFormat = new ParquetFileFormat,
      committer = committer,
      outputSpec = FileFormatWriter.OutputSpec(tablePath.toString, Map.empty, output),
      hadoopConf = writeSession.sessionState.newHadoopConf(),
      partitionColumns = partAttrs,
      bucketSpec = None,
      statsTrackers = Nil,
      options = Map.empty)

    val adds = committer.addedFiles
    if (collectStats)
      FooterStats.withStats(spark, tablePath, adds, dataSchema, statsColumns)
    else adds
  }
}
