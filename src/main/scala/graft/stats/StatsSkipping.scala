package graft.stats

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.log.AddFile

/**
 * File-pruning from per-file min/max/nullCount statistics: data predicates
 * are compiled into a "stats-space" predicate and evaluated AS A SPARK JOB
 * over the `Dataset[AddFile]` — metadata-scale work distributes across the
 * cluster, so skipping stays cheap even with millions of files.
 * (Reference concept: stats/DataSkippingReader.scala:612-705 +
 * DataFiltersBuilder.scala:263-436 — re-designed for DataFrame eval.)
 *
 * Soundness: any sub-predicate we cannot compile, and any file whose stats
 * are missing/unparseable, KEEPS the file (three-valued logic resolved
 * toward inclusion).
 */
object StatsSkipping {

  /** Schema of the per-file stats JSON, derived from the (already
    * stats-truncated) data schema. One definition for collection,
    * skipping and convert — see [[StatsSpace]]. */
  def statsSchema(dataSchema: StructType): StructType =
    StatsSpace.statsDocSchema(dataSchema)

  /**
   * Prune `files` using data filters. Returns the surviving files.
   * Runs distributed when there are files+filters; otherwise passthrough.
   */
  def filterFiles(
      spark: SparkSession,
      files: Seq[AddFile],
      dataSchema: StructType,
      dataFilters: Seq[Expression],
      statsColumns: FooterStats.StatsColumns = FooterStats.StatsColumns()): Seq[AddFile] = {
    if (files.isEmpty || dataFilters.isEmpty) return files
    // Only the stats-carrying fields are visible here; truncating the
    // schema keeps compile() from emitting stats-space predicates for
    // columns that were never collected.
    val statsVisible = StructType(statsColumns.select(dataSchema))
    val preds = dataFilters.flatMap(f => compile(f, statsVisible))
    if (preds.isEmpty) return files
    import spark.implicits._
    val withStats = spark.createDataset(files)
      .withColumn("_parsed", from_json(col("stats"), statsSchema(statsVisible)))
    val keep = preds.map(p => coalesce(p, lit(true))).reduce(_ && _)
    withStats
      .where(col("_parsed").isNull || col("stats").isNull || keep)
      .drop("_parsed")
      .as[AddFile]
      .collect()
      .toSeq
  }

  /** Unified file selection: partition pruning + stats skipping, choosing
    * the execution venue by file count. Below the threshold (or for a
    * pinned DML candidate subset) the driver path runs — a tight local
    * loop plus one small local job. At or above it, both phases run as
    * ONE distributed filter over the snapshot's cached parsed-stats view,
    * so a 10M-file table neither re-serializes its file list per query
    * nor prunes partitions in a single driver thread. */
  def pruneAndFilter(
      spark: SparkSession,
      snapshot: graft.log.Snapshot,
      pinned: Option[Seq[AddFile]],
      partitionSchema: StructType,
      partitionFilters: Seq[Expression],
      dataSchema: StructType,
      dataFilters: Seq[Expression],
      statsColumns: FooterStats.StatsColumns = FooterStats.StatsColumns())
      : Seq[AddFile] = {
    val threshold = spark.conf.getOption("spark.graft.distributedSkipping.threshold")
      .map(_.toInt).getOrElse(100000)
    // numFiles, not allFiles.size: on a lazy checkpoint-backed snapshot
    // the count is one distributed agg — touching allFiles here would
    // force the whole file map onto the driver before the venue choice.
    if (pinned.isEmpty && snapshot.numFiles >= threshold) {
      pruneAndFilterDistributed(spark, snapshot, partitionSchema,
        partitionFilters, dataSchema, dataFilters, statsColumns)
    } else {
      val pruned = graft.files.GraftFileIndex.prunePartitions(
        pinned.getOrElse(snapshot.allFiles), partitionSchema, partitionFilters)
      filterFiles(spark, pruned, dataSchema, dataFilters, statsColumns)
    }
  }

  private[stats] def pruneAndFilterDistributed(
      spark: SparkSession,
      snapshot: graft.log.Snapshot,
      partitionSchema: StructType,
      partitionFilters: Seq[Expression],
      dataSchema: StructType,
      dataFilters: Seq[Expression],
      statsColumns: FooterStats.StatsColumns): Seq[AddFile] = {
    import org.apache.spark.sql.graftshim.SparkShims
    val statsVisible = StructType(statsColumns.select(dataSchema))
    val view = snapshot.skippingView(statsVisible)
    val conds = Seq.newBuilder[Column]
    if (partitionFilters.nonEmpty && partitionSchema.nonEmpty) {
      // Same predicate the driver path binds, with each partition
      // attribute replaced by a UTC-cast map lookup (null partition
      // values and unknown attributes resolve exactly as the driver
      // path's Predicate.eval: null drops, unknown keeps).
      val pvCol = view("partitionValues")
      val mapped = partitionFilters.reduce(And).transform {
        case a: AttributeReference =>
          val idx = partitionSchema.indexWhere(f => f.name.equalsIgnoreCase(a.name))
          if (idx < 0) Literal(true)
          else Cast(
            SparkShims.expression(element_at(pvCol, partitionSchema(idx).name)),
            partitionSchema(idx).dataType, Some("UTC"))
      }
      conds += SparkShims.column(mapped)
    }
    val preds = dataFilters.flatMap(f => compile(f, statsVisible))
    if (preds.nonEmpty) {
      val keep = preds.map(p => coalesce(p, lit(true))).reduce(_ && _)
      conds += (col("_parsed").isNull || col("stats").isNull || keep)
    }
    val all = conds.result()
    // Nothing compiled to a pushable condition: the answer is the full
    // file list. Collect it from the distributed view so a LAZY snapshot
    // stays lazy — the caller's Seq is transient, the snapshot's cached
    // state is not.
    if (all.isEmpty) return snapshot.allFilesCollected
    import spark.implicits._
    view.where(all.reduce(_ && _)).drop("_parsed").as[AddFile].collect().toSeq
  }

  private def stat(section: String, name: String): Column =
    col("_parsed").getField(section).getField(name)

  private def litOf(l: Literal): Option[Column] = l.dataType match {
    case _: IntegerType | _: LongType | _: ShortType | _: ByteType |
         _: DoubleType | _: FloatType | _: StringType | _: BooleanType |
         _: DateType | _: TimestampType =>
      Option(l.value).map { _ =>
        lit(CatalystTypeConverters.createToScalaConverter(l.dataType)(l.value))
      }
    case _ => None
  }

  /** Stats min/max are byte-ordered (parquet footer order). A string
    * column under a non-default collation (e.g. UTF8_LCASE) orders
    * differently, so a stats-space comparison could wrongly prune a
    * file whose matches sort outside the byte range — those columns are
    * invisible to skipping (the reference makes the same choice for
    * collated columns in its skipping logic). */
  private def statsComparable(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case st: StringType => st == StringType
      case _ => true
    }

  private def attrName(e: Expression, schema: StructType): Option[String] = {
    val name = e match {
      case a: AttributeReference => Some(a.name)
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        Some(u.nameParts.last)
      case _ => None
    }
    name.flatMap(n => schema.fields.find(_.name.equalsIgnoreCase(n))
      .filter(f => statsComparable(f.dataType)).map(_.name))
  }

  /**
   * Compile one data predicate into a stats-space predicate Column.
   * None = cannot decide from stats (file must be kept).
   */
  def compile(e: Expression, schema: StructType): Option[Column] = e match {
    case And(l, r) =>
      (compile(l, schema), compile(r, schema)) match {
        case (Some(a), Some(b)) => Some(coalesce(a, lit(true)) && coalesce(b, lit(true)))
        case (Some(a), None) => Some(a)
        case (None, Some(b)) => Some(b)
        case _ => None
      }
    case Or(l, r) =>
      for (a <- compile(l, schema); b <- compile(r, schema))
        yield coalesce(a, lit(true)) || coalesce(b, lit(true))
    case EqualTo(a, l: Literal) =>
      attrName(a, schema).flatMap(n => litOf(l).map(v =>
        stat("minValues", n) <= v && stat("maxValues", n) >= v))
    case EqualTo(l: Literal, a) => compile(EqualTo(a, l), schema)
    case LessThan(a, l: Literal) =>
      attrName(a, schema).flatMap(n => litOf(l).map(v => stat("minValues", n) < v))
    case LessThan(l: Literal, a) => compile(GreaterThan(a, l), schema)
    case LessThanOrEqual(a, l: Literal) =>
      attrName(a, schema).flatMap(n => litOf(l).map(v => stat("minValues", n) <= v))
    case LessThanOrEqual(l: Literal, a) => compile(GreaterThanOrEqual(a, l), schema)
    case GreaterThan(a, l: Literal) =>
      attrName(a, schema).flatMap(n => litOf(l).map(v => stat("maxValues", n) > v))
    case GreaterThan(l: Literal, a) => compile(LessThan(a, l), schema)
    case GreaterThanOrEqual(a, l: Literal) =>
      attrName(a, schema).flatMap(n => litOf(l).map(v => stat("maxValues", n) >= v))
    case GreaterThanOrEqual(l: Literal, a) => compile(LessThanOrEqual(a, l), schema)
    case IsNull(a) =>
      attrName(a, schema).map(n => stat("nullCount", n) > lit(0L))
    case IsNotNull(a) =>
      attrName(a, schema).map(n =>
        stat("nullCount", n) < col("_parsed").getField("numRecords"))
    case In(a, list) if list.nonEmpty && list.forall(_.isInstanceOf[Literal]) =>
      attrName(a, schema).flatMap { n =>
        val opts = list.map(l => litOf(l.asInstanceOf[Literal]))
        if (opts.exists(_.isEmpty) || opts.size > 100) None
        else Some(opts.flatten.map(v =>
          stat("minValues", n) <= v && stat("maxValues", n) >= v).reduce(_ || _))
      }
    case StartsWith(a, l @ Literal(_, StringType)) =>
      attrName(a, schema).flatMap { n =>
        litOf(l).map { _ =>
          val prefix = l.value.toString
          val len = prefix.length
          substring(stat("minValues", n), 0, len) <= lit(prefix) &&
            substring(stat("maxValues", n), 0, len) >= lit(prefix)
        }
      }
    case _ => None
  }
}
