package graft.dv

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, UnsafeProjection}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.graftshim.SparkShims
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/**
 * A `ParquetFileFormat` that applies deletion vectors INSIDE the per-file
 * reader: each task looks up its file in a broadcast `Map[path -> dv
 * sidecar]`, loads the 64-bit bitmap (executor-cached), and drops rows
 * whose file row index is set — so DV application is a narrow per-split
 * filter with zero joins and zero shuffles at ANY deleted-row
 * cardinality. Row indexes come from Spark's own parquet row-index
 * generator (the `_tmp_metadata_row_index` temporary column), which stays
 * correct under row-group skipping, predicate pushdown and file splits.
 * (Reference concept: DeltaParquetFileFormat.scala:161-266 +
 * deletionvectors/RowIndexMarkingFilters.scala — re-designed: instead of
 * custom record-reader wrappers we lean on Spark's native row-index
 * column and filter the reader's iterator.)
 *
 * `supportBatch` is false — the scan exec consumes rows (the inner
 * parquet reader still decodes vectorized) — only for scans whose file
 * set actually carries DVs; DV-free tables keep plain ParquetFileFormat
 * with full columnar output.
 */
class GraftParquetFileFormat(
    val tableRoot: String,
    val dvPaths: Map[String, String]) extends ParquetFileFormat {

  override def supportBatch(sparkSession: SparkSession, schema: StructType): Boolean =
    false

  override def buildReaderWithPartitionValues(
      sparkSession: SparkSession,
      dataSchema: StructType,
      partitionSchema: StructType,
      requiredSchema: StructType,
      filters: Seq[Filter],
      options: Map[String, String],
      hadoopConf: Configuration): PartitionedFile => Iterator[InternalRow] = {
    val tmpName = SparkShims.rowIndexTempColumn
    val existing = requiredSchema.fieldNames.indexOf(tmpName)
    val appended = existing < 0
    // Must be nullable: the readers recognize the temp column by name and
    // fill it with row indexes, but a non-nullable missing column fails
    // the reader's schema check first.
    val schemaWithIdx =
      if (appended)
        StructType(requiredSchema.fields :+
          org.apache.spark.sql.types.StructField(
            tmpName, org.apache.spark.sql.types.LongType, nullable = true))
      else requiredSchema
    val idxOrdinal = if (appended) requiredSchema.length else existing
    val parent = super.buildReaderWithPartitionValues(
      sparkSession, dataSchema, partitionSchema, schemaWithIdx,
      filters, options, hadoopConf)

    val dvBc = sparkSession.sparkContext.broadcast(dvPaths)
    val confBc = sparkSession.sparkContext.broadcast(
      new SerializableConfiguration(hadoopConf))
    val root = tableRoot
    // Reader output layout: required fields, [row index], partition cols.
    val fullSchema = StructType(schemaWithIdx.fields ++ partitionSchema.fields)

    (file: PartitionedFile) => {
      val rows = parent(file)
      val filtered = dvBc.value.get(file.toPath.toUri.getPath) match {
        case Some(rel) =>
          val bm = DeletionVectors.cachedBitmap(root, rel, confBc.value.value)
          rows.filter(r => !bm.contains(r.getLong(idxOrdinal)))
        case None => rows
      }
      if (!appended) filtered
      else {
        // Strip the row-index column we injected (the scan exec never
        // asked for it). Fresh attributes per split; proj reuses its
        // output buffer, matching normal scan semantics.
        val attrs = fullSchema.fields.toIndexedSeq.map(f =>
          AttributeReference(f.name, f.dataType, f.nullable)())
        val out = attrs.zipWithIndex.collect {
          case (a, i) if i != idxOrdinal => a
        }
        val proj = UnsafeProjection.create(out, attrs)
        filtered.map(proj)
      }
    }
  }

  override def equals(other: Any): Boolean = other match {
    case g: GraftParquetFileFormat =>
      g.tableRoot == tableRoot && g.dvPaths == dvPaths
    case _ => false
  }

  override def hashCode(): Int = (tableRoot, dvPaths).hashCode()

  override def toString: String = "GraftParquet+DV"
}
