package graft.catalog

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.catalog.CatalogTable
import org.apache.spark.sql.connector.catalog.{Table, TableCapability}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.types.StructType

import graft.log.GraftLog

/**
 * DSv2 face of a named graft table. Registering tables as plain v1
 * entries kept `df.writeTo(t)` / DSv2 time travel out of reach — Spark
 * refuses v2 writes into V1Table before any injected rule runs. This
 * table is what `loadTable` returns instead; the session extension then
 * converts reads back to the log-backed v1 relation during resolution and
 * routes v2 write plans (AppendData / OverwriteByExpression /
 * OverwritePartitionsDynamic) into the transactional write path.
 * Streaming reads fall back to the DSv1 source via
 * [[V2TableWithV1Fallback]]. (Reference concept: catalog/DeltaTableV2 +
 * DeltaAnalysis fallback — re-designed: conversion lives in one parser /
 * resolution rewrite, the table itself stays a thin descriptor.)
 *
 * @param timeTravelVersion pinned version when loaded via
 *   `loadTable(ident, version/timestamp)` (SQL VERSION AS OF).
 */
class GraftTableV2(
    spark: SparkSession,
    val path: String,
    val v1CatalogTable: CatalogTable,
    val timeTravelVersion: Option[Long] = None) extends Table
    with org.apache.spark.sql.connector.catalog.TruncatableTable
    with org.apache.spark.sql.graftshim.GraftV1FallbackTable {

  /** SQL TRUNCATE TABLE: a transactional whole-table delete (remove
    * actions; files stay for time travel until VACUUM). */
  override def truncateTable(): Boolean = {
    graft.GraftTable.forPath(spark, path).truncate()
    graft.sql.GraftCatalogCache.invalidate(spark)
    true
  }

  lazy val log: GraftLog = GraftLog.forTable(spark, path)
  private lazy val snapshot =
    timeTravelVersion.map(log.getSnapshotAt).getOrElse(log.update())

  override def name(): String = v1CatalogTable.identifier.unquotedString

  override def schema(): StructType = snapshot.metadata.schema

  override def partitioning(): Array[Transform] =
    snapshot.metadata.partitionColumns.map(Expressions.identity).toArray

  override def properties(): util.Map[String, String] =
    (snapshot.metadata.configuration ++ Map(
      "provider" -> "graft",
      "location" -> path)).asJava

  override def capabilities(): util.Set[TableCapability] = Set(
    TableCapability.BATCH_READ,
    TableCapability.V1_BATCH_WRITE,
    TableCapability.TRUNCATE,
    TableCapability.OVERWRITE_BY_FILTER,
    TableCapability.OVERWRITE_DYNAMIC).asJava

  /** Streaming reads resolve through the registered v1 entry (DSv1
    * GraftSource). */
  override def v1Table: CatalogTable = v1CatalogTable

  override def toString: String = s"GraftTableV2($name)"
}
