package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.log.{AddFile, Metadata}

/**
 * Generated and identity columns, carried as StructField metadata:
 *  - `graft.generationExpression` = SQL text; computed when the writer
 *    omits the column, verified by equality when provided
 *  - `graft.identity.start` / `graft.identity.step`: values assigned from
 *    a per-commit high watermark stored in table config — collision-free
 *    without coordination because only the committing transaction
 *    advances the watermark.
 * (Reference concepts: GeneratedColumn.scala:92-222, IdentityColumn.scala
 * — re-designed; watermark advance derives from file stats, costing no
 * extra pass over the data.)
 */
object ColumnDefaults {

  val GEN_KEY = "graft.generationExpression"
  val ID_START = "graft.identity.start"
  val ID_STEP = "graft.identity.step"
  /** Spark's standard default-value metadata key, so `DESCRIBE` and the
    * DSv2 column API surface the default without translation. */
  val DEFAULT_KEY = "CURRENT_DEFAULT"

  def generatedField(name: String, dt: DataType, sql: String): StructField =
    StructField(name, dt, nullable = true,
      new MetadataBuilder().putString(GEN_KEY, sql).build())

  def identityField(name: String, start: Long = 1, step: Long = 1): StructField =
    StructField(name, LongType, nullable = true,
      new MetadataBuilder().putLong(ID_START, start).putLong(ID_STEP, step).build())

  def generationExpr(f: StructField): Option[String] =
    if (f.metadata.contains(GEN_KEY)) Some(f.metadata.getString(GEN_KEY)) else None

  def isIdentity(f: StructField): Boolean = f.metadata.contains(ID_START)

  def defaultExpr(f: StructField): Option[String] =
    if (f.metadata.contains(DEFAULT_KEY)) Some(f.metadata.getString(DEFAULT_KEY))
    else None

  def defaultField(name: String, dt: DataType, sql: String): StructField =
    StructField(name, dt, nullable = true,
      new MetadataBuilder().putString(DEFAULT_KEY, sql).build())

  private def watermarkKey(col: String) = s"graft.identity.$col.highWatermark"

  /**
   * Fill generated + identity columns the writer did not provide.
   * Returns the augmented frame and (for generated columns that WERE
   * provided) equality-check constraints to enforce.
   */
  def applyDefaults(
      df: DataFrame,
      m: Metadata): (DataFrame, Seq[(String, Column)]) = {
    var out = df
    val resolver: (String, String) => Boolean = _.equalsIgnoreCase(_)
    val provided = df.columns.toSeq
    var checks = Seq.empty[(String, Column)]
    m.schema.fields.foreach { f =>
      generationExpr(f) match {
        case Some(sql) if !provided.exists(resolver(_, f.name)) =>
          out = out.withColumn(f.name, expr(sql).cast(f.dataType))
        case Some(sql) if provided.exists(resolver(_, f.name)) =>
          checks :+= (s"generated column ${f.name}",
            col(f.name) <=> expr(sql).cast(f.dataType))
        case None =>
      }
      // DEFAULT fills only when the writer omits the column (a provided
      // value — even null — wins; unlike generated columns there is no
      // equality constraint on provided values).
      defaultExpr(f) match {
        case Some(sql) if !provided.exists(resolver(_, f.name)) =>
          out = out.withColumn(f.name, expr(sql).cast(f.dataType))
        case _ =>
      }
      if (isIdentity(f) && !provided.exists(resolver(_, f.name))) {
        val start = f.metadata.getLong(ID_START)
        val step = f.metadata.getLong(ID_STEP)
        val hwm = m.configuration.get(watermarkKey(f.name)).map(_.toLong)
          .getOrElse(start - step)
        // Non-contiguous but strictly advancing: partition-sparse ids on
        // top of the committed watermark.
        out = out.withColumn(f.name,
          lit(hwm) + (monotonically_increasing_id() + 1) * step)
      }
    }
    (out, checks)
  }

  /** Advance identity watermarks from the max stats of the written files
    * (no extra data pass). Returns updated metadata if anything moved. */
  def advanceWatermarks(m: Metadata, adds: Seq[AddFile]): Option[Metadata] = {
    val idCols = m.schema.fields.filter(isIdentity).map(_.name)
    if (idCols.isEmpty || adds.isEmpty) return None
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    var conf = m.configuration
    var changed = false
    idCols.foreach { c =>
      val maxes = adds.flatMap { a =>
        Option(a.stats).flatMap { s =>
          val node = mapper.readTree(s).path("maxValues").path(c)
          if (node.isNumber) Some(node.asLong) else None
        }
      }
      if (maxes.nonEmpty) {
        val newHwm = maxes.max
        val old = conf.get(watermarkKey(c)).map(_.toLong).getOrElse(Long.MinValue)
        if (newHwm > old) {
          conf += watermarkKey(c) -> newHwm.toString
          changed = true
        }
      }
    }
    if (changed) Some(m.copy(configuration = conf)) else None
  }
}
