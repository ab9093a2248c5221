package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing for training-data pipelines: media payloads
 * are opaque `binary` columns plus a typed metadata struct; decode /
 * feature-extraction runs per-partition so a real codec binds once per
 * task, not once per row.
 *
 * A REAL image codec lives in [[BmpCodec]] (pure-JVM 24-bpp BMP encode /
 * decode / resize, pixel-exact under an external oracle). The compressed
 * formats (JPEG/PNG/audio/video) need native libraries this environment
 * does not ship — `fakeDecode*` below are clearly-marked deterministic
 * stand-ins with the same shapes (bytes -> fixed-length float features,
 * video -> frame samples), so the Spark-side schema, partitioning and
 * batch shape are real and tested while those codecs stay swappable.
 */
object Multimodal {

  /** Canonical media column bundle. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),          // image | audio | video
    StructField("payload", BinaryType),       // opaque encoded bytes
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType),
      StructField("codec", StringType))))))

  /**
   * STUB DECODE — deterministic fake featureizer standing in for a real
   * image/audio decoder. Maps payload bytes to `dims` floats in [-1, 1)
   * by seeded hashing, so downstream similarity/dedup plumbing is fully
   * exercisable. Swap body for (e.g.) a JNI codec in production.
   */
  def fakeDecodeFeatures(payload: Column, dims: Int): Column =
    transform(sequence(lit(0), lit(dims - 1)),
      i => (pmod(xxhash64(payload, i), lit(1000000L)).cast("double")
        / 500000.0 - 1.0).cast("float"))

  /** STUB frame sampling: every `everyMs` in [0, duration) — real impl
    * would demux the container; shapes (one row per frame) are real. */
  def sampleFrames(df: DataFrame, everyMs: Long): DataFrame = {
    df.where(col("kind") === "video")
      .select(col("media_id"), col("meta"),
        posexplode(sequence(lit(0L),
          greatest(col("meta.duration_ms") - 1, lit(0L)), lit(everyMs))))
      .withColumnsRenamed(Map("pos" -> "frame_index", "col" -> "frame_ts_ms"))
      // STUB: frame payload = hash-derived bytes; a codec would decode here
      .withColumn("frame_features",
        fakeDecodeFeatures(concat(col("media_id").cast("string").cast("binary"),
          col("frame_ts_ms").cast("string").cast("binary")), 16))
  }

  /**
   * Resize images/frames to fit (maxW, maxH) preserving aspect ratio:
   * the metadata math (scale factor, rounded target dims) is real; the
   * payload re-encode is the STUB codec (hash-derived bytes, swap for a
   * real scaler in production). Non-image rows pass through untouched.
   */
  def resize(df: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val isImage = col("kind") === "image" &&
      col("meta.width").isNotNull && col("meta.height").isNotNull
    val scale = least(
      lit(maxW).cast("double") / col("meta.width"),
      lit(maxH).cast("double") / col("meta.height"),
      lit(1.0))
    df.withColumn("meta",
        when(isImage, struct(
          greatest(round(col("meta.width") * scale), lit(1)).cast("int").as("width"),
          greatest(round(col("meta.height") * scale), lit(1)).cast("int").as("height"),
          col("meta.duration_ms").as("duration_ms"),
          col("meta.codec").as("codec")))
          .otherwise(col("meta")))
      // STUB re-encode: deterministic bytes derived from source + target
      .withColumn("payload",
        when(isImage && scale < 1.0,
          sha2(concat(col("payload"),
            col("meta.width").cast("string").cast("binary"),
            col("meta.height").cast("string").cast("binary")), 256)
            .cast("binary"))
          .otherwise(col("payload")))
  }

  /**
   * Per-partition decode harness: the task-level iterator lets a real
   * decoder initialize once per partition (the mapInPandas batch shape in
   * the PySpark world). The decode function itself stays swappable.
   */
  def decodePartitioned(
      df: DataFrame,
      dims: Int,
      partitions: Int = 0): DataFrame = {
    val repartitioned =
      if (partitions > 0) df.repartition(partitions, col("media_id")) else df
    repartitioned.withColumn("features",
      fakeDecodeFeatures(col("payload"), dims))
  }

  /** Deterministic media bundle per id row. Metadata derives from the id
    * by PLAIN integer arithmetic (not hashing) so an external SQL oracle
    * can reproduce width/height/duration independently and cross-check
    * the resize / frame-cadence math end-to-end. */
  def mediaFromIds(ids: DataFrame): DataFrame = {
    ids.select(
      col("id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("id"), lit(3)) + 1).cast("int")).as("kind"),
      sha2(col("id").cast("string"), 256).cast("binary").as("payload"),
      struct(
        (pmod(col("id") * 37, lit(1024)) + 16).cast("int").as("width"),
        (pmod(col("id") * 59, lit(768)) + 16).cast("int").as("height"),
        (pmod(col("id") * 97, lit(60000)) + 1000).as("duration_ms"),
        lit("fake").as("codec")).as("meta"))
  }

  /** Synthesize a deterministic media table (for tests/benchmarks). */
  def syntheticMedia(spark: org.apache.spark.sql.SparkSession, n: Long): DataFrame =
    mediaFromIds(spark.range(n).toDF("id"))
}
