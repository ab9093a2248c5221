package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

import org.apache.spark.sql.graftshim.SparkShims

/**
 * A REAL image codec for the multimodal path: uncompressed 24-bpp BMP
 * (BITMAPINFOHEADER, bottom-up rows, 4-byte row padding) implemented in
 * pure JVM code — no external media libraries, which this environment
 * does not ship. Unlike the earlier hash-derived stand-ins, these
 * operators genuinely encode pixel buffers to bytes, parse the header
 * back, walk the pixel rows, and resample them, so the decode /
 * feature-extract / resize pipeline is exercised end-to-end on real
 * payload bytes. Codecs for compressed formats (JPEG/PNG/video) would
 * slot in behind the same expressions.
 *
 * Expressions are CodegenFallback by design: per-row work is O(pixels),
 * so the codec loop dominates and codegen for the expression shell would
 * buy nothing (same stance as the ZORDER curve keys).
 */
object BmpCodec {

  val HeaderSize = 54 // 14-byte file header + 40-byte BITMAPINFOHEADER

  /** Encode a w x h image; `bgr(x, y)` returns packed 0xBBGGRR ints with
    * (0,0) the TOP-left pixel (rows are written bottom-up per the spec). */
  def encode(w: Int, h: Int, bgr: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dims ${w}x$h")
    val rowSize = (w * 3 + 3) & ~3
    val dataSize = rowSize * h
    val buf = ByteBuffer.allocate(HeaderSize + dataSize)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
      .putInt(HeaderSize + dataSize).putInt(0).putInt(HeaderSize)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    var y = h - 1
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val p = bgr(x, y)
        buf.put((p & 0xff).toByte)
          .put(((p >> 8) & 0xff).toByte)
          .put(((p >> 16) & 0xff).toByte)
        x += 1
      }
      var pad = w * 3
      while (pad < rowSize) { buf.put(0.toByte); pad += 1 }
      y -= 1
    }
    buf.array()
  }

  /** Parsed view over encoded bytes; pixel reads go through the header's
    * data offset and the padded row stride. */
  final case class Decoded(bytes: Array[Byte], width: Int, height: Int,
      dataOffset: Int) {
    private val rowSize = (width * 3 + 3) & ~3
    /** Packed 0xBBGGRR at top-left-origin (x, y). */
    def bgr(x: Int, y: Int): Int = {
      val i = dataOffset + (height - 1 - y) * rowSize + x * 3
      (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8) |
        ((bytes(i + 2) & 0xff) << 16)
    }
  }

  def decode(bytes: Array[Byte]): Decoded = {
    require(bytes.length >= HeaderSize && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP payload")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val off = buf.getInt(10)
    val w = buf.getInt(18)
    val h = buf.getInt(22)
    require(buf.getShort(28) == 24, "only 24-bpp BMP supported")
    require(w > 0 && h > 0 && off + ((w * 3 + 3) & ~3).toLong * h <= bytes.length,
      "truncated BMP payload")
    Decoded(bytes, w, h, off)
  }

  /** Deterministic synthetic image: channel values are plain integer
    * arithmetic in (id, x, y) so an external SQL oracle can recompute
    * any pixel — and therefore any aggregate — independently. */
  def synth(id: Long, w: Int, h: Int): Array[Byte] =
    encode(w, h, (x, y) => {
      val b = ((x * 7 + y * 13 + id * 31) % 256).toInt
      val g = ((x * 11 + y * 17 + id * 43) % 256).toInt
      val r = ((x * 19 + y * 23 + id * 59) % 256).toInt
      b | (g << 8) | (r << 16)
    })

  /** Fit inside a `box` x `box` square preserving aspect ratio with pure
    * integer math (targetDim = dim * box / maxDim, floor division) and
    * nearest-neighbor sampling (src = dst * srcDim / dstDim). Images
    * already inside the box pass through byte-identical. */
  def resizeFit(bytes: Array[Byte], box: Int): Array[Byte] = {
    val d = decode(bytes)
    val m = math.max(d.width, d.height)
    if (m <= box) bytes
    else {
      val tw = math.max(1, d.width * box / m)
      val th = math.max(1, d.height * box / m)
      encode(tw, th, (x, y) => d.bgr(x * d.width / tw, y * d.height / th))
    }
  }
}

/** synth(id, w, h): encode the deterministic test image as real BMP bytes. */
case class BmpSynth(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(id: Any, w: Any, h: Any): Any =
    BmpCodec.synth(id.asInstanceOf[Long], w.asInstanceOf[Int], h.asInstanceOf[Int])
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): BmpSynth = copy(f, s, t)
}

/** Decode + one pixel walk: (width, height, sum_b, sum_g, sum_r, n_px).
  * Integer sums keep the oracle compare exact (no float summation order). */
case class BmpStats(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("sum_b", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("n_px", LongType, nullable = false)))
  override def nullSafeEval(payload: Any): Any = {
    val d = BmpCodec.decode(payload.asInstanceOf[Array[Byte]])
    var sb = 0L; var sg = 0L; var sr = 0L
    var y = 0
    while (y < d.height) {
      var x = 0
      while (x < d.width) {
        val p = d.bgr(x, y)
        sb += p & 0xff; sg += (p >> 8) & 0xff; sr += (p >> 16) & 0xff
        x += 1
      }
      y += 1
    }
    InternalRow(d.width, d.height, sb, sg, sr, d.width.toLong * d.height)
  }
  override protected def withNewChildInternal(c: Expression): BmpStats = copy(c)
}

/** resizeFit(payload, box): real nearest-neighbor downscale, re-encoded. */
case class BmpResizeFit(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(payload: Any, box: Any): Any =
    BmpCodec.resizeFit(payload.asInstanceOf[Array[Byte]], box.asInstanceOf[Int])
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): BmpResizeFit = copy(l, r)
}

object BmpFunctions {
  def bmpSynth(id: Column, w: Column, h: Column): Column =
    SparkShims.column(BmpSynth(SparkShims.expression(id),
      SparkShims.expression(w), SparkShims.expression(h)))
  def bmpStats(payload: Column): Column =
    SparkShims.column(BmpStats(SparkShims.expression(payload)))
  def bmpResizeFit(payload: Column, box: Column): Column =
    SparkShims.column(BmpResizeFit(SparkShims.expression(payload),
      SparkShims.expression(box)))
}
