package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.util.zip.{CRC32, Deflater, Inflater}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

import org.apache.spark.sql.graftshim.SparkShims

/**
 * Pure-JVM PNG codec for the multimodal path: 8-bit RGB / RGBA,
 * non-interlaced, zlib via `java.util.zip` (no external media
 * libraries). The decoder implements all five scanline filters
 * (None/Sub/Up/Average/Paeth) and chunk CRC validation; the encoder can
 * emit any single filter type, so round-trip tests exercise every
 * unfilter path against real compressed bytes. Together with
 * [[BmpCodec]] (uncompressed) and [[WavCodec]] (audio) this makes the
 * decode / feature-extract / resize pipeline real for a compressed
 * format, not a stub.
 *
 * Expressions are CodegenFallback by design: per-row work is O(pixels)
 * inside inflate/deflate, so codegen for the shell buys nothing.
 */
object PngCodec {

  private val Signature =
    Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** Decoded image: `pixels` is unfiltered rows, `channels` (3 = RGB,
    * 4 = RGBA) interleaved bytes, top-left origin. */
  final case class Decoded(width: Int, height: Int, channels: Int,
      pixels: Array[Byte]) {
    /** Packed 0xRRGGBB at (x, y). */
    def rgb(x: Int, y: Int): Int = {
      val i = (y * width + x) * channels
      ((pixels(i) & 0xff) << 16) | ((pixels(i + 1) & 0xff) << 8) |
        (pixels(i + 2) & 0xff)
    }
    def alpha(x: Int, y: Int): Int =
      if (channels < 4) 255
      else pixels((y * width + x) * channels + 3) & 0xff
  }

  private def chunk(out: ByteArrayOutputStream, tpe: String,
      data: Array[Byte]): Unit = {
    val len = ByteBuffer.allocate(4).putInt(data.length).array()
    out.write(len)
    val tb = tpe.getBytes("US-ASCII")
    out.write(tb)
    out.write(data)
    val crc = new CRC32
    crc.update(tb); crc.update(data)
    out.write(ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
  }

  /** Encode a w x h image; `rgb(x, y)` returns packed 0xRRGGBB with
    * top-left origin. `filterType` applies to every scanline (0..4 —
    * all are spec-legal everywhere; 0 is the fast default, the others
    * exist so tests can drive each decoder unfilter path). */
  def encode(w: Int, h: Int, rgb: (Int, Int) => Int,
      filterType: Int = 0): Array[Byte] =
    encodeChannels(w, h, 3, (x, y) => rgb(x, y), filterType)

  /** RGBA variant: `argb(x, y)` returns packed 0xAARRGGBB. */
  def encodeArgb(w: Int, h: Int, argb: (Int, Int) => Int,
      filterType: Int = 0): Array[Byte] =
    encodeChannels(w, h, 4, argb, filterType)

  private def encodeChannels(w: Int, h: Int, bpp: Int,
      px: (Int, Int) => Int, filterType: Int): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dims ${w}x$h")
    require(filterType >= 0 && filterType <= 4, s"bad filter $filterType")
    val raw = new Array[Byte]((w * bpp + 1) * h)
    val prior = new Array[Byte](w * bpp) // previous UNFILTERED scanline
    val cur = new Array[Byte](w * bpp)
    var y = 0
    var o = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = px(x, y)
        cur(x * bpp) = ((p >> 16) & 0xff).toByte
        cur(x * bpp + 1) = ((p >> 8) & 0xff).toByte
        cur(x * bpp + 2) = (p & 0xff).toByte
        if (bpp == 4) cur(x * bpp + 3) = ((p >>> 24) & 0xff).toByte
        x += 1
      }
      raw(o) = filterType.toByte; o += 1
      var i = 0
      while (i < w * bpp) {
        val a = if (i >= bpp) cur(i - bpp) & 0xff else 0 // left
        val b = prior(i) & 0xff // up
        val c = if (i >= bpp) prior(i - bpp) & 0xff else 0 // up-left
        val v = cur(i) & 0xff
        raw(o) = (filterType match {
          case 0 => v
          case 1 => v - a
          case 2 => v - b
          case 3 => v - (a + b) / 2
          case 4 => v - paeth(a, b, c)
        }).toByte
        o += 1
        i += 1
      }
      System.arraycopy(cur, 0, prior, 0, w * bpp)
      y += 1
    }
    val out = new ByteArrayOutputStream()
    out.write(Signature)
    val colorType = if (bpp == 4) 6 else 2 // 8-bit RGBA / RGB
    val ihdr = ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    chunk(out, "IHDR", ihdr)
    val deflater = new Deflater(Deflater.BEST_SPEED)
    deflater.setInput(raw); deflater.finish()
    val comp = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) comp.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    chunk(out, "IDAT", comp.toByteArray)
    chunk(out, "IEND", Array.empty)
    out.toByteArray
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  def decode(bytes: Array[Byte]): Decoded = {
    require(bytes.length > 8 && Signature.indices.forall(i =>
      bytes(i) == Signature(i)), "not a PNG payload")
    val buf = ByteBuffer.wrap(bytes)
    buf.position(8)
    var w = 0; var h = 0; var channels = 0
    val idat = new ByteArrayOutputStream()
    var done = false
    while (!done && buf.remaining() >= 12) {
      val len = buf.getInt
      require(len >= 0 && len <= buf.remaining() - 8, "truncated PNG chunk")
      val tb = new Array[Byte](4); buf.get(tb)
      val tpe = new String(tb, "US-ASCII")
      val data = new Array[Byte](len); buf.get(data)
      val storedCrc = buf.getInt
      val crc = new CRC32
      crc.update(tb); crc.update(data)
      require(crc.getValue.toInt == storedCrc, s"PNG $tpe chunk CRC mismatch")
      tpe match {
        case "IHDR" =>
          val ib = ByteBuffer.wrap(data)
          w = ib.getInt; h = ib.getInt
          val depth = ib.get; val color = ib.get
          val interlace = data(12)
          require(depth == 8, s"only 8-bit PNG supported (got $depth)")
          require(color == 2 || color == 6,
            s"only RGB/RGBA PNG supported (colorType $color)")
          require(interlace == 0, "interlaced PNG not supported")
          channels = if (color == 2) 3 else 4
        case "IDAT" => idat.write(data)
        case "IEND" => done = true
        case _ => // ancillary chunks skipped
      }
    }
    require(w > 0 && h > 0 && channels > 0, "PNG missing IHDR")
    val inflater = new Inflater()
    inflater.setInput(idat.toByteArray)
    val stride = w * channels
    val raw = new Array[Byte]((stride + 1) * h)
    var off = 0
    while (!inflater.finished() && off < raw.length) {
      val n = inflater.inflate(raw, off, raw.length - off)
      require(n > 0 || inflater.finished(), "truncated PNG pixel data")
      off += n
    }
    inflater.end()
    require(off == raw.length, s"PNG pixel data short: $off of ${raw.length}")
    // unfilter scanlines in place into `pixels`
    val pixels = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val ft = raw(y * (stride + 1)) & 0xff
      val ro = y * (stride + 1) + 1
      val po = y * stride
      var i = 0
      while (i < stride) {
        val x = raw(ro + i) & 0xff
        val a = if (i >= channels) pixels(po + i - channels) & 0xff else 0
        val b = if (y > 0) pixels(po - stride + i) & 0xff else 0
        val c = if (y > 0 && i >= channels)
          pixels(po - stride + i - channels) & 0xff else 0
        pixels(po + i) = (ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case 4 => x + paeth(a, b, c)
          case other => throw new IllegalArgumentException(
            s"bad PNG filter type $other")
        }).toByte
        i += 1
      }
      y += 1
    }
    Decoded(w, h, channels, pixels)
  }

  /** Deterministic synthetic image — same (id, x, y) arithmetic as
    * [[BmpCodec.synth]], so an external SQL oracle can recompute any
    * pixel aggregate independently of the codec. */
  def synth(id: Long, w: Int, h: Int): Array[Byte] =
    encode(w, h, (x, y) => {
      val b = ((x * 7 + y * 13 + id * 31) % 256).toInt
      val g = ((x * 11 + y * 17 + id * 43) % 256).toInt
      val r = ((x * 19 + y * 23 + id * 59) % 256).toInt
      (r << 16) | (g << 8) | b
    }, filterType = (id % 5).toInt)

  /** Fit inside a `box` x `box` square preserving aspect ratio (integer
    * floor math, nearest-neighbor), re-encoded as PNG. The channel count
    * is preserved — RGBA input keeps its alpha plane. Images already
    * inside the box pass through byte-identical. */
  def resizeFit(bytes: Array[Byte], box: Int): Array[Byte] = {
    val d = decode(bytes)
    val m = math.max(d.width, d.height)
    if (m <= box) bytes
    else {
      val tw = math.max(1, d.width * box / m)
      val th = math.max(1, d.height * box / m)
      if (d.channels == 4)
        encodeArgb(tw, th, (x, y) => {
          val sx = x * d.width / tw; val sy = y * d.height / th
          (d.alpha(sx, sy) << 24) | d.rgb(sx, sy)
        })
      else encode(tw, th, (x, y) => d.rgb(x * d.width / tw, y * d.height / th))
    }
  }
}

/** synth(id, w, h): the deterministic test image as real PNG bytes. */
case class PngSynth(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(id: Any, w: Any, h: Any): Any =
    PngCodec.synth(id.asInstanceOf[Long], w.asInstanceOf[Int], h.asInstanceOf[Int])
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PngSynth = copy(f, s, t)
}

/** Decode + one pixel walk: (width, height, sum_r, sum_g, sum_b, n_px).
  * Integer sums keep the oracle compare exact. */
case class PngStats(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false),
    StructField("n_px", LongType, nullable = false)))
  override def nullSafeEval(payload: Any): Any = {
    val d = PngCodec.decode(payload.asInstanceOf[Array[Byte]])
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < d.height) {
      var x = 0
      while (x < d.width) {
        val p = d.rgb(x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        x += 1
      }
      y += 1
    }
    InternalRow(d.width, d.height, sr, sg, sb, d.width.toLong * d.height)
  }
  override protected def withNewChildInternal(c: Expression): PngStats = copy(c)
}

/** resizeFit(payload, box): real decode + nearest-neighbor + re-encode. */
case class PngResizeFit(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(payload: Any, box: Any): Any =
    PngCodec.resizeFit(payload.asInstanceOf[Array[Byte]], box.asInstanceOf[Int])
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PngResizeFit = copy(l, r)
}

object PngFunctions {
  def pngSynth(id: Column, w: Column, h: Column): Column =
    SparkShims.column(PngSynth(SparkShims.expression(id),
      SparkShims.expression(w), SparkShims.expression(h)))
  def pngStats(payload: Column): Column =
    SparkShims.column(PngStats(SparkShims.expression(payload)))
  def pngResizeFit(payload: Column, box: Column): Column =
    SparkShims.column(PngResizeFit(SparkShims.expression(payload),
      SparkShims.expression(box)))
}
