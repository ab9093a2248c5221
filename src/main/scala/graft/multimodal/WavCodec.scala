package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

import org.apache.spark.sql.graftshim.SparkShims

/**
 * A REAL audio codec for the multimodal path: 16-bit PCM mono WAV
 * (RIFF header, "fmt " + "data" chunks, little-endian samples) in pure
 * JVM code — the audio companion to [[BmpCodec]]. The expressions
 * genuinely frame bytes, parse the chunks back, walk the sample array
 * and resample it, so audio decode / feature-extract / resample runs on
 * real payload bytes end to end. Compressed formats (MP3/FLAC/Opus)
 * would slot in behind the same expressions.
 *
 * CodegenFallback for the same reason as the BMP codec: the O(samples)
 * loop dominates, codegen of the shell buys nothing.
 */
object WavCodec {

  val HeaderSize = 44 // RIFF(12) + fmt(24) + data header(8)

  /** Encode `n` mono samples at `rate` Hz; `sample(i)` in [-32768, 32767]. */
  def encode(n: Int, rate: Int, sample: Int => Int): Array[Byte] = {
    require(n > 0 && rate > 0, s"bad wav dims n=$n rate=$rate")
    val dataSize = n * 2
    val buf = ByteBuffer.allocate(HeaderSize + dataSize)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36 + dataSize).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(16)
      .putShort(1)            // PCM
      .putShort(1)            // mono
      .putInt(rate)
      .putInt(rate * 2)       // byte rate
      .putShort(2)            // block align
      .putShort(16)           // bits per sample
    buf.put("data".getBytes).putInt(dataSize)
    var i = 0
    while (i < n) { buf.putShort(sample(i).toShort); i += 1 }
    buf.array()
  }

  final case class Decoded(bytes: Array[Byte], rate: Int, n: Int,
      dataOffset: Int) {
    def sample(i: Int): Int =
      ByteBuffer.wrap(bytes, dataOffset + i * 2, 2)
        .order(ByteOrder.LITTLE_ENDIAN).getShort().toInt
  }

  def decode(bytes: Array[Byte]): Decoded = {
    require(bytes.length >= HeaderSize &&
      new String(bytes, 0, 4) == "RIFF" && new String(bytes, 8, 4) == "WAVE",
      "not a WAV payload")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    // walk chunks: fmt then data (tolerates extra chunks between them)
    var off = 12
    var rate = -1
    var dataOff = -1
    var dataLen = -1
    while (off + 8 <= bytes.length && (rate < 0 || dataOff < 0)) {
      val tag = new String(bytes, off, 4)
      val len = buf.getInt(off + 4)
      if (tag == "fmt ") {
        require(buf.getShort(off + 8) == 1, "only PCM supported")
        require(buf.getShort(off + 10) == 1, "only mono supported")
        require(buf.getShort(off + 22) == 16, "only 16-bit supported")
        rate = buf.getInt(off + 12)
      } else if (tag == "data") {
        dataOff = off + 8
        dataLen = len
      }
      off += 8 + len + (len & 1)
    }
    require(rate > 0 && dataOff > 0 && dataOff + dataLen <= bytes.length,
      "truncated WAV payload")
    Decoded(bytes, rate, dataLen / 2, dataOff)
  }

  /** Deterministic synthetic clip: samples are plain integer arithmetic
    * in (id, i) so an external SQL oracle can recompute any sample — and
    * therefore any aggregate — independently. */
  def synth(id: Long, n: Int, rate: Int): Array[Byte] =
    encode(n, rate, i => (((id * 31 + i.toLong * 17) % 65536L) - 32768L).toInt)

  /** Nearest-neighbor resample to `newRate` (src = i * srcN / dstN —
    * the same integer mapping as the BMP resize), re-encoded. */
  def resample(bytes: Array[Byte], newRate: Int): Array[Byte] = {
    val d = decode(bytes)
    if (newRate == d.rate) bytes
    else {
      val dstN = math.max(1, (d.n.toLong * newRate / d.rate).toInt)
      encode(dstN, newRate, i => d.sample((i.toLong * d.n / dstN).toInt))
    }
  }
}

/** wavSynth(id, n, rate): encode the deterministic clip as real WAV bytes. */
case class WavSynth(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(id: Any, n: Any, rate: Any): Any =
    WavCodec.synth(id.asInstanceOf[Long], n.asInstanceOf[Int],
      rate.asInstanceOf[Int])
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): WavSynth = copy(f, s, t)
}

/** Decode + one sample walk: (sample_rate, n_samples, sum_s, sum_abs,
  * min_s, max_s). Integer sums keep the oracle compare exact. */
case class WavStats(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_samples", IntegerType, nullable = false),
    StructField("sum_s", LongType, nullable = false),
    StructField("sum_abs", LongType, nullable = false),
    StructField("min_s", IntegerType, nullable = false),
    StructField("max_s", IntegerType, nullable = false)))
  override def nullSafeEval(payload: Any): Any = {
    val d = WavCodec.decode(payload.asInstanceOf[Array[Byte]])
    var sum = 0L; var sumAbs = 0L
    var mn = Int.MaxValue; var mx = Int.MinValue
    var i = 0
    while (i < d.n) {
      val s = d.sample(i)
      sum += s; sumAbs += math.abs(s)
      if (s < mn) mn = s
      if (s > mx) mx = s
      i += 1
    }
    InternalRow(d.rate, d.n, sum, sumAbs, mn, mx)
  }
  override protected def withNewChildInternal(c: Expression): WavStats = copy(c)
}

/** wavResample(payload, newRate): real nearest-neighbor resample. */
case class WavResample(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(payload: Any, newRate: Any): Any =
    WavCodec.resample(payload.asInstanceOf[Array[Byte]],
      newRate.asInstanceOf[Int])
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): WavResample = copy(l, r)
}

object WavFunctions {
  def wavSynth(id: Column, n: Column, rate: Column): Column =
    SparkShims.column(WavSynth(SparkShims.expression(id),
      SparkShims.expression(n), SparkShims.expression(rate)))
  def wavStats(payload: Column): Column =
    SparkShims.column(WavStats(SparkShims.expression(payload)))
  def wavResample(payload: Column, rate: Column): Column =
    SparkShims.column(WavResample(SparkShims.expression(payload),
      SparkShims.expression(rate)))
}
