package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{BmpCodec, PngCodec, PngFunctions}

class PngSuite extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("roundtrip is pixel-exact under every scanline filter type") {
    (0 to 4).foreach { ft =>
      val bytes = PngCodec.encode(13, 9, (x, y) =>
        (((x * 19 + y * 23) % 256) << 16) | (((x * 11 + y * 7) % 256) << 8) |
          ((x * 3 + y * 31) % 256), filterType = ft)
      val d = PngCodec.decode(bytes)
      assert(d.width === 13 && d.height === 9 && d.channels === 3)
      for (y <- 0 until 9; x <- 0 until 13) {
        val expect = (((x * 19 + y * 23) % 256) << 16) |
          (((x * 11 + y * 7) % 256) << 8) | ((x * 3 + y * 31) % 256)
        assert(d.rgb(x, y) === expect, s"filter $ft pixel ($x,$y)")
      }
    }
  }

  test("synth matches the BMP synth pixel arithmetic") {
    // same (id, x, y) channel formulas; PNG packs RGB, BMP packs BGR
    val id = 7L
    val png = PngCodec.decode(PngCodec.synth(id, 16, 11))
    val bmp = BmpCodec.decode(BmpCodec.synth(id, 16, 11))
    for (y <- 0 until 11; x <- 0 until 16) {
      val p = png.rgb(x, y); val b = bmp.bgr(x, y)
      assert(((p >> 16) & 0xff) === ((b >> 16) & 0xff)) // r
      assert(((p >> 8) & 0xff) === ((b >> 8) & 0xff)) // g
      assert((p & 0xff) === (b & 0xff)) // b
    }
  }

  test("decode rejects corrupted chunks and truncated data") {
    val good = PngCodec.synth(1L, 8, 8)
    intercept[IllegalArgumentException] {
      PngCodec.decode(good.take(20)) // inside IHDR
    }
    val flipped = good.clone()
    flipped(40) = (flipped(40) ^ 0x5a).toByte // corrupt IDAT body -> CRC
    intercept[IllegalArgumentException] { PngCodec.decode(flipped) }
    intercept[IllegalArgumentException] {
      PngCodec.decode("not a png at all".getBytes)
    }
  }

  test("RGBA decode applies filters across 4 channels") {
    // hand-built 2x2 RGBA PNG, filter 1 (Sub) on both rows
    import java.io.ByteArrayOutputStream
    import java.nio.ByteBuffer
    import java.util.zip.{CRC32, Deflater}
    def chunk(out: ByteArrayOutputStream, tpe: String, data: Array[Byte]): Unit = {
      out.write(ByteBuffer.allocate(4).putInt(data.length).array())
      val tb = tpe.getBytes("US-ASCII"); out.write(tb); out.write(data)
      val crc = new CRC32; crc.update(tb); crc.update(data)
      out.write(ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    }
    val px = Array( // rows of (r,g,b,a)
      Array(10, 20, 30, 255, 50, 60, 70, 128),
      Array(1, 2, 3, 4, 5, 6, 7, 8))
    val raw = new ByteArrayOutputStream()
    px.foreach { row =>
      raw.write(1) // Sub
      row.indices.foreach { i =>
        val left = if (i >= 4) row(i - 4) else 0
        raw.write((row(i) - left) & 0xff)
      }
    }
    val out = new ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    chunk(out, "IHDR", ByteBuffer.allocate(13).putInt(2).putInt(2)
      .put(8.toByte).put(6.toByte).put(0.toByte).put(0.toByte)
      .put(0.toByte).array())
    val d = new Deflater(); d.setInput(raw.toByteArray); d.finish()
    val comp = new ByteArrayOutputStream(); val buf = new Array[Byte](1024)
    while (!d.finished()) comp.write(buf, 0, d.deflate(buf))
    chunk(out, "IDAT", comp.toByteArray)
    chunk(out, "IEND", Array.empty)
    val dec = PngCodec.decode(out.toByteArray)
    assert(dec.channels === 4)
    assert(dec.rgb(0, 0) === ((10 << 16) | (20 << 8) | 30))
    assert(dec.alpha(1, 0) === 128)
    assert(dec.rgb(1, 1) === ((5 << 16) | (6 << 8) | 7))
    assert(dec.alpha(1, 1) === 8)
  }

  test("resizeFit preserves the alpha plane of RGBA input") {
    val big = PngCodec.encodeArgb(24, 12, (x, y) =>
      (((x * 11 + y * 3) % 256) << 24) | (((x * 19) % 256) << 16) |
        (((y * 23) % 256) << 8) | ((x + y) % 256))
    val small = PngCodec.decode(PngCodec.resizeFit(big, 6))
    assert(small.channels === 4)
    assert(small.width === 6 && small.height === 3)
    val src = PngCodec.decode(big)
    for (y <- 0 until 3; x <- 0 until 6) {
      assert(small.rgb(x, y) === src.rgb(x * 4, y * 4))
      assert(small.alpha(x, y) === src.alpha(x * 4, y * 4), s"alpha ($x,$y)")
    }
  }

  test("resizeFit downsamples with exact nearest-neighbor sampling") {
    val big = PngCodec.synth(3L, 40, 20)
    val small = PngCodec.decode(PngCodec.resizeFit(big, 10))
    assert(small.width === 10 && small.height === 5)
    val src = PngCodec.decode(big)
    for (y <- 0 until 5; x <- 0 until 10)
      assert(small.rgb(x, y) === src.rgb(x * 4, y * 4))
    // already inside the box: byte-identical passthrough
    val tiny = PngCodec.synth(4L, 6, 6)
    assert(PngCodec.resizeFit(tiny, 10).toSeq === tiny.toSeq)
  }

  test("expressions run distributed over a binary column") {
    val df = spark.range(50).toDF("id")
      .withColumn("img", PngFunctions.pngSynth(col("id"),
        (col("id") % 5 + 4).cast("int"), (col("id") % 3 + 2).cast("int")))
      .withColumn("small", PngFunctions.pngResizeFit(col("img"), lit(4)))
      .withColumn("s", PngFunctions.pngStats(col("small")))
    val rows = df.select($"id", $"s.width", $"s.height", $"s.n_px")
      .as[(Long, Int, Int, Long)].collect()
    assert(rows.length === 50)
    rows.foreach { case (_, w, h, n) =>
      assert(w <= 4 && h <= 4 && n === w.toLong * h)
    }
    // stats of the full-size image recompute from the synth formula
    val full = df.select($"id", PngFunctions.pngStats($"img").as("fs"))
      .select($"id", $"fs.sum_r", $"fs.width", $"fs.height")
      .as[(Long, Long, Int, Int)].collect()
    full.foreach { case (id, sumR, w, h) =>
      var expect = 0L
      for (y <- 0 until h; x <- 0 until w)
        expect += (x * 19 + y * 23 + id * 59) % 256
      assert(sumR === expect, s"id=$id")
    }
  }
}
