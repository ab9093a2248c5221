package graft

import java.nio.file.{Files => JFiles}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.dv.{Bitmap64, DeltaDvCodec}

/** Delta DV interchange formats against the PUBLIC protocol spec,
  * including the spec's own golden inline example. */
class DeltaDvSuite extends AnyFunSuite {

  test("spec golden example: inline Z85 DV decodes to the documented rows") {
    // PROTOCOL.md "JSON Example 3 — Inline": rows 3, 4, 7, 11, 18, 29
    val inline = "wi5b=000010000siXQKl0rr91000f55c8Xg0@@D72lkbi5=-{L"
    val bm = Bitmap64.fromDeltaPortable(DeltaDvCodec.z85Decode(inline, 40))
    val expect = Seq(3L, 4L, 7L, 11L, 18L, 29L)
    expect.foreach(i => assert(bm.contains(i), s"missing row $i"))
    assert(bm.cardinality === 6)
    (0L until 40L).filterNot(expect.contains)
      .foreach(i => assert(!bm.contains(i), s"extra row $i"))
  }

  test("z85 encode/decode round-trips arbitrary byte lengths") {
    val rnd = new scala.util.Random(42)
    (1 to 40).foreach { n =>
      val bytes = Array.fill(n)(rnd.nextInt().toByte)
      val enc = DeltaDvCodec.z85Encode(bytes)
      assert(enc.length % 5 === 0)
      assert(DeltaDvCodec.z85Decode(enc, n).toSeq === bytes.toSeq)
    }
  }

  test("portable 64-bit round trip incl. indexes past 2^32") {
    val bm = new Bitmap64()
    val idx = Seq(0L, 5L, 100000L, (1L << 32) + 7L, (1L << 33) + 123L)
    idx.foreach(bm.add)
    val back = Bitmap64.fromDeltaPortable(Bitmap64.toDeltaPortable(bm))
    idx.foreach(i => assert(back.contains(i), s"missing $i"))
    assert(back.cardinality === idx.size)
    assert(!back.contains(6L) && !back.contains((1L << 32) + 8L))
  }

  test("DV file write + 'u' descriptor resolution round trip") {
    val root = new Path(JFiles.createTempDirectory("graft-dvfile").toString)
    val conf = new Configuration()
    val bm = new Bitmap64()
    Seq(1L, 2L, 9L, 1000L).foreach(bm.add)
    val (pathOrInline, offset, size) = DeltaDvCodec.writeFile(root, conf, bm)
    val back = DeltaDvCodec.readDescriptor(
      root, conf, "u", pathOrInline, offset, size)
    assert(back.cardinality === 4)
    Seq(1L, 2L, 9L, 1000L).foreach(i => assert(back.contains(i)))
    // corrupted checksum fails loudly
    val file = new java.io.File(root.toString).listFiles()
      .filter(_.getName.startsWith("deletion_vector_")).head
    val bytes = JFiles.readAllBytes(file.toPath)
    bytes(bytes.length - 1) = (bytes(bytes.length - 1) ^ 0x7f).toByte
    JFiles.write(file.toPath, bytes)
    // either our CRC or the local filesystem's checksum layer trips
    intercept[Exception] {
      DeltaDvCodec.readDescriptor(root, conf, "u", pathOrInline, offset, size)
    }
  }
}
