package graft.dv

import java.nio.ByteBuffer
import java.util.UUID
import java.util.zip.CRC32

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/**
 * Delta deletion-vector interchange (public spec: PROTOCOL.md "Deletion
 * Vector Descriptor Schema" + "Deletion Vector Format"): Z85 text
 * encoding, the on-disk DV file framing (version byte, per-DV big-endian
 * size + bitmap + CRC-32), and descriptor resolution for all three
 * storage types (`u` relative-by-uuid, `p` absolute, `i` inline). Used
 * by CONVERT FROM DELTA to import DV-bearing tables and by the Delta
 * mirror to export graft DVs in the format Delta readers expect.
 */
object DeltaDvCodec {

  // ---- Z85 (ZeroMQ RFC 32) ----------------------------------------------

  private val Z85 =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      ".-:+=^!/*?&<>()[]{}@%$#"
  private val Z85_INV: Array[Int] = {
    val inv = Array.fill(128)(-1)
    Z85.zipWithIndex.foreach { case (c, i) => inv(c.toInt) = i }
    inv
  }

  /** Decode `s` (full 5-char groups) and return the first `outLen` bytes
    * (encoders zero-pad input to a 4-byte multiple). */
  def z85Decode(s: String, outLen: Int): Array[Byte] = {
    require(s.length % 5 == 0, s"z85 length ${s.length} not a multiple of 5")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0; var o = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) Z85_INV(c.toInt) else -1
        require(d >= 0, s"bad z85 character '$c'")
        v = v * 85 + d
        j += 1
      }
      out(o) = ((v >>> 24) & 0xff).toByte
      out(o + 1) = ((v >>> 16) & 0xff).toByte
      out(o + 2) = ((v >>> 8) & 0xff).toByte
      out(o + 3) = (v & 0xff).toByte
      i += 5; o += 4
    }
    require(outLen <= out.length, s"z85 payload shorter than $outLen")
    if (outLen == out.length) out else out.take(outLen)
  }

  /** Encode, zero-padding to a 4-byte multiple (spec behavior). */
  def z85Encode(bytes: Array[Byte]): String = {
    val padded =
      if (bytes.length % 4 == 0) bytes
      else bytes ++ new Array[Byte](4 - bytes.length % 4)
    val sb = new StringBuilder(padded.length / 4 * 5)
    var i = 0
    while (i < padded.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (padded(i + j) & 0xffL); j += 1 }
      val chunk = new Array[Char](5)
      var k = 4
      while (k >= 0) { chunk(k) = Z85.charAt((v % 85).toInt); v /= 85; k -= 1 }
      sb.appendAll(chunk)
      i += 4
    }
    sb.toString
  }

  // ---- DV file framing ----------------------------------------------------

  /** Read one DV's bitmapData out of a Delta DV file: `offset` points at
    * the big-endian dataSize field; CRC-32 over the data follows it. */
  def readFromFile(path: Path, conf: Configuration, offset: Int,
      sizeInBytes: Int): Array[Byte] = {
    val fs = path.getFileSystem(conf)
    val in = fs.open(path)
    try {
      val version = in.read()
      require(version == 1, s"unsupported delta DV file version $version")
      in.seek(offset.toLong)
      val head = new Array[Byte](4)
      in.readFully(head)
      val dataSize = ByteBuffer.wrap(head).getInt
      require(dataSize == sizeInBytes,
        s"DV descriptor size $sizeInBytes != stored $dataSize")
      val data = new Array[Byte](dataSize)
      in.readFully(data)
      val crcBytes = new Array[Byte](4)
      in.readFully(crcBytes)
      val crc = new CRC32; crc.update(data)
      require(crc.getValue.toInt == ByteBuffer.wrap(crcBytes).getInt,
        s"DV checksum mismatch in $path at offset $offset")
      data
    } finally in.close()
  }

  /** Write one DV as a single-DV Delta file under `tableRoot`; returns
    * (pathOrInlineDv for storageType 'u', offset, sizeInBytes). A caller
    * passing a DETERMINISTIC uuid makes the write idempotent — an
    * existing file of that name is reused (same source, same bytes). */
  def writeFile(tableRoot: Path, conf: Configuration, bm: Bitmap64,
      uuid: UUID = UUID.randomUUID()): (String, Int, Int) = {
    val name = s"deletion_vector_$uuid.bin"
    val path = new Path(tableRoot, name)
    val data = Bitmap64.toDeltaPortable(bm)
    val fs = path.getFileSystem(conf)
    // Crash-/race-safe deterministic-name materialization — the shared
    // DeletionVectors.materializeSidecar dance.
    val expectedLen = 9L + data.length // version + length + data + crc
    DeletionVectors.materializeSidecar(fs, path, expectedLen) { tmp =>
      val out = fs.create(tmp, true)
      try {
        out.write(1) // file format version
        out.write(ByteBuffer.allocate(4).putInt(data.length).array())
        out.write(data)
        val crc = new CRC32; crc.update(data)
        out.write(ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
      } finally out.close()
    }
    val uuidBytes = ByteBuffer.allocate(16)
      .putLong(uuid.getMostSignificantBits)
      .putLong(uuid.getLeastSignificantBits).array()
    (z85Encode(uuidBytes), 1, data.length)
  }

  // ---- descriptor resolution ---------------------------------------------

  /** Resolve a DV descriptor to its row-index bitmap. */
  def readDescriptor(tableRoot: Path, conf: Configuration,
      storageType: String, pathOrInlineDv: String,
      offset: Int, sizeInBytes: Int): Bitmap64 = storageType match {
    case "i" =>
      Bitmap64.fromDeltaPortable(z85Decode(pathOrInlineDv, sizeInBytes))
    case "p" =>
      // absolute paths are stored URL-ESCAPED (PROTOCOL.md: "Special
      // characters in this path must be escaped"); URI parsing decodes
      val p =
        try new Path(new java.net.URI(pathOrInlineDv))
        catch { case _: java.net.URISyntaxException => new Path(pathOrInlineDv) }
      Bitmap64.fromDeltaPortable(readFromFile(p, conf, offset, sizeInBytes))
    case "u" =>
      // trailing 20 chars are the z85 uuid; anything before is a random
      // directory prefix
      require(pathOrInlineDv.length >= 20, s"bad u-DV path $pathOrInlineDv")
      val prefix = pathOrInlineDv.dropRight(20)
      val uuidBytes = z85Decode(pathOrInlineDv.takeRight(20), 16)
      val bb = ByteBuffer.wrap(uuidBytes)
      val uuid = new UUID(bb.getLong, bb.getLong)
      val dir = if (prefix.isEmpty) tableRoot else new Path(tableRoot, prefix)
      val spec = new Path(dir, s"deletion_vector_$uuid.bin")
      val fs = spec.getFileSystem(conf)
      // Writers may prepend a NAME prefix to the spec name (the reference
      // does in its test fixtures); the uuid is the identity, so fall
      // back to the unique `*deletion_vector_<uuid>.bin` match.
      val resolved =
        if (fs.exists(spec)) spec
        else {
          val matches = fs.globStatus(
            new Path(dir, s"*deletion_vector_$uuid.bin"))
          require(matches != null && matches.length == 1,
            s"DV file deletion_vector_$uuid.bin not found under $dir")
          matches.head.getPath
        }
      Bitmap64.fromDeltaPortable(
        readFromFile(resolved, conf, offset, sizeInBytes))
    case other =>
      throw new IllegalArgumentException(s"unknown DV storageType '$other'")
  }
}
