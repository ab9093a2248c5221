package graft.dv

import java.io.{DataInputStream, DataOutputStream}

import org.roaringbitmap.RoaringBitmap

/**
 * 64-bit row-index bitmap: one 32-bit RoaringBitmap per 2^32 index
 * bucket, keyed by the high word. Parquet files can exceed 2^31 rows
 * (wide row groups, concatenated files), and a 32-bit bitmap would
 * silently wrap negative indexes onto live rows — a wrong-answer class,
 * not a perf issue. Buckets materialize lazily; a DV over a normal-sized
 * file costs exactly one bucket (the 32-bit fast path stays one branch).
 * (Reference concept: deletionvectors/RoaringBitmapArray.scala:46 —
 * re-designed: bucket map + own sidecar framing instead of the
 * reference's portable serialization formats.)
 *
 * Sidecar framing: magic, bucket count, then per bucket the high word
 * and the standard RoaringBitmap serialization. Only this engine reads
 * its own `_dv/` sidecars, so the framing needs no cross-format compat.
 */
final class Bitmap64 private (
    private val buckets: java.util.TreeMap[Integer, RoaringBitmap]) {

  def this() = this(new java.util.TreeMap[Integer, RoaringBitmap]())

  @inline private def high(i: Long): Integer = Integer.valueOf((i >>> 32).toInt)
  @inline private def low(i: Long): Int = i.toInt

  def add(i: Long): Unit = {
    require(i >= 0, s"negative row index $i")
    var bm = buckets.get(high(i))
    if (bm == null) { bm = new RoaringBitmap(); buckets.put(high(i), bm) }
    bm.add(low(i))
  }

  def contains(i: Long): Boolean = {
    if (i < 0) return false
    val bm = buckets.get(high(i))
    bm != null && bm.contains(low(i))
  }

  def or(other: Bitmap64): Unit = {
    val it = other.buckets.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val mine = buckets.get(e.getKey)
      if (mine == null) buckets.put(e.getKey, e.getValue.clone())
      else mine.or(e.getValue)
    }
  }

  def cardinality: Long = {
    var n = 0L
    val it = buckets.values().iterator()
    while (it.hasNext) n += it.next().getLongCardinality
    n
  }

  def runOptimize(): Unit = {
    val it = buckets.values().iterator()
    while (it.hasNext) it.next().runOptimize()
  }

  def serialize(out: DataOutputStream): Unit = {
    out.writeInt(Bitmap64.MAGIC)
    out.writeInt(buckets.size())
    val it = buckets.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeInt(e.getKey.intValue())
      e.getValue.serialize(out)
    }
  }
}

object Bitmap64 {
  private[dv] val MAGIC = 0x47B6D001 // "graft bitmap64 v1"

  def deserialize(in: DataInputStream): Bitmap64 = {
    val magic = in.readInt()
    require(magic == MAGIC, f"bad DV sidecar magic 0x$magic%08x")
    val n = in.readInt()
    val bm = new Bitmap64()
    var k = 0
    while (k < n) {
      val hi = in.readInt()
      val b = new RoaringBitmap()
      b.deserialize(in)
      bm.buckets.put(Integer.valueOf(hi), b)
      k += 1
    }
    bm
  }
}
