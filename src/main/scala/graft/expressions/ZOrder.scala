package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.SparkShims
import org.apache.spark.sql.types._

/**
 * Z-order clustering expressions (reference concepts:
 * expressions/InterleaveBits.scala:40 and RangePartitionId — re-designed).
 *
 * `BoundaryBucket` maps a value to its quantile bucket by binary search
 * over driver-sampled boundaries; `InterleaveBits` interleaves the bucket
 * ids of N columns into one Z-value. Both only run inside OPTIMIZE
 * ZORDER's rewrite job, never in the read path, so CodegenFallback is
 * acceptable.
 */
case class BoundaryBucket(child: Expression, boundaries: Array[Double])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return 0
    val d = v match {
      case n: java.lang.Number => n.doubleValue()
      case b: Boolean => if (b) 1.0 else 0.0
      case other => other.hashCode.toDouble
    }
    var lo = 0; var hi = boundaries.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (boundaries(mid) <= d) lo = mid + 1 else hi = mid
    }
    lo
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class InterleaveBits(children: Seq[Expression]) extends Expression
    with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val n = children.length
    var z = 0L
    var bit = 0
    var outBit = 0
    // Interleave the low 63/n bits of each child, LSB-first from the MSB
    // of the bucket ids so close buckets share prefixes.
    val bitsPer = 63 / math.max(1, n)
    val vals = new Array[Long](n)
    var i = 0
    while (i < n) {
      val v = children(i).eval(input)
      vals(i) = if (v == null) 0L else v.asInstanceOf[Number].longValue()
      i += 1
    }
    bit = bitsPer - 1
    while (bit >= 0 && outBit < 63) {
      i = 0
      while (i < n && outBit < 63) {
        z = (z << 1) | ((vals(i) >> bit) & 1L)
        outBit += 1
        i += 1
      }
      bit -= 1
    }
    z
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

/**
 * Hilbert-curve index over N bucket-id columns: better locality than the
 * Z-curve (consecutive curve positions are always unit neighbors, no
 * Z-shape jumps), so range scans over clustered columns touch fewer
 * files. Skilling's axes-to-transpose algorithm, then bit interleave of
 * the transposed coords. Only runs inside OPTIMIZE's rewrite job.
 * (Reference concept: expressions/HilbertIndex.scala — re-designed.)
 */
case class HilbertIndex(children: Seq[Expression], bits: Int)
    extends Expression with CodegenFallback {
  require(children.nonEmpty && children.length * bits <= 63,
    s"need dims*bits <= 63, got ${children.length} x $bits")
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val n = children.length
    val x = new Array[Long](n)
    var i = 0
    while (i < n) {
      val v = children(i).eval(input)
      val raw = if (v == null) 0L else v.asInstanceOf[Number].longValue()
      x(i) = java.lang.Math.min(java.lang.Math.max(raw, 0L), (1L << bits) - 1)
      i += 1
    }
    HilbertIndex.transposedIndex(bits, x)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

object HilbertIndex {
  /** Skilling's AxestoTranspose, mutating x in place, then interleave. */
  def transposedIndex(bits: Int, x: Array[Long]): Long = {
    val n = x.length
    // Inverse undo
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) {
      if ((x(n - 1) & q) != 0) t ^= q - 1
      q >>= 1
    }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // Interleave transposed coords, MSB-first
    var out = 0L
    var b = bits - 1
    while (b >= 0) {
      var d = 0
      while (d < n) {
        out = (out << 1) | ((x(d) >> b) & 1L)
        d += 1
      }
      b -= 1
    }
    out
  }
}

object ZOrder {
  def boundaryBucket(c: Column, boundaries: Array[Double]): Column =
    SparkShims.column(BoundaryBucket(SparkShims.expression(c), boundaries))
  def interleaveBits(cols: Seq[Column]): Column =
    SparkShims.column(InterleaveBits(cols.map(SparkShims.expression)))
  def hilbertIndex(cols: Seq[Column], bits: Int): Column =
    SparkShims.column(HilbertIndex(cols.map(SparkShims.expression), bits))
}
