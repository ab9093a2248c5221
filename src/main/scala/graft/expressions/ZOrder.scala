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

object ZOrder {
  def boundaryBucket(c: Column, boundaries: Array[Double]): Column =
    SparkShims.column(BoundaryBucket(SparkShims.expression(c), boundaries))
  def interleaveBits(cols: Seq[Column]): Column =
    SparkShims.column(InterleaveBits(cols.map(SparkShims.expression)))
}
