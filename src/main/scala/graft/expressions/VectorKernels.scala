package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Fully-codegen'd vector kernels for the similarity / ANN path. The
 * higher-order-function formulation (`aggregate`/`zip_with`) is
 * CodegenFallback — interpreted per candidate pair — which is the same
 * ~100x cliff the minhash path hit; these expressions emit one tight
 * Java loop inside whole-stage codegen instead.
 * (Reference concept: the reference ships no vector kernels; this is the
 * Spark-native replacement for Similarity's HOF dot/cosine.)
 */
object VectorKernels {
  /** splitmix64 finalizer — the deterministic pseudo-random generator for
    * hyperplane components, inlined identically in eval and codegen. */
  @inline final def mix(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Hyperplane component for (plane, dim): uniform in [-1, 1). */
  @inline final def component(seed: Long, plane: Int, dim: Int): Double =
    (mix(seed ^ (plane * 1000003L + dim)) >>> 11) / 4503599627370496.0 - 1.0
}

/** cosine(a, b) over two float vectors: one pass computing dot product and
  * both norms; 0.0 when either norm is zero. Null if either side is null. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must be array<float> (construction sites guarantee it;
  // AbstractDataType/ExpectsInputTypes is private[sql] in Spark 4).
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom > 0) dot / denom else 0.0
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0, $na = 0.0, $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xi = (double) $a.getFloat($i);
          double $yi = (double) $b.getFloat($i);
          $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
        }
        double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
        ${ev.value} = $denom > 0 ? $dot / $denom : 0.0;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Sign-bit LSH bucket over `planes` deterministic pseudo-random
  * hyperplanes (components from splitmix64, no stored matrix — the same
  * value for any executor, any dimensionality). One loop per plane. */
case class HyperplaneBucket(child: Expression, planes: Int, seed: Long)
    extends UnaryExpression {
  require(planes > 0 && planes <= 62, s"planes must be in [1, 62], got $planes")

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var proj = 0.0
      var i = 0
      while (i < n) {
        proj += x.getFloat(i) * VectorKernels.component(seed, p, i)
        i += 1
      }
      if (proj >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val n = ctx.freshName("n")
      val proj = ctx.freshName("proj")
      val z = ctx.freshName("z")
      val bucket = ctx.freshName("bucket")
      s"""
        int $n = $a.numElements();
        long $bucket = 0L;
        for (int $p = 0; $p < $planes; $p++) {
          double $proj = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            long $z = (${seed}L ^ ($p * 1000003L + $i)) + 0x9E3779B97F4A7C15L;
            $z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
            $z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
            $z = $z ^ ($z >>> 31);
            $proj += $a.getFloat($i) * (($z >>> 11) / 4503599627370496.0 - 1.0);
          }
          if ($proj >= 0) $bucket |= (1L << $p);
        }
        ${ev.value} = $bucket;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

/** Centroid matrix broadcast to executors once: flattened row-major
  * floats plus precomputed L2 norms (so the per-row kernel never
  * re-derives them). */
case class CentroidMatrix(flat: Array[Float], norms: Array[Double], dim: Int) {
  def nlist: Int = norms.length
}

object CentroidMatrix {
  def build(centroids: Array[Seq[Float]]): CentroidMatrix = {
    require(centroids.nonEmpty, "need at least one centroid")
    val dim = centroids.head.length
    val flat = new Array[Float](centroids.length * dim)
    val norms = new Array[Double](centroids.length)
    var c = 0
    while (c < centroids.length) {
      val row = centroids(c)
      var n = 0.0
      var i = 0
      while (i < dim && i < row.length) {
        val v = row(i)
        flat(c * dim + i) = v
        n += v.toDouble * v.toDouble
        i += 1
      }
      norms(c) = math.sqrt(n)
      c += 1
    }
    CentroidMatrix(flat, norms, dim)
  }
}

/**
 * Indices of the `probes` nearest centroids (cosine, descending; ties by
 * lower index) for a float-vector column — ONE expression looping over a
 * broadcast centroid matrix inside whole-stage codegen. The previous
 * formulation (`greatest` over nlist inline struct kernels) built an
 * O(nlist)-ary expression tree: at nlist ~ 31k (a 10^9-vector corpus)
 * Janino either fails or falls back to interpretation. Here the plan
 * holds one node at any nlist, and the matrix ships to each executor
 * once via the broadcast, not per-task in the serialized plan.
 */
case class NearestCentroids(
    child: Expression,
    matrixBc: org.apache.spark.broadcast.Broadcast[CentroidMatrix],
    probes: Int) extends UnaryExpression {
  require(probes > 0, s"probes must be positive, got $probes")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(a: Any): Any = {
    val m = matrixBc.value
    val x = a.asInstanceOf[ArrayData]
    val xn = math.min(x.numElements(), m.dim)
    var qn = 0.0
    var i = 0
    while (i < xn) { val v = x.getFloat(i).toDouble; qn += v * v; i += 1 }
    val qNorm = math.sqrt(qn)
    val nOut = math.min(probes, m.nlist)
    val bestScore = Array.fill(nOut)(Double.NegativeInfinity)
    val bestIdx = Array.fill(nOut)(-1)
    var c = 0
    while (c < m.nlist) {
      var dot = 0.0
      var j = 0
      val off = c * m.dim
      while (j < xn) { dot += x.getFloat(j).toDouble * m.flat(off + j); j += 1 }
      val denom = qNorm * m.norms(c)
      val s = if (denom > 0) dot / denom else 0.0
      if (s > bestScore(nOut - 1)) {
        var p = nOut - 1
        while (p > 0 && bestScore(p - 1) < s) {
          bestScore(p) = bestScore(p - 1); bestIdx(p) = bestIdx(p - 1); p -= 1
        }
        bestScore(p) = s; bestIdx(p) = c
      }
      c += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(bestIdx)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bcRef = ctx.addReferenceObj("centroidsBc", matrixBc,
        classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
      val m = ctx.freshName("m")
      val flat = ctx.freshName("flat")
      val norms = ctx.freshName("norms")
      val dim = ctx.freshName("dim")
      val xn = ctx.freshName("xn")
      val qn = ctx.freshName("qn")
      val qNorm = ctx.freshName("qNorm")
      val nOut = ctx.freshName("nOut")
      val bestScore = ctx.freshName("bestScore")
      val bestIdx = ctx.freshName("bestIdx")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val dot = ctx.freshName("dot")
      val off = ctx.freshName("off")
      val denom = ctx.freshName("denom")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      val cls = classOf[CentroidMatrix].getName
      s"""
        $cls $m = ($cls) $bcRef.value();
        float[] $flat = $m.flat();
        double[] $norms = $m.norms();
        int $dim = $m.dim();
        int $xn = java.lang.Math.min($a.numElements(), $dim);
        double $qn = 0.0;
        for (int $i = 0; $i < $xn; $i++) {
          double $v = (double) $a.getFloat($i); $qn += $v * $v;
        }
        double $qNorm = java.lang.Math.sqrt($qn);
        int $nOut = java.lang.Math.min($probes, $norms.length);
        double[] $bestScore = new double[$nOut];
        int[] $bestIdx = new int[$nOut];
        java.util.Arrays.fill($bestScore, Double.NEGATIVE_INFINITY);
        java.util.Arrays.fill($bestIdx, -1);
        for (int $c = 0; $c < $norms.length; $c++) {
          double $dot = 0.0;
          int $off = $c * $dim;
          for (int $j = 0; $j < $xn; $j++) {
            $dot += (double) $a.getFloat($j) * $flat[$off + $j];
          }
          double $denom = $qNorm * $norms[$c];
          double $s = $denom > 0 ? $dot / $denom : 0.0;
          if ($s > $bestScore[$nOut - 1]) {
            int $p = $nOut - 1;
            while ($p > 0 && $bestScore[$p - 1] < $s) {
              $bestScore[$p] = $bestScore[$p - 1];
              $bestIdx[$p] = $bestIdx[$p - 1];
              $p--;
            }
            $bestScore[$p] = $s;
            $bestIdx[$p] = $c;
          }
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray($bestIdx);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}
