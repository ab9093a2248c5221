package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Band (range) join: pair left and right rows whose numeric ordering
 * keys lie within `width` of each other — |left.ts - right.ts| <= width
 * — without any equi-key to bound the search.
 *
 * A naive theta-join is a broadcast-nested-loop cross-product; instead
 * both sides bin their key into width-sized buckets and the left side
 * probes its own bucket plus both neighbors, turning the band condition
 * into an equi-join on the bucket id (one hash shuffle) followed by the
 * exact band filter. Every true pair lands in some probed bucket
 * (|a - b| <= width implies their bins differ by at most 1), and each
 * pair is produced exactly once because probing is one-sided. Bucket
 * population is corpus_density x width, so the local work scales with
 * the band width, not the corpus square.
 *
 * (The reference engine has no range-join operator; this composes Spark
 * built-ins per the task's custom-operator preference order.)
 */
object RangeJoin {

  /**
   * @param leftKey  numeric (long-castable) ordering column on `left`
   * @param rightKey numeric ordering column on `right`
   * @param width    band half-width, in the key's units (inclusive)
   * @return left columns + right columns (right names prefixed)
   */
  def band(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      width: Long,
      rightPrefix: String = "right_"): DataFrame = {
    require(width > 0, "band width must be positive")
    // Bucket id = the bucket's START value (k - k mod width), pure long
    // arithmetic: floor(k / width) in Spark is DOUBLE division, which for
    // keys beyond 2^53 (nanosecond timestamps ~1.7e18) can round boundary
    // values into the wrong bucket on one side only, silently dropping a
    // true pair. pmod keeps negative keys in the floor bucket.
    def bucketStart(k: Column): Column = {
      val kl = k.cast("long")
      kl - pmod(kl, lit(width))
    }
    val lBucket = bucketStart(col(leftKey))
    val l = left
      .withColumn("__b",
        explode(array(lBucket - width, lBucket, lBucket + width)))
    val r = right
      .select(right.columns.map(c => col(c).as(rightPrefix + c)): _*)
      .withColumn("__b", bucketStart(col(rightPrefix + rightKey)))
    l.join(r, "__b")
      .where(abs(col(leftKey).cast("long") -
        col(rightPrefix + rightKey).cast("long")) <= width)
      .drop("__b")
  }
}
