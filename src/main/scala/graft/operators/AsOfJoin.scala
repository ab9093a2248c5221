package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join: for each left row, attach the single right row with the
 * greatest right timestamp <= the left timestamp within the same key
 * group (the time-series "most recent fact" join; left rows with no
 * prior right row keep nulls).
 *
 * Implemented as a union + one window pass instead of a range join:
 * both sides shuffle ONCE on the key, each partition sorts by
 * (timestamp, side) with right rows ordered before left rows at equal
 * timestamps (inclusive <= semantics), and a running
 * `last(right_payload, ignoreNulls)` carries the latest right row
 * forward onto every left row. No range cross-product ever
 * materializes, so a key with millions of rows costs O(n log n) sort,
 * not O(n^2) — the shape that survives 100 TB event tables. Skewed
 * keys behave like any single-key sort; sub-partition by a time bucket
 * first if one key dominates the corpus.
 *
 * (The reference engine has no as-of operator; this composes Spark
 * built-ins per the task's custom-operator preference order.)
 */
object AsOfJoin {

  /**
   * @param key         equi-join column present on both sides
   * @param ts          event-time column present on both sides (any
   *                    orderable type)
   * @param rightPrefix prefix for the matched right row's columns in the
   *                    output (all right columns except `key` appear,
   *                    including its `ts`)
   */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      rightPrefix: String = "right_"): DataFrame = {
    val rightCols = right.columns.filter(_ != key).toSeq
    val r = right.select(
      col(key),
      col(ts).as("__ts"),
      struct(rightCols.map(col): _*).as("__rpay"),
      lit(1).as("__isR"))
    val l = left.select(
      Seq(col(key), col(ts).as("__ts"), lit(0).as("__isR"),
        struct(left.columns.map(col): _*).as("__lpay")): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // Final __rpay sort key: when several right rows share (key, ts),
    // `last` must not pick an arbitrary one — order the ties by the full
    // right payload (structs compare field-by-field) so the greatest
    // payload deterministically wins, run after run. Payloads containing
    // non-orderable types (maps) tie-break on a hash of their JSON form
    // instead: still deterministic, just not "greatest-payload".
    def orderable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.forall(f => orderable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => orderable(a.elementType)
      case _: org.apache.spark.sql.types.MapType => false
      case u: org.apache.spark.sql.types.UserDefinedType[_] => orderable(u.sqlType)
      case _ => true
    }
    val payloadKey =
      if (right.schema.fields.filter(f => rightCols.contains(f.name))
            .forall(f => orderable(f.dataType))) col("__rpay")
      else xxhash64(to_json(col("__rpay")))
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts").asc, col("__isR").desc, payloadKey.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__m", last(col("__rpay"), ignoreNulls = true).over(w))
      .where(col("__isR") === 0)
    matched.select(
      left.columns.map(c => col(s"__lpay.$c").as(c)) ++
        rightCols.map(c => col(s"__m.$c").as(rightPrefix + c)): _*)
  }
}
