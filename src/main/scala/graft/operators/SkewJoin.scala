package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Salted equi-join for skewed fact keys: when one join key holds a
 * disproportionate share of the fact side (a boilerplate domain, a bot
 * user), a plain hash join sends the whole hot key to ONE reducer and
 * the stage runs at the speed of that straggler. Salting scatters each
 * fact row across `salt` sub-keys (a deterministic content hash — no
 * RNG, reruns identical) and replicates the dimension row to every
 * sub-key, so the hot key spreads over `salt` reducers at the cost of
 * salt-fold duplication of the (small) dimension side only.
 *
 * Complements AQE's skew-join splitting: AQE rebalances sort-merge
 * partitions after the fact; explicit salting also covers aggregations
 * layered on the join output and engines/plans AQE does not reach.
 *
 * (The reference engine has no salted-join operator; this composes
 * Spark built-ins per the task's custom-operator preference order.)
 */
object SkewJoin {

  /**
   * @param fact   large, possibly skewed side
   * @param dim    small side, replicated `salt` times
   * @param key    equi-join column present on both sides
   * @param salt   sub-key fan-out (reducers per hot key)
   * @param dimPrefix prefix for dim's non-key columns in the output
   */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      salt: Int,
      dimPrefix: String = "d_"): DataFrame = {
    require(salt > 0, "salt must be positive")
    // Content-hash salt: deterministic, and distinct fact rows of one hot
    // key scatter uniformly. (A row equal to another lands on the same
    // sub-key; exact-duplicate floods are a dedup problem, not a join
    // problem.)
    val f = fact.withColumn("__salt",
      pmod(xxhash64(struct(fact.columns.map(col): _*)), lit(salt.toLong)))
    val d = dim.select(col(key) +:
        dim.columns.filter(_ != key).map(c => col(c).as(dimPrefix + c)): _*)
      .withColumn("__salt",
        explode(array((0 until salt).map(i => lit(i.toLong)): _*)))
    f.join(d, Seq(key, "__salt")).drop("__salt")
  }
}
