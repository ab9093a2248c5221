package graft.commands

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, Window}
import org.apache.spark.storage.StorageLevel

/**
 * Shared source-materialization decision for the multi-pass DML commands
 * (MERGE, INSERT ... REPLACE ON/USING). Both scan their source DataFrame
 * several times — match phase, write phase, CDF rows — so
 *
 *  - a NON-DETERMINISTIC source (rand(), non-deterministic UDFs) must pin
 *    or the phases see divergent rows and silently corrupt the command;
 *  - an EXPENSIVE deterministic source (joins/aggregations/windows in its
 *    plan) re-computes its shuffles once per pass — correct but 2-4x the
 *    cost of materializing it once.
 *
 * (Reference concept: merge/MergeIntoMaterializeSource.scala:49-70 and
 * InsertReplaceOnMaterializeSource.scala:24-34 — re-designed: one shared
 * cache + eager count behind a conf, instead of RDD checkpointing with
 * lost-block retries; a lost cached block here recomputes from lineage,
 * which is safe because only deterministic sources rely on recompute —
 * non-deterministic pins always evaluate exactly once under the eager
 * count and any later block loss surfaces as a recompute of already-fixed
 * deterministic cache content only when the plan was deterministic.)
 *
 * Modes (`spark.graft.dml.materializeSource`):
 *  - `auto` (default): pin non-deterministic sources, plus deterministic
 *    ones whose plan carries a shuffle-producing operator when the
 *    command makes multiple passes;
 *  - `all`: always pin;
 *  - `none`: pin only what correctness demands (non-deterministic).
 */
object MaterializeSource {

  val CONF = "spark.graft.dml.materializeSource"

  /** Pin `source` per the conf mode, run `body` against the (possibly
    * cached) frame, and release the cache afterwards. `passes` is how
    * many times the calling command scans the source. */
  def withPinned[T](source: DataFrame, passes: Int)(body: DataFrame => T): T = {
    val mode = source.sparkSession.conf.get(CONF, "auto").toLowerCase
    require(Seq("auto", "none", "all").contains(mode),
      s"$CONF must be auto|none|all, got '$mode'")
    val analyzed = source.queryExecution.analyzed
    val nonDeterministic =
      analyzed.exists(p => p.expressions.exists(e => !e.deterministic))
    val expensive = analyzed.exists {
      case _: Join | _: Aggregate | _: Window => true
      case _ => false
    }
    val pin = mode match {
      case "all" => true
      case "none" => nonDeterministic // the correctness floor never lifts
      case _ => nonDeterministic || (expensive && passes > 1)
    }
    if (!pin) body(source)
    else {
      val m = source.persist(StorageLevel.MEMORY_AND_DISK)
      m.count() // evaluate exactly once, before any phase reads it
      try body(m) finally m.unpersist()
    }
  }
}
