package graft.commands

import org.apache.spark.sql.DataFrame
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
 *  - `auto` (default): pin exactly what correctness demands — a
 *    non-deterministic source. Like the reference's auto, it is NOT a
 *    cost decision: pinning a deterministic source forces full
 *    materialization (losing the column pruning and filter pushdown the
 *    per-pass plans enjoy), which measurably REGRESSES the common
 *    cheap-source case; the multi-pass savings only win when the source
 *    is genuinely expensive, which the engine cannot know up front.
 *  - `all`: always pin — the knob for an expensive multi-join source
 *    that would otherwise compute once per pass (up to 4x for INSERT
 *    REPLACE).
 *  - `none`: alias of auto's floor (non-deterministic still pins;
 *    silently corrupting a command is never an option).
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
    val pin = mode match {
      case "all" => true
      case _ => nonDeterministic // the correctness floor never lifts
    }
    if (!pin) body(source)
    else {
      val m = source.persist(StorageLevel.MEMORY_AND_DISK)
      m.count() // evaluate exactly once, before any phase reads it
      try body(m) finally m.unpersist()
    }
  }
}
