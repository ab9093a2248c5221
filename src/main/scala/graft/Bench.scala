package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Production-sane broadcast threshold (Spark's 10 MB default is
      // famously conservative): a <=64 MB dimension relation broadcast
      // to N executors costs N x 64 MB of network, while the shuffled
      // alternative reshuffles the JOINED FACT — at sf10 the 16 MB
      // replicated dims sat just past 10 MB and a single released hint
      // turned q_ds_yoy into three fact-sized exchanges (218 s vs 43 s).
      // Past 64 MB the dim genuinely does not fit, and threshold-driven
      // planning (not hard-coded broadcast hints) flips to shuffled
      // joins — the behavior a 100 TB cluster needs.
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold",
        (64L << 20).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.sql.GraftSparkSessionExtension")
      .config("spark.sql.catalog.spark_catalog", "graft.catalog.GraftCatalog")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // Deterministic name order: Map hash order varies with the query set,
    // which made per-round bench comparisons noisy.
    val selected = (only match {
      case Some(names) => SparkEntry.queries.filter(q => names(q._1))
      case None => SparkEntry.queries
    }).toSeq.sortBy(_._1)
    // Untimed warm-up: the first query otherwise absorbs one-time JVM
    // costs (classloading, codegen compiler, parquet reader/writer init,
    // committer paths) that are not part of any query's steady-state cost.
    if (!sys.env.contains("SPARK_GRAFT_BENCH_NOWARMUP")) {
      Seq("graft_append_read", "dedup_exact", "q_window_running").foreach { q =>
        try SparkEntry.queries.get(q).foreach(_(spark, sfDir).count())
        catch { case _: Throwable => }
      }
      // DML warm-up on a 100-row throwaway table: the first DELETE /
      // UPDATE / MERGE otherwise pays the one-time command-pipeline and
      // codegen costs (measured ~6 s) inside whichever DML query the
      // alphabet puts first.
      try {
        import org.apache.spark.sql.functions._
        val p = java.nio.file.Files.createTempDirectory("benchwarm").toString
        Graft.write(spark.range(100).toDF("id"), p)
        spark.sql(s"DELETE FROM graft.`$p` WHERE id < 10")
        spark.sql(s"UPDATE graft.`$p` SET id = id + 0 WHERE id > 90")
        GraftTable.forPath(spark, p)
          .merge(spark.range(90, 110).toDF("id"), expr("t.id = s.id"))
          .whenMatched().updateAll().whenNotMatched().insertAll().execute()
      } catch { case _: Throwable => }
    }
    // A throwing query records -1, never its near-zero wall time: a
    // crashed query contributing ~0 s would read as a phantom speedup in
    // total/value_norm and mask the breakage (same poisoning as the
    // control below).
    def time1(name: String): Double = {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch { case _: Throwable => -1.0 }
    }
    // Ambience control: a fixed raw-parquet scan+agg with zero graft
    // involvement, timed at both ends of the run. Host-ambience swings
    // (a busy shared machine) inflate it by the same factor they inflate
    // every other query, so the driver reads `value_norm` (= total /
    // control) to separate code regressions from environment noise —
    // round 9 recorded a uniform 1.38x phantom on byte-identical code.
    // Median of the samples resists a single scheduler spike.
    // A FAILED control must poison the sample (-1), not contribute its
    // near-zero wall time: a missing/unreadable lineitem would otherwise
    // make value_norm explode and read as a phantom regression — the
    // exact failure mode the control exists to rule out.
    def timeControl(): Double = {
      import org.apache.spark.sql.functions._
      val t0 = System.nanoTime()
      try {
        spark.read.parquet(s"$sfDir/lineitem.parquet")
          .where(col("l_quantity") > 25)
          .groupBy(col("l_returnflag"))
          .agg(sum(col("l_extendedprice")), count(lit(1))).count()
        (System.nanoTime() - t0) / 1e9
      } catch { case _: Throwable => -1.0 }
    }
    // Two more graft-free controls, timed the same way: the scan control
    // rose only 6% in a round where shuffle/write-heavy queries rose 32%
    // (r13) — a single scan+agg cannot witness ambience that manifests as
    // shuffle scheduling or disk-write latency. Each family normalizes by
    // the control that exercises its bottleneck.
    // Shuffle control: a full repartition of lineitem by a high-cardinality
    // key + aggregate — one real exchange, zero graft involvement.
    def timeShuffleControl(): Double = {
      import org.apache.spark.sql.functions._
      val t0 = System.nanoTime()
      try {
        spark.read.parquet(s"$sfDir/lineitem.parquet")
          .select(col("l_orderkey"), col("l_extendedprice"))
          .repartition(64, col("l_orderkey"))
          .groupBy(col("l_orderkey")).agg(sum(col("l_extendedprice")))
          .count()
        (System.nanoTime() - t0) / 1e9
      } catch { case _: Throwable => -1.0 }
    }
    // Write control: a small raw-parquet write (overwrite, fixed row count
    // independent of SF so rung-over-rung comparisons share a yardstick) —
    // pure committer + disk-write path, zero graft involvement.
    val writeControlDir =
      java.nio.file.Files.createTempDirectory("benchwctl").toString
    def timeWriteControl(): Double = {
      import org.apache.spark.sql.functions._
      val t0 = System.nanoTime()
      try {
        spark.range(2000000).select(col("id"), (col("id") % 97).as("k"))
          .repartition(8)
          .write.mode("overwrite").parquet(writeControlDir)
        (System.nanoTime() - t0) / 1e9
      } catch { case _: Throwable => -1.0 }
    }
    // A failed sample RETRIES (up to 2 extra attempts) before poisoning:
    // committing a -1 yardstick throws away the whole rung's
    // normalization for what is usually one transient hiccup (the ladder's
    // sf0.1 rung shipped stream_norm=-1 exactly that way in r13).
    def sampled(f: () => Double, n: Int): Seq[Double] =
      Seq.fill(n)(Iterator.continually(f()).take(3).find(_ >= 0).getOrElse(-1.0))
    def median(xs: Seq[Double]): Double =
      if (xs.exists(_ < 0)) -1.0 else xs.sorted.apply(xs.size / 2)
    timeControl() // untimed warm-up of the control's own codegen
    val controlPre = sampled(() => timeControl(), 3)
    // Ambience pre-flight: on a loaded host the committed totals are
    // incomparable with the idle-band series in BOTH directions (controls
    // inflate MORE than min-of-two query sampling, biasing value_norm
    // down — r14 shipped a 4x-inflated scan control that made its norm
    // meaningless). Compare the pre-run scan-control median against the
    // trailing committed IDLE median (overridable; default is the sf0.1
    // idle band 0.26-0.40 s): beyond 1.5x, stamp `"ambient":true` into
    // the JSON and shout on stderr so the round runner re-runs later
    // instead of committing an out-of-band artifact.
    // The default idle median applies by DATA SIZE, not directory name
    // (a renamed testdata dir must not silently disable the pre-flight):
    // the control scans lineitem, so the idle band is tied to the sf0.1
    // lineitem footprint (~10.8 MB) within a 2x tolerance.
    val sf01LineitemBytes = 10818932L
    def lineitemBytes: Long =
      try {
        val d = new java.io.File(sfDir, "lineitem.parquet")
        val fs = Option(d.listFiles()).map(_.toSeq).getOrElse(Seq(d))
        fs.filter(_.isFile).map(_.length()).sum
      } catch { case _: Exception => -1L }
    val idleControlS = sys.env.get("SPARK_GRAFT_BENCH_IDLE_CONTROL_S")
      .map(_.toDouble)
      .orElse {
        val b = lineitemBytes
        if (b > sf01LineitemBytes / 2 && b < sf01LineitemBytes * 2) Some(0.37)
        else None
      }
    val controlPreMed = median(controlPre)
    // A failed pre-flight control (median poisons to -1 on any failed
    // sample) is a BROKEN control, not ambience — misattributing it to
    // host load steers the runner to re-run later instead of
    // investigating the failure. Keep the two states distinct: ambient
    // is reserved for a control that RAN and exceeded the idle band.
    val controlBroken = controlPreMed < 0
    val ambient = !controlBroken &&
      idleControlS.exists(idle => controlPreMed > 1.5 * idle)
    if (controlBroken) System.err.println(
      "*** BROKEN CONTROL: the pre-flight scan control itself failed " +
        s"(control_preflight_s=-1) — investigate the failure; this is NOT " +
        "host ambience ***")
    else if (ambient) System.err.println(
      s"*** AMBIENT WARNING: scan control pre-flight ${controlPreMed}s vs " +
        s"idle median ${idleControlS.get}s (> 1.5x) — this run is host-" +
        "load-contaminated; re-run on an in-band host before committing ***")
    timeShuffleControl(); timeWriteControl() // warm-ups
    val shuffleControl = median(sampled(() => timeShuffleControl(), 3))
    val writeControl = median(sampled(() => timeWriteControl(), 3))
    // Per-query min over two passes: single-pass wall times on a shared
    // host carry multi-second scheduler-noise spikes that read as false
    // regressions round over round (r5 recorded 10-30x phantoms). The
    // second pass re-runs queries slowest-first — the ones a noise spike
    // distorts most — and checks the budget BEFORE each query, so every
    // query keeps at least its first-pass number and the worst offenders
    // always get their second sample.
    // 2400 s (was 1500): on a slow host the cold first pass alone can eat
    // most of the old budget, silently downgrading the documented
    // min-of-two protocol to cold-only numbers for the tail of the second
    // pass (measured here: two back-to-back full runs reported 267 s vs
    // 159 s because run 1's budget ran out mid-second-pass). The budget
    // still bounds wall time; hosts where the old value sufficed are
    // unaffected (their full runs finish far below either bound).
    val budgetS = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_S", "2400").toDouble
    val wallStart = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - wallStart) / 1e9
    val first = selected.map { case (name, _) => name -> time1(name) }
    val mins = scala.collection.mutable.Map(first: _*)
    var skippedSecondPass = 0
    for ((name, t1) <- first.sortBy(-_._2))
      if (elapsed + t1 < budgetS)
        mins(name) = math.min(mins(name), time1(name))
      else skippedSecondPass += 1
    // A query that never got its warm second pass reports its cold first
    // run — say so loudly instead of letting the inflated number read as
    // a regression.
    if (skippedSecondPass > 0) System.err.println(
      s"*** BUDGET EXHAUSTED: $skippedSecondPass queries kept first-pass-" +
        "only (cold) numbers; raise SPARK_GRAFT_BENCH_BUDGET_S for the " +
        "documented min-of-two protocol ***")
    // Streaming fixtures swing 3-7x on identical code under host load
    // (micro-batch scheduler latency the scan-bound control cannot
    // normalize) — give each stream_* query min-of-3 total so one
    // scheduler spike cannot poison the round-over-round comparison.
    for (_ <- 0 until 1;
         (name, t1) <- first.filter(_._1.startsWith("stream_"))
         if elapsed + t1 < budgetS)
      mins(name) = math.min(mins(name), time1(name))
    val results = first.map { case (n, _) => n -> mins(n) }
    // Streaming ambience control: a graft-free no-op AvailableNow stream
    // (parquet source -> noop sink). Its wall time is pure micro-batch
    // scheduler + checkpoint-log latency, the component that inflates the
    // stream_* fixtures under load — `stream_norm` (= stream_* total /
    // this) separates those swings from real regressions the same way
    // value_norm does for scan-bound queries.
    val streamControlSrc = {
      val dir = java.nio.file.Files.createTempDirectory("benchsctlsrc").toString
      spark.range(1000).write.mode("overwrite").parquet(dir)
      dir
    }
    def timeStreamControl(): Double = {
      val t0 = System.nanoTime()
      try {
        val dir = java.nio.file.Files.createTempDirectory("benchsctl").toString
        val schema = spark.read.parquet(streamControlSrc).schema
        val q = spark.readStream.schema(schema)
          .parquet(streamControlSrc)
          .writeStream.format("noop")
          .option("checkpointLocation", s"$dir/cp")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        // stop on timeout too — a leaked stream would keep consuming
        // scheduler slots and contaminate the remaining samples
        try {
          if (!q.awaitTermination(120000)) return -1.0
        } finally if (q.isActive) q.stop()
        (System.nanoTime() - t0) / 1e9
      } catch { case _: Throwable => -1.0 }
    }
    // When the selected subset carries no stream_* query (a SPARK_GRAFT_
    // BENCH_ONLY subset without the stream family), skip the stream
    // control entirely and report 0.0 — "family absent", which is NOT the
    // -1.0 poison marker (a control that ran and failed). The r13 ladder
    // committed stream_norm:-1 for exactly this shape and it read as a
    // broken control.
    // "Family absent" is decided by the SELECTED NAMES, not the total: a
    // total <= 0 also happens when stream_* queries RAN and all failed
    // (each -1.0), and reporting that as absent-0.0 would mask a broken
    // stream family behind the benign marker.
    val streamSelected = results.exists(_._1.startsWith("stream_"))
    val streamTotal = results.filter(_._1.startsWith("stream_")).map(_._2).sum
    val streamControl =
      if (!streamSelected) 0.0
      else {
        timeStreamControl() // untimed warm-up of the streaming machinery
        median(sampled(() => timeStreamControl(), 3))
      }
    val streamNorm =
      if (!streamSelected) 0.0
      else if (streamTotal > 0 && streamControl > 0) streamTotal / streamControl
      else -1.0
    val control = median(controlPre ++ sampled(() => timeControl(), 3))
    def fmt(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def toJson(rs: Seq[(String, Double)]): String = rs
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val norm = if (control > 0) total / control else -1.0
    // Per-family normalization: each family's total divides by the control
    // that exercises its bottleneck — write-fixture queries (graft_*/sql_*
    // create and mutate tables; wall time is committer+disk dominated) by
    // the write control, corpus operators (dedup/ann/text/pipeline/...,
    // whose cost is shuffle exchanges) by the shuffle control, relational
    // scans (q*) by the scan control, stream_* by the stream control. A
    // family norm that swings while its control-matched siblings hold
    // still is a code regression; uniform swings are ambience.
    def family(n: String): String =
      if (n.startsWith("stream_")) "stream"
      else if (n.startsWith("graft_") || n.startsWith("sql_")) "write"
      else if (n.startsWith("q")) "scan"
      else "shuffle"
    def famTotal(f: String): Double =
      results.filter(r => family(r._1) == f).map(_._2).sum
    def famNorm(f: String, ctl: Double): Double =
      if (ctl > 0 && famTotal(f) > 0) famTotal(f) / ctl else -1.0
    val familyNorms = Seq(
      "scan" -> famNorm("scan", control),
      "shuffle" -> famNorm("shuffle", shuffleControl),
      "write" -> famNorm("write", writeControl),
      "stream" -> streamNorm)
    // The driver captures only the LAST ~2000 bytes of stdout, so the final
    // JSON line must stay well under that (the full 100-query map is ~3.5 KB
    // and made rounds 1-4 unparseable). Full map goes to a file + an early
    // stdout line (scrolls out of the tail); the last line carries the total
    // plus a fixed headline subset and stays < 1.5 KB.
    // Lean control block for the size-capped stdout tail; the full
    // artifact additionally carries the per-family wall-time totals.
    val controlsLean =
      s""""control_s":${fmt(control)},"value_norm":${fmt(norm)},""" +
      s""""ambient":$ambient,"control_broken":$controlBroken,""" +
      s""""control_preflight_s":${fmt(controlPreMed)},""" +
      s""""shuffle_control_s":${fmt(shuffleControl)},""" +
      s""""write_control_s":${fmt(writeControl)},""" +
      s""""stream_control_s":${fmt(streamControl)},"stream_norm":${fmt(streamNorm)},""" +
      s""""family_norms":${toJson(familyNorms)}"""
    val controls = controlsLean +
      s""","family_totals":${toJson(Seq("scan", "shuffle", "write", "stream").map(f => f -> famTotal(f)))}"""
    val full = s"""{"metric":"total","value":${fmt(total)},"unit":"sec",$controls,"queries":${toJson(results)},"sf":"$sfDir"}"""
    println(full)
    // The full map cannot fit the 2000-byte stdout tail (101 queries ~=
    // 2.6 KB), so it persists to files: target/bench_full.json (latest)
    // plus a run-stamped copy, so successive runs never clobber each
    // other. The COMMITTED repo-root BENCH_FULL.json is only written when
    // SPARK_GRAFT_BENCH_COMMIT_ARTIFACT=1 — every driver/CI bench run
    // used to overwrite it in the working tree, shadowing the committed
    // reference run with whatever host state the last run had.
    val stamp = System.currentTimeMillis()
    val artifacts =
      (if (only.isEmpty &&
          sys.env.get("SPARK_GRAFT_BENCH_COMMIT_ARTIFACT").contains("1"))
        Seq("BENCH_FULL.json") else Nil) ++
      Seq("target/bench_full.json", s"target/bench_full_$stamp.json")
    artifacts.foreach { p =>
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get(p), full + "\n")
      catch { case _: Throwable => }
    }
    val headline = Seq(
      "q1_pricing_summary", "q3_topk_revenue", "q5_nation_revenue",
      "q_filter_pushdown", "q_window_running", "q_percentiles",
      "q_grouping_sets", "q_set_ops", "q_session_window", "q_asof_join",
      "q_band_join", "q_json_extract",
      "q_ds_snowflake", "q_ds_rollup", "q_ds_exists_chain",
      "q_ds_yoy", "q_ds_topk_per_group", "q_ds_above_avg",
      "q_ds_cross_channel", "q_ds_fact_fact",
      "graft_append_read", "graft_data_skipping", "graft_partition_prune",
      "graft_checkpoint_replay", "graft_time_travel", "graft_cdf",
      "graft_delete", "graft_delete_dv", "graft_update", "graft_update_dv",
      "graft_merge_upsert", "graft_merge_dv", "graft_overwrite",
      "graft_replace_where", "graft_optimize_compact", "graft_zorder",
      "graft_vacuum", "graft_stream_roundtrip",
      "stream_dedup", "stream_merge_upsert", "stream_stateful_agg",
      "stream_windowed_agg",
      "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
      "dedup_ngram_jaccard", "ann_lsh", "ann_ivf", "text_termstats")
    val resultMap = results.toMap
    val head = headline.flatMap(n => resultMap.get(n).map(n -> _))
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec",$controlsLean,"queries":${toJson(head)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
