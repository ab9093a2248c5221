package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, Trigger}

import graft.ml.{Dedup, Similarity}
import graft.multimodal.Multimodal
import graft.text.TextFunctions._

/**
 * Driver contract: `queries` (one entry per operator from SURVEY.md §2 +
 * the training-data-pipeline operators) and `oracleSql` (DuckDB-equivalent
 * SQL over the same parquet tables for every SQL-expressible query).
 *
 * Conventions for oracle determinism:
 *  - money sums go through DECIMAL(18,2) then cast to double (exact in
 *    both engines, immune to float summation order)
 *  - every result carries an ORDER BY over a unique key
 *  - column names are aliased identically on both sides
 */
object SparkEntry {

  /** Converted-fixture cache: fixture parquet → graft table path, once per
    * JVM. Every query therefore reads through the engine's own scan path
    * (GraftFileIndex → stats skipping → GraftParquetFileFormat), not
    * `spark.read.parquet` — the green rows certify the engine, not Spark.
    * Hardlink the immutable fixture into a temp dir (copy if cross-device)
    * and CONVERT in place: no data rewrite, footer stats only. */
  private val graftTables =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def t(s: SparkSession, dir: String, name: String): DataFrame = {
    val path = graftTables.computeIfAbsent(s"$dir/$name", _ => {
      val gp = Files.createTempDirectory(s"graft-tbl-$name")
      val src = java.nio.file.Paths.get(s"$dir/$name.parquet")
      def place(p: java.nio.file.Path, idx: Int): Unit = {
        val dst = gp.resolve(f"part-$idx%05d-$name.parquet")
        try Files.createLink(dst, p)
        catch { case _: Exception => Files.copy(p, dst) }
      }
      if (Files.isDirectory(src)) {
        import scala.jdk.CollectionConverters._
        Files.list(src).iterator().asScala.toSeq.sortBy(_.getFileName.toString)
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .zipWithIndex.foreach { case (p, i) => place(p, i) }
      } else place(src, 0)
      Graft.convertFromParquet(s, gp.toString)
      gp.toString
    })
    s.read.format("graft").load(path)
  }

  private def tmp(prefix: String): String =
    Files.createTempDirectory(s"graft-$prefix").toString

  /** Exact decimal sum of a 2-decimal double column, returned as double. */
  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,2)")).cast("double")

  /** Exact revenue sum: decimals BEFORE the multiply so both engines round
    * identically (2-decimal inputs are exact in decimal space). */
  private def revSum(price: org.apache.spark.sql.Column,
      discount: org.apache.spark.sql.Column) =
    sum(price.cast("decimal(18,2)") *
      (lit(1).cast("decimal(18,2)") - discount.cast("decimal(18,2)")))
      .cast("double")

  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  // ==========================================================================
  // Relational queries (scan / filter / join / agg / window / set ops)
  // ==========================================================================

  private val relational: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q3_topk_revenue" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      // customer is SF-scaled: no forced broadcast — under the size
      // threshold it broadcasts anyway, and past it (sf10, 100 TB) the
      // planner/AQE picks a shuffled join instead of a driver-built
      // multi-hundred-MB broadcast relation
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(revSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    "q5_nation_revenue" -> ((s, dir) => {
      val r = t(s, dir, "region"); val n = t(s, dir, "nation")
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      broadcast(broadcast(r).join(n, col("r_regionkey") === col("n_regionkey")))
        .join(c, col("n_nationkey") === col("c_nationkey"))
        .join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy("n_name")
        .agg(revSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy("n_name")
    }),

    "q_filter_pushdown" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R" && col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q_window_running" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
      t(s, dir, "lineitem")
        .withColumn("rn", row_number().over(w))
        .withColumn("running_qty",
          sum(col("l_quantity").cast("decimal(18,2)"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double"))
        .select("l_suppkey", "rn", "l_orderkey", "l_linenumber", "running_qty")
        .filter(col("rn") <= 5)
        .orderBy("l_suppkey", "rn")
    }),

    "q_agg_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("distinct_parts"),
          countDistinct(col("l_suppkey")).as("distinct_supps"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    "q_semi_anti_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    "q_set_ops" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val highPri = o.filter(col("o_orderpriority") === "1-URGENT")
        .select("o_custkey").distinct()
      val open = o.filter(col("o_orderstatus") === "O")
        .select("o_custkey").distinct()
      highPri.intersect(open).orderBy("o_custkey")
    }),

    "q_scalar_functions" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          upper(col("o_orderpriority")).as("pri_upper"),
          year(col("o_orderdate")).as("order_year"),
          month(col("o_orderdate")).as("order_month"),
          round(col("o_totalprice").cast("decimal(18,2)") * 2, 2)
            .cast("double").as("double_price"),
          substring(col("o_orderstatus"), 1, 1).as("status_c"),
          concat_ws("-", col("o_orderkey"), col("o_custkey")).as("composite"))
        .orderBy("o_orderkey")
    }),

    "q_collect_array" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy("user_id")
        // joined to a scalar so the oracle harness can sort/hash the column
        // (pandas cannot factorize list cells)
        .agg(array_join(sort_array(collect_list(col("event_type"))), ",")
            .as("types"),
          count(lit(1)).as("n"))
        .orderBy("user_id")
    }),

    "q_date_arith" -> ((s, dir) => {
      t(s, dir, "orders").select(
          col("o_orderkey"),
          date_add(to_date(col("o_orderdate")), 30).as("due"),
          quarter(col("o_orderdate")).as("q"),
          datediff(lit("1998-12-31").cast("date"),
            to_date(col("o_orderdate"))).as("age_days"),
          last_day(col("o_orderdate")).as("month_end"),
          date_trunc("week", col("o_orderdate")).cast("date").as("week_start"))
        .orderBy("o_orderkey")
    }),

    "q_regexp" -> ((s, dir) => {
      t(s, dir, "documents").select(
          col("doc_id"),
          regexp_extract(col("text"), "([A-Za-z]+)", 1).as("first_word"),
          size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0)))
            .as("n_numbers"),
          regexp_replace(col("text"), "\\s+", " ").substr(1, 40).as("head40"))
        .orderBy("doc_id")
    }),

    "q_conditional_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          count_if(col("l_quantity") > 25).as("n_big"),
          count(when(col("l_discount") > 0.05, 1)).as("n_disc"),
          max(when(col("l_quantity") > 25, col("l_extendedprice")))
            .as("max_big_price"),
          (sum(when(col("l_quantity") > 25, col("l_quantity")).otherwise(0))
            .cast("double") / sum(col("l_quantity"))).as("big_share"))
        .orderBy("l_returnflag")
    }),

    // Salted skew join: events are heavily skewed on user_id (few users,
    // many events). The salted result must equal a plain join exactly —
    // the oracle is the unsalted SQL join.
    "q_skew_join" -> ((s, dir) => {
      val users = t(s, dir, "events").select("user_id").distinct()
        .withColumn("user_tier",
          when(col("user_id") % 3 === 0, "gold").otherwise("std"))
      graft.operators.SkewJoin.saltedJoin(
          t(s, dir, "events").select("event_id", "user_id", "event_type"),
          users, "user_id", salt = 8)
        .groupBy("user_id", "d_user_tier")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("event_type")).as("n_types"))
        .orderBy("user_id")
    }),

    "q_events_rollup" -> ((s, dir) => {
      // events.ts is timestamp[us]; day truncation matches DuckDB's
      // CAST(ts AS DATE) under the UTC session
      t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("users"),
          round(sum(col("value").cast("decimal(18,6)")), 4)
            .cast("double").as("sum_value"))
        .orderBy("event_type", "day")
    }),

    "q_asof_join" -> ((s, dir) => {
      // for each purchase, the user's most recent click at or before it
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      graft.operators.AsOfJoin.asOf(purchases, clicks, "user_id", "ts", "click_")
        .select(col("event_id"), col("user_id"), col("click_event_id"))
        .orderBy("event_id")
    }),

    "q_json_extract" -> ((s, dir) => {
      // JSON scalar path: parse the props payload, bucket by the
      // extracted key, aggregate — from_json stays codegen-friendly and
      // pushes the doc_id filter to the scan
      t(s, dir, "events")
        .select(col("event_type"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("k",
                org.apache.spark.sql.types.IntegerType))))
            .getField("k").as("k"))
        .where(col("k").isNotNull)
        .groupBy(col("event_type"), (col("k") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .orderBy("event_type", "k_bucket")
    }),

    // VARIANT path: the same extraction through Spark's native variant
    // type (parse_json -> variant_get) — semi-structured data without a
    // declared schema, the reference's variantType feature surface.
    "q_variant" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_type"),
          expr("variant_get(parse_json(props), '$.k', 'int')").as("k"),
          expr("variant_get(parse_json(props), '$.tag', 'string')").as("tag"))
        .where(col("k").isNotNull)
        .groupBy(col("event_type"), (col("k") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          count(col("tag")).as("n_tagged"))
        .orderBy("event_type", "k_bucket")
    }),

    "q_percentiles" -> ((s, dir) => {
      // exact interpolated percentiles: Spark's percentile and DuckDB's
      // quantile_cont share the (n-1)p linear-interpolation definition,
      // bit-identical on the same input set (verified at sf0.001/0.01)
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.5)").as("p50_qty"),
          expr("percentile(l_extendedprice, 0.9)").as("p90_price"),
          expr("percentile(l_extendedprice, array(0.25, 0.75))").as("iqr"))
        .select(col("l_returnflag"), col("p50_qty"), col("p90_price"),
          col("iqr").getItem(0).as("p25_price"),
          col("iqr").getItem(1).as("p75_price"))
        .orderBy("l_returnflag")
    }),

    "q_session_window" -> ((s, dir) => {
      // sessionize per user with a 30-minute inactivity gap; Spark's
      // session_window works identically in batch and streaming, so this
      // exact query also runs over readStream with a watermark
      val ev = t(s, dir, "events").select(col("user_id"),
        col("ts").cast("timestamp").as("tsm"))
      ev.groupBy(col("user_id"), session_window(col("tsm"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"),
          unix_micros(col("w.start")).as("start_us"),
          unix_micros(col("w.end")).as("end_us"), col("n"))
        .orderBy("user_id", "start_us")
    }),

    "q_band_join" -> ((s, dir) => {
      // clicks within +-1 hour of each purchase, across ALL users — a
      // pure range join with no equi key (epoch-micros arithmetic)
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(unix_micros(col("ts").cast("timestamp")).as("c_ts"))
      graft.operators.RangeJoin.band(purchases, clicks, "ts", "c_ts",
          width = 3600L * 1000000L, rightPrefix = "r_")
        .groupBy("event_id").agg(count(lit(1)).as("n_clicks"))
        .orderBy("event_id")
    }),

    "q_pivot" -> ((s, dir) => {
      // wide-format aggregation: one column per order status
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .select(col("o_orderpriority"),
          col("F").as("n_f"), col("O").as("n_o"), col("P").as("n_p"))
        .orderBy("o_orderpriority")
    }),

    "q_grouping_sets" -> ((s, dir) => {
      // CUBE over (returnflag, linestatus) with grouping ids; the
      // super-aggregate rows NULL out the grouped-away dimension
      val li = t(s, dir, "lineitem")
      li.cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
        .select(
          col("l_returnflag"), col("l_linestatus"),
          col("n"), col("qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    "q_correlated_subquery" -> ((s, dir) => {
      // Correlated scalar subquery: customers with a big order count.
      // Catalyst decorrelates this into an aggregate + join — the plan a
      // hand-written rewrite would produce, with no per-row re-execution.
      t(s, dir, "customer").createOrReplaceTempView("v_customer")
      t(s, dir, "orders").createOrReplaceTempView("v_orders")
      s.sql("""
        SELECT c_custkey, c_name,
               (SELECT count(*) FROM v_orders o
                WHERE o.o_custkey = c.c_custkey) AS n_orders
        FROM v_customer c
        WHERE (SELECT count(*) FROM v_orders o
               WHERE o.o_custkey = c.c_custkey) >= 15
        ORDER BY c_custkey""")
    }),

    // ------------------------------------------------------------------
    // TPC-DS-shape subset: the join/agg shapes of the reference's own
    // TPC-DS benchmark workload (deep snowflake joins, ROLLUP over a
    // multi-way join, EXISTS chains, year-over-year self-joins,
    // per-group top-k, above-category-average, channel INTERSECT,
    // fact-fact joins), re-expressed over the harness tables.
    // ------------------------------------------------------------------

    "q_ds_snowflake" -> ((s, dir) => {
      // q7/q25 shape: one fact join (lineitem x orders on orderkey),
      // five dimension hops across two snowflake arms
      // (customer->nation->region, part, supplier) with selective
      // dimension filters. Only the BOUNDED dims (nation = 25 rows,
      // region = 5 at every SF) carry a broadcast hint; the SF-scaled
      // dims (customer, part, supplier) broadcast while they fit the
      // size threshold and flip to shuffled joins past it — at 100 TB a
      // forced broadcast of a row-scaled dim is a driver OOM, and the
      // superlinear sf10 rung (13.6x/decade) was exactly the forced
      // build of ~150 MB broadcast relations.
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val p = t(s, dir, "part").filter(col("p_size") <= 20)
      val su = t(s, dir, "supplier")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .join(p, col("l_partkey") === col("p_partkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .groupBy("n_name", "p_brand")
        .agg(count(lit(1)).as("n"),
          dsum(col("l_quantity")).as("qty"),
          revSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy("n_name", "p_brand")
    }),

    "q_ds_rollup" -> ((s, dir) => {
      // q18/q67 shape: ROLLUP super-aggregates over a multi-way join,
      // grouping id distinguishes the aggregation levels.
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .rollup(col("n_name"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          revSum(col("l_extendedprice"), col("l_discount")).as("revenue"),
          grouping_id().cast("int").as("gid"))
        .select(col("n_name"), col("o_orderpriority"), col("n"),
          col("revenue"), col("gid"))
        .orderBy(col("gid"), col("n_name").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    }),

    "q_ds_exists_chain" -> ((s, dir) => {
      // q10/q35 shape: EXISTS chained through two fact levels plus a
      // NOT EXISTS anti-arm; Catalyst plans semi/anti joins, never a
      // per-row subquery.
      t(s, dir, "customer").createOrReplaceTempView("v_ds_customer")
      t(s, dir, "orders").createOrReplaceTempView("v_ds_orders")
      t(s, dir, "lineitem").createOrReplaceTempView("v_ds_lineitem")
      s.sql("""
        SELECT c_mktsegment,
               count(*) AS n_cust,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal
        FROM v_ds_customer c
        WHERE EXISTS (
                SELECT 1 FROM v_ds_orders o
                WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
                  AND EXISTS (SELECT 1 FROM v_ds_lineitem l
                              WHERE l.l_orderkey = o.o_orderkey
                                AND l.l_returnflag = 'R'))
          AND NOT EXISTS (
                SELECT 1 FROM v_ds_orders o2
                WHERE o2.o_custkey = c.c_custkey
                  AND o2.o_orderpriority = '5-LOW')
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment""")
    }),

    "q_ds_yoy" -> ((s, dir) => {
      // q11/q74 shape: per-entity yearly aggregate self-joined on
      // consecutive years; the growth predicate compares the two runs.
      // The yearly aggregate shuffles once; the self-join is on the
      // (already small) aggregate, broadcast at any scale.
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val yearRev = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), year(col("o_orderdate")).as("yr"))
        .agg(revSum(col("l_extendedprice"), col("l_discount")).as("rev"))
      val cur = yearRev.select(col("n_name"), col("yr"), col("rev"))
      val prev = yearRev.select(col("n_name").as("p_name"),
        col("yr").as("p_yr"), col("rev").as("prev_rev"))
      cur.join(prev,
          col("n_name") === col("p_name") && col("yr") === col("p_yr") + 1)
        .where(col("rev") > col("prev_rev"))
        .select(col("n_name"), col("yr").cast("int").as("yr"), col("rev"),
          col("prev_rev"))
        .orderBy("n_name", "yr")
    }),

    "q_ds_topk_per_group" -> ((s, dir) => {
      // best-seller shape: revenue rank within brand, top 3 per brand;
      // one fact shuffle into the aggregate, window over the small
      // per-part aggregate, deterministic partkey tie-break.
      val l = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      val perPart = l.join(p, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_partkey")
        .agg(revSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("p_brand"))
        .orderBy(col("revenue").desc, col("p_partkey"))
      perPart.withColumn("rk", rank().over(w))
        .where(col("rk") <= 3)
        .select(col("p_brand"), col("p_partkey"), col("revenue"),
          col("rk").cast("int").as("rk"))
        .orderBy("p_brand", "rk", "p_partkey")
    }),

    "q_ds_above_avg" -> ((s, dir) => {
      // above-category-average shape (q6-like): parts priced above 1.05x
      // their type's average, measured by lineitem traffic. The 1.05x
      // test is exact integer-scaled decimal arithmetic on both engines
      // (price*20*cnt > 21*sum <=> price > 1.05*avg), immune to float
      // rounding at the boundary. 1.05 keeps the selection non-trivial:
      // the corpus' retail prices span only ~900-1000, so a classic 1.2x
      // gate would select zero rows at every SF.
      val p = t(s, dir, "part")
      val typeAgg = p.groupBy(col("p_type").as("t_type"))
        .agg(sum(col("p_retailprice").cast("decimal(18,2)")).as("t_sum"),
          count(lit(1)).as("t_cnt"))
      val expensive = p.join(broadcast(typeAgg), col("p_type") === col("t_type"))
        .where(col("p_retailprice").cast("decimal(18,2)") * 20 * col("t_cnt") >
          col("t_sum") * 21)
        .select("p_partkey", "p_brand", "p_type")
      val l = t(s, dir, "lineitem")
      l.join(expensive, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"),
          revSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy("p_brand")
    }),

    "q_ds_cross_channel" -> ((s, dir) => {
      // q38 shape: INTERSECT of the same entity set observed through
      // three different channels; each arm is a distinct projection, the
      // intersect is a pair of co-partitioned semi joins.
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      val high = o.filter(col("o_orderpriority") === "2-HIGH")
        .select(col("o_custkey"))
      val returned = l.filter(col("l_returnflag") === "R")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey"))
      val keys = urgent.intersect(high).intersect(returned)
      t(s, dir, "customer")
        .join(keys, col("c_custkey") === col("o_custkey"))
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    "q_ds_fact_fact" -> ((s, dir) => {
      // store_sales-vs-store_returns shape: two pre-aggregated runs over
      // the same fact joined on the shared key — both aggregates
      // partition by l_orderkey, so the final join is co-partitioned
      // (no third shuffle) at any scale.
      val l = t(s, dir, "lineitem")
      val ret = l.filter(col("l_returnflag") === "R")
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_ret"),
          dsum(col("l_extendedprice")).as("ret_price"))
      val kept = l.filter(col("l_returnflag") === "N")
        .groupBy(col("l_orderkey").as("k_orderkey"))
        .agg(count(lit(1)).as("n_kept"),
          dsum(col("l_extendedprice")).as("kept_price"))
      ret.join(kept, col("l_orderkey") === col("k_orderkey"))
        .select(col("l_orderkey"), col("n_ret"), col("ret_price"),
          col("n_kept"), col("kept_price"))
        .orderBy("l_orderkey")
    }))

  // ==========================================================================
  // Graft-table operator queries (transactional engine end-to-end)
  // ==========================================================================

  private val engine: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graft_append_read" -> ((s, dir) => {
      val path = tmp("append")
      val li = t(s, dir, "lineitem")
      Graft.write(li, path)
      Graft.write(t(s, dir, "lineitem"), path)   // second append
      Graft.read(s, path).groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
        .orderBy("l_returnflag")
    }),

    "graft_partition_prune" -> ((s, dir) => {
      val path = tmp("prune")
      Graft.write(t(s, dir, "lineitem"), path, partitionBy = Seq("l_returnflag"))
      Graft.read(s, path).filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // Generated-column partition inference: table partitioned by
    // d = CAST(ts AS DATE); the filter mentions only ts, and pruning
    // still fires via the inferred predicate on d.
    "graft_partition_inference" -> ((s, dir) => {
      val path = tmp("pinf")
      val raw = t(s, dir, "events")
      // cutoff computed in epoch micros so Spark and the oracle truncate
      // identically; ts normalized to session-TZ timestamp (UTC session →
      // identical instants to DuckDB's ntz view of the same file)
      val maxMicros =
        raw.agg(max(unix_micros(col("ts").cast("timestamp")))).head.getLong(0)
      val cutMicros = maxMicros - 2L * 86400 * 1000000
      val ev = raw.withColumn("ts", col("ts").cast("timestamp"))
      val schema = org.apache.spark.sql.types.StructType(
        graft.schema.SchemaUtils.toNullable(ev.schema).fields :+
          graft.schema.ColumnDefaults.generatedField("d",
            org.apache.spark.sql.types.DateType, "CAST(ts AS DATE)"))
      Graft.create(s, path, schema, partitionBy = Seq("d"))
      Graft.write(ev, path)
      Graft.read(s, path)
        .filter(col("ts") >= timestamp_micros(lit(cutMicros)))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          round(sum(col("value").cast("decimal(18,6)")), 4)
            .cast("double").as("sum_value"))
        .orderBy("event_type")
    }),

    // materializePartitionColumns writer feature: partition columns are
    // physically written INTO the data parquet. The read back is RAW
    // parquet with recursiveFileLookup (no hive partition inference, no
    // graft log involved) — the partition column's values can only come
    // from inside the files, so the row proves the materialized layout
    // end to end.
    "graft_materialize_partcols" -> ((s, dir) => {
      val path = tmp("matpart")
      Graft.write(t(s, dir, "lineitem"), path,
        partitionBy = Seq("l_returnflag"),
        configuration = Map(
          "graft.enableMaterializePartitionColumnsFeature" -> "true"))
      s.read.option("recursiveFileLookup", "true").parquet(path)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
        .orderBy("l_returnflag")
    }),

    "graft_data_skipping" -> ((s, dir) => {
      val path = tmp("skip")
      val li = t(s, dir, "lineitem")
      // write ordered by orderkey so files carry disjoint min/max ranges
      Graft.write(li.repartitionByRange(8, col("l_orderkey")), path)
      val maxKey = li.agg(max("l_orderkey")).head.getLong(0)
      Graft.read(s, path).filter(col("l_orderkey") === maxKey)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_linenumber")
    }),

    "graft_overwrite" -> ((s, dir) => {
      val path = tmp("overwrite")
      Graft.write(t(s, dir, "lineitem"), path)
      Graft.write(t(s, dir, "lineitem").filter(col("l_quantity") > 25), path,
        mode = "overwrite")
      Graft.read(s, path)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "graft_replace_where" -> ((s, dir) => {
      val path = tmp("rw")
      Graft.write(t(s, dir, "lineitem"), path, partitionBy = Seq("l_returnflag"))
      val repl = t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R" && col("l_quantity") > 40)
      Graft.write(repl, path, mode = "overwrite",
        replaceWhere = Some("l_returnflag = 'R'"))
      Graft.read(s, path)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
        .orderBy("l_returnflag")
    }),

    "graft_replace_where_data" -> ((s, dir) => {
      // Arbitrary (non-partition) replaceWhere: rows matching the data
      // predicate are replaced; rows sharing files with them survive via
      // rewrite.
      val path = tmp("rwd")
      Graft.write(t(s, dir, "lineitem"), path)
      val repl = t(s, dir, "lineitem")
        .filter(col("l_quantity") < 5 && col("l_linenumber") === 1)
      Graft.write(repl, path, mode = "overwrite",
        replaceWhere = Some("l_quantity < 5"))
      Graft.read(s, path)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "graft_insert_replace_on" -> ((s, dir) => {
      // INSERT ... REPLACE ON: the replace criteria derive from the
      // inserted data — matching rows are deleted and every source row
      // inserted, atomically.
      val path = tmp("irepl")
      Graft.write(t(s, dir, "orders"), path)
      val modified = t(s, dir, "orders")
        .filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_orderstatus", lit("X"))
      val fresh = t(s, dir, "orders")
        .filter(col("o_orderkey") % 7 === 3)
        .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
      GraftTable.forPath(s, path).insertReplaceOn(
        modified.unionByName(fresh), expr("t.o_orderkey = s.o_orderkey"))
      Graft.read(s, path)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    "graft_delete" -> ((s, dir) => {
      val path = tmp("delete")
      Graft.write(t(s, dir, "lineitem"), path)
      GraftTable.forPath(s, path).delete(col("l_quantity") < 10)
      Graft.read(s, path)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // Deletion-vector DELETE: two deletes mark bitmap sidecars (the
    // second merges into the first); no data file is ever rewritten.
    "graft_delete_dv" -> ((s, dir) => {
      val path = tmp("dvdel")
      Graft.write(t(s, dir, "lineitem"), path,
        configuration = Map("graft.enableDeletionVectors" -> "true"))
      val tb = GraftTable.forPath(s, path)
      tb.delete(col("l_quantity") < 10)
      tb.delete(col("l_quantity") > 45)
      Graft.read(s, path)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "graft_update" -> ((s, dir) => {
      val path = tmp("update")
      Graft.write(t(s, dir, "lineitem"), path)
      GraftTable.forPath(s, path)
        .update(col("l_quantity") > 45, Map("l_tax" -> lit(0.99)))
      Graft.read(s, path)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_tax")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // DV twins of the update/merge queries: identical semantics and
    // oracles, but executed via bitmap marking instead of file rewrites.
    "graft_update_dv" -> ((s, dir) => {
      val path = tmp("dvupd")
      Graft.write(t(s, dir, "lineitem"), path,
        configuration = Map("graft.enableDeletionVectors" -> "true"))
      GraftTable.forPath(s, path)
        .update(col("l_quantity") > 45, Map("l_tax" -> lit(0.99)))
      Graft.read(s, path)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_tax")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "graft_merge_dv" -> ((s, dir) => {
      val path = tmp("dvmrg")
      Graft.write(t(s, dir, "customer"), path,
        configuration = Map("graft.enableDeletionVectors" -> "true"))
      val src = t(s, dir, "customer")
        .select(col("c_custkey").as("k"), col("c_acctbal").as("bal"))
      GraftTable.forPath(s, path)
        .merge(src, expr("t.c_custkey = s.k"))
        .whenMatched(expr("s.bal < 0")).delete()
        .whenMatched().update(Map("c_mktsegment" -> lit("KEPT")))
        .execute()
      Graft.read(s, path)
        .select("c_custkey", "c_acctbal", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    // ---- SQL surface: same semantics as the graft_* API queries, driven
    // entirely through spark.sql over `graft.`/path`` targets.
    "sql_delete" -> ((s, dir) => {
      val path = tmp("sqldel")
      Graft.write(t(s, dir, "lineitem"), path)
      s.sql(s"DELETE FROM graft.`$path` WHERE l_quantity < 10")
      s.sql(s"""SELECT l_orderkey, l_linenumber, l_quantity FROM graft.`$path`
                ORDER BY l_orderkey, l_linenumber""")
    }),

    "sql_update" -> ((s, dir) => {
      val path = tmp("sqlupd")
      Graft.write(t(s, dir, "lineitem"), path)
      s.sql(s"UPDATE graft.`$path` SET l_tax = 0.99 WHERE l_quantity > 45")
      s.sql(s"""SELECT l_orderkey, l_linenumber, l_quantity, l_tax
                FROM graft.`$path` ORDER BY l_orderkey, l_linenumber""")
    }),

    "sql_merge" -> ((s, dir) => {
      val path = tmp("sqlmrg")
      Graft.write(t(s, dir, "customer"), path)
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(dsum(col("o_totalprice")).as("total"))
        .select(
          when(col("o_custkey") % 10 === 0, col("o_custkey") + 100000)
            .otherwise(col("o_custkey")).as("k"),
          col("total"))
        .createOrReplaceTempView("sql_merge_src")
      s.sql(
        s"""MERGE INTO graft.`$path` AS t USING sql_merge_src AS s
           |ON t.c_custkey = s.k
           |WHEN MATCHED THEN UPDATE SET c_acctbal = s.total
           |WHEN NOT MATCHED THEN
           |  INSERT (c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)
           |  VALUES (s.k, 'cust_new', -1, s.total, 'NEW')
           |""".stripMargin)
      Graft.read(s, path).orderBy("c_custkey")
    }),

    "sql_optimize" -> ((s, dir) => {
      val path = tmp("sqlopt")
      val li = t(s, dir, "lineitem")
      (1 to 7).foreach(i =>
        Graft.write(li.filter(col("l_linenumber") === i), path))
      s.sql(s"OPTIMIZE '$path'")
      s.sql(s"""SELECT l_linenumber, count(*) AS n,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price
                FROM graft.`$path` GROUP BY 1 ORDER BY 1""")
    }),

    // ---- DSv2 catalog surface: named tables, CTAS / CREATE OR REPLACE,
    // static-partition INSERT, table_changes TVF.
    "sql_catalog_ctas" -> ((s, dir) => {
      val path = tmp("catctas")
      val tbl = s"ctas_${System.nanoTime()}"
      t(s, dir, "orders").createOrReplaceTempView(s"src_$tbl")
      s.sql(s"CREATE TABLE $tbl USING graft LOCATION '$path/t' AS " +
        s"SELECT * FROM src_$tbl WHERE o_orderstatus = 'F'")
      s.sql(s"CREATE OR REPLACE TABLE $tbl USING graft LOCATION '$path/t' AS " +
        s"SELECT o_custkey, o_totalprice FROM src_$tbl WHERE o_totalprice > 150000")
      s.sql(s"""SELECT count(*) AS n,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
                FROM $tbl""")
    }),

    "sql_insert_partition" -> ((s, dir) => {
      val path = tmp("catins")
      val tbl = s"ins_${System.nanoTime()}"
      t(s, dir, "nation").createOrReplaceTempView(s"src_$tbl")
      s.sql(s"CREATE TABLE $tbl (n_nationkey INT, n_name STRING, n_regionkey INT) " +
        s"USING graft PARTITIONED BY (n_regionkey) LOCATION '$path/t'")
      s.sql(s"INSERT INTO $tbl SELECT n_nationkey, n_name, n_regionkey FROM src_$tbl")
      s.sql(s"INSERT OVERWRITE $tbl PARTITION (n_regionkey=0) " +
        s"SELECT n_nationkey + 100, n_name FROM src_$tbl WHERE n_regionkey = 1")
      s.sql(s"SELECT n_regionkey, count(*) AS n, sum(n_nationkey) AS sk " +
        s"FROM $tbl GROUP BY 1 ORDER BY 1")
    }),

    "sql_table_changes" -> ((s, dir) => {
      val path = tmp("cattvf")
      val tbl = s"tvf_${System.nanoTime()}"
      t(s, dir, "supplier").createOrReplaceTempView(s"src_$tbl")
      s.sql(s"CREATE TABLE $tbl USING graft LOCATION '$path/t' " +
        s"TBLPROPERTIES ('graft.enableChangeDataFeed'='true') " +
        s"AS SELECT * FROM src_$tbl")
      s.sql(s"DELETE FROM $tbl WHERE s_suppkey % 7 = 0")
      s.sql(s"UPDATE $tbl SET s_acctbal = 0.0 WHERE s_suppkey <= 20")
      s.sql(s"SELECT _change_type, count(*) AS n FROM table_changes('$tbl', 1, 2) " +
        s"GROUP BY 1 ORDER BY 1")
    }),

    "graft_merge_evolution" -> ((s, dir) => {
      val path = tmp("mergevo")
      Graft.write(t(s, dir, "nation"), path)
      val n = t(s, dir, "nation")
      val src = n.select(
        when(col("n_nationkey") < 12, col("n_nationkey"))
          .otherwise(col("n_nationkey") + 100).as("n_nationkey"),
        col("n_name"), col("n_regionkey"),
        (col("n_nationkey") * 2).as("n_extra"))
      GraftTable.forPath(s, path)
        .merge(src, expr("t.n_nationkey = s.n_nationkey"))
        .withSchemaEvolution()
        .whenMatched().updateAll()
        .whenNotMatched().insertAll()
        .execute()
      Graft.read(s, path)
        .select("n_nationkey", "n_regionkey", "n_extra")
        .orderBy("n_nationkey")
    }),

    "graft_type_widening" -> ((s, dir) => {
      val path = tmp("widen")
      Graft.write(t(s, dir, "nation"), path)
      // int -> long is metadata-only; old int32 files read back as long
      GraftTable.forPath(s, path)
        .alterColumnType("n_regionkey", org.apache.spark.sql.types.LongType)
      Graft.write(t(s, dir, "nation").select(col("n_nationkey"), col("n_name"),
        (col("n_regionkey") + 10000000000L).as("n_regionkey")), path)
      Graft.read(s, path).agg(
        count(lit(1)).as("n"),
        sum(col("n_regionkey")).as("sr"),
        sum(when(col("n_regionkey") >= 10000000000L, 1L).otherwise(0L)).as("wide"))
    }),

    "graft_row_tracking" -> ((s, dir) => {
      val path = tmp("rowtrack")
      val n = t(s, dir, "nation").orderBy("n_nationkey").coalesce(1)
      Graft.write(n, path, configuration = Map(
        "graft.enableRowTracking" -> "true",
        "graft.enableDeletionVectors" -> "true"))
      Graft.write(t(s, dir, "nation").orderBy("n_nationkey").coalesce(1), path)
      GraftTable.forPath(s, path).delete(col("n_nationkey") % 5 === 2)
      GraftTable.forPath(s, path).optimize().executeCompaction()
      GraftTable.forPath(s, path).toDFWithRowIds
        .select(col("n_nationkey"), col("_graft_row_id"))
        .orderBy("n_nationkey", "_graft_row_id")
    }),

    "graft_merge_upsert" -> ((s, dir) => {
      val path = tmp("merge")
      Graft.write(t(s, dir, "customer"), path)
      val src = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(dsum(col("o_totalprice")).as("total"))
        .select(
          when(col("o_custkey") % 10 === 0, col("o_custkey") + 100000)
            .otherwise(col("o_custkey")).as("k"),
          col("total"))
      GraftTable.forPath(s, path)
        .merge(src, expr("t.c_custkey = s.k"))
        .whenMatched().update(Map("c_acctbal" -> col("s.total")))
        .whenNotMatched().insert(Map(
          "c_custkey" -> col("s.k"),
          "c_name" -> lit("cust_new"),
          "c_nationkey" -> lit(-1),
          "c_acctbal" -> col("s.total"),
          "c_mktsegment" -> lit("NEW")))
        .execute()
      Graft.read(s, path).orderBy("c_custkey")
    }),

    "graft_merge_insert_only" -> ((s, dir) => {
      val path = tmp("mio")
      val o = t(s, dir, "orders")
      Graft.write(o.filter(col("o_orderkey") % 2 === 0), path)
      GraftTable.forPath(s, path)
        .merge(o, expr("t.o_orderkey = s.o_orderkey"))
        .whenNotMatched().insertAll()
        .execute()
      Graft.read(s, path)
        .select("o_orderkey", "o_custkey", "o_orderstatus")
        .orderBy("o_orderkey")
    }),

    "graft_merge_delete" -> ((s, dir) => {
      val path = tmp("md")
      Graft.write(t(s, dir, "customer"), path)
      val src = t(s, dir, "customer")
        .select(col("c_custkey").as("k"), col("c_acctbal").as("bal"))
      GraftTable.forPath(s, path)
        .merge(src, expr("t.c_custkey = s.k"))
        .whenMatched(expr("s.bal < 0")).delete()
        .whenMatched().update(Map("c_mktsegment" -> lit("KEPT")))
        .execute()
      Graft.read(s, path)
        .select("c_custkey", "c_acctbal", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    "graft_time_travel" -> ((s, dir) => {
      val path = tmp("tt")
      Graft.write(t(s, dir, "supplier"), path)
      GraftTable.forPath(s, path).delete(col("s_acctbal") < 0)
      GraftTable.forPath(s, path).asOfVersion(0)
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
    }),

    "graft_restore" -> ((s, dir) => {
      val path = tmp("restore")
      Graft.write(t(s, dir, "supplier"), path)
      GraftTable.forPath(s, path).delete(col("s_acctbal") < 0)
      GraftTable.forPath(s, path).restoreToVersion(0)
      Graft.read(s, path)
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
    }),

    "graft_describe_history" -> ((s, dir) => {
      // DESCRIBE HISTORY surface: a deterministic 3-operation fixture
      // (WRITE, DELETE, OPTIMIZE) pinned against a literal oracle on the
      // stable provenance columns (timestamps/metrics are wall-clock).
      val path = tmp("hist")
      Graft.write(t(s, dir, "part").repartition(4), path)
      GraftTable.forPath(s, path).delete(col("p_size") > 40)
      GraftTable.forPath(s, path).optimize().executeCompaction()
      GraftTable.forPath(s, path).history()
        .select(col("version"), col("operation"), col("readVersion"))
        .orderBy("version")
    }),

    "graft_describe_detail" -> ((s, dir) => {
      // DESCRIBE DETAIL surface: the deterministic summary columns of a
      // partitioned table (one file per partition via repartition(1)).
      val path = tmp("detail")
      Graft.write(t(s, dir, "nation").repartition(1), path,
        partitionBy = Seq("n_regionkey"))
      GraftTable.forPath(s, path).detail()
        .select(col("format"), col("version"),
          col("numFiles").as("num_files"),
          concat_ws(",", col("partitionColumns")).as("partition_cols"))
    }),

    "graft_generate_manifests" -> ((s, dir) => {
      // GENERATE symlink_format_manifest: the manifest line set of each
      // partition must equal the log's live-file list for that partition
      // (resolved to canonical paths), with one line per file.
      import s.implicits._
      val path = tmp("manif")
      Graft.write(t(s, dir, "nation").repartition(1), path,
        partitionBy = Seq("n_regionkey"))
      GraftTable.forPath(s, path).generateSymlinkManifest()
      val logFiles: Map[String, Set[String]] =
        GraftTable.forPath(s, path).snapshot.allFiles
          .groupBy(_.partitionValues("n_regionkey"))
          .map { case (k, fs) => k -> fs.map(f =>
            new java.io.File(path, f.path).getCanonicalPath).toSet }
      val base = new java.io.File(path, "_symlink_format_manifest")
      val rows = base.listFiles().filter(_.isDirectory).toSeq.map { d =>
        val part = d.getName.stripPrefix("n_regionkey=")
        val lines = d.listFiles().toSeq.flatMap { f =>
          val src = scala.io.Source.fromFile(f)
          try src.getLines().toList finally src.close()
        }
        val canon = lines.map(u =>
          new java.io.File(new java.net.URI(u)).getCanonicalPath).toSet
        (part.toLong, lines.size.toLong,
          canon == logFiles.getOrElse(part, Set.empty[String]))
      }
      rows.toDF("part", "n_files", "matches_log").orderBy("part")
    }),

    "graft_optimize_compact" -> ((s, dir) => {
      val path = tmp("opt")
      val li = t(s, dir, "lineitem")
      (1 to 7).foreach(i =>
        Graft.write(li.filter(col("l_linenumber") === i), path))
      GraftTable.forPath(s, path).optimize().executeCompaction()
      Graft.read(s, path)
        .groupBy("l_linenumber")
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("price"))
        .orderBy("l_linenumber")
    }),

    "graft_zorder" -> ((s, dir) => {
      val path = tmp("zorder")
      Graft.write(t(s, dir, "lineitem"), path)
      GraftTable.forPath(s, path).optimize()
        .executeZOrderBy("l_orderkey", "l_partkey")
      Graft.read(s, path)
        .filter(col("l_orderkey") < 100 && col("l_partkey") < 100)
        .select("l_orderkey", "l_linenumber", "l_partkey")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "graft_cdf" -> ((s, dir) => {
      val path = tmp("cdf")
      Graft.write(t(s, dir, "supplier"), path,
        configuration = Map("graft.enableChangeDataFeed" -> "true"))
      GraftTable.forPath(s, path)
        .update(col("s_suppkey") <= 50, Map("s_acctbal" -> lit(0.0)))
      GraftTable.forPath(s, path).changes(1, 1)
        .select(col("s_suppkey"), col("s_acctbal"), col("_change_type"))
        .orderBy("s_suppkey", "_change_type")
    }),

    // RENAME/DROP COLUMN via name-mode column mapping: metadata-only
    // commits; the re-added column must come back empty (fresh physical
    // name), and an update after the rename must flow through the
    // logical/physical boundary.
    "graft_rename_drop" -> ((s, dir) => {
      val path = tmp("rename")
      Graft.write(t(s, dir, "nation"), path)
      val tb = GraftTable.forPath(s, path)
      tb.renameColumn("n_name", "nation_name")
      tb.dropColumn("n_regionkey")
      tb.addColumn(org.apache.spark.sql.types.StructField(
        "n_regionkey", org.apache.spark.sql.types.IntegerType))
      tb.update(col("n_nationkey") === 0, Map("n_regionkey" -> lit(77)))
      Graft.read(s, path)
        .select("n_nationkey", "nation_name", "n_regionkey")
        .orderBy("n_nationkey")
    }),

    // Same rename/drop/re-add flow under ID-mode mapping: files carry
    // parquet field ids from creation and reads resolve columns by id
    // (the interop mode), so the whole lifecycle must match the same
    // oracle as name mode.
    "graft_rename_drop_id" -> ((s, dir) => {
      val path = tmp("renameid")
      Graft.write(t(s, dir, "nation"), path,
        configuration = Map("graft.columnMapping.mode" -> "id"))
      val tb = GraftTable.forPath(s, path)
      tb.renameColumn("n_name", "nation_name")
      tb.dropColumn("n_regionkey")
      tb.addColumn(org.apache.spark.sql.types.StructField(
        "n_regionkey", org.apache.spark.sql.types.IntegerType))
      tb.update(col("n_nationkey") === 0, Map("n_regionkey" -> lit(77)))
      Graft.read(s, path)
        .select("n_nationkey", "nation_name", "n_regionkey")
        .orderBy("n_nationkey")
    }),

    "graft_schema_evolution" -> ((s, dir) => {
      val path = tmp("evo")
      val n = t(s, dir, "nation")
      Graft.write(n, path)
      Graft.write(
        n.withColumn("n_comment", concat(lit("nation-"), col("n_name"))),
        path, mergeSchema = true)
      Graft.read(s, path)
        .select("n_nationkey", "n_name", "n_comment")
        .orderBy(col("n_nationkey"), col("n_comment").asc_nulls_first)
    }),

    "graft_checkpoint_replay" -> ((s, dir) => {
      val path = tmp("ckpt")
      val li = t(s, dir, "lineitem")
      (1 to 7).foreach(i =>
        Graft.write(li.filter(col("l_linenumber") === i), path,
          configuration = if (i == 1) Map("graft.checkpointInterval" -> "3") else Map.empty))
      graft.log.GraftLog.clearCache()   // force cold reload through checkpoint
      Graft.read(s, path)
        .groupBy("l_linenumber").agg(count(lit(1)).as("n"))
        .orderBy("l_linenumber")
    }),

    // Same replay under V2 checkpoints: the checkpoint is a small
    // manifest (CheckpointMetadata + SidecarFile pointers) with the file
    // actions in sidecar parquet — cold load must reconstruct through
    // manifest, sidecars, and the delta tail.
    "graft_checkpoint_v2" -> ((s, dir) => {
      val path = tmp("ckptv2")
      val li = t(s, dir, "lineitem")
      (1 to 7).foreach(i =>
        Graft.write(li.filter(col("l_linenumber") === i), path,
          configuration = if (i == 1) Map(
            "graft.checkpointInterval" -> "3",
            "graft.checkpointPolicy" -> "v2") else Map.empty))
      graft.log.GraftLog.clearCache()
      Graft.read(s, path)
        .groupBy("l_linenumber").agg(count(lit(1)).as("n"))
        .orderBy("l_linenumber")
    }),

    "graft_convert_parquet" -> ((s, dir) => {
      val path = tmp("convert")
      t(s, dir, "part").write.mode("overwrite").parquet(path)
      Graft.convertFromParquet(s, path).toDF
        .select("p_partkey", "p_name", "p_retailprice")
        .orderBy("p_partkey")
    }),

    // Incremental CONVERT SYNC: convert a hand-authored Delta table, let
    // the "Delta writer" append another commit, sync only the tail.
    "graft_convert_delta_sync" -> ((s, dir) => {
      val path = tmp("cnvsync")
      val part = t(s, dir, "part").select("p_partkey", "p_name")
      def oneFile(df: DataFrame, name: String): Long = {
        val scratch = tmp("cnvsync-sc")
        df.coalesce(1).write.mode("overwrite").parquet(scratch)
        val f = new java.io.File(scratch).listFiles
          .filter(_.getName.endsWith(".parquet")).head
        val dst = new java.io.File(path, name)
        java.nio.file.Files.move(f.toPath, dst.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        dst.length()
      }
      val logDir = new java.io.File(path, "_delta_log"); logDir.mkdirs()
      def writeCommit(v: Long, lines: Seq[String]): Unit =
        java.nio.file.Files.writeString(
          new java.io.File(logDir, f"$v%020d.json").toPath,
          lines.mkString("", "\n", "\n"))
      def addLine(name: String, size: Long) =
        s"""{"add":{"path":"$name","partitionValues":{},"size":$size,""" +
          """"modificationTime":0,"dataChange":true}}"""
      val s1 = oneFile(part.where(col("p_partkey") % 2 === 0), "f1.parquet")
      val schemaJson = new com.fasterxml.jackson.databind.ObjectMapper()
        .writeValueAsString(part.schema.json)
      writeCommit(0, Seq(
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
        s"""{"metaData":{"id":"3b1f2a10-0000-4000-8000-000000000001",""" +
          s""""format":{"provider":"parquet","options":{}},""" +
          s""""schemaString":$schemaJson,"partitionColumns":[],""" +
          """"configuration":{},"createdTime":1700000000000}}""",
        addLine("f1.parquet", s1)))
      Graft.convertFromDelta(s, path)
      val s2 = oneFile(part.where(col("p_partkey") % 2 =!= 0), "f2.parquet")
      writeCommit(1, Seq(addLine("f2.parquet", s2)))
      Graft.syncFromDelta(s, path).toDF
        .select("p_partkey", "p_name").orderBy("p_partkey")
    }),

    "graft_vacuum" -> ((s, dir) => {
      val path = tmp("vacuum")
      Graft.write(t(s, dir, "part"), path)
      val tb = GraftTable.forPath(s, path)
      tb.delete(col("p_size") < 10)
      // 0-retention vacuum for test determinism: explicitly waive the guard
      s.conf.set(graft.commands.VacuumCommand.retentionCheckConf, "false")
      tb.vacuum(retentionHours = 0.0)
      s.conf.set(graft.commands.VacuumCommand.retentionCheckConf, "true")
      Graft.read(s, path)
        .select("p_partkey", "p_size")
        .orderBy("p_partkey")
    }),

    "graft_stream_roundtrip" -> ((s, dir) => {
      val src = tmp("ssrc"); val out = tmp("sout"); val ckpt = tmp("sckpt")
      Graft.write(
        t(s, dir, "events").select("event_id", "user_id", "event_type", "value"),
        src)
      val q = s.readStream.format("graft").load(src)
        .writeStream.format("graft")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start(out)
      q.awaitTermination(300000)
      Graft.read(s, out).orderBy("event_id")
    }),

    "graft_idempotent_write" -> ((s, dir) => {
      val path = tmp("idem")
      val n = t(s, dir, "nation")
      Graft.write(n, path, txnAppId = Some("app"), txnVersion = Some(1L))
      Graft.write(n, path, txnAppId = Some("app"), txnVersion = Some(1L)) // no-op
      Graft.write(n, path, txnAppId = Some("app"), txnVersion = Some(2L))
      Graft.read(s, path)
        .groupBy("n_regionkey").agg(count(lit(1)).as("n"))
        .orderBy("n_regionkey")
    }),

    "graft_truncate" -> ((s, dir) => {
      val path = tmp("trunc")
      Graft.write(t(s, dir, "part"), path)
      GraftTable.forPath(s, path).truncate()
      Graft.write(t(s, dir, "part").filter(col("p_size") < 10), path)
      Graft.read(s, path).select("p_partkey", "p_size").orderBy("p_partkey")
    }),

    "graft_shallow_clone" -> ((s, dir) => {
      val src = tmp("clsrc"); val dst = tmp("cldst") + "/t"
      Graft.write(t(s, dir, "orders"), src)
      GraftTable.forPath(s, src).shallowCloneTo(dst)
      // DML on the clone must not touch the source
      GraftTable.forPath(s, dst).delete(col("o_orderstatus") === "O")
      require(Graft.read(s, src).count() == t(s, dir, "orders").count(),
        "shallow clone delete leaked into the source table")
      Graft.read(s, dst)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    "graft_redirect" -> ((s, dir) => {
      // live-table redirect: the table moved to dst; the OLD path keeps
      // serving queries (reads AND DML) from the destination
      val src = tmp("redirsrc"); val dst = tmp("redirdst")
      val stale = t(s, dir, "supplier").where(col("s_suppkey") <= 3)
      Graft.write(stale, src)
      Graft.write(t(s, dir, "supplier"), dst)
      GraftTable.forPath(s, src).redirectTo(dst)
      GraftTable.forPath(s, src).delete(col("s_suppkey") % 7 === 0)
      val served = Graft.read(s, src)
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
      require(served.count() > stale.count(),
        "redirected read served the stale source slice, not the destination")
      served
    }),

    "graft_redirect_writer_only" -> ((s, dir) => {
      // writer-only redirect: same routing for a redirect-aware engine,
      // but the protocol gates WRITERS only — a legacy reader that knows
      // nothing of redirects may keep reading the frozen source
      val src = tmp("wosrc"); val dst = tmp("wodst")
      val frozen = t(s, dir, "customer").where(col("c_custkey") <= 5)
      Graft.write(frozen, src)
      Graft.write(t(s, dir, "customer"), dst)
      GraftTable.forPath(s, src).redirectToWriterOnly(dst)
      // DML through the public path lands at the destination
      GraftTable.forPath(s, src).delete(col("c_custkey") % 5 === 0)
      val raw = GraftTable.forPathNoRedirect(s, src)
      require(raw.snapshot.protocol.minReaderVersion < 3 &&
        raw.snapshot.protocol.writerFeatureNames.contains("redirectWriterOnly"),
        "writer-only redirect must gate writers, never readers")
      require(raw.toDF.count() == frozen.count(),
        "the frozen source must keep serving legacy readers")
      Graft.read(s, src)
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    }),

    "graft_redirect_rules" -> ((s, dir) => {
      // noRedirectRules per-app exemption (reference TableRedirect.scala
      // :182-268): a rule-named application keeps resolving the frozen
      // SOURCE while the redirect is READY, and may commit exactly the
      // rule-listed operations there.
      val src = tmp("rulsrc"); val dst = tmp("ruldst")
      val frozen = t(s, dir, "supplier").where(col("s_suppkey") <= 20)
      Graft.write(frozen, src)
      Graft.write(t(s, dir, "supplier"), dst)
      GraftTable.forPath(s, src).redirectTo(dst,
        Seq(graft.log.TableRedirect.NoRedirectRule(
          Some("graft-validate"), Set("DELETE"))))
      // a non-matching application is served by the destination
      require(Graft.read(s, src).count() == t(s, dir, "supplier").count(),
        "non-exempt resolution must serve the destination")
      s.conf.set("spark.app.name", "graft-validate")
      try {
        // the exempt application resolves the frozen source; its
        // rule-listed DELETE commits there (anything else would refuse)
        GraftTable.forPath(s, src).delete(col("s_suppkey") % 2 === 0)
        Graft.read(s, src)
          .select("s_suppkey", "s_name", "s_acctbal")
          .orderBy("s_suppkey")
      } finally s.conf.unset("spark.app.name")
    }),

    "sql_show_partitions" -> ((s, dir) => {
      val path = tmp("showpart")
      Graft.write(t(s, dir, "nation"), path, partitionBy = Seq("n_regionkey"))
      s.sql(s"SHOW PARTITIONS graft.`$path`")
        .select(element_at(col("partitionValues"), "n_regionkey")
          .cast("int").as("n_regionkey"))
        .orderBy("n_regionkey")
    }),

    "graft_generated_read" -> ((s, dir) => {
      val path = tmp("gencol")
      val o = t(s, dir, "orders")
      // base columns take the parquet-inferred types (timestamp vs
      // timestamp_ntz differs by session), plus one generated column
      Graft.create(s, path, org.apache.spark.sql.types.StructType(
        o.select("o_orderkey", "o_orderdate").schema.fields :+
          graft.schema.ColumnDefaults.generatedField("o_year",
            org.apache.spark.sql.types.IntegerType, "year(o_orderdate)")))
      // the generated column is NOT in the input; the write computes it
      Graft.write(o.select("o_orderkey", "o_orderdate"), path)
      Graft.read(s, path).orderBy("o_orderkey")
    }),

    "graft_identity_read" -> ((s, dir) => {
      val path = tmp("idcol")
      Graft.create(s, path, org.apache.spark.sql.types.StructType(Seq(
        graft.schema.ColumnDefaults.identityField("rid", start = 5, step = 5),
        org.apache.spark.sql.types.StructField("n_name",
          org.apache.spark.sql.types.StringType))))
      // single input partition -> ids are the consecutive lattice values
      // 5, 10, ... regardless of row order, so sorted output is stable
      Graft.write(t(s, dir, "nation").select("n_name").coalesce(1), path)
      Graft.read(s, path).select("rid").orderBy("rid")
    }),

    "graft_column_defaults" -> ((s, dir) => {
      val path = tmp("defcol")
      Graft.create(s, path, org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        graft.schema.ColumnDefaults.defaultField("source",
          org.apache.spark.sql.types.StringType, "'seed'"))))
      // omitted column -> creation-time default fills
      Graft.write(t(s, dir, "nation")
        .select(col("n_nationkey").cast("long").as("id")), path)
      // defaults are re-assignable; later appends take the new one
      GraftTable.forPath(s, path).alterColumnDefault("source", Some("'late'"))
      Graft.write(t(s, dir, "region")
        .select((col("r_regionkey").cast("long") + 100).as("id")), path)
      Graft.read(s, path).orderBy("id")
    }),

    "graft_auto_compact" -> ((s, dir) => {
      val path = tmp("autoc")
      val li = t(s, dir, "lineitem").filter(col("l_linenumber") <= 2)
      Graft.write(li.filter(col("l_linenumber") === 1), path,
        configuration = Map("graft.autoCompact" -> "true",
          "graft.autoCompact.minNumFiles" -> "4"))
      Graft.write(li.filter(col("l_linenumber") === 2), path)
      val files = graft.log.GraftLog.forTable(s, path).update().numFiles
      require(files <= 4, s"auto compact left $files files")
      Graft.read(s, path)
        .groupBy("l_linenumber").agg(count(lit(1)).as("n"))
        .orderBy("l_linenumber")
    }),

    "graft_metadata_only_agg" -> ((s, dir) => {
      val path = tmp("metaagg")
      Graft.write(t(s, dir, "lineitem"), path)
      // answered from per-file stats; the plan audit suite asserts no scan
      Graft.read(s, path).agg(
        count(lit(1)).as("n"),
        min(col("l_quantity")).cast("double").as("min_qty"),
        max(col("l_quantity")).cast("double").as("max_qty"))
    }))

  // ==========================================================================
  // Training-data pipeline operators (dedup / similarity / text / multimodal)
  // ==========================================================================

  private val pipeline: Map[String, (SparkSession, String) => DataFrame] = Map(
    // All per-document scalar signals as ONE wide projection (token/BPE
    // counts, quality, language id, entropy, repetition fractions) plus
    // the fingerprint determinism/sensitivity invariants — one row per
    // doc, every text kernel oracle-checked as a column. Folded from six
    // single-signal queries to keep the declared set under the driver's
    // 100-entry cap; at 100 TB this is also the shape a curation pass
    // actually runs (one scan, many codegen'd signal columns).
    "text_signals" -> ((s, dir) => {
      import graft.text.TextFunctions.{dupTokenFrac, topNgramFrac}
      val d = t(s, dir, "documents").select("doc_id", "text")
      val signals = d.select(
        col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        bpeTokenCount(col("text")).as("n_bpe"),
        length(col("text")).as("n_chars_calc"),
        qualityScore(col("text")).as("quality"),
        langId(col("text")).as("lang_pred"),
        round(charEntropy(col("text")), 4).as("entropy"),
        dupTokenFrac(col("text")).as("dup_word_frac"),
        topNgramFrac(col("text"), 1).as("top_word_frac"),
        topNgramFrac(col("text"), 2).as("top_bigram_frac"))
      val variants = d
        .withColumn("copy_fp", docFingerprint(col("text")))
        .withColumn("pert_fp", docFingerprint(concat(col("text"), lit(" zzz"))))
        .withColumn("fp", docFingerprint(col("text")))
      val sim = Dedup.simHashes(d, col("doc_id"), col("text"))
        .select(col("id").as("doc_id"), col("fp").as("sim1"))
      val simCopy = Dedup.simHashes(
        d.select((col("doc_id") + 100000).as("doc_id"), col("text")),
        col("doc_id"), col("text"))
        .select((col("id") - 100000).as("doc_id"), col("fp").as("sim2"))
      val fps = variants.join(sim, "doc_id").join(simCopy, "doc_id")
        .select(col("doc_id"),
          (col("fp") === col("copy_fp")).as("fp_deterministic"),
          (col("fp") =!= col("pert_fp")).as("fp_sensitive"),
          (col("sim1") === col("sim2")).as("simhash_deterministic"))
      signals.join(fps, "doc_id").orderBy("doc_id")
    }),

    // Gopher repetition filter bank (line-grain dup fractions + n-gram
    // character coverage), one kernel pass per document. Documents are
    // synthesized with planted line structure (a boilerplate header and a
    // twice-repeated preview line) so the line signals vary with content
    // while staying fully deterministic.
    "text_repetition" -> ((s, dir) => {
      import graft.text.TextFunctions.repetitionProfile
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val page = concat_ws("\n",
        lit("BOILERPLATE HEADER LINE"),
        substring(col("text"), 1, 40),
        col("text"),
        substring(col("text"), 1, 40))
      d.select(col("doc_id"), repetitionProfile(page).as("p"))
        .select(col("doc_id"),
          round(col("p.dup_line_frac"), 6).as("dup_line_frac"),
          round(col("p.dup_line_char_frac"), 6).as("dup_line_char_frac"),
          round(col("p.top_2gram_char_frac"), 6).as("top_2gram_char_frac"),
          round(col("p.top_3gram_char_frac"), 6).as("top_3gram_char_frac"),
          round(col("p.top_4gram_char_frac"), 6).as("top_4gram_char_frac"),
          round(col("p.dup_5gram_char_frac"), 6).as("dup_5gram_char_frac"),
          round(col("p.dup_10gram_char_frac"), 6).as("dup_10gram_char_frac"))
        .orderBy("doc_id")
    }),

    // Fingerprint values are 64-bit hashes DuckDB cannot reproduce, so the
    // query emits the oracle-checkable INVARIANTS instead: a fingerprint is
    // deterministic (identical text -> identical fp, for both the rolling
    // hash and the simhash) and content-sensitive (appended token -> new fp).
    // CCNet-style LM quality scoring: a Laplace-smoothed bigram model
    // trains on the doc_id % 5 == 0 slice, every document scores by
    // cross-entropy under it. Pure count arithmetic over deterministic
    // tokenization -> exactly reproducible in SQL; the log-space value
    // rounds at 6 places (summation-order float error ~1e-13, five
    // orders below the rounding grain).
    "text_lm_perplexity" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val model = graft.text.NgramLm.train(
        docs.where(col("doc_id") % 5 === 0), col("text"))
      val out = graft.text.NgramLm.crossEntropy(
          docs, col("doc_id"), col("text"), model)
        .select(col("doc_id"), col("n_bigrams"),
          round(col("cross_entropy"), 6).as("cross_entropy"),
          round(col("ppl"), 2).as("ppl"))
        .orderBy("doc_id")
      model.unpersist() // aggregates recompute inside the query plan; no
      // cached state leaks across the bench's repeated invocations
      out
    }),

    "text_termstats" -> ((s, dir) => {
      graft.text.TextFunctions.termStats(
        t(s, dir, "documents"), col("doc_id"), col("text"), topK = 3)
        .orderBy("doc_id", "term")
    }),

    // Plant contaminated training docs (benchmark text embedded behind a
    // prefix) the way the other dedup queries plant near-dups: every doc
    // whose id % 97 == 0 becomes a benchmark item, and a +200000-id train
    // copy carries its text — so each planted copy must surface with a
    // deterministic shared-gram count, and (at this corpus) no natural
    // doc shares an 8-gram with the benchmark.
    "dedup_decontaminate" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val bench = d.where(col("doc_id") % 97 === 0)
        .select(col("doc_id"), col("text"))
      val planted = bench.select((col("doc_id") + 200000).as("doc_id"),
        concat(lit("copied: "), col("text")).as("text"))
      val train = d.where(col("doc_id") % 97 =!= 0)
        .select("doc_id", "text").unionByName(planted)
      Dedup.decontaminate(train, bench, col("doc_id"), col("text"), n = 8)
        .orderBy("doc_id")
    }),

    // Bloom-filter decontamination (the sketch path of
    // dedup_decontaminate, for held-out sets too big to broadcast
    // exactly): same planted-contamination scheme. A Bloom filter admits
    // NO false negatives, so every planted copy MUST flag; the output
    // restricts to the planted ids, whose flags are certain. Natural-doc
    // false positives (impl-specific, rate ~fpp) stay outside the oracle
    // row set and are bounded separately in MlSuite. Bench docs under 8
    // tokens are excluded: their whole-text shingle would not survive
    // the 'copied: ' prefix.
    "dedup_bloom_decontaminate" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val longEnough =
        graft.text.TextFunctions.tokenCount(col("text")) >= 8
      val bench = d.where(col("doc_id") % 97 === 0 && longEnough)
        .select(col("doc_id"), col("text"))
      val planted = bench.select((col("doc_id") + 200000).as("doc_id"),
        concat(lit("copied: "), col("text")).as("text"))
      val train = d.where(col("doc_id") % 97 =!= 0)
        .select("doc_id", "text").unionByName(planted)
      Dedup.decontaminateBloom(train, bench, col("doc_id"), col("text"), n = 8)
        .where(col("doc_id") >= 200000)
        .select(col("doc_id"), (col("n_hit_grams") > 0).as("flagged"))
        .orderBy("doc_id")
    }),

    "dedup_exact" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val doubled = d.unionByName(
        d.withColumn("doc_id", col("doc_id") + 100000))
      Dedup.exact(doubled, md5(col("text")), col("doc_id"))
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    }),

    // Exact duplicate-substring spans (Lee et al. ExactSubstr re-expressed
    // as distributed positional gram counting): every doc_id % 37 == 0
    // document donates its first 30 tokens as a planted boilerplate doc,
    // so the donor's prefix and the plant both carry duplicated 15-gram
    // runs; natural corpus repeats surface identically on both sides.
    // Deterministic integer arithmetic end to end -> exact hash match.
    "dedup_substring" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val planted = d.where(col("doc_id") % 37 === 0)
        .select((col("doc_id") + 300000).as("doc_id"),
          array_join(slice(graft.text.TextFunctions.tokens(col("text")),
            1, 30), " ").as("text"))
      Dedup.duplicateSpans(
          d.select("doc_id", "text").unionByName(planted),
          col("doc_id"), col("text"), window = 15)
        .orderBy("doc_id", "span_start")
    }),

    // End-to-end ExactSubstr: the spans found above are DROPPED — flagged
    // token ranges removed, text rebuilt from survivors — so the operator
    // is usable as a pipeline stage, not just a report. Digest + token
    // counts hash-match a pure-SQL re-derivation of the same drop.
    "dedup_substring_drop" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val planted = d.where(col("doc_id") % 37 === 0)
        .select((col("doc_id") + 300000).as("doc_id"),
          array_join(slice(graft.text.TextFunctions.tokens(col("text")),
            1, 30), " ").as("text"))
      val corpus = d.select("doc_id", "text").unionByName(planted)
      val spans = Dedup.duplicateSpans(
        corpus, col("doc_id"), col("text"), window = 15)
      Dedup.dropSpans(corpus, col("doc_id"), col("text"), spans)
        .select(col("doc_id"), col("n_tokens_kept"),
          col("n_tokens_dropped"), md5(col("text")).as("digest"))
        .orderBy("doc_id")
    }),

    // Plant EXACT duplicates and emit the planted pairs the LSH surfaced:
    // identical text -> identical signature -> guaranteed band collision,
    // so recall of the planted set is deterministic and the oracle is
    // simply "every doc pairs with its copy". A broken hash, band, or
    // threshold anywhere in the pipeline breaks the match.
    "dedup_minhash_lsh" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val dup = d.select((col("doc_id") + 100000).as("doc_id"), col("text"))
      val all = d.select("doc_id", "text").unionByName(dup)
      Dedup.minHashPairs(all, col("doc_id"), col("text"),
        numHashes = 64, bands = 8, shingleSize = 4, threshold = 0.5)
        .where(col("idB") === col("idA") + 100000)
        .select("idA", "idB")
        .orderBy("idA", "idB")
    }),

    // Continuous-ingestion dedup: corpus -> persisted LSH index (two graft
    // tables), then a NEW batch joins only against the index — planted
    // exact duplicates (doc_id+100000) must flag dup, synthetic novel
    // docs (doc_id+200000, disjoint shingles) must not. The batch also
    // APPENDS to the index; time-travel pinning keeps the result computed
    // against the pre-append state.
    "dedup_incremental_index" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val idx = tmp("mhidx")
      Dedup.buildMinHashIndex(d, col("doc_id"), col("text"), idx)
      val dup = d.select((col("doc_id") + 100000).as("doc_id"), col("text"))
      val novel = d.select((col("doc_id") + 200000).as("doc_id"),
        concat(lit("zq"), col("doc_id"), lit("a zq"), col("doc_id"),
          lit("b zq"), col("doc_id"), lit("c zq"), col("doc_id"),
          lit("d zq"), col("doc_id"), lit("e")).as("text"))
      Dedup.dedupAgainstIndex(dup.unionByName(novel),
        col("doc_id"), col("text"), idx, updateIndex = true)
        .select(col("id").as("doc_id"), col("is_dup"))
        .orderBy("doc_id")
    }),

    // Continuous-ingestion EMBEDDING dedup: corpus -> persisted band-key
    // index (two graft tables), then a NEW batch joins only the touched
    // buckets. Positive scalings (x1.0001, vec_id+100000) keep every
    // band's sign bits identical -> dup; negations (x-1, vec_id+200000)
    // have cosine -1 -> not dup even when buckets collide. The batch also
    // APPENDS to the index; time-travel pinning keeps the result computed
    // against the pre-append state.
    "dedup_embedding_index" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val idx = tmp("embidx")
      Dedup.buildEmbeddingIndex(e, col("vec_id"), col("embedding"), idx,
        threshold = 0.999)
      val dup = e.select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), v => v * 1.0001f).as("embedding"))
      val novel = e.select((col("vec_id") + 200000).as("vec_id"),
        transform(col("embedding"), v => v * -1.0f).as("embedding"))
      Dedup.dedupEmbeddingsAgainstIndex(dup.unionByName(novel),
        col("vec_id"), col("embedding"), idx, threshold = 0.999,
        updateIndex = true)
        .select(col("id").as("vec_id"), col("is_dup"))
        .orderBy("vec_id")
    }),

    // Quality-aware survivor selection over planted exact-duplicate
    // pairs: quality = doc_id % 7, and 100000 % 7 = 5, so each planted
    // pair's two members always have DIFFERENT quality — the keeper is
    // exactly the higher-quality member, fully SQL-derivable.
    "dedup_keep_best" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val dup = d.select((col("doc_id") + 100000).as("doc_id"), col("text"))
      val all = d.select("doc_id", "text").unionByName(dup)
      val pairs = Dedup.minHashPairs(all, col("doc_id"), col("text"),
        numHashes = 64, bands = 8, shingleSize = 4, threshold = 0.5)
        .where(col("idB") === col("idA") + 100000)
        .select("idA", "idB")
      graft.ml.Clustering.keepBest(all, col("doc_id"),
          pmod(col("doc_id"), lit(7)), pairs)
        .select(col("id").as("doc_id"), col("component"), col("keep"))
        .orderBy("doc_id")
    }),

    // Same planted-exact-duplicate scheme as dedup_minhash_lsh: identical
    // text -> identical fingerprint -> hamming 0 in every band.
    "dedup_simhash" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val dup = d.select((col("doc_id") + 100000).as("doc_id"), col("text"))
      val all = d.select("doc_id", "text").unionByName(dup)
      Dedup.simHashPairs(all, col("doc_id"), col("text"), maxHamming = 3)
        .where(col("idB") === col("idA") + 100000)
        .select(col("idA"), col("idB"), col("hamming").cast("int").as("hamming"))
        .orderBy("idA", "idB")
    }),

    // Near-duplicate planting with EXACT-Jaccard verification: candidate
    // recall for true-J >= 0.8 pairs is 1 - (1-0.8^2)^32 ~ certainty (see
    // Dedup.ngramJaccardPairs), so the output equals DuckDB's exact
    // cross-product Jaccard over the same shingle definition.
    "dedup_ngram_jaccard" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val perturbed = d.select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" q")).as("text"))
      val all = d.select("doc_id", "text").unionByName(perturbed)
      Dedup.ngramJaccardPairs(all, col("doc_id"), col("text"), n = 3,
        threshold = 0.8)
        .select("idA", "idB")
        .orderBy("idA", "idB")
    }),

    // Jittered copies are positive scalings (cosine exactly 1), so every
    // band's sign-bit signature is IDENTICAL for the pair — any single
    // band match suffices and every planted pair is found
    // deterministically regardless of the band count.
    "dedup_embedding" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val jittered = e.select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), v => v * 1.0001f).as("embedding"))
      val all = e.select("vec_id", "embedding").unionByName(jittered)
      Dedup.embeddingPairs(all, col("vec_id"), col("embedding"),
        threshold = 0.999)
        .where(col("idB") === col("idA") + 100000)
        .select("idA", "idB")
        .orderBy("idA", "idB")
    }),

    // SemDeDup: k-means buckets the space, within-cluster cosine >= 0.999
    // finds the planted jittered copies (scale-invariant cosine puts a
    // copy in its original's cluster), min-id survives per family — so
    // exactly the planted ids flag as duplicates.
    "dedup_semantic" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val jittered = e.select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), v => v * 1.0001f).as("embedding"))
      val all = e.select("vec_id", "embedding").unionByName(jittered)
      // maxClusterSize pinned well above any SF this harness runs: the
      // library default (10k) is a scale guard, but a skipped cluster
      // here would null is_dup and break the strict boolean oracle.
      graft.ml.Dedup.semanticDedup(all, col("vec_id"), col("embedding"),
        k = 8, threshold = 0.999, maxIter = 3, maxClusterSize = 10000000)
        .select(col("id"), col("is_dup"))
        .orderBy("id")
    }),

    "ann_bruteforce" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val queries = e.filter(col("vec_id") < 5)
      Similarity.bruteForceTopK(
        e, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"), k = 5)
        .select(col("qid"), col("rank"), col("cid"))
        .orderBy("qid", "rank")
    }),

    // LSH candidate sets are not SQL-expressible, so plant true near
    // neighbors (jittered copies of the query vectors, cosine ~1) in the
    // corpus: the LSH top-2 for each query must be {self, jittered self}
    // (everything else is near-orthogonal random data), and multi-probe
    // (the ANN path keeps the single-signature + 1-bit-probe design)
    // guarantees the jittered copy is a candidate even if float rounding
    // flips one hyperplane sign. The output set is fully deterministic.
    "ann_lsh" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val queries = e.filter(col("vec_id") < 10)
      val planted = queries.select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), v => v * 1.0001f).as("embedding"))
      val corpus = e.select("vec_id", "embedding").unionByName(planted)
      Similarity.lshTopK(
        corpus, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"), k = 2, planes = 8)
        .select("qid", "cid")
        .orderBy("qid", "cid")
    }),

    // IVF-Flat with the same planted-neighbor oracle scheme as ann_lsh:
    // the jittered copy shares the query's own nearest centroid (cosine
    // is scale-invariant), which is always within the nprobe probe set.
    "ann_ivf" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val queries = e.filter(col("vec_id") < 10)
      val planted = queries.select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), v => v * 1.0001f).as("embedding"))
      val corpus = e.select("vec_id", "embedding").unionByName(planted)
      Similarity.ivfTopK(
        corpus, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"), k = 2, nlist = 32, nprobe = 8)
        .select("qid", "cid")
        .orderBy("qid", "cid")
    }),

    // Streaming dedup: state-backed dropDuplicates between a graft source
    // and a graft sink — the incremental twin of dedup_exact. Output is
    // digest-only so the arbitrary survivor choice cannot affect the hash.
    "stream_dedup" -> ((s, dir) => {
      val src = tmp("sdsrc"); val out = tmp("sdout"); val ckpt = tmp("sdckpt")
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      Graft.write(d.unionByName(
        d.select((col("doc_id") + 100000).as("doc_id"), col("text"))), src)
      // Bounded-state dedup: watermark + dropDuplicatesWithinWatermark is
      // THE pattern to copy at a real 100x stream (plain dropDuplicates
      // keeps every digest forever). The fixture's event time is a single
      // instant so the within-watermark guarantee covers every duplicate
      // and the result stays exactly DISTINCT for the oracle; a live
      // pipeline uses its real event-time column and accepts re-emits
      // beyond the delay in exchange for evictable state.
      val q = s.readStream.format("graft").load(src)
        .select(md5(col("text")).as("digest"),
          timestamp_seconds(lit(1700000000L)).as("event_time"))
        .withWatermark("event_time", "10 minutes")
        .dropDuplicatesWithinWatermark("digest")
        .select("digest")
        .writeStream.format("graft")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start(out)
      q.awaitTermination(300000)
      Graft.read(s, out).orderBy("digest")
    }),

    // Corpus curation: deterministic split / per-source cap / token-
    // budget shard packing — the post-dedup bookkeeping of a training
    // pipeline, each a projection or single window pass.
    "pipeline_split" -> ((s, dir) => {
      graft.ml.Curation.deterministicSplit(
          t(s, dir, "documents"), col("doc_id"))
        .groupBy("split").agg(count(lit(1)).as("n"))
        .orderBy("split")
    }),

    "pipeline_group_cap" -> ((s, dir) => {
      graft.ml.Curation.capPerGroup(
          t(s, dir, "documents"), col("source"),
          Seq(col("n_chars").desc, col("doc_id")), k = 3)
        .select("doc_id", "source", "n_chars")
        .orderBy("source", "doc_id")
    }),

    "pipeline_pack_shards" -> ((s, dir) => {
      graft.ml.Curation.packShards(
          t(s, dir, "documents"), col("lang"), col("doc_id"),
          col("n_chars"), budget = 50000L)
        .groupBy("lang", "shard")
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
        .orderBy("lang", "shard")
    }),

    "pipeline_chunk" -> ((s, dir) => {
      // 64-token windows advancing by 48 (16-token overlap); md5 of the
      // joined chunk makes the full content oracle-checkable without
      // hauling chunk text through the compare.
      graft.ml.Curation.chunk(
          t(s, dir, "documents"), col("text"), size = 64, stride = 48)
        .select(col("doc_id"), col("chunk_id"),
          size(col("chunk")).as("n_words"),
          md5(concat_ws(" ", col("chunk"))).as("chunk_md5"))
        .orderBy("doc_id", "chunk_id")
    }),

    // GPT-style concat-and-chunk sequence packing: every document's
    // tokens on ONE global stream in doc_id order, cut every 512 tokens;
    // a document can span a sequence boundary and a sequence holds
    // slices of several documents. The (doc x seq) assignment table is
    // pure integer arithmetic over running token offsets — the Spark
    // side computes it with a two-phase distributed prefix sum (never a
    // single-partition global window), the oracle with one window
    // cumsum + generate_series.
    "pipeline_pack_sequences" -> ((s, dir) => {
      graft.ml.Curation.packSequences(
          t(s, dir, "documents"),
          col("doc_id"), graft.text.TextFunctions.tokenCount(col("text")),
          seqLen = 512L, buckets = 32)
        .orderBy("doc_id", "seq_id")
    }),

    // Streaming MERGE upsert (the foreachBatch CDC-apply pattern): the
    // event stream splits into multiple microbatches (maxFilesPerTrigger),
    // each batch pre-aggregates per user and MERGEs into a running
    // per-user rollup — matched rows accumulate, new users insert. The
    // final state is batch-split-invariant (exact decimal sums), so the
    // oracle is a plain one-shot aggregate of the whole event table.
    "stream_merge_upsert" -> ((s, dir) => {
      val src = tmp("smsrc"); val tgt = tmp("smtgt"); val ckpt = tmp("smckpt")
      val ev = t(s, dir, "events").select("event_id", "user_id", "value")
      Graft.write(ev.repartition(8), src)
      def rollup(df: DataFrame) = df.groupBy("user_id").agg(
        sum(col("value").cast("decimal(18,6)")).cast("decimal(38,6)").as("total"),
        count(lit(1)).as("n_events"))
      Graft.write(rollup(ev.limit(0)), tgt)
      val q = s.readStream.format("graft")
        .option("maxFilesPerTrigger", "2").load(src)
        .writeStream
        .foreachBatch { (batch: Dataset[Row], _: Long) =>
          GraftTable.forPath(s, tgt)
            .merge(rollup(batch.toDF()), expr("t.user_id = s.user_id"))
            .whenMatched().update(Map(
              "total" -> expr("CAST(t.total + s.total AS DECIMAL(38,6))"),
              "n_events" -> expr("t.n_events + s.n_events")))
            .whenNotMatched().insertAll()
            .execute()
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(300000)
      Graft.read(s, tgt)
        .select(col("user_id"), round(col("total"), 4).cast("double").as("total"),
          col("n_events"))
        .orderBy("user_id")
    }),

    // Watermarked tumbling-window aggregation over the streaming source:
    // event-time windows + a watermark, emitted Complete-mode into the
    // graft sink. Bounded input + AvailableNow makes the final state
    // deterministic, so the oracle is the equivalent batch day-rollup.
    "stream_windowed_agg" -> ((s, dir) => {
      val src = tmp("swsrc"); val out = tmp("swout"); val ckpt = tmp("swckpt")
      val ev = t(s, dir, "events")
        .select(col("ts").cast("timestamp").as("ts"),
          col("event_type"), col("value"))
      Graft.write(ev.repartition(4), src)
      // Complete mode rewrites the WHOLE result per micro-batch, so the
      // bench cost is (batches x state shuffle x full rewrite): size the
      // state store to the stream and keep the batch count at 2 — still
      // exercising multi-batch state accumulation, not fixed overhead.
      val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      try {
      val q = s.readStream.format("graft")
        .option("maxFilesPerTrigger", "2").load(src)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("decimal(38,6)")
            .as("sv"))
        .select(col("window.start").as("day_start"), col("event_type"),
          col("n"), col("sv"))
        .writeStream.format("graft")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start(out)
      q.awaitTermination(300000)
      } finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      Graft.read(s, out)
        .select(to_date(col("day_start")).as("day"), col("event_type"),
          col("n"), round(col("sv"), 4).cast("double").as("sum_value"))
        .orderBy("day", "event_type")
    }),

    // Custom streaming state via mapGroupsWithState: per-user running
    // (count, max, min) — all order-independent accumulators, so the
    // final state is deterministic regardless of file admission order.
    // Update-mode output lands in a graft table through a foreachBatch
    // MERGE (the update-mode bridge the sink itself doesn't take).
    "stream_stateful_agg" -> ((s, dir) => {
      import s.implicits._
      val src = tmp("sfsrc"); val tgt = tmp("sftgt"); val ckpt = tmp("sfckpt")
      val ev = t(s, dir, "events").select("user_id", "value")
      Graft.write(ev.repartition(4), src)
      Graft.write(ev.limit(0).select(col("user_id"),
        lit(0L).as("n_events"), col("value").as("max_value"),
        col("value").as("min_value")).limit(0), tgt)
      // State-store task count follows shuffle.partitions at stream start;
      // size it to the stream (15 distinct users), not the session-wide 32
      // — a 32-partition state store per micro-batch benches fixed
      // overhead, not the operator. Restored after the stream finishes.
      val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      try {
      val q = s.readStream.format("graft")
        .option("maxFilesPerTrigger", "2").load(src)
        .select("user_id", "value").as[(Long, Double)]
        .groupByKey(_._1)
        .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
          (uid: Long, rows: Iterator[(Long, Double)],
           st: GroupState[(Long, Double, Double)]) =>
            val vs = rows.map(_._2).toArray
            val (n0, mx0, mn0) = st.getOption
              .getOrElse((0L, Double.NegativeInfinity, Double.PositiveInfinity))
            val upd = (n0 + vs.length, math.max(mx0, vs.max),
              math.min(mn0, vs.min))
            st.update(upd)
            (uid, upd._1, upd._2, upd._3)
        }
        .toDF("user_id", "n_events", "max_value", "min_value")
        .writeStream.outputMode("update")
        .foreachBatch { (batch: Dataset[Row], _: Long) =>
          GraftTable.forPath(s, tgt)
            .merge(batch.toDF(), expr("t.user_id = s.user_id"))
            .whenMatched().updateAll()
            .whenNotMatched().insertAll()
            .execute()
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(300000)
      } finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      Graft.read(s, tgt)
        .select("user_id", "n_events", "max_value", "min_value")
        .orderBy("user_id")
    }),

    // The full curation tail as ONE composed plan: exact dedup ->
    // length filter -> deterministic split -> token-budget shard
    // packing -> shard manifest. Exercises operator composition (the
    // oracle recomputes the whole chain in chained CTEs).
    "pipeline_end_to_end" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val deduped = Dedup.exact(docs, md5(col("text")), col("doc_id"))
      val filtered = deduped.where(col("n_chars").between(100, 550))
      val split = graft.ml.Curation.deterministicSplit(filtered, col("doc_id"))
      val packed = graft.ml.Curation.packShards(split,
        concat_ws("|", col("lang"), col("split")), col("doc_id"),
        col("n_chars"), budget = 20000L)
      packed.groupBy("lang", "split", "shard")
        .agg(count(lit(1)).as("n"), sum("n_chars").cast("long").as("chars"))
        .orderBy("lang", "split", "shard")
    }),

    // Stratified hash sampling: per-language keep rates as a pure
    // arithmetic filter — reproducible on any engine from the formula.
    "pipeline_sample_stratified" -> ((s, dir) => {
      graft.ml.Curation.stratifiedHashSample(
          t(s, dir, "documents"), col("doc_id"), col("lang"),
          Map("en" -> 100, "de" -> 300), defaultPermille = 500)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    }),

    // Mixture weights are powers of two, so every budget computation
    // (T_s / p_s, floor(p_s * N)) is IEEE-exact on both engines and the
    // oracle can recompute the budgets from scratch in SQL.
    "pipeline_mixture" -> ((s, dir) => {
      graft.ml.Curation.mixtureSample(
          t(s, dir, "documents"), col("doc_id"), col("source"),
          col("n_chars"),
          Map("src0" -> 0.5, "src1" -> 0.25,
            "src2" -> 0.125, "src3" -> 0.125))
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    }),

    // PII scrubbing over text with PLANTED pii (synthetic docs carry
    // none): an email, an IPv4, and a 9-digit account number derived
    // from doc_id are appended, scrubbed, and the result hashed — a
    // broken pattern or replacement order changes the digest.
    "pipeline_pii_scrub" -> ((s, dir) => {
      val planted = concat(col("text"),
        lit(" contact u"), col("doc_id"), lit("@ex.com ip 10.1.2."),
        pmod(col("doc_id"), lit(256)), lit(" acct "),
        lpad(col("doc_id").cast("string"), 9, "0"))
      t(s, dir, "documents").select(
          col("doc_id"),
          md5(graft.text.TextFunctions.scrubPii(planted)).as("scrub_md5"))
        .orderBy("doc_id")
    }),

    // URL-keyed dedup (RefinedWeb-style pre-dedup): synthetic URLs with
    // mixed case, tracking params, unsorted query order, trailing slash
    // and a fragment — doc_ids sharing (source, id%40, id%3, id%2)
    // collapse to one canonical key; the lowest doc_id survives.
    "pipeline_url_dedup" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val urls = d.select(col("doc_id"),
        concat(lit("HTTPS://Example.COM/"), col("source"), lit("/Page"),
          pmod(col("doc_id"), lit(40)),
          lit("/?utm_source=feed&b="), pmod(col("doc_id"), lit(3)),
          lit("&a="), pmod(col("doc_id"), lit(2)), lit("#frag")).as("url"))
      Dedup.exact(
          urls.withColumn("canonical_url",
            graft.text.TextFunctions.canonicalizeUrl(col("url"))),
          col("canonical_url"), col("doc_id"))
        .select("doc_id", "canonical_url")
        .orderBy("doc_id")
    }),

    "pipeline_vocab_topk" -> ((s, dir) => {
      graft.text.TextFunctions.vocabTopK(
        t(s, dir, "documents"), col("doc_id"), col("text"), k = 100)
    }),

    // K-means assignment step against a deterministic centroid set (the
    // 8 lowest vec_ids): exercises the broadcast-matrix argmax kernel;
    // the oracle recomputes every cosine in SQL.
    "cluster_kmeans_assign" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val cents = e.orderBy("vec_id").limit(8)
        .select("vec_id", "embedding").collect()
      val vecIds = cents.map(_.getLong(0))
      val matrix = cents.map(_.getSeq[Float](1))
      e.select(col("vec_id"),
          element_at(typedLit(vecIds),
            graft.ml.Clustering.assign(e, col("embedding"), matrix) + 1)
            .as("cluster_id"))
        .orderBy("vec_id")
    }),

    // Near-dup clusters: connected components over a two-key overlap
    // graph (shared 100-char prefix OR shared 100-char suffix — the
    // union is what makes components non-trivially transitive). The
    // oracle recomputes the fixpoint with a recursive CTE.
    "dedup_clusters" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val keys = d.select(col("doc_id"),
          substring(col("text"), 1, 100).as("k"))
        .unionByName(d.select(col("doc_id"),
          col("text").substr(
            greatest(lit(1), length(col("text")) - 99), lit(100)).as("k")))
      val mins = keys.groupBy("k").agg(min("doc_id").as("v"))
      val star = keys.join(mins, "k")
        .where(col("doc_id") =!= col("v"))
        .select(col("doc_id").as("u"), col("v"))
      val comps = graft.ml.Clustering.dedupClusters(star)
      d.join(comps, d("doc_id") === comps("id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("component"))
        .orderBy("doc_id")
    }),

    // Multimodal media ids ride the documents table so the DuckDB oracle
    // can re-derive the metadata (plain-arithmetic widths/durations) and
    // independently verify the resize math, frame cadence, and decode
    // invariants — the codec itself stays the loudly-marked stub.
    // Decode invariants + resize metadata in one row per media item
    // (folded from two single-facet queries; the stubbed featurizer's
    // determinism/range plus the real fit-box arithmetic, joined).
    "multimodal_transform" -> ((s, dir) => {
      val media = Multimodal.mediaFromIds(
        t(s, dir, "documents").where(col("doc_id") < 200)
          .select(col("doc_id").as("id")))
      val a = Multimodal.decodePartitioned(media, dims = 8)
      // same decode under a different physical partitioning: features
      // must be identical (determinism is the decode contract)
      val b = Multimodal.decodePartitioned(media.repartition(7), dims = 8)
        .select(col("media_id"), col("features").as("features_b"))
      val dec = a.join(b, "media_id")
        .select(col("media_id"), col("kind"),
          (size(col("features")) === 8).as("n_dims_ok"),
          forall(col("features"),
            x => x >= -1.0f && x < 1.0f).as("in_range"),
          (col("features") === col("features_b")).as("deterministic"))
      val rz = Multimodal.resize(media, maxW = 256, maxH = 256)
        .select(col("media_id"),
          col("meta.width").cast("long").as("width"),
          col("meta.height").cast("long").as("height"))
      // frame sampling rides the same row (video media only; left join
      // null-fills the rest) — one query certifies the whole stub
      // decode / resize / frame-sample plumbing
      val fr = Multimodal.sampleFrames(
        Multimodal.mediaFromIds(
          t(s, dir, "documents").where(col("doc_id") < 60)
            .select(col("doc_id").as("id"))), everyMs = 10000)
        .groupBy("media_id").agg(count(lit(1)).as("n_frames"))
      dec.join(rz, "media_id").join(fr, Seq("media_id"), "left")
        .orderBy("media_id")
    }),

    "multimodal_bmp_roundtrip" -> ((s, dir) => {
      // REAL codec end-to-end: synthesize genuine 24-bpp BMP bytes, parse
      // the header back, walk the pixel rows for channel sums, resize
      // through the pixel array with integer nearest-neighbor, decode the
      // resized payload again. The oracle recomputes every pixel from the
      // (id, x, y) arithmetic independently — no trust in the codec.
      import graft.multimodal.BmpFunctions._
      import graft.multimodal.PngFunctions._
      t(s, dir, "documents")
        .where(col("doc_id") < 200 && col("doc_id") % 3 === 0)
        .select(col("doc_id").as("media_id"),
          (lit(16) + pmod(col("doc_id"), lit(5)) * 8).cast("int").as("w"),
          (lit(12) + pmod(col("doc_id"), lit(7)) * 6).cast("int").as("h"))
        .withColumn("payload", bmpSynth(col("media_id"), col("w"), col("h")))
        .withColumn("st", bmpStats(col("payload")))
        .withColumn("rz", bmpStats(bmpResizeFit(col("payload"), lit(32))))
        // the PNG codec (zlib-compressed, per-row scanline filters) must
        // reproduce the identical pixel aggregates, before and after an
        // identical integer resize — the compressed codec is verified
        // against the uncompressed one on every row
        .withColumn("png", pngSynth(col("media_id"), col("w"), col("h")))
        .withColumn("pst", pngStats(col("png")))
        .withColumn("prz", pngStats(pngResizeFit(col("png"), lit(32))))
        .select(col("media_id"),
          col("st.width").as("width"), col("st.height").as("height"),
          col("st.sum_b").as("sum_b"), col("st.sum_g").as("sum_g"),
          col("st.sum_r").as("sum_r"),
          col("rz.width").as("rs_width"), col("rz.height").as("rs_height"),
          col("rz.sum_b").as("rs_sum_b"),
          (col("pst.width") === col("st.width") &&
            col("pst.height") === col("st.height") &&
            col("pst.sum_r") === col("st.sum_r") &&
            col("pst.sum_g") === col("st.sum_g") &&
            col("pst.sum_b") === col("st.sum_b")).as("png_matches_bmp"),
          (col("prz.width") === col("rz.width") &&
            col("prz.height") === col("rz.height") &&
            col("prz.sum_b") === col("rz.sum_b")).as("png_resize_matches"))
        .orderBy("media_id")
    }),

    "dedup_paragraphs" -> ((s, dir) => {
      // Paragraph-grain exact dedup (boilerplate removal): documents are
      // assembled as header \n own-text \n borrowed-text \n footer, so
      // the shared header/footer survive only in their first host doc and
      // every borrowed paragraph collapses onto its origin.
      val d = t(s, dir, "documents").select("doc_id", "text")
      val borrowed = d.select((col("doc_id")).as("src_id"),
        col("text").as("borrowed"))
      val pages = d
        .withColumn("src_id", pmod(col("doc_id"), lit(50)))
        .join(borrowed, "src_id")
        .select(col("doc_id"), concat_ws("\n",
          lit("SHARED LICENSE HEADER PARAGRAPH COMMON TO EVERY DOCUMENT"),
          col("text"), col("borrowed"),
          lit("SHARED FOOTER PARAGRAPH WITH CONTACT AND COPYRIGHT")).as("page"))
      Dedup.dedupParagraphs(pages, col("doc_id"), col("page"))
        .select(col("doc_id"), col("n_paras_kept"),
          length(col("text")).as("n_chars2"), md5(col("text")).as("fp"))
        .orderBy("doc_id")
    }))

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    relational ++ engine ++ pipeline

  // ==========================================================================
  // DuckDB oracles
  // ==========================================================================

  private val LI = "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate, l_partkey, l_suppkey FROM lineitem"

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "q3_topk_revenue" ->
      """SELECT o_orderkey,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
         FROM customer, orders, lineitem
         WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND o_orderkey = l_orderkey
         GROUP BY o_orderkey ORDER BY revenue DESC, o_orderkey LIMIT 10""",

    "q5_nation_revenue" ->
      """SELECT n_name,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
         FROM region, nation, customer, orders, lineitem
         WHERE r_regionkey = n_regionkey AND n_nationkey = c_nationkey
           AND c_custkey = o_custkey AND o_orderkey = l_orderkey
         GROUP BY n_name ORDER BY n_name""",

    "q_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem
         WHERE l_returnflag = 'R' AND l_quantity > 45
         ORDER BY l_orderkey, l_linenumber""",

    "q_window_running" ->
      """SELECT l_suppkey, rn, l_orderkey, l_linenumber, running_qty FROM (
           SELECT l_suppkey, l_orderkey, l_linenumber,
             row_number() OVER w AS rn,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_qty
           FROM lineitem
           WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
         ) WHERE rn <= 5 ORDER BY l_suppkey, rn""",

    "q_agg_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS distinct_parts,
         count(DISTINCT l_suppkey) AS distinct_supps, count(*) AS n
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    "q_semi_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",

    "q_set_ops" ->
      """SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
         INTERSECT
         SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
         ORDER BY o_custkey""",

    "q_scalar_functions" ->
      """SELECT o_orderkey, upper(o_orderpriority) AS pri_upper,
         CAST(year(o_orderdate) AS INT) AS order_year,
         CAST(month(o_orderdate) AS INT) AS order_month,
         CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) * 2, 2) AS DOUBLE) AS double_price,
         substr(o_orderstatus, 1, 1) AS status_c,
         o_orderkey || '-' || o_custkey AS composite
         FROM orders ORDER BY o_orderkey""",

    "q_events_rollup" ->
      """SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n,
         count(DISTINCT user_id) AS users,
         CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_asof_join" ->
      """SELECT l.event_id, l.user_id, r.event_id AS click_event_id
         FROM (SELECT * FROM events WHERE event_type = 'purchase') l
         ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
           ON l.user_id = r.user_id AND l.ts >= r.ts
         ORDER BY l.event_id""",

    "q_json_extract" ->
      """SELECT event_type,
           CAST(json_extract(props, '$.k') AS INT) % 10 AS k_bucket,
           count(*) AS n,
           CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k
         FROM events
         WHERE json_extract(props, '$.k') IS NOT NULL
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_variant" ->
      """SELECT event_type,
           CAST(json_extract(props, '$.k') AS INT) % 10 AS k_bucket,
           count(*) AS n,
           CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           count(json_extract_string(props, '$.tag')) AS n_tagged
         FROM events
         WHERE json_extract(props, '$.k') IS NOT NULL
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_percentiles" ->
      """SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS p50_qty,
           quantile_cont(l_extendedprice, 0.9) AS p90_price,
           quantile_cont(l_extendedprice, 0.25) AS p25_price,
           quantile_cont(l_extendedprice, 0.75) AS p75_price
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    "q_session_window" ->
      """WITH e AS (
           SELECT user_id, epoch_us(ts) AS us FROM events
         ), flagged AS (
           SELECT user_id, us,
             CASE WHEN lag(us) OVER w IS NULL
                    OR us - lag(us) OVER w >= 1800000000
                  THEN 1 ELSE 0 END AS new_s
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)
         ), isl AS (
           SELECT user_id, us,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY us
               ROWS UNBOUNDED PRECEDING) AS sid
           FROM flagged
         )
         SELECT user_id, min(us) AS start_us,
           max(us) + 1800000000 AS end_us, count(*) AS n
         FROM isl GROUP BY user_id, sid ORDER BY user_id, start_us""",

    "q_band_join" ->
      """SELECT l.event_id, count(*) AS n_clicks
         FROM (SELECT event_id, ts FROM events WHERE event_type = 'purchase') l
         JOIN (SELECT ts AS c_ts FROM events WHERE event_type = 'click') r
           ON abs(epoch_us(l.ts) - epoch_us(r.c_ts)) <= 3600000000
         GROUP BY 1 ORDER BY 1""",

    "q_pivot" ->
      """SELECT o_orderpriority,
         count(*) FILTER (o_orderstatus = 'F') AS n_f,
         count(*) FILTER (o_orderstatus = 'O') AS n_o,
         count(*) FILTER (o_orderstatus = 'P') AS n_p
         FROM orders GROUP BY 1 ORDER BY 1""",

    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""",

    "q_correlated_subquery" ->
      """SELECT c_custkey, c_name,
         (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
         FROM customer c
         WHERE (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) >= 15
         ORDER BY c_custkey""",

    "q_ds_snowflake" ->
      """SELECT n_name, p_brand, count(*) AS n,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                  (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
              AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation   ON c_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         JOIN part     ON l_partkey = p_partkey
         JOIN supplier ON l_suppkey = s_suppkey
         WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
           AND r_name = 'ASIA' AND p_size <= 20
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_ds_rollup" ->
      """SELECT n_name, o_orderpriority, count(*) AS n,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                  (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
              AS DOUBLE) AS revenue,
         CAST(GROUPING(n_name) * 2 + GROUPING(o_orderpriority) AS INT) AS gid
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation   ON c_nationkey = n_nationkey
         GROUP BY ROLLUP (n_name, o_orderpriority)
         ORDER BY gid, n_name NULLS FIRST, o_orderpriority NULLS FIRST""",

    "q_ds_exists_chain" ->
      """SELECT c_mktsegment, count(*) AS n_cust,
         CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal
         FROM customer c
         WHERE EXISTS (
                 SELECT 1 FROM orders o
                 WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
                   AND EXISTS (SELECT 1 FROM lineitem l
                               WHERE l.l_orderkey = o.o_orderkey
                                 AND l.l_returnflag = 'R'))
           AND NOT EXISTS (
                 SELECT 1 FROM orders o2
                 WHERE o2.o_custkey = c.c_custkey
                   AND o2.o_orderpriority = '5-LOW')
         GROUP BY 1 ORDER BY 1""",

    "q_ds_yoy" ->
      """WITH year_rev AS (
           SELECT n_name, EXTRACT(year FROM o_orderdate) AS yr,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                  AS DOUBLE) AS rev
           FROM lineitem
           JOIN orders   ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation   ON c_nationkey = n_nationkey
           GROUP BY 1, 2)
         SELECT cur.n_name, CAST(cur.yr AS INT) AS yr, cur.rev,
                prev.rev AS prev_rev
         FROM year_rev cur JOIN year_rev prev
           ON cur.n_name = prev.n_name AND cur.yr = prev.yr + 1
         WHERE cur.rev > prev.rev
         ORDER BY 1, 2""",

    "q_ds_topk_per_group" ->
      """SELECT p_brand, p_partkey, revenue, CAST(rk AS INT) AS rk FROM (
           SELECT p_brand, p_partkey, revenue,
             rank() OVER (PARTITION BY p_brand
                          ORDER BY revenue DESC, p_partkey) AS rk
           FROM (
             SELECT p_brand, p_partkey,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                    AS DOUBLE) AS revenue
             FROM lineitem JOIN part ON l_partkey = p_partkey
             GROUP BY 1, 2))
         WHERE rk <= 3 ORDER BY p_brand, rk, p_partkey""",

    "q_ds_above_avg" ->
      """WITH type_agg AS (
           SELECT p_type AS t_type,
             sum(CAST(p_retailprice AS DECIMAL(18,2))) AS t_sum,
             count(*) AS t_cnt
           FROM part GROUP BY 1),
         expensive AS (
           SELECT p_partkey, p_brand
           FROM part JOIN type_agg ON p_type = t_type
           WHERE CAST(p_retailprice AS DECIMAL(18,2)) * 20 * t_cnt > t_sum * 21)
         SELECT p_brand, count(*) AS n,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS revenue
         FROM lineitem JOIN expensive ON l_partkey = p_partkey
         GROUP BY 1 ORDER BY 1""",

    "q_ds_cross_channel" ->
      """SELECT c_custkey, c_name FROM customer
         JOIN (
           SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
           INTERSECT
           SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
           INTERSECT
           SELECT o_custkey FROM orders JOIN lineitem ON l_orderkey = o_orderkey
           WHERE l_returnflag = 'R'
         ) k ON c_custkey = k.o_custkey
         ORDER BY c_custkey""",

    "q_ds_fact_fact" ->
      """WITH ret AS (
           SELECT l_orderkey, count(*) AS n_ret,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS ret_price
           FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1),
         kept AS (
           SELECT l_orderkey AS k_orderkey, count(*) AS n_kept,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS kept_price
           FROM lineitem WHERE l_returnflag = 'N' GROUP BY 1)
         SELECT l_orderkey, n_ret, ret_price, n_kept, kept_price
         FROM ret JOIN kept ON l_orderkey = k_orderkey
         ORDER BY l_orderkey""",

    // -- engine round-trips: the oracle states the expected END STATE ------
    "graft_append_read" ->
      """SELECT l_returnflag, count(*) AS n,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
         FROM (SELECT * FROM lineitem UNION ALL SELECT * FROM lineitem)
         GROUP BY 1 ORDER BY 1""",

    "graft_partition_prune" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE l_returnflag = 'R' ORDER BY l_orderkey, l_linenumber""",

    "graft_data_skipping" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE l_orderkey = (SELECT max(l_orderkey) FROM lineitem)
         ORDER BY l_linenumber""",

    "graft_materialize_partcols" ->
      """SELECT l_returnflag, count(*) AS n,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    "graft_partition_inference" ->
      """SELECT event_type, count(*) AS n,
         CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
         FROM events
         WHERE ts >= (SELECT max(ts) - INTERVAL 2 DAY FROM events)
         GROUP BY 1 ORDER BY 1""",

    "graft_overwrite" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE l_quantity > 25 ORDER BY l_orderkey, l_linenumber""",

    "graft_replace_where" ->
      """SELECT l_returnflag, count(*) AS n,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
         FROM (
           SELECT * FROM lineitem WHERE l_returnflag <> 'R'
           UNION ALL
           SELECT * FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 40
         ) GROUP BY 1 ORDER BY 1""",

    "graft_replace_where_data" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM (
           SELECT * FROM lineitem WHERE NOT (l_quantity < 5)
           UNION ALL
           SELECT * FROM lineitem WHERE l_quantity < 5 AND l_linenumber = 1
         ) ORDER BY l_orderkey, l_linenumber""",

    "graft_insert_replace_on" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
         WHERE o_orderkey % 7 <> 0
         UNION ALL
         SELECT o_orderkey, 'X' AS o_orderstatus, o_totalprice FROM orders
         WHERE o_orderkey % 7 = 0
         UNION ALL
         SELECT o_orderkey + 100000000, o_orderstatus, o_totalprice
         FROM orders WHERE o_orderkey % 7 = 3
         ORDER BY o_orderkey""",

    "graft_delete" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE NOT (l_quantity < 10) ORDER BY l_orderkey, l_linenumber""",

    "graft_delete_dv" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE NOT (l_quantity < 10) AND NOT (l_quantity > 45)
         ORDER BY l_orderkey, l_linenumber""",

    "graft_update" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
         CASE WHEN l_quantity > 45 THEN 0.99 ELSE l_tax END AS l_tax
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",

    "graft_update_dv" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
         CASE WHEN l_quantity > 45 THEN 0.99 ELSE l_tax END AS l_tax
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",

    "graft_merge_dv" ->
      """SELECT c_custkey, c_acctbal, 'KEPT' AS c_mktsegment FROM customer
         WHERE NOT (c_acctbal < 0) ORDER BY c_custkey""",

    "sql_delete" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE NOT (l_quantity < 10) ORDER BY l_orderkey, l_linenumber""",

    "sql_update" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
         CASE WHEN l_quantity > 45 THEN 0.99 ELSE l_tax END AS l_tax
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",

    "sql_merge" ->
      """WITH src AS (
           SELECT CASE WHEN o_custkey % 10 = 0 THEN o_custkey + 100000 ELSE o_custkey END AS k,
                  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
           FROM orders GROUP BY o_custkey
         )
         SELECT c.c_custkey, c.c_name, c.c_nationkey,
                CASE WHEN s.k IS NOT NULL THEN s.total ELSE c.c_acctbal END AS c_acctbal,
                c.c_mktsegment
         FROM customer c LEFT JOIN src s ON c.c_custkey = s.k
         UNION ALL
         SELECT s.k AS c_custkey, 'cust_new' AS c_name, CAST(-1 AS INT) AS c_nationkey,
                s.total AS c_acctbal, 'NEW' AS c_mktsegment
         FROM src s LEFT JOIN customer c ON c.c_custkey = s.k
         WHERE c.c_custkey IS NULL
         ORDER BY c_custkey""",

    "sql_optimize" ->
      """SELECT l_linenumber, count(*) AS n,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    "sql_catalog_ctas" ->
      """SELECT count(*) AS n,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM orders WHERE o_totalprice > 150000""",

    "sql_insert_partition" ->
      """SELECT n_regionkey, count(*) AS n, CAST(sum(n_nationkey) AS BIGINT) AS sk
         FROM (
           SELECT n_nationkey, n_regionkey FROM nation WHERE n_regionkey <> 0
           UNION ALL
           SELECT n_nationkey + 100 AS n_nationkey, 0 AS n_regionkey
           FROM nation WHERE n_regionkey = 1
         ) GROUP BY 1 ORDER BY 1""",

    "sql_table_changes" ->
      """SELECT c AS _change_type, n FROM (
           SELECT 'delete' AS c, count(*) AS n FROM supplier WHERE s_suppkey % 7 = 0
           UNION ALL
           SELECT 'update_preimage', count(*) FROM supplier
           WHERE s_suppkey <= 20 AND s_suppkey % 7 <> 0
           UNION ALL
           SELECT 'update_postimage', count(*) FROM supplier
           WHERE s_suppkey <= 20 AND s_suppkey % 7 <> 0
         ) ORDER BY 1""",

    "graft_merge_evolution" ->
      """SELECT n_nationkey, n_regionkey, n_extra FROM (
           SELECT n_nationkey, n_regionkey, CAST(n_nationkey * 2 AS INT) AS n_extra
           FROM nation WHERE n_nationkey < 12
           UNION ALL
           SELECT n_nationkey, n_regionkey, CAST(NULL AS INT)
           FROM nation WHERE n_nationkey >= 12
           UNION ALL
           SELECT n_nationkey + 100, n_regionkey, CAST(n_nationkey * 2 AS INT)
           FROM nation WHERE n_nationkey >= 12
         ) ORDER BY n_nationkey""",

    "graft_type_widening" ->
      """SELECT count(*) AS n, CAST(sum(r) AS BIGINT) AS sr,
              CAST(sum(CASE WHEN r >= 10000000000 THEN 1 ELSE 0 END) AS BIGINT) AS wide
         FROM (
           SELECT CAST(n_regionkey AS BIGINT) AS r FROM nation
           UNION ALL
           SELECT CAST(n_regionkey AS BIGINT) + 10000000000 FROM nation
         )""",

    "graft_row_tracking" ->
      """WITH ids AS (
           SELECT n_nationkey,
                  CAST(row_number() OVER (ORDER BY n_nationkey) - 1 AS BIGINT) AS rid
           FROM nation
         ), both_copies AS (
           SELECT n_nationkey, rid FROM ids
           UNION ALL
           SELECT n_nationkey, rid + (SELECT count(*) FROM nation) FROM ids
         )
         SELECT n_nationkey, rid AS _graft_row_id FROM both_copies
         WHERE n_nationkey % 5 <> 2
         ORDER BY n_nationkey, _graft_row_id""",

    "graft_merge_upsert" ->
      """WITH src AS (
           SELECT CASE WHEN o_custkey % 10 = 0 THEN o_custkey + 100000 ELSE o_custkey END AS k,
                  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
           FROM orders GROUP BY o_custkey
         )
         SELECT c.c_custkey, c.c_name, c.c_nationkey,
                CASE WHEN s.k IS NOT NULL THEN s.total ELSE c.c_acctbal END AS c_acctbal,
                c.c_mktsegment
         FROM customer c LEFT JOIN src s ON c.c_custkey = s.k
         UNION ALL
         SELECT s.k AS c_custkey, 'cust_new' AS c_name, CAST(-1 AS INT) AS c_nationkey,
                s.total AS c_acctbal, 'NEW' AS c_mktsegment
         FROM src s LEFT JOIN customer c ON c.c_custkey = s.k
         WHERE c.c_custkey IS NULL
         ORDER BY c_custkey""",

    "graft_merge_insert_only" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
         ORDER BY o_orderkey""",

    "graft_merge_delete" ->
      """SELECT c_custkey, c_acctbal, 'KEPT' AS c_mktsegment FROM customer
         WHERE NOT (c_acctbal < 0) ORDER BY c_custkey""",

    "graft_time_travel" ->
      """SELECT s_suppkey, s_name, s_acctbal FROM supplier ORDER BY s_suppkey""",

    "graft_restore" ->
      """SELECT s_suppkey, s_name, s_acctbal FROM supplier ORDER BY s_suppkey""",

    "graft_describe_history" ->
      """SELECT * FROM (VALUES
           (CAST(0 AS BIGINT), 'WRITE',    CAST(NULL AS BIGINT)),
           (CAST(1 AS BIGINT), 'DELETE',   CAST(0 AS BIGINT)),
           (CAST(2 AS BIGINT), 'OPTIMIZE', CAST(1 AS BIGINT))
         ) AS h(version, operation, readVersion) ORDER BY version""",

    "graft_describe_detail" ->
      """SELECT 'graft' AS format, CAST(0 AS BIGINT) AS version,
           (SELECT CAST(count(DISTINCT n_regionkey) AS BIGINT) FROM nation)
             AS num_files,
           'n_regionkey' AS partition_cols""",

    "graft_generate_manifests" ->
      """SELECT CAST(n_regionkey AS BIGINT) AS part,
           CAST(1 AS BIGINT) AS n_files, true AS matches_log
         FROM (SELECT DISTINCT n_regionkey FROM nation) ORDER BY part""",

    "graft_optimize_compact" ->
      """SELECT l_linenumber, count(*) AS n,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    "graft_zorder" ->
      """SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem
         WHERE l_orderkey < 100 AND l_partkey < 100
         ORDER BY l_orderkey, l_linenumber""",

    "graft_cdf" ->
      """SELECT s_suppkey,
              CASE WHEN c = 'update_postimage' THEN 0.0 ELSE s_acctbal END AS s_acctbal,
              c AS _change_type
         FROM supplier, (VALUES ('update_preimage'), ('update_postimage')) AS ct(c)
         WHERE s_suppkey <= 50
         ORDER BY s_suppkey, _change_type""",

    "graft_rename_drop" ->
      """SELECT n_nationkey, n_name AS nation_name,
         CASE WHEN n_nationkey = 0 THEN 77 ELSE CAST(NULL AS INT) END AS n_regionkey
         FROM nation ORDER BY n_nationkey""",

    "graft_rename_drop_id" ->
      """SELECT n_nationkey, n_name AS nation_name,
         CASE WHEN n_nationkey = 0 THEN 77 ELSE CAST(NULL AS INT) END AS n_regionkey
         FROM nation ORDER BY n_nationkey""",

    "graft_schema_evolution" ->
      """SELECT n_nationkey, n_name, n_comment FROM (
           SELECT n_nationkey, n_name, NULL AS n_comment FROM nation
           UNION ALL
           SELECT n_nationkey, n_name, 'nation-' || n_name AS n_comment FROM nation
         ) ORDER BY n_nationkey, n_comment NULLS FIRST""",

    "graft_checkpoint_replay" ->
      """SELECT l_linenumber, count(*) AS n FROM lineitem
         GROUP BY 1 ORDER BY 1""",

    "graft_checkpoint_v2" ->
      """SELECT l_linenumber, count(*) AS n FROM lineitem
         GROUP BY 1 ORDER BY 1""",

    "graft_convert_parquet" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part ORDER BY p_partkey""",

    "graft_convert_delta_sync" ->
      """SELECT p_partkey, p_name FROM part ORDER BY p_partkey""",

    "graft_vacuum" ->
      """SELECT p_partkey, p_size FROM part WHERE NOT (p_size < 10)
         ORDER BY p_partkey""",

    "graft_stream_roundtrip" ->
      """SELECT event_id, user_id, event_type, value FROM events
         ORDER BY event_id""",

    "graft_idempotent_write" ->
      """SELECT n_regionkey, count(*) AS n FROM (
           SELECT * FROM nation UNION ALL SELECT * FROM nation
         ) GROUP BY 1 ORDER BY 1""",

    "graft_truncate" ->
      "SELECT p_partkey, p_size FROM part WHERE p_size < 10 ORDER BY p_partkey",

    "graft_shallow_clone" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
         WHERE o_orderstatus <> 'O' ORDER BY o_orderkey""",

    "graft_redirect" ->
      """SELECT s_suppkey, s_name, s_acctbal FROM supplier
         WHERE s_suppkey % 7 <> 0 ORDER BY s_suppkey""",

    "graft_redirect_writer_only" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
         WHERE c_custkey % 5 <> 0 ORDER BY c_custkey""",

    "graft_redirect_rules" ->
      """SELECT s_suppkey, s_name, s_acctbal FROM supplier
         WHERE s_suppkey <= 20 AND s_suppkey % 2 <> 0 ORDER BY s_suppkey""",

    "sql_show_partitions" ->
      "SELECT DISTINCT CAST(n_regionkey AS INT) AS n_regionkey FROM nation ORDER BY 1",

    "graft_generated_read" ->
      """SELECT o_orderkey, o_orderdate,
           CAST(year(o_orderdate) AS INT) AS o_year
         FROM orders ORDER BY o_orderkey""",

    "graft_identity_read" ->
      """SELECT 5 * CAST(row_number() OVER () AS BIGINT) AS rid
         FROM nation ORDER BY rid""",

    "graft_column_defaults" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS id, 'seed' AS source FROM nation
         UNION ALL
         SELECT CAST(r_regionkey AS BIGINT) + 100 AS id, 'late' AS source
         FROM region ORDER BY id""",

    "graft_auto_compact" ->
      """SELECT l_linenumber, count(*) AS n FROM lineitem
         WHERE l_linenumber <= 2 GROUP BY 1 ORDER BY 1""",

    "graft_metadata_only_agg" ->
      """SELECT count(*) AS n,
           CAST(min(l_quantity) AS DOUBLE) AS min_qty,
           CAST(max(l_quantity) AS DOUBLE) AS max_qty
         FROM lineitem""",

    // -- pipeline operators -----------------------------------------------
    "text_signals" ->
      """SELECT st.doc_id, st.n_tokens, st.n_bpe, st.n_chars_calc,
           q.quality, l.lang_pred, e.entropy,
           r.dup_word_frac, r.top_word_frac, r.top_bigram_frac,
           true AS fp_deterministic, true AS fp_sensitive,
           true AS simhash_deterministic
         FROM (SELECT doc_id,
         CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0)) AS INT) AS n_tokens,
         CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INT) AS n_bpe,
         CAST(len(text) AS INT) AS n_chars_calc
         FROM documents) st
         JOIN (SELECT doc_id, round(
           least(len(text) / 200.0, 1.0) * 0.4 +
           (CASE WHEN len(list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0)) > 0
                 AND len(text) / CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0)) AS DOUBLE) BETWEEN 3.0 AND 12.0
                 THEN 1.0 ELSE 0.3 END) * 0.3 +
           (CASE WHEN len(regexp_extract_all(text, '[\.,;:!\?''"]')) / CAST(len(text) AS DOUBLE) < 0.2 THEN 1.0 ELSE 0.4 END) * 0.2 +
           (CASE WHEN len(regexp_extract_all(text, '[A-Z]')) / CAST(len(text) AS DOUBLE) < 0.3 THEN 1.0 ELSE 0.5 END) * 0.1,
           4) AS quality
         FROM documents) q USING (doc_id)
         JOIN (WITH toks AS (
           SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> len(x) > 0) AS t
           FROM documents
         ),
         scores AS (
           SELECT doc_id,
             CASE WHEN len(t) > 0 THEN len(list_intersect(t, ['der','die','das','und','ist','nicht','mit','ein','zu','den','von','im','auf','für','sich'])) * 1.0 / len(t) ELSE 0.0 END AS s_de,
             CASE WHEN len(t) > 0 THEN len(list_intersect(t, ['the','and','of','to','in','is','you','that','it','for','a','on','with','as','at'])) * 1.0 / len(t) ELSE 0.0 END AS s_en,
             CASE WHEN len(t) > 0 THEN len(list_intersect(t, ['el','la','los','y','de','un','una','es','para','que','en','del','se','no','por'])) * 1.0 / len(t) ELSE 0.0 END AS s_es,
             CASE WHEN len(t) > 0 THEN len(list_intersect(t, ['le','la','les','et','de','un','une','est','pour','que','dans','en','du','au','pas'])) * 1.0 / len(t) ELSE 0.0 END AS s_fr
           FROM toks
         )
         SELECT doc_id,
           CASE WHEN greatest(s_de, s_en, s_es, s_fr) > 0.0 THEN
             CASE WHEN s_fr = greatest(s_de, s_en, s_es, s_fr) THEN 'fr'
                  WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
                  WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
                  ELSE 'de' END
           ELSE 'und' END AS lang_pred
         FROM scores) l USING (doc_id)
         JOIN (WITH chars AS (
           SELECT doc_id, unnest(string_split(text, '')) AS ch
           FROM documents),
         freq AS (
           SELECT doc_id, ch, CAST(count(*) AS DOUBLE) AS n
           FROM chars GROUP BY 1, 2),
         tot AS (SELECT doc_id, sum(n) AS t FROM freq GROUP BY 1)
         SELECT f.doc_id, round(-sum((n/t) * log2(n/t)), 4) AS entropy
         FROM freq f JOIN tot USING (doc_id)
         GROUP BY f.doc_id) e USING (doc_id)
         JOIN (WITH toks AS (
           SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\s+'),
               x -> len(x) > 0) AS t
           FROM documents
         ), g AS (
           SELECT doc_id,
             CASE WHEN len(t) >= 1 THEN t ELSE [''] END AS g1,
             CASE WHEN len(t) >= 2
               THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
               ELSE [array_to_string(t, ' ')] END AS g2,
             t
           FROM toks
         )
         SELECT doc_id,
           CASE WHEN len(t) > 0
             THEN 1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE)
             ELSE 0.0 END AS dup_word_frac,
           CAST(list_max(list_transform(list_distinct(g1),
               w -> len(list_filter(g1, x -> x = w)))) AS DOUBLE)
             / CAST(len(g1) AS DOUBLE) AS top_word_frac,
           CAST(list_max(list_transform(list_distinct(g2),
               w -> len(list_filter(g2, x -> x = w)))) AS DOUBLE)
             / CAST(len(g2) AS DOUBLE) AS top_bigram_frac
         FROM g) r USING (doc_id)
         ORDER BY st.doc_id""",

    "ann_bruteforce" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
         scored AS (
           SELECT q.qid, e.vec_id AS cid,
                  list_cosine_similarity(CAST(q.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS score
           FROM q CROSS JOIN embeddings e),
         ranked AS (
           SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS rank
           FROM scored)
         SELECT qid, rank, cid FROM ranked WHERE rank <= 5 ORDER BY qid, rank""",

    "text_repetition" ->
      """WITH pages AS (
           SELECT doc_id,
             'BOILERPLATE HEADER LINE' || chr(10) || substr(text, 1, 40)
               || chr(10) || text || chr(10) || substr(text, 1, 40) AS page
           FROM documents),
         lines AS (
           SELECT doc_id, unnest(string_split(page, chr(10))) AS line
           FROM pages),
         lc AS (SELECT doc_id, line, count(*) AS c FROM lines GROUP BY 1, 2),
         lstat AS (
           SELECT doc_id,
             sum(CASE WHEN c > 1 THEN c ELSE 0 END) * 1.0 / sum(c)
               AS dup_line_frac,
             coalesce(sum(CASE WHEN c > 1 THEN len(line) * c ELSE 0 END) * 1.0
               / nullif(sum(len(line) * c), 0), 0) AS dup_line_char_frac
           FROM lc GROUP BY doc_id),
         tc AS (
           SELECT doc_id,
             list_filter(string_split_regex(lower(page), '\s+'),
               x -> len(x) > 0) AS t
           FROM pages),
         tn AS (SELECT doc_id, t, len(array_to_string(t, '')) AS nchars FROM tc),
         g2 AS (SELECT doc_id, i, array_to_string(t[i:i+1], ' ') AS g
                FROM tn, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) s),
         g3 AS (SELECT doc_id, i, array_to_string(t[i:i+2], ' ') AS g
                FROM tn, LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS i) s),
         g4 AS (SELECT doc_id, i, array_to_string(t[i:i+3], ' ') AS g
                FROM tn, LATERAL (SELECT unnest(generate_series(1, len(t) - 3)) AS i) s),
         g5 AS (SELECT doc_id, i, array_to_string(t[i:i+4], ' ') AS g
                FROM tn, LATERAL (SELECT unnest(generate_series(1, len(t) - 4)) AS i) s),
         g10 AS (SELECT doc_id, i, array_to_string(t[i:i+9], ' ') AS g
                FROM tn, LATERAL (SELECT unnest(generate_series(1, len(t) - 9)) AS i) s),
         top2 AS (SELECT doc_id, c * len(replace(g, ' ', '')) * 1.0 AS num FROM (
           SELECT doc_id, g, count(*) AS c,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY count(*) DESC, g) AS rn
           FROM g2 GROUP BY doc_id, g) WHERE rn = 1),
         top3 AS (SELECT doc_id, c * len(replace(g, ' ', '')) * 1.0 AS num FROM (
           SELECT doc_id, g, count(*) AS c,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY count(*) DESC, g) AS rn
           FROM g3 GROUP BY doc_id, g) WHERE rn = 1),
         top4 AS (SELECT doc_id, c * len(replace(g, ' ', '')) * 1.0 AS num FROM (
           SELECT doc_id, g, count(*) AS c,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY count(*) DESC, g) AS rn
           FROM g4 GROUP BY doc_id, g) WHERE rn = 1),
         gc5 AS (SELECT doc_id, g, count(*) AS c FROM g5 GROUP BY 1, 2),
         cov5 AS (SELECT DISTINCT dd.doc_id, s.p
           FROM (SELECT g5.doc_id, g5.i FROM g5
                 JOIN gc5 USING (doc_id, g) WHERE c > 1) dd,
                LATERAL (SELECT unnest(generate_series(dd.i, dd.i + 4)) AS p) s),
         dup5 AS (SELECT cov5.doc_id, sum(len(t[p])) * 1.0 AS chars
           FROM cov5 JOIN tn USING (doc_id) GROUP BY 1),
         gc10 AS (SELECT doc_id, g, count(*) AS c FROM g10 GROUP BY 1, 2),
         cov10 AS (SELECT DISTINCT dd.doc_id, s.p
           FROM (SELECT g10.doc_id, g10.i FROM g10
                 JOIN gc10 USING (doc_id, g) WHERE c > 1) dd,
                LATERAL (SELECT unnest(generate_series(dd.i, dd.i + 9)) AS p) s),
         dup10 AS (SELECT cov10.doc_id, sum(len(t[p])) * 1.0 AS chars
           FROM cov10 JOIN tn USING (doc_id) GROUP BY 1)
         SELECT n.doc_id,
           round(l.dup_line_frac, 6) AS dup_line_frac,
           round(l.dup_line_char_frac, 6) AS dup_line_char_frac,
           round(coalesce(t2.num / nullif(n.nchars, 0), 0), 6) AS top_2gram_char_frac,
           round(coalesce(t3.num / nullif(n.nchars, 0), 0), 6) AS top_3gram_char_frac,
           round(coalesce(t4.num / nullif(n.nchars, 0), 0), 6) AS top_4gram_char_frac,
           round(coalesce(d5.chars / nullif(n.nchars, 0), 0), 6) AS dup_5gram_char_frac,
           round(coalesce(d10.chars / nullif(n.nchars, 0), 0), 6) AS dup_10gram_char_frac
         FROM tn n
         JOIN lstat l USING (doc_id)
         LEFT JOIN top2 t2 USING (doc_id)
         LEFT JOIN top3 t3 USING (doc_id)
         LEFT JOIN top4 t4 USING (doc_id)
         LEFT JOIN dup5 d5 USING (doc_id)
         LEFT JOIN dup10 d10 USING (doc_id)
         ORDER BY n.doc_id""",

    "text_lm_perplexity" ->
      """WITH toks AS (
           SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\s+'),
               x -> len(x) > 0) AS t
           FROM documents),
         train AS (SELECT * FROM toks WHERE doc_id % 5 = 0),
         uni AS (
           SELECT u AS w, count(*) AS c
           FROM (SELECT unnest(t) AS u FROM train) GROUP BY 1),
         v AS (SELECT count(*) AS vocab FROM uni),
         bi AS (
           SELECT g, count(*) AS c FROM (
             SELECT array_to_string(t[i:i+1], ' ') AS g
             FROM train, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) s)
           GROUP BY 1),
         docbi AS (
           SELECT doc_id, t[i] AS w1, array_to_string(t[i:i+1], ' ') AS g
           FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) s),
         scored AS (
           SELECT doc_id,
             ln((coalesce(bi.c, 0) + 1.0) / (coalesce(u.c, 0) + v.vocab)) AS lp
           FROM docbi
           LEFT JOIN bi ON docbi.g = bi.g
           LEFT JOIN uni u ON docbi.w1 = u.w
           CROSS JOIN v)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(-avg(lp), 6) AS cross_entropy,
           round(exp(-avg(lp)), 2) AS ppl
         FROM scored GROUP BY doc_id ORDER BY doc_id""",

    "text_termstats" ->
      """WITH toks AS (
           SELECT doc_id,
             unnest(list_filter(string_split_regex(trim(text), '\s+'),
               x -> len(x) > 0)) AS term
           FROM documents
         ), tf AS (
           SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           FROM toks GROUP BY 1, 2
         ), docfreq AS (
           SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
         ), topk AS (
           SELECT doc_id, term, tf,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY tf DESC, term) AS rn
           FROM tf
         )
         SELECT t.doc_id, t.term, t.tf, d.df
         FROM topk t JOIN docfreq d USING (term)
         WHERE t.rn <= 3 ORDER BY t.doc_id, t.term""",

    "pipeline_split" ->
      """SELECT CASE WHEN doc_id * 2654435761 % 1000 < 980 THEN 'train'
                     WHEN doc_id * 2654435761 % 1000 < 990 THEN 'val'
                     ELSE 'test' END AS split, count(*) AS n
         FROM documents GROUP BY 1 ORDER BY 1""",

    "pipeline_group_cap" ->
      """SELECT doc_id, source, n_chars FROM (
           SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source
               ORDER BY n_chars DESC, doc_id) AS rn
           FROM documents)
         WHERE rn <= 3 ORDER BY source, doc_id""",

    "pipeline_pack_shards" ->
      """WITH s AS (
           SELECT lang, doc_id, n_chars,
             sum(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) - n_chars AS strt
           FROM documents)
         SELECT lang, CAST(strt // 50000 AS BIGINT) AS shard, count(*) AS n,
           CAST(sum(n_chars) AS BIGINT) AS chars
         FROM s GROUP BY 1, 2 ORDER BY 1, 2""",

    "pipeline_pack_sequences" ->
      """WITH toks AS (
           SELECT doc_id,
             len(list_filter(string_split_regex(trim(text), '\s+'),
               x -> len(x) > 0)) AS n
           FROM documents),
         offs AS (
           SELECT doc_id, n,
             CAST(coalesce(sum(n) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS strt
           FROM toks WHERE n > 0),
         sl AS (
           SELECT doc_id, n, strt,
             unnest(generate_series(strt // 512, (strt + n - 1) // 512)) AS seq_id
           FROM offs)
         SELECT doc_id, CAST(seq_id AS BIGINT) AS seq_id,
           CAST(greatest(strt, seq_id * 512) - strt AS BIGINT) AS doc_offset,
           CAST(greatest(strt, seq_id * 512) - seq_id * 512 AS BIGINT) AS seq_offset,
           CAST(least(strt + n, (seq_id + 1) * 512)
             - greatest(strt, seq_id * 512) AS BIGINT) AS n_tokens
         FROM sl ORDER BY doc_id, seq_id""",

    "pipeline_chunk" ->
      """WITH w AS (
           SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
           FROM documents WHERE len(trim(text)) > 0),
         i AS (
           SELECT doc_id, w, unnest(generate_series(0,
             GREATEST(0, CAST(ceil((len(w)-64)/48.0) AS BIGINT)))) AS i
           FROM w),
         c AS (
           SELECT doc_id, CAST(i AS INT) AS chunk_id,
             w[(i*48+1):(i*48+64)] AS chunk
           FROM i)
         SELECT doc_id, chunk_id, CAST(len(chunk) AS INT) AS n_words,
           md5(array_to_string(chunk, ' ')) AS chunk_md5
         FROM c ORDER BY doc_id, chunk_id""",

    "q_skew_join" ->
      """WITH users AS (
           SELECT DISTINCT user_id,
             CASE WHEN user_id % 3 = 0 THEN 'gold' ELSE 'std' END AS user_tier
           FROM events)
         SELECT e.user_id, u.user_tier AS d_user_tier, count(*) AS n,
           count(DISTINCT e.event_type) AS n_types
         FROM events e JOIN users u USING (user_id)
         GROUP BY 1, 2 ORDER BY 1""",

    "q_collect_array" ->
      """SELECT user_id,
         string_agg(event_type, ',' ORDER BY event_type) AS types,
         count(*) AS n
         FROM events GROUP BY user_id ORDER BY user_id""",

    "q_date_arith" ->
      """SELECT o_orderkey,
           CAST(o_orderdate AS DATE) + 30 AS due,
           quarter(o_orderdate) AS q,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS age_days,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start
         FROM orders ORDER BY o_orderkey""",

    "q_regexp" ->
      """SELECT doc_id,
           regexp_extract(text, '([A-Za-z]+)', 1) AS first_word,
           len(regexp_extract_all(text, '[0-9]+', 0)) AS n_numbers,
           substr(regexp_replace(text, '\s+', ' ', 'g'), 1, 40) AS head40
         FROM documents ORDER BY doc_id""",

    "q_conditional_agg" ->
      """SELECT l_returnflag,
           count(*) FILTER (l_quantity > 25) AS n_big,
           count(*) FILTER (l_discount > 0.05) AS n_disc,
           max(l_extendedprice) FILTER (l_quantity > 25) AS max_big_price,
           CAST(sum(CASE WHEN l_quantity > 25 THEN l_quantity ELSE 0 END)
             AS DOUBLE) / sum(l_quantity) AS big_share
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "stream_merge_upsert" ->
      """SELECT user_id,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS total,
           count(*) AS n_events
         FROM events GROUP BY user_id ORDER BY user_id""",

    "stream_windowed_agg" ->
      """SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE)
             AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

    "stream_stateful_agg" ->
      """SELECT user_id, count(*) AS n_events, max(value) AS max_value,
           min(value) AS min_value
         FROM events GROUP BY 1 ORDER BY 1""",

    "pipeline_end_to_end" ->
      """WITH dedup AS (
           SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
         ), base AS (
           SELECT d.doc_id, d.lang, d.n_chars FROM documents d
           JOIN dedup USING (doc_id)
           WHERE d.n_chars BETWEEN 100 AND 550
         ), labeled AS (
           SELECT *, CASE WHEN doc_id * 2654435761 % 1000 < 980 THEN 'train'
                          WHEN doc_id * 2654435761 % 1000 < 990 THEN 'val'
                          ELSE 'test' END AS split FROM base
         ), packed AS (
           SELECT lang, split, n_chars,
             sum(n_chars) OVER (PARTITION BY lang, split ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) - n_chars AS strt
           FROM labeled
         )
         SELECT lang, split, CAST(strt // 20000 AS BIGINT) AS shard,
           count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
         FROM packed GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",

    "pipeline_sample_stratified" ->
      """SELECT doc_id, lang FROM documents
         WHERE doc_id * 2654435761 % 1000 <
           CASE lang WHEN 'en' THEN 100 WHEN 'de' THEN 300 ELSE 500 END
         ORDER BY doc_id""",

    "pipeline_mixture" ->
      """WITH w AS (
           SELECT * FROM (VALUES
             ('src0', CAST(0.5 AS DOUBLE)), ('src1', CAST(0.25 AS DOUBLE)),
             ('src2', CAST(0.125 AS DOUBLE)), ('src3', CAST(0.125 AS DOUBLE)))
             AS v(source, p)
         ), t AS (
           SELECT doc_id, d.source, n_chars, p
           FROM documents d JOIN w ON d.source = w.source
         ), tot AS (
           SELECT source, CAST(sum(n_chars) AS BIGINT) AS st,
             any_value(p) AS p
           FROM t GROUP BY source
         ), nval AS (
           SELECT min(st / p) AS n FROM tot
         ), b AS (
           SELECT source,
             CAST(floor(p * (SELECT n FROM nval)) AS BIGINT) AS budget
           FROM tot
         ), c AS (
           SELECT doc_id, source, n_chars,
             sum(n_chars) OVER (PARTITION BY source
               ORDER BY doc_id * 2654435761 % 1000000007, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM t
         )
         SELECT doc_id, c.source, n_chars
         FROM c JOIN b ON c.source = b.source
         WHERE cum <= budget ORDER BY doc_id""",

    "pipeline_pii_scrub" ->
      """SELECT doc_id, md5(
           regexp_replace(regexp_replace(regexp_replace(
             text || ' contact u' || doc_id || '@ex.com ip 10.1.2.' ||
               (doc_id % 256) || ' acct ' || lpad(CAST(doc_id AS VARCHAR), 9, '0'),
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+', '[EMAIL]', 'g'),
             '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '[IP]', 'g'),
             '[0-9]{7,}', '[NUM]', 'g')) AS scrub_md5
         FROM documents ORDER BY doc_id""",

    "pipeline_url_dedup" ->
      """WITH urls AS (
           SELECT doc_id,
             'HTTPS://Example.COM/' || source || '/Page' || (doc_id % 40)
               || '/?utm_source=feed&b=' || (doc_id % 3)
               || '&a=' || (doc_id % 2) || '#frag' AS url
           FROM documents),
         canon AS (
           SELECT doc_id,
             CASE WHEN len(p) > 0 THEN base || '?' || p
                  ELSE base END AS canonical_url
           FROM (
             SELECT doc_id,
               regexp_replace(regexp_extract(l, '^([^?]*)', 1), '/$', '')
                 AS base,
               array_to_string(list_sort(list_filter(
                 string_split(regexp_extract(l, '\?(.*)$', 1), '&'),
                 x -> NOT (starts_with(x, 'utm_')
                   OR starts_with(x, 'fbclid=') OR x = 'fbclid'
                   OR starts_with(x, 'gclid=') OR x = 'gclid'
                   OR x = ''))), '&') AS p
             FROM (SELECT doc_id,
                     lower(regexp_extract(nf,
                       '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1))
                       || regexp_replace(nf,
                            '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '') AS l
                   FROM (SELECT doc_id,
                           regexp_replace(url, '#.*$', '') AS nf
                         FROM urls))))
         SELECT doc_id, canonical_url FROM (
           SELECT doc_id, canonical_url,
             row_number() OVER (PARTITION BY canonical_url
               ORDER BY doc_id) AS rn
           FROM canon) WHERE rn = 1 ORDER BY doc_id""",

    "pipeline_vocab_topk" ->
      """SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
         FROM (SELECT doc_id,
                 unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS token
               FROM documents)
         WHERE token <> '' GROUP BY token ORDER BY tf DESC, token LIMIT 100""",

    "cluster_kmeans_assign" ->
      """WITH c AS (SELECT vec_id, embedding FROM embeddings
                    ORDER BY vec_id LIMIT 8)
         SELECT e.vec_id,
           (SELECT c.vec_id FROM c
            ORDER BY list_cosine_similarity(e.embedding, c.embedding) DESC,
                     c.vec_id LIMIT 1) AS cluster_id
         FROM embeddings e ORDER BY e.vec_id""",

    "dedup_clusters" ->
      """WITH RECURSIVE
         d AS (SELECT doc_id, text FROM documents),
         keys AS (
           SELECT doc_id, substr(text, 1, 100) AS k FROM d
           UNION ALL
           SELECT doc_id,
             substr(text, greatest(1, length(text) - 99), 100) FROM d),
         mins AS (SELECT k, min(doc_id) AS v FROM keys GROUP BY k),
         star AS (SELECT keys.doc_id AS u, mins.v FROM keys
                  JOIN mins USING (k) WHERE keys.doc_id <> mins.v),
         edges AS (SELECT u, v FROM star UNION SELECT v, u FROM star),
         cc(u, l) AS (
           SELECT doc_id, doc_id FROM d
           UNION
           SELECT e.u, c.l FROM edges e JOIN cc c ON c.u = e.v)
         SELECT u AS doc_id, min(l) AS component FROM cc GROUP BY u
         ORDER BY doc_id""",

    // Multimodal: the oracle re-derives the arithmetic metadata and
    // checks the engine's resize math / frame cadence / decode
    // invariants independently (the codec stub's bytes are NOT checked).
    "multimodal_transform" ->
      """WITH m AS (
           SELECT doc_id AS media_id,
             (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
             CAST(doc_id * 37 % 1024 + 16 AS INT) AS w,
             CAST(doc_id * 59 % 768 + 16 AS INT) AS h
           FROM documents WHERE doc_id < 200
         )
         SELECT media_id, kind,
           true AS n_dims_ok, true AS in_range, true AS deterministic,
           CASE WHEN kind = 'image'
             THEN GREATEST(CAST(ROUND(w * LEAST(256.0 / w, 256.0 / h, 1.0)) AS INT), 1)
             ELSE w END AS width,
           CASE WHEN kind = 'image'
             THEN GREATEST(CAST(ROUND(h * LEAST(256.0 / w, 256.0 / h, 1.0)) AS INT), 1)
             ELSE h END AS height,
           CASE WHEN kind = 'video' AND media_id < 60
             THEN (media_id * 97 % 60000 + 999) // 10000 + 1
             ELSE NULL END AS n_frames
         FROM m ORDER BY media_id""",

    "multimodal_bmp_roundtrip" ->
      """WITH img AS (
           SELECT doc_id AS id,
             16 + (doc_id % 5) * 8 AS w,
             12 + (doc_id % 7) * 6 AS h
           FROM documents WHERE doc_id < 200 AND doc_id % 3 = 0),
         ys AS (SELECT id, w, h, unnest(generate_series(0, h - 1)) AS y FROM img),
         xy AS (SELECT id, w, h, y, unnest(generate_series(0, w - 1)) AS x FROM ys),
         orig AS (
           SELECT id, w, h,
             sum((x*7 + y*13 + id*31) % 256) AS sum_b,
             sum((x*11 + y*17 + id*43) % 256) AS sum_g,
             sum((x*19 + y*23 + id*59) % 256) AS sum_r
           FROM xy GROUP BY 1, 2, 3),
         rdim AS (
           SELECT id, w, h,
             CASE WHEN greatest(w, h) <= 32 THEN w
                  ELSE greatest(1, w * 32 // greatest(w, h)) END AS tw,
             CASE WHEN greatest(w, h) <= 32 THEN h
                  ELSE greatest(1, h * 32 // greatest(w, h)) END AS th
           FROM img),
         rys AS (SELECT id, w, h, tw, th,
                   unnest(generate_series(0, th - 1)) AS y2 FROM rdim),
         rxy AS (SELECT id, w, h, tw, th, y2,
                   unnest(generate_series(0, tw - 1)) AS x2 FROM rys),
         rs AS (
           SELECT id, tw, th,
             sum(((x2 * w // tw)*7 + (y2 * h // th)*13 + id*31) % 256) AS rs_sum_b
           FROM rxy GROUP BY 1, 2, 3)
         SELECT o.id AS media_id,
           CAST(o.w AS INT) AS width, CAST(o.h AS INT) AS height,
           CAST(o.sum_b AS BIGINT) AS sum_b, CAST(o.sum_g AS BIGINT) AS sum_g,
           CAST(o.sum_r AS BIGINT) AS sum_r,
           CAST(r.tw AS INT) AS rs_width, CAST(r.th AS INT) AS rs_height,
           CAST(r.rs_sum_b AS BIGINT) AS rs_sum_b,
           true AS png_matches_bmp, true AS png_resize_matches
         FROM orig o JOIN rs r USING (id) ORDER BY media_id""",

    "dedup_paragraphs" ->
      """WITH pages AS (
           SELECT d.doc_id,
             'SHARED LICENSE HEADER PARAGRAPH COMMON TO EVERY DOCUMENT'
               || chr(10) || d.text || chr(10) || b.text || chr(10) ||
               'SHARED FOOTER PARAGRAPH WITH CONTACT AND COPYRIGHT' AS page
           FROM documents d JOIN documents b ON b.doc_id = d.doc_id % 50),
         split AS (SELECT doc_id, string_split(page, chr(10)) AS parts FROM pages),
         paras AS (
           SELECT s.doc_id, gs.i AS pos, s.parts[gs.i] AS para
           FROM split s, LATERAL (
             SELECT unnest(generate_series(1, len(s.parts))) AS i) gs),
         ranked AS (
           SELECT doc_id, pos, para,
             row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
           FROM paras)
         SELECT doc_id,
           count(*) AS n_paras_kept,
           CAST(len(string_agg(para, chr(10) ORDER BY pos)) AS INT) AS n_chars2,
           md5(string_agg(para, chr(10) ORDER BY pos)) AS fp
         FROM ranked WHERE rn = 1
         GROUP BY doc_id ORDER BY doc_id""",

    "dedup_minhash_lsh" ->
      """SELECT doc_id AS idA, doc_id + 100000 AS idB FROM documents
         ORDER BY idA, idB""",

    "dedup_incremental_index" ->
      """SELECT doc_id + 100000 AS doc_id, TRUE AS is_dup FROM documents
         UNION ALL
         SELECT doc_id + 200000 AS doc_id, FALSE AS is_dup FROM documents
         ORDER BY doc_id""",

    "dedup_embedding_index" ->
      """SELECT vec_id + 100000 AS vec_id, TRUE AS is_dup FROM embeddings
         UNION ALL
         SELECT vec_id + 200000 AS vec_id, FALSE AS is_dup FROM embeddings
         ORDER BY vec_id""",

    "dedup_keep_best" ->
      """WITH m AS (
           SELECT doc_id AS d, doc_id % 7 AS q, (doc_id + 100000) % 7 AS q2
           FROM documents)
         SELECT doc_id, component, keep FROM (
           SELECT d AS doc_id, d AS component, q > q2 AS keep FROM m
           UNION ALL
           SELECT d + 100000 AS doc_id, d AS component, q2 > q AS keep FROM m)
         ORDER BY doc_id""",

    "dedup_simhash" ->
      """SELECT doc_id AS idA, doc_id + 100000 AS idB, CAST(0 AS INT) AS hamming
         FROM documents ORDER BY idA, idB""",

    // Exact all-pairs Jaccard, made tractable at any SF via the classic
    // prefix filter (Bayardo et al., WWW'07 "Scaling Up All Pairs
    // Similarity Search"): order each doc's distinct shingles by
    // ascending document frequency; a pair with J >= t MUST share a
    // shingle inside both docs' first (n - ceil(t*n) + 1) shingles, so
    // the candidate join touches prefixes only, then verifies exactly.
    // A J >= 0.8 pair also has set sizes within a 0.8 ratio (|I| >=
    // 0.8|U| >= 0.8*max, and min >= |I|), hence the 5:4 length gate.
    // 5*|I| >= 4*(|A|+|B|-|I|) is J >= 0.8 in exact integer arithmetic.
    // Shingles verify as 64-bit hashes — same collision class as the
    // engine's ShingleSet kernel. Result is elementwise identical to the
    // naive O(n^2) cross join (checked at sf0.01) but stays near-linear.
    "dedup_ngram_jaccard" ->
      """WITH docs AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 100000 AS doc_id, text || ' q' AS text FROM documents
         ),
         sh AS (
           SELECT doc_id,
             CASE WHEN len(toks) >= 3
               THEN list_distinct(list_transform(range(1, len(toks) - 1),
                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
               ELSE [array_to_string(toks, ' ')] END AS s0
           FROM (
             SELECT doc_id,
               list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0) AS toks
             FROM docs
           )
         ),
         tok AS (
           SELECT DISTINCT doc_id, hash(g) AS g
           FROM (SELECT doc_id, unnest(s0) AS g FROM sh)
         ),
         dfreq AS (SELECT g, count(*) AS c FROM tok GROUP BY g),
         ordered AS (
           SELECT t.doc_id, list(t.g ORDER BY d.c, t.g) AS s, count(*) AS n
           FROM tok t JOIN dfreq d USING (g) GROUP BY t.doc_id),
         pref AS (
           SELECT doc_id, n, unnest(s[1 : n - CAST(ceil(0.8 * n) AS INT) + 1]) AS g
           FROM ordered),
         cand AS (
           SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
           FROM pref a JOIN pref b
             ON a.g = b.g AND a.doc_id < b.doc_id
            AND a.n * 5 >= b.n * 4 AND b.n * 5 >= a.n * 4)
         SELECT c.ida AS idA, c.idb AS idB
         FROM cand c
         JOIN ordered x ON x.doc_id = c.ida
         JOIN ordered y ON y.doc_id = c.idb
         WHERE len(list_intersect(x.s, y.s)) * 5
               >= 4 * (x.n + y.n - len(list_intersect(x.s, y.s)))
         ORDER BY idA, idB""",

    "dedup_embedding" ->
      """SELECT vec_id AS idA, vec_id + 100000 AS idB FROM embeddings
         ORDER BY idA, idB""",

    "dedup_semantic" ->
      """SELECT vec_id AS id, FALSE AS is_dup FROM embeddings
         UNION ALL
         SELECT vec_id + 100000 AS id, TRUE AS is_dup FROM embeddings
         ORDER BY id""",

    "ann_lsh" ->
      """SELECT vec_id AS qid, vec_id AS cid FROM embeddings WHERE vec_id < 10
         UNION ALL
         SELECT vec_id AS qid, vec_id + 100000 AS cid FROM embeddings WHERE vec_id < 10
         ORDER BY qid, cid""",

    "ann_ivf" ->
      """SELECT vec_id AS qid, vec_id AS cid FROM embeddings WHERE vec_id < 10
         UNION ALL
         SELECT vec_id AS qid, vec_id + 100000 AS cid FROM embeddings WHERE vec_id < 10
         ORDER BY qid, cid""",

    "stream_dedup" ->
      "SELECT DISTINCT md5(text) AS digest FROM documents ORDER BY digest",

    "dedup_decontaminate" ->
      """WITH bench_docs AS (
           SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0
         ), train_docs AS (
           SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0
           UNION ALL
           SELECT doc_id + 200000 AS doc_id, 'copied: ' || text AS text
           FROM bench_docs
         ), bt AS (
           SELECT list_filter(string_split_regex(trim(lower(text)), '\s+'),
             x -> len(x) > 0) AS t
           FROM bench_docs
         ), tt AS (
           SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\s+'),
               x -> len(x) > 0) AS t
           FROM train_docs
         ), bg AS (
           SELECT DISTINCT unnest(CASE WHEN len(t) >= 8
             THEN list_transform(range(1, len(t) - 6),
                    i -> array_to_string(t[i:i+7], ' '))
             ELSE [array_to_string(t, ' ')] END) AS g
           FROM bt
         ), tg AS (
           SELECT doc_id, unnest(CASE WHEN len(t) >= 8
             THEN list_transform(range(1, len(t) - 6),
                    i -> array_to_string(t[i:i+7], ' '))
             ELSE [array_to_string(t, ' ')] END) AS g
           FROM tt
         )
         SELECT doc_id, CAST(count(DISTINCT g) AS BIGINT) AS n_hit_grams
         FROM tg JOIN bg USING (g)
         GROUP BY doc_id ORDER BY doc_id""",

    "dedup_bloom_decontaminate" ->
      """SELECT doc_id + 200000 AS doc_id, true AS flagged
         FROM documents
         WHERE doc_id % 97 = 0
           AND len(list_filter(string_split_regex(trim(text), '\s+'),
                 x -> len(x) > 0)) >= 8
         ORDER BY 1""",

    "dedup_exact" ->
      """SELECT doc_id, n_chars FROM (
           SELECT doc_id, n_chars,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
           FROM (
             SELECT doc_id, text, n_chars FROM documents
             UNION ALL
             SELECT doc_id + 100000, text, n_chars FROM documents
           )
         ) WHERE rn = 1 ORDER BY doc_id""",

    "dedup_substring" ->
      """WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 300000,
             array_to_string(list_filter(string_split_regex(trim(text), '\s+'),
               x -> len(x) > 0)[1:30], ' ')
           FROM documents WHERE doc_id % 37 = 0),
         toks AS (
           SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\s+'),
               x -> len(x) > 0) AS t
           FROM corpus),
         grams AS (
           SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+14], ' ') AS g
           FROM toks, LATERAL (
             SELECT unnest(generate_series(1, len(t) - 14)) AS i) s
           WHERE len(t) >= 15),
         dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
         dp AS (SELECT doc_id, pos FROM grams SEMI JOIN dup USING (g)),
         brk AS (
           SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
               > 15 THEN 1 ELSE 0 END AS b
           FROM dp),
         isl AS (
           SELECT doc_id, pos,
             sum(b) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS UNBOUNDED PRECEDING) AS island
           FROM brk)
         SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(pos) + 15 AS BIGINT) AS span_end,
           CAST(max(pos) + 15 - min(pos) AS BIGINT) AS n_tokens
         FROM isl GROUP BY doc_id, island
         ORDER BY doc_id, span_start""",

    "dedup_substring_drop" ->
      """WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 300000,
             array_to_string(list_filter(string_split_regex(trim(text), '\s+'),
               x -> len(x) > 0)[1:30], ' ')
           FROM documents WHERE doc_id % 37 = 0),
         toks AS (
           SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\s+'),
               x -> len(x) > 0) AS t
           FROM corpus),
         grams AS (
           SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+14], ' ') AS g
           FROM toks, LATERAL (
             SELECT unnest(generate_series(1, len(t) - 14)) AS i) s
           WHERE len(t) >= 15),
         dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
         dp AS (SELECT doc_id, pos FROM grams SEMI JOIN dup USING (g)),
         brk AS (
           SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
               > 15 THEN 1 ELSE 0 END AS b
           FROM dp),
         isl AS (
           SELECT doc_id, pos,
             sum(b) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS UNBOUNDED PRECEDING) AS island
           FROM brk),
         spans AS (
           SELECT doc_id, min(pos) AS s, max(pos) + 15 AS e
           FROM isl GROUP BY doc_id, island),
         tokpos AS (
           SELECT doc_id, i - 1 AS pos, t[i] AS tok
           FROM toks, LATERAL (
             SELECT unnest(generate_series(1, len(t))) AS i) s),
         kept AS (
           SELECT tp.doc_id, tp.pos, tp.tok FROM tokpos tp
           WHERE NOT EXISTS (
             SELECT 1 FROM spans sp
             WHERE sp.doc_id = tp.doc_id
               AND tp.pos >= sp.s AND tp.pos < sp.e)),
         agg AS (
           SELECT doc_id, count(*) AS n_kept,
             array_to_string(list(tok ORDER BY pos), ' ') AS new_text
           FROM kept GROUP BY doc_id),
         drops AS (
           SELECT doc_id, sum(e - s) AS n_dropped FROM spans GROUP BY doc_id)
         SELECT c.doc_id,
           CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_tokens_kept,
           CAST(coalesce(d.n_dropped, 0) AS BIGINT) AS n_tokens_dropped,
           md5(CASE WHEN d.doc_id IS NULL THEN c.text
                    ELSE coalesce(a.new_text, '') END) AS digest
         FROM corpus c
         LEFT JOIN agg a ON c.doc_id = a.doc_id
         LEFT JOIN drops d ON c.doc_id = d.doc_id
         ORDER BY c.doc_id""")
}
