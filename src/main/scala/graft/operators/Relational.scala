package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Core relational query library — the Spark-first re-expression of the
  * reference's dataflow operator inventory (SURVEY.md §2).
  *
  * Every query here is a declarative DataFrame program: Catalyst gets the
  * whole logical plan and picks broadcast-hash joins for the small
  * dimension side, partial+final hash aggregation, and
  * TakeOrderedAndProject for sort+limit — the physical shapes the
  * reference hand-rolled (e.g. the two-phase accumulator merge at
  * load_hbase.py:196-208, the `$sort+$limit` at mongodb_pipeline.py:14-15).
  *
  * Determinism contract (for the DuckDB hash-match oracle): every money /
  * floating aggregate is `round(x, 2..6)` in BOTH engines, every output is
  * fully ordered with a unique tiebreak key, and timestamps leave the
  * engine as formatted strings. At 100 TB the `round` stays map-side and
  * the order-by is only on final (small) results — never on raw fact rows.
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** Money rounding helper — 2dp, matching the reference's `round(x, 2)`
    * convention (dataset_generator.py:196,403-404). */
  private def m(c: Column): Column = round(c, 2)

  // --------------------------------------------------------------------
  // q01 — pricing summary (SURVEY A1/A13: grouped multi-aggregate).
  // Partial+final hash agg; one shuffle on the 2 low-cardinality keys.
  def pricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        m(sum(col("l_quantity"))).as("sum_qty"),
        m(sum(col("l_extendedprice"))).as("sum_base_price"),
        m(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("sum_disc_price"),
        m(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  // --------------------------------------------------------------------
  // q02 — top-5 parts by revenue (SURVEY A2/E3: the reference's Mongo
  // `$unwind→$group→$sort→$limit` pipeline, mongodb_pipeline.py:8-16,
  // plus its per-row `find_one` name lookups, mongodb_pipeline.py:23-25,
  // replaced by ONE broadcast join). TakeOrderedAndProject keeps the
  // top-N without a full sort; `part` is broadcast (small dim).
  def topPartsByRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val part = t(s, dir, "part")
    li.groupBy(col("l_partkey").as("p_partkey"))
      .agg(m(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue"))
      .join(broadcast(part.select(col("p_partkey"), col("p_name"))), "p_partkey")
      .select(col("p_partkey"), col("p_name"), col("revenue"))
      .orderBy(desc("revenue"), col("p_partkey"))
      .limit(5)
  }

  // --------------------------------------------------------------------
  // q03 — revenue by nation, top 10 (SURVEY E1: the flagship
  // revenue-by-state SQL at spark_processing.py:45-52 re-keyed to the
  // testdata's nation dimension). customer⋈nation is broadcast; the only
  // real shuffle is orders⋈customer + the final agg.
  def revenueByNation(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val nat = t(s, dir, "nation")
    val ord = t(s, dir, "orders")
    ord.join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(m(sum(col("o_totalprice"))).as("total_revenue"),
           count(lit(1)).as("order_count"))
      .orderBy(desc("total_revenue"), col("n_name"))
      .limit(10)
  }

  // --------------------------------------------------------------------
  // q04 — CLV (SURVEY E2, clv_integration.py:53-65): per-customer spend
  // LEFT JOIN per-user activity metrics, null-fill, derived columns.
  // Replaces the reference's driver-side Mongo/HBase round-trips with two
  // distributed partial+final aggs. The left join preserves the
  // degenerate mode (no activity ⇒ zero-filled metrics ⇒ clv 0) the
  // reference's golden CSV exhibits.
  def clv(s: SparkSession, dir: String): DataFrame = {
    val spend = t(s, dir, "orders")
      .groupBy(col("o_custkey").as("user_id"))
      .agg(m(sum(col("o_totalprice"))).as("total_spent"))
    val activity = t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("event_count"),
           m(sum(col("value"))).as("total_value"))
    // Derived columns stay UNROUNDED: they are deterministic IEEE-754
    // arithmetic over already-rounded aggregates, so Spark and the DuckDB
    // oracle produce bit-identical doubles. Rounding here would *break*
    // parity — Spark rounds the shortest decimal repr (BigDecimal.valueOf)
    // while DuckDB rounds the binary value, and clean-decimal products
    // land exactly on .5 boundaries (e.g. 55×2847.65/1000).
    val engagement = col("event_count") * col("total_value") / lit(1000.0)
    spend.join(activity, Seq("user_id"), "left")
      .select(
        col("user_id"),
        col("total_spent"),
        coalesce(col("event_count"), lit(0L)).as("event_count"),
        coalesce(col("total_value"), lit(0.0)).as("total_value"))
      .withColumn("engagement_score", engagement)
      .withColumn("clv", col("total_spent") * col("engagement_score"))
      .orderBy(col("user_id"))
  }

  // --------------------------------------------------------------------
  // q05 — compound predicate + projection (SURVEY P2-P4,
  // codes_in_book_of_statisct.ipynb cells 91-92 boolean-mask pattern).
  // Catalyst pushes p_size to the parquet scan; contains() stays a
  // codegen'd string predicate.
  def filterParts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .filter(col("p_size") > 30 &&
        (col("p_type").contains("PROMO") || col("p_type").contains("ECONOMY")))
      .select(col("p_partkey"), col("p_name"), col("p_type"), col("p_size"))
      .orderBy(col("p_partkey"))

  // --------------------------------------------------------------------
  // q06 — value_counts (SURVEY A10: `value_counts()` in
  // data_mining_Assignment1.ipynb cell 7).
  def orderPriorityCounts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("o_orderpriority"))

  // --------------------------------------------------------------------
  // q07 — describe()-style global stats (SURVEY A9/A13). One partial+final
  // agg, no shuffle of raw rows beyond the single-row combine.
  def quantityStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").agg(
      count(col("l_quantity")).as("n"),
      round(avg(col("l_quantity")), 4).as("mean_qty"),
      round(stddev_samp(col("l_quantity")), 4).as("std_qty"),
      round(var_samp(col("l_quantity")), 4).as("var_qty"),
      m(min(col("l_quantity"))).as("min_qty"),
      m(max(col("l_quantity"))).as("max_qty"),
      m(sum(col("l_quantity"))).as("sum_qty"))

  // --------------------------------------------------------------------
  // q08 — per-column missing fraction (SURVEY A12,
  // codes_in_book_of_statisct.ipynb cell 99) in one pass.
  def missingFractions(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    def frac(name: String) =
      round(avg(col(name).isNull.cast("double")), 4).as(s"missing_$name")
    c.agg(frac("c_custkey"), frac("c_name"), frac("c_nationkey"),
          frac("c_acctbal"), frac("c_mktsegment"))
  }

  // --------------------------------------------------------------------
  // q09 — conditional aggregation (SURVEY A5's `sum(when)` pattern — the
  // HBase per-(product,day) counter rollup at load_hbase.py:127-134).
  def conditionalAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_linestatus"))
      .agg(
        m(sum(when(col("l_returnflag") === "R", col("l_extendedprice"))
          .otherwise(lit(0.0)))).as("returned_revenue"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("returned_rows"),
        m(sum(col("l_extendedprice"))).as("total_revenue"))
      .orderBy(col("l_linestatus"))

  // --------------------------------------------------------------------
  // q10 — lag window (SURVEY W5: the `np.roll(y,1)` lag-1 feature,
  // data_mining_Assignment1.ipynb cell 52). Window order includes the
  // unique (orderkey, linenumber) tiebreak so the lag value is
  // deterministic under any partitioning.
  def lagQuantity(s: SparkSession, dir: String): DataFrame = {
    // l_quantity is part of the ordering: the testdata reuses
    // (orderkey, linenumber) pairs at sf0.1 (118k dups), so the "unique"
    // tiebreak needs the quantity to stay deterministic cross-engine
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"))
    t(s, dir, "lineitem")
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"),
        m(col("l_quantity")).as("qty"),
        m(lag(col("l_quantity"), 1).over(w)).as("prev_qty"))
      .orderBy(col("l_suppkey"), col("ship_date"), col("l_orderkey"),
        col("l_linenumber"), col("qty"))
  }

  // --------------------------------------------------------------------
  // q11 — running total (SURVEY W7: the order-dependent stock decrement,
  // dataset_generator.py:91-102, as a frame-spec window).
  def runningQuantity(s: SparkSession, dir: String): DataFrame = {
    // same duplicate-key caveat as lagQuantity: quantity joins the order
    val w = Window.partitionBy(col("l_partkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"),
        m(col("l_quantity")).as("qty"),
        m(sum(col("l_quantity")).over(w)).as("running_qty"))
      .orderBy(col("l_partkey"), col("ship_date"), col("l_orderkey"),
        col("l_linenumber"), col("qty"))
  }

  // --------------------------------------------------------------------
  // q12 — monthly trend (SURVEY A7: `groupby(to_period("M"))` at
  // visualizations.py:86). Month leaves as a string for oracle parity.
  def monthlyRevenue(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(m(sum(col("o_totalprice"))).as("revenue"),
           count(lit(1)).as("order_count"))
      .orderBy(col("month"))

  // --------------------------------------------------------------------
  // q13 — correlation (SURVEY A11: `df.corr()`,
  // data_mining_Assignment1.ipynb cell 26). Single-pass co-moment agg.
  def quantityPriceCorr(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").agg(
      round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
      round(corr(col("l_discount"), col("l_extendedprice")), 6).as("corr_disc_price"))

  // --------------------------------------------------------------------
  // q14 — top-10 customers by spend (SURVEY W1/A3). Agg first (shrinks to
  // |customers| rows), then broadcast-join the name.
  def topCustomers(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
    val cust = t(s, dir, "customer")
    ord.groupBy(col("o_custkey").as("c_custkey"))
      .agg(m(sum(col("o_totalprice"))).as("total_spent"),
           count(lit(1)).as("order_count"))
      .join(broadcast(cust.select(col("c_custkey"), col("c_name"))), "c_custkey")
      .select(col("c_custkey"), col("c_name"), col("total_spent"), col("order_count"))
      .orderBy(desc("total_spent"), col("c_custkey"))
      .limit(10)
  }

  // --------------------------------------------------------------------
  // q15 — anti join: customers with no orders (SURVEY set-op surface —
  // the `~train` complement pattern; also E2's left-join null side).
  // left_anti is shuffle-free on the broadcast-able side at this shape.
  // The anti-join probes the URGENT-priority order projection, not the
  // whole orders table: on the driver testdata every customer has at
  // least one order, so the unfiltered variant returns 0 rows every
  // round — a 0=0 oracle match that proves nothing about anti-join
  // semantics (round-10 verdict). Filtering the right side first keeps
  // the operator identical (NOT EXISTS against a derived relation — the
  // real-world "customers with no urgent orders" churn query) and makes
  // the oracle row load-bearing (~200 rows at sf0.01).
  def customersWithoutUrgentOrders(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val urgent = t(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    cust.join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  // q16 — semi join: suppliers that shipped at least one item with
  // quantity > 45 (EXISTS without duplication — no agg needed).
  def suppliersWithBigShipments(s: SparkSession, dir: String): DataFrame = {
    val sup = t(s, dir, "supplier")
    val li = t(s, dir, "lineitem")
      .filter(col("l_quantity") > 45).select(col("l_suppkey"))
    sup.join(li, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_suppkey"))
  }

  // --------------------------------------------------------------------
  // q17 — confusion-matrix-style pivot (SURVEY A14:
  // `groupBy(label).pivot(pred).count()`), expressed as conditional aggs
  // with explicit columns so the oracle schema is stable.
  def statusPriorityMatrix(s: SparkSession, dir: String): DataFrame = {
    val pri = Seq("1-URGENT" -> "urgent", "2-HIGH" -> "high",
      "3-MEDIUM" -> "medium", "4-NOT SPECIFIED" -> "not_specified",
      "5-LOW" -> "low")
    val aggs = pri.map { case (v, n) =>
      sum(when(col("o_orderpriority") === v, 1L).otherwise(0L)).as(s"n_$n")
    }
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("o_orderstatus"))
  }

  // --------------------------------------------------------------------
  // q18 — hourly event rollup (SURVEY A5/A7 time bucketing; the streaming
  // counterpart lives in graft.streaming.Sessionize). At 100 TB this is
  // the canonical "partition by time bucket" agg — one shuffle on
  // (hour, event_type), both low-cardinality.
  def hourlyEvents(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm").as("hour"),
               col("event_type"))
      .agg(count(lit(1)).as("n"),
           m(sum(col("value"))).as("total_value"))
      .orderBy(col("hour"), col("event_type"))

  // --------------------------------------------------------------------
  // q19 — semi-structured extraction (SURVEY F16's JSON surface): pull the
  // numeric `k` out of the props JSON string with a codegen'd regexp (no
  // UDF), then aggregate.
  def eventPropsExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      // nullif guards the no-match case: regexp_extract returns '' and
      // ''::long throws under Spark 4's default ANSI mode
      .withColumn("k",
        nullif(regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1), lit(""))
          .cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("k")).as("sum_k"),
           round(avg(col("k")), 4).as("avg_k"))
      .orderBy(col("event_type"))

  // --------------------------------------------------------------------
  // q20 — distinct + count-distinct surface (SURVEY's `collect_set` /
  // distinct family): market segments with exact + approx distinct
  // customer counts. approx_count_distinct (HLL) is the 100-TB path —
  // constant memory, no distinct shuffle.
  def segmentDistincts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .groupBy(col("c_mktsegment"))
      .agg(countDistinct(col("c_nationkey")).as("n_nations"),
           count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))

  // --------------------------------------------------------------------
  // q32 — grouped simple OLS (SURVEY M1 as a pure-SQL aggregate): slope /
  // intercept / R² of extendedprice ~ quantity per return flag, from the
  // closed-form moments. One pass, partial+final agg — the distributed
  // formulation of the notebook's per-group regression.
  def groupedOls(s: SparkSession, dir: String): DataFrame = {
    val x = col("l_quantity")
    val y = col("l_extendedprice")
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        round(covar_pop(x, y) / var_pop(x), 6).as("slope"),
        round(avg(y) - (covar_pop(x, y) / var_pop(x)) * avg(x), 4).as("intercept"),
        round(pow(corr(x, y), 2), 6).as("r2"))
      .orderBy(col("l_returnflag"))
  }

  // q33 — union + distinct (SURVEY set-op surface: the batch-merge
  // `extend` ≡ unionByName): nations present on either side of the
  // customer/supplier relationship, with provenance counts.
  def nationPresence(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .select(col("c_nationkey").as("nationkey"), lit("customer").as("side"))
    val p = t(s, dir, "supplier")
      .select(col("s_nationkey").as("nationkey"), lit("supplier").as("side"))
    c.unionByName(p)
      .groupBy(col("nationkey"), col("side"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("nationkey"), col("side"))
  }

  // q34 — binning (SURVEY F7: `pd.cut` → CASE chain / Bucketizer):
  // order-value bands with per-band stats.
  def orderValueBins(s: SparkSession, dir: String): DataFrame = {
    val band = when(col("o_totalprice") < 50000, "a_lt50k")
      .when(col("o_totalprice") < 150000, "b_50k_150k")
      .when(col("o_totalprice") < 300000, "c_150k_300k")
      .otherwise("d_ge300k")
    t(s, dir, "orders")
      .groupBy(band.as("price_band"))
      .agg(count(lit(1)).as("n"),
           m(sum(col("o_totalprice"))).as("band_revenue"))
      .orderBy(col("price_band"))
  }

  // q35 — string function family (SURVEY F8-F11: concat/format, split/
  // substring, replace/normalize, case/contains) in one projection.
  def stringOps(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(
        col("p_partkey"),
        concat_ws("#", col("p_brand"), col("p_type")).as("brand_type_key"),
        upper(col("p_name")).as("name_upper"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        regexp_replace(col("p_brand"), "[^0-9]", "").as("brand_num"),
        length(col("p_name")).cast("long").as("name_len"),
        split(col("p_name"), " ").getItem(0).as("first_word"),
        col("p_name").contains("green").cast("int").as("has_green"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("padded_key"))
      .orderBy(col("p_partkey"))

  // q36 — date/timestamp family (SURVEY F12-F13: parse/format/bucket,
  // arithmetic): per-order ship latency stats from the lineitem join.
  def shipLatency(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val ord = t(s, dir, "orders")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(
        year(col("o_orderdate")).cast("long").as("order_year"),
        quarter(col("o_orderdate")).cast("long").as("order_quarter"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("lag_days"))
      .groupBy(col("order_year"), col("order_quarter"))
      .agg(count(lit(1)).as("n"),
           round(avg(col("lag_days")), 4).as("avg_lag_days"),
           max(col("lag_days")).as("max_lag_days"))
      .orderBy(col("order_year"), col("order_quarter"))
  }

  // q39 — exact quartiles (SURVEY A9: describe()'s 25/50/75%): the exact
  // `percentile` (linear interpolation), per return flag. At 100 TB the
  // approx_count_distinct-style sketch (`percentile_approx`) replaces
  // this; exact is kept where the oracle demands bit parity.
  def quantityQuartiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, array(0.25D, 0.5D, 0.75D))").as("_q"),
           count(lit(1)).as("n"))
      .select(col("l_returnflag"),
        round(element_at(col("_q"), 1), 4).as("q25"),
        round(element_at(col("_q"), 2), 4).as("q50"),
        round(element_at(col("_q"), 3), 4).as("q75"),
        col("n"))
      .orderBy(col("l_returnflag"))

  /** The 100-TB form of [[quantityQuartiles]]: `percentile_approx`
    * (t-digest-style mergeable sketch, bounded memory per group) instead
    * of exact `percentile`, whose agg buffer holds EVERY value of the
    * group — with a handful of return-flag groups, an executor-OOM plan
    * at corpus scale. `accuracy` trades sketch size for error; the spec
    * pins the approx results within tolerance of the exact form. Exact
    * stays the shipped q39 only because the oracle demands bit parity. */
  def quantityQuartilesApprox(s: SparkSession, dir: String,
                              accuracy: Int = 10000): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(expr(s"percentile_approx(l_quantity, array(0.25D, 0.5D, 0.75D), $accuracy)").as("_q"),
           count(lit(1)).as("n"))
      .select(col("l_returnflag"),
        round(element_at(col("_q"), 1), 4).as("q25"),
        round(element_at(col("_q"), 2), 4).as("q50"),
        round(element_at(col("_q"), 3), 4).as("q75"),
        col("n"))
      .orderBy(col("l_returnflag"))

  // q40 — collect_set + array_sort (SURVEY F14/set-dedup surface):
  // per-nation sorted distinct segment list, emitted as a CSV string for
  // stable cross-engine schema.
  def nationSegments(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .groupBy(col("c_nationkey"))
      .agg(array_join(array_sort(collect_set(col("c_mktsegment"))), ",")
             .as("segments"),
           countDistinct(col("c_mktsegment")).as("n_segments"))
      .orderBy(col("c_nationkey"))

  // q41 — ROLLUP hierarchy totals (year → status → grand total): the
  // multi-level rollup a reporting layer runs as ONE pass instead of
  // three separate aggregations.
  def orderRollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .withColumn("order_year", year(col("o_orderdate")).cast("long"))
      .rollup(col("order_year"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), m(sum(col("o_totalprice"))).as("revenue"))
      .orderBy(asc_nulls_first("order_year"), asc_nulls_first("o_orderstatus"))

  // q42 — batch gap-based sessionization (the batch twin of
  // streaming.Sessionize.sessionize): a new session starts after
  // `gap` of inactivity. lag → gap flag → running sum = session number —
  // the canonical two-window formulation; both windows share the same
  // partitioning so Catalyst plans ONE shuffle on user_id.
  def sessionizeEvents(s: SparkSession, dir: String,
                       gapMs: Long = 1800000L): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .withColumn("_ms", unix_millis(col("ts")))
      .withColumn("_new",
        when(col("_ms") - lag(col("_ms"), 1).over(byUser) > gapMs, 1L)
          .otherwise(when(lag(col("_ms"), 1).over(byUser).isNull, 1L).otherwise(0L)))
      .withColumn("session_no", sum(col("_new")).over(running))
      .groupBy(col("user_id"), col("session_no"))
      .agg(count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        m(sum(col("value"))).as("total_value"))
      .orderBy(col("user_id"), col("session_no"))
  }

  // q49 — referential-integrity audit across the star schema (the
  // data-validation stage every pipeline runs on landing): orphan-FK
  // counts via anti-join semantics, one row per relationship. Each count
  // is a broadcast-dim anti join — no full shuffle of fact rows.
  /** One relationship audit — the single-relationship form of
    * [[fkOrphansMulti]] (ONE implementation of the distinct-dim
    * broadcast-left-join orphan count, so the two entry points cannot
    * drift). The dim side is deduplicated before the join so a duplicate
    * dim primary key (the very defect an audit exists to surface) cannot
    * multiply fact rows and inflate `n_rows`. */
  def fkOrphans(name: String, fact: DataFrame, fk: String,
                dim: DataFrame, pk: String): DataFrame =
    fkOrphansMulti(fact, Seq((name, fk, dim, pk)))

  /** Audit SEVERAL foreign keys of one fact table in a SINGLE scan:
    * chained broadcast left joins to the distinct dim keys, one
    * aggregate carrying every orphan counter, then a `stack` unpivot of
    * that single row into one output row per relationship. At 100 TB
    * the fact is read once for all its relationships instead of once
    * per relationship — the scan, not the broadcast joins, is the cost
    * that multiplies. `rels` = (name, fkCol, dim, pkCol). */
  def fkOrphansMulti(fact: DataFrame,
                     rels: Seq[(String, String, DataFrame, String)]): DataFrame = {
    val joined = rels.foldLeft(fact.select(rels.map(r => col(r._2)): _*)) {
      case (df, (_, fk, dim, pk)) =>
        df.join(broadcast(dim.select(col(pk)).distinct()),
          col(fk) === col(pk), "left")
    }
    val aggs = count(lit(1)).as("n_rows") +: rels.map { case (_, _, _, pk) =>
      sum(when(col(pk).isNull, 1L).otherwise(0L)).as(s"_orph_$pk")
    }
    val one = joined.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rels.map { case (name, _, _, pk) =>
      s"'$name', n_rows, _orph_$pk"
    }.mkString(", ")
    one.selectExpr(
      s"stack(${rels.size}, $stackArgs) AS (relationship, n_rows, n_orphans)")
  }

  def fkAudit(s: SparkSession, dir: String): DataFrame = {
    // all six audits run as one unioned job; the three lineitem
    // relationships share ONE fact scan via fkOrphansMulti
    val liAudit = fkOrphansMulti(t(s, dir, "lineitem"), Seq(
      ("lineitem.orderkey->orders", "l_orderkey", t(s, dir, "orders"), "o_orderkey"),
      ("lineitem.partkey->part", "l_partkey", t(s, dir, "part"), "p_partkey"),
      ("lineitem.suppkey->supplier", "l_suppkey", t(s, dir, "supplier"), "s_suppkey")))
    Seq(
      liAudit,
      fkOrphans("orders.custkey->customer", t(s, dir, "orders"), "o_custkey", t(s, dir, "customer"), "c_custkey"),
      fkOrphans("customer.nationkey->nation", t(s, dir, "customer"), "c_nationkey", t(s, dir, "nation"), "n_nationkey"),
      fkOrphans("nation.regionkey->region", t(s, dir, "nation"), "n_regionkey", t(s, dir, "region"), "r_regionkey"))
      .reduce(_ unionByName _)
      .orderBy(col("relationship"))
  }

  /** q54 — behavioral conversion funnel over the event stream: users who
    * viewed, users who clicked AFTER a view, users who purchased AFTER
    * such a click — the strict-event-order semantics a naive
    * "has all three types" query gets wrong. Three chained running
    * windows carry the stage flags; all three share the SAME (user_id,
    * ordered ts) partitioning, so Catalyst plans ONE shuffle for the
    * whole funnel, then a per-user max and a single global aggregate.
    * Rates are exact integer-count divisions (bit-stable cross-engine). */
  def conversionFunnel(s: SparkSession, dir: String): DataFrame =
    conversionFunnelFrom(t(s, dir, "events"))

  /** Core funnel over any (user_id, ts, event_id, event_type) frame —
    * separated from the table binding so specs can pin the strict-order
    * gating on hand-built event sequences (the synthetic corpus converts
    * every user at every stage, which discriminates nothing). */
  def conversionFunnelFrom(events: DataFrame): DataFrame =
    conversionFunnelFrom(events, Seq("view", "click", "purchase"))

  /** k-stage strict-order funnel (the match_recognize-style general
    * form): a user qualifies for stage i only on an event of type
    * `stages(i)` that occurs STRICTLY AFTER an event that qualified for
    * stage i−1. The stage chain is generated by a fold — one qualifying
    * flag plus one strictly-earlier running-max window per stage — and
    * every window shares the SAME (user_id, ts-ordered) spec, so
    * Catalyst plans ONE shuffle for the whole funnel regardless of k.
    * Rates are exact integer-count divisions (bit-stable cross-engine).
    * Stage labels are `1_<s0>` then `<i+1>_<si>_after_<si-1>`; ordering
    * rides the explicit `stage_idx` int column, so funnels past 9 stages
    * order correctly (a lexicographic label sort would put 10 before 2). */
  def conversionFunnelFrom(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct == stages, "funnel stages must be distinct")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1) // strictly-earlier rows
    val base = events.select(col("user_id"), col("ts"), col("event_id"),
      col("event_type"))
    val staged = stages.zipWithIndex.foldLeft(base) {
      case (df, (st, 0)) =>
        df.withColumn("_q0", when(col("event_type") === st, 1).otherwise(0))
      case (df, (st, i)) =>
        df.withColumn(s"_q$i",
          when(col("event_type") === st &&
            coalesce(max(col(s"_q${i - 1}")).over(w), lit(0)) === 1, 1)
            .otherwise(0))
    }
    val perUser = staged.groupBy(col("user_id"))
      .agg(max(col("_q0")).as("_r0"),
        stages.indices.tail.map(i => max(col(s"_q$i")).as(s"_r$i")): _*)
    val sums = count(lit(1)).as("n_total") +:
      stages.indices.map(i => sum(col(s"_r$i")).cast("long").as(s"_n$i"))
    val rated = stages.indices.foldLeft(perUser.agg(sums.head, sums.tail: _*)) {
      case (df, 0) =>
        df.withColumn("_rate0", col("_n0").cast("double") / col("n_total"))
      case (df, i) =>
        df.withColumn(s"_rate$i",
          when(col(s"_n${i - 1}") === 0, lit(null))
            .otherwise(col(s"_n$i").cast("double") / col(s"_n${i - 1}")))
    }
    def label(i: Int): String =
      if (i == 0) s"1_${stages(0)}"
      else s"${i + 1}_${stages(i)}_after_${stages(i - 1)}"
    // stage names are data-derived strings headed into a selectExpr
    // literal — escape them, or a quote in an event type breaks parsing
    def sqlLit(s: String): String =
      "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    val stackArgs = stages.indices
      .map(i => s"${i + 1}, ${sqlLit(label(i))}, _n$i, _rate$i").mkString(", ")
    rated.selectExpr(
      s"stack(${stages.size}, $stackArgs) AS (stage_idx, stage, n_users, conv_rate)")
      .orderBy(col("stage_idx"))
  }

  // q50 — multi-column describe() (SURVEY A9 in breadth): ALL per-column
  // stats in ONE aggregate over ONE fact scan, then a `stack` unpivot
  // into one row per column (the fkOrphansMulti technique). The earlier
  // one-agg-per-column union read lineitem four times — at 100 TB that
  // is four full scans of the fact for a 4-row result.
  def describeLineitem(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val aggs = cols.flatMap { c => Seq(
      count(col(c)).as(s"_n_$c"),
      round(avg(col(c)), 4).as(s"_mean_$c"),
      round(stddev_samp(col(c)), 4).as(s"_std_$c"),
      m(min(col(c))).as(s"_min_$c"),
      m(max(col(c))).as(s"_max_$c"))
    }
    val one = t(s, dir, "lineitem").agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', _n_$c, _mean_$c, _std_$c, _min_$c, _max_$c")
      .mkString(", ")
    one.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS (`column`, n, mean, std, min, max)")
      .orderBy(col("column"))
  }

  /** q55 — as-of join: each order paired with the customer's most
    * recent event AT OR BEFORE the order date (the temporal-lookup
    * operator the prompt's custom-operator ladder names; reference
    * analogue: the stateful generation-time lookups in
    * dataset_generator.py). Spark has no native verb, and the naive
    * range join (`e.ts <= o.date` + per-order argmax) explodes to
    * |orders|×|events-per-user| intermediate rows. The SCALABLE form is
    * not a join at all: union-tag both sides onto one (user, time) axis,
    * shuffle ONCE on user_id, and a running `last(…, ignoreNulls)`
    * window carries the latest event forward into every later order row
    * — cost is a sort within each user partition, independent of how
    * many events precede each order. Ties: event rows sort before order
    * rows at equal ts (as-of is inclusive), larger event_id wins among
    * equal-ts events (deterministic). */
  def asofLastEvent(s: SparkSession, dir: String): DataFrame =
    asofLastEventFrom(t(s, dir, "events"), t(s, dir, "orders"))

  /** Core as-of over any (user_id, ts, event_id, event_type) events
    * frame and (o_orderkey, o_custkey, o_orderdate, o_totalprice) orders
    * frame — split from the table binding so specs can pin the inclusive
    * boundary, tie-break, and no-prior-event cases on hand-built rows. */
  def asofLastEventFrom(events: DataFrame, orders: DataFrame): DataFrame = {
    val ev = events.select(
      col("user_id").as("uid"), col("ts"),
      lit(0).as("_kind"), col("event_id").as("_tie"),
      col("ts").as("_ev_ts"), col("event_type").as("_ev_type"),
      lit(null).cast("long").as("o_orderkey"),
      lit(null).cast("double").as("o_totalprice"))
    val ord = orders.select(
      col("o_custkey").as("uid"), col("o_orderdate").as("ts"),
      lit(1).as("_kind"), lit(0L).as("_tie"),
      lit(null).cast("timestamp").as("_ev_ts"),
      lit(null).cast("string").as("_ev_type"),
      col("o_orderkey"), col("o_totalprice"))
    val w = Window.partitionBy(col("uid"))
      .orderBy(col("ts"), col("_kind"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.unionByName(ord)
      .withColumn("_last_ts", last(col("_ev_ts"), ignoreNulls = true).over(w))
      .withColumn("_last_type", last(col("_ev_type"), ignoreNulls = true).over(w))
      .filter(col("_kind") === 1)
      .select(col("o_orderkey"), col("uid").as("o_custkey"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("order_ts"),
        m(col("o_totalprice")).as("o_totalprice"),
        date_format(col("_last_ts"), "yyyy-MM-dd HH:mm:ss").as("last_event_ts"),
        col("_last_type").as("last_event_type"))
  }

  /** q56 — skew-salted aggregation, oracle-checked: the two-stage
    * salted group-sum from [[Skew.saltedGroupSum]] over the 3-value
    * l_returnflag key (the canonical hot-key shape), proving the salt →
    * partial → final rewrite is RESULT-IDENTICAL to the plain GROUP BY
    * the oracle runs. The salt spreads each hot key over `factor` tasks;
    * only the partitioning changes. */
  def saltedRevenue(s: SparkSession, dir: String): DataFrame =
    Skew.saltedGroupSum(t(s, dir, "lineitem"), "l_returnflag", "l_extendedprice")
      .select(col("l_returnflag"),
        m(col("sum_l_extendedprice")).as("sum_price"), col("n"))
      .orderBy(col("l_returnflag"))

  // q37 — per-group argmax (SURVEY W8: head-of-sorted / max_by): each
  // customer's single largest order, via row_number window (the
  // deterministic distributed form of `argmax`).
  def largestOrderPerCustomer(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"),
        m(col("o_totalprice")).as("best_price"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
      .orderBy(col("o_custkey"))
  }
}
