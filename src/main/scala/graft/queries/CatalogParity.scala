package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Core, RefFunctions => F}
import graft.sources.Tables

import Shared._

/** TPC-H-shaped parity: scans, filters, joins, aggregates, windows, set ops (SURVEY §2.4–§2.9 heads). Split from the single-file catalog in round 8;
  * query text unchanged. Registration stays in [[QueryCatalog.all]]. */
private[queries] object CatalogParity {


  // ---------------------------------------------------------------- parity

  /** A1-family hash aggregate (SURVEY §2.4): TPC-H-Q1-shaped pricing summary.
    * One shuffle (partial+final HashAggregate); filter + 7-column projection
    * pushed into the parquet scan. */
  private val q01 = Q(
    "q01_pricing_summary",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      li.filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          r2(sum(col("l_quantity"))).as("sum_qty"),
          r2(sum(col("l_extendedprice"))).as("sum_base_price"),
          r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
          r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))).as("sum_charge"),
          r2(avg(col("l_quantity"))).as("avg_qty"),
          r2(avg(col("l_extendedprice"))).as("avg_price"),
          r2(avg(col("l_discount"))).as("avg_disc"),
          count(lit(1)).as("count_order"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
        floor(sum(l_quantity)*100 + 0.5)/100 AS sum_qty,
        floor(sum(l_extendedprice)*100 + 0.5)/100 AS sum_base_price,
        floor(sum(l_extendedprice*(1-l_discount))*100 + 0.5)/100 AS sum_disc_price,
        floor(sum(l_extendedprice*(1-l_discount)*(1+l_tax))*100 + 0.5)/100 AS sum_charge,
        floor(avg(l_quantity)*100 + 0.5)/100 AS avg_qty,
        floor(avg(l_extendedprice)*100 + 0.5)/100 AS avg_price,
        floor(avg(l_discount)*100 + 0.5)/100 AS avg_disc,
        count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus"""))

  /** P1/P3/F1/F5 (SURVEY §2.2): selective filter + computed projection.
    * Both predicates reach the scan as PushedFilters; no shuffle at all. */
  private val q02 = Q(
    "q02_filter_project",
    (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1996-07-01")) &&
          col("l_quantity") < 5)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          r2(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          col("l_returnflag")),
    Some("""
      SELECT l_orderkey, l_linenumber,
        floor(l_extendedprice*(1-l_discount)*100 + 0.5)/100 AS revenue,
        l_returnflag
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-07-01' AND l_quantity < 5"""))

  /** J1 (SURVEY §2.3): fact enriched through a chain of broadcast dims —
    * the reference's dict-lookup join (exchage_rate_crawler.py:338-347)
    * re-expressed as BroadcastHashJoin; only the final groupBy shuffles. */
  private val q03 = Q(
    "q03_broadcast_enrich",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val sup = Tables.supplier(s, d)
      val nat = Tables.nation(s, d)
      val reg = Tables.region(s, d)
      // nation/region are FIXED-SIZE dims -> always hinted; supplier grows
      // with SF, so it relies on autoBroadcastJoinThreshold/AQE (which
      // picks broadcast at bench scale and shuffle at 100 TB, correctly)
      li.join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
          count(lit(1)).as("n_items"))
    },
    Some("""
      SELECT r_name, n_name,
        floor(sum(l_extendedprice*(1-l_discount))*100 + 0.5)/100 AS revenue,
        count(*) AS n_items
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name"""))

  /** J2-style left join + miss defaults (SURVEY §2.3; the README.md:119
    * LEFT-JOIN-for-coverage design): every fact row survives, misses get
    * 'N/A' via coalesce. */
  private val q04 = Q(
    "q04_left_join_defaults",
    (s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      o.join(c, col("o_custkey") === col("c_custkey"), "left")
        .withColumn("segment", coalesce(col("c_mktsegment"), lit("N/A")))
        .groupBy(col("segment"))
        .agg(
          count(lit(1)).as("n_orders"),
          r2(sum(col("o_totalprice"))).as("total_price"))
    },
    Some("""
      SELECT coalesce(c_mktsegment, 'N/A') AS segment,
        count(*) AS n_orders,
        floor(sum(o_totalprice)*100 + 0.5)/100 AS total_price
      FROM orders LEFT JOIN customer ON o_custkey = c_custkey
      GROUP BY 1"""))

  /** A3 pivot (SURVEY §2.4): the 4-rate-types→wide-record upsert-pivot
    * (exchage_rate_crawler.py:386-426) re-expressed as conditional
    * aggregation — one hash aggregate, DuckDB-mirrorable, no second pass. */
  private val q05 = Q(
    "q05_pivot_priority",
    (s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      def slot(p: String) = r2(sum(when(col("o_orderpriority") === p, col("o_totalprice"))))
      o.join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          slot("1-URGENT").as("p1_urgent"),
          slot("2-HIGH").as("p2_high"),
          slot("3-MEDIUM").as("p3_medium"),
          slot("4-NOT SPECIFIED").as("p4_notspec"),
          slot("5-LOW").as("p5_low"),
          count(lit(1)).as("n_orders"))
    },
    Some("""
      SELECT n_name,
        floor(sum(CASE WHEN o_orderpriority='1-URGENT' THEN o_totalprice END)*100 + 0.5)/100 AS p1_urgent,
        floor(sum(CASE WHEN o_orderpriority='2-HIGH' THEN o_totalprice END)*100 + 0.5)/100 AS p2_high,
        floor(sum(CASE WHEN o_orderpriority='3-MEDIUM' THEN o_totalprice END)*100 + 0.5)/100 AS p3_medium,
        floor(sum(CASE WHEN o_orderpriority='4-NOT SPECIFIED' THEN o_totalprice END)*100 + 0.5)/100 AS p4_notspec,
        floor(sum(CASE WHEN o_orderpriority='5-LOW' THEN o_totalprice END)*100 + 0.5)/100 AS p5_low,
        count(*) AS n_orders
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name"""))

  /** W1/A1/A2 + F6→F9 (SURVEY §2.4, §2.5, §2.8): the full Google-Trends
    * scoring chain — last-15 vs previous-15 means, the faithful epsilon
    * blow-up branch, log-scale, normalize, clamped final score — per
    * user_id over events. One window shuffle + one aggregate on user_id. */
  private val q06 = Q(
    "q06_trend_scores",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id").desc)
      val ranked = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("value"))
        .withColumn("rn", row_number().over(w))
      val agg = ranked.groupBy(col("user_id")).agg(
        avg(when(col("rn") <= 15, col("value"))).as("recent"),
        avg(when(col("rn").between(16, 30), col("value"))).as("prev"),
        max(when(col("rn") === 1, col("value"))).as("cur"))
      val growth = F.rawGrowthKeyword(col("recent"), col("prev"))
      val scaled = F.logScaleGrowth(growth)
      val norm = F.normalizeGrowth(scaled)
      agg.select(
        col("user_id"),
        r2(col("recent")).as("recent_avg"),
        r2(coalesce(col("prev"), lit(0.0))).as("prev_avg"),
        r2(growth).as("raw_growth"),
        r2(norm).as("norm_growth"),
        r2(col("cur")).as("current_interest"),
        r2(F.finalTrendScore(norm, col("cur"))).as("final_trend_score"))
    },
    Some("""
      WITH ranked AS (
        SELECT user_id, value,
          row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        FROM events),
      agg AS (
        SELECT user_id,
          avg(CASE WHEN rn <= 15 THEN value END) AS recent,
          avg(CASE WHEN rn BETWEEN 16 AND 30 THEN value END) AS prev,
          max(CASE WHEN rn = 1 THEN value END) AS cur
        FROM ranked GROUP BY user_id),
      g AS (
        SELECT user_id, recent, prev, cur,
          CASE WHEN prev IS NOT NULL AND prev > 0 THEN (recent - prev)/prev
               WHEN recent IS NOT NULL AND recent > 0 THEN recent/1e-6
               ELSE 0.0 END AS growth
        FROM agg),
      n AS (
        SELECT user_id, recent, prev, cur, growth,
          CASE WHEN s > 0 THEN least(s/10*100, 100.0) ELSE 0.0 END AS norm
        FROM (SELECT *, CASE WHEN growth > 0 THEN log10(1.0 + growth)
                             WHEN growth < 0 THEN growth ELSE 0.0 END AS s FROM g))
      SELECT user_id,
        floor(recent*100 + 0.5)/100 AS recent_avg,
        floor(coalesce(prev, 0.0)*100 + 0.5)/100 AS prev_avg,
        floor(growth*100 + 0.5)/100 AS raw_growth,
        floor(norm*100 + 0.5)/100 AS norm_growth,
        floor(cur*100 + 0.5)/100 AS current_interest,
        floor(least(100.0, greatest(0.0, norm*0.7 + cur*0.3))*100 + 0.5)/100 AS final_trend_score
      FROM n"""))

  /** W2 dedup-to-latest (SURVEY §2.5): latest event per user ("latest crawl
    * wins"). event_id is the unique, time-ordered tiebreak. */
  private val q07 = Q(
    "q07_dedup_latest",
    (s, d) =>
      Core.dedupLatest(
        Tables.events(s, d).select(col("user_id"), col("event_id"), col("event_type"), col("value")),
        Seq("user_id"), Seq(col("event_id"))),
    Some("""
      SELECT user_id, event_id, event_type, value FROM (
        SELECT user_id, event_id, event_type, value,
          row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        FROM events) WHERE rn = 1"""))

  /** W3 top-1-per-group (SURVEY §2.5): cheapest part per brand. */
  private val q08 = Q(
    "q08_top1_per_group",
    (s, d) =>
      Core.topKPerGroup(
        Tables.part(s, d).select(col("p_brand"), col("p_partkey"), col("p_retailprice")),
        Seq("p_brand"), Seq(col("p_retailprice").asc, col("p_partkey").asc), 1),
    Some("""
      SELECT p_brand, p_partkey, p_retailprice FROM (
        SELECT p_brand, p_partkey, p_retailprice,
          row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice ASC, p_partkey ASC) AS rn
        FROM part) WHERE rn = 1"""))

  /** O2 global top-k (SURVEY §2.6): compiles to TakeOrderedAndProject —
    * per-partition top-k then driver merge, no full sort at scale. */
  private val q09 = Q(
    "q09_global_topk",
    (s, d) =>
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("o_totalprice")),
    Some("""
      SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"""))

  /** §2.7 union (pd.concat at _archive/function_app.py:183): tagged
    * unionByName of two filtered subsets. */
  private val q10 = Q(
    "q10_union_tagged",
    (s, d) => {
      val c = Tables.customer(s, d)
      val high = c.filter(col("c_acctbal") > 7000)
        .select(col("c_custkey"), lit("high").as("tier"), r2(col("c_acctbal")).as("acctbal"))
      val low = c.filter(col("c_acctbal") < 1000)
        .select(col("c_custkey"), lit("low").as("tier"), r2(col("c_acctbal")).as("acctbal"))
      Core.unionAll(Seq(high, low))
    },
    Some("""
      SELECT c_custkey, 'high' AS tier, floor(c_acctbal*100 + 0.5)/100 AS acctbal
      FROM customer WHERE c_acctbal > 7000
      UNION ALL
      SELECT c_custkey, 'low' AS tier, floor(c_acctbal*100 + 0.5)/100 AS acctbal
      FROM customer WHERE c_acctbal < 1000"""))

  /** F12/F17/F21 calendar functions (SURVEY §2.8): yyyyMM month keys
    * (exchage_rate_crawler.py:548) as grouping keys. */
  private val q11 = Q(
    "q11_month_key",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy(F.monthKey(col("o_orderdate")).as("month_key"))
        .agg(count(lit(1)).as("n_orders"), r2(sum(col("o_totalprice"))).as("total_price")),
    Some("""
      SELECT strftime(o_orderdate, '%Y%m') AS month_key,
        count(*) AS n_orders,
        floor(sum(o_totalprice)*100 + 0.5)/100 AS total_price
      FROM orders GROUP BY 1"""))

  /** F19/S6 JSON access (SURVEY §2.8): extract `k` from the props JSON
    * payload, bucket it, aggregate. get_json_object stays codegen'd. */
  private val q12 = Q(
    "q12_json_extract",
    (s, d) =>
      Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .withColumn("k_bucket", col("k") % 10)
        .groupBy(col("k_bucket"))
        .agg(
          count(lit(1)).as("n"),
          r2(avg(col("value"))).as("avg_value"),
          r2(sum(col("value"))).as("sum_value")),
    Some("""
      SELECT CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) % 10 AS k_bucket,
        count(*) AS n,
        floor(avg(value)*100 + 0.5)/100 AS avg_value,
        floor(sum(value)*100 + 0.5)/100 AS sum_value
      FROM events GROUP BY 1"""))

  /** F3/F4/F5 exchange-rate scoring (SURVEY §2.8): latest-vs-yearly-average
    * percent change and the clamped 0-100 score, per customer over orders.
    * max_by = the reference's "realtime" (latest) observation. */
  private val q13 = Q(
    "q13_exchange_score",
    (s, d) => {
      val byCust = Tables.orders(s, d).groupBy(col("o_custkey")).agg(
        avg(col("o_totalprice")).as("yearly_avg"),
        max_by(col("o_totalprice"), col("o_orderkey")).as("realtime"))
      val pct = F.changePercent(col("realtime"), col("yearly_avg"))
      byCust.select(
        col("o_custkey"),
        r2(pct).as("change_pct"),
        r2(F.exchangeRateScore(pct)).as("score"))
    },
    Some("""
      WITH byc AS (
        SELECT o_custkey, avg(o_totalprice) AS yearly_avg,
          arg_max(o_totalprice, o_orderkey) AS realtime
        FROM orders GROUP BY o_custkey),
      p AS (
        SELECT o_custkey,
          CASE WHEN realtime IS NOT NULL AND yearly_avg IS NOT NULL AND yearly_avg > 0
               THEN (realtime - yearly_avg)/yearly_avg*100 END AS pct
        FROM byc)
      SELECT o_custkey,
        floor(pct*100 + 0.5)/100 AS change_pct,
        floor((CASE WHEN pct IS NULL THEN 0.0
               ELSE least(100.0, greatest(0.0, (10.0 - pct)/20.0*100)) END)*100 + 0.5)/100 AS score
      FROM p"""))

  /** F13 price delta/state/sign-score (flight_avg_merge.py:45-48): unit
    * price vs part retail price, Korean categorical states preserved. */
  private val q14 = Q(
    "q14_price_state",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      val diff = col("l_extendedprice") / col("l_quantity") - col("p_retailprice")
      li.join(p, col("l_partkey") === col("p_partkey"))
        .withColumn("diff", diff)
        .withColumn("state", F.priceState(col("diff")))
        .withColumn("score", F.priceScore(col("diff")))
        .groupBy(col("state"), col("score"))
        .agg(
          count(lit(1)).as("n"),
          r2(avg(col("diff") / col("p_retailprice") * 100)).as("avg_pct"))
    },
    Some("""
      WITH j AS (
        SELECT l_extendedprice/l_quantity - p_retailprice AS diff, p_retailprice
        FROM lineitem JOIN part ON l_partkey = p_partkey)
      SELECT
        CASE WHEN diff > 0 THEN '상승' WHEN diff < 0 THEN '하락' ELSE '동일' END AS state,
        CAST(CASE WHEN diff > 0 THEN -1 WHEN diff < 0 THEN 1 ELSE 0 END AS INT) AS score,
        count(*) AS n,
        floor(avg(diff/p_retailprice*100)*100 + 0.5)/100 AS avg_pct
      FROM j GROUP BY 1, 2"""))

  /** F14-style split+explode (SURVEY §2.8) doubling as token counting:
    * per-token corpus frequency over documents. */
  private val q15 = Q(
    "q15_token_explode",
    (s, d) =>
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n")),
    Some("""
      SELECT token, count(*) AS n FROM (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      WHERE token <> '' GROUP BY token"""))

  /** T5 batch analog (SURVEY §2.9): tumbling 1-hour event-time window.
    * The streaming form (watermark + window over readStream) is
    * `graft.streaming.Events`; this batch twin is the oracle-checkable one. */
  private val q16 = Q(
    "q16_event_window",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(
          window(col("ts"), "1 hour").getField("start").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), r2(sum(col("value"))).as("sum_value"))
        .select(
          date_format(col("w"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("n"), col("sum_value")),
    Some("""
      SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        event_type, count(*) AS n,
        floor(sum(value)*100 + 0.5)/100 AS sum_value
      FROM events GROUP BY 1, 2"""))

  /** P7 keep-on-match as left-semi (SURVEY §2.2/§2.3 absent-kinds note):
    * orders whose customer clears a balance threshold. */
  private val q17 = Q(
    "q17_semi_join",
    (s, d) => {
      val o = Tables.orders(s, d)
      val rich = Tables.customer(s, d).filter(col("c_acctbal") > 7000).select(col("c_custkey"))
      o.join(rich, col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
    },
    Some("""
      SELECT o_orderpriority, count(*) AS n_orders FROM orders
      WHERE EXISTS (SELECT 1 FROM customer
                    WHERE c_custkey = o_custkey AND c_acctbal > 7000)
      GROUP BY 1"""))

  /** P7 drop-on-miss inverse as left-anti: customers with no orders. */
  private val q18 = Q(
    "q18_anti_join",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).select(col("o_custkey"))
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
    },
    Some("""
      SELECT c_mktsegment, count(*) AS n_customers FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      GROUP BY 1"""))

  private[queries] val all: Seq[Q] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08,
    q09, q10, q11, q12, q13, q14, q15, q16,
    q17, q18)
}
