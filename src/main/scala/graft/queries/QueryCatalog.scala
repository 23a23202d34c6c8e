package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Core, RefFunctions => F}
import graft.sources.Tables

/** The driver-facing query catalog: one entry per operator family from
  * SURVEY.md §2 plus the north-star LLM-pipeline operators (§2.11), each
  * paired with ANSI SQL that DuckDB executes over the same parquet tables.
  *
  * Cross-engine determinism rules applied throughout:
  *  - rounding uses `floor(x*s + 0.5)/s` in BOTH dialects (Spark's round()
  *    goes through BigDecimal.valueOf's shortest-decimal repr and disagrees
  *    with DuckDB's C-double rounding on values like 90.225);
  *  - every window/rank has a unique tiebreak column;
  *  - `events.ts` is ns in parquet but µs in Spark, so time ordering uses
  *    `event_id` (verified monotone with ts) and window starts are emitted
  *    as formatted strings;
  *  - integer sums are cast to BIGINT on the DuckDB side (DuckDB widens to
  *    HUGEINT, Spark to LongType);
  *  - hashes shared across engines are md5-derived (hex → int64), since
  *    Spark's murmur/xxhash64 and DuckDB's hash() are incompatible.
  */
object QueryCatalog {

  final case class Q(
      name: String,
      run: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  /** Engine-independent half-up rounding, exact same IEEE ops both sides. */
  private def r(c: Column, scale: Int): Column = {
    val m = math.pow(10, scale)
    floor(c * m + 0.5) / m
  }
  private def r2(c: Column): Column = r(c, 2)

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

  // ------------------------------------------------- north-star (§2.11)

  /** Exact dedup: group-by content hash, keep min doc_id. At 100 TB this is
    * the standard first dedup pass — one shuffle on the 128-bit digest. */
  private val q19 = Q(
    "q19_dedup_exact",
    (s, d) =>
      Tables.documents(s, d)
        .groupBy(md5(col("text")).as("fingerprint"))
        .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies")),
    Some("""
      SELECT md5(text) AS fingerprint, min(doc_id) AS keeper_id,
        count(*) AS n_copies
      FROM documents GROUP BY 1"""))

  /** The driver fixtures are ONE parquet file per table → the scan opens
    * as a single input partition and map-heavy work (shingling, md5) runs
    * on one core. Spreading it with a repartition is a BENCH-ONLY aid for
    * that degenerate layout: on splittable production input the scan
    * already parallelizes and the extra shuffle is a scale-killer. Gated
    * by conf `graft.bench.singleFileFixture` — default OFF, so the
    * production plan has no shuffle (pinned in PlanShapeSpec); Bench.scala
    * turns it on. */
  private def spreadSingleFileFixture(s: SparkSession, df: DataFrame, key: String): DataFrame =
    if (s.conf.get("graft.bench.singleFileFixture", "false").toBoolean)
      df.repartition(col(key))
    else df

  /** Shared by q20 (pair list) and q46 (cluster resolution over the same
    * pairs): prefix-blocked candidate pairs verified by exact Jaccard
    * >= 0.5 over distinct token sets. Returns (doc_a, doc_b, jac). */
  private def prefixJaccardPairs(s: SparkSession, d: String): DataFrame = {
    val docs = spreadSingleFileFixture(s, Tables.documents(s, d), "doc_id")
      .select(
        col("doc_id"),
        substring(col("text"), 1, 30).as("pfx"),
        array_distinct(split(col("text"), " ")).as("toks"))
    val a = docs.as("a")
    val b = docs.as("b")
    val jac = size(array_intersect(col("a.toks"), col("b.toks"))).cast("double") /
      size(array_union(col("a.toks"), col("b.toks")))
    a.join(b, col("a.pfx") === col("b.pfx") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"), jac.as("jac"))
      .filter(col("jac") >= 0.5)
  }

  /** n-gram Jaccard near-dup join, prefix-blocked: candidate pairs share a
    * 30-char prefix (the blocking key), then exact Jaccard over distinct
    * token sets filters at 0.5. Blocking keeps the self-join linear-ish;
    * the MinHash variant (q21) is the probabilistic-recall scale path. */
  private val q20 = Q(
    "q20_jaccard_neardup",
    (s, d) => prefixJaccardPairs(s, d)
      .select(col("doc_a"), col("doc_b"), r(col("jac"), 3).as("jaccard")),
    Some("""
      WITH d AS (
        SELECT doc_id, substr(text, 1, 30) AS pfx,
          list_distinct(string_split(text, ' ')) AS toks
        FROM documents)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        floor((len(list_intersect(a.toks, b.toks))::DOUBLE
               / len(list_distinct(list_concat(a.toks, b.toks))))*1000 + 0.5)/1000 AS jaccard
      FROM d a JOIN d b ON a.pfx = b.pfx AND a.doc_id < b.doc_id
      WHERE len(list_intersect(a.toks, b.toks))::DOUBLE
            / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.5"""))

  /** MinHash + LSH banding near-dup join, fully oracle-checked: word-3-gram
    * shingles → 16 md5-derived min-hashes → 4 bands of 4 → band-bucket
    * self-join for candidates → exact Jaccard verification at 0.5.
    * The md5-hex→int64 hash is engine-independent (Spark murmur and DuckDB
    * hash() are not). Production note (100 TB): swap md5 for xxhash64
    * (graft.ops.Text.minHashSignatures) and the self-join stays on band
    * buckets — shuffle is O(docs×bands), never O(docs²). */
  private val q21 = Q(
    "q21_minhash_lsh",
    (s, d) => {
      // One md5 per shingle, then 16 seeded hashes by affine arithmetic
      // mod the Mersenne prime 2^31-1 — 16x fewer digests than hashing
      // (seed, shingle) pairs, and DuckDB mirrors the integer math exactly.
      val M = 2147483647L
      def hexint(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast("long")
      val toks = split(col("text"), " ")
      // Explode shingles to rows and hash each ONCE in codegen, then take
      // the 16 seeded minima as plain aggregates. (A nested higher-order
      // formulation re-evaluates the inlined hash lambda per outer
      // iteration after CollapseProject — 16-64x duplicate md5 work.)
      val shingleRows = spreadSingleFileFixture(s, Tables.documents(s, d), "doc_id")
        .select(col("doc_id"), toks.as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), explode(transform(
          sequence(lit(1), size(col("toks")) - 2),
          i => concat_ws(" ", element_at(col("toks"), i),
            element_at(col("toks"), i + 1), element_at(col("toks"), i + 2)))).as("sh"))
        .select(col("doc_id"), (hexint(col("sh")) % M).as("h"))
      val minCols = (0 until 16).map(seed =>
        min((col("h") * (seed * 2 + 1) + seed * 1000003L) % M).as(s"m$seed"))
      val base = shingleRows
        .groupBy(col("doc_id"))
        .agg(minCols.head, minCols.tail: _*)
        .select(col("doc_id"), array((0 until 16).map(i => col(s"m$i")): _*).as("mh"))
      val banded = base.select(
        col("doc_id"),
        explode(transform(sequence(lit(0), lit(3)), b => struct(
          b.as("band_id"),
          md5(array_join(transform(slice(col("mh"), b * 4 + 1, lit(4)),
            x => x.cast("string")), "|")).as("band_hash")))).as("band"))
        .select(col("doc_id"), col("band.band_id"), col("band.band_hash"))
      // Bucket-combination form instead of a self-join: the expensive
      // minhash subtree is evaluated ONCE, candidates come from one
      // groupBy shuffle on the band key (a self-join would re-evaluate
      // the whole signature computation on both sides).
      val pairs = banded
        .groupBy(col("band_id"), col("band_hash"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) >= 2)
        .select(explode(flatten(transform(
          sequence(lit(1), size(col("ids")) - 1),
          i => transform(
            sequence(i + 1, size(col("ids"))),
            j => struct(
              element_at(col("ids"), i).as("doc_a"),
              element_at(col("ids"), j).as("doc_b")))))).as("p"))
        .select(col("p.doc_a"), col("p.doc_b"))
        .distinct()
      val tokset = Tables.documents(s, d)
        .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
      val jac = size(array_intersect(col("ta.toks"), col("tb.toks"))).cast("double") /
        size(array_union(col("ta.toks"), col("tb.toks")))
      pairs
        .join(tokset.as("ta"), col("doc_a") === col("ta.doc_id"))
        .join(tokset.as("tb"), col("doc_b") === col("tb.doc_id"))
        .select(col("doc_a"), col("doc_b"), jac.as("jac"))
        .filter(col("jac") >= 0.5)
        .select(col("doc_a"), col("doc_b"), r(col("jac"), 3).as("jaccard"))
    },
    Some("""
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      sh AS (
        SELECT doc_id, toks,
          list_transform(range(1, len(toks) - 1),
            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS shingles
        FROM t WHERE len(toks) >= 3),
      hsrc AS (
        SELECT doc_id,
          list_transform(shingles, sg ->
            ('0x' || substr(md5(sg), 1, 15))::BIGINT % 2147483647) AS hs
        FROM sh),
      m AS (
        SELECT doc_id,
          list_transform(range(0, 16), seed ->
            list_min(list_transform(hs, h ->
              (h * (seed*2 + 1) + seed*1000003) % 2147483647))) AS mh
        FROM hsrc),
      banded AS (
        SELECT doc_id, b.band_id,
          md5(array_to_string(list_transform(mh[b.band_id*4+1 : b.band_id*4+4],
            x -> x::VARCHAR), '|')) AS band_hash
        FROM m, (SELECT unnest([0,1,2,3]) AS band_id) b),
      pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
        FROM banded a JOIN banded b2
          ON a.band_id = b2.band_id AND a.band_hash = b2.band_hash
         AND a.doc_id < b2.doc_id),
      tokset AS (
        SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
        FROM documents)
      SELECT doc_a, doc_b,
        floor((len(list_intersect(ta.toks, tb.toks))::DOUBLE
               / len(list_distinct(list_concat(ta.toks, tb.toks))))*1000 + 0.5)/1000 AS jaccard
      FROM pairs
      JOIN tokset ta ON doc_a = ta.doc_id
      JOIN tokset tb ON doc_b = tb.doc_id
      WHERE len(list_intersect(ta.toks, tb.toks))::DOUBLE
            / len(list_distinct(list_concat(ta.toks, tb.toks))) >= 0.5"""))

  /** SimHash (32-bit) per document: md5-derived token hashes, per-bit
    * vote sums, sign bits reassembled. Two narrow shuffles; at 100 TB the
    * bit fan-out stays map-side (explode before the keyed aggregate). */
  private val q22 = Q(
    "q22_simhash",
    (s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .withColumn("hv", conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long"))
      val bits = tok
        .select(col("doc_id"), col("hv"), explode(sequence(lit(0), lit(31))).as("b"))
        .withColumn("contrib",
          when(expr("(hv >> b) & 1") === 1, lit(1)).otherwise(lit(-1)))
        .groupBy(col("doc_id"), col("b"))
        .agg(sum(col("contrib")).as("s"))
      bits.groupBy(col("doc_id"))
        .agg(sum(when(col("s") > 0, pow(lit(2.0), col("b")).cast("long"))
          .otherwise(lit(0L))).as("simhash"))
    },
    Some("""
      WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      h AS (
        SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS hv
        FROM tok WHERE tok <> ''),
      bits AS (
        SELECT doc_id, b,
          CAST(sum(CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS s
        FROM h, (SELECT unnest(range(0, 32)) AS b) GROUP BY doc_id, b)
      SELECT doc_id,
        CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, b) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
      FROM bits GROUP BY doc_id"""))

  /** Brute-force cosine top-k over embeddings (the correctness baseline for
    * ANN; the LSH-bucketed scale path is graft.ops.Similarity.lshCosineTopK).
    * Dot products in double via zip_with+aggregate — no UDF, stays codegen'd. */
  private val q23 = Q(
    "q23_cosine_topk",
    (s, d) => {
      graft.plans.GraftExtensions.install(s)
      val e = Tables.embeddings(s, d).select(
        col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      val n = e.withColumn("nrm",
        sqrt(graft.functions.VectorDot.vec_dot(col("v"), col("v"))))
      val q = n.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
      val dot = graft.functions.VectorDot.vec_dot(col("qv"), col("v"))
      val scored = q.join(n, col("vec_id") =!= col("q_id"))
        .withColumn("sim", dot / (col("qn") * col("nrm")))
      Core.topKPerGroup(
        scored.select(col("q_id"), col("vec_id"), col("sim")),
        Seq("q_id"), Seq(col("sim").desc, col("vec_id").asc), 10)
        .select(col("q_id"), col("vec_id"), r(col("sim"), 4).as("cosine"))
    },
    Some("""
      WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      n AS (
        SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
      q AS (
        SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 10),
      scored AS (
        SELECT q.q_id, n.vec_id,
          list_dot_product(q.qv, n.v)/(q.qn * n.nrm) AS sim
        FROM q JOIN n ON n.vec_id <> q.q_id),
      ranked AS (
        SELECT q_id, vec_id, sim,
          row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rn
        FROM scored)
      SELECT q_id, vec_id, floor(sim*10000 + 0.5)/10000 AS cosine
      FROM ranked WHERE rn <= 10"""))

  /** Language-ID by stopword-marker ratio (n-gram heuristic): deterministic
    * CASE over the marker-token ratio, confusion-matrix-style output. */
  private val q24 = Q(
    "q24_lang_id",
    (s, d) =>
      Tables.documents(s, d)
        .withColumn("predicted", graft.ops.Text.langId(col("text")))
        .groupBy(col("lang"), col("predicted"))
        .agg(count(lit(1)).as("n")),
    Some("""
      WITH p AS (
        SELECT lang,
          CASE WHEN len(list_filter(string_split(text, ' '),
                 t -> t = 'the' OR t = 'a'))::DOUBLE
               / len(string_split(text, ' ')) >= 0.05
          THEN 'en' ELSE 'und' END AS predicted
        FROM documents)
      SELECT lang, predicted, count(*) AS n FROM p GROUP BY 1, 2"""))

  /** Quality scoring: token count, average word length, stopword ratio →
    * weighted clamp to 0-100, aggregated per source. */
  private val q25 = Q(
    "q25_quality_score",
    (s, d) =>
      Tables.documents(s, d)
        .withColumn("q", r2(graft.ops.Text.qualityScore(col("text"), col("n_chars"))))
        .groupBy(col("source"))
        .agg(r2(avg(col("q"))).as("avg_quality"), count(lit(1)).as("n_docs")),
    Some("""
      WITH p AS (
        SELECT source,
          floor(least(100.0, greatest(0.0,
            100.0 * (least(len(string_split(text,' '))::DOUBLE/100, 1.0)*0.4
             + least(((n_chars - (len(string_split(text,' '))::DOUBLE - 1))
                      / len(string_split(text,' '))::DOUBLE)/6, 1.0)*0.3
             + (1.0 - len(list_filter(string_split(text,' '),
                   t -> t = 'the' OR t = 'a'))::DOUBLE
                 / len(string_split(text,' '))::DOUBLE)*0.3)))*100 + 0.5)/100 AS q
        FROM documents)
      SELECT source, floor(avg(q)*100 + 0.5)/100 AS avg_quality,
        count(*) AS n_docs
      FROM p GROUP BY source"""))

  /** Token counting per language: whitespace tokens + a BPE-ish max-4-char
    * greedy regex tokenizer + char stats. */
  private val q26 = Q(
    "q26_token_stats",
    (s, d) =>
      Tables.documents(s, d)
        .withColumn("ws_tokens", graft.ops.Text.wsTokenCount(col("text")))
        .withColumn("bpe_tokens", graft.ops.Text.bpeTokenCount(col("text")))
        .groupBy(col("lang"))
        .agg(
          sum(col("ws_tokens")).as("sum_ws_tokens"),
          sum(col("bpe_tokens")).as("sum_bpe_tokens"),
          r2(avg(col("n_chars"))).as("avg_chars"),
          count(lit(1)).as("n_docs")),
    Some("""
      SELECT lang,
        CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_ws_tokens,
        CAST(sum(len(regexp_extract_all(text, '[A-Za-z]{1,4}|[0-9]{1,3}|[^A-Za-z0-9\s]'))) AS BIGINT) AS sum_bpe_tokens,
        floor(avg(n_chars)*100 + 0.5)/100 AS avg_chars,
        count(*) AS n_docs
      FROM documents GROUP BY lang"""))

  /** Document fingerprinting: full md5 digest + a 60-bit integer prefix
    * fingerprint. (The Rabin-Karp rolling-hash variant is the custom
    * Catalyst expression graft.functions.rolling_hash, codegen'd; it has no
    * DuckDB twin so it is exercised by RollingHashSpec instead.) */
  private val q27 = Q(
    "q27_fingerprint",
    (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        md5(col("text")).as("fp_md5"),
        conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long").as("fp_int60")),
    Some("""
      SELECT doc_id, md5(text) AS fp_md5,
        ('0x' || substr(md5(text), 1, 15))::BIGINT AS fp_int60
      FROM documents"""))

  /** Multimodal plumbing (oracle-checkable slice): documents as opaque
    * binary payloads — byte length, content digest, first-8-byte hex
    * "frame sample". The full typed pipeline (metadata struct, stubbed
    * decode, feature extraction over mapPartitions) is
    * graft.ops.Multimodal + MultimodalSpec. */
  private val q28 = Q(
    "q28_multimodal_meta",
    (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        octet_length(col("text")).as("n_bytes"),
        md5(col("text")).as("digest"),
        hex(encode(substring(col("text"), 1, 8), "UTF-8")).as("head8_hex")),
    Some("""
      SELECT doc_id, octet_length(text::BLOB) AS n_bytes, md5(text) AS digest,
        hex(substr(text, 1, 8)::BLOB) AS head8_hex
      FROM documents"""))

  /** J6 — the multi-source attractiveness gold join (README.md:84-85,107):
    * master dim LEFT-joins three independently-aggregated score sources
    * (orders via customer, lineitem revenue via supplier, events "trend"
    * keyed by user_id%25) and takes a weighted clamped score. Missing
    * sources coalesce to 0 — a master row never drops (README.md:119). */
  private val q29 = Q(
    "q29_gold_join",
    (s, d) => {
      val nation = Tables.nation(s, d)
      val fx = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("n_nationkey"))
        .agg(least(lit(100.0), avg(col("o_totalprice")) / 2000).as("score_fx"))
      val rev = Tables.lineitem(s, d)
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey").as("n_nationkey"))
        .agg(least(lit(100.0), sum(col("l_extendedprice") * (lit(1) - col("l_discount"))) / 1e7).as("score_rev"))
      val trend = Tables.events(s, d)
        .groupBy((col("user_id") % 25).cast("int").as("n_nationkey"))
        .agg(least(lit(100.0), avg(col("value")) / 2).as("score_trend"))
      graft.ops.Gold.attractiveness(
        nation.select(col("n_nationkey"), col("n_name")), "n_nationkey",
        Seq((fx, "score_fx", 0.5), (rev, "score_rev", 0.3), (trend, "score_trend", 0.2)))
        .select(
          col("n_name"),
          r2(coalesce(col("score_fx"), lit(0.0))).as("score_fx"),
          r2(coalesce(col("score_rev"), lit(0.0))).as("score_rev"),
          r2(coalesce(col("score_trend"), lit(0.0))).as("score_trend"),
          col("attractiveness_score"))
    },
    Some("""
      WITH fx AS (
        SELECT c_nationkey AS k, least(100.0, avg(o_totalprice)/2000) AS score_fx
        FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1),
      rev AS (
        SELECT s_nationkey AS k,
          least(100.0, sum(l_extendedprice*(1-l_discount))/1e7) AS score_rev
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey GROUP BY 1),
      trend AS (
        SELECT CAST(user_id % 25 AS INT) AS k, least(100.0, avg(value)/2) AS score_trend
        FROM events GROUP BY 1)
      SELECT n_name,
        floor(coalesce(score_fx, 0.0)*100 + 0.5)/100 AS score_fx,
        floor(coalesce(score_rev, 0.0)*100 + 0.5)/100 AS score_rev,
        floor(coalesce(score_trend, 0.0)*100 + 0.5)/100 AS score_trend,
        floor(least(100.0, greatest(0.0,
          coalesce(score_fx, 0.0)*0.5 + coalesce(score_rev, 0.0)*0.3
          + coalesce(score_trend, 0.0)*0.2))*100 + 0.5)/100 AS attractiveness_score
      FROM nation
      LEFT JOIN fx ON n_nationkey = fx.k
      LEFT JOIN rev ON n_nationkey = rev.k
      LEFT JOIN trend ON n_nationkey = trend.k"""))

  /** Rollup hierarchy totals (region → nation → grand total) — the
    * multi-level aggregation a gold dashboard layer needs; subtotal rows
    * carry NULL keys in both engines. */
  private val q30 = Q(
    "q30_rollup",
    (s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_orders"), r2(sum(col("o_totalprice"))).as("total_price")),
    Some("""
      SELECT r_name, n_name, count(*) AS n_orders,
        floor(sum(o_totalprice)*100 + 0.5)/100 AS total_price
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP(r_name, n_name)"""))

  /** Distinct aggregation (exact): distinct orders/parts per return flag.
    * (approx_count_distinct exists but its HLL sketch differs from
    * DuckDB's, so the oracle-checked form is exact.) */
  private val q31 = Q(
    "q31_distinct_agg",
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_partkey")).as("n_parts"),
          count(lit(1)).as("n_rows")),
    Some("""
      SELECT l_returnflag,
        CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
        CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        count(*) AS n_rows
      FROM lineitem GROUP BY 1"""))

  /** q31 without the Expand: multi-column count_distinct compiles to an
    * Expand that replicates EVERY input row once per distinct column (3×
    * the shuffle here) before a 3-way null-partitioned aggregate. This
    * form re-aggregates instead: per-column distinct via (flag, key)
    * groupBy — which partial-aggregates map-side, so the shuffle carries
    * per-partition DISTINCT keys, not rows — then counts the tiny
    * distinct sets and joins three ≤5-row aggregates. At 100 TB with
    * n_distinct ≪ n_rows this is the shuffle-volume winner; q41's sketch
    * form wins when even the distinct sets are too big to shuffle. Same
    * oracle as q31 — all three forms must agree. */
  private val q31b = Q(
    "q31b_distinct_reagg",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      def nDistinct(key: String, as: String) =
        li.select(col("l_returnflag"), col(key)).distinct()
          .groupBy(col("l_returnflag")).agg(count(lit(1)).as(as))
      nDistinct("l_orderkey", "n_orders")
        .join(nDistinct("l_partkey", "n_parts"), "l_returnflag")
        .join(li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n_rows")),
          "l_returnflag")
    },
    Some("""
      SELECT l_returnflag,
        CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
        CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        count(*) AS n_rows
      FROM lineitem GROUP BY 1"""))

  /** Embedding-cosine near-dup pairs, metadata-blocked: candidate pairs
    * share a label (the blocking key — at 100 TB this is an LSH bucket or
    * IVF cell, see graft.ops.Similarity.lshCosineTopK), then exact cosine
    * filters. Threshold 0.45 sits just under this corpus's in-label max. */
  private val q32 = Q(
    "q32_embedding_neardup",
    (s, d) => {
      graft.plans.GraftExtensions.install(s)
      val e = Tables.embeddings(s, d).select(
        col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      val n = e.withColumn("nrm",
        sqrt(graft.functions.VectorDot.vec_dot(col("v"), col("v"))))
      val a = n.select(col("vec_id").as("id_a"), col("label"), col("v").as("va"), col("nrm").as("na"))
      val b = n.select(col("vec_id").as("id_b"), col("label"), col("v").as("vb"), col("nrm").as("nb"))
      val sim = graft.functions.VectorDot.vec_dot(col("va"), col("vb")) / (col("na") * col("nb"))
      a.join(b, Seq("label"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("sim", sim)
        .filter(col("sim") >= 0.45)
        .select(col("id_a"), col("id_b"), col("label"), r(col("sim"), 4).as("cosine"))
    },
    Some("""
      WITH e AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      n AS (
        SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label,
        floor((list_dot_product(a.v, b.v)/(a.nrm*b.nrm))*10000 + 0.5)/10000 AS cosine
      FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE list_dot_product(a.v, b.v)/(a.nrm*b.nrm) >= 0.45"""))

  /** As-of join (Core.asOfJoin — union + one keyed window, no range
    * explosion): each purchase event picks up the value of the user's most
    * recent prior click. Left rows with no prior click keep null. */
  private val q33 = Q(
    "q33_asof_join",
    (s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("value"))
      Core.asOfJoin(purchases, clicks,
        keys = Seq("user_id"), leftOrder = "event_id", rightOrder = "event_id",
        rightPayload = Seq("value"))
        .select(
          col("event_id"), col("user_id"),
          r2(col("value")).as("value"),
          r2(col("asof_value")).as("asof_click_value"))
    },
    Some("""
      SELECT event_id, user_id,
        floor(value*100 + 0.5)/100 AS value,
        floor(asof_value*100 + 0.5)/100 AS asof_click_value
      FROM (
        SELECT event_id, user_id, value, event_type,
          last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_value
        FROM events)
      WHERE event_type = 'purchase'"""))

  /** A3 map-typed pivot canonicalization (SURVEY §7.4.2): build the
    * reference's `monthly_avg_rates`-style map column (sorted
    * map_from_entries, as Rates.pivotRates does) and explode it back to
    * sorted rows so the DuckDB oracle can mirror it — the documented
    * pattern for hash-comparing map columns. */
  private val q34 = Q(
    "q34_pivot_map_roundtrip",
    (s, d) => {
      val perMonth = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), F.monthKey(col("o_orderdate")).as("month_key"))
        .agg(r2(sum(col("o_totalprice"))).as("total"))
      perMonth
        .groupBy(col("n_name"))
        .agg(map_from_entries(array_sort(collect_list(
          struct(col("month_key"), col("total"))))).as("monthly_totals"))
        .select(col("n_name"), explode(col("monthly_totals")).as(Seq("month_key", "total")))
    },
    Some("""
      SELECT n_name, strftime(o_orderdate, '%Y%m') AS month_key,
        floor(sum(o_totalprice)*100 + 0.5)/100 AS total
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2"""))

  /** Set operations beyond union (SURVEY §2.7 lists them absent in the
    * reference; built-ins cover them): customers appearing in both the
    * high-value and recent order sets (INTERSECT) vs only in the
    * high-value set (EXCEPT), tagged and unioned. Distinct semantics in
    * both engines. */
  private val q35 = Q(
    "q35_intersect_except",
    (s, d) => {
      val o = Tables.orders(s, d)
      val high = o.filter(col("o_totalprice") > 250000).select(col("o_custkey"))
      val recent = o.filter(col("o_orderdate") >= to_timestamp(lit("1997-01-01")))
        .select(col("o_custkey"))
      val both = high.intersect(recent).withColumn("tag", lit("both"))
      val onlyHigh = high.except(recent).withColumn("tag", lit("only_high"))
      Core.unionAll(Seq(both, onlyHigh))
    },
    Some("""
      SELECT o_custkey, 'both' AS tag FROM (
        SELECT o_custkey FROM orders WHERE o_totalprice > 250000
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01')
      UNION ALL
      SELECT o_custkey, 'only_high' AS tag FROM (
        SELECT o_custkey FROM orders WHERE o_totalprice > 250000
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01')"""))

  /** The Misra-Gries frequent-items aggregate (graft.functions.
    * FrequentItems, a TypedImperativeAggregate) under the oracle: with
    * capacity (256) above the corpus vocabulary the sketch is provably
    * exact, so plain GROUP BY counts mirror it. Exercises the custom
    * aggregate's partial/merge path through ObjectHashAggregate. */
  private val q36 = Q(
    "q36_frequent_tokens",
    (s, d) => {
      graft.plans.GraftExtensions.install(s)
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .agg(graft.functions.FrequentItems.frequent_items(col("tok"), 256).as("fi"))
        .select(explode(col("fi")).as("e"))
        .select(col("e.item"), col("e.min_count"))
    },
    Some("""
      SELECT token AS item, count(*) AS min_count FROM (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      WHERE token <> '' GROUP BY token"""))

  // ------------------------------------------- reference pipelines (gold)
  // q37-q40 run the ACTUAL reference dataflows (Rates/Trends/Flights
  // .gold) end-to-end over the bundled bronze fixtures
  // (graft.sources.Fixtures; authored by tools/make_fixtures.py, country
  // dims verbatim from the reference's public config). The DuckDB twins
  // read the very same JSONL via read_json — Fixtures.dir resolves the
  // one absolute path both engines share (the driver's oracle connection
  // only creates views for the sf tables). These queries ignore the
  // sfDir argument by design: the input is the fixture, identical at
  // every scale factor.

  private val FX = graft.sources.Fixtures.dir

  /** S1/S2+J1+A3+F3/F4/F5 — the exchange-rate pipeline (Rates.gold):
    * EUR ×17 eurozone fan-out through the broadcast dim, the 4-rate-type
    * conditional-aggregation pivot, change-percent + clamped score. The
    * monthly map column is canonicalized for hashing by exploding its
    * (sorted) entries — one output row per (country × month), countries
    * with no monthly rows keep a null-month row (explode_outer ==
    * LEFT JOIN). Ref: exchage_rate_crawler.py:338-426,611-649. */
  private val q37 = Q(
    "q37_rates_gold",
    (s, _) => {
      val gold = graft.ops.Rates.gold(
        graft.sources.Fixtures.ratesRaw(s),
        graft.sources.Fixtures.countryMaster(s))
      gold
        .select(col("*"), explode_outer(map_entries(col("monthly_avg_rates"))).as("me"))
        .select(
          col("country_code_3"), col("currency_code"),
          col("country_korean_name"), col("country_english_name"),
          col("country_code_2"), col("is_euro_zone"),
          col("realtime_rate"), col("realtime_crawled_at_utc"),
          col("realtime_crawled_at_kst"), col("daily_avg_rate"),
          col("yearly_avg_rate"), col("exchange_rate_change_percent"),
          col("exchange_rate_score"), col("dataType"),
          col("me.key").as("month_key"), col("me.value").as("monthly_rate"))
    },
    Some(s"""
      WITH dim AS (
        SELECT currency_code, country_code_3,
          country_name_kor AS country_korean_name,
          country_name_eng AS country_english_name,
          country_code_2, is_euro_zone
        FROM read_json('$FX/country_master.jsonl', format='newline_delimited',
          columns={"country_code_3":'VARCHAR',"country_name_eng":'VARCHAR',
                   "country_name_kor":'VARCHAR',"country_code_2":'VARCHAR',
                   "currency_code":'VARCHAR',"is_euro_zone":'BOOLEAN',
                   "google_trend_keyword_kor":'VARCHAR'})),
      enr AS (
        SELECT r.*, d.country_code_3, d.country_korean_name,
          d.country_english_name, d.country_code_2, d.is_euro_zone
        FROM read_json('$FX/rates_raw.jsonl', format='newline_delimited',
          columns={"currency_code":'VARCHAR',"rate_type":'VARCHAR',
                   "month_key":'VARCHAR',"buy_rate":'DOUBLE',
                   "sell_rate":'DOUBLE',"send_rate":'DOUBLE',
                   "receive_rate":'DOUBLE',"standard_rate":'DOUBLE',
                   "crawled_at_utc":'VARCHAR',"crawled_at_kst":'VARCHAR'}) r
        JOIN dim d USING (currency_code)),
      wide AS (
        SELECT country_code_3,
          max(currency_code) AS currency_code,
          max(country_korean_name) AS country_korean_name,
          max(country_english_name) AS country_english_name,
          max(country_code_2) AS country_code_2,
          bool_or(is_euro_zone) AS is_euro_zone,
          max(CASE WHEN rate_type='realtime' THEN standard_rate END) AS realtime_rate,
          max(CASE WHEN rate_type='realtime' THEN crawled_at_utc END) AS realtime_crawled_at_utc,
          max(CASE WHEN rate_type='realtime' THEN crawled_at_kst END) AS realtime_crawled_at_kst,
          max(CASE WHEN rate_type='daily_avg' THEN standard_rate END) AS daily_avg_rate,
          max(CASE WHEN rate_type='yearly_avg' THEN standard_rate END) AS yearly_avg_rate
        FROM enr GROUP BY country_code_3),
      monthly AS (
        SELECT DISTINCT country_code_3, month_key, standard_rate AS monthly_rate
        FROM enr WHERE rate_type='monthly_avg' AND month_key IS NOT NULL),
      pcts AS (
        SELECT w.*,
          CASE WHEN realtime_rate IS NOT NULL AND yearly_avg_rate IS NOT NULL
                    AND yearly_avg_rate > 0
            THEN (realtime_rate - yearly_avg_rate)/yearly_avg_rate*100 END AS pct
        FROM wide w)
      SELECT p.country_code_3, p.currency_code, p.country_korean_name,
        p.country_english_name, p.country_code_2, p.is_euro_zone,
        p.realtime_rate, p.realtime_crawled_at_utc, p.realtime_crawled_at_kst,
        p.daily_avg_rate, p.yearly_avg_rate,
        round(p.pct, 2) AS exchange_rate_change_percent,
        round(CASE WHEN p.pct IS NULL THEN 0.0
          ELSE least(100.0, greatest(0.0, (10.0 - p.pct)/20.0*100)) END, 2)
          AS exchange_rate_score,
        'exchangeRate' AS dataType,
        m.month_key, m.monthly_rate
      FROM pcts p LEFT JOIN monthly m USING (country_code_3)"""))

  /** A1/A2+F6-F9+J2/J7 — the Google-Trends pipeline (Trends.gold): last-15
    * vs previous-15 window means over the long-form series, the faithful
    * asymmetric growth branches (keyword epsilon blow-up vs anchor 1.0),
    * log-scale → normalize → clamped score, the broadcast anchor columns,
    * and standardization against the 739-entry alias map with Unknown_*
    * defaults. Ref: google_trends_crawler.py:71-111,
    * google_trends_processor.py:140-239. */
  private val q38 = Q(
    "q38_trends_gold",
    (s, _) => {
      val gold = graft.ops.Trends.gold(
        graft.sources.Fixtures.trendsInterest(s),
        graft.sources.Fixtures.standardMap(s),
        asOf = lit("2025-07-04 00:00:00").cast("timestamp"))
      // the PIPELINE emits unrounded scores (reference literal has no
      // round); the comparison projection rounds to 2 as engine-neutral
      // canonicalization so log10 ULP differences can't flake the hash
      gold.select(
        col("keyword"), col("recent_mean"), col("prev_mean"),
        col("trend_score_current_interest"), col("trend_score_raw_growth"),
        r2(col("scaled_raw_growth")).as("scaled_raw_growth"),
        r2(col("final_trend_score")).as("final_trend_score"),
        col("anchor_growth"), col("anchor_interest"),
        col("country_korean_name"), col("country_english_name"),
        col("country_code_3"), col("country_code_2"), col("dataType"),
        col("crawled_at_kst"))
    },
    Some(s"""
      WITH src AS (
        SELECT * FROM read_json('$FX/trends_interest.jsonl',
          format='newline_delimited',
          columns={"date":'DATE',"keyword":'VARCHAR',"interest":'INTEGER',
                   "geo":'VARCHAR',"is_partial":'BOOLEAN',"batch_id":'INTEGER'})
        WHERE NOT is_partial),
      ranked AS (
        SELECT keyword, interest,
          row_number() OVER (PARTITION BY keyword ORDER BY "date" DESC) AS rn
        FROM src),
      m AS (
        SELECT keyword,
          avg(CASE WHEN rn <= 15 THEN interest END) AS recent_mean,
          avg(CASE WHEN rn BETWEEN 16 AND 30 THEN interest END) AS prev_mean,
          CAST(coalesce(max(CASE WHEN rn = 1 THEN interest END), 0) AS INTEGER)
            AS current_interest
        FROM ranked GROUP BY keyword),
      g AS (
        SELECT m.*,
          CASE WHEN keyword = '해외여행' THEN
            CASE WHEN prev_mean IS NOT NULL AND prev_mean > 0
                   THEN (recent_mean - prev_mean)/prev_mean
                 WHEN recent_mean IS NOT NULL AND recent_mean > 0 THEN 1.0
                 ELSE 0.0 END
          ELSE
            CASE WHEN prev_mean IS NOT NULL AND prev_mean > 0
                   THEN (recent_mean - prev_mean)/prev_mean
                 WHEN recent_mean IS NOT NULL AND recent_mean > 0
                   THEN recent_mean/1e-6
                 ELSE 0.0 END
          END AS raw_growth
        FROM m),
      anc AS (
        SELECT
          max(CASE WHEN keyword = '해외여행' THEN raw_growth END) AS anchor_growth,
          max(CASE WHEN keyword = '해외여행' THEN current_interest END) AS anchor_interest
        FROM g),
      sc AS (
        SELECT g.*, anc.anchor_growth, anc.anchor_interest,
          CASE WHEN raw_growth > 0 THEN log10(1.0 + raw_growth)
               WHEN raw_growth < 0 THEN raw_growth ELSE 0.0 END AS scaled
        FROM g CROSS JOIN anc),
      sc2 AS (
        SELECT sc.*,
          CASE WHEN scaled > 0 THEN least(scaled/10*100, 100.0) ELSE 0.0 END AS norm
        FROM sc),
      j AS (
        SELECT sc2.*, regexp_replace(keyword, ' 여행$$', '') AS lookup_key
        FROM sc2)
      SELECT j.keyword, j.recent_mean, j.prev_mean,
        j.current_interest AS trend_score_current_interest,
        coalesce(j.raw_growth, 0.0) AS trend_score_raw_growth,
        floor(j.scaled*100 + 0.5)/100 AS scaled_raw_growth,
        floor(least(100.0, greatest(0.0, j.norm*0.7 + j.current_interest*0.3))*100 + 0.5)/100
          AS final_trend_score,
        j.anchor_growth, j.anchor_interest,
        coalesce(s.korean_name, 'Unknown_Korean') AS country_korean_name,
        coalesce(s.english_name, 'Unknown_English') AS country_english_name,
        coalesce(s.country_code_3, 'N/A') AS country_code_3,
        coalesce(s.country_code_2, 'N/A') AS country_code_2,
        'googleTrend' AS dataType,
        TIMESTAMP '2025-07-04 09:00:00' AS crawled_at_kst
      FROM j LEFT JOIN read_json('$FX/standard_country_map.jsonl',
        format='newline_delimited',
        columns={"lookup_key":'VARCHAR',"korean_name":'VARCHAR',
                 "english_name":'VARCHAR',"country_code_3":'VARCHAR',
                 "country_code_2":'VARCHAR'}) s
        USING (lookup_key)"""))

  /** F16+A4+J3+F12/F13+F14/J4+J5 — the flight pipeline (Flights.flatten →
    * Flights.gold): nested itinerary ×2 explode, monthly-average
    * two-key left join, price delta/state/score (Korean categoricals),
    * airport-list explode to city codes, 2→3-letter country map with VN
    * deliberately missing. Output columns are ASCII-aliased for the
    * cross-engine hash (SURVEY §7.4.4); the Korean VALUES (상승/하락/동일)
    * hash fine, as q14 proved. Ref: _archive/flight_price_preprocessing
    * .py:3-49, flight_avg_merge.py:26-118. */
  private val q39 = Q(
    "q39_flights_gold",
    (s, _) => {
      val flat = graft.ops.Flights.flatten(graft.sources.Fixtures.flightsRaw(s))
      val gold = graft.ops.Flights.gold(
        flat, graft.ops.Flights.monthlyAvgPrices(flat),
        graft.sources.Fixtures.cityMeta(s), graft.sources.Fixtures.code2to3)
      gold.select(
        col("출발_공항_코드").as("dep_airport"),
        col("출발_도시_이름").as("dep_city"),
        col("출발_국가_코드").as("dep_country2"),
        col("출발_국가_3자리").as("dep_country3"),
        col("도착_공항_코드").as("arr_airport"),
        col("도착_도시_이름").as("arr_city"),
        col("도착_국가_코드").as("arr_country2"),
        col("도착_국가_3자리").as("arr_country3"),
        col("도착_도시코드_3자리").as("arr_city_code3"),
        col("항공사_코드").as("carrier_code"),
        col("좌석_등급").as("cabin_class"),
        col("비행시간_초").as("duration_s"),
        col("가격").as("price"),
        col("할인여부").as("is_discounted"),
        col("도착_월").as("arr_month"),
        col("평균가격").as("avg_price"),
        col("가격차이").as("price_diff"),
        col("증감률(%)").as("pct_change"),
        col("가격상태").as("price_state"),
        col("점수").as("score"))
    },
    Some(s"""
      WITH its AS (
        SELECT unnest(itineraries) AS it FROM read_json('$FX/flights_raw.jsonl')),
      segs AS (
        SELECT it.price.amount AS price,
          coalesce(it.price.priceBeforeDiscount, it.price.amount)
            <> it.price.amount AS is_discounted,
          unnest(it.sector.sectorSegments) AS ss
        FROM its),
      flat AS (
        SELECT
          ss.segment.source.station.code AS dep_airport,
          ss.segment.source.station.city.name AS dep_city,
          ss.segment.source.station.country.code AS dep_country2,
          ss.segment.destination.station.code AS arr_airport,
          ss.segment.destination.station.city.name AS arr_city,
          ss.segment.destination.station.country.code AS arr_country2,
          month(CAST(ss.segment.destination.localTime AS TIMESTAMP)) AS arr_month,
          ss.segment.carrier.code AS carrier_code,
          ss.segment.cabinClass AS cabin_class,
          CAST(ss.segment.duration AS INTEGER) AS duration_s,
          price, is_discounted
        FROM segs),
      avgp AS (
        SELECT arr_airport AS city_code, arr_month AS mon,
          avg(price) AS avg_price
        FROM flat GROUP BY 1, 2),
      joined AS (
        SELECT f.*, a.avg_price
        FROM flat f LEFT JOIN avgp a
          ON f.arr_airport = a.city_code AND f.arr_month = a.mon),
      city AS (
        SELECT unnest(string_split(
            regexp_replace(airport_codes, '[\\[\\]'' ]', '', 'g'), ',')) AS ap,
          final_city_code
        FROM read_json('$FX/city_meta.jsonl')
        WHERE airport_codes IS NOT NULL AND final_city_code IS NOT NULL),
      c23(c2, c3) AS (
        SELECT * FROM (VALUES ('KR','KOR'),('JP','JPN'),('FR','FRA'),('TH','THA')))
      SELECT j.dep_airport, j.dep_city, j.dep_country2, d23.c3 AS dep_country3,
        j.arr_airport, j.arr_city, j.arr_country2, a23.c3 AS arr_country3,
        city.final_city_code AS arr_city_code3,
        j.carrier_code, j.cabin_class, j.duration_s, j.price,
        j.is_discounted, j.arr_month,
        j.avg_price, j.price - j.avg_price AS price_diff,
        round((j.price - j.avg_price)/j.avg_price*100, 2) AS pct_change,
        CASE WHEN j.price - j.avg_price > 0 THEN '상승'
             WHEN j.price - j.avg_price < 0 THEN '하락'
             ELSE '동일' END AS price_state,
        CAST(CASE WHEN j.price - j.avg_price > 0 THEN -1
                  WHEN j.price - j.avg_price < 0 THEN 1
                  ELSE 0 END AS INTEGER) AS score
      FROM joined j
      LEFT JOIN city ON j.arr_airport = city.ap
      LEFT JOIN c23 d23 ON j.dep_country2 = d23.c2
      LEFT JOIN c23 a23 ON j.arr_country2 = a23.c2"""))

  /** README.md:119 — the LEFT-join master-data coverage mode: every one
    * of the 59 master countries survives, including those whose currency
    * never scraped (null rates, null change-percent, score 0.0 — the
    * reference's cannot-compute default, exchage_rate_crawler.py:642).
    * Same monthly-map canonicalization as q37. */
  private val q40 = Q(
    "q40_rates_coverage",
    (s, _) => {
      val gold = graft.ops.Rates.gold(
        graft.sources.Fixtures.ratesRaw(s),
        graft.sources.Fixtures.countryMaster(s),
        joinMode = "left")
      gold
        .select(col("*"), explode_outer(map_entries(col("monthly_avg_rates"))).as("me"))
        .select(
          col("country_code_3"), col("currency_code"),
          col("country_korean_name"), col("country_english_name"),
          col("country_code_2"), col("is_euro_zone"),
          col("realtime_rate"), col("realtime_crawled_at_utc"),
          col("realtime_crawled_at_kst"), col("daily_avg_rate"),
          col("yearly_avg_rate"), col("exchange_rate_change_percent"),
          col("exchange_rate_score"), col("dataType"),
          col("me.key").as("month_key"), col("me.value").as("monthly_rate"))
    },
    Some(s"""
      WITH dim AS (
        SELECT currency_code, country_code_3,
          country_name_kor AS country_korean_name,
          country_name_eng AS country_english_name,
          country_code_2, is_euro_zone
        FROM read_json('$FX/country_master.jsonl', format='newline_delimited',
          columns={"country_code_3":'VARCHAR',"country_name_eng":'VARCHAR',
                   "country_name_kor":'VARCHAR',"country_code_2":'VARCHAR',
                   "currency_code":'VARCHAR',"is_euro_zone":'BOOLEAN',
                   "google_trend_keyword_kor":'VARCHAR'})),
      enr AS (
        SELECT r.*, d.country_code_3
        FROM read_json('$FX/rates_raw.jsonl', format='newline_delimited',
          columns={"currency_code":'VARCHAR',"rate_type":'VARCHAR',
                   "month_key":'VARCHAR',"buy_rate":'DOUBLE',
                   "sell_rate":'DOUBLE',"send_rate":'DOUBLE',
                   "receive_rate":'DOUBLE',"standard_rate":'DOUBLE',
                   "crawled_at_utc":'VARCHAR',"crawled_at_kst":'VARCHAR'}) r
        JOIN dim d USING (currency_code)),
      wide AS (
        SELECT country_code_3,
          max(CASE WHEN rate_type='realtime' THEN standard_rate END) AS realtime_rate,
          max(CASE WHEN rate_type='realtime' THEN crawled_at_utc END) AS realtime_crawled_at_utc,
          max(CASE WHEN rate_type='realtime' THEN crawled_at_kst END) AS realtime_crawled_at_kst,
          max(CASE WHEN rate_type='daily_avg' THEN standard_rate END) AS daily_avg_rate,
          max(CASE WHEN rate_type='yearly_avg' THEN standard_rate END) AS yearly_avg_rate
        FROM enr GROUP BY country_code_3),
      monthly AS (
        SELECT DISTINCT country_code_3, month_key, standard_rate AS monthly_rate
        FROM enr WHERE rate_type='monthly_avg' AND month_key IS NOT NULL),
      pcts AS (
        SELECT w.*,
          CASE WHEN realtime_rate IS NOT NULL AND yearly_avg_rate IS NOT NULL
                    AND yearly_avg_rate > 0
            THEN (realtime_rate - yearly_avg_rate)/yearly_avg_rate*100 END AS pct
        FROM wide w)
      SELECT d.country_code_3, d.currency_code, d.country_korean_name,
        d.country_english_name, d.country_code_2, d.is_euro_zone,
        p.realtime_rate, p.realtime_crawled_at_utc, p.realtime_crawled_at_kst,
        p.daily_avg_rate, p.yearly_avg_rate,
        round(p.pct, 2) AS exchange_rate_change_percent,
        coalesce(round(CASE WHEN p.pct IS NULL THEN 0.0
          ELSE least(100.0, greatest(0.0, (10.0 - p.pct)/20.0*100)) END, 2), 0.0)
          AS exchange_rate_score,
        'exchangeRate' AS dataType,
        m.month_key, m.monthly_rate
      FROM dim d
      LEFT JOIN pcts p USING (country_code_3)
      LEFT JOIN monthly m ON d.country_code_3 = m.country_code_3"""))

  /** Mergeable HLL distinct-count sketch (DistinctSketch) in its
    * oracle-exact sparse regime: sparseLimit 2^21 far exceeds the true
    * cardinalities at verify SFs, so the values equal exact
    * count(DISTINCT) — the q36 capacity>vocab trick — while the plan
    * stays ONE ObjectHashAggregate pass with no Expand (q31's two exact
    * distincts multiply the scanned rows 3x; at 100 TB the sketch form
    * is the one that survives, and its partial states merge across any
    * partitioning). */
  private val q41 = Q(
    "q41_distinct_sketch",
    (s, d) => {
      graft.plans.GraftExtensions.install(s)
      // The hash-match is only sound while every group stays in the
      // sketch's exact sparse regime. n_rows >= n_distinct per group, so
      // n_rows <= sparseLimit proves it; the guard is woven into the
      // emitted n_orders column (so pruning can't drop it) and raises
      // loudly if a larger verify SF ever crosses the regime instead of
      // silently flipping to estimation and hash-mismatching.
      val sparseLimit = 1 << 21
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          graft.functions.DistinctSketch.hll_distinct(col("l_orderkey"), 14, sparseLimit).as("n_orders"),
          graft.functions.DistinctSketch.hll_distinct(col("l_partkey"), 14, sparseLimit).as("n_parts"),
          count(lit(1)).as("n_rows"))
        .select(
          col("l_returnflag"),
          when(col("n_rows") <= lit(sparseLimit.toLong), col("n_orders"))
            .otherwise(raise_error(concat(
              lit("q41 outside exact sparse regime (n_rows="),
              col("n_rows").cast("string"),
              lit(s" > sparseLimit=$sparseLimit): raise sparseLimit or lower the verify SF"))))
            .as("n_orders"),
          col("n_parts"), col("n_rows"))
    },
    Some("""
      SELECT l_returnflag,
        CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
        CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        count(*) AS n_rows
      FROM lineitem GROUP BY 1"""))

  /** S6 under the oracle — the dynamic-key config-object scan
    * (Bronze.readConfigMap): one JSON object keyed by country code,
    * transposed to rows via the map round-trip; the twin reads the
    * flattened JSONL form of the SAME reference config, so a green row
    * proves the transpose emits exactly one correct row per dynamic key
    * (exchage_rate_crawler.py:45-47 config load). */
  private val q42 = Q(
    "q42_config_map",
    (s, _) => {
      val valueSchema = org.apache.spark.sql.types.StructType.fromDDL(
        "country_name_eng string, country_name_kor string, " +
          "country_code_2 string, country_code_3 string, " +
          "currency_code string, is_euro_zone boolean, " +
          "google_trend_keyword_kor string")
      graft.sources.Bronze.readConfigMap(
        s, graft.sources.Fixtures.path("country_config.json"), valueSchema)
        .select(
          col("key"), col("country_code_3"), col("country_name_eng"),
          col("country_name_kor"), col("country_code_2"),
          col("currency_code"), col("is_euro_zone"))
    },
    Some(s"""
      SELECT country_code_3 AS key, country_code_3, country_name_eng,
        country_name_kor, country_code_2, currency_code, is_euro_zone
      FROM read_json('$FX/country_master.jsonl', format='newline_delimited',
        columns={"country_code_3":'VARCHAR',"country_name_eng":'VARCHAR',
                 "country_name_kor":'VARCHAR',"country_code_2":'VARCHAR',
                 "currency_code":'VARCHAR',"is_euro_zone":'BOOLEAN',
                 "google_trend_keyword_kor":'VARCHAR'})"""))

  /** Event-time sessionization SEMANTICS under the oracle — the batch
    * twin of `Events.sessionizeEventTime` (q43 ↔ the MemoryStream specs
    * cover the streaming state machine; this covers the session algebra
    * itself): 1-hour gap over the events table, session spans exported
    * as unix micros for engine-neutral hashing. */
  private val q43 = Q(
    "q43_sessionize_batch",
    (s, d) => {
      val sess = graft.streaming.Events.sessionizeBatch(
        Tables.events(s, d), gapMs = 3600L * 1000L)
      sess.select(
        col("user_id"), col("session_id"),
        unix_micros(col("session_start")).as("start_us"),
        unix_micros(col("session_end")).as("end_us"),
        col("n_events"), r2(col("total_value")).as("total_value"))
    },
    Some("""
      WITH l AS (
        SELECT user_id, ts, value, event_id,
          lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
        FROM events),
      f AS (
        SELECT *, CASE WHEN pts IS NULL
            OR epoch_us(ts) - epoch_us(pts) > 3600000000 THEN 1 ELSE 0 END AS newf
        FROM l),
      g AS (
        SELECT *, CAST(sum(newf) OVER (PARTITION BY user_id
          ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM f)
      SELECT user_id, session_id,
        epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us,
        count(*) AS n_events,
        floor(sum(value)*100 + 0.5)/100 AS total_value
      FROM g GROUP BY 1, 2"""))

  /** Theta-sketch set operations in the oracle-exact regime — the
    * cross-cohort question HLL cannot answer: per-event_type user
    * sketches built in ONE pass, then distinct/intersection/union user
    * counts for every type pair computed from the SKETCHES alone (no
    * re-read). k=4096 > 150 users ⇒ θ=1 ⇒ every estimate is exact, so
    * DuckDB's true distinct/overlap counts hash-match. */
  private val q44 = Q(
    "q44_theta_cohorts",
    (s, d) => {
      graft.plans.GraftExtensions.install(s)
      import graft.functions.{ThetaSketch => T}
      val sk = Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(T.theta_sketch(col("user_id"), 4096).as("sk"))
      val a = sk.select(col("event_type").as("et_a"), col("sk").as("sk_a"))
      val b = sk.select(col("event_type").as("et_b"), col("sk").as("sk_b"))
      a.join(b, col("et_a") < col("et_b"))
        .select(
          col("et_a"), col("et_b"),
          T.theta_estimate(col("sk_a")).as("n_a"),
          T.theta_estimate(col("sk_b")).as("n_b"),
          T.theta_intersect_estimate(col("sk_a"), col("sk_b")).as("n_both"),
          T.theta_union_estimate(col("sk_a"), col("sk_b")).as("n_either"))
    },
    Some("""
      WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
      c AS (SELECT event_type, count(*) AS n FROM d GROUP BY 1),
      i AS (SELECT a.event_type AS et_a, b.event_type AS et_b,
              count(*) AS n_both
            FROM d a JOIN d b USING (user_id)
            WHERE a.event_type < b.event_type GROUP BY 1, 2)
      SELECT ca.event_type AS et_a, cb.event_type AS et_b,
        CAST(ca.n AS DOUBLE) AS n_a, CAST(cb.n AS DOUBLE) AS n_b,
        CAST(coalesce(i.n_both, 0) AS DOUBLE) AS n_both,
        CAST(ca.n + cb.n - coalesce(i.n_both, 0) AS DOUBLE) AS n_either
      FROM c ca JOIN c cb ON ca.event_type < cb.event_type
      LEFT JOIN i ON i.et_a = ca.event_type AND i.et_b = cb.event_type"""))

  /** The salting escape hatch under the oracle: q14's exact computation
    * routed through Core.saltedJoin (salt 8) must hash-match the SAME
    * plain-join twin — the salt spreads row placement and leaves the
    * relational result untouched (CoreSpec pins it on a synthetic skewed
    * fact; this pins it against DuckDB on real data). */
  private val q45 = Q(
    "q45_salted_join",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d).withColumnRenamed("p_partkey", "l_partkey")
      val diff = col("l_extendedprice") / col("l_quantity") - col("p_retailprice")
      graft.ops.Core.saltedJoin(li, p, Seq("l_partkey"), salt = 8)
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

  /** Dedup CLUSTER RESOLUTION — the stage after candidate pairs that every
    * real dedup pipeline needs: near-dup pairs (q20's prefix-blocked
    * Jaccard edges) → connected components (min-label propagation +
    * pointer jumping, `Text.connectedComponents`) → one row per document
    * with canonical cluster id (component min), cluster size, and keeper
    * flag. The DuckDB twin computes the SAME transitive closure with a
    * recursive CTE, so a green row proves the distributed iterative
    * algorithm reaches the exact fixpoint (including transitive chains
    * a→b→c where a and c never pair directly). */
  private val q46 = Q(
    "q46_dedup_clusters",
    (s, d) => graft.ops.Text.dedupClusters(
      Tables.documents(s, d),
      prefixJaccardPairs(s, d).select(col("doc_a"), col("doc_b"))),
    Some("""
      WITH RECURSIVE d AS (
        SELECT doc_id, substr(text, 1, 30) AS pfx,
          list_distinct(string_split(text, ' ')) AS toks
        FROM documents),
      e AS (
        SELECT a.doc_id AS a, b.doc_id AS b
        FROM d a JOIN d b ON a.pfx = b.pfx AND a.doc_id < b.doc_id
        WHERE len(list_intersect(a.toks, b.toks))::DOUBLE
              / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.5),
      sym AS (SELECT a, b FROM e UNION SELECT b AS a, a AS b FROM e),
      reach(node, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT reach.node, sym.b FROM reach JOIN sym ON sym.a = reach.r),
      comp AS (SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node),
      sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY 1)
      SELECT c.doc_id, c.cluster_id, s.cluster_size,
        c.doc_id = c.cluster_id AS is_keeper
      FROM comp c JOIN sizes s USING (cluster_id)"""))

  /** Deterministic stratified downsampling (Corpus.hashSample): keep 50%
    * of the dominant language and 20% of the rest, selected by a pure
    * hash of (doc_id, salt) — the corpus-balancing pass of a training
    * pipeline. The twin recomputes the identical md5-derived uniform in
    * DuckDB, so a green row proves bit-for-bit reproducible sampling
    * (same rows on ANY engine/run — `sample()`/`rand()` cannot do this).
    * One scan, no shuffle. */
  private val q47 = Q(
    "q47_hash_sample",
    (s, d) => {
      import graft.ops.Corpus
      Corpus.hashSample(
        Tables.documents(s, d), col("doc_id"), col("lang"),
        rates = Map("en" -> 0.5), defaultRate = 0.2, salt = "graft-r3")
        .select(col("doc_id"), col("lang"), col("source"),
          r(Corpus.uniformHash(col("doc_id"), "graft-r3"), 6).as("u"))
    },
    Some("""
      WITH u AS (
        SELECT doc_id, lang, source,
          (('0x' || substr(md5(doc_id::VARCHAR || 'graft-r3'), 1, 15))::BIGINT)::DOUBLE
            / 1152921504606846976 AS uh
        FROM documents)
      SELECT doc_id, lang, source, floor(uh*1000000 + 0.5)/1000000 AS u
      FROM u
      WHERE uh < CASE WHEN lang = 'en' THEN 0.5 ELSE 0.2 END"""))

  /** Token-budget sequence packing (Corpus.packSequences): documents
    * packed into ~2048-token training bins, independently per shard so
    * no global sort exists at any scale. Checked as per-bin aggregates;
    * the twin mirrors the running-sum bin algebra in DuckDB windows. */
  private val q48 = Q(
    "q48_pack_sequences",
    (s, d) => {
      val packed = graft.ops.Corpus.packSequences(
        Tables.documents(s, d), graft.ops.Text.wsTokenCount(col("text")),
        budget = 2048L, nShards = 4)
      packed.groupBy(col("shard"), col("bin"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("total_tokens"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
    },
    Some("""
      WITH t AS (
        SELECT doc_id, doc_id % 4 AS shard,
          len(string_split(text, ' ')) AS n_tok
        FROM documents),
      c AS (
        SELECT *, sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
          ROWS UNBOUNDED PRECEDING) AS cum
        FROM t)
      SELECT shard, CAST(floor((cum - n_tok) / 2048) AS BIGINT) AS bin,
        count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS total_tokens,
        min(doc_id) AS first_doc, max(doc_id) AS last_doc
      FROM c GROUP BY 1, 2"""))

  /** Per-label embedding centroids via the native `vec_avg` mergeable
    * aggregate (functions/VectorAgg): ONE pass over the corpus, O(dim)
    * state per group, no posexplode (which would multiply the shuffle by
    * the 64x dimension) and no driver collect. The twin averages
    * element-indexed floats in DuckDB; first 4 components checked,
    * rounded to 1e-6 (partial-aggregation sum order differs from
    * DuckDB's sequential sum by ~1 ulp). */
  private val q49 = Q(
    "q49_embedding_centroids",
    (s, d) => {
      graft.plans.GraftExtensions.install(s)
      val cols = (1 to 4).map(i =>
        r(element_at(col("c"), i), 6).as(s"c$i"))
      Tables.embeddings(s, d)
        .groupBy(col("label"))
        .agg(graft.functions.VectorAgg.vec_avg(col("embedding")).as("c"),
          count(lit(1)).as("n"))
        .select(col("label") +: col("n") +: cols: _*)
    },
    Some("""
      SELECT label, count(*) AS n,
        floor(avg(embedding[1])*1000000 + 0.5)/1000000 AS c1,
        floor(avg(embedding[2])*1000000 + 0.5)/1000000 AS c2,
        floor(avg(embedding[3])*1000000 + 0.5)/1000000 AS c3,
        floor(avg(embedding[4])*1000000 + 0.5)/1000000 AS c4
      FROM embeddings GROUP BY 1"""))

  /** Corpus profiling: exact length/token percentiles per language — the
    * distribution pass a curation pipeline runs before choosing filter
    * thresholds. Spark's `percentile` and DuckDB's `quantile_cont` share
    * the linear-interpolation definition over sorted order statistics
    * (no summation-order sensitivity), checked to 1e-6. One shuffle.
    * At 100 TB swap `percentile` for `percentile_approx` (mergeable
    * KLL-style sketch, no per-group sort buffer) — same query shape. */
  private val q50 = Q(
    "q50_profile_percentiles",
    (s, d) => {
      val toks = graft.ops.Text.wsTokenCount(col("text"))
      Tables.documents(s, d)
        .select(col("lang"), col("n_chars"), toks.as("n_tok"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n"),
          r(percentile(col("n_chars"), lit(0.5)), 6).as("chars_p50"),
          r(percentile(col("n_chars"), lit(0.9)), 6).as("chars_p90"),
          r(percentile(col("n_chars"), lit(0.99)), 6).as("chars_p99"),
          r(percentile(col("n_tok"), lit(0.5)), 6).as("tok_p50"),
          r(percentile(col("n_tok"), lit(0.9)), 6).as("tok_p90"),
          r2(avg(col("n_tok"))).as("tok_mean"))
    },
    Some("""
      WITH t AS (
        SELECT lang, n_chars, len(string_split(text, ' ')) AS n_tok
        FROM documents)
      SELECT lang, count(*) AS n,
        floor(quantile_cont(n_chars, 0.5)*1000000 + 0.5)/1000000 AS chars_p50,
        floor(quantile_cont(n_chars, 0.9)*1000000 + 0.5)/1000000 AS chars_p90,
        floor(quantile_cont(n_chars, 0.99)*1000000 + 0.5)/1000000 AS chars_p99,
        floor(quantile_cont(n_tok, 0.5)*1000000 + 0.5)/1000000 AS tok_p50,
        floor(quantile_cont(n_tok, 0.9)*1000000 + 0.5)/1000000 AS tok_p90,
        floor(avg(n_tok)*100 + 0.5)/100 AS tok_mean
      FROM t GROUP BY 1"""))

  /** Range (interval) join under the oracle — `Core.rangeJoin`'s bucketed
    * equi-join rewrite vs DuckDB's direct inequality join. Intervals are
    * 25 deterministic per-nation 45-day "promo windows" derived from the
    * same tables in both engines (min order day + nationkey*97), NOT
    * aligned to the 30-day bucket width, so every interval spans 2–3
    * buckets and the residual filter does real work at both edges. The
    * Spark plan is a hash equi-join on the bucket key (broadcast-eligible
    * exploded-interval side) — never BroadcastNestedLoopJoin. */
  private val q51 = Q(
    "q51_range_join",
    (s, d) => {
      val day0 = Tables.orders(s, d)
        .agg(min(datediff(col("o_orderdate"), lit("1970-01-01"))).cast("long").as("d0"))
      val iv = Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_name"))
        .crossJoin(broadcast(day0)) // 1-row scalar, same pattern as Trends anchors
        .select(
          col("n_nationkey"), col("n_name"),
          (col("d0") + col("n_nationkey") * 97).as("w_start"),
          (col("d0") + col("n_nationkey") * 97 + 45).as("w_end"))
      val facts = Tables.orders(s, d).select(
        col("o_orderkey"), col("o_totalprice"),
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("o_day"))
      Core.rangeJoin(facts, iv, "o_day", "w_start", "w_end", bucketWidth = 30L)
        .groupBy(col("n_nationkey"), col("n_name"))
        .agg(count(lit(1)).as("n_orders"), r2(sum(col("o_totalprice"))).as("sum_price"))
    },
    Some("""
      WITH b AS (
        SELECT min(date_diff('day', TIMESTAMP '1970-01-01', o_orderdate)) AS d0
        FROM orders),
      iv AS (
        SELECT n_nationkey, n_name,
          d0 + n_nationkey*97 AS w_start, d0 + n_nationkey*97 + 45 AS w_end
        FROM nation, b)
      SELECT iv.n_nationkey, iv.n_name,
        count(*) AS n_orders,
        floor(sum(o.o_totalprice)*100 + 0.5)/100 AS sum_price
      FROM orders o JOIN iv
        ON date_diff('day', TIMESTAMP '1970-01-01', o.o_orderdate) >= iv.w_start
       AND date_diff('day', TIMESTAMP '1970-01-01', o.o_orderdate) < iv.w_end
      GROUP BY 1, 2"""))

  /** PII redaction under the oracle: the corpus is PII-free, so both
    * engines synthesize the SAME contact string from (doc_id, n_chars) and
    * redact it — URL, then email, then phone — with the Java∩RE2 patterns
    * shared verbatim from `Text` (the q26 BPE-pattern trick). Pure
    * map-side codegen'd string work; zero shuffles at any scale. */
  private val q52 = Q(
    "q52_redact_pii",
    (s, d) => {
      val contact = concat(
        lit("doc "), col("doc_id").cast("string"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com or +82-10-"), col("doc_id").cast("string"),
        lit("-"), col("n_chars").cast("string"),
        lit(" see https://ex.invalid/d/"), col("doc_id").cast("string"),
        lit(" end"))
      Tables.documents(s, d)
        .select(col("doc_id"), graft.ops.Text.redactPii(contact).as("redacted"))
    },
    Some(s"""
      WITH t AS (
        SELECT doc_id,
          'doc ' || doc_id || ' contact user' || doc_id ||
          '@example.com or +82-10-' || doc_id || '-' || n_chars ||
          ' see https://ex.invalid/d/' || doc_id || ' end' AS contact
        FROM documents)
      SELECT doc_id,
        regexp_replace(regexp_replace(regexp_replace(contact,
          '${graft.ops.Text.UrlPattern}', '<URL>', 'g'),
          '${graft.ops.Text.EmailPattern}', '<EMAIL>', 'g'),
          '${graft.ops.Text.PhonePattern}', '<PHONE>', 'g') AS redacted
      FROM t"""))

  /** Gopher-style repetition quality filters under the oracle: duplicate
    * word-3-gram fraction (per-row array work, NO shuffle) + top-token
    * concentration (exploded two-level aggregate, both keyed on doc_id so
    * the second groupBy and the final join reuse one clustering). The
    * keep-flag thresholds are applied to bit-exact single-division
    * doubles, so the boolean is engine-stable. */
  private val q53 = Q(
    "q53_repetition",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val dup = docs.select(
        col("doc_id"),
        graft.ops.Text.dupNgramFraction(col("text"), 3).as("dup_frac"))
      dup.join(graft.ops.Text.topTokenStats(docs), "doc_id")
        .select(
          col("doc_id"),
          r(col("dup_frac"), 6).as("dup_ngram_frac"),
          r(col("top_tok_frac"), 6).as("top_tok_frac"),
          col("n_toks"),
          (col("dup_frac") <= 0.05 && col("top_tok_frac") <= 0.125).as("gopher_ok"))
    },
    Some("""
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      g AS (
        SELECT doc_id,
          list_transform(generate_series(1, len(toks) - 2),
            i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])) AS grams
        FROM t),
      d AS (
        SELECT doc_id,
          CASE WHEN len(grams) > 0
            THEN 1.0 - len(list_distinct(grams))::DOUBLE / len(grams)
            ELSE 0.0 END AS dup_frac
        FROM g),
      tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
      cnt AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
      top AS (
        SELECT doc_id, max(c)::DOUBLE / sum(c) AS top_tok_frac,
          CAST(sum(c) AS BIGINT) AS n_toks
        FROM cnt GROUP BY 1)
      SELECT d.doc_id,
        floor(dup_frac*1000000 + 0.5)/1000000 AS dup_ngram_frac,
        floor(top_tok_frac*1000000 + 0.5)/1000000 AS top_tok_frac,
        n_toks,
        (dup_frac <= 0.05 AND top_tok_frac <= 0.125) AS gopher_ok
      FROM d JOIN top USING (doc_id)"""))

  /** Incremental snapshot dedup under the oracle (`Text.incrementalDedup`):
    * even doc_ids play the prior corpus, odd ones the fresh crawl; content
    * is the 15-char text prefix (470 distinct across 500 docs, 16
    * cross-snapshot collisions — real within-batch AND cross-snapshot
    * drops). Spark keys both steps on xxhash64 fingerprints (the scale
    * path); the twin anti-joins on raw content — equal up to 64-bit
    * collisions. One window shuffle + one fingerprint anti-join. */
  private val q54 = Q(
    "q54_incremental_dedup",
    (s, d) => {
      val docs = Tables.documents(s, d).select(
        col("doc_id"), col("source"), substring(col("text"), 1, 15).as("content"))
      val prior = docs.filter(col("doc_id") % 2 === 0)
      val incoming = docs.filter(col("doc_id") % 2 === 1)
      graft.ops.Text.incrementalDedup(incoming, prior, "doc_id", "content")
        .select(col("doc_id"), col("source"))
    },
    Some("""
      WITH d AS (
        SELECT doc_id, source, substr(text, 1, 15) AS content FROM documents),
      inc AS (
        SELECT doc_id, source, content,
          row_number() OVER (PARTITION BY content ORDER BY doc_id) AS rn
        FROM d WHERE doc_id % 2 = 1)
      SELECT doc_id, source FROM inc
      WHERE rn = 1 AND NOT EXISTS (
        SELECT 1 FROM d p WHERE p.doc_id % 2 = 0 AND p.content = inc.content)"""))

  /** Shared DuckDB CTE: (doc_id, pos, gram) 8-token spans over the
    * documents table — interpolated verbatim into the q55/q56/q58 twins
    * so the three span derivations stay definitionally identical. */
  private val GramCte8 = """
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      g AS (
        SELECT doc_id, i AS pos,
          array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
        FROM t, unnest(generate_series(1, len(toks) - 7)) AS u(i))"""

  /** Cross-doc repeated 8-token spans under the oracle
    * (`Text.repeatedSpans`, the Lee et al. exact-substring-dedup
    * primitive). Spark groups on xxhash64 span hashes (the scale path);
    * the twin groups on the literal span string — equal up to 64-bit
    * collisions. Output is position-level (doc_id, pos, n_docs), so the
    * hash never appears in the compared result. */
  private val q55 = Q(
    "q55_repeated_spans",
    (s, d) => graft.ops.Text.repeatedSpans(
      Tables.documents(s, d), n = 8, minDocs = 2),
    Some(s"""$GramCte8,
      rep AS (
        SELECT gram, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM g GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2)
      SELECT g.doc_id, CAST(g.pos AS INTEGER) AS pos, rep.n_docs
      FROM g JOIN rep USING (gram)"""))

  /** The Lee et al. removal step under the oracle: q55's flagged spans
    * merged into per-doc cut intervals (`Text.spanCutList` — the
    * sessionization algebra over token positions). The twin repeats the
    * span derivation and runs the identical lag/cumsum window SQL. */
  private val q56 = Q(
    "q56_span_cutlist",
    (s, d) => graft.ops.Text.spanCutList(
      graft.ops.Text.repeatedSpans(Tables.documents(s, d), n = 8, minDocs = 2)
        .select(col("doc_id"), col("pos")),
      n = 8),
    Some(s"""$GramCte8,
      rep AS (
        SELECT gram FROM g GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2),
      hits AS (
        SELECT g.doc_id, CAST(g.pos AS INTEGER) AS pos FROM g JOIN rep USING (gram)),
      flagged AS (
        SELECT doc_id, pos,
          lag(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos) AS prev_end
        FROM hits),
      ids AS (
        SELECT doc_id, pos,
          sum(CASE WHEN prev_end IS NULL OR pos > prev_end THEN 1 ELSE 0 END)
            OVER (PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cut_id
        FROM flagged)
      SELECT doc_id, CAST(cut_id AS BIGINT) AS cut_id,
        min(pos) AS cut_start, max(pos) + 8 AS cut_end,
        count(*) AS n_spans
      FROM ids GROUP BY 1, 2"""))

  /** TF-IDF keyword extraction under the oracle: term frequency and
    * document frequency as two keyed aggregates, idf from a broadcast
    * 1-row corpus count, top-3 terms per doc by the ROUNDED score (both
    * engines rank the same r6 values, so last-ulp ln() differences cannot
    * flip ranks) with a token tiebreak. Shapes: tok-explode shuffles
    * once on (doc_id, tok); df reuses its output; the final top-k is the
    * q08 window form. */
  private val q57 = Q(
    "q57_tfidf",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val toks = docs.select(col("doc_id"), explode(graft.ops.Text.tokens(col("text"))).as("tok"))
      val tf = toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n"))
      val scored = tf.join(dfreq, "tok").crossJoin(broadcast(n))
        .withColumn("tfidf", r(col("tf") * log(col("n").cast("double") / col("df")), 6))
        .select(col("doc_id"), col("tok"), col("tf"), col("df"), col("tfidf"))
      Core.topKPerGroup(scored, Seq("doc_id"),
        Seq(col("tfidf").desc, col("tok").asc), 3)
    },
    Some("""
      WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2),
      df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
      n AS (SELECT count(*) AS n FROM documents),
      scored AS (
        SELECT tf.doc_id, tf.tok, CAST(tf.tf AS BIGINT) AS tf,
          CAST(df.df AS BIGINT) AS df,
          floor(tf.tf * ln(n.n::DOUBLE / df.df) * 1000000 + 0.5)/1000000 AS tfidf
        FROM tf JOIN df USING (tok), n),
      ranked AS (
        SELECT *, row_number() OVER (
          PARTITION BY doc_id ORDER BY tfidf DESC, tok ASC) AS rn
        FROM scored)
      SELECT doc_id, tok, tf, df, tfidf FROM ranked WHERE rn <= 3"""))

  /** Benchmark-contamination detection under the oracle
    * (`Text.crossCorpusContamination`): odd docs play the training
    * corpus, even docs the benchmark; 8-token span overlap per train doc
    * as count + fraction. Spark semi-joins on span hashes against the
    * DISTINCT reference span set; the twin uses the literal span
    * strings. */
  private val q58 = Q(
    "q58_contamination",
    (s, d) => {
      val docs = Tables.documents(s, d)
      graft.ops.Text.crossCorpusContamination(
        docs.filter(col("doc_id") % 2 === 1),
        docs.filter(col("doc_id") % 2 === 0), n = 8)
        .select(col("doc_id"), col("n_spans"), col("n_contaminated"),
          r(col("contaminated_frac"), 6).as("contaminated_frac"))
    },
    Some(s"""$GramCte8,
      a AS (SELECT * FROM g WHERE doc_id % 2 = 1),
      refg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 2 = 0),
      per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans FROM a GROUP BY 1),
      hit AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_cont FROM a
        WHERE gram IN (SELECT gram FROM refg) GROUP BY 1)
      SELECT per.doc_id, per.n_spans,
        coalesce(hit.n_cont, 0) AS n_contaminated,
        floor(coalesce(hit.n_cont, 0)::DOUBLE / per.n_spans * 1000000 + 0.5)/1000000
          AS contaminated_frac
      FROM per LEFT JOIN hit USING (doc_id)"""))

  /** Deterministic split assignment under the oracle
    * (`Corpus.assignSplit`): 80/10/10 train/val/test from the same
    * md5-derived uniform both engines compute bit-identically; the twin
    * repeats the cumulative-bound CASE. Adding rows never reassigns
    * existing keys — the reproducibility contract `randomSplit` lacks. */
  private val q59 = Q(
    "q59_split_assign",
    (s, d) => Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        graft.ops.Corpus.assignSplit(
          col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "graft-split").as("split")),
    Some("""
      WITH u AS (
        SELECT doc_id, lang,
          (('0x' || substr(md5(doc_id::VARCHAR || 'graft-split'), 1, 15))::BIGINT)::DOUBLE
            / 1152921504606846976 AS uh
        FROM documents)
      SELECT doc_id, lang,
        -- bounds ACCUMULATED exactly as the Spark side's scanLeft does
        -- (0.8 + 0.1 != 0.9 in IEEE doubles; a literal 0.9 would disagree
        -- on rows landing inside the 1-ulp gap)
        CASE WHEN uh < 0.8 THEN 'train'
             WHEN uh < 0.8 + 0.1 THEN 'val'
             ELSE 'test' END AS split
      FROM u"""))

  /** The stream-stream interval join's SEMANTICS under the oracle
    * (q60 ↔ the MemoryStream spec covers the streaming state machine,
    * exactly the q43/sessionize split): `Events.intervalJoinStreams` run
    * in batch mode — watermarks are eliminated on batch frames, leaving
    * the pure two-sided time-bound join — pairing clicks with same-user
    * purchases within ±6 h. Delta exported as µs for engine-neutral
    * hashing (events.ts nanos truncate to µs identically both sides). */
  private val q60 = Q(
    "q60_interval_join",
    (s, d) => {
      val ev = Tables.events(s, d)
      graft.streaming.Events.intervalJoinStreams(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"),
        key = "user_id", before = "6 hours", after = "6 hours")
        .select(
          col("event_id").as("click_id"),
          col("r_event_id").as("purchase_id"),
          (unix_micros(col("r_ts")) - unix_micros(col("ts"))).as("delta_us"))
    },
    Some("""
      SELECT a.event_id AS click_id, b.event_id AS purchase_id,
        epoch_us(b.ts) - epoch_us(a.ts) AS delta_us
      FROM events a JOIN events b
        ON a.user_id = b.user_id
       AND a.event_type = 'click' AND b.event_type = 'purchase'
       AND b.ts >= a.ts - INTERVAL 6 HOUR
       AND b.ts <= a.ts + INTERVAL 6 HOUR"""))

  /** Bloom semi-join reduction under the oracle (`Core.bloomReducedJoin`):
    * lineitem pre-filtered by a broadcast Bloom of urgent-order keys
    * before the join shuffle. The twin is the PLAIN join — a hash match
    * PROVES the reduction is result-invisible (no false negatives; false
    * positives die in the exact join), which is the operator's whole
    * contract. */
  private val q61 = Q(
    "q61_bloom_reduced_join",
    (s, d) => {
      val urgent = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderpriority"))
        .withColumnRenamed("o_orderkey", "l_orderkey")
      Core.bloomReducedJoin(
        Tables.lineitem(s, d).select(col("l_orderkey"), col("l_returnflag"), col("l_quantity")),
        urgent, "l_orderkey", numBits = 1 << 18)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), r2(sum(col("l_quantity"))).as("sum_qty"))
    },
    Some("""
      SELECT l_returnflag, count(*) AS n,
        floor(sum(l_quantity)*100 + 0.5)/100 AS sum_qty
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderpriority = '1-URGENT'
      GROUP BY 1"""))

  /** Weighted sampling under the oracle (`Corpus.weightedSampleKey`,
    * Efraimidis–Spirakis): top-50 documents by u^(1/n_chars). BOTH
    * engines rank the r6-ROUNDED key with a doc_id tiebreak — pow isn't
    * correctly rounded, so ranking raw keys could let a last-ulp
    * difference swap the 50th row. The top-k itself is the q09
    * TakeOrderedAndProject shape. */
  private val q62 = Q(
    "q62_weighted_sample",
    (s, d) => Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"),
        r(graft.ops.Corpus.weightedSampleKey(
          col("doc_id"), col("n_chars"), "graft-ws"), 6).as("wk"))
      .orderBy(col("wk").desc, col("doc_id").asc)
      .limit(50),
    Some("""
      WITH u AS (
        SELECT doc_id, n_chars,
          (('0x' || substr(md5(doc_id::VARCHAR || 'graft-ws'), 1, 15))::BIGINT)::DOUBLE
            / 1152921504606846976 AS uh
        FROM documents)
      SELECT doc_id, n_chars,
        floor(pow(uh, 1.0/n_chars)*1000000 + 0.5)/1000000 AS wk
      FROM u
      ORDER BY wk DESC, doc_id ASC
      LIMIT 50"""))

  /** Temperature-balanced mixing under the oracle
    * (`Corpus.temperatureSample`): per-lang keep rate sqrt(n_min/n_l)
    * (exact division + correctly-rounded sqrt = bit-identical rates both
    * engines) applied via the md5 uniform — en (218 docs) is downsampled
    * ~1.8x toward fr (64), the others barely. A hash-match proves the
    * whole data-derived-rates → deterministic-filter composition. */
  private val q63 = Q(
    "q63_temperature_sample",
    (s, d) => graft.ops.Corpus.temperatureSample(
      Tables.documents(s, d), "lang", col("doc_id"), "graft-temp")
      .select(col("doc_id"), col("lang"), r(col("sample_rate"), 6).as("rate")),
    Some("""
      WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
      m AS (SELECT min(n) AS nmin FROM c),
      rates AS (SELECT lang, sqrt(nmin::DOUBLE / n) AS sample_rate FROM c, m),
      u AS (
        SELECT doc_id, lang,
          (('0x' || substr(md5(doc_id::VARCHAR || 'graft-temp'), 1, 15))::BIGINT)::DOUBLE
            / 1152921504606846976 AS uh
        FROM documents)
      SELECT u.doc_id, u.lang,
        floor(sample_rate*1000000 + 0.5)/1000000 AS rate
      FROM u JOIN rates USING (lang)
      WHERE uh < sample_rate"""))

  /** Exactly-k-per-stratum sampling under the oracle
    * (`Corpus.sampleKPerGroup`): 20 docs per language ranked by the
    * bit-identical md5 uniform with a doc_id tiebreak — the q08 window
    * top-k shape driven by the q47 deterministic hash. */
  private val q64 = Q(
    "q64_sample_k_per_group",
    (s, d) => graft.ops.Corpus.sampleKPerGroup(
      Tables.documents(s, d).select(col("doc_id"), col("lang")),
      Seq("lang"), col("doc_id"), k = 20, salt = "graft-k"),
    Some("""
      WITH u AS (
        SELECT doc_id, lang,
          (('0x' || substr(md5(doc_id::VARCHAR || 'graft-k'), 1, 15))::BIGINT)::DOUBLE
            / 1152921504606846976 AS uh
        FROM documents),
      r AS (
        SELECT doc_id, lang,
          row_number() OVER (PARTITION BY lang ORDER BY uh ASC, doc_id ASC) AS rn
        FROM u)
      SELECT doc_id, lang FROM r WHERE rn <= 20"""))

  /** KLL quantile sketch under the oracle (`functions/QuantileSketch`):
    * per-source n_chars percentiles via `kll_agg` → `kll_quantile`. The
    * sketch is exact while a group stays ≤ k rows (no compaction ever
    * fires), and its quantile rule is the LOWER quantile — smallest value
    * with cumulative weight ≥ max(1, ceil(q·N)) — which the twin computes
    * directly as a window rank selection, sidestepping engine-specific
    * `quantile_disc` interpolation conventions. Guard woven into p25 the
    * q41 way: a verify SF past the exact regime raises instead of
    * silently estimating and hash-mismatching. */
  private val q65 = Q(
    "q65_quantile_sketch",
    (s, d) => {
      graft.plans.GraftExtensions.install(s)
      val k = 1 << 16
      import graft.functions.QuantileSketch.{kll_agg, kll_n, kll_quantile}
      Tables.documents(s, d)
        .groupBy(col("source"))
        .agg(kll_agg(col("n_chars"), k).as("sk"))
        .select(
          col("source"),
          when(kll_n(col("sk")) <= lit(k.toLong), kll_quantile(col("sk"), 0.25))
            .otherwise(raise_error(concat(
              lit("q65 outside exact sketch regime (n_rows="),
              kll_n(col("sk")).cast("string"),
              lit(s" > k=$k): raise k or lower the verify SF"))))
            .as("p25"),
          kll_quantile(col("sk"), 0.5).as("p50"),
          kll_quantile(col("sk"), 0.75).as("p75"),
          kll_quantile(col("sk"), 0.95).as("p95"),
          kll_n(col("sk")).as("n_rows"))
    },
    Some("""
      WITH ranked AS (
        SELECT source, n_chars,
          row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
          count(*) OVER (PARTITION BY source) AS n
        FROM documents)
      SELECT source,
        CAST(max(CASE WHEN rn = greatest(1, CAST(ceil(0.25*n) AS BIGINT)) THEN n_chars END) AS DOUBLE) AS p25,
        CAST(max(CASE WHEN rn = greatest(1, CAST(ceil(0.5*n)  AS BIGINT)) THEN n_chars END) AS DOUBLE) AS p50,
        CAST(max(CASE WHEN rn = greatest(1, CAST(ceil(0.75*n) AS BIGINT)) THEN n_chars END) AS DOUBLE) AS p75,
        CAST(max(CASE WHEN rn = greatest(1, CAST(ceil(0.95*n) AS BIGINT)) THEN n_chars END) AS DOUBLE) AS p95,
        max(n) AS n_rows
      FROM ranked GROUP BY source"""))

  /** The Lee et al. pipeline CLOSED under the oracle: q55's flagged spans
    * → q56's merged cut intervals → `Text.applyCutList` rewrites the
    * corpus with every repeated 8-token span deleted. The twin re-derives
    * the cut list (q56's SQL) and applies it with the same
    * token-interval anti-join + ordered string_agg reassembly, so a green
    * row proves the REWRITTEN TEXT BYTES match across engines — the
    * strongest possible check on the whole dedup chain. */
  private val q66 = Q(
    "q66_apply_cutlist",
    (s, d) => {
      val docs = Tables.documents(s, d)
      graft.ops.Text.applyCutList(
        docs,
        graft.ops.Text.spanCutList(
          graft.ops.Text.repeatedSpans(docs, n = 8, minDocs = 2)
            .select(col("doc_id"), col("pos")),
          n = 8))
    },
    Some(s"""$GramCte8,
      rep AS (
        SELECT gram FROM g GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2),
      hits AS (
        SELECT g.doc_id, CAST(g.pos AS INTEGER) AS pos FROM g JOIN rep USING (gram)),
      flagged AS (
        SELECT doc_id, pos,
          lag(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos) AS prev_end
        FROM hits),
      ids AS (
        SELECT doc_id, pos,
          sum(CASE WHEN prev_end IS NULL OR pos > prev_end THEN 1 ELSE 0 END)
            OVER (PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cut_id
        FROM flagged),
      cuts AS (
        SELECT doc_id, min(pos) AS cut_start, max(pos) + 8 AS cut_end
        FROM ids GROUP BY doc_id, cut_id),
      tok AS (
        SELECT doc_id, i AS pos, toks[i] AS token
        FROM t, unnest(generate_series(1, len(toks))) AS u(i)),
      kept AS (
        SELECT tok.doc_id, tok.pos, tok.token
        FROM tok LEFT JOIN cuts c
          ON tok.doc_id = c.doc_id
          AND tok.pos >= c.cut_start AND tok.pos < c.cut_end
        WHERE c.doc_id IS NULL)
      SELECT doc_id,
        string_agg(token, ' ' ORDER BY pos) AS clean_text,
        count(*) AS n_tokens_kept
      FROM kept GROUP BY doc_id"""))

  /** Context-window chunking under the oracle (`Corpus.chunkDocuments`):
    * 32-token windows advancing by 24 (8-token overlap). The twin builds
    * the same starts with generate_series and slices with list_slice
    * (inclusive end == start + size - 1 mirrors Spark's slice(start,
    * length)); chunk text BYTES and per-chunk token counts both hash. */
  private val q67 = Q(
    "q67_chunk_documents",
    (s, d) => graft.ops.Corpus.chunkDocuments(
      Tables.documents(s, d), chunkSize = 32, stride = 24),
    Some("""
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      c AS (
        SELECT doc_id, CAST(i AS INTEGER) AS chunk_id,
          array_to_string(list_slice(toks, i*24 + 1, i*24 + 32), ' ') AS chunk_text,
          least(32, len(toks) - i*24) AS n_tokens
        FROM t, unnest(generate_series(0,
          CASE WHEN len(toks) > 32
            THEN CAST(ceil((len(toks) - 32)::DOUBLE / 24) AS BIGINT)
            ELSE 0 END)) AS u(i)
        WHERE len(toks) > 0)
      SELECT doc_id, chunk_id, chunk_text, CAST(n_tokens AS BIGINT) AS n_tokens
      FROM c"""))

  /** Quality gate under the oracle (`Text.qualityGate`): the q53 signals
    * composed into keep + FIRST-FAILING-RULE reason per document — the
    * filter-chain report a curation pipeline publishes. Thresholds
    * compare bit-exact single-division doubles, so keep/reason are
    * engine-stable; minTokens=60 actually trips too_short on this corpus
    * and the concentration rule fires on the rest of the drops. */
  private val q68 = Q(
    "q68_quality_gate",
    (s, d) => graft.ops.Text.qualityGate(
      Tables.documents(s, d), minTokens = 60L, maxTokens = 100000L,
      maxDupFrac = 0.05, maxTopFrac = 0.125),
    Some("""
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      g AS (
        SELECT doc_id,
          list_transform(generate_series(1, len(toks) - 2),
            i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])) AS grams
        FROM t),
      dup AS (
        SELECT doc_id,
          CASE WHEN len(grams) > 0
            THEN 1.0 - len(list_distinct(grams))::DOUBLE / len(grams)
            ELSE 0.0 END AS dup_frac
        FROM g),
      tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
      cnt AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
      top AS (
        SELECT doc_id, max(c)::DOUBLE / sum(c) AS top_tok_frac,
          CAST(sum(c) AS BIGINT) AS n_toks
        FROM cnt GROUP BY 1),
      verdict AS (
        SELECT top.doc_id, n_toks,
          CASE
            WHEN n_toks < 60 THEN 'too_short'
            WHEN n_toks > 100000 THEN 'too_long'
            WHEN dup_frac > 0.05 THEN 'repetitive_ngrams'
            WHEN top_tok_frac > 0.125 THEN 'token_concentration'
          END AS reason
        FROM top JOIN dup USING (doc_id))
      SELECT doc_id, n_toks, (reason IS NULL) AS keep, reason
      FROM verdict"""))

  /** Bigram LM scoring under the oracle (`Text.bigramLmScore`): the
    * corpus trains its own add-one bigram model and every doc is scored
    * by mean pair log-probability — the perplexity-filter signal. The
    * twin repeats the window/counts/join pipeline; per-pair log-probs
    * round to integer micro-units BEFORE the sum, so per-doc sums are
    * exact integer arithmetic and partition-order float summation can't
    * perturb the hash. */
  private val q69 = Q(
    "q69_bigram_lm",
    (s, d) => graft.ops.Text.bigramLmScore(Tables.documents(s, d)),
    Some("""
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      tok AS (
        SELECT doc_id, i AS pos, toks[i] AS w
        FROM t, unnest(generate_series(1, len(toks))) AS u(i)),
      pairs AS (
        SELECT doc_id,
          lag(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w1, w AS w2
        FROM tok),
      p AS (SELECT doc_id, w1, w2 FROM pairs WHERE w1 IS NOT NULL),
      c2 AS (SELECT w1, w2, count(*) AS c2 FROM p GROUP BY 1, 2),
      c1 AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
      v AS (SELECT count(DISTINCT w2) AS v FROM p),
      scored AS (
        SELECT p.doc_id,
          CAST(floor(ln((c2 + 1.0) / (c1 + v)) * 1000000 + 0.5) AS BIGINT) AS lp
        FROM p JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v)
      SELECT doc_id, count(*) AS n_pairs,
        floor(sum(lp) / 1000000.0 / count(*) * 1000000 + 0.5) / 1000000 AS lm_score
      FROM scored GROUP BY doc_id"""))

  /** Snapshot diff (CDC derivation) under the oracle: `Core.snapshotDiff`
    * between two versions of the orders table derived deterministically
    * from the same scan in both engines — v_old drops every 5th key,
    * v_new drops every 7th and bumps every 3rd price — vs DuckDB's
    * explicit FULL OUTER JOIN + CASE. Exercises all three change types
    * (insert / delete / update) and the unchanged-row suppression. */
  private val q70 = Q(
    "q70_snapshot_diff",
    (s, d) => {
      val base = Tables.orders(s, d).select(col("o_orderkey"), col("o_totalprice"))
      val vOld = base.filter(col("o_orderkey") % 5 =!= 0)
      val vNew = base.filter(col("o_orderkey") % 7 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 3 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
      Core.snapshotDiff(vOld, vNew, Seq("o_orderkey"))
    },
    Some("""
      WITH o AS (
        SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 5 <> 0),
      n AS (
        SELECT o_orderkey,
          CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1.0
               ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 7 <> 0)
      SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
        n.o_totalprice AS o_totalprice,
        CASE WHEN n.o_orderkey IS NULL THEN 'delete'
             WHEN o.o_orderkey IS NULL THEN 'insert'
             ELSE 'update' END AS change_type
      FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey
      WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
         OR o.o_totalprice <> n.o_totalprice"""))

  /** Int8 scalar quantization under the oracle: per-vector (mn, mx),
    * code sum, and the max dequantization error — every code of every
    * vector feeds the compared values, so a green row proves the
    * quantize/dequantize arithmetic is bit-identical cross-engine (the
    * floor(x+0.5) form; Spark's transform ≡ DuckDB's list_transform).
    * The error column doubles as the property |x̂-x| <= step/2: the twin
    * would diverge if either engine's codes drifted one step. */
  private val q71 = Q(
    "q71_quantize_embeddings",
    (s, d) => {
      import graft.ops.Similarity
      val qz = Similarity.quantizeInt8(Similarity.asDouble(col("embedding")))
      Tables.embeddings(s, d)
        .select(col("vec_id"), qz.as("qz"), Similarity.asDouble(col("embedding")).as("v"))
        .select(
          col("vec_id"),
          r(col("qz.mn"), 6).as("mn"),
          r(col("qz.mx"), 6).as("mx"),
          aggregate(col("qz.codes"), lit(0L), (a, c) => a + c).as("code_sum"),
          r(aggregate(
            zip_with(Similarity.dequantizeInt8(col("qz")), col("v"),
              (xh, x) => abs(xh - x)),
            lit(0.0), (a, e) => greatest(a, e)), 9).as("max_abs_err"))
    },
    Some("""
      WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      q AS (
        SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx FROM e),
      c AS (
        SELECT vec_id, v, mn, mx,
          list_transform(v, x -> CASE WHEN mx = mn THEN 0
            ELSE CAST(floor((x - mn) * 255.0 / (mx - mn) + 0.5) AS INT) END) AS codes
        FROM q),
      dq AS (
        SELECT vec_id, v, mn, mx, codes,
          list_transform(codes, cd -> mn + CAST(cd AS DOUBLE) * (mx - mn) / 255.0) AS deq
        FROM c)
      SELECT vec_id,
        floor(mn*1000000 + 0.5)/1000000 AS mn,
        floor(mx*1000000 + 0.5)/1000000 AS mx,
        CAST(list_sum(codes) AS BIGINT) AS code_sum,
        floor(list_max(list_transform(deq, (xh, i) -> abs(xh - v[i])))*1000000000 + 0.5)
          /1000000000 AS max_abs_err
      FROM dq"""))

  /** Normalization-robust exact dedup (q19's shape over
    * `Text.canonicalText`): case/punctuation/whitespace variants of the
    * same content share a fingerprint. The regex pair lives in the
    * Java∩RE2 intersection; DuckDB needs the explicit 'g' flag (its
    * regexp_replace is first-match by default, Spark's is global). */
  private val q72 = Q(
    "q72_canonical_dedup",
    (s, d) =>
      Tables.documents(s, d)
        .groupBy(md5(graft.ops.Text.canonicalText(col("text"))).as("fingerprint"))
        .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies")),
    Some("""
      SELECT md5(trim(regexp_replace(
          regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
          '\s+', ' ', 'g'))) AS fingerprint,
        min(doc_id) AS keeper_id, count(*) AS n_copies
      FROM documents GROUP BY 1"""))

  /** Deterministic training-order shuffle via the scale-safe global index
    * (Corpus.globalIndex): every document's position in the salted-hash
    * order, computed with a range exchange + per-partition offsets — NOT
    * the single-task `row_number() OVER (ORDER BY …)` the twin uses
    * (DuckDB can afford it; a 100 TB Spark job cannot). A green row
    * proves the distributed index is bit-identical to the sequential
    * definition: same hash, same tiebreak, same contiguous 0-based ids. */
  private val q73 = Q(
    "q73_global_index",
    (s, d) => {
      import graft.ops.Corpus
      Corpus.globalIndex(
        Tables.documents(s, d).select(col("doc_id"), col("lang")),
        Seq(Corpus.uniformHash(col("doc_id"), "shuffle-r5"), col("doc_id")),
        numPartitions = 8, indexName = "pos")
    },
    Some("""
      SELECT doc_id, lang,
        row_number() OVER (ORDER BY
          (('0x' || substr(md5(doc_id::VARCHAR || 'shuffle-r5'), 1, 15))::BIGINT)::DOUBLE
            / 1152921504606846976, doc_id) - 1 AS pos
      FROM documents"""))

  /** Vocabulary construction (Text.vocabulary): top-40 tokens by corpus
    * frequency with rank ids and cumulative coverage — the
    * tokenizer-sizing curve. The aggregate collapses to vocab-sized rows
    * map-side and the sort+limit prunes BEFORE the rank window, so the
    * unpartitioned window sees 40 rows at any corpus size. Coverage is an
    * exact-integer-over-exact-integer double division, identical IEEE
    * result both engines, rounded to 1e-9 for the hash. */
  private val q74 = Q(
    "q74_vocab_coverage",
    (s, d) => {
      val v = graft.ops.Text.vocabulary(Tables.documents(s, d), col("text"), topN = 40)
      v.select(col("token_id"), col("token"), col("n"), r(col("coverage"), 9).as("coverage"))
    },
    Some("""
      WITH t AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
      f AS (SELECT token, count(*) AS n FROM t WHERE token <> '' GROUP BY 1),
      tot AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM f),
      rk AS (
        SELECT token, CAST(n AS BIGINT) AS n,
          row_number() OVER (ORDER BY n DESC, token) - 1 AS token_id,
          CAST(sum(n) OVER (ORDER BY n DESC, token ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum
        FROM f)
      SELECT token_id, token, n, floor(cum/total*1000000000 + 0.5)/1000000000 AS coverage
      FROM rk CROSS JOIN tot WHERE token_id < 40"""))

  /** Schema-evolution union (Core.unionEvolve) under the oracle: three
    * snapshot epochs of the orders feed whose schemas drifted (a column
    * added in epoch 2, another swapped in epoch 3) are concatenated by
    * NAME with NULL backfill in both directions — vs DuckDB's
    * UNION ALL BY NAME, which implements the same semantics natively. */
  private val q75 = Q(
    "q75_union_evolve",
    (s, d) => {
      val o = Tables.orders(s, d)
      val e1 = o.filter(col("o_orderkey") % 3 === 0)
        .select(lit(1L).as("epoch"), col("o_orderkey"), col("o_totalprice"))
      val e2 = o.filter(col("o_orderkey") % 3 === 1)
        .select(lit(2L).as("epoch"), col("o_orderkey"), col("o_totalprice"),
          col("o_orderstatus"))
      val e3 = o.filter(col("o_orderkey") % 3 === 2)
        .select(lit(3L).as("epoch"), col("o_orderkey"), col("o_orderstatus"),
          col("o_orderpriority"))
      Core.unionEvolve(Seq(e1, e2, e3))
    },
    Some("""
      SELECT CAST(1 AS BIGINT) AS epoch, o_orderkey, o_totalprice
      FROM orders WHERE o_orderkey % 3 = 0
      UNION ALL BY NAME
      SELECT CAST(2 AS BIGINT) AS epoch, o_orderkey, o_totalprice, o_orderstatus
      FROM orders WHERE o_orderkey % 3 = 1
      UNION ALL BY NAME
      SELECT CAST(3 AS BIGINT) AS epoch, o_orderkey, o_orderstatus, o_orderpriority
      FROM orders WHERE o_orderkey % 3 = 2"""))

  /** Spark's BUILT-IN session_window aggregate vs the explicit gap-session
    * algebra (q43 exercised graft's own sessionizeBatch; this pins the
    * engine primitive to the same definition). Spark closes a session when
    * the next event's time reaches start+gap, so the twin's new-session
    * predicate is `>= gap`, not `>`. Window bounds are emitted as epoch
    * micros; session_end = last event + gap by both definitions. */
  private val q76 = Q(
    "q76_session_window",
    (s, d) =>
      graft.streaming.Events.sessionWindowCounts(Tables.events(s, d), "1 hour")
        .select(
          col("user_id"),
          unix_micros(col("session_start")).as("start_us"),
          unix_micros(col("session_end")).as("end_us"),
          col("n_events"), r2(col("total_value")).as("total_value")),
    Some("""
      WITH l AS (
        SELECT user_id, ts, value,
          lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
        FROM events),
      f AS (
        SELECT *, CASE WHEN pts IS NULL
            OR epoch_us(ts) - epoch_us(pts) >= 3600000000 THEN 1 ELSE 0 END AS newf
        FROM l),
      g AS (
        SELECT *, sum(newf) OVER (PARTITION BY user_id
          ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_id
        FROM f)
      SELECT user_id,
        epoch_us(min(ts)) AS start_us,
        epoch_us(max(ts)) + 3600000000 AS end_us,
        count(*) AS n_events,
        floor(sum(value)*100 + 0.5)/100 AS total_value
      FROM g GROUP BY user_id, session_id"""))

  /** Cross-corpus SEMANTIC contamination, exact label-blocked form: eval
    * vectors (odd vec_id) whose cosine against any train vector (even
    * vec_id) of the same label reaches 0.4 — with best-match id, max
    * cosine, and hit count. q58 answers this for exact token spans; this
    * catches the paraphrased leak spans can't. The LSH-bucketed scale
    * path (Similarity.lshContaminated — no train×eval cross join) is
    * recall-floor-pinned against this exact form in TextSimilaritySpec. */
  private val q77 = Q(
    "q77_semantic_contamination",
    (s, d) => {
      graft.plans.GraftExtensions.install(s)
      import graft.ops.Similarity
      val e = Tables.embeddings(s, d).select(
        col("vec_id"), col("label"), Similarity.asDouble(col("embedding")).as("v"))
      val n = e.withColumn("nrm",
        sqrt(graft.functions.VectorDot.vec_dot(col("v"), col("v"))))
      val train = n.filter(col("vec_id") % 2 === 0)
        .select(col("vec_id").as("train_id"), col("label"),
          col("v").as("tv"), col("nrm").as("tn"))
      val ev = n.filter(col("vec_id") % 2 === 1)
        .select(col("vec_id").as("eval_id"), col("label"),
          col("v").as("qv"), col("nrm").as("qn"))
      ev.join(train, Seq("label"))
        .withColumn("sim",
          graft.functions.VectorDot.vec_dot(col("qv"), col("tv")) / (col("qn") * col("tn")))
        .filter(col("sim") >= 0.4)
        .groupBy(col("eval_id"))
        .agg(
          max_by(col("train_id"), struct(col("sim"), -col("train_id"))).as("train_id"),
          r(max(col("sim")), 4).as("cosine"),
          count(lit(1)).as("n_hits"))
    },
    Some("""
      WITH e AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      n AS (
        SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
      s AS (
        SELECT ev.vec_id AS eval_id, t.vec_id AS train_id,
          list_dot_product(ev.v, t.v)/(ev.nrm*t.nrm) AS sim
        FROM n ev JOIN n t ON ev.label = t.label
        WHERE ev.vec_id % 2 = 1 AND t.vec_id % 2 = 0
          AND list_dot_product(ev.v, t.v)/(ev.nrm*t.nrm) >= 0.4),
      r AS (
        SELECT *, row_number() OVER (
          PARTITION BY eval_id ORDER BY sim DESC, train_id ASC) AS rn
        FROM s)
      SELECT eval_id,
        max(CASE WHEN rn = 1 THEN train_id END) AS train_id,
        floor(max(sim)*10000 + 0.5)/10000 AS cosine,
        count(*) AS n_hits
      FROM r GROUP BY eval_id"""))

  /** Winnowing fingerprints (Text.winnowFingerprints, the MOSS
    * algorithm): every doc's sliding-window-minimum k-gram hashes — the
    * sparse signature whose guarantee is that any shared w+k-1-token run
    * between two documents shares a fingerprint. The twin rebuilds the
    * identical md5-int60 gram hashes and window minima with DuckDB list
    * lambdas, so every selected fingerprint hash-matches. */
  // winnowing CTE (k=5, w=4) shared verbatim by the q78 and q81 twins:
  // ends in `wf(doc_id, fp)` — one row per distinct fingerprint per doc
  private val WinnowCte = """
      WITH t AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents),
      h AS (
        SELECT doc_id, CASE WHEN len(toks) - 4 >= 1 THEN
            list_transform(range(1, len(toks) - 4 + 1), i ->
              ('0x' || substr(md5(array_to_string(toks[i:i+4], ' ')), 1, 15))::BIGINT)
          ELSE [] END AS hs
        FROM t),
      wn AS (
        SELECT doc_id, CASE
            WHEN len(hs) = 0 THEN []
            WHEN len(hs) < 4 THEN [list_min(hs)]
            ELSE list_distinct(list_transform(range(1, len(hs) - 4 + 2), j ->
              list_min(hs[j:j+3]))) END AS fps
        FROM h),
      wf AS (SELECT doc_id, unnest(fps) AS fp FROM wn)"""

  private val q78 = Q(
    "q78_winnowing",
    (s, d) => graft.ops.Text.winnowFingerprints(
      Tables.documents(s, d), k = 5, w = 4),
    Some(s"$WinnowCte SELECT doc_id, fp FROM wf"))

  /** Mixture/epoch planning (Corpus.epochPlan): per-language token mass
    * and the repeat factor needed to hit each language's share of a 1M
    * token budget. Weights are compile-time literals, the budget product
    * and division are the same IEEE ops both engines, rounded at 1e-6. */
  private val q79 = Q(
    "q79_epoch_plan",
    (s, d) => {
      val plan = graft.ops.Corpus.epochPlan(
        Tables.documents(s, d), "lang", graft.ops.Text.wsTokenCount(col("text")),
        weights = Map("en" -> 0.4, "de" -> 0.15, "es" -> 0.15, "fr" -> 0.15, "zh" -> 0.15),
        budgetTokens = 1000000L)
      plan.select(col("lang"), col("n_docs"), col("n_tokens"),
        col("weight"), r(col("epochs"), 6).as("epochs"))
    },
    Some("""
      WITH c AS (
        SELECT lang, count(*) AS n_docs,
          CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY 1),
      w AS (
        -- weights as DOUBLE from the start: a bare 0.15 is DECIMAL in
        -- DuckDB (exact) but double in Spark, and the product would
        -- differ in the last ulp
        SELECT *, CASE lang WHEN 'en' THEN CAST(0.4 AS DOUBLE)
          WHEN 'de' THEN CAST(0.15 AS DOUBLE) WHEN 'es' THEN CAST(0.15 AS DOUBLE)
          WHEN 'fr' THEN CAST(0.15 AS DOUBLE) WHEN 'zh' THEN CAST(0.15 AS DOUBLE)
          ELSE CAST(0.0 AS DOUBLE) END AS weight
        FROM c)
      SELECT lang, n_docs, n_tokens, weight,
        floor(weight * CAST(1000000 AS DOUBLE) / n_tokens::DOUBLE * 1000000 + 0.5)/1000000 AS epochs
      FROM w"""))

  /** Cross-corpus plagiarism match on winnowing fingerprints
    * (Text.winnowMatch): odd docs vs the even-doc reference — q58's
    * span-contamination question answered from the winnowed (~1/w)
    * signature. Distinct-fp semantics on BOTH sides (winnowFingerprints
    * dedups per doc; the twin's wf mirrors it), so matched_frac is the
    * fraction of the doc's distinct fingerprints seen in the reference. */
  private val q81 = Q(
    "q81_winnow_match",
    (s, d) => {
      val docs = Tables.documents(s, d)
      graft.ops.Text.winnowMatch(
        docs.filter(col("doc_id") % 2 === 1),
        docs.filter(col("doc_id") % 2 === 0), k = 5, w = 4)
        .select(col("doc_id"), col("n_fps"), col("n_matched"),
          r(col("matched_frac"), 6).as("matched_frac"))
    },
    Some(s"""$WinnowCte,
      a AS (SELECT * FROM wf WHERE doc_id % 2 = 1),
      ref AS (SELECT DISTINCT fp FROM wf WHERE doc_id % 2 = 0),
      per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fps FROM a GROUP BY 1),
      hit AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit FROM a
        WHERE fp IN (SELECT fp FROM ref) GROUP BY 1)
      SELECT per.doc_id, per.n_fps,
        coalesce(hit.n_hit, 0) AS n_matched,
        floor(coalesce(hit.n_hit, 0)::DOUBLE / per.n_fps * 1000000 + 0.5)/1000000
          AS matched_frac
      FROM per LEFT JOIN hit USING (doc_id)"""))

  /** Rolling distinct-user analytics: daily actives plus the 7-day
    * rolling distinct count (DAU/WAU). Rolling DISTINCT cannot ride a
    * plain window frame (distinct doesn't decompose); the scale shape is
    * the day×window re-expansion: distinct (day, user) pairs — tiny vs
    * the event stream — joined to the day spine on a 7-day interval,
    * then one exact distinct per day. At sketch-friendly scale swap the
    * per-day `hll_sketch` partials + `hll_merge` over the window
    * (SketchMerge) and skip the re-expansion entirely; exact is the
    * oracle-checkable form. Day strings cut the tz ambiguity (both
    * engines render the UTC calendar date). */
  private val q82 = Q(
    "q82_rolling_dau",
    (s, d) => {
      val daily = Tables.events(s, d)
        .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      val dau = daily.groupBy(col("day")).agg(count(lit(1)).as("dau"))
      val wau = dau.select(col("day")).as("sp")
        .join(daily.as("u"),
          col("u.day").between(date_sub(col("sp.day"), 6), col("sp.day")))
        .groupBy(col("sp.day").as("day"))
        .agg(countDistinct(col("u.user_id")).as("wau"))
      dau.join(wau, Seq("day"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("dau"), col("wau"))
    },
    Some("""
      WITH daily AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      dau AS (SELECT day, count(*) AS dau FROM daily GROUP BY 1),
      wau AS (
        SELECT sp.day, count(DISTINCT u.user_id) AS wau
        FROM dau sp JOIN daily u
          ON u.day BETWEEN sp.day - INTERVAL 6 DAY AND sp.day
        GROUP BY 1)
      SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau.dau, wau.wau
      FROM dau JOIN wau USING (day)"""))

  /** Quality-ranked token-budget trim (Corpus.budgetTrim): per source,
    * keep documents longest-first until 500 tokens are spent — the
    * budgeted greedy selection of a fixed-size corpus. The rank order
    * (n_chars DESC, doc_id) is engine-exact integers, so the kept set is
    * identical by construction; the straddling row is kept (budget =
    * floor on selected mass). */
  private val q80 = Q(
    "q80_budget_trim",
    (s, d) => graft.ops.Corpus.budgetTrim(
      Tables.documents(s, d).select(col("doc_id"), col("source"), col("n_chars"), col("text")),
      stratum = "source",
      order = Seq(col("n_chars").desc, col("doc_id").asc),
      tokCol = graft.ops.Text.wsTokenCount(col("text")),
      budgetTokens = 500L)
      .select(col("doc_id"), col("source"), col("n_chars")),
    Some("""
      WITH c AS (
        SELECT doc_id, source, n_chars,
          len(string_split(text, ' ')) AS tok,
          sum(len(string_split(text, ' '))) OVER (
            PARTITION BY source ORDER BY n_chars DESC, doc_id
            ROWS UNBOUNDED PRECEDING) AS cum
        FROM documents)
      SELECT doc_id, source, n_chars FROM c WHERE cum - tok < 500"""))

  /** One-pass declarative data-quality audit (Corpus.auditConstraints +
    * auditReferential): three row constraints in ONE aggregate over ONE
    * lineitem scan, a uniqueness check, and two foreign-key orphan
    * counts, all in the long (check_name, n_violations, n_rows) audit
    * shape a gate alerts on. discount_le_5pct is a deliberately failing
    * rule so nonzero counts flow through the compare. */
  private val q83 = Q(
    "q83_quality_audit",
    (s, d) => {
      import graft.ops.Corpus
      val li = Tables.lineitem(s, d)
      Corpus.auditConstraints(li,
        rowChecks = Seq(
          "orderkey_not_null" -> col("l_orderkey").isNotNull,
          "quantity_in_1_50" -> col("l_quantity").between(1.0, 50.0),
          "discount_le_5pct" -> (col("l_discount") <= 0.05)),
        uniqueKeys = Seq("unique_order_line" -> Seq("l_orderkey", "l_linenumber")))
        .unionByName(Corpus.auditReferential("fk_lineitem_part",
          li, Seq("l_partkey"), Tables.table(s, d, "part"), Seq("p_partkey")))
        .unionByName(Corpus.auditReferential("fk_orders_customer",
          Tables.orders(s, d), Seq("o_custkey"),
          Tables.customer(s, d), Seq("c_custkey")))
    },
    Some("""
      SELECT 'orderkey_not_null' AS check_name,
        CAST(sum(CASE WHEN l_orderkey IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_violations,
        count(*) AS n_rows FROM lineitem
      UNION ALL
      SELECT 'quantity_in_1_50',
        CAST(sum(CASE WHEN l_quantity BETWEEN 1.0 AND 50.0 THEN 0 ELSE 1 END) AS BIGINT),
        count(*) FROM lineitem
      UNION ALL
      SELECT 'discount_le_5pct',
        CAST(sum(CASE WHEN l_discount <= 0.05 THEN 0 ELSE 1 END) AS BIGINT),
        count(*) FROM lineitem
      UNION ALL
      SELECT 'unique_order_line', CAST(sum(c - 1) AS BIGINT), CAST(sum(c) AS BIGINT)
      FROM (SELECT count(*) AS c FROM lineitem GROUP BY l_orderkey, l_linenumber)
      UNION ALL
      SELECT 'fk_lineitem_part',
        CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT), count(*)
      FROM lineitem l LEFT JOIN (SELECT DISTINCT p_partkey FROM part) p
        ON l.l_partkey = p.p_partkey
      UNION ALL
      SELECT 'fk_orders_customer',
        CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT), count(*)
      FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        ON o.o_custkey = c.c_custkey"""))

  /** Retention cohorts: users bucketed by first-seen day, actives counted
    * at each day offset — the classic cohort triangle. `daily` is the
    * distinct (day, user) pair set (tiny vs the event stream), so the
    * offset aggregate needs count(*), never a countDistinct Expand.
    * DuckDB's datediff is (part, start, end); Spark's is (end, start). */
  private val q84 = Q(
    "q84_retention_cohorts",
    (s, d) => {
      val daily = Tables.events(s, d)
        .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      val first = daily.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
      daily.join(first, Seq("user_id"))
        .groupBy(col("cohort"), datediff(col("day"), col("cohort")).as("day_offset"))
        .agg(count(lit(1)).as("n_active"))
        .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
          col("day_offset"), col("n_active"))
    },
    Some("""
      WITH daily AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      fs AS (SELECT user_id, min(day) AS cohort FROM daily GROUP BY 1),
      g AS (
        SELECT cohort, datediff('day', cohort, day) AS day_offset,
          count(*) AS n_active
        FROM daily JOIN fs USING (user_id) GROUP BY 1, 2)
      SELECT strftime(cohort, '%Y-%m-%d') AS cohort, day_offset, n_active FROM g"""))

  /** Funnel conversion: per first-click cohort day, how many clickers
    * later purchased (strictly after their FIRST click). Two keyed
    * aggregates + one join on user_id; the per-user converted flag is a
    * conditional max so a user with no purchases (left-join nulls)
    * counts 0, identically in both engines (CASE WHEN null → ELSE). */
  private val q85 = Q(
    "q85_funnel",
    (s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id")).agg(min(col("ts")).as("first_click"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"))
      val perUser = clicks.join(purchases, Seq("user_id"), "left")
        .groupBy(col("user_id"), col("first_click"))
        .agg(max(when(col("ts") > col("first_click"), 1L).otherwise(0L)).as("converted"))
      perUser
        .groupBy(date_format(to_date(col("first_click")), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n_clickers"), sum(col("converted")).as("n_converted"))
        .select(col("day"), col("n_clickers"), col("n_converted"),
          r(col("n_converted").cast("double") / col("n_clickers").cast("double"), 6)
            .as("conversion"))
    },
    Some("""
      WITH c AS (
        SELECT user_id, min(ts) AS first_click FROM events
        WHERE event_type = 'click' GROUP BY 1),
      p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
      u AS (
        SELECT c.user_id, c.first_click,
          max(CASE WHEN p.ts > c.first_click THEN 1 ELSE 0 END) AS converted
        FROM c LEFT JOIN p USING (user_id) GROUP BY 1, 2)
      SELECT strftime(CAST(first_click AS DATE), '%Y-%m-%d') AS day,
        count(*) AS n_clickers, CAST(sum(converted) AS BIGINT) AS n_converted,
        floor(sum(converted)::DOUBLE / count(*)::DOUBLE * 1000000 + 0.5)/1000000
          AS conversion
      FROM u GROUP BY 1"""))

  /** Day-over-day anomaly detection: z-score of each day's event count
    * against its type's trailing-7-day history. The variance is built
    * from EXACT integer window sums (n, Σcnt, Σcnt²) — never
    * `stddev_samp`, whose streaming/Welford summation order differs
    * between engines in the last ulp — so the double math that follows
    * is the same IEEE ops on the same inputs both sides. Zero-variance
    * history yields a null z (flag false), division guarded both
    * engines. */
  private val q86 = Q(
    "q86_count_anomaly",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-7, -1)
      val hist = daily
        .withColumn("h_n", count(col("cnt")).over(w))
        .withColumn("h_s", sum(col("cnt")).over(w))
        .withColumn("h_ss", sum(col("cnt") * col("cnt")).over(w))
        .filter(col("h_n") >= 3)
      val n = col("h_n").cast("double")
      val sm = col("h_s").cast("double")
      val ss = col("h_ss").cast("double")
      val mean = sm / n
      val variance = (ss - sm * sm / n) / (n - 1)
      val z = when(variance > 0,
        (col("cnt").cast("double") - mean) / sqrt(variance))
      hist.select(
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("cnt"),
        r(z, 6).as("z"),
        coalesce(abs(z) > 2.0, lit(false)).as("is_anomaly"))
    },
    Some("""
      WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS cnt
        FROM events GROUP BY 1, 2),
      h AS (
        SELECT *,
          count(cnt) OVER w AS h_n,
          CAST(sum(cnt) OVER w AS BIGINT) AS h_s,
          CAST(sum(cnt*cnt) OVER w AS BIGINT) AS h_ss
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
          ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
      zc AS (
        SELECT day, event_type, cnt,
          CASE WHEN (h_ss::DOUBLE - h_s::DOUBLE*h_s::DOUBLE/h_n::DOUBLE)
                    / (h_n::DOUBLE - 1) > 0
            THEN (cnt::DOUBLE - h_s::DOUBLE/h_n::DOUBLE)
              / sqrt((h_ss::DOUBLE - h_s::DOUBLE*h_s::DOUBLE/h_n::DOUBLE)
                     / (h_n::DOUBLE - 1)) END AS z
        FROM h WHERE h_n >= 3)
      SELECT strftime(day, '%Y-%m-%d') AS day, event_type, cnt,
        CASE WHEN z IS NULL THEN NULL ELSE floor(z*1000000 + 0.5)/1000000 END AS z,
        coalesce(abs(z) > 2.0, false) AS is_anomaly
      FROM zc"""))

  /** Event-type transition matrix: per-user consecutive event pairs
    * (ordered by event_id — monotone with ts, tie-free) counted into the
    * (from, to) matrix with per-source fractions — the product-analytics
    * path query. One window shuffle on user, one hash aggregate; the
    * fraction window runs over ≤|types|² rows. */
  private val q87 = Q(
    "q87_transitions",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      val wf = Window.partitionBy(col("from_type"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type").as("from_type"))
        .withColumn("to_type", lead(col("from_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
        .groupBy(col("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("frac",
          r(col("n").cast("double") / sum(col("n")).over(wf).cast("double"), 6))
    },
    Some("""
      WITH t AS (
        SELECT event_type AS from_type,
          lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS to_type
        FROM events),
      g AS (
        SELECT from_type, to_type, count(*) AS n FROM t
        WHERE to_type IS NOT NULL GROUP BY 1, 2)
      SELECT from_type, to_type, n,
        floor(n::DOUBLE / (CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT))::DOUBLE
          * 1000000 + 0.5)/1000000 AS frac
      FROM g"""))

  /** Calendar-spine densification: every (day × event_type) cell over the
    * observed range, zero-filled where no qualifying events exist (the
    * reporting join that makes gaps visible instead of silently absent —
    * value > 250 sparsifies to ~1/3 fill). The spine is a 1-row
    * min/max aggregate exploded through `sequence` and cross-joined with
    * the distinct type dim — both broadcast-sized at any event scale. */
  private val q88 = Q(
    "q88_calendar_spine",
    (s, d) => {
      val ev = Tables.events(s, d)
      val filt = ev.filter(col("value") > 250.0)
      val daily = filt
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      // spine bounds from ALL events (not the filtered set), so the
      // report covers the full observed range
      val days = ev.agg(
        min(to_date(col("ts"))).as("d0"), max(to_date(col("ts"))).as("d1"))
        .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      val types = ev.select(col("event_type")).distinct()
      days.crossJoin(broadcast(types))
        .join(daily, Seq("day", "event_type"), "left")
        .select(
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("event_type"),
          coalesce(col("cnt"), lit(0L)).as("cnt"))
    },
    Some("""
      WITH bounds AS (
        SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1 FROM events),
      spine AS (
        SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day FROM bounds),
      types AS (SELECT DISTINCT event_type FROM events),
      daily AS (
        SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS cnt
        FROM events WHERE value > 250.0 GROUP BY 1, 2)
      SELECT strftime(spine.day, '%Y-%m-%d') AS day, types.event_type,
        coalesce(daily.cnt, 0) AS cnt
      FROM spine CROSS JOIN types
      LEFT JOIN daily ON daily.day = spine.day AND daily.event_type = types.event_type"""))

  /** Equi-depth histogram via ntile: 8 equal-count price buckets per
    * returnflag with per-bucket bounds — the data-profiling shape behind
    * range-bucketed features and boundary selection. ntile's remainder
    * distribution is SQL-standard in both engines, and the window order
    * carries a unique (orderkey, linenumber) tiebreak so every row's
    * bucket is identical cross-engine despite duplicate prices. This is
    * the exact form: per-group sort windows are fine while groups fit a
    * task; at corpus scale the KLL boundaries (q65) replace the sort. */
  private val q89 = Q(
    "q89_equidepth_histogram",
    (s, d) => {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_extendedprice"),
          col("l_orderkey"), col("l_linenumber"))
        .withColumn("bucket", ntile(8).over(w))
        .groupBy(col("l_returnflag"), col("bucket"))
        .agg(count(lit(1)).as("n"),
          r2(min(col("l_extendedprice"))).as("lo"),
          r2(max(col("l_extendedprice"))).as("hi"))
    },
    Some("""
      WITH b AS (
        SELECT l_returnflag, l_extendedprice,
          ntile(8) OVER (PARTITION BY l_returnflag
            ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS bucket
        FROM lineitem)
      SELECT l_returnflag, bucket, count(*) AS n,
        floor(min(l_extendedprice)*100 + 0.5)/100 AS lo,
        floor(max(l_extendedprice)*100 + 0.5)/100 AS hi
      FROM b GROUP BY 1, 2"""))

  /** Blocked fuzzy string matching (entity resolution): near-identical
    * part names found by blocking on the last name token and verifying
    * with exact Levenshtein distance — the canonical "same entity,
    * different spelling" join, never the all-pairs cross product.
    * Blocking runs on the DISTINCT name set (entity resolution is about
    * the vocabulary of names, not row multiplicity), so block fan-out is
    * bounded by distinct names per block. Levenshtein is an exact DP —
    * bit-identical in any engine. */
  private val q90 = Q(
    "q90_fuzzy_names",
    (s, d) => {
      val names = Tables.table(s, d, "part").select(col("p_name")).distinct()
        .withColumn("noun", element_at(split(col("p_name"), " "), -1))
      val a = names.select(col("noun"), col("p_name").as("name_a"))
      val b = names.select(col("noun"), col("p_name").as("name_b"))
      a.join(b, Seq("noun"))
        .filter(col("name_a") < col("name_b"))
        .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
        .filter(col("dist") <= 4)
        .select(col("name_a"), col("name_b"), col("dist"))
    },
    Some("""
      WITH n AS (
        SELECT DISTINCT p_name, string_split(p_name, ' ')[-1] AS noun FROM part)
      SELECT a.p_name AS name_a, b.p_name AS name_b,
        levenshtein(a.p_name, b.p_name) AS dist
      FROM n a JOIN n b ON a.noun = b.noun AND a.p_name < b.p_name
      WHERE levenshtein(a.p_name, b.p_name) <= 4"""))

  /** The RelationalGroupedDataset.pivot API with EXPLICIT pivot values —
    * the form that scales: without the value list Spark runs an extra
    * distinct-collect job over the pivot column before it can even plan
    * (a driver-side pass a 100 TB pipeline cannot afford); with it the
    * pivot compiles straight to conditional aggregation, one shuffle.
    * (q05/A3 is the reference's pivot SEMANTICS via explicit conditional
    * aggs; this pins the API surface itself.) Empty cells are null in
    * both engines (sum over no rows). */
  private val q91 = Q(
    "q91_pivot_api",
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(r2(sum(col("l_quantity")))),
    Some("""
      SELECT l_linestatus,
        floor(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END)*100 + 0.5)/100 AS "A",
        floor(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END)*100 + 0.5)/100 AS "N",
        floor(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END)*100 + 0.5)/100 AS "R"
      FROM lineitem GROUP BY 1"""))

  /** Dataset.unpivot (wide → long melt), the inverse API: a per-flag
    * summary's metric columns stacked into (metric, value) rows. Pure
    * metadata projection over the aggregate — the Expand adds rows, not
    * a shuffle. The twin is the UNION ALL expansion unpivot desugars to. */
  private val q92 = Q(
    "q92_unpivot_api",
    (s, d) => {
      val wide = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          r2(sum(col("l_quantity"))).as("sum_qty"),
          r2(sum(col("l_extendedprice"))).as("sum_price"),
          r2(avg(col("l_discount"))).as("avg_disc"))
      wide.unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("avg_disc")),
        "metric", "value")
    },
    Some("""
      WITH w AS (
        SELECT l_returnflag,
          floor(sum(l_quantity)*100 + 0.5)/100 AS sum_qty,
          floor(sum(l_extendedprice)*100 + 0.5)/100 AS sum_price,
          floor(avg(l_discount)*100 + 0.5)/100 AS avg_disc
        FROM lineitem GROUP BY 1)
      SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w
      UNION ALL
      SELECT l_returnflag, 'sum_price', sum_price FROM w
      UNION ALL
      SELECT l_returnflag, 'avg_disc', avg_disc FROM w"""))

  /** Time-weighted average value per user: each event's value weighted by
    * the µs until the user's next event (the metrics/sensor aggregation
    * where plain avg over-counts bursts). Cross-engine exactness comes
    * from INTEGER arithmetic end-to-end: 2-decimal values lift to exact
    * cent BIGINTs, durations are exact µs BIGINTs, so both weighted sums
    * are exact integers and the single final division is the same IEEE
    * op — float summation ORDER never enters (the q69 micro-unit move).
    * One window shuffle on user_id; event_id ordering is tie-free. */
  private val q93 = Q(
    "q93_time_weighted",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      val cents = floor(col("value") * 100 + 0.5).cast("long")
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"), cents.as("cents"))
        .withColumn("next_us", lead(col("us"), 1).over(w))
        .filter(col("next_us").isNotNull)
        .withColumn("dur", col("next_us") - col("us"))
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_intervals"),
          sum(col("dur")).as("total_us"),
          r(sum(col("cents") * col("dur")).cast("double") / lit(100.0) /
            sum(col("dur")).cast("double"), 6).as("twa"))
    },
    Some("""
      WITH e AS (
        SELECT user_id, event_id, epoch_us(ts) AS us,
          CAST(floor(value*100 + 0.5) AS BIGINT) AS cents
        FROM events),
      l AS (
        SELECT *, lead(us) OVER (PARTITION BY user_id ORDER BY event_id) AS next_us
        FROM e),
      d AS (SELECT user_id, cents, next_us - us AS dur FROM l WHERE next_us IS NOT NULL)
      SELECT user_id, count(*) AS n_intervals,
        CAST(sum(dur) AS BIGINT) AS total_us,
        floor(CAST(sum(cents*dur) AS BIGINT)::DOUBLE / 100.0 / CAST(sum(dur) AS BIGINT)::DOUBLE
          * 1000000 + 0.5)/1000000 AS twa
      FROM d GROUP BY 1"""))

  /** The `spark.sql(...)` entry path with a correlated EXISTS subquery —
    * the engine's SQL front door, absent from the rest of the catalog
    * (which pins the DataFrame API). Catalyst's RewritePredicateSubquery
    * turns the EXISTS into a semi join; nothing correlated survives to
    * execution. Identical statement text runs in DuckDB (temp views
    * stand in for the oracle's table views). */
  private val q94 = Q(
    "q94_sql_exists",
    (s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_v")
      Tables.customer(s, d).createOrReplaceTempView("customer_v")
      s.sql("""
        SELECT o.o_orderpriority, count(*) AS n
        FROM orders_v o
        WHERE EXISTS (SELECT 1 FROM customer_v c
                      WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 5000)
        GROUP BY o.o_orderpriority""")
    },
    Some("""
      SELECT o.o_orderpriority, count(*) AS n
      FROM orders o
      WHERE EXISTS (SELECT 1 FROM customer c
                    WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 5000)
      GROUP BY o.o_orderpriority"""))

  /** SQL path, scalar + IN subqueries: the scalar subquery plans as its
    * own tiny aggregate job whose result enters the filter as a literal;
    * the IN rewrites to a semi join. The scalar is `max(...)` (exact — an
    * avg's float summation order is NOT cross-engine stable) scaled by a
    * double literal, so the comparison is the same IEEE op both sides. */
  private val q95 = Q(
    "q95_sql_subqueries",
    (s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer_v")
      Tables.nation(s, d).createOrReplaceTempView("nation_v")
      s.sql("""
        SELECT c_mktsegment, count(*) AS n
        FROM customer_v
        WHERE c_acctbal > (SELECT max(c_acctbal) FROM customer_v) * 0.9
          AND c_nationkey IN (SELECT n_nationkey FROM nation_v WHERE n_regionkey = 1)
        GROUP BY c_mktsegment""")
    },
    Some("""
      SELECT c_mktsegment, count(*) AS n
      FROM customer
      WHERE c_acctbal > (SELECT max(c_acctbal) FROM customer) * CAST(0.9 AS DOUBLE)
        AND c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 1)
      GROUP BY c_mktsegment"""))

  /** Misra-Gries per GROUP: q36's global frequent-items sketch keyed by
    * language — the mergeable-partial contract composing with an ordinary
    * hash aggregate (partial sketches per partition per group, merged at
    * the final). Capacity 256 > per-language vocab keeps the sketch in
    * its exact regime, so the DuckDB twin is plain per-group counts. */
  private val q96 = Q(
    "q96_grouped_frequent",
    (s, d) => {
      graft.plans.GraftExtensions.install(s)
      Tables.documents(s, d)
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("lang"))
        .agg(graft.functions.FrequentItems.frequent_items(col("tok"), 256).as("fi"))
        .select(col("lang"), explode(col("fi")).as("e"))
        .select(col("lang"), col("e.item"), col("e.min_count"))
    },
    Some("""
      SELECT lang, token AS item, count(*) AS min_count FROM (
        SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents)
      WHERE token <> '' GROUP BY lang, token"""))

  /** CUBE + grouping indicators — q30 covers ROLLUP's hierarchy slices;
    * CUBE adds the cross-dimensional subtotals (segment-only, priority-only)
    * a single rollup can't produce, and `grouping()` disambiguates a real
    * NULL key from a subtotal row. One Expand (×4 grouping sets) feeding one
    * hash aggregate. Money is summed as exact BIGINT cents; customer GROWS
    * with SF so its join carries no broadcast hint (AQE picks one at bench
    * scale, the threshold governs at 100×). Both grouping flags are cast to
    * INT explicitly: Spark's grouping() is a TINYINT, DuckDB's GROUPING()
    * an INT — without the cast the values match but the schemas don't. */
  private val q97 = Q(
    "q97_cube_grouping",
    (s, d) => {
      val o = Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderpriority"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      val c = Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
      o.join(c, col("o_custkey") === col("c_custkey"))
        .cube(col("c_mktsegment"), col("o_orderpriority"))
        .agg(
          grouping(col("c_mktsegment")).cast("int").as("g_seg"),
          grouping(col("o_orderpriority")).cast("int").as("g_pri"),
          count(lit(1)).as("n"),
          sum(col("cents")).as("cents_total"))
    },
    Some("""
      SELECT c_mktsegment, o_orderpriority,
        CAST(GROUPING(c_mktsegment) AS INTEGER) AS g_seg,
        CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_pri,
        count(*) AS n,
        CAST(sum(cents) AS BIGINT) AS cents_total
      FROM (
        SELECT c_mktsegment, o_orderpriority,
          CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents
        FROM orders JOIN customer ON o_custkey = c_custkey)
      GROUP BY CUBE(c_mktsegment, o_orderpriority)"""))

  /** The higher-order array-function surface as a first-class oracle query:
    * transform/filter (with AND without the index parameter), aggregate
    * (fold), exists, size, array_max — the per-row vector toolkit the ANN
    * and quantization paths use internally, pinned here against DuckDB's
    * list_* lambdas on the real FLOAT[] column. All map-side, zero
    * shuffles. Float arithmetic never crosses an aggregation boundary
    * un-integered: `micro_sum` folds floor(x*1e6 + 0.5) BIGINTs — each
    * element's scaling is the same IEEE double op in both engines and the
    * integer sum is order-independent, where a raw float sum would hit
    * both engines' summation-order divergence. Index lambdas: Spark's `i`
    * is 0-based, DuckDB's 1-based — the twin compensates with (i-1). */
  private val q98 = Q(
    "q98_hof_surface",
    (s, d) => {
      Tables.embeddings(s, d).select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        size(filter(col("embedding"), x => x > lit(0.0f))).as("n_pos"),
        array_max(col("embedding")).cast("double").as("vmax"),
        array_max(filter(col("embedding"), (x, i) => i % 2 === 0))
          .cast("double").as("even_max"),
        aggregate(col("embedding"), lit(0L),
          (acc, x) => acc + floor(x.cast("double") * 1000000 + 0.5).cast("long"))
          .as("micro_sum"),
        exists(col("embedding"), x => x < lit(-0.5f)).as("has_low"))
    },
    Some("""
      SELECT vec_id,
        len(embedding) AS dim,
        len(list_filter(embedding, x -> x > 0)) AS n_pos,
        CAST(list_max(embedding) AS DOUBLE) AS vmax,
        CAST(list_max(list_filter(embedding, (x, i) -> (i-1) % 2 = 0)) AS DOUBLE) AS even_max,
        CAST(list_sum(list_transform(embedding,
          x -> CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT))) AS BIGINT) AS micro_sum,
        len(list_filter(embedding, x -> x < -0.5)) > 0 AS has_low
      FROM embeddings"""))

  /** Correlation + least-squares regression from EXACT integer sums — the
    * statistical-profile surface (corr/covar/slope/intercept) without the
    * cross-engine trap: both engines' built-in corr/stddev stream Welford
    * co-moments whose accumulation ORDER differs, so the last ulp diverges.
    * Here the six sufficient statistics (n, Σx, Σy, Σx², Σxy, Σy²) are
    * exact BIGINTs (order-independent), cast to double ONCE, and the final
    * formula is the same handful of IEEE ops in both engines — bit-exact
    * by construction, and the same one-shuffle cost as the naive corr().
    * x = quantity (integral), y = floor(price) dollars: Σy² ≈ 6e15 at
    * sf0.1 stays under both 2^63 (BIGINT) and 2^53 (exact double); the
    * at-scale form for sf≥1 is the same sums over DECIMAL(38,0). */
  private val q99 = Q(
    "q99_exact_stats",
    (s, d) => {
      val sums = Tables.lineitem(s, d)
        .select(
          col("l_returnflag"),
          col("l_quantity").cast("long").as("x"),
          floor(col("l_extendedprice")).cast("long").as("y"))
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("y") * col("y")).as("syy"))
      val n = col("n").cast("double")
      val sx = col("sx").cast("double"); val sy = col("sy").cast("double")
      val sxx = col("sxx").cast("double"); val sxy = col("sxy").cast("double")
      val syy = col("syy").cast("double")
      val covn = n * sxy - sx * sy
      val varx = n * sxx - sx * sx
      val vary = n * syy - sy * sy
      sums.select(
        col("l_returnflag"), col("n"),
        r(covn / (sqrt(varx) * sqrt(vary)), 6).as("corr_qp"),
        r(covn / varx, 6).as("slope"),
        r((sy - (covn / varx) * sx) / n, 6).as("intercept"))
    },
    Some("""
      WITH sums AS (
        SELECT l_returnflag, count(*) AS n,
          CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
          CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(x*y) AS BIGINT) AS sxy,
          CAST(sum(y*y) AS BIGINT) AS syy
        FROM (
          SELECT l_returnflag,
            CAST(l_quantity AS BIGINT) AS x,
            CAST(floor(l_extendedprice) AS BIGINT) AS y
          FROM lineitem)
        GROUP BY 1)
      SELECT l_returnflag, n,
        floor((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
          / (sqrt(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
             * sqrt(n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE))
          * 1000000 + 0.5)/1000000 AS corr_qp,
        floor((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
          / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
          * 1000000 + 0.5)/1000000 AS slope,
        floor((sy::DOUBLE - ((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
          / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)) * sx::DOUBLE)
          / n::DOUBLE * 1000000 + 0.5)/1000000 AS intercept
      FROM sums"""))

  /** Positional explode — `posexplode` keeps each token's 0-based offset,
    * the primitive under positional n-grams and span math (q55/q78 recompute
    * positions with a window; this is the direct form). DuckDB twin: two
    * `unnest`s in one SELECT zip positionally, `range(len(...))` supplying
    * the offsets. Empty tokens are filtered AFTER position assignment on
    * both sides, so offsets stay original. Spark's pos is INT, DuckDB's
    * range is BIGINT — cast to long. Map-side only, zero shuffles. */
  private val q100 = Q(
    "q100_posexplode",
    (s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .withColumnRenamed("col", "tok")
        .filter(col("tok") =!= "")
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("tok"))
    },
    Some("""
      SELECT doc_id, pos, tok FROM (
        SELECT doc_id,
          unnest(range(len(string_split(text, ' ')))) AS pos,
          unnest(string_split(text, ' ')) AS tok
        FROM documents)
      WHERE tok <> ''"""))

  /** The ranking-function family over a key WITH ties (rank ≠ dense_rank):
    * rank, dense_rank, percent_rank, cume_dist per market segment over a
    * coarsened balance bucket. All four are pure functions of the key
    * VALUES, so ties don't make them nondeterministic — no tiebreak column
    * needed (q08/q09's rule applies to row_number, which isn't). The
    * bucket is floor(cents/1e5) via explicit DOUBLE division — Spark's `/`
    * on longs is already double division, DuckDB's `/` must be fed a
    * double to match. percent_rank/cume_dist are exact-int ratios, same
    * single division both engines, rounded r6 as belt-and-braces. */
  private val q101 = Q(
    "q101_rank_family",
    (s, d) => {
      val cents = floor(col("c_acctbal") * 100 + 0.5).cast("long")
      val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("bal_k"))
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"),
          floor(cents.cast("double") / 100000.0).cast("long").as("bal_k"))
        .select(col("c_custkey"), col("c_mktsegment"), col("bal_k"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          r(percent_rank().over(w), 6).as("prnk"),
          r(cume_dist().over(w), 6).as("cdist"))
    },
    Some("""
      WITH c AS (
        SELECT c_custkey, c_mktsegment,
          CAST(floor(CAST(floor(c_acctbal*100 + 0.5) AS BIGINT)::DOUBLE / 100000.0) AS BIGINT) AS bal_k
        FROM customer)
      SELECT c_custkey, c_mktsegment, bal_k,
        CAST(rank() OVER w AS BIGINT) AS rnk,
        CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        floor(percent_rank() OVER w * 1000000 + 0.5)/1000000 AS prnk,
        floor(cume_dist() OVER w * 1000000 + 0.5)/1000000 AS cdist
      FROM c
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY bal_k)"""))

  /** String-function surface: upper/reverse/lpad/translate/repeat/instr/
    * substring_index/concat_ws/length on ASCII keys — every pair verified
    * to share semantics (1-based instr/strpos; substring_index(-1) ==
    * split_part(..., 2) when the separator occurs once; no locale
    * dependence on ASCII). Int-returning functions cast to long both
    * sides. Pure projection — predicate-free narrow scan, no shuffle. */
  private val q102 = Q(
    "q102_string_surface",
    (s, d) => {
      Tables.customer(s, d).select(
        col("c_custkey"),
        upper(col("c_name")).as("uname"),
        reverse(col("c_name")).as("rname"),
        lpad(col("c_name"), 22, "*").as("padded"),
        translate(col("c_name"), "Cr#", "Kx_").as("translated"),
        repeat(substring(col("c_name"), 1, 3), 2).as("rep"),
        instr(col("c_name"), "#").cast("long").as("hash_pos"),
        substring_index(col("c_name"), "#", -1).as("cust_num"),
        concat_ws("-", col("c_name"), col("c_mktsegment")).as("tagged"),
        length(col("c_name")).cast("long").as("name_len"))
    },
    Some("""
      SELECT c_custkey,
        upper(c_name) AS uname,
        reverse(c_name) AS rname,
        lpad(c_name, 22, '*') AS padded,
        translate(c_name, 'Cr#', 'Kx_') AS translated,
        repeat(substring(c_name, 1, 3), 2) AS rep,
        CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos,
        split_part(c_name, '#', 2) AS cust_num,
        concat_ws('-', c_name, c_mktsegment) AS tagged,
        CAST(length(c_name) AS BIGINT) AS name_len
      FROM customer"""))

  /** Date/time-function surface over midnight-aligned order timestamps:
    * year/quarter/month/day extraction, ISO week, day-of-week, month
    * truncation, last_day, day difference from an epoch. The two numbering
    * traps are compensated IN THE TWIN and documented here: Spark's
    * dayofweek is 1=Sunday vs DuckDB's 0=Sunday (+1 in the twin), and both
    * weekofyear are ISO-8601 (Jan 1 1995 → week 52). Spark's `trunc`
    * returns DATE like DuckDB's date_trunc-on-timestamp does — using
    * Spark's date_trunc (TIMESTAMP return) would schema-mismatch. */
  private val q103 = Q(
    "q103_datetime_surface",
    (s, d) => {
      val od = col("o_orderdate")
      Tables.orders(s, d).select(
        col("o_orderkey"),
        year(od).cast("long").as("yr"),
        quarter(od).cast("long").as("qtr"),
        month(od).cast("long").as("mon"),
        dayofmonth(od).cast("long").as("dom"),
        weekofyear(od).cast("long").as("iso_week"),
        dayofweek(od).cast("long").as("dow1"),
        trunc(od, "month").as("month_start"),
        last_day(od).as("month_end"),
        datediff(od, lit("1992-01-01")).cast("long").as("days_since"))
    },
    Some("""
      SELECT o_orderkey,
        CAST(year(o_orderdate) AS BIGINT) AS yr,
        CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        CAST(month(o_orderdate) AS BIGINT) AS mon,
        CAST(dayofmonth(o_orderdate) AS BIGINT) AS dom,
        CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
        CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow1,
        date_trunc('month', o_orderdate) AS month_start,
        last_day(o_orderdate) AS month_end,
        CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS days_since
      FROM orders"""))

  /** Conditional/boolean aggregate surface: count_if, bool_or, bool_and,
    * and exact interpolated median — one hash aggregate, map-side partials
    * for all four. The threshold tests run on exact BIGINT cents (a DOUBLE
    * threshold compare would be the same IEEE op anyway, but cents keep it
    * trivially exact); median of BIGINTs interpolates two exact ints with
    * one division — identical both engines at this magnitude (< 2^52). */
  private val q104 = Q(
    "q104_conditional_agg",
    (s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderpriority"), col("o_orderstatus"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n"),
          count_if(col("cents") > lit(20000000L)).as("n_big"),
          bool_or(col("o_orderstatus") === "F").as("any_f"),
          bool_and(col("cents") > lit(0L)).as("all_pos"),
          median(col("cents")).as("med_cents"))
    },
    Some("""
      SELECT o_orderpriority,
        count(*) AS n,
        count(*) FILTER (WHERE cents > 20000000) AS n_big,
        bool_or(o_orderstatus = 'F') AS any_f,
        bool_and(cents > 0) AS all_pos,
        CAST(median(cents) AS DOUBLE) AS med_cents
      FROM (
        SELECT o_orderpriority, o_orderstatus,
          CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents
        FROM orders)
      GROUP BY 1"""))

  /** Lexical diversity — type-token ratio and hapax-legomenon count per
    * document, the vocabulary-richness quality signal q25's score doesn't
    * carry (its stopword/length ratios can't see a doc that repeats a
    * rich-looking 10-word loop). Two hash aggregates, (doc,tok) then doc;
    * the first's map-side combine collapses token repeats before the
    * shuffle, so bytes moved are per-doc VOCAB, not token count. */
  private val q105 = Q(
    "q105_lexical_diversity",
    (s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("doc_id"))
        .agg(
          sum(col("cnt")).as("n_tok"),
          count(lit(1)).as("n_uniq"),
          count_if(col("cnt") === 1).as("hapax"))
        .select(col("doc_id"), col("n_tok"), col("n_uniq"), col("hapax"),
          r(col("n_uniq").cast("double") / col("n_tok").cast("double"), 6).as("ttr"))
    },
    Some("""
      WITH tc AS (
        SELECT doc_id, tok, count(*) AS cnt FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        WHERE tok <> '' GROUP BY 1, 2)
      SELECT doc_id,
        CAST(sum(cnt) AS BIGINT) AS n_tok,
        count(*) AS n_uniq,
        count(*) FILTER (WHERE cnt = 1) AS hapax,
        floor(count(*)::DOUBLE / CAST(sum(cnt) AS BIGINT)::DOUBLE * 1000000 + 0.5)/1000000 AS ttr
      FROM tc GROUP BY 1"""))

  /** Per-group feature normalization (z-score) — the q99 exact-sufficient-
    * statistics discipline applied to the join-back shape: per-language
    * (n, Σx, Σx²) as exact BIGINTs, broadcast back (languages are a
    * bounded dim), sample variance and z computed in the same double ops
    * both engines. This is the feature-scaling pass a training pipeline
    * runs before thresholding per-language length outliers; built-in
    * stddev_samp is the Welford trap q86 documents. */
  private val q106 = Q(
    "q106_zscore_normalize",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("x"))
      val stats = docs.groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("x") * col("x")).as("sxx"))
      val n = col("n").cast("double")
      val sx = col("sx").cast("double"); val sxx = col("sxx").cast("double")
      val mean = sx / n
      val variance = (n * sxx - sx * sx) / (n * (n - lit(1.0)))
      docs.join(broadcast(stats), "lang")
        .select(col("doc_id"), col("lang"), col("x").as("n_tok"),
          r((col("x").cast("double") - mean) / sqrt(variance), 6).as("z"))
    },
    Some("""
      WITH docs AS (
        SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS x
        FROM documents),
      stats AS (
        SELECT lang, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
          CAST(sum(x*x) AS BIGINT) AS sxx
        FROM docs GROUP BY 1)
      SELECT doc_id, lang, x AS n_tok,
        floor((x::DOUBLE - sx::DOUBLE / n::DOUBLE)
          / sqrt((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                 / (n::DOUBLE * (n::DOUBLE - 1.0)))
          * 1000000 + 0.5)/1000000 AS z
      FROM docs JOIN stats USING (lang)"""))

  /** Per-dimension min-max scaling of embeddings, array rebuilt in place —
    * the column-wise feature scaling that has to TRANSPOSE: posexplode to
    * (vec, dim, v), 64-row dim stats, broadcast back, regroup with a
    * sorted-struct collect so element order is rebuilt deterministically
    * (collect_list alone is arrival-ordered — the q34 canonicalization
    * rule). Scaled values become integer MICRO-UNITS (floor(x*1e6+0.5) as
    * BIGINT) and the rebuilt array is array_join'd to one '|' string: the
    * driver's pandas comparator cannot sort/hash top-level ndarray cells
    * (r5 oracle err), and long→string formatting is byte-identical across
    * engines where double→string is not. At 100 TB the stats pass is a
    * 64-row aggregate and the rebuild one shuffle on vec_id. */
  private val q107 = Q(
    "q107_minmax_scale",
    (s, d) => {
      val ex = Tables.embeddings(s, d)
        .select(col("vec_id"), posexplode(col("embedding")))
        .select(col("vec_id"), col("pos").as("dim"), col("col").cast("double").as("v"))
      val stats = ex.groupBy(col("dim"))
        .agg(min(col("v")).as("dmin"), max(col("v")).as("dmax"))
      ex.join(broadcast(stats), "dim")
        .withColumn("scaled_u",
          floor((col("v") - col("dmin")) / (col("dmax") - col("dmin")) * 1000000 + 0.5)
            .cast("long"))
        .groupBy(col("vec_id"))
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("dim"), col("scaled_u")))),
          x => x.getField("scaled_u").cast("string")), "|").as("scaled_vec"))
    },
    Some("""
      WITH ex AS (
        SELECT vec_id,
          unnest(range(len(embedding))) AS dim,
          CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings),
      stats AS (SELECT dim, min(v) AS dmin, max(v) AS dmax FROM ex GROUP BY 1)
      SELECT vec_id,
        array_to_string(
          array_agg(CAST(floor((v - dmin)/(dmax - dmin) * 1000000 + 0.5) AS BIGINT)
                    ORDER BY dim), '|') AS scaled_vec
      FROM ex JOIN stats USING (dim)
      GROUP BY 1"""))

  /** PMI token co-occurrence over a bounded vocabulary — the collocation
    * signal ("New York" vs chance) that feeds phrase mining. Shape is the
    * scale story: distinct (doc, tok) first (map-side combine), semi-join
    * against a top-50-df vocab (broadcast, deterministic df/tok tiebreak)
    * BEFORE the doc-keyed self-join, so pair fan-out is bounded by
    * vocab-tokens-per-doc², never raw doc length². The doc count enters
    * as a 1-row cross join (a literal at execution), ln() on an exact
    * integer ratio is the same IEEE op both sides. */
  private val q108 = Q(
    "q108_pmi_cooccur",
    (s, d) => {
      val doctok = spreadSingleFileFixture(s, Tables.documents(s, d), "doc_id")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .distinct()
      val df = doctok.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val vocab = df.orderBy(col("df").desc, col("tok").asc).limit(50)
      val nd = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
      val vt = doctok.join(broadcast(vocab), "tok")
      val a = vt.select(col("doc_id"), col("tok").as("tok_a"), col("df").as("df_a"))
      val b = vt.select(col("doc_id"), col("tok").as("tok_b"), col("df").as("df_b"))
      a.join(b, Seq("doc_id")).filter(col("tok_a") < col("tok_b"))
        .groupBy(col("tok_a"), col("tok_b"), col("df_a"), col("df_b"))
        .agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= 5)
        .crossJoin(broadcast(nd))
        .select(col("tok_a"), col("tok_b"), col("c_ab"), col("df_a"), col("df_b"),
          r(log(col("c_ab").cast("double") * col("n_docs").cast("double") /
            (col("df_a").cast("double") * col("df_b").cast("double"))), 6).as("pmi"))
    },
    Some("""
      WITH doctok AS (
        SELECT DISTINCT doc_id, tok FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        WHERE tok <> ''),
      df AS (SELECT tok, count(*) AS df FROM doctok GROUP BY 1),
      vocab AS (SELECT tok, df FROM df ORDER BY df DESC, tok ASC LIMIT 50),
      nd AS (SELECT count(*) AS n_docs FROM documents),
      vt AS (SELECT doc_id, doctok.tok, df FROM doctok JOIN vocab USING (tok)),
      pairs AS (
        SELECT a.tok AS tok_a, b.tok AS tok_b, a.df AS df_a, b.df AS df_b,
          count(*) AS c_ab
        FROM vt a JOIN vt b ON a.doc_id = b.doc_id AND a.tok < b.tok
        GROUP BY 1, 2, 3, 4)
      SELECT tok_a, tok_b, c_ab, df_a, df_b,
        floor(ln(c_ab::DOUBLE * n_docs::DOUBLE / (df_a::DOUBLE * df_b::DOUBLE))
          * 1000000 + 0.5)/1000000 AS pmi
      FROM pairs, nd
      WHERE c_ab >= 5"""))

  /** Regexp-function surface over the ASCII name key: extract (group),
    * replace-all, count, boolean match, extract-all. Pattern dialect is the
    * Java∩RE2 subset (no backrefs, no lookaround) so Spark (java.util.regex)
    * and DuckDB (RE2) agree; the one semantic trap is replace: Spark's
    * regexp_replace is replace-ALL, DuckDB's is first-match unless the 'g'
    * flag is passed — compensated in the twin. Pure projection, no shuffle. */
  private val q109 = Q(
    "q109_regexp_surface",
    (s, d) => {
      Tables.customer(s, d).select(
        col("c_custkey"),
        regexp_extract(col("c_name"), "#([0-9]+)$", 1).as("num_part"),
        regexp_replace(col("c_name"), "[0-9]", "*").as("masked"),
        regexp_count(col("c_name"), lit("0")).cast("long").as("zeros"),
        col("c_name").rlike("[13579]$").as("odd_tail"),
        // '|'-joined, not a raw array: the driver's comparator can't hash
        // ndarray cells (r5 oracle err). DuckDB's array_to_string yields
        // NULL on an empty list where array_join yields '' → coalesce twin.
        array_join(
          regexp_extract_all(col("c_name"), lit("([0-9]{2})"), lit(1)),
          "|").as("digit_pairs"))
    },
    Some("""
      SELECT c_custkey,
        regexp_extract(c_name, '#([0-9]+)$', 1) AS num_part,
        regexp_replace(c_name, '[0-9]', '*', 'g') AS masked,
        CAST(len(regexp_extract_all(c_name, '0')) AS BIGINT) AS zeros,
        regexp_matches(c_name, '[13579]$') AS odd_tail,
        coalesce(array_to_string(
          regexp_extract_all(c_name, '([0-9]{2})', 1), '|'), '') AS digit_pairs
      FROM customer"""))

  /** Array set-algebra surface: distinct/sort/intersect/except/overlap/
    * contains against a literal stopword set. Both engines leave set-op
    * result ORDER unspecified, so every array is array_sort-ed before
    * emission — the same canonicalization rule as q34's maps. The distinct
    * token array is produced once in its own projection; CollapseProject
    * won't inline a non-cheap expression consumed four times, so the
    * split+filter+dedup runs once per row, not per use. Map-side only. */
  private val q110 = Q(
    "q110_array_setops",
    (s, d) => {
      val stop = array(Seq("the", "a", "of", "and", "to").map(lit): _*)
      Tables.documents(s, d)
        .select(col("doc_id"),
          array_sort(array_distinct(
            filter(split(col("text"), " "), x => x =!= ""))).as("toks"))
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_uniq"),
          // '|'-joined strings, not raw arrays: the driver's comparator
          // can't hash ndarray cells (r5 oracle err on this query).
          array_join(array_sort(array_intersect(col("toks"), stop)), "|")
            .as("stops_present"),
          array_join(slice(array_sort(array_except(col("toks"), stop)), 1, 5), "|")
            .as("content_head"),
          arrays_overlap(col("toks"), stop).as("has_stop"),
          array_contains(col("toks"), "the").as("has_the"))
    },
    Some("""
      WITH t AS (
        SELECT doc_id,
          list_sort(list_distinct(list_filter(string_split(text, ' '),
            x -> x <> ''))) AS toks
        FROM documents)
      SELECT doc_id,
        CAST(len(toks) AS BIGINT) AS n_uniq,
        coalesce(array_to_string(
          list_sort(list_intersect(toks, ['the','a','of','and','to'])), '|'),
          '') AS stops_present,
        coalesce(array_to_string(
          list_sort(list_filter(toks,
            x -> NOT list_contains(['the','a','of','and','to'], x)))[1:5], '|'),
          '') AS content_head,
        list_has_any(toks, ['the','a','of','and','to']) AS has_stop,
        list_contains(toks, 'the') AS has_the
      FROM t"""))

  /** str_to_map + map explode — the key:value config-string decode (the
    * lightweight cousin of q42's dynamic-key JSON). The map is built from
    * row columns, exploded back to (key, value) rows; the twin derives the
    * same rows relationally (UNION ALL), proving the map round-trip against
    * an implementation that never builds a map. Map-side only. */
  private val q111 = Q(
    "q111_strtomap_explode",
    (s, d) => {
      Tables.customer(s, d)
        .select(col("c_custkey"),
          str_to_map(
            concat_ws(",",
              concat(lit("seg:"), col("c_mktsegment")),
              concat(lit("nat:"), col("c_nationkey"))),
            lit(","), lit(":")).as("m"))
        .select(col("c_custkey"), explode(col("m")))
        .select(col("c_custkey"), col("key"), col("value"))
    },
    Some("""
      SELECT c_custkey, 'seg' AS key, c_mktsegment AS value FROM customer
      UNION ALL
      SELECT c_custkey, 'nat' AS key, CAST(c_nationkey AS VARCHAR) AS value
      FROM customer"""))

  /** Null-handling surface: nullif/nvl2/ifnull/greatest/least — the
    * null-algebra every ETL layer leans on. nullif plants real NULLs from
    * data ('O' status), nvl2 branches on them, greatest/least clamp exact
    * cents. DuckDB lacks nvl2 → CASE in the twin (same three-valued
    * semantics). Pure projection. */
  private val q112 = Q(
    "q112_null_surface",
    (s, d) => {
      val cents = floor(col("o_totalprice") * 100 + 0.5).cast("long")
      Tables.orders(s, d).select(
        col("o_orderkey"),
        nullif(col("o_orderstatus"), lit("O")).as("settled_status"),
        nvl2(nullif(col("o_orderstatus"), lit("O")), lit("settled"), lit("open")).as("state"),
        ifnull(nullif(col("o_orderstatus"), lit("O")), lit("-")).as("status_or_dash"),
        greatest(cents, lit(10000000L)).as("floor_cents"),
        least(cents, lit(30000000L)).as("cap_cents"))
    },
    Some("""
      SELECT o_orderkey,
        nullif(o_orderstatus, 'O') AS settled_status,
        CASE WHEN nullif(o_orderstatus, 'O') IS NOT NULL
             THEN 'settled' ELSE 'open' END AS state,
        ifnull(nullif(o_orderstatus, 'O'), '-') AS status_or_dash,
        greatest(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT), 10000000) AS floor_cents,
        least(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT), 30000000) AS cap_cents
      FROM orders"""))

  /** Window-frame surface: running sum (ROWS unbounded→current), moving
    * average (ROWS 2-preceding), whole-partition first/last/nth_value
    * (ROWS unbounded→unbounded — last_value under the DEFAULT frame is the
    * classic current-row trap), and a value-based RANGE frame over exact
    * cents. Row frames order by the unique o_orderkey (the q08 tiebreak
    * rule); the RANGE frame is tie-inclusive BY VALUE, so it is
    * deterministic without one. One shuffle on o_custkey; both window
    * sorts share it. */
  private val q113 = Q(
    "q113_window_frames",
    (s, d) => {
      val byKey = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      val full = byKey.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val byVal = Window.partitionBy(col("o_custkey")).orderBy(col("cents"))
        .rangeBetween(-10000000L, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
        .select(col("o_custkey"), col("o_orderkey"), col("cents"),
          sum(col("cents")).over(byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("running"),
          r(avg(col("cents")).over(byKey.rowsBetween(-2, Window.currentRow)), 6).as("ma3"),
          first_value(col("cents")).over(full).as("first_cents"),
          last_value(col("cents")).over(full).as("last_cents"),
          nth_value(col("cents"), 2).over(full).as("second_cents"),
          sum(col("cents")).over(byVal).as("near_sum"))
    },
    Some("""
      WITH o AS (
        SELECT o_custkey, o_orderkey,
          CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents
        FROM orders)
      SELECT o_custkey, o_orderkey, cents,
        CAST(sum(cents) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running,
        floor(avg(cents) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) * 1000000 + 0.5)/1000000 AS ma3,
        first_value(cents) OVER w AS first_cents,
        last_value(cents) OVER w AS last_cents,
        nth_value(cents, 2) OVER w AS second_cents,
        CAST(sum(cents) OVER (PARTITION BY o_custkey ORDER BY cents
          RANGE BETWEEN 10000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS near_sum
      FROM o
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"""))

  /** Exact interpolated percentiles (quartiles) per group — Spark's exact
    * `percentile` vs DuckDB's `quantile_cont`, both lower+(higher-lower)×f
    * over a sorted group. BIT-exact by construction at p∈{.25,.5,.75}: the
    * fraction is a dyadic rational, (higher-lower)×f and the final add are
    * exact IEEE ops on integer cents ≪ 2^50, so op-order cannot matter —
    * the one percentile family that needs NO rounding belt. The groupwise
    * sort is the cost; the KLL sketch (q65) is the 100 TB swap. */
  private val q114 = Q(
    "q114_percentile_exact",
    (s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderpriority"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n"),
          expr("percentile(cents, 0.25)").as("p25"),
          expr("percentile(cents, 0.5)").as("p50"),
          expr("percentile(cents, 0.75)").as("p75"))
    },
    Some("""
      SELECT o_orderpriority, count(*) AS n,
        quantile_cont(cents, 0.25) AS p25,
        quantile_cont(cents, 0.5) AS p50,
        quantile_cont(cents, 0.75) AS p75
      FROM (
        SELECT o_orderpriority,
          CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents
        FROM orders)
      GROUP BY 1"""))

  /** Bitwise surface: bit_and/bit_or/bit_xor AGGREGATES (the flag-mask
    * rollups behind feature-bitmap columns) plus scalar shift/and/xor.
    * DuckDB's `^` is exponentiation — its xor is the two-arg `xor()`
    * function, compensated in the twin. One hash aggregate with map-side
    * partials (all three are commutative+associative). */
  private val q115 = Q(
    "q115_bitwise_surface",
    (s, d) => {
      Tables.customer(s, d)
        .select(col("c_mktsegment"),
          col("c_nationkey"),
          shiftleft(col("c_nationkey"), 2).cast("long").as("shifted"),
          col("c_nationkey").bitwiseAND(lit(7L)).as("low3"),
          col("c_nationkey").bitwiseXOR(lit(5L)).as("xored"))
        .groupBy(col("c_mktsegment"))
        .agg(
          bit_and(col("c_nationkey")).as("and_nat"),
          bit_or(col("c_nationkey")).as("or_nat"),
          bit_xor(col("c_nationkey")).as("xor_nat"),
          sum(col("shifted")).as("sum_shifted"),
          sum(col("low3")).as("sum_low3"),
          sum(col("xored")).as("sum_xored"))
    },
    Some("""
      SELECT c_mktsegment,
        bit_and(c_nationkey) AS and_nat,
        bit_or(c_nationkey) AS or_nat,
        bit_xor(c_nationkey) AS xor_nat,
        CAST(sum(c_nationkey << 2) AS BIGINT) AS sum_shifted,
        CAST(sum(c_nationkey & 7) AS BIGINT) AS sum_low3,
        CAST(sum(xor(c_nationkey, 5)) AS BIGINT) AS sum_xored
      FROM customer
      GROUP BY 1"""))

  /** Inverted-index construction — token → document frequency + the head
    * of the sorted posting list, the retrieval-side structure a corpus
    * search layer builds once per snapshot. collect_list is
    * arrival-ordered, so postings are array_sort-ed before the slice (the
    * q34/q107 canonicalization rule); df ≥ 5 bounds output to real vocab.
    * At 100 TB the posting-list head stays bounded per token; the full
    * list would shard by (tok, doc_id range). One shuffle on tok. */
  private val q116 = Q(
    "q116_inverted_index",
    (s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .distinct()
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("df"),
          // '|'-joined posting head, not a raw array: the driver's
          // comparator can't hash ndarray cells (r5 oracle err). df>=5
          // guarantees non-empty, so no empty-list NULL quirk here.
          array_join(transform(
            slice(array_sort(collect_list(col("doc_id"))), 1, 10),
            x => x.cast("string")), "|").as("postings"))
        .filter(col("df") >= 5)
    },
    Some("""
      SELECT tok, count(*) AS df,
        array_to_string((list_sort(list(doc_id)))[1:10], '|') AS postings
      FROM (
        SELECT DISTINCT doc_id, tok FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        WHERE tok <> '')
      GROUP BY tok
      HAVING count(*) >= 5"""))

  /** BM25 relevance scoring (k1=1.2, b=0.75) for a deterministic query —
    * the top-3-df tokens — over the corpus: the retrieval primitive under
    * contamination checks and RAG curation. Exact integer sufficient
    * statistics (tf, df, dl, N, Σdl) flow to ONE double expression written
    * in identical textual order in both engines; each per-term score is
    * rounded to integer micro-units BEFORE the per-doc sum (the q69 rule:
    * float summation order can never perturb a sum of BIGINTs). k1+1 is
    * written as the literal 2.2 on both sides — computing 1.2+1.0 in
    * doubles yields 2.2000000000000002 ≠ the literal. Vocab and the 1-row
    * corpus stats broadcast; the only real shuffles are the (doc,tok)
    * count and the per-doc sum. */
  private val q117 = Q(
    "q117_bm25",
    (s, d) => {
      val tc = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      val dl = tc.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      val dfT = tc.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val vocab = dfT.orderBy(col("df").desc, col("tok").asc).limit(3)
      val stats = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
        .crossJoin(broadcast(dl.agg(sum(col("dl")).as("sum_dl"))))
      val nD = col("n_docs").cast("double"); val dfD = col("df").cast("double")
      val tfD = col("tf").cast("double"); val dlD = col("dl").cast("double")
      val avgdl = col("sum_dl").cast("double") / nD
      val idf = log((nD - dfD + lit(0.5)) / (dfD + lit(0.5)) + lit(1.0))
      val denom = tfD + lit(1.2) * (lit(1.0) - lit(0.75) + lit(0.75) * dlD / avgdl)
      val termMicro = floor(idf * (tfD * lit(2.2)) / denom * 1e6 + 0.5).cast("long")
      tc.join(broadcast(vocab.select(col("tok"), col("df"))), "tok")
        .join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .select(col("doc_id"), termMicro.as("term_micro"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_terms"), sum(col("term_micro")).as("bm25_micro"))
    },
    Some("""
      WITH tc AS (
        SELECT doc_id, tok, count(*) AS tf FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        WHERE tok <> '' GROUP BY 1, 2),
      dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tc GROUP BY 1),
      dft AS (SELECT tok, count(*) AS df FROM tc GROUP BY 1),
      vocab AS (SELECT tok, df FROM dft ORDER BY df DESC, tok ASC LIMIT 3),
      stats AS (
        SELECT (SELECT count(*) FROM documents) AS n_docs,
               (SELECT CAST(sum(dl) AS BIGINT) FROM dl) AS sum_dl),
      scored AS (
        SELECT tc.doc_id,
          CAST(floor(
            ln((n_docs::DOUBLE - df::DOUBLE + 0.5) / (df::DOUBLE + 0.5) + 1.0)
            * (tf::DOUBLE * 2.2)
            / (tf::DOUBLE + 1.2 * (1.0 - 0.75 + 0.75 * dl::DOUBLE
                 / (sum_dl::DOUBLE / n_docs::DOUBLE)))
            * 1000000 + 0.5) AS BIGINT) AS term_micro
        FROM tc JOIN vocab USING (tok) JOIN dl ON tc.doc_id = dl.doc_id, stats)
      SELECT doc_id, count(*) AS n_terms,
        CAST(sum(term_micro) AS BIGINT) AS bm25_micro
      FROM scored GROUP BY 1"""))

  /** DISTINCT-aggregate family beyond count: sum(DISTINCT) and
    * avg(DISTINCT) over a coarsened bucket (collisions guaranteed), beside
    * the plain forms — the dedup-before-aggregate semantics some revenue
    * metrics require. Spark plans ONE Expand feeding both distinct
    * aggregates (same key set), like q31's shape. avg(DISTINCT) is an
    * exact-int sum over distinct values and one division — identical IEEE
    * both engines, r6 as belt. */
  private val q118 = Q(
    "q118_distinct_sum_avg",
    (s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderpriority"),
          (floor(col("o_totalprice") * 100 + 0.5).cast("long") / lit(1000000L)).cast("long").as("bucket"))
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("bucket")).as("sum_all"),
          sum_distinct(col("bucket")).as("sum_uniq"),
          r(expr("avg(DISTINCT bucket)"), 6).as("avg_uniq"))
    },
    Some("""
      SELECT o_orderpriority, count(*) AS n,
        CAST(sum(bucket) AS BIGINT) AS sum_all,
        CAST(sum(DISTINCT bucket) AS BIGINT) AS sum_uniq,
        floor(avg(DISTINCT bucket) * 1000000 + 0.5)/1000000 AS avg_uniq
      FROM (
        SELECT o_orderpriority,
          CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) // 1000000 AS bucket
        FROM orders)
      GROUP BY 1"""))

  /** Length-bucket batching audit — group documents into 64-token padding
    * buckets and measure the padding efficiency a bucketed batcher would
    * achieve (sum of real tokens ÷ bucket-max × count): the pre-training
    * packing diagnostic beside q48's first-fit packing. Integer ceil via
    * (n+63)/64 on exact longs both engines; one small hash aggregate. */
  private val q119 = Q(
    "q119_length_buckets",
    (s, d) => {
      val nTok = size(filter(split(col("text"), " "), x => x =!= "")).cast("long")
      Tables.documents(s, d)
        .select(col("doc_id"), nTok.as("n_tok"))
        .filter(col("n_tok") > 0)
        .withColumn("bucket", ((col("n_tok") + lit(63L)) / lit(64L)).cast("long"))
        .groupBy(col("bucket"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("sum_tok"),
          max(col("n_tok")).as("max_tok"),
          (max(col("n_tok")) * count(lit(1))).as("padded_tok"))
        .withColumn("efficiency",
          r(col("sum_tok").cast("double") / col("padded_tok").cast("double"), 6))
    },
    Some("""
      SELECT bucket, count(*) AS n_docs,
        CAST(sum(n_tok) AS BIGINT) AS sum_tok,
        max(n_tok) AS max_tok,
        max(n_tok) * count(*) AS padded_tok,
        floor(CAST(sum(n_tok) AS BIGINT)::DOUBLE / (max(n_tok) * count(*))::DOUBLE
          * 1000000 + 0.5)/1000000 AS efficiency
      FROM (
        SELECT doc_id, n_tok, (n_tok + 63) // 64 AS bucket FROM (
          SELECT doc_id,
            CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tok
          FROM documents)
        WHERE n_tok > 0)
      GROUP BY 1"""))

  /** SQL front door, GROUPING SETS — the explicit-set form between q30's
    * ROLLUP and q97's CUBE: per-priority, per-status, and grand-total rows
    * from ONE Expand (×3) into one hash aggregate, never three scans.
    * grouping() flags cast to INT on both sides (Spark emits TINYINT). */
  private val q120 = Q(
    "q120_grouping_sets",
    (s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_v")
      s.sql("""
        SELECT o_orderpriority, o_orderstatus,
          CAST(grouping(o_orderpriority) AS INT) AS g_pri,
          CAST(grouping(o_orderstatus) AS INT) AS g_st,
          count(*) AS n,
          sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS sum_cents
        FROM orders_v
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())""")
    },
    Some("""
      SELECT o_orderpriority, o_orderstatus,
        CAST(grouping(o_orderpriority) AS INT) AS g_pri,
        CAST(grouping(o_orderstatus) AS INT) AS g_st,
        count(*) AS n,
        CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
      FROM orders
      GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())"""))

  /** Canonical-document selection — the KEEP side of dedup: within each
    * exact-duplicate cluster (q72's normalized fingerprint), keep the
    * best document by (n_chars DESC, doc_id ASC) — a deterministic total
    * order, the q08 tiebreak rule — and report the cluster size. One
    * shuffle on the fingerprint; both window functions share it. The
    * near-dup analogue swaps the fingerprint for q46's cluster id. */
  private val q121 = Q(
    "q121_dedup_keep_best",
    (s, d) => {
      val w = Window.partitionBy(col("fingerprint"))
        .orderBy(col("n_chars").desc, col("doc_id").asc)
      val wAll = Window.partitionBy(col("fingerprint"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"),
          md5(graft.ops.Text.canonicalText(col("text"))).as("fingerprint"))
        .select(col("*"),
          row_number().over(w).as("rn"),
          count(lit(1)).over(wAll).as("cluster_size"))
        .filter(col("rn") === 1)
        .select(col("fingerprint"), col("doc_id").as("kept_id"),
          col("n_chars").as("kept_chars"), col("cluster_size"))
    },
    Some("""
      SELECT fingerprint, doc_id AS kept_id, n_chars AS kept_chars, cluster_size
      FROM (
        SELECT doc_id, n_chars, fingerprint,
          row_number() OVER (PARTITION BY fingerprint
            ORDER BY n_chars DESC, doc_id ASC) AS rn,
          count(*) OVER (PARTITION BY fingerprint) AS cluster_size
        FROM (
          SELECT doc_id, n_chars,
            md5(trim(regexp_replace(
              regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
              '\s+', ' ', 'g'))) AS fingerprint
          FROM documents))
      WHERE rn = 1"""))

  /** parse_url surface over a synthesized URL — host/path/query and a
    * single query parameter. The twin never parses: it rebuilds each part
    * from the same source columns, so Spark's parser is checked against
    * ground truth rather than another parser's quirks. Pure projection. */
  private val q122 = Q(
    "q122_url_parse",
    (s, d) => {
      val url = concat(lit("https://travel.example.com/pages/"), col("event_type"),
        lit("?uid="), col("user_id"))
      Tables.events(s, d)
        .select(col("event_id"), url.as("url"))
        .select(col("event_id"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY")).as("query"),
          parse_url(col("url"), lit("QUERY"), lit("uid")).as("uid"))
    },
    Some("""
      SELECT event_id,
        'travel.example.com' AS host,
        '/pages/' || event_type AS path,
        'uid=' || CAST(user_id AS VARCHAR) AS query,
        CAST(user_id AS VARCHAR) AS uid
      FROM events"""))

  /** Unigram (token-distribution) entropy per document — the repetition/
    * diversity quality signal orthogonal to q105's TTR (entropy sees a doc
    * that repeats ONE token 90% of the time even when its vocab is large).
    * Each token-type's -p·ln(p) term is rounded to integer micro-units
    * BEFORE the per-doc sum (the q69/q117 rule), so IEEE summation order
    * cannot perturb the result. Shuffles: (doc,tok) count, then the
    * window+final agg share the doc_id exchange. */
  private val q123 = Q(
    "q123_token_entropy",
    (s, d) => {
      val tc = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("cnt"))
      val n = sum(col("cnt")).over(Window.partitionBy(col("doc_id")))
      val p = col("cnt").cast("double") / col("n").cast("double")
      tc.withColumn("n", n)
        .withColumn("term_micro", floor(-(p * log(p)) * 1e6 + 0.5).cast("long"))
        .groupBy(col("doc_id"))
        .agg(max(col("n")).as("n_tok"), count(lit(1)).as("n_uniq"),
          sum(col("term_micro")).as("entropy_micro"))
    },
    Some("""
      WITH tc AS (
        SELECT doc_id, tok, count(*) AS cnt FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        WHERE tok <> '' GROUP BY 1, 2),
      withn AS (
        SELECT doc_id, cnt,
          CAST(sum(cnt) OVER (PARTITION BY doc_id) AS BIGINT) AS n
        FROM tc)
      SELECT doc_id, max(n) AS n_tok, count(*) AS n_uniq,
        CAST(sum(CAST(floor(-(cnt::DOUBLE / n::DOUBLE * ln(cnt::DOUBLE / n::DOUBLE))
          * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS entropy_micro
      FROM withn GROUP BY 1"""))

  /** arrays_zip + inline — the struct-array explode that pairs parallel
    * arrays columnwise (tokens with their lengths here) and flattens the
    * struct to top-level columns in one step; the twin zips two unnests
    * positionally. Map-side only. */
  private val q124 = Q(
    "q124_zip_inline",
    (s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          filter(split(col("text"), " "), x => x =!= "").as("toks"))
        .select(col("doc_id"),
          inline(arrays_zip(col("toks"),
            transform(col("toks"), t => length(t).cast("long")).as("tok_len"))))
        .withColumnRenamed("toks", "tok")
    },
    Some("""
      SELECT doc_id, tok, CAST(length(tok) AS BIGINT) AS tok_len FROM (
        SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
        FROM documents)"""))

  /** Reciprocal-rank fusion of a lexical and a semantic ranking — the
    * hybrid-retrieval merge (RRF, k=60) a RAG curation pipeline runs over
    * BM25 and embedding-cosine lists. Each leg is cut to top-100 with
    * TakeOrderedAndProject FIRST (scalable at any corpus size); the
    * single-partition row_number windows only ever see those ≤100 rows.
    * Per-leg RRF contributions are micro-unit longs, so the fused sum is
    * exact; vec 0 is the query vector, its doc excluded from leg B. */
  private val q125 = Q(
    "q125_rrf_fusion",
    (s, d) => {
      graft.plans.GraftExtensions.install(s)
      // leg A: BM25 for the top-3-df query (q117's scoring, unchanged)
      val tc = spreadSingleFileFixture(s, Tables.documents(s, d), "doc_id")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      val dl = tc.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      val dfT = tc.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val vocab = dfT.orderBy(col("df").desc, col("tok").asc).limit(3)
      val stats = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
        .crossJoin(broadcast(dl.agg(sum(col("dl")).as("sum_dl"))))
      val nD = col("n_docs").cast("double"); val dfD = col("df").cast("double")
      val tfD = col("tf").cast("double"); val dlD = col("dl").cast("double")
      val avgdl = col("sum_dl").cast("double") / nD
      val idf = log((nD - dfD + lit(0.5)) / (dfD + lit(0.5)) + lit(1.0))
      val denom = tfD + lit(1.2) * (lit(1.0) - lit(0.75) + lit(0.75) * dlD / avgdl)
      val bm25 = tc.join(broadcast(vocab.select(col("tok"), col("df"))), "tok")
        .join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .select(col("doc_id"),
          floor(idf * (tfD * lit(2.2)) / denom * 1e6 + 0.5).cast("long").as("term_micro"))
        .groupBy(col("doc_id")).agg(sum(col("term_micro")).as("bm25_micro"))
      val topA = bm25.orderBy(col("bm25_micro").desc, col("doc_id").asc).limit(100)
        .withColumn("rank_a", row_number().over(
          Window.orderBy(col("bm25_micro").desc, col("doc_id").asc)))
      // leg B: cosine vs the query vector (vec 0), q23's vec_dot scoring
      val e = Tables.embeddings(s, d).select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      val n = e.withColumn("nrm",
        sqrt(graft.functions.VectorDot.vec_dot(col("v"), col("v"))))
      val qv = n.filter(col("vec_id") === 0)
        .select(col("v").as("qv"), col("nrm").as("qn"))
      val cos = n.filter(col("vec_id") =!= 0).crossJoin(broadcast(qv))
        .select(col("vec_id"),
          (graft.functions.VectorDot.vec_dot(col("qv"), col("v")) /
            (col("qn") * col("nrm"))).as("sim"))
      val topB = cos.orderBy(col("sim").desc, col("vec_id").asc).limit(100)
        .withColumn("rank_b", row_number().over(
          Window.orderBy(col("sim").desc, col("vec_id").asc)))
        .select(col("vec_id").as("doc_id"), col("rank_b"))
      topA.select(col("doc_id"), col("rank_a"))
        .join(topB, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          col("rank_a").cast("long").as("rank_a"),
          col("rank_b").cast("long").as("rank_b"),
          (coalesce(floor(lit(1e6) / (lit(60.0) + col("rank_a").cast("double")) + 0.5).cast("long"), lit(0L)) +
           coalesce(floor(lit(1e6) / (lit(60.0) + col("rank_b").cast("double")) + 0.5).cast("long"), lit(0L))).as("rrf_micro"))
    },
    Some("""
      WITH tc AS (
        SELECT doc_id, tok, count(*) AS tf FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        WHERE tok <> '' GROUP BY 1, 2),
      dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tc GROUP BY 1),
      dft AS (SELECT tok, count(*) AS df FROM tc GROUP BY 1),
      vocab AS (SELECT tok, df FROM dft ORDER BY df DESC, tok ASC LIMIT 3),
      stats AS (
        SELECT (SELECT count(*) FROM documents) AS n_docs,
               (SELECT CAST(sum(dl) AS BIGINT) FROM dl) AS sum_dl),
      bm25 AS (
        SELECT tc.doc_id, CAST(sum(CAST(floor(
            ln((n_docs::DOUBLE - df::DOUBLE + 0.5) / (df::DOUBLE + 0.5) + 1.0)
            * (tf::DOUBLE * 2.2)
            / (tf::DOUBLE + 1.2 * (1.0 - 0.75 + 0.75 * dl::DOUBLE
                 / (sum_dl::DOUBLE / n_docs::DOUBLE)))
            * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS bm25_micro
        FROM tc JOIN vocab USING (tok) JOIN dl ON tc.doc_id = dl.doc_id, stats
        GROUP BY 1),
      ta AS (
        SELECT doc_id, rn AS rank_a FROM (
          SELECT doc_id, row_number() OVER (ORDER BY bm25_micro DESC, doc_id ASC) AS rn
          FROM bm25) WHERE rn <= 100),
      e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
      qv AS (SELECT v AS qv, nrm AS qn FROM n WHERE vec_id = 0),
      cos AS (
        SELECT vec_id, list_dot_product(qv, v)/(qn * nrm) AS sim
        FROM n, qv WHERE vec_id <> 0),
      tb AS (
        SELECT vec_id AS doc_id, rn AS rank_b FROM (
          SELECT vec_id, row_number() OVER (ORDER BY sim DESC, vec_id ASC) AS rn
          FROM cos) WHERE rn <= 100)
      SELECT COALESCE(ta.doc_id, tb.doc_id) AS doc_id,
        CAST(rank_a AS BIGINT) AS rank_a,
        CAST(rank_b AS BIGINT) AS rank_b,
        COALESCE(CAST(floor(1000000.0 / (60.0 + rank_a::DOUBLE) + 0.5) AS BIGINT), 0) +
        COALESCE(CAST(floor(1000000.0 / (60.0 + rank_b::DOUBLE) + 0.5) AS BIGINT), 0) AS rrf_micro
      FROM ta FULL OUTER JOIN tb ON ta.doc_id = tb.doc_id"""))

  /** Gap-fill + last-observation-carried-forward — densify each user's
    * daily value series over their own date range and fill gaps with the
    * IGNORE NULLS window form (the time-series repair every metrics store
    * runs). No arithmetic touches the carried values, so no rounding belt
    * is needed; the spine starts at each user's first observed day, so
    * the carry is never null. Shuffles: daily agg, per-user bounds, and
    * one window — all on user_id, so AQE coalesces them onto one layout. */
  private val q126 = Q(
    "q126_locf_gapfill",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(max(col("value")).as("v"))
      val spine = daily.groupBy(col("user_id"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("v").isNotNull.as("observed"),
          last(col("v"), ignoreNulls = true).over(w).as("v_filled"))
    },
    Some("""
      WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day, max(value) AS v
        FROM events GROUP BY 1, 2),
      bounds AS (
        SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
      spine AS (
        SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
        FROM bounds)
      SELECT s.user_id, strftime(s.day, '%Y-%m-%d') AS day,
        v IS NOT NULL AS observed,
        last_value(v IGNORE NULLS) OVER (PARTITION BY s.user_id ORDER BY s.day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
      FROM spine s LEFT JOIN daily USING (user_id, day)"""))

  /** Sentence segmentation + per-document sentence statistics — the doc-
    * structure quality signal (mean sentence length, longest run) beside
    * q25's flat ratios. Regexp sentence split in the Java∩RE2 subset,
    * trim+drop empties BEFORE the explode on both sides; exact-int ratio
    * rounded r6. One shuffle (doc_id re-agg). */
  private val q127 = Q(
    "q127_sentence_stats",
    (s, d) => {
      val sents = filter(
        transform(split(col("text"), "[.!?]+"), x => trim(x)), x => x =!= "")
      Tables.documents(s, d)
        .select(col("doc_id"), explode(sents).as("sent"))
        .select(col("doc_id"),
          size(filter(split(col("sent"), " "), x => x =!= "")).cast("long").as("n_tok"),
          length(col("sent")).cast("long").as("n_chars"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_sent"),
          sum(col("n_tok")).as("sum_tok"),
          max(col("n_chars")).as("max_sent_chars"))
        .withColumn("avg_sent_tok",
          r(col("sum_tok").cast("double") / col("n_sent").cast("double"), 6))
    },
    Some("""
      SELECT doc_id, count(*) AS n_sent,
        CAST(sum(n_tok) AS BIGINT) AS sum_tok,
        max(n_chars) AS max_sent_chars,
        floor(CAST(sum(n_tok) AS BIGINT)::DOUBLE / count(*)::DOUBLE
          * 1000000 + 0.5)/1000000 AS avg_sent_tok
      FROM (
        SELECT doc_id,
          CAST(len(list_filter(string_split(sent, ' '), x -> x <> '')) AS BIGINT) AS n_tok,
          CAST(length(sent) AS BIGINT) AS n_chars
        FROM (
          SELECT doc_id,
            unnest(list_filter(list_transform(string_split_regex(text, '[.!?]+'),
              x -> trim(x)), x -> x <> '')) AS sent
          FROM documents))
      GROUP BY 1"""))

  /** PageRank (3 iterations, d=0.85) over the event-type transition graph
    * — the iterative-dataflow pattern (label propagation, HITS, embedding
    * propagation) expressed as a deterministic DataFrame loop: rank mass
    * lives in integer micro-units, each edge contribution is floored to a
    * long BEFORE the in-neighbor sum, so three rounds of float math stay
    * bit-identical to the twin's three unrolled CTEs. The per-iteration
    * shape — edges⋈ranks, groupBy(to), spine left-join — is the 100 TB
    * Pregel step; nodes/nN broadcast, edges shuffle once per round.
    * Dangling-node mass is dropped (simplified PR) on both sides. */
  private val q128 = Q(
    "q128_pagerank",
    (s, d) => {
      val ev = Tables.events(s, d)
      val pairs = ev
        .select(col("user_id"), col("event_id"), col("event_type").as("from_t"))
        .withColumn("to_t", lead(col("from_t"), 1).over(
          Window.partitionBy(col("user_id")).orderBy(col("event_id"))))
        .filter(col("to_t").isNotNull)
      val edges = pairs.groupBy(col("from_t"), col("to_t")).agg(count(lit(1)).as("w"))
      val nodes = ev.select(col("event_type")).distinct()
      val nCnt = nodes.agg(count(lit(1)).as("n"))
      val outw = edges.groupBy(col("from_t")).agg(sum(col("w")).as("outw"))
      val ew = edges.join(broadcast(outw), "from_t")
      var pr = nodes.crossJoin(broadcast(nCnt))
        .select(col("event_type"),
          floor(lit(1000000.0) / col("n").cast("double") + 0.5).cast("long").as("pr_micro"))
      for (_ <- 1 to 3) {
        val contribs = ew
          .join(broadcast(pr.select(col("event_type").as("from_t"), col("pr_micro"))), "from_t")
          .select(col("to_t").as("event_type"),
            floor(lit(0.85) * col("pr_micro").cast("double") * col("w").cast("double")
              / col("outw").cast("double") + 0.5).cast("long").as("c"))
          .groupBy(col("event_type")).agg(sum(col("c")).as("csum"))
        pr = nodes.crossJoin(broadcast(nCnt))
          .join(contribs, Seq("event_type"), "left")
          .select(col("event_type"),
            (floor(lit(0.15) * lit(1000000.0) / col("n").cast("double") + 0.5).cast("long")
              + coalesce(col("csum"), lit(0L))).as("pr_micro"))
      }
      pr
    },
    Some("""
      WITH pairs AS (
        SELECT event_type AS from_t,
          lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS to_t
        FROM events),
      edges AS (
        SELECT from_t, to_t, count(*) AS w FROM pairs
        WHERE to_t IS NOT NULL GROUP BY 1, 2),
      nodes AS (SELECT DISTINCT event_type FROM events),
      nn AS (SELECT count(*) AS n FROM nodes),
      outw AS (SELECT from_t, CAST(sum(w) AS BIGINT) AS outw FROM edges GROUP BY 1),
      ew AS (SELECT e.from_t, e.to_t, e.w, o.outw FROM edges e JOIN outw o USING (from_t)),
      pr0 AS (
        SELECT event_type,
          CAST(floor(1000000.0 / n::DOUBLE + 0.5) AS BIGINT) AS pr_micro
        FROM nodes, nn),
      c1 AS (
        SELECT to_t AS event_type, CAST(sum(CAST(floor(
            0.85 * pr_micro::DOUBLE * w::DOUBLE / outw::DOUBLE + 0.5) AS BIGINT)) AS BIGINT) AS csum
        FROM ew JOIN pr0 ON ew.from_t = pr0.event_type GROUP BY 1),
      pr1 AS (
        SELECT b.event_type,
          CAST(floor(0.15 * 1000000.0 / b.n::DOUBLE + 0.5) AS BIGINT) + COALESCE(csum, 0) AS pr_micro
        FROM (SELECT event_type, n FROM nodes, nn) b LEFT JOIN c1 USING (event_type)),
      c2 AS (
        SELECT to_t AS event_type, CAST(sum(CAST(floor(
            0.85 * pr_micro::DOUBLE * w::DOUBLE / outw::DOUBLE + 0.5) AS BIGINT)) AS BIGINT) AS csum
        FROM ew JOIN pr1 ON ew.from_t = pr1.event_type GROUP BY 1),
      pr2 AS (
        SELECT b.event_type,
          CAST(floor(0.15 * 1000000.0 / b.n::DOUBLE + 0.5) AS BIGINT) + COALESCE(csum, 0) AS pr_micro
        FROM (SELECT event_type, n FROM nodes, nn) b LEFT JOIN c2 USING (event_type)),
      c3 AS (
        SELECT to_t AS event_type, CAST(sum(CAST(floor(
            0.85 * pr_micro::DOUBLE * w::DOUBLE / outw::DOUBLE + 0.5) AS BIGINT)) AS BIGINT) AS csum
        FROM ew JOIN pr2 ON ew.from_t = pr2.event_type GROUP BY 1)
      SELECT b.event_type,
        CAST(floor(0.15 * 1000000.0 / b.n::DOUBLE + 0.5) AS BIGINT) + COALESCE(csum, 0) AS pr_micro
      FROM (SELECT event_type, n FROM nodes, nn) b LEFT JOIN c3 USING (event_type)"""))

  /** Fixed-width histogram via width_bucket — 12 buckets over [0, 600k) in
    * exact cents. Bucket boundaries are multiples of 5e6 cents (exactly
    * representable), and non-boundary values sit ≥2e-7 of a bucket away —
    * ulp-level formula differences between the engines' width_bucket
    * implementations cannot flip a bucket, so the twin's arithmetic form
    * is safe. One small hash aggregate. */
  private val q129 = Q(
    "q129_width_bucket",
    (s, d) => {
      Tables.orders(s, d)
        .select(floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
        .select(width_bucket(col("cents").cast("double"), lit(0.0),
          lit(60000000.0), lit(12)).as("bucket"), col("cents"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), min(col("cents")).as("min_cents"),
          max(col("cents")).as("max_cents"))
    },
    Some("""
      SELECT bucket, count(*) AS n, min(cents) AS min_cents, max(cents) AS max_cents
      FROM (
        SELECT CASE WHEN cents >= 60000000 THEN 13
                    ELSE CAST(floor(cents::DOUBLE / 60000000.0 * 12.0) AS BIGINT) + 1 END AS bucket,
               cents
        FROM (SELECT CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents FROM orders))
      GROUP BY 1"""))

  /** TPC-H-Q5-shaped star join — region filter → nation → customer →
    * orders (date range) → lineitem → supplier with the same-nation
    * constraint; local-supplier revenue per nation. Per-row revenue is
    * floored to exact cents BEFORE the sum (a double sum's order is not
    * cross-engine stable). No broadcast hints on the SF-growing tables
    * (customer/supplier/orders) — nation/region hint only; at bench SF the
    * threshold picks broadcast anyway, at 100 TB the big joins shuffle on
    * their keys with AQE free to re-plan. */
  private val q130 = Q(
    "q130_star_revenue",
    (s, d) => {
      val nr = Tables.nation(s, d).join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
      Tables.customer(s, d)
        .join(broadcast(nr), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"))
        .filter(col("o_orderdate") >= lit("1995-01-01") &&
          col("o_orderdate") < lit("1997-01-01"))
        .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.supplier(s, d),
          col("s_suppkey") === col("l_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .select(col("n_name"),
          floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
            .cast("long").as("rev_cents"))
        .groupBy(col("n_name"))
        .agg(sum(col("rev_cents")).as("revenue_cents"))
    },
    Some("""
      SELECT n_name, CAST(sum(rev_cents) AS BIGINT) AS revenue_cents
      FROM (
        SELECT n.n_name,
          CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT) AS rev_cents
        FROM region r
        JOIN nation n ON n.n_regionkey = r.r_regionkey
        JOIN customer c ON c.c_nationkey = n.n_nationkey
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1995-01-01'
          AND o.o_orderdate < TIMESTAMP '1997-01-01')
      GROUP BY 1"""))

  /** Pareto frontier (skyline) of per-customer (total spend, order count)
    * — the non-dominated set, computed as one sort + one running max
    * instead of the naive quadratic dominance anti-join: collapse to one
    * row per spend value (max count — same-spend lower counts are
    * dominated by definition), sort spend DESC, keep rows whose count
    * strictly beats every earlier row's. The global window sees one row
    * per distinct spend (already aggregated — bounded); the 100 TB form
    * partitions by coarse spend buckets and merges per-bucket frontiers. */
  private val q131 = Q(
    "q131_pareto_frontier",
    (s, d) => {
      val per = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("spend_cents"),
          count(lit(1)).as("n_orders"))
      val pts = per.groupBy(col("spend_cents")).agg(max(col("n_orders")).as("n_orders"))
      val runPrev = max(col("n_orders")).over(
        Window.orderBy(col("spend_cents").desc)
          .rowsBetween(Window.unboundedPreceding, -1))
      pts.withColumn("prev_max", runPrev)
        .filter(col("prev_max").isNull || col("n_orders") > col("prev_max"))
        .select(col("spend_cents"), col("n_orders"))
    },
    Some("""
      WITH per AS (
        SELECT o_custkey,
          CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS spend_cents,
          count(*) AS n_orders
        FROM orders GROUP BY 1),
      pts AS (
        SELECT spend_cents, max(n_orders) AS n_orders FROM per GROUP BY 1),
      run AS (
        SELECT spend_cents, n_orders,
          max(n_orders) OVER (ORDER BY spend_cents DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        FROM pts)
      SELECT spend_cents, n_orders FROM run
      WHERE prev_max IS NULL OR n_orders > prev_max"""))

  /** Median absolute deviation per language — the robust outlier gate
    * (MAD tolerates the heavy tails that wreck q106's z-scores). Both
    * medians are exact interpolations of values with at-worst quarter
    * fractions (ints, then |int − half| devs), so every intermediate is
    * exactly representable and NO rounding belt is needed. Group medians
    * broadcast back; outliers = dev > 3·MAD. */
  private val q132 = Q(
    "q132_mad_outliers",
    (s, d) => {
      val docs = Tables.documents(s, d).select(col("lang"), col("n_chars"))
      val med = docs.groupBy(col("lang")).agg(median(col("n_chars")).as("med_chars"))
      val dev = docs.join(broadcast(med), "lang")
        .withColumn("dev", abs(col("n_chars").cast("double") - col("med_chars")))
      val mad = dev.groupBy(col("lang"), col("med_chars"))
        .agg(median(col("dev")).as("mad"), count(lit(1)).as("n"))
      dev.join(broadcast(mad.select(col("lang"), col("mad"))), "lang")
        .groupBy(col("lang"))
        .agg(count_if(col("dev") > lit(3.0) * col("mad")).as("n_outliers"))
        .join(broadcast(mad), "lang")
        .select(col("lang"), col("n"), col("med_chars"), col("mad"), col("n_outliers"))
    },
    Some("""
      WITH med AS (
        SELECT lang, CAST(median(n_chars) AS DOUBLE) AS med_chars
        FROM documents GROUP BY 1),
      dev AS (
        SELECT d.lang, abs(d.n_chars::DOUBLE - med_chars) AS dev, med_chars
        FROM documents d JOIN med USING (lang)),
      mad AS (
        SELECT lang, med_chars, CAST(median(dev) AS DOUBLE) AS mad, count(*) AS n
        FROM dev GROUP BY 1, 2)
      SELECT dev.lang, n, mad.med_chars, mad.mad,
        count(*) FILTER (WHERE dev > 3.0 * mad.mad) AS n_outliers
      FROM dev JOIN mad USING (lang)
      GROUP BY 1, 2, 3, 4"""))

  /** Join-skew diagnostics — per-key frequency profile of the two hot
    * fact join keys (the pre-flight that decides when q45's salting or
    * AQE skew handling is needed): row count, distinct keys, max rows per
    * key, top-key share in micro-units, and the p75 per-key count (dyadic
    * p → exact interpolation, the q114 rule). Two-level aggregate per
    * table, map-side combine collapses keys before the shuffle. */
  private val q133 = Q(
    "q133_skew_report",
    (s, d) => {
      def profile(df: DataFrame, key: String, tag: String): DataFrame =
        df.groupBy(col(key)).agg(count(lit(1)).as("c"))
          .agg(
            sum(col("c")).as("n_rows"),
            count(lit(1)).as("n_keys"),
            max(col("c")).as("max_key_rows"),
            expr("percentile(c, 0.75)").as("p75_key_rows"))
          .select(lit(tag).as("key_col"), col("n_rows"), col("n_keys"),
            col("max_key_rows"),
            floor(col("max_key_rows").cast("double") / col("n_rows").cast("double")
              * 1e6 + 0.5).cast("long").as("top_share_micro"),
            col("p75_key_rows"))
      profile(Tables.orders(s, d), "o_custkey", "orders.o_custkey")
        .unionByName(profile(Tables.lineitem(s, d), "l_partkey", "lineitem.l_partkey"))
    },
    Some("""
      WITH oc AS (
        SELECT o_custkey AS k, count(*) AS c FROM orders GROUP BY 1),
      lp AS (
        SELECT l_partkey AS k, count(*) AS c FROM lineitem GROUP BY 1),
      po AS (
        SELECT 'orders.o_custkey' AS key_col, CAST(sum(c) AS BIGINT) AS n_rows,
          count(*) AS n_keys, max(c) AS max_key_rows,
          quantile_cont(c, 0.75) AS p75_key_rows
        FROM oc),
      pl AS (
        SELECT 'lineitem.l_partkey' AS key_col, CAST(sum(c) AS BIGINT) AS n_rows,
          count(*) AS n_keys, max(c) AS max_key_rows,
          quantile_cont(c, 0.75) AS p75_key_rows
        FROM lp)
      SELECT key_col, n_rows, n_keys, max_key_rows,
        CAST(floor(max_key_rows::DOUBLE / n_rows::DOUBLE * 1000000 + 0.5) AS BIGINT) AS top_share_micro,
        p75_key_rows
      FROM po
      UNION ALL
      SELECT key_col, n_rows, n_keys, max_key_rows,
        CAST(floor(max_key_rows::DOUBLE / n_rows::DOUBLE * 1000000 + 0.5) AS BIGINT) AS top_share_micro,
        p75_key_rows
      FROM pl"""))

  /** Character-trigram profile per language — the feature extraction
    * under q24's language-ID heuristic: top-10 trigrams by frequency with
    * a deterministic (count DESC, trigram ASC) tiebreak. Extraction is the
    * one-pass `char_ngrams` codegen expression (`functions/CharNgrams`),
    * NOT the HOF `transform(sequence(...), i -> substr(s, i, 3))` spelling:
    * that form is O(L²) per row — CollapseProject inlines `lower(text)`
    * into the lambda so it re-lowers per index, and each `substr` re-scans
    * UTF-8 bytes from 0 to find its start. `lower` now runs once per row
    * (it sits under a plain expression, not a lambda), and docs with < 3
    * chars yield an empty array → zero exploded rows, identical to the
    * twin's length filter. Explode is the scale path: counts combine
    * map-side, and the rank window only sees per-language tails. */
  private val q134 = Q(
    "q134_char_trigrams",
    (s, d) => {
      graft.plans.GraftExtensions.install(s)
      // ~2000 trigrams explode from every doc: on the one-row-group fixture
      // the whole fan-out would run on a single core without the bench-gated
      // spread (production parquet splits at row-group granularity)
      val counts = spreadSingleFileFixture(s, Tables.documents(s, d), "doc_id")
        .select(col("lang"),
          explode(graft.functions.CharNgrams.char_ngrams(lower(col("text")), 3))
            .as("tri"))
        .groupBy(col("lang"), col("tri")).agg(count(lit(1)).as("cnt"))
      Core.topKPerGroup(counts, Seq("lang"),
        Seq(col("cnt").desc, col("tri").asc), 10)
        .select(col("lang"), col("tri"), col("cnt"))
    },
    Some("""
      WITH tris AS (
        SELECT lang, unnest(list_transform(range(1, length(text) - 1),
          i -> substr(lower(text), i, 3))) AS tri
        FROM documents WHERE length(text) >= 3),
      counts AS (
        SELECT lang, tri, count(*) AS cnt FROM tris GROUP BY 1, 2),
      ranked AS (
        SELECT lang, tri, cnt,
          row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, tri ASC) AS rn
        FROM counts)
      SELECT lang, tri, cnt FROM ranked WHERE rn <= 10"""))

  /** S5 driver-checked: the CSV scan with explicit schema + header
    * (`Bronze.readCsv`) exercised through REAL files — the query writes
    * the nation dim to CSV (K2 sink) and reads it back through the S5
    * scan, so header handling, quoting, and the declared types all face
    * the oracle (which reads the original parquet — the round-trip must
    * be value-exact). 25 rows: the write inside the query is deliberate
    * and negligible; this is an IO-surface proof, not a perf query. */
  private val q135 = Q(
    "q135_csv_scan",
    (s, d) => {
      import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
      val tmp = new java.io.File(
        sys.props("java.io.tmpdir"), "graft_q135_csv").getAbsolutePath
      graft.sources.Bronze.writeCsv(
        Tables.nation(s, d).select("n_nationkey", "n_name", "n_regionkey"), tmp)
      graft.sources.Bronze.readCsv(s, tmp, StructType(Seq(
        StructField("n_nationkey", IntegerType),
        StructField("n_name", StringType),
        StructField("n_regionkey", IntegerType))))
    },
    Some("SELECT n_nationkey, n_name, n_regionkey FROM nation"))

  /** F17/F18 driver-checked: the calendar helpers (first/last day, yyyymmdd,
    * month key) and the ISO-8601 UTC/KST timestamp pair over real order
    * dates. `o_orderdate` is TIMESTAMP_NTZ in the fixture → cast to the
    * session-TZ type (UTC, value-preserving) so `from_utc_timestamp` gets
    * its contracted input; DuckDB mirrors KST as an explicit +9h shift.
    * Pure projection, no shuffle. */
  private val q136 = Q(
    "q136_calendar_iso",
    (s, d) => {
      val ts = col("o_orderdate").cast("timestamp")
      val dt = to_date(ts)
      Tables.orders(s, d).select(
        col("o_orderkey"),
        F.firstDayOfYear(dt).as("y0"),
        F.firstDayOfMonth(dt).as("m0"),
        F.lastDayOfMonth(dt).as("m1"),
        F.yyyymmdd(dt).as("ymd"),
        F.monthKey(dt).as("month_key"),
        F.isoTimestamp(ts).as("iso_utc"),
        F.isoTimestamp(F.toKst(ts)).as("iso_kst"))
    },
    Some("""
      SELECT o_orderkey,
        CAST(date_trunc('year', o_orderdate) AS DATE) AS y0,
        CAST(date_trunc('month', o_orderdate) AS DATE) AS m0,
        last_day(CAST(o_orderdate AS DATE)) AS m1,
        strftime(o_orderdate, '%Y%m%d') AS ymd,
        strftime(o_orderdate, '%Y%m') AS month_key,
        strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') AS iso_utc,
        strftime(o_orderdate + INTERVAL 9 HOUR, '%Y-%m-%dT%H:%M:%S') AS iso_kst
      FROM orders"""))

  /** PQ codebook DISTORTION audit over the frozen artifact — the
    * index-health metric a production PQ deployment monitors (per-subspace
    * mean squared quantization error; a drifting subspace means retrain).
    * This row replaces the former rows-only in-query-training q137
    * (k-means training itself has no SQL twin and is covered by
    * TextSimilaritySpec's recall/determinism/identity pins): serving-side
    * math against `PqCodebookArtifact`'s literals IS oracle-expressible,
    * so the catalog carries no unverifiable row. One encode-shaped pass,
    * micro-rounded BIGINT error sums (order-independent), m rows out at
    * any corpus size. */
  private val q137 = Q(
    "q137_pq_distortion",
    (s, d) => {
      import graft.ops.{PqCodebookArtifact, Similarity}
      Similarity.pqDistortion(Tables.embeddings(s, d), PqCodebookArtifact.books)
    },
    Some(graft.ops.PqServe.distortionSql))

  /** q137's SERVING half with a hash-green oracle row: train/serve split.
    * Training (k-means) stays un-SQL-expressible, but a production PQ
    * index never re-trains per query batch — it serves a PERSISTED
    * codebook. `PqCodebookArtifact` freezes that artifact in the repo
    * (provenance: `graft.PqArtifactGen`, seeded fit on the sf0.01
    * embeddings), so encode + ADC become a pure function of literals that
    * DuckDB evaluates identically (`PqServe.oracleSql` — the q42
    * literal-lookup move applied to a vector index). Plan is q137's
    * exactly: codes-only corpus scan side, per-query LUT, O(m) per pair,
    * top-10 window per query. */
  private val q137b = Q(
    "q137b_pq_serve",
    (s, d) => {
      import graft.ops.{PqCodebookArtifact, Similarity}
      val emb = Tables.embeddings(s, d)
      Similarity.pqTopKWithBooks(
          emb, emb.filter(col("vec_id") < 10), 10, PqCodebookArtifact.books)
        .select(col("q_id"), col("vec_id"),
          r(col("sim"), 6).as("adc_sim"))
    },
    Some(graft.ops.PqServe.oracleSql))

  /** Zipf rank-frequency fit per language: slope/intercept of
    * ln(cnt) ~ ln(rank) over the top-200 token ranks — the lexical-health
    * diagnostic (natural text slopes near -1; templated/spammy corpora
    * flatten or cliff). Determinism is the q117 discipline: ln() values are
    * rounded to integer MICRO-UNITS per term, all sufficient statistics are
    * BIGINT sums, and the closed-form fit is one double expression over
    * identical longs on both engines. Rank ties break on (cnt DESC, tok
    * ASC). Two shuffles (token count, per-lang stats); the rank window
    * sees ≤200 rows per language. */
  private val q138 = Q(
    "q138_zipf_fit",
    (s, d) => {
      val counts = Tables.documents(s, d)
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("cnt"))
      val ranked = counts.withColumn("rank",
        row_number().over(Window.partitionBy(col("lang"))
          .orderBy(col("cnt").desc, col("tok").asc)))
        .filter(col("rank") <= 200)
        .select(col("lang"),
          floor(log(col("rank").cast("double")) * 1000000 + 0.5).cast("long").as("xu"),
          floor(log(col("cnt").cast("double")) * 1000000 + 0.5).cast("long").as("yu"))
      val sums = ranked.groupBy(col("lang")).agg(
        count(lit(1)).as("n"),
        sum(col("xu")).as("sx"), sum(col("yu")).as("sy"),
        sum(col("xu") * col("yu")).as("sxy"),
        sum(col("xu") * col("xu")).as("sxx"))
      // exact long arithmetic up to the final divisions; micro-unit scale
      // cancels in the slope, divides out once in the intercept
      val num = col("n") * col("sxy") - col("sx") * col("sy")
      val den = col("n") * col("sxx") - col("sx") * col("sx")
      val slope = num.cast("double") / den.cast("double")
      sums.select(
        col("lang"), col("n"),
        r(slope, 6).as("zipf_slope"),
        r((col("sy").cast("double") - slope * col("sx").cast("double")) /
          col("n").cast("double") / 1000000.0, 6).as("zipf_intercept"))
    },
    Some("""
      WITH counts AS (
        SELECT lang, tok, count(*) AS cnt FROM (
          SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
        WHERE tok <> '' GROUP BY 1, 2),
      ranked AS (
        SELECT lang,
          CAST(floor(ln(CAST(row_number() OVER (PARTITION BY lang
            ORDER BY cnt DESC, tok ASC) AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS xu,
          CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS yu,
          row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, tok ASC) AS rank
        FROM counts QUALIFY rank <= 200),
      sums AS (
        SELECT lang, count(*) AS n,
          CAST(sum(xu) AS BIGINT) AS sx, CAST(sum(yu) AS BIGINT) AS sy,
          CAST(sum(xu * yu) AS BIGINT) AS sxy,
          CAST(sum(xu * xu) AS BIGINT) AS sxx
        FROM ranked GROUP BY 1)
      SELECT lang, n,
        floor(CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
          * 1000000 + 0.5) / 1000000 AS zipf_slope,
        floor((CAST(sy AS DOUBLE) - CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
              / CAST(n AS DOUBLE) / 1000000.0 * 1000000 + 0.5) / 1000000 AS zipf_intercept
      FROM sums"""))

  /** Gini coefficient of document length per language — the inequality
    * gauge a curation pass uses to spot length-skewed domains (a few huge
    * docs dominating a source's token budget). The sorted-index form
    * G = (2·Σ(i·x_i) − (n+1)·Σx_i) / (n·Σx_i) is EXACT integer arithmetic
    * until one final division of identical longs — no rounding belt
    * needed, but r6 keeps the emitted width tame. One window (sort by
    * length, doc_id tiebreak) + one keyed aggregate. */
  private val q139 = Q(
    "q139_length_gini",
    (s, d) => {
      val idx = Tables.documents(s, d)
        .select(col("lang"), col("n_chars"), col("doc_id"))
        .withColumn("i", row_number().over(Window.partitionBy(col("lang"))
          .orderBy(col("n_chars").asc, col("doc_id").asc)).cast("long"))
      val sums = idx.groupBy(col("lang")).agg(
        count(lit(1)).as("n"),
        sum(col("n_chars")).as("sx"),
        sum(col("i") * col("n_chars")).as("six"))
      sums.select(
        col("lang"), col("n"),
        r((lit(2L) * col("six") - (col("n") + 1L) * col("sx")).cast("double") /
          (col("n") * col("sx")).cast("double"), 6).as("gini"))
    },
    Some("""
      WITH idx AS (
        SELECT lang, n_chars,
          CAST(row_number() OVER (PARTITION BY lang
            ORDER BY n_chars ASC, doc_id ASC) AS BIGINT) AS i
        FROM documents),
      sums AS (
        SELECT lang, count(*) AS n,
          CAST(sum(n_chars) AS BIGINT) AS sx,
          CAST(sum(i * n_chars) AS BIGINT) AS six
        FROM idx GROUP BY 1)
      SELECT lang, n,
        floor(CAST(2 * six - (n + 1) * sx AS DOUBLE)
                / CAST(n * sx AS DOUBLE) * 1000000 + 0.5) / 1000000 AS gini
      FROM sums"""))

  /** Temperature-weighted training-mixture allocation (τ=0.7): per-source
    * token counts → natural share, temperature-flattened target share
    * p_s ∝ n_s^τ, and the per-doc upweight p_s/share_s a sampler applies
    * to hit the target mixture — the standard multi-source LM data recipe.
    * Determinism: pow() is rounded to integer micro-units PER SOURCE
    * before the normalizing sum (float summation order never enters), and
    * every emitted ratio is a single double division of identical BIGINT
    * products on both engines. One tiny aggregate (|sources| rows) + a
    * broadcast of the 1-row totals. */
  private val q140 = Q(
    "q140_mixture_weights",
    (s, d) => {
      val bySrc = Tables.documents(s, d)
        .select(col("source"),
          size(filter(split(col("text"), " "), x => x =!= "")).cast("long").as("ntok"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("n_tokens"))
        .withColumn("pu",
          floor(pow(col("n_tokens").cast("double"), 0.7) * 1000000 + 0.5).cast("long"))
      val tot = bySrc.agg(
        sum(col("n_tokens")).as("tot_tokens"), sum(col("pu")).as("zu"))
      bySrc.crossJoin(broadcast(tot)).select(
        col("source"), col("n_docs"), col("n_tokens"),
        r(col("n_tokens").cast("double") / col("tot_tokens").cast("double"), 6)
          .as("share"),
        r(col("pu").cast("double") / col("zu").cast("double"), 6).as("p_tau"),
        r((col("pu") * col("tot_tokens")).cast("double") /
          (col("zu") * col("n_tokens")).cast("double"), 6).as("upweight"))
    },
    Some("""
      WITH by_src AS (
        SELECT source, count(*) AS n_docs,
          CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> '')))
            AS BIGINT) AS n_tokens
        FROM documents GROUP BY 1),
      pu AS (
        SELECT *, CAST(floor(pow(CAST(n_tokens AS DOUBLE), 0.7) * 1000000 + 0.5)
          AS BIGINT) AS pu
        FROM by_src),
      tot AS (
        SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens,
          CAST(sum(pu) AS BIGINT) AS zu FROM pu)
      SELECT source, n_docs, n_tokens,
        floor(CAST(n_tokens AS DOUBLE) / CAST(tot_tokens AS DOUBLE)
          * 1000000 + 0.5) / 1000000 AS share,
        floor(CAST(pu AS DOUBLE) / CAST(zu AS DOUBLE) * 1000000 + 0.5) / 1000000
          AS p_tau,
        floor(CAST(pu * tot_tokens AS DOUBLE) / CAST(zu * n_tokens AS DOUBLE)
          * 1000000 + 0.5) / 1000000 AS upweight
      FROM pu, tot"""))

  /** Intra-document repetition ratio over 5-gram shingles — the
    * boilerplate/spam signal (Gopher-style repetition filters): share of
    * 5-grams that are duplicates of an earlier one in the SAME doc. Pure
    * map-side HOF algebra (no explode, no shuffle): the gram array and its
    * distinct form are built per row; all emitted values are exact
    * integers. Docs under 5 tokens emit zero grams and ratio 0. */
  private val q141 = Q(
    "q141_repetition_ratio",
    (s, d) => {
      val toks = filter(split(col("text"), " "), x => x =!= "")
      // let-bind the token array (ARCHITECTURE §8) so the 5 element_at's
      // per gram and both size() calls share one split+filter evaluation
      val stats = element_at(
        transform(array(toks), t => {
          val grams = transform(sequence(lit(1), size(t) - 4), i =>
            concat_ws(" ", element_at(t, i), element_at(t, i + 1),
              element_at(t, i + 2), element_at(t, i + 3), element_at(t, i + 4)))
          struct(
            when(size(t) >= 5, size(grams)).otherwise(lit(0)).cast("long").as("ng"),
            when(size(t) >= 5, size(array_distinct(grams))).otherwise(lit(0))
              .cast("long").as("nd"))
        }),
        1)
      Tables.documents(s, d).select(
        col("doc_id"),
        stats.getField("ng").as("n_grams"),
        stats.getField("nd").as("n_distinct"),
        when(stats.getField("ng") > 0,
          floor((stats.getField("ng") - stats.getField("nd")).cast("double") /
            stats.getField("ng").cast("double") * 1000000 + 0.5).cast("long"))
          .otherwise(lit(0L)).as("rep_micro"))
    },
    Some("""
      WITH t AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents),
      g AS (
        SELECT doc_id,
          CASE WHEN len(toks) >= 5 THEN
            list_transform(range(1, len(toks) - 3), i ->
              concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4]))
          ELSE [] END AS grams
        FROM t)
      SELECT doc_id,
        CAST(len(grams) AS BIGINT) AS n_grams,
        CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
        CASE WHEN len(grams) > 0 THEN
          CAST(floor(CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE)
            / CAST(len(grams) AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
        ELSE 0 END AS rep_micro
      FROM g"""))

  /** SQL front door, UNPIVOT: the wide-to-long rotation as the declared
    * SQL surface (the DataFrame twin is q05's pivot family). The twin
    * derives the same rows with UNION ALL — proving the rotation against
    * an implementation that never unpivots. Status counts are exact; the
    * UNPIVOT default drops NULL cells, which cannot occur here (sums over
    * CASE are never NULL on non-empty groups). */
  private val q142 = Q(
    "q142_sql_unpivot",
    (s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_v")
      s.sql("""
        SELECT o_orderpriority, status, cnt FROM (
          SELECT o_orderpriority,
            sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS open_cnt,
            sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS full_cnt,
            sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS pending_cnt
          FROM orders_v GROUP BY o_orderpriority)
        UNPIVOT (cnt FOR status IN (open_cnt, full_cnt, pending_cnt))""")
    },
    Some("""
      WITH w AS (
        SELECT o_orderpriority,
          CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS open_cnt,
          CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS full_cnt,
          CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS pending_cnt
        FROM orders GROUP BY 1)
      SELECT o_orderpriority, 'open_cnt' AS status, open_cnt AS cnt FROM w
      UNION ALL
      SELECT o_orderpriority, 'full_cnt', full_cnt FROM w
      UNION ALL
      SELECT o_orderpriority, 'pending_cnt', pending_cnt FROM w"""))

  /** SQL front door, correlated LATERAL subquery with ORDER BY + LIMIT:
    * top-2 nations by customer count per region — the "top-k per group as
    * a join" phrasing users port from warehouse SQL. Spark decorrelates
    * the lateral into a ranked join (DecorrelateInnerQuery handles the
    * correlated LIMIT); the twin is the equivalent row_number form, so
    * the rewrite is proven against an engine that never decorrelates.
    * Count ties break on n_name ASC inside the subquery's ORDER BY. */
  private val q143 = Q(
    "q143_sql_lateral",
    (s, d) => {
      Tables.region(s, d).createOrReplaceTempView("region_v")
      Tables.nation(s, d).createOrReplaceTempView("nation_v")
      Tables.customer(s, d).createOrReplaceTempView("customer_v")
      s.sql("""
        SELECT r.r_name, t.n_name, t.n_cust
        FROM region_v r,
        LATERAL (
          SELECT n.n_name, count(*) AS n_cust
          FROM nation_v n JOIN customer_v c ON c.c_nationkey = n.n_nationkey
          WHERE n.n_regionkey = r.r_regionkey
          GROUP BY n.n_name
          ORDER BY n_cust DESC, n.n_name ASC
          LIMIT 2) t""")
    },
    Some("""
      WITH counts AS (
        SELECT r.r_name, n.n_name, count(*) AS n_cust
        FROM region r
        JOIN nation n ON n.n_regionkey = r.r_regionkey
        JOIN customer c ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY r_name
          ORDER BY n_cust DESC, n_name ASC) AS rn
        FROM counts)
      SELECT r_name, n_name, CAST(n_cust AS BIGINT) AS n_cust
      FROM ranked WHERE rn <= 2"""))

  /** SQL front door, PIVOT: customers per (segment × region) as the
    * declared SQL rotation, aliased cell columns so both engines emit the
    * same names. Spark PIVOT yields NULL for absent combinations where a
    * conditional count yields 0 — the twin nullif's to match (the
    * long-standing pivot null contract, q05's map canonicalization cousin). */
  private val q144 = Q(
    "q144_sql_pivot",
    (s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer_v")
      Tables.nation(s, d).createOrReplaceTempView("nation_v")
      Tables.region(s, d).createOrReplaceTempView("region_v")
      s.sql("""
        SELECT * FROM (
          SELECT c.c_mktsegment AS seg, r.r_name
          FROM customer_v c
          JOIN nation_v n ON c.c_nationkey = n.n_nationkey
          JOIN region_v r ON n.n_regionkey = r.r_regionkey)
        PIVOT (count(1) FOR r_name IN
          ('AFRICA' AS africa, 'AMERICA' AS america, 'ASIA' AS asia,
           'EUROPE' AS europe, 'MIDDLE EAST' AS middle_east))""")
    },
    Some("""
      SELECT c.c_mktsegment AS seg,
        nullif(count(*) FILTER (WHERE r.r_name = 'AFRICA'), 0) AS africa,
        nullif(count(*) FILTER (WHERE r.r_name = 'AMERICA'), 0) AS america,
        nullif(count(*) FILTER (WHERE r.r_name = 'ASIA'), 0) AS asia,
        nullif(count(*) FILTER (WHERE r.r_name = 'EUROPE'), 0) AS europe,
        nullif(count(*) FILTER (WHERE r.r_name = 'MIDDLE EAST'), 0) AS middle_east
      FROM customer c
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1"""))

  /** Z-order vs linear layout, data-skipping efficacy measured: both
    * layouts bucket lineitem 64 ways (Morton `z_value` top bits vs the
    * leading column's top bits), build per-bucket min/max zone maps, and
    * count buckets/rows a 2-D box predicate can prune. The interleaved
    * layout prunes on BOTH dimensions where the linear sort serves only
    * its leading column — the measurable reason to z-order a 100 TB table
    * queried on two keys. All stats are exact integers; the DuckDB twin
    * reproduces the 10-bit interleave arithmetically (bit-identical to
    * `ZOrder.interleave` on sub-2^10 inputs). */
  private val q145 = Q(
    "q145_zorder_pruning",
    (s, d) => {
      graft.plans.GraftExtensions.install(s)
      val m = Tables.lineitem(s, d).select(
        (col("l_orderkey") % 1024).cast("long").as("xm"),
        (col("l_partkey") % 1024).cast("long").as("ym"))
      val pruned = col("min_x") > 511 || col("max_y") < 300 || col("min_y") > 399
      def profile(df: DataFrame, tag: String): DataFrame = df
        .groupBy(col("bucket"))
        .agg(min(col("xm")).as("min_x"), max(col("xm")).as("max_x"),
          min(col("ym")).as("min_y"), max(col("ym")).as("max_y"),
          count(lit(1)).as("c"))
        .agg(
          count(lit(1)).as("n_buckets"),
          sum(when(pruned, 1L).otherwise(0L)).as("n_pruned"),
          sum(when(pruned, col("c")).otherwise(0L)).as("rows_skipped"),
          sum(col("c")).as("rows_total"))
        .select(lit(tag).as("layout"), col("n_buckets"), col("n_pruned"),
          col("rows_skipped"), col("rows_total"))
      val zorder = profile(
        m.withColumn("bucket",
          shiftright(graft.functions.ZOrder.z_value(col("xm"), col("ym")), 14)),
        "zorder")
      val linear = profile(m.withColumn("bucket", shiftright(col("xm"), 4)), "linear")
      zorder.unionByName(linear)
    },
    Some("""
      WITH m AS (
        SELECT CAST(l_orderkey % 1024 AS BIGINT) AS xm,
               CAST(l_partkey % 1024 AS BIGINT) AS ym
        FROM lineitem),
      bz AS (
        SELECT xm, ym,
          CAST(list_sum(list_transform(range(0, 10), i ->
            (((xm >> i) & 1) << (2*i)) + (((ym >> i) & 1) << (2*i+1))))
            AS BIGINT) >> 14 AS bucket
        FROM m),
      bl AS (SELECT xm, ym, xm >> 4 AS bucket FROM m),
      pz AS (
        SELECT bucket, min(xm) AS min_x, max(xm) AS max_x,
          min(ym) AS min_y, max(ym) AS max_y, count(*) AS c
        FROM bz GROUP BY 1),
      pl AS (
        SELECT bucket, min(xm) AS min_x, max(xm) AS max_x,
          min(ym) AS min_y, max(ym) AS max_y, count(*) AS c
        FROM bl GROUP BY 1)
      SELECT 'zorder' AS layout, count(*) AS n_buckets,
        CAST(sum(CASE WHEN min_x > 511 OR max_y < 300 OR min_y > 399
          THEN 1 ELSE 0 END) AS BIGINT) AS n_pruned,
        CAST(sum(CASE WHEN min_x > 511 OR max_y < 300 OR min_y > 399
          THEN c ELSE 0 END) AS BIGINT) AS rows_skipped,
        CAST(sum(c) AS BIGINT) AS rows_total
      FROM pz
      UNION ALL
      SELECT 'linear', count(*),
        CAST(sum(CASE WHEN min_x > 511 OR max_y < 300 OR min_y > 399
          THEN 1 ELSE 0 END) AS BIGINT),
        CAST(sum(CASE WHEN min_x > 511 OR max_y < 300 OR min_y > 399
          THEN c ELSE 0 END) AS BIGINT),
        CAST(sum(c) AS BIGINT)
      FROM pl"""))

  /** Triangle count + global clustering coefficient over the near-dup
    * graph (q20's prefix-blocked Jaccard pairs as edges): transitivity is
    * the health check on a dedup pair set — triangles mean clusters, open
    * wedges mean chains that connected-components (q46) will merge. The
    * edge set is persisted so the three join branches share ONE evaluation
    * of the expensive Jaccard subtree (the q21 re-evaluation lesson, at
    * the DataFrame level). Edges stay oriented (doc_a < doc_b), so each
    * triangle is counted exactly once; wedges come from undirected degrees.
    * At 100 TB: materialize edges to storage first, order the triangle
    * join by degree (node-iterator) so hub nodes don't explode a single
    * join key. */
  private val q146 = Q(
    "q146_triangle_count",
    (s, d) => {
      val edges = prefixJaccardPairs(s, d).select(col("doc_a"), col("doc_b")).persist()
      val e1 = edges.select(col("doc_a").as("a"), col("doc_b").as("b"))
      val e2 = edges.select(col("doc_a").as("b2"), col("doc_b").as("c"))
      val e3 = edges.select(col("doc_a").as("a3"), col("doc_b").as("c3"))
      val tri = e1.join(e2, col("b") === col("b2"))
        .join(e3, col("a") === col("a3") && col("c") === col("c3"))
        .agg(count(lit(1)).as("n_triangles"))
      val deg = edges.select(col("doc_a").as("node"))
        .unionAll(edges.select(col("doc_b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val wedges = deg.agg(sum(col("deg") * (col("deg") - 1) / 2).cast("long").as("n_wedges"))
      val nEdges = edges.agg(count(lit(1)).as("n_edges"))
      nEdges.crossJoin(broadcast(wedges)).crossJoin(broadcast(tri))
        .select(col("n_edges"), col("n_wedges"), col("n_triangles"),
          when(col("n_wedges") > 0,
            floor(col("n_triangles").cast("double") * 3 /
              col("n_wedges").cast("double") * 1000000 + 0.5).cast("long"))
            .otherwise(lit(0L)).as("clustering_micro"))
    },
    Some("""
      WITH dset AS (
        SELECT doc_id, substr(text, 1, 30) AS pfx,
          list_distinct(string_split(text, ' ')) AS toks
        FROM documents),
      e AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM dset a JOIN dset b ON a.pfx = b.pfx AND a.doc_id < b.doc_id
        WHERE len(list_intersect(a.toks, b.toks))::DOUBLE
              / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.5),
      tri AS (
        SELECT count(*) AS n_triangles FROM e e1
        JOIN e e2 ON e2.doc_a = e1.doc_b
        JOIN e e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b),
      deg AS (
        SELECT node, count(*) AS deg FROM (
          SELECT doc_a AS node FROM e UNION ALL SELECT doc_b FROM e)
        GROUP BY 1),
      w AS (SELECT CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges FROM deg),
      ne AS (SELECT count(*) AS n_edges FROM e)
      SELECT n_edges, n_wedges, n_triangles,
        CASE WHEN n_wedges > 0 THEN
          CAST(floor(CAST(n_triangles AS DOUBLE) * 3 / CAST(n_wedges AS DOUBLE)
            * 1000000 + 0.5) AS BIGINT)
        ELSE 0 END AS clustering_micro
      FROM ne, w, tri"""))

  /** Schema-evolution read (mergeSchema): two parquet generations — v1
    * without a column, v2 with it — union under one evolved schema with
    * NULL back-fill, the day-one reality of any long-lived 100 TB table.
    * The query WRITES both generations (K2 sink) then reads them through
    * the evolved scan; the oracle derives the identical frame from the
    * original table, so the union + back-fill must be value-exact.
    * mergeSchema is a footer-level merge (no data rewrite) — the
    * production note is to keep it OFF for steady-state reads (footer
    * sampling costs at 100 TB) and evolve the catalog schema instead. */
  private val q147 = Q(
    "q147_schema_evolution",
    (s, d) => {
      val tmp = new java.io.File(
        sys.props("java.io.tmpdir"), "graft_q147_evo").getAbsolutePath
      val o = Tables.orders(s, d)
      o.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_totalprice"))
        .write.mode("overwrite").parquet(s"$tmp/v1")
      o.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
        .write.mode("overwrite").parquet(s"$tmp/v2")
      s.read.option("mergeSchema", "true").parquet(s"$tmp/v1", s"$tmp/v2")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
    },
    Some("""
      SELECT o_orderkey, o_totalprice,
        CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END AS o_orderpriority
      FROM orders"""))

  /** Winsorized robust mean of order value per priority: clip at the exact
    * p05/p95 interpolated percentiles, then average the clipped CENTS (the
    * q69 rule — a BIGINT sum divided once, never a float accumulation).
    * The winsorized mean is the outlier-resistant center a curation layer
    * reports next to the raw mean; the two-pass shape (percentiles, then
    * clipped agg with the 25-row bounds broadcast) is the 100 TB form —
    * swap `percentile` for the mergeable `percentile_approx` there.
    * Clip bounds are themselves floored to cents BEFORE clipping so both
    * engines clip on identical integers. */
  private val q148 = Q(
    "q148_winsorized_mean",
    (s, d) => {
      val cents = floor(col("o_totalprice") * 100 + 0.5).cast("long")
      val o = Tables.orders(s, d).select(col("o_orderpriority"), cents.as("cents"))
      val bounds = o.groupBy(col("o_orderpriority")).agg(
        floor(percentile(col("cents"), lit(0.05))).cast("long").as("lo"),
        floor(percentile(col("cents"), lit(0.95))).cast("long").as("hi"))
      o.join(broadcast(bounds), "o_orderpriority")
        .select(col("o_orderpriority"),
          least(greatest(col("cents"), col("lo")), col("hi")).as("w"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("w")).as("sum_w"))
        .select(col("o_orderpriority"), col("n"),
          r(col("sum_w").cast("double") / col("n").cast("double") / 100.0, 6)
            .as("winsorized_mean"))
    },
    Some("""
      WITH o AS (
        SELECT o_orderpriority,
          CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders),
      bounds AS (
        SELECT o_orderpriority,
          CAST(floor(quantile_cont(cents, 0.05)) AS BIGINT) AS lo,
          CAST(floor(quantile_cont(cents, 0.95)) AS BIGINT) AS hi
        FROM o GROUP BY 1),
      clipped AS (
        SELECT o.o_orderpriority,
          least(greatest(cents, lo), hi) AS w
        FROM o JOIN bounds USING (o_orderpriority))
      SELECT o_orderpriority, count(*) AS n,
        floor(CAST(sum(w) AS DOUBLE) / count(*) / 100.0 * 1000000 + 0.5) / 1000000
          AS winsorized_mean
      FROM clipped GROUP BY 1"""))

  /** Two-sample Kolmogorov–Smirnov drift statistic between sources over
    * the doc-length distribution — the distribution-shift monitor a corpus
    * pipeline runs between snapshots/sources. ENTIRELY exact integer
    * arithmetic: D = max |CA·n_b − CB·n_a| over the merged support
    * (cumulative counts cross-multiplied instead of divided), one final
    * division micro-rounded. Pairwise over 5 pinned sources (10 pairs);
    * at 100 TB the support is per-pair value-bucketed and the cumsum
    * window stays per-pair (never global). */
  private val q149 = Q(
    "q149_ks_drift",
    (s, d) => {
      val srcs = Seq("src0", "src1", "src2", "src3", "src4")
      val docs = Tables.documents(s, d).filter(col("source").isin(srcs: _*))
      val cnt = docs.groupBy(col("source"), col("n_chars")).agg(count(lit(1)).as("c"))
      val tot = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
      val pairs = tot.select(col("source").as("sa"), col("n").as("na"))
        .crossJoin(broadcast(tot.select(col("source").as("sb"), col("n").as("nb"))))
        .filter(col("sa") < col("sb"))
      val support = pairs
        .join(cnt.select(col("source").as("sa"), col("n_chars").as("v")), Seq("sa"))
        .select(col("sa"), col("sb"), col("v"))
        .unionByName(pairs
          .join(cnt.select(col("source").as("sb"), col("n_chars").as("v")), Seq("sb"))
          .select(col("sa"), col("sb"), col("v")))
        .distinct()
      val w = Window.partitionBy(col("sa"), col("sb")).orderBy(col("v"))
      val cum = support
        .join(cnt.select(col("source").as("sa"), col("n_chars").as("v"),
          col("c").as("ca_c")), Seq("sa", "v"), "left")
        .join(cnt.select(col("source").as("sb"), col("n_chars").as("v"),
          col("c").as("cb_c")), Seq("sb", "v"), "left")
        .na.fill(0L, Seq("ca_c", "cb_c"))
        .select(col("sa"), col("sb"),
          sum(col("ca_c")).over(w).as("cca"), sum(col("cb_c")).over(w).as("ccb"))
      cum.join(broadcast(pairs), Seq("sa", "sb"))
        .groupBy(col("sa"), col("sb"), col("na"), col("nb"))
        .agg(max(abs(col("cca") * col("nb") - col("ccb") * col("na"))).as("dint"))
        .select(col("sa"), col("sb"),
          floor(col("dint").cast("double") /
            (col("na") * col("nb")).cast("double") * 1000000 + 0.5)
            .cast("long").as("ks_micro"))
    },
    Some("""
      WITH docs AS (
        SELECT source, n_chars FROM documents
        WHERE source IN ('src0','src1','src2','src3','src4')),
      cnt AS (SELECT source, n_chars AS v, count(*) AS c FROM docs GROUP BY 1, 2),
      tot AS (SELECT source, count(*) AS n FROM docs GROUP BY 1),
      pairs AS (
        SELECT a.source AS sa, a.n AS na, b.source AS sb, b.n AS nb
        FROM tot a, tot b WHERE a.source < b.source),
      support AS (
        SELECT DISTINCT sa, sb, v FROM (
          SELECT p.sa, p.sb, c.v FROM pairs p JOIN cnt c ON c.source = p.sa
          UNION ALL
          SELECT p.sa, p.sb, c.v FROM pairs p JOIN cnt c ON c.source = p.sb)),
      cum AS (
        SELECT s.sa, s.sb,
          sum(coalesce(ca.c, 0)) OVER (PARTITION BY s.sa, s.sb ORDER BY s.v) AS cca,
          sum(coalesce(cb.c, 0)) OVER (PARTITION BY s.sa, s.sb ORDER BY s.v) AS ccb
        FROM support s
        LEFT JOIN cnt ca ON ca.source = s.sa AND ca.v = s.v
        LEFT JOIN cnt cb ON cb.source = s.sb AND cb.v = s.v)
      SELECT c.sa, c.sb,
        CAST(floor(CAST(max(abs(cca * nb - ccb * na)) AS DOUBLE)
          / CAST(na * nb AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS ks_micro
      FROM cum c JOIN pairs p ON p.sa = c.sa AND p.sb = c.sb
      GROUP BY c.sa, c.sb, na, nb"""))

  /** Population Stability Index per source vs the rest of the corpus over
    * fixed-width length buckets — the binned drift score model-monitoring
    * stacks report next to KS. Each bucket term (p−q)·ln(p/q) is computed
    * from EXACT integer counts (cross-multiplied ratios of longs), rounded
    * to NANO-units per bucket, then summed as BIGINTs — float summation
    * order never enters (q140's pow rule, applied to ln). Zero-count
    * buckets on either side are excluded (the unsmoothed-PSI convention);
    * emitted as psi_nano BIGINT. */
  private val q150 = Q(
    "q150_psi_drift",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("source"), (col("n_chars") / 100).cast("long").as("bucket"))
      val bySrc = docs.groupBy(col("source"), col("bucket")).agg(count(lit(1)).as("c_sb"))
      val byBucket = docs.groupBy(col("bucket")).agg(count(lit(1)).as("c_b"))
      val nS = docs.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
      val nAll = docs.agg(count(lit(1)).as("n_all"))
      val j = bySrc.join(byBucket, "bucket").join(nS, "source")
        .crossJoin(broadcast(nAll))
        .withColumn("c_rest", col("c_b") - col("c_sb"))
        .withColumn("n_rest", col("n_all") - col("n_s"))
        .filter(col("c_sb") > 0 && col("c_rest") > 0)
      val p = col("c_sb").cast("double") / col("n_s").cast("double")
      val q = col("c_rest").cast("double") / col("n_rest").cast("double")
      val lnRatio = log((col("c_sb") * col("n_rest")).cast("double") /
        (col("c_rest") * col("n_s")).cast("double"))
      j.withColumn("term_nano",
          floor((p - q) * lnRatio * 1000000000L + 0.5).cast("long"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_buckets"), sum(col("term_nano")).as("psi_nano"))
    },
    Some("""
      WITH docs AS (
        SELECT source, CAST(n_chars // 100 AS BIGINT) AS bucket FROM documents),
      by_src AS (SELECT source, bucket, count(*) AS c_sb FROM docs GROUP BY 1, 2),
      by_bucket AS (SELECT bucket, count(*) AS c_b FROM docs GROUP BY 1),
      n_s AS (SELECT source, count(*) AS n_s FROM docs GROUP BY 1),
      n_all AS (SELECT count(*) AS n_all FROM docs),
      j AS (
        SELECT s.source, s.c_sb, b.c_b - s.c_sb AS c_rest, ns.n_s,
          a.n_all - ns.n_s AS n_rest
        FROM by_src s
        JOIN by_bucket b USING (bucket)
        JOIN n_s ns ON ns.source = s.source
        CROSS JOIN n_all a
        WHERE s.c_sb > 0 AND b.c_b - s.c_sb > 0)
      SELECT source, count(*) AS n_buckets,
        CAST(sum(CAST(floor(
          (CAST(c_sb AS DOUBLE) / CAST(n_s AS DOUBLE)
            - CAST(c_rest AS DOUBLE) / CAST(n_rest AS DOUBLE))
          * ln(CAST(c_sb * n_rest AS DOUBLE) / CAST(c_rest * n_s AS DOUBLE))
          * 1000000000 + 0.5) AS BIGINT)) AS BIGINT) AS psi_nano
      FROM j GROUP BY 1"""))

  /** Multimodal decode path, driver-checked end to end: payload attach →
    * `mapPartitions` stub decode (16-bin byte histogram + derived
    * dims/frames) → integer-exact aHash. The oracle RECOMPUTES the decode
    * from raw characters (the corpus is ASCII, so byte values = code
    * points), which pins the whole typed-Dataset pipeline — encode,
    * per-partition decode, histogram, dimension arithmetic — against an
    * engine with none of that machinery. The hash uses the exact integer
    * rule 16·hist[i] > total (the boundary-safe twin of
    * `Multimodal.perceptualHash`'s float-mean form, which the spec covers);
    * the histogram emits as a '|'-joined string (the q107 array rule). */
  private val q151 = Q(
    "q151_media_decode",
    (s, d) => {
      import s.implicits._
      val media = graft.ops.Multimodal.attachPayload(Tables.documents(s, d))
        .as[graft.ops.Multimodal.MediaRecord]
      val dec = graft.ops.Multimodal.decode(media).toDF()
      val total = aggregate(col("pixels"), lit(0), (a, x) => a + x)
      dec
        .withColumn("total", total)
        .select(col("doc_id"), col("width"), col("height"), col("n_frames"),
          aggregate(
            transform(sequence(lit(0), lit(15)), i =>
              when(element_at(col("pixels"), i + 1) * 16 > col("total"),
                call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
            lit(0L), (a, x) => a + x).as("phash"),
          array_join(transform(col("pixels"), x => x.cast("string")), "|")
            .as("hist"))
    },
    Some("""
      WITH ch AS (
        SELECT doc_id, unicode(c) // 16 AS bin FROM (
          SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents)),
      counts AS (
        SELECT doc_id, bin, count(*) AS c FROM ch GROUP BY 1, 2),
      tot AS (SELECT doc_id, strlen(text) AS total FROM documents),
      grid AS (
        SELECT t.doc_id, r.range AS bin, coalesce(c.c, 0) AS c, t.total
        FROM tot t
        CROSS JOIN range(0, 16) r
        LEFT JOIN counts c ON c.doc_id = t.doc_id AND c.bin = r.range),
      agg AS (
        SELECT doc_id,
          array_to_string(array_agg(CAST(c AS VARCHAR) ORDER BY bin), '|') AS hist,
          CAST(sum(CASE WHEN c * 16 > total THEN 1 << bin ELSE 0 END) AS BIGINT)
            AS phash
        FROM grid GROUP BY doc_id)
      SELECT a.doc_id,
        16 AS width,
        CAST((strlen(text) + 15) // 16 AS INTEGER) AS height,
        CAST(((strlen(text) + 15) // 16) // 16 + 1 AS INTEGER) AS n_frames,
        a.phash, a.hist
      FROM agg a JOIN documents USING (doc_id)"""))

  /** Top-3 per group through the BOUNDED-HEAP aggregate (`topk_by`, a
    * custom `TypedImperativeAggregate`) instead of the window form — the
    * W3/O2 semantics with a hash-aggregate plan: no per-group sort, and
    * partial heaps combine MAP-SIDE so the shuffle carries ≤ k entries per
    * (partition, group) instead of every row — the 100 TB shape for heavy
    * groups. The twin is the row_number window form, proving the heap
    * path row-identical (ties on price break on orderkey ASC both sides);
    * the merge invariant itself (any partitioning == single pass) is
    * PropertySpec-pinned. */
  private val q152 = Q(
    "q152_topk_aggregate",
    (s, d) => {
      graft.plans.GraftExtensions.install(s)
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(graft.functions.TopK.topk_by(
          col("o_totalprice"), col("o_orderkey"), 3).as("top"))
        .select(col("o_orderpriority"), explode(col("top")).as("t"))
        .select(col("o_orderpriority"),
          col("t.id").as("o_orderkey"),
          col("t.score").as("o_totalprice"))
    },
    Some("""
      WITH ranked AS (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
          row_number() OVER (PARTITION BY o_orderpriority
            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders)
      SELECT o_orderpriority, o_orderkey, o_totalprice
      FROM ranked WHERE rn <= 3"""))

  /** PPJoin-style set-similarity join with EXACT recall: tokens are
    * globally ordered by (df ASC, tok ASC) — rarest first — and each doc
    * blocks only on its PREFIX of length |x| − ⌈t·|x|⌉ + 1. The prefix-
    * filtering theorem guarantees every pair with Jaccard ≥ t shares a
    * prefix token, so unlike q20's char-prefix blocking (a heuristic) or
    * q21's MinHash (probabilistic), the candidate set provably contains
    * ALL qualifying pairs — the oracle is therefore the NAIVE QUADRATIC
    * all-pairs join, and row equality proves both the theorem's
    * application and the verify step. Rare-token blocking keys are also
    * the least skewed (df-ordered prefixes put docs in small buckets) —
    * the scale property that makes PPJoin the textbook exact set-join at
    * 100 TB. Shuffles: df count, per-doc rank window, candidate groupBy.
    *
    * FIXTURE CAVEAT: prefix filtering's win assumes a Zipfian vocabulary
    * (rare tokens exist). The synthetic corpus has ~31 tokens per
    * language, so EVERY token is common, candidate pruning is degenerate,
    * and the full corpus is near-all-pairs-similar at t=0.5 (even the
    * oracle's quadratic check is minutes at sf0.1). The query therefore
    * runs on a deterministic 1-in-10 doc sample — enough to prove the
    * plan row-identical to the naive quadratic — while the operator
    * itself is written for the real-corpus regime. */
  private val q153 = Q(
    "q153_ppjoin",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"),
          array_distinct(filter(split(col("text"), " "), x => x =!= "")).as("toks"))
        .filter(size(col("toks")) > 0)
      graft.ops.Text.ppJoin(docs, 0.5)
        .select(col("doc_a"), col("doc_b"), r(col("jac"), 3).as("jaccard"))
    },
    Some("""
      WITH d AS (
        SELECT doc_id,
          list_distinct(list_filter(string_split(text, ' '), x -> x <> '')) AS toks
        FROM documents
        WHERE doc_id % 10 = 0
          AND len(list_filter(string_split(text, ' '), x -> x <> '')) > 0)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        floor((len(list_intersect(a.toks, b.toks))::DOUBLE
               / len(list_distinct(list_concat(a.toks, b.toks)))) * 1000 + 0.5)/1000
          AS jaccard
      FROM d a JOIN d b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.toks, b.toks))::DOUBLE
            / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.5"""))

  /** Rolling 7-day distinct users via SKETCH-MERGE OVER A WINDOW — the
    * scale path q82's exact interval-join form cannot take: one HLL
    * sketch per day (a keyed aggregate), then `hll_merge` over a trailing
    * 7-row frame and an estimate on top. At 100 TB the per-day sketches
    * are tiny mergeable binaries, so the trailing-window pass touches 30
    * rows of sketches instead of re-scanning a week of raw events per
    * day — the whole point of mergeable sketch state. The global window
    * runs over ≤ days rows (pre-aggregated — the q74 rule). The oracle is
    * EXACT count-distinct: both fixture scales stay inside the HLL sparse
    * phase (150 / 1,500 users < 4,096), where the estimate is exact by
    * construction (pinned in DistinctSketchSpec). */
  private val q154 = Q(
    "q154_sketch_wau",
    (s, d) => {
      graft.plans.GraftExtensions.install(s)
      val daySketch = Tables.events(s, d)
        .select(to_date(col("ts")).as("day"), col("user_id"))
        .groupBy(col("day"))
        .agg(
          call_function("hll_sketch", col("user_id")).as("sk"),
          count_distinct(col("user_id")).as("dau"))
      // Calendar range frame (not rowsBetween): a fixture gap day must
      // NOT let the frame reach back >7 calendar days, or the Spark side
      // diverges from the twin's `day BETWEEN sp.day - 6 AND sp.day`.
      val w = Window
        .orderBy(datediff(col("day"), lit("1970-01-01").cast("date")))
        .rangeBetween(-6, 0)
      daySketch.select(
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("dau"),
        call_function("hll_estimate",
          call_function("hll_merge", col("sk")).over(w))
          .cast("long").as("wau"))
    },
    Some("""
      WITH daily AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      dau AS (SELECT day, count(*) AS dau FROM daily GROUP BY 1),
      wau AS (
        SELECT sp.day, count(DISTINCT u.user_id) AS wau
        FROM dau sp JOIN daily u
          ON u.day BETWEEN sp.day - INTERVAL 6 DAY AND sp.day
        GROUP BY 1)
      SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau.dau, wau.wau
      FROM dau JOIN wau USING (day)"""))

  /** Exact ROC-AUC per source via the Mann-Whitney rank-sum identity —
    * the eval metric a data-quality classifier reports, computed at scale
    * without a single per-row window: scores are pre-grouped to
    * (source, score, count, positives), tie-averaged ranks come from a
    * cumulative window over the GROUPED rows (≤ distinct scores per
    * source), and doubling the rank sum keeps every intermediate an exact
    * integer — 2·avgrank = 2·minrank + cnt − 1, so
    * AUC = (S2 − n_pos(n_pos+1)) / (2·n_pos·n_neg) is one division of
    * exact longs, micro-rounded. Degenerate sources (no positives or no
    * negatives) are excluded rather than emitting a 0/0. Label: lang='en';
    * score: n_chars. */
  private val q155 = Q(
    "q155_group_auc",
    (s, d) => {
      val base = Tables.documents(s, d).select(
        col("source"), col("n_chars").as("score"),
        (col("lang") === "en").cast("long").as("pos"))
      val grouped = base.groupBy(col("source"), col("score"))
        .agg(count(lit(1)).as("c"), sum(col("pos")).as("p"))
      val w = Window.partitionBy(col("source")).orderBy(col("score"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val ranked = grouped.withColumn("minrank",
        coalesce(sum(col("c")).over(w), lit(0L)) + 1L)
      val sums = ranked.groupBy(col("source")).agg(
        sum(col("p") * (lit(2L) * col("minrank") + col("c") - 1L)).as("s2"),
        sum(col("p")).as("n_pos"), sum(col("c")).as("n"))
      sums.withColumn("n_neg", col("n") - col("n_pos"))
        .filter(col("n_pos") > 0 && col("n_neg") > 0)
        .select(col("source"), col("n_pos"), col("n_neg"),
          floor((col("s2") - col("n_pos") * (col("n_pos") + 1L)).cast("double") /
            (lit(2L) * col("n_pos") * col("n_neg")).cast("double") * 1000000 + 0.5)
            .cast("long").as("auc_micro"))
    },
    Some("""
      WITH base AS (
        SELECT source, n_chars AS score,
          CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        FROM documents),
      grouped AS (
        SELECT source, score, count(*) AS c, CAST(sum(pos) AS BIGINT) AS p
        FROM base GROUP BY 1, 2),
      ranked AS (
        SELECT source, score, c, p,
          coalesce(sum(c) OVER (PARTITION BY source ORDER BY score
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1 AS minrank
        FROM grouped),
      sums AS (
        SELECT source,
          CAST(sum(p * (2 * minrank + c - 1)) AS BIGINT) AS s2,
          CAST(sum(p) AS BIGINT) AS n_pos,
          CAST(sum(c) AS BIGINT) AS n
        FROM ranked GROUP BY 1)
      SELECT source, n_pos, n - n_pos AS n_neg,
        CAST(floor(CAST(s2 - n_pos * (n_pos + 1) AS DOUBLE)
          / CAST(2 * n_pos * (n - n_pos) AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
          AS auc_micro
      FROM sums
      WHERE n_pos > 0 AND n - n_pos > 0"""))

  /** Jensen–Shannon divergence between source TOKEN distributions over a
    * pinned top-50 vocabulary — the content-drift complement to q149/q150's
    * length-based monitors (two sources can share a length profile and
    * still diverge in what they say). JSD needs no smoothing: at q=0 the
    * term is exactly p·ln2, so absent tokens are handled by the formula,
    * not a fudge constant. Each term is computed from exact integer counts
    * (cross-multiplied rationals), nano-rounded per token, then summed as
    * BIGINTs — the q150 transcendental rule. Vocab and per-source totals
    * broadcast; one shuffle for the token counts. */
  private val q156 = Q(
    "q156_jsd_drift",
    (s, d) => {
      val srcs = Seq("src0", "src1", "src2", "src3", "src4")
      val toks = Tables.documents(s, d).filter(col("source").isin(srcs: _*))
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
      val dfTok = toks.groupBy(col("tok")).agg(count(lit(1)).as("tot"))
      val vocab = dfTok.orderBy(col("tot").desc, col("tok").asc).limit(50)
        .select(col("tok"))
      val cnt = toks.join(broadcast(vocab), "tok")
        .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
      val nS = toks.join(broadcast(vocab), "tok")
        .groupBy(col("source")).agg(count(lit(1)).as("n"))
      // (pair × vocab) grid with zero back-fill — mirrors the twin row for
      // row: 10 source pairs × 50 tokens, counts left-joined in, rows where
      // BOTH sides are zero dropped (they contribute nothing to JSD)
      val withN = nS.select(col("source").as("sa"), col("n").as("na"))
        .crossJoin(broadcast(nS.select(col("source").as("sb"), col("n").as("nb"))))
        .filter(col("sa") < col("sb"))
        .crossJoin(broadcast(vocab))
        .join(cnt.select(col("source").as("sa"), col("tok"), col("c").as("ca")),
          Seq("sa", "tok"), "left")
        .join(cnt.select(col("source").as("sb"), col("tok"), col("c").as("cb")),
          Seq("sb", "tok"), "left")
        .na.fill(0L, Seq("ca", "cb"))
        .filter(col("ca") + col("cb") > 0)
      val p = col("ca").cast("double") / col("na").cast("double")
      val q = col("cb").cast("double") / col("nb").cast("double")
      // 0.5[p ln(2p/(p+q)) + q ln(2q/(p+q))], each ln on exact-long ratios
      val termP = when(col("ca") > 0,
        p * log(lit(2.0) * (col("ca") * col("nb")).cast("double") /
          (col("ca") * col("nb") + col("cb") * col("na")).cast("double")))
        .otherwise(lit(0.0))
      val termQ = when(col("cb") > 0,
        q * log(lit(2.0) * (col("cb") * col("na")).cast("double") /
          (col("ca") * col("nb") + col("cb") * col("na")).cast("double")))
        .otherwise(lit(0.0))
      withN
        .withColumn("term_nano",
          floor((termP + termQ) * 0.5 * 1000000000L + 0.5).cast("long"))
        .groupBy(col("sa"), col("sb"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("term_nano")).as("jsd_nano"))
    },
    Some("""
      WITH toks AS (
        SELECT source, tok FROM (
          SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
          WHERE source IN ('src0','src1','src2','src3','src4'))
        WHERE tok <> ''),
      vocab AS (
        SELECT tok FROM (SELECT tok, count(*) AS tot FROM toks GROUP BY 1)
        ORDER BY tot DESC, tok ASC LIMIT 50),
      cnt AS (
        SELECT source, t.tok, count(*) AS c
        FROM toks t JOIN vocab v USING (tok) GROUP BY 1, 2),
      ns AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n
        FROM toks t JOIN vocab v USING (tok) GROUP BY 1),
      pairs AS (
        SELECT a.source AS sa, b.source AS sb, v.tok,
          coalesce(ca.c, 0) AS ca, coalesce(cb.c, 0) AS cb
        FROM ns a
        JOIN ns b ON a.source < b.source
        CROSS JOIN vocab v
        LEFT JOIN cnt ca ON ca.source = a.source AND ca.tok = v.tok
        LEFT JOIN cnt cb ON cb.source = b.source AND cb.tok = v.tok
        WHERE coalesce(ca.c, 0) + coalesce(cb.c, 0) > 0),
      terms AS (
        SELECT sa, sb,
          CAST(floor((
            CASE WHEN ca > 0 THEN
              CAST(ca AS DOUBLE) / CAST(na.n AS DOUBLE)
                * ln(2.0 * CAST(ca * nb.n AS DOUBLE)
                     / CAST(ca * nb.n + cb * na.n AS DOUBLE))
            ELSE 0.0 END
            + CASE WHEN cb > 0 THEN
              CAST(cb AS DOUBLE) / CAST(nb.n AS DOUBLE)
                * ln(2.0 * CAST(cb * na.n AS DOUBLE)
                     / CAST(ca * nb.n + cb * na.n AS DOUBLE))
            ELSE 0.0 END) * 0.5 * 1000000000 + 0.5) AS BIGINT) AS term_nano
        FROM pairs
        JOIN ns na ON na.source = pairs.sa
        JOIN ns nb ON nb.source = pairs.sb)
      SELECT sa, sb, count(*) AS n_tokens,
        CAST(sum(term_nano) AS BIGINT) AS jsd_nano
      FROM terms GROUP BY 1, 2"""))

  /** Partitioned-write round-trip with partition pruning, driver-checked:
    * orders lands as parquet partitioned by o_orderpriority (the layout
    * the 100 TB table actually ships with), then the read filters one
    * partition — Spark prunes at the directory level, so the scan never
    * opens the other four partitions' files (the spec twin pins the
    * PartitionFilters plan shape; this row pins the VALUES through real
    * partition directories, including the partition-column string
    * round-trip). The oracle filters the source table directly. */
  private val q157 = Q(
    "q157_partitioned_prune",
    (s, d) => {
      val tmp = new java.io.File(
        sys.props("java.io.tmpdir"), "graft_q157_part").getAbsolutePath
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
        .write.mode("overwrite").partitionBy("o_orderpriority").parquet(tmp)
      s.read.parquet(tmp)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderpriority").cast("string").as("o_orderpriority"))
    },
    Some("""
      SELECT o_orderkey, o_totalprice, o_orderpriority
      FROM orders WHERE o_orderpriority = '1-URGENT'"""))

  /** NDCG@10 per source — the graded-ranking eval beside q155's AUC:
    * docs ranked by (n_chars DESC, doc_id ASC), relevance = lang='en',
    * discount weights 1/log2(i+1) converted to integer MICRO-units per
    * position BEFORE any summation (binary relevance × integer weights =
    * exact BIGINT DCG), ideal DCG built from the same retrieved-10 set
    * via a sequence HOF, final ratio one division of exact longs. Sources
    * with no positive in the top 10 emit 0 (idcg=0 convention). The rank
    * window is per-source; nothing global. */
  private val q158 = Q(
    "q158_ndcg",
    (s, d) => {
      def wMicro(pos: Column): Column =
        floor(lit(1000000.0) / log2(pos.cast("double") + 1.0) + 0.5).cast("long")
      val ranked = Tables.documents(s, d)
        .withColumn("rn", row_number().over(Window.partitionBy(col("source"))
          .orderBy(col("n_chars").desc, col("doc_id").asc)))
        .filter(col("rn") <= 10)
        .select(col("source"), col("rn"),
          (col("lang") === "en").cast("long").as("rel"))
      ranked.groupBy(col("source"))
        .agg(
          sum(col("rel") * wMicro(col("rn"))).as("dcg_micro"),
          sum(col("rel")).as("n_pos"))
        .withColumn("idcg_micro",
          // n_pos=0 must short-circuit: sequence(1, 0) is DESCENDING [1,0]
          // under Spark semantics, so wMicro(0) would divide by log2(1)=0.
          // The guard matches the twin's coalesce-to-0 convention.
          when(col("n_pos") > 0,
            aggregate(
              transform(sequence(lit(1L), col("n_pos")),
                j => wMicro(j)),
              lit(0L), (a, x) => a + x))
            .otherwise(lit(0L)))
        .select(col("source"), col("n_pos"), col("dcg_micro"),
          when(col("idcg_micro") > 0,
            floor(col("dcg_micro").cast("double") /
              col("idcg_micro").cast("double") * 1000000 + 0.5).cast("long"))
            .otherwise(lit(0L)).as("ndcg_micro"))
    },
    Some("""
      WITH ranked AS (
        SELECT source,
          row_number() OVER (PARTITION BY source
            ORDER BY n_chars DESC, doc_id ASC) AS rn,
          CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS rel
        FROM documents QUALIFY rn <= 10),
      agg AS (
        SELECT source,
          CAST(sum(rel * CAST(floor(1000000.0 / log2(rn + 1.0) + 0.5) AS BIGINT))
            AS BIGINT) AS dcg_micro,
          CAST(sum(rel) AS BIGINT) AS n_pos
        FROM ranked GROUP BY 1),
      ideal AS (
        SELECT source, dcg_micro, n_pos,
          CAST(coalesce(list_sum(list_transform(range(1, n_pos + 1),
            j -> CAST(floor(1000000.0 / log2(j + 1.0) + 0.5) AS BIGINT))), 0)
            AS BIGINT) AS idcg_micro
        FROM agg)
      SELECT source, n_pos, dcg_micro,
        CASE WHEN idcg_micro > 0 THEN
          CAST(floor(CAST(dcg_micro AS DOUBLE) / CAST(idcg_micro AS DOUBLE)
            * 1000000 + 0.5) AS BIGINT)
        ELSE 0 END AS ndcg_micro
      FROM ideal"""))

  /** One-pass dataset card — the "nutrition label" a corpus release ships
    * with: size, token/char totals, language/source breadth, English
    * share, exact length percentiles, and the exact-dup rate, in TWO
    * aggregates total (one over documents, one over content fingerprints)
    * combined by a 1-row broadcast. Everything except the percentiles is
    * exact integer arithmetic; the percentiles follow the q50
    * interpolation-parity rule. At 100 TB this is the query that runs
    * once per snapshot and lands in the release notes. */
  private val q159 = Q(
    "q159_dataset_card",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val base = docs.agg(
        count(lit(1)).as("n_docs"),
        sum(size(filter(split(col("text"), " "), x => x =!= ""))
          .cast("long")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars_total"),
        count_distinct(col("lang")).as("n_langs"),
        count_distinct(col("source")).as("n_sources"),
        sum((col("lang") === "en").cast("long")).as("n_en"),
        r(percentile(col("n_chars"), lit(0.5)), 6).as("chars_p50"),
        r(percentile(col("n_chars"), lit(0.9)), 6).as("chars_p90"))
      val dup = docs.groupBy(md5(col("text")).as("fp"))
        .agg(count(lit(1)).as("n"))
        .agg(
          sum(col("n") - 1).as("dup_docs"),
          sum(when(col("n") > 1, 1L).otherwise(0L)).as("dup_groups"))
      base.crossJoin(broadcast(dup)).select(
        col("n_docs"), col("n_tokens"), col("n_chars_total"),
        col("n_langs"), col("n_sources"),
        floor(col("n_en").cast("double") / col("n_docs").cast("double")
          * 1000000 + 0.5).cast("long").as("en_share_micro"),
        col("chars_p50"), col("chars_p90"),
        col("dup_docs"), col("dup_groups"))
    },
    Some("""
      WITH base AS (
        SELECT count(*) AS n_docs,
          CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> '')))
            AS BIGINT) AS n_tokens,
          CAST(sum(n_chars) AS BIGINT) AS n_chars_total,
          count(DISTINCT lang) AS n_langs,
          count(DISTINCT source) AS n_sources,
          CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
          floor(quantile_cont(n_chars, 0.5) * 1000000 + 0.5) / 1000000 AS chars_p50,
          floor(quantile_cont(n_chars, 0.9) * 1000000 + 0.5) / 1000000 AS chars_p90
        FROM documents),
      dup AS (
        SELECT CAST(sum(n - 1) AS BIGINT) AS dup_docs,
          CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_groups
        FROM (SELECT md5(text) AS fp, count(*) AS n FROM documents GROUP BY 1))
      SELECT n_docs, n_tokens, n_chars_total, n_langs, n_sources,
        CAST(floor(CAST(n_en AS DOUBLE) / CAST(n_docs AS DOUBLE)
          * 1000000 + 0.5) AS BIGINT) AS en_share_micro,
        chars_p50, chars_p90, dup_docs, dup_groups
      FROM base, dup"""))

  /** Exact-proportion stratified split — the deterministic 8/1/1
    * train/val/test assignment with GUARANTEED per-stratum counts
    * (row_number mod 10 inside each language), the complement to q59's
    * hash split (hash gives expected proportions and replay stability;
    * this gives exact proportions and replay stability, at the cost of a
    * per-stratum rank window). Emitted as per-(lang, split) counts so the
    * oracle verifies the guarantee itself, not just row placement. */
  private val q160 = Q(
    "q160_stratified_split",
    (s, d) => {
      val rn = row_number().over(Window.partitionBy(col("lang"))
        .orderBy(col("doc_id").asc))
      Tables.documents(s, d)
        .withColumn("split",
          when(rn % 10 === 0, "val")
            .when(rn % 10 === 1, "test")
            .otherwise("train"))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"))
    },
    Some("""
      WITH assigned AS (
        SELECT lang,
          CASE row_number() OVER (PARTITION BY lang ORDER BY doc_id ASC) % 10
            WHEN 0 THEN 'val' WHEN 1 THEN 'test' ELSE 'train' END AS split
        FROM documents)
      SELECT lang, split, count(*) AS n_docs
      FROM assigned GROUP BY 1, 2"""))

  /** Error-safe arithmetic/cast surface (try_cast / try_divide / try_add)
    * — the ANSI-mode escape hatches a production pipeline uses so one
    * malformed cell degrades to NULL instead of failing a 100 TB job.
    * Inputs are engineered to hit both branches from real data: the
    * numeric tail of c_name try_casts cleanly, the full name does not;
    * the modulo denominator plants genuine zeros. DuckDB lacks
    * try_divide/try_add → NULLIF/CASE twins with identical three-valued
    * semantics. Pure projection. */
  private val q161 = Q(
    "q161_try_surface",
    (s, d) => {
      Tables.customer(s, d).select(
        col("c_custkey"),
        try_element_at(split(col("c_name"), "#"), lit(2)).cast("long").as("num_tail"),
        expr("try_cast(c_name AS BIGINT)").as("bad_cast"),
        expr("try_divide(c_acctbal, c_custkey % 3)").as("risky_div"),
        // +1 so custkey 0 overflows too — every row exercises the NULL path
        expr("try_add(9223372036854775807L, c_custkey + 1L)").as("overflow_add"))
    },
    Some("""
      SELECT c_custkey,
        TRY_CAST(string_split(c_name, '#')[2] AS BIGINT) AS num_tail,
        TRY_CAST(c_name AS BIGINT) AS bad_cast,
        c_acctbal / nullif(c_custkey % 3, 0) AS risky_div,
        CAST(NULL AS BIGINT) AS overflow_add
      FROM customer"""))

  /** Distribution-rank window surface: percent_rank / cume_dist /
    * ntile(4) per market segment — the quantile-assignment windows q101's
    * rank family left out. The window order carries the unique custkey
    * tiebreak (the catalog-wide rank rule), which makes percent_rank and
    * cume_dist exact rational values of row positions — engine-identical
    * divisions — and pins every ntile bucket edge. r6-rounded doubles for
    * the two ratios; ntile emitted as an exact int. */
  private val q162 = Q(
    "q162_rank_distribution",
    (s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
      Tables.customer(s, d).select(
        col("c_mktsegment"), col("c_custkey"),
        r(percent_rank().over(w), 6).as("pr"),
        r(cume_dist().over(w), 6).as("cd"),
        ntile(4).over(w).as("quartile"))
    },
    Some("""
      SELECT c_mktsegment, c_custkey,
        floor(percent_rank() OVER w * 1000000 + 0.5) / 1000000 AS pr,
        floor(cume_dist() OVER w * 1000000 + 0.5) / 1000000 AS cd,
        CAST(ntile(4) OVER w AS INTEGER) AS quartile
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment
                   ORDER BY c_acctbal ASC, c_custkey ASC)"""))

  /** Gaps-and-islands: longest run of consecutive same-type events per
    * user — the classic streak analysis (q87's transition matrix counts
    * edges; this measures persistence). Island id = rn_overall −
    * rn_within_type, both ordered by the unique event_id, so runs are
    * exactly delimited with no timestamp-tie ambiguity. Longest-run
    * tiebreak: earliest island start. Two windows + two keyed aggregates,
    * all partitioned by user. */
  private val q163 = Q(
    "q163_event_islands",
    (s, d) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      val byUserType = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("event_id"))
      val islands = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("event_id"))
        .withColumn("grp",
          row_number().over(byUser) - row_number().over(byUserType))
        .groupBy(col("user_id"), col("event_type"), col("grp"))
        .agg(count(lit(1)).as("run_len"), min(col("event_id")).as("run_start"))
      islands.groupBy(col("user_id"))
        .agg(
          max(col("run_len")).as("longest_run"),
          min_by(col("event_type"), struct(-col("run_len"), col("run_start")))
            .as("run_type"),
          count(lit(1)).as("n_islands"))
    },
    Some("""
      WITH base AS (
        SELECT user_id, event_type, event_id,
          row_number() OVER (PARTITION BY user_id ORDER BY event_id)
          - row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY event_id) AS grp
        FROM events),
      islands AS (
        SELECT user_id, event_type, grp, count(*) AS run_len,
          min(event_id) AS run_start
        FROM base GROUP BY 1, 2, 3),
      ranked AS (
        SELECT user_id, event_type, run_len, run_start,
          row_number() OVER (PARTITION BY user_id
            ORDER BY run_len DESC, run_start ASC) AS rn
        FROM islands)
      SELECT r.user_id, r.run_len AS longest_run, r.event_type AS run_type,
        c.n_islands
      FROM ranked r
      JOIN (SELECT user_id, count(*) AS n_islands FROM islands GROUP BY 1) c
        USING (user_id)
      WHERE r.rn = 1"""))

  /** SemDeDup (Abbas et al. 2023) over the embeddings corpus: k-means-cell
    * blocking + within-cell cosine ≥ 0.40 + keep-lowest-id — semantic
    * dedup as one declarative query. The cells come from the FROZEN
    * [[graft.ops.CentroidArtifact]] (train-once index artifact, the q137b
    * serving-path move), which is what makes the DuckDB twin possible:
    * both engines evaluate the same centroid literals. This is the scale
    * answer to q32's documented label-blocked quadratic — the blocking key
    * here is a real learned cell whose count (not the corpus) bounds the
    * pair fan-out; output carries no float column, so the hash check rides
    * only on comparisons running the identical IEEE op sequence. */
  private val q164 = Q(
    "q164_semdedup",
    (s, d) => graft.ops.SemDedup.semDedup(Tables.embeddings(s, d), tau = 0.40),
    Some(graft.ops.SemDedup.oracleSql(tau = 0.40)))

  /** SemDeDup with the SCALED cell artifact — the cells-∝-n dial in the
    * catalog, not just prose: same algorithm and twin machinery as q164,
    * but cell assignment runs against `CentroidArtifact64` (k=64, trained
    * on the 10× tools/sf1 embeddings by `CentroidArtifactGen`). With k
    * grown ∝ corpus, within-cell pair counts stay FLAT as n grows —
    * measured in SemDedupScaleSpec (per-doc pair work 148.8 → 15.8 at
    * sf0.1 vs the frozen k=8 cells) and benchmarked at sf1 in BASELINE.md.
    * This is the production configuration; q164 keeps the small-corpus
    * artifact for hash-stability of the original row. */
  private val q164b = Q(
    "q164b_semdedup_scaled",
    (s, d) => graft.ops.SemDedup.semDedup(
      Tables.embeddings(s, d), tau = 0.40, graft.ops.CentroidArtifact64.centers),
    Some(graft.ops.SemDedup.oracleSql(tau = 0.40,
      graft.ops.CentroidArtifact64.centers)))

  /** Spark 4 VARIANT surface (semi-structured data without a schema):
    * build a JSON event payload from real columns (the q122 synthesize-
    * then-parse discipline — the parser is checked against ground truth,
    * not another parser), `parse_json` it into an open VariantType cell,
    * and extract typed fields back out with `variant_get` paths, including
    * an array index, a missing-key null, and an out-of-range index null.
    * The DuckDB twin runs its native JSON path functions over the same
    * string. Float formatting inside the payload may differ per engine
    * (shortest-repr vs Java rules) — harmless by construction, because the
    * checked columns are the PARSED-BACK values, not the string.
    * At 100 TB variant columns are the schema-drift-proof landing format
    * for event payloads: shredded on read, no reprocess on key add. */
  private val q165 = Q(
    "q165_variant_json",
    (s, d) => {
      val payload = concat(
        lit("""{"user":{"id":"""), col("user_id"),
        lit("""},"event":{"type":""""), col("event_type"), lit("\""),
        lit(""","value":"""), r2(col("value")),
        lit("""},"props":"""), col("props"),
        lit(""","tags":["""), col("event_id") % 7, lit(","), col("event_id") % 3,
        lit("]}"))
      Tables.events(s, d)
        .select(col("event_id"), parse_json(payload).as("v"))
        .select(
          col("event_id"),
          try_variant_get(col("v"), "$.user.id", "bigint").as("uid"),
          try_variant_get(col("v"), "$.event.type", "string").as("etype"),
          try_variant_get(col("v"), "$.event.value", "double").as("value"),
          try_variant_get(col("v"), "$.props.k", "bigint").as("prop_k"),
          try_variant_get(col("v"), "$.tags[1]", "bigint").as("tag1"),
          try_variant_get(col("v"), "$.tags[5]", "bigint").as("tag_oob"),
          try_variant_get(col("v"), "$.missing.key", "string").as("absent"))
    },
    Some("""
      WITH j AS (
        SELECT event_id,
          '{"user":{"id":' || user_id ||
          '},"event":{"type":"' || event_type ||
          '","value":' || floor(value*100 + 0.5)/100 ||
          '},"props":' || props ||
          ',"tags":[' || event_id % 7 || ',' || event_id % 3 || ']}' AS s
        FROM events)
      SELECT event_id,
        json_extract_string(s, '$.user.id')::BIGINT AS uid,
        json_extract_string(s, '$.event.type') AS etype,
        json_extract_string(s, '$.event.value')::DOUBLE AS value,
        json_extract_string(s, '$.props.k')::BIGINT AS prop_k,
        json_extract_string(s, '$.tags[1]')::BIGINT AS tag1,
        json_extract_string(s, '$.tags[5]')::BIGINT AS tag_oob,
        json_extract_string(s, '$.missing.key') AS absent
      FROM j"""))

  /** Containment (asymmetric set-overlap) near-dup: |A∩B|/|A| over
    * distinct token sets — the sub-document-duplication signal Jaccard
    * (q20) misses: when a short doc A is wholly inside a long doc B,
    * containment(A→B)=1.0 while Jaccard is tiny. Emitted per ORDERED pair
    * (both directions), so the asymmetry itself is in the checked output.
    * Same 30-char-prefix blocking as q20/q46 (at 100 TB: a band/bucket
    * key); set sizes ride along so the asymmetry is auditable. */
  private val q166 = Q(
    "q166_containment_neardup",
    (s, d) => {
      val docs = Tables.documents(s, d).select(
        col("doc_id"),
        substring(col("text"), 1, 30).as("pfx"),
        array_distinct(split(col("text"), " ")).as("toks"))
      val a = docs.as("a")
      val b = docs.as("b")
      val inter = size(array_intersect(col("a.toks"), col("b.toks")))
      a.join(b, col("a.pfx") === col("b.pfx") &&
          col("a.doc_id") =!= col("b.doc_id"))
        .select(
          col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          size(col("a.toks")).as("n_a"), size(col("b.toks")).as("n_b"),
          (inter.cast("double") / size(col("a.toks"))).as("cont"))
        .filter(col("cont") >= 0.9)
        .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"),
          r(col("cont"), 3).as("containment"))
    },
    Some("""
      WITH d AS (
        SELECT doc_id, substr(text, 1, 30) AS pfx,
          list_distinct(string_split(text, ' ')) AS toks
        FROM documents)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        CAST(len(a.toks) AS INT) AS n_a, CAST(len(b.toks) AS INT) AS n_b,
        floor((len(list_intersect(a.toks, b.toks))::DOUBLE
               / len(a.toks))*1000 + 0.5)/1000 AS containment
      FROM d a JOIN d b ON a.pfx = b.pfx AND a.doc_id <> b.doc_id
      WHERE len(list_intersect(a.toks, b.toks))::DOUBLE / len(a.toks) >= 0.9"""))

  /** The WHOLE dedup pipeline as one declarative query — candidates
    * (q20's prefix-blocked Jaccard edges) → connected components (q46's
    * min-label fixpoint) → keep-BEST canonical per cluster (q121's
    * (n_chars DESC, doc_id ASC) rule, not keep-min-id) → the surviving
    * corpus MANIFEST with reduction accounting (docs and chars freed per
    * keeper). This is the end product the stages exist for: what ships to
    * training after dedup, with per-cluster provenance. One row per kept
    * doc, all-integer output. The twin recomputes the same fixpoint with
    * a recursive CTE and the same window rule. */
  private val q167 = Q(
    "q167_dedup_pipeline",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val clusters = graft.ops.Text.dedupClusters(
        docs, prefixJaccardPairs(s, d).select(col("doc_a"), col("doc_b")))
      val sized = clusters.join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      val w = Window.partitionBy(col("cluster_id"))
        .orderBy(col("n_chars").desc, col("doc_id").asc)
      sized
        .withColumn("rk", row_number().over(w))
        .withColumn("cluster_chars",
          sum(col("n_chars")).over(Window.partitionBy(col("cluster_id"))))
        .filter(col("rk") === 1)
        .select(
          col("doc_id"), col("cluster_id"), col("cluster_size"),
          (col("cluster_size") - 1).as("n_dropped"),
          col("n_chars").as("kept_chars"),
          (col("cluster_chars") - col("n_chars")).as("dropped_chars"))
    },
    Some("""
      WITH RECURSIVE d AS (
        SELECT doc_id, substr(text, 1, 30) AS pfx,
          list_distinct(string_split(text, ' ')) AS toks
        FROM documents),
      e AS (
        SELECT a.doc_id AS a, b.doc_id AS b
        FROM d a JOIN d b ON a.pfx = b.pfx AND a.doc_id < b.doc_id
        WHERE len(list_intersect(a.toks, b.toks))::DOUBLE
              / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.5),
      sym AS (SELECT a, b FROM e UNION SELECT b AS a, a AS b FROM e),
      reach(node, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT reach.node, sym.b FROM reach JOIN sym ON sym.a = reach.r),
      comp AS (SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node),
      sized AS (
        SELECT c.doc_id, c.cluster_id, dd.n_chars,
          count(*) OVER (PARTITION BY c.cluster_id) AS cluster_size,
          CAST(sum(dd.n_chars) OVER (PARTITION BY c.cluster_id) AS BIGINT)
            AS cluster_chars,
          row_number() OVER (PARTITION BY c.cluster_id
            ORDER BY dd.n_chars DESC, c.doc_id ASC) AS rk
        FROM comp c JOIN documents dd USING (doc_id))
      SELECT doc_id, cluster_id, cluster_size,
        cluster_size - 1 AS n_dropped,
        n_chars AS kept_chars,
        CAST(cluster_chars - n_chars AS BIGINT) AS dropped_chars
      FROM sized WHERE rk = 1"""))

  /** Embedding-space drift per cohort — the vector companion of the
    * scalar drift monitors (KS q149 / PSI q150 / JSD q156): each label's
    * mean embedding vs the global mean, reported as cosine similarity and
    * L2 shift. Exact-integer discipline end to end: components are
    * micro-rounded BIGINTs, so the per-(label,dim) sums are
    * order-independent; the per-dim mean products are pico-rounded back
    * to BIGINTs before the 64-term reduction (q117's move), so no float
    * summation order exists anywhere. Map-side explode + two keyed
    * aggregates + a 64-row broadcast join — at 100 TB the width (64)
    * stays constant, the shuffle carries labels × dims rows. */
  private val q168 = Q(
    "q168_embedding_drift",
    (s, d) => {
      val comp = Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .select(col("label"), col("pos"),
          floor(col("x").cast("double") * 1000000 + 0.5).cast("long").as("c"))
      val byLabel = comp.groupBy(col("label"), col("pos"))
        .agg(sum(col("c")).as("s"), count(lit(1)).as("n"))
      val global = byLabel.groupBy(col("pos"))
        .agg(sum(col("s")).as("sg"), sum(col("n")).as("ng"))
      val t = byLabel.join(broadcast(global), Seq("pos"))
        .withColumn("ml", col("s").cast("double") / col("n"))
        .withColumn("mg", col("sg").cast("double") / col("ng"))
        .select(col("label"), col("n"),
          floor(col("ml") * col("mg") + 0.5).cast("long").as("dot_t"),
          floor(col("ml") * col("ml") + 0.5).cast("long").as("nl_t"),
          floor(col("mg") * col("mg") + 0.5).cast("long").as("ng_t"),
          floor((col("ml") - col("mg")) * (col("ml") - col("mg")) + 0.5)
            .cast("long").as("d2_t"))
      t.groupBy(col("label"))
        .agg(
          max(col("n")).as("n_vecs"),
          sum(col("dot_t")).as("dot"), sum(col("nl_t")).as("nl"),
          sum(col("ng_t")).as("ng"), sum(col("d2_t")).as("d2"))
        .select(
          col("label"), col("n_vecs"),
          r(col("dot").cast("double") /
            (sqrt(col("nl").cast("double")) * sqrt(col("ng").cast("double"))), 6)
            .as("cos_to_global"),
          r(sqrt(col("d2").cast("double")) / 1000000, 6).as("l2_shift"))
    },
    Some("""
      WITH comp AS (
        SELECT label,
          unnest(range(len(embedding))) AS pos,
          CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS c
        FROM embeddings),
      by_label AS (
        SELECT label, pos, CAST(sum(c) AS BIGINT) AS s, count(*) AS n
        FROM comp GROUP BY 1, 2),
      gstats AS (
        SELECT pos, CAST(sum(s) AS BIGINT) AS sg, CAST(sum(n) AS BIGINT) AS ng
        FROM by_label GROUP BY 1),
      t AS (
        SELECT label, n,
          CAST(floor((s::DOUBLE / n) * (sg::DOUBLE / ng) + 0.5) AS BIGINT) AS dot_t,
          CAST(floor((s::DOUBLE / n) * (s::DOUBLE / n) + 0.5) AS BIGINT) AS nl_t,
          CAST(floor((sg::DOUBLE / ng) * (sg::DOUBLE / ng) + 0.5) AS BIGINT) AS ng_t,
          CAST(floor((s::DOUBLE / n - sg::DOUBLE / ng)
                   * (s::DOUBLE / n - sg::DOUBLE / ng) + 0.5) AS BIGINT) AS d2_t
        FROM by_label JOIN gstats USING (pos))
      SELECT label, max(n) AS n_vecs,
        floor(CAST(sum(dot_t) AS BIGINT)::DOUBLE
              / (sqrt(CAST(sum(nl_t) AS BIGINT)::DOUBLE)
                 * sqrt(CAST(sum(ng_t) AS BIGINT)::DOUBLE)) * 1000000 + 0.5)
          / 1000000 AS cos_to_global,
        floor(sqrt(CAST(sum(d2_t) AS BIGINT)::DOUBLE) / 1000000 * 1000000 + 0.5)
          / 1000000 AS l2_shift
      FROM t GROUP BY label"""))

  /** Spark 4 collation surface: a case-insensitive equi-join via
    * UTF8_LCASE collation — no lower() rewrite on either side, the
    * comparison itself is collation-aware (and at scale stays a plain
    * hash join on the collation key). Mixed case is synthesized
    * deterministically (every even doc_id upper-cased) so both branches
    * are exercised; the DuckDB twin is the classic lower()-normalized
    * join, proving the collated join equals the rewrite it replaces. */
  private val q169 = Q(
    "q169_collated_join",
    (s, d) => {
      import s.implicits._
      val langNames = Seq(
        ("en", "English"), ("de", "German"), ("es", "Spanish"),
        ("fr", "French"), ("zh", "Chinese")).toDF("lang_key", "lang_name")
      val docs = Tables.documents(s, d).select(
        col("doc_id"),
        when(col("doc_id") % 2 === 0, upper(col("lang")))
          .otherwise(col("lang")).as("lang_mixed"))
      docs.join(broadcast(langNames),
          collate(col("lang_mixed"), "UTF8_LCASE") ===
            collate(col("lang_key"), "UTF8_LCASE"))
        .select(col("doc_id"), col("lang_mixed"), col("lang_name"))
    },
    Some("""
      WITH docs AS (
        SELECT doc_id,
          CASE WHEN doc_id % 2 = 0 THEN upper(lang) ELSE lang END AS lang_mixed
        FROM documents),
      names(lang_key, lang_name) AS (VALUES
        ('en', 'English'), ('de', 'German'), ('es', 'Spanish'),
        ('fr', 'French'), ('zh', 'Chinese'))
      SELECT doc_id, lang_mixed, lang_name
      FROM docs JOIN names ON lower(lang_mixed) = lang_key"""))

  /** XML ingestion surface (`from_xml`, Spark 4): build an XML event
    * record from real columns, parse it back through a typed schema, and
    * emit the extracted fields — the q122/q165 synthesize-then-parse
    * discipline, where the oracle recomputes the SAME fields from the
    * SOURCE columns, so the parser is checked against ground truth rather
    * than against another XML parser (DuckDB has none). Round-trip
    * exactness: ids are integers, the value is r2-rounded before
    * rendering, and shortest-repr double → string → double is lossless. */
  private val q170 = Q(
    "q170_xml_extract",
    (s, d) => {
      val xml = concat(
        lit("<event id=\""), col("event_id"), lit("\">"),
        lit("<user>"), col("user_id"), lit("</user>"),
        lit("<type>"), col("event_type"), lit("</type>"),
        lit("<value>"), r2(col("value")), lit("</value>"),
        lit("</event>"))
      Tables.events(s, d)
        .select(col("event_id").as("source_id"), from_xml(xml,
          org.apache.spark.sql.types.StructType.fromDDL(
            "_id BIGINT, user BIGINT, type STRING, value DOUBLE")).as("x"))
        .select(
          col("source_id"),
          col("x._id").as("xml_id"),
          col("x.user").as("user_id"),
          col("x.type").as("event_type"),
          col("x.value").as("value"))
    },
    Some("""
      SELECT event_id AS source_id, event_id AS xml_id, user_id, event_type,
        floor(value*100 + 0.5)/100 AS value
      FROM events"""))

  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): the join
    * predicate every SCD/CDC merge needs when keys are nullable — plain
    * `=` silently drops null-key rows, `<=>` matches null to null. Both
    * sides collapse a nulled-out key (the hottest priority mapped to
    * NULL) to per-key counts, so the null bucket is REAL on both sides
    * and must pair up for the row to survive. Still compiles to a plain
    * hash join — null-safe equality is a valid equi-join key. */
  private val q171 = Q(
    "q171_nullsafe_join",
    (s, d) => {
      def side(year: Int, as: String) = Tables.orders(s, d)
        .filter(col("o_orderdate") >= to_timestamp(lit(f"$year-01-01")) &&
          col("o_orderdate") < to_timestamp(lit(f"${year + 1}-01-01")))
        .groupBy(nullif(col("o_orderpriority"), lit("1-URGENT")).as(s"k_$as"))
        .agg(count(lit(1)).as(s"n_$as"))
      side(1995, "a").join(side(1996, "b"), col("k_a") <=> col("k_b"))
        .select(col("k_a").as("priority_key"), col("n_a"), col("n_b"))
    },
    Some("""
      WITH a AS (
        SELECT nullif(o_orderpriority, '1-URGENT') AS k, count(*) AS n_a
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1996-01-01'
        GROUP BY 1),
      b AS (
        SELECT nullif(o_orderpriority, '1-URGENT') AS k, count(*) AS n_b
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY 1)
      SELECT a.k AS priority_key, a.n_a, b.n_b
      FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k"""))

  /** Mutual information + chi-squared independence between two
    * categorical columns (lang × source) from ONE contingency table — the
    * dependence diagnostic behind stratification choices: MI ≈ 0 says the
    * columns stratify independently, high Cramér's V says a per-source
    * language audit is redundant. Exact BIGINT cell/margin counts; each
    * per-cell MI/chi² term is one closed-form double in identical textual
    * order both engines, nano-rounded BEFORE the sum (q117/q150
    * discipline), so no float summation order exists. Three keyed
    * aggregates + two broadcast-size margin joins; at 100 TB the shuffle
    * carries one row per (lang, source) cell. */
  private val q172 = Q(
    "q172_mutual_information",
    (s, d) => {
      val cells = Tables.documents(s, d)
        .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n_ls"))
      val byLang = cells.groupBy(col("lang")).agg(sum(col("n_ls")).as("n_l"))
      val bySrc = cells.groupBy(col("source")).agg(sum(col("n_ls")).as("n_s"))
      val total = cells.agg(
        sum(col("n_ls")).as("n"),
        countDistinct(col("lang")).as("k_l"),
        countDistinct(col("source")).as("k_s"))
      val t = cells
        .join(broadcast(byLang), Seq("lang"))
        .join(broadcast(bySrc), Seq("source"))
        .join(broadcast(total))
        .withColumn("e", col("n_l").cast("double") * col("n_s") / col("n"))
        .select(
          col("n"), col("k_l"), col("k_s"),
          floor((col("n_ls").cast("double") / col("n")) *
            log(col("n_ls").cast("double") * col("n") /
              (col("n_l").cast("double") * col("n_s"))) * 1e9 + 0.5)
            .cast("long").as("mi_t"),
          floor((col("n_ls").cast("double") - col("e")) *
            (col("n_ls").cast("double") - col("e")) / col("e") * 1e9 + 0.5)
            .cast("long").as("chi_t"))
      t.groupBy(col("n"), col("k_l"), col("k_s"))
        .agg(sum(col("mi_t")).as("mi_sum"), sum(col("chi_t")).as("chi_sum"))
        .select(
          col("n"),
          r(col("mi_sum").cast("double") / 1e9, 6).as("mi_nats"),
          r(col("chi_sum").cast("double") / 1e9, 4).as("chi2"),
          ((col("k_l") - 1) * (col("k_s") - 1)).as("dof"),
          r(sqrt((col("chi_sum").cast("double") / 1e9) /
            (col("n").cast("double") * least(col("k_l") - 1, col("k_s") - 1))), 6)
            .as("cramers_v"))
    },
    Some("""
      WITH cells AS (
        SELECT lang, source, CAST(count(*) AS BIGINT) AS n_ls
        FROM documents GROUP BY 1, 2),
      by_lang AS (
        SELECT lang, CAST(sum(n_ls) AS BIGINT) AS n_l FROM cells GROUP BY 1),
      by_src AS (
        SELECT source, CAST(sum(n_ls) AS BIGINT) AS n_s FROM cells GROUP BY 1),
      tot AS (
        SELECT CAST(sum(n_ls) AS BIGINT) AS n,
          CAST(count(DISTINCT lang) AS BIGINT) AS k_l,
          CAST(count(DISTINCT source) AS BIGINT) AS k_s
        FROM cells),
      t AS (
        SELECT n, k_l, k_s,
          CAST(floor((n_ls::DOUBLE / n) *
            ln(n_ls::DOUBLE * n / (n_l::DOUBLE * n_s)) * 1e9 + 0.5) AS BIGINT)
            AS mi_t,
          CAST(floor((n_ls::DOUBLE - n_l::DOUBLE * n_s / n) *
            (n_ls::DOUBLE - n_l::DOUBLE * n_s / n)
            / (n_l::DOUBLE * n_s / n) * 1e9 + 0.5) AS BIGINT) AS chi_t
        FROM cells
        JOIN by_lang USING (lang)
        JOIN by_src USING (source)
        CROSS JOIN tot)
      SELECT n,
        floor(CAST(sum(mi_t) AS BIGINT)::DOUBLE / 1e9 * 1000000 + 0.5)
          / 1000000 AS mi_nats,
        floor(CAST(sum(chi_t) AS BIGINT)::DOUBLE / 1e9 * 10000 + 0.5)
          / 10000 AS chi2,
        (k_l - 1) * (k_s - 1) AS dof,
        floor(sqrt((CAST(sum(chi_t) AS BIGINT)::DOUBLE / 1e9)
              / (n::DOUBLE * least(k_l - 1, k_s - 1))) * 1000000 + 0.5)
          / 1000000 AS cramers_v
      FROM t GROUP BY n, k_l, k_s"""))

  /** SCD2 history construction (Core.scd2): two yearly per-priority
    * snapshots become the version-interval table a warehouse keeps — the
    * historized form of q70's change rows. The snapshots deliberately
    * disagree on key coverage ('5-LOW' retired from the old year,
    * '1-URGENT' absent from the new) so every SCD2 row shape is real:
    * closed-with-successor (update), closed-without (delete), open
    * unchanged, open inserted. One full-outer shuffle on the key; the
    * Delta deployment of this is MERGE-with-history. */
  private val q173 = Q(
    "q173_scd2_history",
    (s, d) => {
      def snap(year: Int, dropPriority: String) = Tables.orders(s, d)
        .filter(col("o_orderdate") >= to_timestamp(lit(f"$year-01-01")) &&
          col("o_orderdate") < to_timestamp(lit(f"${year + 1}-01-01")) &&
          col("o_orderpriority") =!= dropPriority)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
      Core.scd2(
        snap(1995, "5-LOW"), snap(1996, "1-URGENT"),
        keys = Seq("o_orderpriority"), compareCols = Seq("n_orders"),
        oldVersion = "1995", newVersion = "1996")
    },
    Some("""
      WITH o AS (
        SELECT o_orderpriority, count(*) AS n_orders FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1996-01-01'
          AND o_orderpriority <> '5-LOW'
        GROUP BY 1),
      n AS (
        SELECT o_orderpriority, count(*) AS n_orders FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND o_orderpriority <> '1-URGENT'
        GROUP BY 1),
      j AS (
        SELECT coalesce(o.o_orderpriority, n.o_orderpriority) AS k,
          o.n_orders AS o_n, n.n_orders AS n_n,
          o.o_orderpriority IS NOT NULL AS has_o,
          n.o_orderpriority IS NOT NULL AS has_n,
          (o.n_orders IS DISTINCT FROM n.n_orders) AS chg
        FROM o FULL JOIN n ON o.o_orderpriority = n.o_orderpriority)
      SELECT k AS o_orderpriority, o_n AS n_orders,
        '1995' AS valid_from, '1996' AS valid_to
      FROM j WHERE has_o AND (NOT has_n OR chg)
      UNION ALL
      SELECT k, o_n, '1995', NULL FROM j WHERE has_o AND has_n AND NOT chg
      UNION ALL
      SELECT k, n_n, '1996', NULL FROM j WHERE has_n AND (NOT has_o OR chg)"""))

  /** Nested (telescoping) corpus subsets for scaling-law runs: ONE
    * md5-uniform per doc yields 1% ⊂ 10% ⊂ 100% tiers simultaneously —
    * the 1% set is a true subset of the 10% set by construction (same
    * hash, nested thresholds), so per-scale training runs are comparable.
    * A fresh draw per tier would break nesting AND reproducibility; this
    * is q47's hash-sampling discipline extended to telescoping tiers.
    * Pure map-side, zero shuffle. */
  private val q174 = Q(
    "q174_nested_subsets",
    (s, d) => {
      val u = graft.ops.Corpus.uniformHash(col("doc_id"), "graft-tiers")
      Tables.documents(s, d).select(
        col("doc_id"), col("lang"),
        when(u < 0.01, lit(1)).when(u < 0.1, lit(10)).otherwise(lit(100))
          .as("smallest_tier_pct"))
    },
    Some("""
      WITH u AS (
        SELECT doc_id, lang,
          (('0x' || substr(md5(doc_id::VARCHAR || 'graft-tiers'), 1, 15))::BIGINT)::DOUBLE
            / 1152921504606846976 AS uh
        FROM documents)
      SELECT doc_id, lang,
        CAST(CASE WHEN uh < 0.01 THEN 1 WHEN uh < 0.1 THEN 10 ELSE 100 END
          AS INT) AS smallest_tier_pct
      FROM u"""))

  /** k-anonymity audit over quasi-identifiers — the privacy gate beside
    * q52's PII redaction: redaction removes direct identifiers, but a
    * (lang, source, length-bucket) combination occurring in < k documents
    * can still single someone out on release. One exact hash aggregate
    * flags every sub-k group and sizes the suppression cost (how many
    * docs a k-anonymous release must drop or generalize). At 100 TB the
    * shuffle carries one row per QI combination. */
  private val q175 = Q(
    "q175_k_anonymity",
    (s, d) => {
      val k = 5
      Tables.documents(s, d)
        .groupBy(col("lang"), col("source"),
          (col("n_chars") / 100).cast("int").as("len_bucket"))
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("k_anonymous", col("n_docs") >= k)
        .withColumn("suppressed_docs",
          when(col("n_docs") < k, col("n_docs")).otherwise(lit(0L)))
    },
    Some("""
      SELECT lang, source,
        CAST(n_chars // 100 AS INT) AS len_bucket,
        count(*) AS n_docs,
        count(*) >= 5 AS k_anonymous,
        CASE WHEN count(*) < 5 THEN count(*) ELSE 0 END AS suppressed_docs
      FROM documents
      GROUP BY 1, 2, 3"""))

  /** BPE-style merge training as iterative dataflow: 3 rounds of
    * (count adjacent token pairs → argmax with deterministic tiebreak →
    * greedy left-to-right merge), the core loop of tokenizer training
    * (Sennrich et al. 2016) run corpus-wide on the engine. The merge
    * APPLICATION is the trick: docs live as '|tok||tok|'-delimited
    * strings, so one literal `replace('|a||b|' → '|a+b|')` IS the greedy
    * non-overlapping left-to-right merge — both engines' replace has
    * exactly those semantics (validated against an imperative reference).
    * Per round: one pair-count shuffle + a 1-row winner broadcast; fully
    * declarative here (3 unrolled rounds, bounded recompute), per-round
    * `localCheckpoint` at production depth like connectedComponents.
    * Output: the 3 learned merges with pair counts and the corpus token
    * count after each round. */
  private val q176 = Q(
    "q176_bpe_merges",
    (s, d) => {
      def toks(sc: Column) = split(regexp_replace(sc, "^\\||\\|$", ""), "\\|\\|")
      def pairCounts(corpus: DataFrame) = corpus
        .select(toks(col("s")).as("t"))
        .select(explode(transform(sequence(lit(1), size(col("t")) - 1), i =>
          struct(element_at(col("t"), i).as("a"),
            element_at(col("t"), i + 1).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("n"))
      def winner(corpus: DataFrame) =
        pairCounts(corpus).orderBy(col("n").desc, col("a").asc, col("b").asc).limit(1)
      def applyMerge(corpus: DataFrame, w: DataFrame) =
        corpus.crossJoin(broadcast(w)).select(col("doc_id"), expr(
          "replace(s, '|' || a || '||' || b || '|', '|' || a || '+' || b || '|')").as("s"))
      def tokensAfter(corpus: DataFrame) = corpus
        .select(size(toks(col("s"))).cast("long").as("k"))
        .agg(sum(col("k")).as("tokens_after"))
      // Tokens that are empty (leading/trailing/double spaces) or contain
      // the '|'/'+' delimiter chars would corrupt the delimited encoding
      // (and make Spark's strip-one-pipe vs the twin's trim-all-pipes
      // diverge) — filter them out BEFORE encoding, identically on both
      // sides. With no empty boundary tokens, s always carries exactly
      // one leading and one trailing '|', so trim(s,'|') == strip-one.
      var corpus = Tables.documents(s, d).select(
        col("doc_id"),
        concat(lit("|"), array_join(filter(split(col("text"), " "), x =>
          x =!= "" && !x.contains("|") && !x.contains("+")), "||"),
          lit("|")).as("s"))
      val rounds = (1 to 3).map { r =>
        val w = winner(corpus)
        val next = applyMerge(corpus, w)
        val row = w.crossJoin(broadcast(tokensAfter(next))).select(
          lit(r).as("round"), col("a").as("left_tok"), col("b").as("right_tok"),
          col("n").as("pair_count"), col("tokens_after"))
        corpus = next
        row
      }
      rounds.reduce(_.unionAll(_))
    },
    Some {
      def round(src: String, i: Int) = s"""p$i AS (
        SELECT u.p.a AS a, u.p.b AS b, count(*) AS n FROM (
          SELECT unnest(list_transform(range(1, len(t)),
            i -> struct_pack(a := t[i], b := t[i+1]))) AS p
          FROM (SELECT string_split(trim(s, '|'), '||') AS t FROM $src)) u
        GROUP BY 1, 2),
      w$i AS (SELECT a, b, n FROM p$i ORDER BY n DESC, a ASC, b ASC LIMIT 1),
      r$i AS (
        SELECT doc_id, replace(s, '|' || w$i.a || '||' || w$i.b || '|',
                                  '|' || w$i.a || '+' || w$i.b || '|') AS s
        FROM $src CROSS JOIN w$i),
      a$i AS (SELECT CAST(sum(len(string_split(trim(s, '|'), '||'))) AS BIGINT)
                AS tokens_after FROM r$i)"""
      s"""
      WITH r0 AS (
        SELECT doc_id,
          '|' || array_to_string(list_filter(string_split(text, ' '),
            x -> x <> '' AND NOT contains(x, '|') AND NOT contains(x, '+')),
            '||') || '|' AS s
        FROM documents),
      ${round("r0", 1)},
      ${round("r1", 2)},
      ${round("r2", 3)}
      SELECT CAST(1 AS INT) AS round, a AS left_tok, b AS right_tok,
        n AS pair_count, tokens_after FROM w1 CROSS JOIN a1
      UNION ALL SELECT 2, a, b, n, tokens_after FROM w2 CROSS JOIN a2
      UNION ALL SELECT 3, a, b, n, tokens_after FROM w3 CROSS JOIN a3"""
    })

  /** Batch model inference in the engine: a frozen logistic-regression
    * head scored over the embedding column — the quality-classifier
    * serving shape every curation stack runs (FineWeb-style classifier
    * sweeps). The model IS data: 64 weights + bias as literals folded
    * into the codegen'd vec_dot (the frozen-artifact discipline of
    * q137b/q164 — deterministic seedless weights here, since the point is
    * the serving shape, not the fit). Map-side score + sigmoid, top-20 by
    * raw score with the unique tiebreak → TakeOrderedAndProject; no
    * shuffle other than the top-k. The twin evaluates the identical
    * literals through list_dot_product. */
  private val q177 = {
    // deterministic pseudo-random weights, same derivation style as
    // Similarity.planes (seedless function of (j, tag) — reproducible)
    val w = Array.tabulate(64) { j =>
      (scala.util.hashing.MurmurHash3.productHash((j, "graft-linear")) % 1000) / 1000.0
    }
    val bias = -0.1
    Q(
      "q177_linear_scoring",
      (s, d) => {
        graft.plans.GraftExtensions.install(s)
        val z = graft.functions.VectorDot.vec_dot(
          transform(col("embedding"), x => x.cast("double")),
          array(w.map(lit).toIndexedSeq: _*)) + lit(bias)
        Tables.embeddings(s, d)
          .select(col("vec_id"), col("label"),
            (lit(1.0) / (lit(1.0) + exp(-z))).as("sc"))
          .orderBy(col("sc").desc, col("vec_id").asc)
          .limit(20)
          .select(col("vec_id"), col("label"), r(col("sc"), 6).as("score"))
      },
      Some(s"""
      WITH s AS (
        SELECT vec_id, label,
          1.0 / (1.0 + exp(-(list_dot_product(embedding::DOUBLE[],
            ${w.map(_.toString).mkString("[", ", ", "]")}) + $bias))) AS sc
        FROM embeddings)
      SELECT vec_id, label, floor(sc * 1000000 + 0.5) / 1000000 AS score
      FROM s ORDER BY sc DESC, vec_id ASC LIMIT 20"""))
  }

  /** Deterministic data augmentation (token dropout): each (doc, position)
    * draws its own md5-uniform, positions under the 10% rate drop, and the
    * augmented text is fingerprinted — reproducible augmentation, the
    * property `rand()`-based dropout can never give (same augmented corpus
    * on any engine, any run, any retry; the q47 hash-sampling discipline
    * at token granularity). Pure map-side HOF algebra on the Spark side
    * (indexed filter lambda), zero shuffle. */
  private val q178 = Q(
    "q178_token_dropout",
    (s, d) => {
      def u(pos: Column) = conv(substring(
        md5(concat(col("doc_id"), lit("-"), pos, lit("-aug"))), 1, 15), 16, 10)
        .cast("long").cast("double") / lit(1152921504606846976L).cast("double")
      val toks = split(col("text"), " ")
      val kept = filter(toks, (_, i) => u(i) >= 0.1)
      Tables.documents(s, d).select(
        col("doc_id"),
        size(toks).as("n_orig"),
        size(kept).as("n_kept"),
        conv(substring(md5(array_join(kept, " ")), 1, 15), 16, 10)
          .cast("long").as("aug_fingerprint"))
    },
    Some("""
      WITH ex AS (
        SELECT doc_id,
          unnest(range(len(string_split(text, ' ')))) AS pos,
          unnest(string_split(text, ' ')) AS tok,
          len(string_split(text, ' ')) AS n_orig
        FROM documents),
      flagged AS (
        SELECT doc_id, n_orig, pos, tok,
          (('0x' || substr(md5(doc_id::VARCHAR || '-' || pos::VARCHAR || '-aug'), 1, 15))::BIGINT)::DOUBLE
              / 1152921504606846976 >= 0.1 AS keep
        FROM ex)
      -- string_agg skips the CASE's NULLs, so a doc whose every token
      -- drops still emits a row (empty-string fingerprint), matching the
      -- Spark side's always-present filter result
      SELECT doc_id, CAST(any_value(n_orig) AS INT) AS n_orig,
        CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS INT) AS n_kept,
        ('0x' || substr(md5(coalesce(
          string_agg(CASE WHEN keep THEN tok END, ' ' ORDER BY pos), '')), 1, 15))::BIGINT
          AS aug_fingerprint
      FROM flagged GROUP BY doc_id"""))

  /** Approximate-operator METROLOGY inside the engine: q21's MinHash-LSH
    * candidate generation evaluated against exact SHINGLE-Jaccard ground
    * truth — TP/FP/FN, recall and precision as one query. This is how a
    * 100 TB pipeline certifies banding parameters before a full run:
    * truth by all-pairs on an ABSOLUTELY bounded deterministic sample —
    * the rate is derived from the corpus count to target ~100 docs at
    * ANY scale (proportional sampling would quietly turn the truth join
    * quadratic as the corpus grows; measured 41.7 s at sf0.1 before this
    * bound, 1-2 s after), candidates
    * by the production banding, both exact integers. The fixture has
    * almost no natural shingle-level near-dups, so the sample is AUGMENTED
    * with deterministic mutated twins (every 13th token dropped → planted
    * pairs at shingle-Jaccard ≈ 0.63, exactly the regime 4×4 banding is
    * supposed to catch about half of — the measured recall says whether
    * the parameters deliver). Truth is measured (all pairs ≥ 0.5), never
    * assumed from the planting. The twin recomputes the identical md5
    * minhash algebra. */
  private val q179 = Q(
    "q179_lsh_quality",
    (s, d) => {
      val M = 2147483647L
      def hexint(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast("long")
      val total = Tables.documents(s, d).agg(count(lit(1)).as("n_total"))
      val sampled = Tables.documents(s, d)
        .crossJoin(broadcast(total))
        .filter(graft.ops.Corpus.uniformHash(col("doc_id"), "lsh-eval") <
          least(lit(0.2), lit(100.0) / col("n_total")))
        .select(col("doc_id"), col("text"))
      val variants = sampled.select(
        (col("doc_id") + 1000000000L).as("doc_id"),
        array_join(filter(split(col("text"), " "),
          (_, i) => i % 13 =!= 0), " ").as("text"))
      val corpus = sampled.unionAll(variants)
      val toks = split(col("text"), " ")
      def shingleSet(tks: Column) = array_distinct(transform(
        sequence(lit(1), size(tks) - 2),
        i => concat_ws(" ", element_at(tks, i),
          element_at(tks, i + 1), element_at(tks, i + 2))))
      // exact ground truth: all pairs on the bounded corpus, shingle
      // Jaccard >= 0.5 (what MinHash actually estimates)
      val tokset = corpus.filter(size(toks) >= 3)
        .select(col("doc_id"), shingleSet(toks).as("ts"))
      val jac = size(array_intersect(col("a.ts"), col("b.ts"))).cast("double") /
        size(array_union(col("a.ts"), col("b.ts")))
      val truth = tokset.as("a").join(tokset.as("b"),
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          (jac >= 0.5).as("is_dup"))
      // production candidates: q21's 16-minhash / 4-band bucketing
      val shingleRows = corpus
        .select(col("doc_id"), toks.as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), explode(transform(
          sequence(lit(1), size(col("toks")) - 2),
          i => concat_ws(" ", element_at(col("toks"), i),
            element_at(col("toks"), i + 1), element_at(col("toks"), i + 2)))).as("sh"))
        .select(col("doc_id"), (hexint(col("sh")) % M).as("h"))
      val minCols = (0 until 16).map(seed =>
        min((col("h") * (seed * 2 + 1) + seed * 1000003L) % M).as(s"m$seed"))
      val banded = shingleRows.groupBy(col("doc_id"))
        .agg(minCols.head, minCols.tail: _*)
        .select(col("doc_id"), array((0 until 16).map(i => col(s"m$i")): _*).as("mh"))
        .select(col("doc_id"), explode(transform(sequence(lit(0), lit(3)), b => struct(
          b.as("band_id"),
          md5(array_join(transform(slice(col("mh"), b * 4 + 1, lit(4)),
            x => x.cast("string")), "|")).as("band_hash")))).as("band"))
        .select(col("doc_id"), col("band.band_id"), col("band.band_hash"))
      val cand = banded.groupBy(col("band_id"), col("band_hash"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) >= 2)
        .select(explode(flatten(transform(
          sequence(lit(1), size(col("ids")) - 1),
          i => transform(
            sequence(i + 1, size(col("ids"))),
            j => struct(
              element_at(col("ids"), i).as("doc_a"),
              element_at(col("ids"), j).as("doc_b")))))).as("p"))
        .select(col("p.doc_a"), col("p.doc_b")).distinct()
        .withColumn("is_cand", lit(true))
      truth.join(cand, Seq("doc_a", "doc_b"), "full_outer")
        .select(
          coalesce(col("is_dup"), lit(false)).as("is_dup"),
          coalesce(col("is_cand"), lit(false)).as("is_cand"))
        .agg(
          sum(when(col("is_dup") && col("is_cand"), 1L).otherwise(0L)).as("tp"),
          sum(when(!col("is_dup") && col("is_cand"), 1L).otherwise(0L)).as("fp"),
          sum(when(col("is_dup") && !col("is_cand"), 1L).otherwise(0L)).as("fn"))
        .select(col("tp"), col("fp"), col("fn"),
          r(col("tp").cast("double") /
            greatest(col("tp") + col("fn"), lit(1L)), 6).as("recall"),
          r(col("tp").cast("double") /
            greatest(col("tp") + col("fp"), lit(1L)), 6).as("precision"))
    },
    Some("""
      WITH sampled AS (
        SELECT doc_id, text FROM documents
        WHERE (('0x' || substr(md5(doc_id::VARCHAR || 'lsh-eval'), 1, 15))::BIGINT)::DOUBLE
              / 1152921504606846976
              < least(0.2, 100.0 / (SELECT count(*) FROM documents))),
      variants AS (
        SELECT doc_id + 1000000000 AS doc_id,
          array_to_string(list_filter(string_split(text, ' '),
            (x, i) -> (i - 1) % 13 <> 0), ' ') AS text
        FROM sampled),
      corpus AS (SELECT * FROM sampled UNION ALL SELECT * FROM variants),
      tokset AS (
        SELECT doc_id,
          list_distinct(list_transform(range(1, len(toks) - 1),
            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS ts
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus)
        WHERE len(toks) >= 3),
      truth AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          (len(list_intersect(a.ts, b.ts))::DOUBLE
           / len(list_distinct(list_concat(a.ts, b.ts)))) >= 0.5 AS is_dup
        FROM tokset a JOIN tokset b ON a.doc_id < b.doc_id),
      sh AS (
        SELECT doc_id, toks,
          list_transform(range(1, len(toks) - 1),
            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS shingles
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus)
        WHERE len(toks) >= 3),
      m AS (
        SELECT doc_id,
          list_transform(range(0, 16), seed ->
            list_min(list_transform(shingles, sg ->
              ((('0x' || substr(md5(sg), 1, 15))::BIGINT % 2147483647)
               * (seed*2 + 1) + seed*1000003) % 2147483647))) AS mh
        FROM sh),
      banded AS (
        SELECT doc_id, b.band_id,
          md5(array_to_string(list_transform(mh[b.band_id*4+1 : b.band_id*4+4],
            x -> x::VARCHAR), '|')) AS band_hash
        FROM m, (SELECT unnest([0,1,2,3]) AS band_id) b),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b, true AS is_cand
        FROM banded a JOIN banded b2
          ON a.band_id = b2.band_id AND a.band_hash = b2.band_hash
         AND a.doc_id < b2.doc_id),
      j AS (
        SELECT coalesce(t.is_dup, false) AS is_dup,
          coalesce(c.is_cand, false) AS is_cand
        FROM truth t FULL JOIN cand c
          ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b)
      SELECT
        CAST(sum(CASE WHEN is_dup AND is_cand THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        CAST(sum(CASE WHEN NOT is_dup AND is_cand THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        CAST(sum(CASE WHEN is_dup AND NOT is_cand THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        floor(sum(CASE WHEN is_dup AND is_cand THEN 1 ELSE 0 END)::DOUBLE
              / greatest(sum(CASE WHEN is_dup THEN 1 ELSE 0 END), 1)
              * 1000000 + 0.5) / 1000000 AS recall,
        floor(sum(CASE WHEN is_dup AND is_cand THEN 1 ELSE 0 END)::DOUBLE
              / greatest(sum(CASE WHEN is_cand THEN 1 ELSE 0 END), 1)
              * 1000000 + 0.5) / 1000000 AS precision
      FROM j"""))

  /** q89's exact equi-depth histogram WITHOUT the 3-task ceiling: the
    * sf3 probe measured q89 at 4.3× for 3× data because ntile's window
    * partitions by the 3-value returnflag — parallelism caps at 3 and
    * each task sorts n/3 rows. This form distributes the same total
    * order across a RANGE exchange (Corpus.globalIndex: many partitions,
    * each sorted locally, zipWithIndex offsets — no single-task sort),
    * then recovers ntile's exact remainder-first bucket assignment by
    * CLOSED-FORM integer arithmetic from (per-group index, group size):
    * first n%8 buckets get ⌈n/8⌉ rows, the rest ⌊n/8⌋, assigned in
    * order. Row-identical to q89 by construction — the oracle is the
    * SAME ntile SQL — so the scalable plan is proven, not argued. The
    * group-offset window runs over a 3-row aggregate (bounded). */
  private val q89b = Q(
    "q89b_equidepth_scalable",
    (s, d) => {
      import graft.ops.Corpus
      val base = Tables.lineitem(s, d).select(
        col("l_returnflag"), col("l_extendedprice"),
        col("l_orderkey"), col("l_linenumber"))
      val idxed = Corpus.globalIndex(base,
        Seq(col("l_returnflag"), col("l_extendedprice"),
          col("l_orderkey"), col("l_linenumber")),
        numPartitions = 16, indexName = "gidx")
      val offs = base.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("grp_n"))
        .withColumn("off", coalesce(
          sum(col("grp_n")).over(Window.orderBy(col("l_returnflag"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      idxed.join(broadcast(offs), Seq("l_returnflag"))
        .withColumn("idx", col("gidx") - col("off"))
        .withColumn("bucket", expr("""
          CAST(CASE WHEN idx < (grp_n % 8) * (grp_n DIV 8 + 1)
            THEN idx DIV (grp_n DIV 8 + 1)
            ELSE (grp_n % 8) + (idx - (grp_n % 8) * (grp_n DIV 8 + 1)) DIV (grp_n DIV 8)
          END + 1 AS INT)"""))
        .groupBy(col("l_returnflag"), col("bucket"))
        .agg(count(lit(1)).as("n"),
          r2(min(col("l_extendedprice"))).as("lo"),
          r2(max(col("l_extendedprice"))).as("hi"))
    },
    Some("""
      WITH b AS (
        SELECT l_returnflag, l_extendedprice,
          ntile(8) OVER (PARTITION BY l_returnflag
            ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS bucket
        FROM lineitem)
      SELECT l_returnflag, bucket, count(*) AS n,
        floor(min(l_extendedprice)*100 + 0.5)/100 AS lo,
        floor(max(l_extendedprice)*100 + 0.5)/100 AS hi
      FROM b GROUP BY 1, 2"""))

  /** Incremental aggregate maintenance: yesterday's per-key aggregate
    * state plus today's CDC rows produce today's aggregate WITHOUT
    * rescanning the base — the materialized-view maintenance identity
    * (agg_new = agg_old + Σinserts − Σdeletes per key) that makes daily
    * 100 TB rollups O(changes), not O(corpus). Old/new snapshots are
    * carved from orders by modulus so both real deletes and real inserts
    * exist; the ORACLE IS THE FULL RECOMPUTE over the new snapshot, so a
    * green row proves increment ≡ recompute exactly. Works for the
    * self-inverting aggregates (count, sum — exact BIGINT cents here);
    * min/max are NOT incrementally maintainable under deletes and are
    * deliberately absent (that is what the q154-style sketch partials or
    * a recompute handle). */
  private val q180 = Q(
    "q180_incremental_agg",
    (s, d) => {
      val orders = Tables.orders(s, d).select(
        col("o_orderkey"), col("o_orderpriority"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      val oldSnap = orders.filter(col("o_orderkey") % 3 =!= 0)
      val newSnap = orders.filter(col("o_orderkey") % 5 =!= 0)
      val oldAgg = oldSnap.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
      // CDC between the snapshots: rows leaving = deletes, arriving = inserts
      val deletes = oldSnap.join(newSnap.select(col("o_orderkey")),
        Seq("o_orderkey"), "left_anti")
      val inserts = newSnap.join(oldSnap.select(col("o_orderkey")),
        Seq("o_orderkey"), "left_anti")
      val delta = deletes.select(col("o_orderpriority"),
          lit(-1L).as("dn"), (-col("cents")).as("dc"))
        .unionAll(inserts.select(col("o_orderpriority"),
          lit(1L).as("dn"), col("cents").as("dc")))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("dn")).as("dn"), sum(col("dc")).as("dc"))
      oldAgg.join(delta, Seq("o_orderpriority"), "full_outer")
        .select(col("o_orderpriority"),
          (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_orders"),
          (coalesce(col("cents"), lit(0L)) + coalesce(col("dc"), lit(0L))).as("total_cents"))
        .filter(col("n_orders") > 0)
    },
    Some("""
      SELECT o_orderpriority,
        count(*) AS n_orders,
        CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
          AS total_cents
      FROM orders
      WHERE o_orderkey % 5 <> 0
      GROUP BY 1"""))

  /** Temporal (point-in-time) lookup against the q173 SCD2 history — the
    * CONSUMER side of versioning: each fact row joins the dimension
    * version that was valid AT ITS TIME (valid_from ≤ t < valid_to,
    * open-ended for current), the join feature stores call "time travel"
    * and ML pipelines need to avoid label leakage. The history is tiny
    * (versions × keys) so the interval predicate rides a broadcast; the
    * fact table never shuffles. Output: facts per (priority, version)
    * with the version's recorded state — proving each fact matched
    * exactly one version. */
  private val q181 = Q(
    "q181_temporal_lookup",
    (s, d) => {
      def snap(year: Int, dropPriority: String) = Tables.orders(s, d)
        .filter(col("o_orderdate") >= to_timestamp(lit(f"$year-01-01")) &&
          col("o_orderdate") < to_timestamp(lit(f"${year + 1}-01-01")) &&
          col("o_orderpriority") =!= dropPriority)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
      val history = Core.scd2(
        snap(1995, "5-LOW"), snap(1996, "1-URGENT"),
        keys = Seq("o_orderpriority"), compareCols = Seq("n_orders"),
        oldVersion = "1995", newVersion = "1996")
      val facts = Tables.orders(s, d)
        .filter(col("o_orderdate") >= to_timestamp(lit("1995-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1997-01-01")))
        .select(col("o_orderpriority"), year(col("o_orderdate")).cast("string").as("yr"))
      facts.as("f").join(broadcast(history.as("h")),
          col("f.o_orderpriority") === col("h.o_orderpriority") &&
            col("f.yr") >= col("h.valid_from") &&
            (col("h.valid_to").isNull || col("f.yr") < col("h.valid_to")))
        .groupBy(col("f.o_orderpriority").as("o_orderpriority"),
          col("h.valid_from").as("valid_from"),
          col("h.n_orders").as("version_state"))
        .agg(count(lit(1)).as("n_facts"))
    },
    Some("""
      WITH o AS (
        SELECT o_orderpriority, count(*) AS n_orders FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1996-01-01'
          AND o_orderpriority <> '5-LOW'
        GROUP BY 1),
      n AS (
        SELECT o_orderpriority, count(*) AS n_orders FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND o_orderpriority <> '1-URGENT'
        GROUP BY 1),
      j AS (
        SELECT coalesce(o.o_orderpriority, n.o_orderpriority) AS k,
          o.n_orders AS o_n, n.n_orders AS n_n,
          o.o_orderpriority IS NOT NULL AS has_o,
          n.o_orderpriority IS NOT NULL AS has_n,
          (o.n_orders IS DISTINCT FROM n.n_orders) AS chg
        FROM o FULL JOIN n ON o.o_orderpriority = n.o_orderpriority),
      history AS (
        SELECT k, o_n AS n_orders, '1995' AS valid_from, '1996' AS valid_to
        FROM j WHERE has_o AND (NOT has_n OR chg)
        UNION ALL
        SELECT k, o_n, '1995', NULL FROM j WHERE has_o AND has_n AND NOT chg
        UNION ALL
        SELECT k, n_n, '1996', NULL FROM j WHERE has_n AND (NOT has_o OR chg)),
      facts AS (
        SELECT o_orderpriority, CAST(year(o_orderdate) AS VARCHAR) AS yr
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01')
      SELECT f.o_orderpriority, h.valid_from,
        h.n_orders AS version_state, count(*) AS n_facts
      FROM facts f JOIN history h
        ON f.o_orderpriority = h.k
       AND f.yr >= h.valid_from
       AND (h.valid_to IS NULL OR f.yr < h.valid_to)
      GROUP BY 1, 2, 3"""))

  // ---------------------------------------------------------------- wiring

  val all: Seq[Q] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q14, q15, q16, q17, q18, q19, q20,
    q21, q22, q23, q24, q25, q26, q27, q28, q29, q30,
    q31, q31b, q32, q33, q34, q35, q36, q37, q38, q39, q40,
    q41, q42, q43, q44, q45, q46, q47, q48, q49, q50,
    q51, q52, q53, q54, q55, q56, q57, q58, q59, q60,
    q61, q62, q63, q64, q65, q66, q67, q68, q69, q70,
    q71, q72, q73, q74, q75, q76, q77, q78, q79, q80,
    q81, q82, q83, q84, q85, q86, q87, q88, q89, q90,
    q91, q92, q93, q94, q95, q96, q97, q98, q99, q100,
    q101, q102, q103, q104, q105, q106, q107, q108, q109, q110,
    q111, q112, q113, q114, q115, q116, q117, q118, q119, q120,
    q121, q122, q123, q124, q125, q126, q127, q128, q129, q130,
    q131, q132, q133, q134, q135, q136, q137, q137b, q138, q139, q140,
    q141, q142, q143, q144, q145, q146, q147, q148, q149, q150,
    q151, q152, q153, q154, q155, q156, q157, q158, q159, q160,
    q161, q162, q163, q164, q164b, q165, q166, q167, q168, q169, q170, q171,
    q172, q173, q174, q175, q176, q177, q178, q179, q180, q181, q89b)

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap
}
