package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.{RefFunctions => F}

/** The exchange-rate pipeline (SURVEY.md §3.1) as declarative Spark:
  * bronze scraped-rate rows → dim-enriched (J1 fan-out) → wide gold record
  * (A3 pivot) → scored (F3/F4/F5).
  *
  * Reference semantics preserved from
  * `data_sources/exchage_rate_crawler.py`:
  *  - :338-347  currency→countries reverse index = broadcast hash join,
  *    one rate row fans out to every country using that currency (EUR → all
  *    eurozone members);
  *  - :363-376  unknown currencies are dropped (inner semantics) — the
  *    README.md:119 "90% data loss" pitfall; `joinMode="left"` keeps the
  *    LEFT-join master-data design;
  *  - :386-426  dict-upsert pivot = conditional aggregation keyed by
  *    country (NOT currency — grouping by country is what makes the EUR
  *    fan-out survive the pivot);
  *  - :611-649  change-percent + clamped 0-100 score, round(2).
  *
  * Scale notes (100 TB): the dim is 59 rows — always broadcast; the pivot
  * is one partial+final HashAggregate shuffle on country_code_3; everything
  * else is map-side. Bronze should be partitioned by rate_type/dt for
  * partition pruning (SURVEY §4).
  */
object Rates {

  /** Expected bronze schema (FIXTURES.md B1): currency_code, rate_type
    * (realtime|daily_avg|monthly_avg|yearly_avg), month_key (yyyyMM, only
    * monthly_avg), buy/sell/send/receive/standard_rate, crawled_at_utc/kst. */

  /** J1 — enrich each rate row with every country using its currency.
    * `joinMode`: "inner" = reference drop-on-miss (:363-376);
    * "left" = keep-unmatched (README.md:119 master-data design). */
  def enrich(rates: DataFrame, countryDim: DataFrame, joinMode: String = "inner"): DataFrame =
    rates.join(broadcast(countryDim), Seq("currency_code"), joinMode)

  /** A3 — pivot the four rate granularities into one wide record per
    * country. monthly_avg_rates is a yyyyMM→rate map with sorted keys
    * (deterministic for golden compares; ref builds it incrementally at
    * :417-420). */
  def pivotRates(enriched: DataFrame): DataFrame = {
    def slot(t: String) = max(when(col("rate_type") === t, col("standard_rate")))
    enriched
      .groupBy(col("country_code_3"))
      .agg(
        first(col("currency_code"), ignoreNulls = true).as("currency_code"),
        first(col("country_korean_name"), ignoreNulls = true).as("country_korean_name"),
        first(col("country_english_name"), ignoreNulls = true).as("country_english_name"),
        first(col("country_code_2"), ignoreNulls = true).as("country_code_2"),
        first(col("is_euro_zone"), ignoreNulls = true).as("is_euro_zone"),
        slot("realtime").as("realtime_rate"),
        max(when(col("rate_type") === "realtime", col("crawled_at_utc"))).as("realtime_crawled_at_utc"),
        max(when(col("rate_type") === "realtime", col("crawled_at_kst"))).as("realtime_crawled_at_kst"),
        slot("daily_avg").as("daily_avg_rate"),
        map_from_entries(array_sort(collect_list(
          when(col("rate_type") === "monthly_avg" && col("month_key").isNotNull,
            struct(col("month_key"), col("standard_rate")))))).as("monthly_avg_rates"),
        slot("yearly_avg").as("yearly_avg_rate"))
  }

  /** F3/F4/F5 — change percent vs yearly average and the clamped score;
    * dataType discriminator per exchage_rate_crawler.py:389. */
  def score(wide: DataFrame): DataFrame = {
    val pct = F.changePercent(col("realtime_rate"), col("yearly_avg_rate"))
    wide
      .withColumn("dataType", lit("exchangeRate"))
      .withColumn("exchange_rate_change_percent", F.round2(pct))
      .withColumn("exchange_rate_score", F.round2(F.exchangeRateScore(pct)))
  }

  /** Full pipeline: bronze rates + country dim → scored gold records.
    *
    * `joinMode="inner"` drops countries whose currency never scraped
    * (crawler :363-376 semantics). `joinMode="left"` is the master-data
    * coverage design (README.md:119 — "90% discarded → 100% analyzable"):
    * EVERY master country survives; currency-less countries carry null
    * rates, null change-percent, and score 0.0 (the reference's
    * cannot-compute default, :642). Scale shape: the scored inner result
    * is ≤1 row per country, so the coverage join broadcasts it against
    * the master dim — no extra shuffle at any SF. */
  def gold(rates: DataFrame, countryDim: DataFrame, joinMode: String = "inner"): DataFrame = {
    // validate eagerly: a misspelled mode silently falling back to inner
    // would reintroduce the exact coverage loss the left mode prevents
    val isLeft = Set("left", "leftouter", "left_outer").contains(joinMode.toLowerCase)
    require(isLeft || joinMode.equalsIgnoreCase("inner"),
      s"joinMode must be inner or left, got $joinMode")
    val inner = score(pivotRates(enrich(rates, countryDim, "inner")))
    if (!isLeft) inner
    else {
      val rateCols = Seq(
        "realtime_rate", "realtime_crawled_at_utc", "realtime_crawled_at_kst",
        "daily_avg_rate", "monthly_avg_rates", "yearly_avg_rate",
        "exchange_rate_change_percent", "exchange_rate_score")
      countryDim
        .join(
          broadcast(inner.select(col("country_code_3") +: rateCols.map(col): _*)),
          Seq("country_code_3"), "left")
        .withColumn("exchange_rate_score", coalesce(col("exchange_rate_score"), lit(0.0)))
        .withColumn("dataType", lit("exchangeRate"))
    }
  }
}
