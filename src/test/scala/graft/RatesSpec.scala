package graft

import java.sql.Timestamp

import graft.ops.Rates

/** Exchange pipeline semantics on an authored bronze fixture
  * (FIXTURES.md B1/B2): EUR fan-out, drop-on-miss vs LEFT mode, pivot
  * keyed by country, monthly map, golden scores. */
class RatesSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2025-08-01 00:00:00")

  // (currency_code, rate_type, month_key, standard_rate)
  private def rates = Seq(
    ("USD", "realtime", null, 1380.5),
    ("USD", "daily_avg", null, 1375.0),
    ("USD", "monthly_avg", "202506", 1360.0),
    ("USD", "monthly_avg", "202507", 1370.0),
    ("USD", "yearly_avg", null, 1350.0),
    ("EUR", "realtime", null, 1500.0),
    ("EUR", "yearly_avg", null, 1450.0),
    ("XXX", "realtime", null, 42.0) // not in dim -> dropped in inner mode
  ).toDF("currency_code", "rate_type", "month_key", "standard_rate")
    .withColumn("crawled_at_utc", org.apache.spark.sql.functions.lit(t0))
    .withColumn("crawled_at_kst", org.apache.spark.sql.functions.lit(t0))

  // 1 USD country, 3 eurozone countries (the EUR fan-out, ref
  // exchage_rate_crawler.py:52-59 builds 17 at full config scale)
  private def dim = Seq(
    ("USD", "USA", "미국", "United States", "US", false),
    ("EUR", "DEU", "독일", "Germany", "DE", true),
    ("EUR", "FRA", "프랑스", "France", "FR", true),
    ("EUR", "ITA", "이탈리아", "Italy", "IT", true)
  ).toDF("currency_code", "country_code_3", "country_korean_name",
    "country_english_name", "country_code_2", "is_euro_zone")

  test("J1 inner mode: EUR fans out to every eurozone country, unknown dropped") {
    val e = Rates.enrich(rates, dim)
    // USD rows x1 country + EUR rows x3 countries; XXX gone
    assert(e.count() == 5 * 1 + 2 * 3)
    assert(e.filter($"currency_code" === "XXX").count() == 0)
  }

  test("J1 left mode keeps unmatched currencies (README.md:119 design)") {
    val e = Rates.enrich(rates, dim, "left")
    assert(e.filter($"currency_code" === "XXX").count() == 1)
  }

  test("gold left mode: every master country survives; currency-less gets score 0.0") {
    // JPY has no rate rows at all — the inner mode drops Japan, the
    // master-data coverage mode (README.md:119) keeps it with null rates
    val dimPlus = dim.union(Seq(("JPY", "JPN", "일본", "Japan", "JP", false))
      .toDF("currency_code", "country_code_3", "country_korean_name",
        "country_english_name", "country_code_2", "is_euro_zone"))
    assert(Rates.gold(rates, dimPlus).filter($"country_code_3" === "JPN").isEmpty)
    val cov = Rates.gold(rates, dimPlus, joinMode = "left")
    assert(cov.count() == dimPlus.count())
    val jpn = cov.filter($"country_code_3" === "JPN").head()
    assert(jpn.isNullAt(jpn.fieldIndex("realtime_rate")))
    assert(jpn.isNullAt(jpn.fieldIndex("exchange_rate_change_percent")))
    assert(jpn.getAs[Double]("exchange_rate_score") == 0.0)
    assert(jpn.getAs[String]("dataType") == "exchangeRate")
    // matched countries keep their inner-mode scores untouched
    val usa = cov.filter($"country_code_3" === "USA").head()
    assert(usa.getAs[Double]("realtime_rate") == 1380.5)
  }

  test("A3 pivot: one wide row per country, monthly map sorted") {
    val wide = Rates.pivotRates(Rates.enrich(rates, dim))
    assert(wide.count() == 4) // USA + 3 eurozone
    val usa = wide.filter($"country_code_3" === "USA").head()
    assert(usa.getAs[Double]("realtime_rate") == 1380.5)
    assert(usa.getAs[Double]("daily_avg_rate") == 1375.0)
    assert(usa.getAs[Double]("yearly_avg_rate") == 1350.0)
    val m = usa.getAs[Map[String, Double]]("monthly_avg_rates")
    assert(m == Map("202506" -> 1360.0, "202507" -> 1370.0))
    // every eurozone country carries the same EUR rates after fan-out
    val deu = wide.filter($"country_code_3" === "DEU").head()
    assert(deu.getAs[Double]("realtime_rate") == 1500.0)
    assert(deu.getAs[Boolean]("is_euro_zone"))
  }

  test("F3/F4 scores: golden values") {
    val gold = Rates.gold(rates, dim)
    val usa = gold.filter($"country_code_3" === "USA").head()
    // pct = (1380.5-1350)/1350*100 = 2.2593 -> 2.26; score=(10-2.2593)/20*100=38.70
    assert(usa.getAs[Double]("exchange_rate_change_percent") == 2.26)
    assert(usa.getAs[Double]("exchange_rate_score") == 38.7)
    assert(usa.getAs[String]("dataType") == "exchangeRate")
    // countries with no yearly_avg -> pct null -> score 0.0: not in this
    // fixture; EUR has both -> check too
    val fra = gold.filter($"country_code_3" === "FRA").head()
    assert(fra.getAs[Double]("exchange_rate_change_percent") == 3.45)
  }
}
