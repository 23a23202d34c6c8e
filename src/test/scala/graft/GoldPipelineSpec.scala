package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._

import graft.ops.{Flights, Gold, Rates, Trends}

/** Golden end-to-end (SURVEY §5.4): the three reference pipelines run on
  * their bronze fixtures and feed the J6 master-dim attractiveness join —
  * the daily batch README.md:84-85 describes. Asserts the LEFT-join
  * coverage guarantee (README.md:119): every master country appears in the
  * output even when a source has no data for it. */
class GoldPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2025-08-01 00:00:00")

  test("EUR fan-out: one EUR rate set reaches all 17 eurozone countries") {
    // the bundled master dim is the reference's verbatim 59-country config
    // (EUR appears 17 times); q37's oracle twin hash-checks the values,
    // this pins the fan-out shape itself
    val gold = Rates.gold(
      graft.sources.Fixtures.ratesRaw(spark),
      graft.sources.Fixtures.countryMaster(spark))
    val eur = gold.filter(col("currency_code") === "EUR")
    assert(eur.count() == 17)
    assert(eur.select("is_euro_zone").distinct().collect()
      .map(_.getBoolean(0)).toSeq == Seq(true))
    // unknown currency XXX dropped by the inner join (crawler :363-367)
    assert(gold.filter(col("currency_code") === "XXX").isEmpty)
  }

  test("739-entry standard map joins 1:1 — no alias-dup fan-out") {
    val gold = Trends.gold(
      graft.sources.Fixtures.trendsInterest(spark),
      graft.sources.Fixtures.standardMap(spark))
    assert(gold.count() == 9) // one row per fixture keyword
    val mars = gold.filter(col("keyword") === "화성 여행").head()
    assert(mars.getAs[String]("country_english_name") == "Unknown_English")
    assert(mars.getAs[Double]("trend_score_raw_growth") > 1e6) // epsilon blow-up
    // the planted alias keyword resolves to the canonical korean_name
    val alias = gold.filter(col("keyword") === "Japan 여행").head()
    assert(alias.getAs[String]("country_korean_name") == "일본")
  }

  test("three pipelines -> J6 gold join keeps full master coverage") {
    // --- exchange pipeline (USA has data; JPN deliberately missing)
    val rates = Seq(
      ("USD", "realtime", null, 1380.5),
      ("USD", "yearly_avg", null, 1350.0)
    ).toDF("currency_code", "rate_type", "month_key", "standard_rate")
      .withColumn("crawled_at_utc", lit(t0))
      .withColumn("crawled_at_kst", lit(t0))
    val countryDim = Seq(
      ("USD", "USA", "미국", "United States", "US", false),
      ("JPY", "JPN", "일본", "Japan", "JP", false)
    ).toDF("currency_code", "country_code_3", "country_korean_name",
      "country_english_name", "country_code_2", "is_euro_zone")
    val fxGold = Rates.gold(rates, countryDim)
      .select(col("country_code_3"), col("exchange_rate_score"))

    // --- trends pipeline (JPN has data; USA missing)
    val interest = (0 until 30).map { i =>
      (Date.valueOf(java.time.LocalDate.of(2025, 6, 1).plusDays(i)),
        "일본 여행", if (i < 15) 10 else 20, false)
    }.toDF("date", "keyword", "interest", "is_partial")
    val stdMap = Seq(("일본", "일본", "Japan", "JPN", "JP"))
      .toDF("lookup_key", "korean_name", "english_name", "country_code_3", "country_code_2")
    val trendGold = Trends.gold(interest, stdMap)
      .select(col("country_code_3"), col("final_trend_score"))

    // --- flight pipeline (arrivals in JPN only)
    val raw = spark.read.json(Seq(
      """{"itineraries": [{"price": {"amount": 450000.0},
           "sector": {"sectorSegments": [{"segment": {
             "source": {"station": {"code": "ICN", "city": {"name": "Seoul", "legacyId": 1},
               "country": {"code": "KR"}, "gps": {"lat": 37.4, "lng": 126.4}},
               "localTime": "2025-08-10T10:00:00"},
             "destination": {"station": {"code": "KIX", "city": {"name": "Osaka", "legacyId": 2},
               "country": {"code": "JP"}, "gps": {"lat": 34.4, "lng": 135.2}},
               "localTime": "2025-08-10T12:00:00"},
             "carrier": {"name": "AirTest", "code": "AT"},
             "cabinClass": "ECONOMY", "duration": 7200}}]}}]}""").toDS())
    val flights = Flights.flatten(raw)
    val avgPrices = Seq(("KIX", 8, 500000.0, 400000.0, 600000.0))
      .toDF("city_code", "month", "avg_price", "min_price", "max_price")
    val scored = Flights.mapCountryCodes(
      Flights.scoreAgainstAverage(flights, avgPrices), Map("JP" -> "JPN", "KR" -> "KOR"))
    // country-level flight score: mean of the -1/0/1 sign scores, scaled 0-100
    val flightGold = scored.groupBy(col("도착_국가_3자리").as("country_code_3"))
      .agg(((avg(col("점수")) + 1) * 50).as("flight_score"))

    // --- J6: master LEFT joins all three
    val master = countryDim.select(col("country_code_3"), col("country_english_name"))
    val gold = Gold.attractiveness(master, "country_code_3", Seq(
      (fxGold, "exchange_rate_score", 0.4),
      (trendGold, "final_trend_score", 0.4),
      (flightGold, "flight_score", 0.2)))

    val rows = gold.collect().map(r =>
      r.getAs[String]("country_code_3") -> r.getAs[Double]("attractiveness_score")).toMap
    // full coverage: both master countries present despite partial sources
    assert(rows.keySet == Set("USA", "JPN"))
    // USA: only fx (38.70*0.4 = 15.48); JPN: trend 73.5ish*0.4 + flight 100*0.2
    assert(rows("USA") == 15.48)
    val jpnTrend = Trends.gold(interest, stdMap)
      .select(col("final_trend_score")).as[Double].head()
    val expectedJpn = math.floor((jpnTrend * 0.4 + 100.0 * 0.2) * 100 + 0.5) / 100
    assert(math.abs(rows("JPN") - expectedJpn) < 0.011)
    assert(rows.values.forall(s => s >= 0 && s <= 100))
  }
}
