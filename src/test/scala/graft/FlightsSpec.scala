package graft

/** Flight pipeline on an authored nested fixture (FIXTURES.md B5/B6):
  * double explode, discount flag, monthly-average producer+join, price
  * scoring, airport-list explode, country-code map. */
class FlightsSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Flights

  // Nested itinerary JSON in the reference's shape
  // (_archive/flight_price_preprocessing.py:4-46): one discounted
  // single-segment itinerary + one two-segment itinerary.
  private val rawJson = Seq(
    """{"itineraries": [
      {"price": {"amount": 450000.0, "priceBeforeDiscount": 500000.0},
       "sector": {"sectorSegments": [
         {"segment": {
            "source": {"station": {"code": "ICN", "city": {"name": "Seoul", "legacyId": 1},
                       "country": {"code": "KR"}, "gps": {"lat": 37.46, "lng": 126.44}},
                       "localTime": "2025-08-10T10:00:00"},
            "destination": {"station": {"code": "KIX", "city": {"name": "Osaka", "legacyId": 2},
                       "country": {"code": "JP"}, "gps": {"lat": 34.43, "lng": 135.23}},
                       "localTime": "2025-08-10T12:00:00"},
            "carrier": {"name": "AirTest", "code": "AT"},
            "cabinClass": "ECONOMY", "duration": 7200}}]}},
      {"price": {"amount": 800000.0},
       "sector": {"sectorSegments": [
         {"segment": {
            "source": {"station": {"code": "ICN", "city": {"name": "Seoul", "legacyId": 1},
                       "country": {"code": "KR"}, "gps": {"lat": 37.46, "lng": 126.44}},
                       "localTime": "2025-09-01T09:00:00"},
            "destination": {"station": {"code": "BKK", "city": {"name": "Bangkok", "legacyId": 3},
                       "country": {"code": "TH"}, "gps": {"lat": 13.69, "lng": 100.75}},
                       "localTime": "2025-09-01T13:00:00"},
            "carrier": {"name": "AirTest", "code": "AT"},
            "cabinClass": "ECONOMY", "duration": 14400}},
         {"segment": {
            "source": {"station": {"code": "BKK", "city": {"name": "Bangkok", "legacyId": 3},
                       "country": {"code": "TH"}, "gps": {"lat": 13.69, "lng": 100.75}},
                       "localTime": "2025-09-01T15:00:00"},
            "destination": {"station": {"code": "HKT", "city": {"name": "Phuket", "legacyId": 4},
                       "country": {"code": "TH"}, "gps": {"lat": 8.11, "lng": 98.31}},
                       "localTime": "2025-09-01T16:30:00"},
            "carrier": {"name": "AirTest", "code": "AT"},
            "cabinClass": "ECONOMY", "duration": 5400}}]}}]}"""
  )

  private def raw = spark.read.json(rawJson.toDS())
  private def flights = Flights.flatten(raw)

  test("F16 flatten: one row per segment, Korean columns, discount flag") {
    assert(flights.count() == 3) // 1 + 2 segments
    assert(flights.columns.contains("출발_공항_코드"))
    val kix = flights.filter($"도착_공항_코드" === "KIX").head()
    assert(kix.getAs[Boolean]("할인여부")) // 450000 != 500000
    assert(kix.getAs[Double]("가격") == 450000.0)
    val bkk = flights.filter($"도착_공항_코드" === "BKK").head()
    assert(!bkk.getAs[Boolean]("할인여부")) // priceBeforeDiscount absent
  }

  test("A4+J3+F13: monthly average join and price scoring") {
    // avg table: KIX august avg 500000 -> diff -50000 -> 하락 / +1
    val avg = Seq(("KIX", 8, 500000.0, 400000.0, 600000.0))
      .toDF("city_code", "month", "avg_price", "min_price", "max_price")
    val scored = Flights.scoreAgainstAverage(flights, avg)
    assert(scored.count() == 3) // LEFT join preserves facts
    val kix = scored.filter($"도착_공항_코드" === "KIX").head()
    assert(kix.getAs[Double]("가격차이") == -50000.0)
    assert(kix.getAs[Double]("증감률(%)") == -10.0)
    assert(kix.getAs[String]("가격상태") == "하락")
    assert(kix.getAs[Int]("점수") == 1)
    // unmatched rows keep null avg -> 동일/0 branch takes otherwise-path
    val bkk = scored.filter($"도착_공항_코드" === "BKK").head()
    assert(bkk.getAs[String]("가격상태") == "동일")
  }

  test("A4 producer: monthlyAvgPrices aggregates per (city, month)") {
    val avg = Flights.monthlyAvgPrices(flights)
    val th = avg.filter($"city_code" === "BKK").head()
    assert(th.getAs[Double]("avg_price") == 800000.0)
  }

  test("F14+J4: airport-code list explode and city-code join") {
    val meta = Seq(
      ("['KIX','ITM']", "OSA"),
      ("['BKK']", "BKK"),
      (null, "XXX") // dropna path (flight_avg_merge.py:95)
    ).toDF("airport_codes", "final_city_code")
    val joined = Flights.joinCityCodes(flights, meta)
    assert(joined.count() == 3)
    val kix = joined.filter($"도착_공항_코드" === "KIX").head()
    assert(kix.getAs[String]("도착_도시코드_3자리") == "OSA")
    val hkt = joined.filter($"도착_공항_코드" === "HKT").head()
    assert(hkt.isNullAt(hkt.fieldIndex("도착_도시코드_3자리"))) // miss -> null
  }

  test("J5: 2-to-3-letter country map, miss stays null") {
    val mapped = Flights.mapCountryCodes(flights, Map("KR" -> "KOR", "JP" -> "JPN"))
    val kix = mapped.filter($"도착_공항_코드" === "KIX").head()
    assert(kix.getAs[String]("출발_국가_3자리") == "KOR")
    assert(kix.getAs[String]("도착_국가_3자리") == "JPN")
    val bkk = mapped.filter($"도착_공항_코드" === "BKK").head()
    assert(bkk.isNullAt(bkk.fieldIndex("도착_국가_3자리"))) // TH unmapped
  }
}
