package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.{RefFunctions => F}

/** The flight-price pipeline (SURVEY.md §3.3) as declarative Spark:
  * nested itinerary JSON → flattened rows (F16) → monthly-average join
  * (J3) → price scoring (F13) → airport/city/country enrichment
  * (F14/J4/J5). Korean column names are preserved exactly as the reference
  * emits them (_archive/flight_price_preprocessing.py:22-45,
  * flight_avg_merge.py:59-64).
  *
  * Scale notes: the ×2 explode is map-side; J3 shuffles only if the
  * monthly-average table outgrows the broadcast threshold; J4/J5 dims are
  * always broadcast.
  */
object Flights {

  /** F16 — flatten `itineraries[].sector.sectorSegments[]` into one row
    * per segment, with F15 is_discounted. `priceBeforeDiscount` is
    * optional in the API payload (flight_price_preprocessing.py:8-10
    * defaults it to price) — tolerate sources whose schema lacks the
    * field entirely, e.g. inferred reads over batches with no discounts.
    * Ref: _archive/flight_price_preprocessing.py:3-49. */
  def flatten(raw: DataFrame): DataFrame = {
    val priceSchema = raw.schema("itineraries").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
      .asInstanceOf[org.apache.spark.sql.types.StructType]("price").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val before =
      if (priceSchema.fieldNames.contains("priceBeforeDiscount"))
        col("it.price.priceBeforeDiscount")
      else lit(null).cast("double")
    raw
      .select(explode(col("itineraries")).as("it"))
      .select(
        col("it.price.amount").as("가격"),
        F.isDiscounted(col("it.price.amount"), before).as("할인여부"),
        explode(col("it.sector.sectorSegments")).as("seg"))
      .select(
        col("seg.segment.source.station.code").as("출발_공항_코드"),
        col("seg.segment.source.station.city.name").as("출발_도시_이름"),
        col("seg.segment.source.station.country.code").as("출발_국가_코드"),
        col("seg.segment.source.station.gps.lat").as("출발_위도"),
        col("seg.segment.source.station.gps.lng").as("출발_경도"),
        col("seg.segment.source.localTime").cast("timestamp").as("출발_시간"),
        col("seg.segment.destination.station.code").as("도착_공항_코드"),
        col("seg.segment.destination.station.city.name").as("도착_도시_이름"),
        col("seg.segment.destination.station.country.code").as("도착_국가_코드"),
        col("seg.segment.destination.station.gps.lat").as("도착_위도"),
        col("seg.segment.destination.station.gps.lng").as("도착_경도"),
        col("seg.segment.destination.localTime").cast("timestamp").as("도착_시간"),
        col("seg.segment.carrier.name").as("항공사_이름"),
        col("seg.segment.carrier.code").as("항공사_코드"),
        col("seg.segment.cabinClass").as("좌석_등급"),
        col("seg.segment.duration").as("비행시간_초"),
        col("가격"), col("할인여부"))
  }

  /** A4 — the monthly-average producer the reference consumes but does not
    * ship (flight_avg_merge.py:29-40 reads its output): per (city, month)
    * avg/min/max price. */
  def monthlyAvgPrices(flights: DataFrame): DataFrame =
    flights
      .withColumn("도착_월", month(col("도착_시간")))
      .groupBy(col("도착_공항_코드").as("city_code"), col("도착_월").as("month"))
      .agg(
        avg(col("가격")).as("avg_price"),
        min(col("가격")).as("min_price"),
        max(col("가격")).as("max_price"))

  /** J3 + F12/F13 — LEFT-join monthly averages on (arrival airport,
    * arrival month) and score the price delta.
    * Ref: flight_avg_merge.py:26-48. */
  def scoreAgainstAverage(flights: DataFrame, avgPrices: DataFrame): DataFrame = {
    val withMonth = flights.withColumn("도착_월", month(col("도착_시간")))
    val joined = withMonth.join(
      avgPrices,
      withMonth("도착_공항_코드") === avgPrices("city_code") &&
        withMonth("도착_월") === avgPrices("month"),
      "left")
    val diff = col("가격") - col("avg_price")
    joined
      .withColumn("평균가격", col("avg_price"))
      .withColumn("가격차이", diff)
      .withColumn("증감률(%)", F.round2(diff / col("avg_price") * 100))
      .withColumn("가격상태", F.priceState(col("가격차이")))
      .withColumn("점수", F.priceScore(col("가격차이")))
      .drop("city_code", "month", "avg_price", "min_price", "max_price")
  }

  /** F14 + J4 — explode the city-meta airport-code list
    * (`"['ICN','GMP']"` string form) and LEFT-join the 3-letter city code
    * onto flights by arrival airport. Ref: flight_avg_merge.py:91-106.
    * Rows missing airport_codes/final_city_code are dropped first (P8). */
  def joinCityCodes(flights: DataFrame, cityMeta: DataFrame): DataFrame = {
    val exploded = cityMeta
      .na.drop(Seq("airport_codes", "final_city_code"))
      .select(
        explode(F.cleanAirportCodes(col("airport_codes"))).as("공항코드"),
        col("final_city_code").as("도착_도시코드_3자리"))
    flights.join(broadcast(exploded), flights("도착_공항_코드") === exploded("공항코드"), "left")
      .drop("공항코드")
  }

  /** J5 — 2-letter → 3-letter country code map applied to both endpoints
    * (miss → null, matching pandas .map() NaN semantics).
    * Ref: flight_avg_merge.py:81-87,117-118. */
  def mapCountryCodes(flights: DataFrame, code2to3: Map[String, String]): DataFrame = {
    val m = typedlit(code2to3)
    flights
      .withColumn("도착_국가_3자리", element_at(m, col("도착_국가_코드")))
      .withColumn("출발_국가_3자리", element_at(m, col("출발_국가_코드")))
  }

  /** Full merge-stage pipeline (flight_avg_merge.py:5-125): flattened
    * flights → score vs monthly average → city codes → country codes. */
  def gold(
      flights: DataFrame,
      avgPrices: DataFrame,
      cityMeta: DataFrame,
      code2to3: Map[String, String]): DataFrame =
    mapCountryCodes(joinCityCodes(scoreAgainstAverage(flights, avgPrices), cityMeta), code2to3)
}
