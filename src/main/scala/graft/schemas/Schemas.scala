package graft.schemas

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}

/** Typed gold-record boundaries (SURVEY.md §1.2: case classes +
  * `Dataset[T]` at API edges for compile-time field checks; untyped
  * `DataFrame` internally where Catalyst optimizes best).
  *
  * Field sets mirror the reference's record literals:
  *  - exchange: exchage_rate_crawler.py:388-404 + scores :644-649
  *  - trend:    google_trends_processor.py:225-239
  */
object Schemas {

  case class ExchangeRateGold(
      dataType: String,
      currency_code: String,
      country_korean_name: String,
      country_english_name: String,
      country_code_2: String,
      country_code_3: String,
      is_euro_zone: Boolean,
      realtime_rate: Option[Double],
      realtime_crawled_at_utc: Option[Timestamp],
      realtime_crawled_at_kst: Option[Timestamp],
      daily_avg_rate: Option[Double],
      monthly_avg_rates: Map[String, Double],
      yearly_avg_rate: Option[Double],
      exchange_rate_change_percent: Option[Double],
      exchange_rate_score: Double)

  case class GoogleTrendGold(
      dataType: String,
      keyword: String,
      country_korean_name: String,
      country_english_name: String,
      country_code_3: String,
      country_code_2: String,
      final_trend_score: Double,
      trend_score_raw_growth: Double,
      scaled_raw_growth: Double,
      trend_score_current_interest: Int,
      anchor_growth: Option[Double],
      anchor_interest: Option[Int],
      crawled_at_kst: Timestamp)

  implicit val exchangeEncoder: Encoder[ExchangeRateGold] = Encoders.product
  implicit val trendEncoder: Encoder[GoogleTrendGold] = Encoders.product

  /** Typed view of `Rates.gold` output. Fails analysis (not at runtime
    * mid-job) if the pipeline stops producing a declared field. */
  def asExchangeGold(df: DataFrame): Dataset[ExchangeRateGold] = {
    val cols = exchangeEncoder.schema.fieldNames.map(df.col)
    df.select(cols.toIndexedSeq: _*).as[ExchangeRateGold]
  }

  def asTrendGold(df: DataFrame): Dataset[GoogleTrendGold] = {
    val cols = trendEncoder.schema.fieldNames.map(df.col)
    df.select(cols.toIndexedSeq: _*).as[GoogleTrendGold]
  }
}
