package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's scalar semantics (SURVEY.md §2.8 F1–F21) as pure Catalyst
  * column functions — zero UDFs, so every one stays inside whole-stage
  * codegen. Each function cites the reference behavior it preserves
  * (file:line into `/root/reference/`). The deliberately-odd branches
  * (epsilon blow-up, dead 50.0 branch, `"-"`→0.0) are preserved, not fixed;
  * unit tests in `RefFunctionsSpec` pin them.
  */
object RefFunctions {

  /** F1 — comma-strip + float cast; `""`/`"-"` → 0.0 (not null).
    * Ref: data_sources/exchage_rate_crawler.py:214-254. */
  def cleanRate(c: Column): Column =
    when(trim(c).isin("", "-"), lit(0.0))
      .otherwise(regexp_replace(c, ",", "").cast("double"))

  /** F2 — currency-code token extract: `"미국 USD"` → `USD`, strip `(100)`/`(10)`
    * denominations. Ref: exchage_rate_crawler.py:202-211. */
  def currencyCode(c: Column): Column =
    trim(regexp_replace(element_at(split(trim(c), "\\s+"), -1), "\\((100|10)\\)", ""))

  /** F3 — change percent vs yearly average; null unless both inputs present
    * and yearly > 0. Ref: exchage_rate_crawler.py:611-619. */
  def changePercent(realtime: Column, yearly: Column): Column =
    when(realtime.isNotNull && yearly.isNotNull && yearly > 0,
      (realtime - yearly) / yearly * 100)

  /** F4 — exchange-rate score: `clamp(((10 - pct) / 20) * 100, 0, 100)`;
    * 0.0 when pct is missing. (The reference's `range <= 0 → 50.0` branch at
    * :634-636 is dead code — MAX=+10, MIN=-10 are literals — so it can never
    * fire; we preserve the live semantics.)
    * Ref: exchage_rate_crawler.py:621-642. */
  def exchangeRateScore(pct: Column): Column =
    when(pct.isNull, lit(0.0))
      .otherwise(least(lit(100.0), greatest(lit(0.0), (lit(10.0) - pct) / lit(20.0) * 100)))

  /** F5 — round(2) exactly where the reference rounds.
    * Ref: exchage_rate_crawler.py:644-649; _archive/flight_avg_merge.py:46. */
  def round2(c: Column): Column = round(c, 2)

  /** F6 (keyword variant) — raw growth with the epsilon blow-up branch:
    * prev>0 → (recent-prev)/prev; else recent>0 → recent/1e-6; else 0.0.
    * Ref: data_sources/google_trends_crawler.py:82-92. */
  def rawGrowthKeyword(recent: Column, prev: Column): Column =
    when(prev.isNotNull && prev > 0, (recent - prev) / prev)
      .when(recent.isNotNull && recent > 0, recent / lit(1e-6))
      .otherwise(lit(0.0))

  /** F6 (anchor variant) — ASYMMETRIC: the zero-prev branch yields 1.0, not
    * the epsilon blow-up. Ref: google_trends_crawler.py:103-111. */
  def rawGrowthAnchor(recent: Column, prev: Column): Column =
    when(prev.isNotNull && prev > 0, (recent - prev) / prev)
      .when(recent.isNotNull && recent > 0, lit(1.0))
      .otherwise(lit(0.0))

  /** F7 — log-scale growth: x>0 → log10(1+x); x<0 → x; else 0.0.
    * Ref: functions/google_trends_processor.py:187-194. */
  def logScaleGrowth(g: Column): Column =
    when(g > 0, log10(lit(1.0) + g)).when(g < 0, g).otherwise(lit(0.0))

  /** F8 — normalize growth: s>0 → min(s/10*100, 100); else 0.0.
    * Ref: google_trends_processor.py:200-217. */
  def normalizeGrowth(s: Column): Column =
    when(s > 0, least(s / 10 * 100, lit(100.0))).otherwise(lit(0.0))

  /** F9 — final trend score: clamp(0.7*normGrowth + 0.3*interest, 0, 100).
    * Ref: google_trends_processor.py:196-223. */
  def finalTrendScore(normGrowth: Column, interest: Column): Column =
    least(lit(100.0), greatest(lit(0.0), normGrowth * 0.7 + interest * 0.3))

  /** F11 — keyword → country-name strip: remove `" 여행"` suffix.
    * Ref: google_trends_processor.py:141-144. */
  def stripTravelSuffix(keyword: Column): Column =
    regexp_replace(keyword, " 여행$", "")

  /** F13 — price delta/pct/state/sign-score. `diff>0 → 상승/-1` (pricier than
    * average is bad), `diff<0 → 하락/+1`, `else 동일/0`.
    * Ref: _archive/flight_avg_merge.py:45-48. */
  def priceState(diff: Column): Column =
    when(diff > 0, lit("상승")).when(diff < 0, lit("하락")).otherwise(lit("동일"))
  def priceScore(diff: Column): Column =
    when(diff > 0, lit(-1)).when(diff < 0, lit(1)).otherwise(lit(0)).cast("int")

  /** F14 — airport-list cleanup + split: `"['ICN','GMP']"` → rows.
    * Ref: flight_avg_merge.py:94-98. Explode at the call-site. */
  def cleanAirportCodes(c: Column): Column =
    split(regexp_replace(c, "[\\[\\]' ]", ""), ",")

  /** F15 — is_discounted: price != coalesce(priceBeforeDiscount, price).
    * Ref: _archive/flight_price_preprocessing.py:8-10. */
  def isDiscounted(price: Column, before: Column): Column =
    coalesce(before, price) =!= price

  /** F21 — month-key string `"YYYYMM"`. Ref: exchage_rate_crawler.py:548. */
  def monthKey(d: Column): Column = date_format(d, "yyyyMM")

  /** F17 — calendar helpers (exchage_rate_crawler.py:75-103). */
  def firstDayOfYear(d: Column): Column = trunc(d, "year")
  def firstDayOfMonth(d: Column): Column = trunc(d, "month")
  def lastDayOfMonth(d: Column): Column = last_day(d)
  def yyyymmdd(d: Column): Column = date_format(d, "yyyyMMdd")

  /** F18 — ISO-8601 timestamps, UTC + KST pair (exchage_rate_crawler.py:
    * 256-264; KST = UTC+9, _archive/function_app.py:86). Session timezone
    * is UTC, so the KST twin is an explicit zone shift. */
  def toKst(utc: Column): Column = from_utc_timestamp(utc, "Asia/Seoul")
  def isoTimestamp(t: Column): Column =
    date_format(t, "yyyy-MM-dd'T'HH:mm:ss")

  /** Generic clamp used by F4/F9-style scores. */
  def clamp(c: Column, lo: Double, hi: Double): Column =
    least(lit(hi), greatest(lit(lo), c))
}
