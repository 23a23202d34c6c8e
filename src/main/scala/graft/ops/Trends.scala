package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{RefFunctions => F}

/** The Google-Trends pipeline (SURVEY.md §3.2) as declarative Spark:
  * long-form interest series → per-keyword window metrics (A1/A2) → raw
  * growth with the faithful asymmetric branches (F6) → processor scoring
  * chain (F7→F9) → country standardization (J2).
  *
  * Reference semantics preserved:
  *  - `data_sources/google_trends_crawler.py:71-96` — recent mean = last 15
  *    observations, previous mean = the 15 before, current interest = last
  *    value (NaN→0);
  *  - :82-92 vs :103-111 — keyword zero-prev growth explodes via the 1e-6
  *    epsilon, the ANCHOR zero-prev growth is 1.0 (asymmetric — preserved,
  *    not fixed);
  *  - `functions/google_trends_processor.py:187-223` — log-scale,
  *    normalize, 0.7/0.3 weighted clamp;
  *  - :140-160 — strip " 여행", left-join the standard country map,
  *    Unknown_* and N/A defaults on miss; anchor keyword special-cased.
  *
  * Scale notes: the queue-based 4+1 keyword fan-out of the reference is
  * control plane — Spark partitions the keyword dimension natively. One
  * shuffle for the keyword window, one broadcast join for the 739-row map.
  */
object Trends {

  val AnchorKeyword = "해외여행" // google_trends_processor.py:48-53

  /** A1/A2 — per-keyword window metrics over the long-form series
    * (date, keyword, interest). `isPartial` rows are dropped first (P4,
    * crawler :66-67). */
  def keywordMetrics(interest: DataFrame): DataFrame = {
    val cleaned =
      if (interest.columns.contains("is_partial")) interest.filter(!col("is_partial"))
      else interest
    val w = Window.partitionBy(col("keyword")).orderBy(col("date").desc)
    cleaned
      .withColumn("rn", row_number().over(w))
      .groupBy(col("keyword"))
      .agg(
        avg(when(col("rn") <= 15, col("interest"))).as("recent_mean"),
        avg(when(col("rn").between(16, 30), col("interest"))).as("prev_mean"),
        coalesce(max(when(col("rn") === 1, col("interest"))), lit(0)).as("current_interest"))
  }

  /** F6 — raw growth, keyword vs anchor branch chosen per row. */
  def withRawGrowth(metrics: DataFrame): DataFrame =
    metrics.withColumn("raw_growth",
      when(col("keyword") === AnchorKeyword,
        F.rawGrowthAnchor(col("recent_mean"), col("prev_mean")))
        .otherwise(F.rawGrowthKeyword(col("recent_mean"), col("prev_mean"))))

  /** J7 — attach the anchor keyword's growth/interest to every row as
    * columns (`anchor_growth`, `anchor_interest` in the gold record,
    * google_trends_processor.py:236-237). The anchor metrics row is a
    * single record → broadcast cross join, no shuffle. Null columns when
    * the batch carried no anchor rows (reference emits None then). */
  def withAnchorMetrics(growth: DataFrame): DataFrame = {
    // conditional aggregate, not filter+limit(1)+isEmpty: a global agg
    // always yields exactly one row (nulls when the batch carried no
    // anchor), so no driver-side action runs at plan-build time and the
    // pipeline is evaluated once per branch, never a third time
    val anchor = growth.agg(
      max(when(col("keyword") === AnchorKeyword, col("raw_growth")))
        .as("anchor_growth"),
      max(when(col("keyword") === AnchorKeyword, col("current_interest")))
        .as("anchor_interest"))
    growth.crossJoin(broadcast(anchor))
  }

  /** F7→F9 — the processor scoring chain. UNROUNDED, matching the
    * reference event literal exactly: unlike the exchange pipeline
    * (which rounds pct/score to 2, crawler :645-649), the trends
    * processor emits raw `scaled_raw_growth` and `final_trend_score`
    * (google_trends_processor.py:187-239 — no round anywhere). Consumers
    * needing fixed-precision output round at the sink. */
  def scored(growth: DataFrame): DataFrame = {
    val scaled = F.logScaleGrowth(col("raw_growth"))
    val norm = F.normalizeGrowth(scaled)
    growth
      .withColumn("scaled_raw_growth", scaled)
      .withColumn("final_trend_score",
        F.finalTrendScore(norm, col("current_interest")))
  }

  /** J2 — standardize keyword → country via the broadcast name map. The
    * stripped keyword is only the LOOKUP alias; the emitted
    * `country_korean_name` is the map value's canonical `korean_name`
    * (514/739 entries are aliases whose canonical differs from the key,
    * e.g. "Argentina" → "아르헨티나"); misses get the reference's
    * Unknown_Korean/Unknown_English/N/A defaults
    * (google_trends_processor.py:146-159). */
  def standardize(scored: DataFrame, standardMap: DataFrame): DataFrame =
    scored
      .withColumn("lookup_key", F.stripTravelSuffix(col("keyword")))
      .join(broadcast(standardMap), Seq("lookup_key"), "left")
      .withColumn("country_korean_name", coalesce(col("korean_name"), lit("Unknown_Korean")))
      .withColumn("country_english_name", coalesce(col("english_name"), lit("Unknown_English")))
      .withColumn("country_code_3", coalesce(col("country_code_3"), lit("N/A")))
      .withColumn("country_code_2", coalesce(col("country_code_2"), lit("N/A")))
      .drop("lookup_key", "korean_name", "english_name")
      .withColumn("dataType", lit("googleTrend"))

  /** Full pipeline: long-form interest + standard map → gold records with
    * the reference event literal's exact field names —
    * `trend_score_raw_growth` (0.0 when growth is undefined, mirroring
    * `raw_growth_val`'s pd.notna default) and
    * `trend_score_current_interest` — plus the J7 anchor columns and the
    * KST crawl timestamp (google_trends_processor.py:225-239; pass `asOf`
    * for deterministic golden runs). */
  def gold(
      interest: DataFrame,
      standardMap: DataFrame,
      asOf: Column = current_timestamp()): DataFrame =
    standardize(scored(withAnchorMetrics(withRawGrowth(keywordMetrics(interest)))), standardMap)
      .withColumn("trend_score_raw_growth", coalesce(col("raw_growth"), lit(0.0)))
      .drop("raw_growth")
      .withColumnRenamed("current_interest", "trend_score_current_interest")
      .withColumn("crawled_at_kst", RefFunctions.toKst(asOf))
}
