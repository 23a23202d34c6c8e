package graft

import org.apache.spark.sql.functions._

import graft.ops.{RefFunctions => F}

/** Pins the reference's deliberately-odd scalar semantics (SURVEY.md §7.4.1)
  * so nobody "fixes" them later. */
class RefFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("F1 cleanRate: comma strip, '' and '-' to 0.0 (not null)") {
    val got = Seq("1,234.56", "-", "", " - ", "7.5").toDF("raw")
      .select(F.cleanRate($"raw").as("v")).as[Double].collect()
    assert(got.toSeq == Seq(1234.56, 0.0, 0.0, 0.0, 7.5))
  }

  test("F2 currencyCode: token extract + denomination strip") {
    val got = Seq("미국 USD", "일본 JPY(100)", "베트남 VND(10)").toDF("raw")
      .select(F.currencyCode($"raw").as("c")).as[String].collect()
    assert(got.toSeq == Seq("USD", "JPY", "VND"))
  }

  test("F3/F4: change percent gating and clamped score") {
    val df = Seq(
      (1300.0, 1200.0),  // +8.33% -> score ~8.33
      (1000.0, 0.0),     // yearly=0 -> pct null -> score 0.0
      (900.0, 1200.0)    // -25% -> (10-(-25))/20*100 = 175 -> clamp 100
    ).toDF("realtime", "yearly")
    val got = df.select(
      F.round2(F.changePercent($"realtime", $"yearly")).as("pct"),
      F.round2(F.exchangeRateScore(F.changePercent($"realtime", $"yearly"))).as("score"))
      .collect()
    assert(got(0).getDouble(0) == 8.33 && got(0).getDouble(1) == 8.33)
    assert(got(1).isNullAt(0) && got(1).getDouble(1) == 0.0)
    assert(got(2).getDouble(0) == -25.0 && got(2).getDouble(1) == 100.0)
  }

  test("F6 asymmetry: keyword epsilon blow-up vs anchor 1.0") {
    val df = Seq((50.0, 0.0)).toDF("recent", "prev")
    val kw = df.select(F.rawGrowthKeyword($"recent", $"prev")).as[Double].head()
    val an = df.select(F.rawGrowthAnchor($"recent", $"prev")).as[Double].head()
    assert(kw == 50.0 / 1e-6) // google_trends_crawler.py:88-92
    assert(an == 1.0)         // google_trends_crawler.py:108-111
  }

  test("F6: both-zero yields 0.0; normal growth is relative delta") {
    val df = Seq((0.0, 0.0), (30.0, 20.0)).toDF("recent", "prev")
    val got = df.select(F.rawGrowthKeyword($"recent", $"prev")).as[Double].collect()
    assert(got(0) == 0.0 && math.abs(got(1) - 0.5) < 1e-12)
  }

  test("F7 logScaleGrowth branches") {
    val got = Seq(9.0, -3.0, 0.0).toDF("g")
      .select(F.logScaleGrowth($"g")).as[Double].collect()
    assert(got(0) == 1.0 && got(1) == -3.0 && got(2) == 0.0)
  }

  test("F8/F9: normalize cap and weighted clamp") {
    val got = Seq((20.0, 50.0)).toDF("s", "interest")
      .select(F.finalTrendScore(F.normalizeGrowth($"s"), $"interest")).as[Double].head()
    assert(got == 85.0) // norm=min(200,100)=100 -> 0.7*100 + 0.3*50
  }

  test("F13: price state and sign score mapping") {
    val df = Seq(5.0, -5.0, 0.0).toDF("diff")
    val got = df.select(F.priceState($"diff").as("s"), F.priceScore($"diff").as("p")).collect()
    assert(got.map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("상승", -1), ("하락", 1), ("동일", 0)))
  }

  test("F14: airport list cleanup + split") {
    val got = Seq("['ICN','GMP']").toDF("raw")
      .select(F.cleanAirportCodes($"raw")).as[Seq[String]].head()
    assert(got == Seq("ICN", "GMP"))
  }

  test("F15: is_discounted null-default semantics") {
    val df = Seq((100.0, Some(120.0)), (100.0, None)).toDF("price", "before")
    val got = df.select(F.isDiscounted($"price", $"before")).as[Boolean].collect()
    assert(got(0) && !got(1))
  }
}
