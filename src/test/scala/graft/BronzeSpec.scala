package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{RefFunctions => F}
import graft.sources.Bronze

/** Bronze IO surfaces (SURVEY §2.1 S5/S6, K1/K2) + calendar/timestamp
  * helpers (F17/F18) + event-JSON serialization (F19). */
class BronzeSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String) =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  test("S5 csv scan with explicit schema + K2 csv sink round-trip") {
    val dir = tmpDir("graft_csv")
    val df = Seq(("ICN", 8, 500000.0), ("KIX", 9, 450000.0))
      .toDF("city_code", "month", "avg_price")
    Bronze.writeCsv(df, dir)
    val schema = StructType(Seq(
      StructField("city_code", StringType),
      StructField("month", IntegerType),
      StructField("avg_price", DoubleType)))
    val back = Bronze.readCsv(spark, dir, schema)
    assert(back.collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSet ==
      Set(("ICN", 8, 500000.0), ("KIX", 9, 450000.0)))
  }

  test("K2 orc sink round-trip with pushed filters at the scan") {
    val dir = tmpDir("graft_orc")
    val df = Seq(("ICN", 8, 500000.0), ("KIX", 9, 450000.0))
      .toDF("city_code", "month", "avg_price")
    Bronze.writeOrc(df, dir)
    val back = Bronze.readOrc(spark, dir).filter(col("month") === 8)
    assert(back.collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSeq ==
      Seq(("ICN", 8, 500000.0)))
    // the filter must reach the ORC scan, same contract as parquet (q02)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(month), EqualTo(month,8)]"), plan)
  }

  test("S6 config-map scan: dynamic keys transpose to rows") {
    val dir = tmpDir("graft_cfg")
    val cfg = """{"USA": {"currency_code": "USD", "is_euro_zone": false},
                  "DEU": {"currency_code": "EUR", "is_euro_zone": true}}"""
    Files.writeString(java.nio.file.Paths.get(s"$dir/config.json"), cfg)
    val valueSchema = StructType(Seq(
      StructField("currency_code", StringType),
      StructField("is_euro_zone", BooleanType)))
    val rows = Bronze.readConfigMap(spark, s"$dir/config.json", valueSchema)
    val got = rows.collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(2))).toSet
    assert(got == Set(("USA", "USD", false), ("DEU", "EUR", true)))
  }

  test("K1/F19 event-JSON serialization + json sink round-trip") {
    val dir = tmpDir("graft_json")
    val df = Seq(("exchangeRate", "USD", 1380.5)).toDF("dataType", "currency_code", "rate")
    val events = Bronze.toEventJson(df)
    val s = events.as[String].head()
    assert(s.contains("\"dataType\":\"exchangeRate\"") && s.contains("\"rate\":1380.5"))
    Bronze.writeJson(df, dir)
    val schema = StructType(Seq(
      StructField("dataType", StringType),
      StructField("currency_code", StringType),
      StructField("rate", DoubleType)))
    assert(Bronze.readJson(spark, dir, schema).count() == 1)
  }

  test("P3 quarantine: malformed JSON rows split out, clean rows survive") {
    val dir = tmpDir("graft_quar")
    Files.writeString(java.nio.file.Paths.get(s"$dir/data.json"),
      """{"currency_code": "USD", "rate": 1380.5}
        |{"currency_code": "EUR", "rate": broken!!
        |{"currency_code": "JPY", "rate": 9.4}""".stripMargin)
    val schema = StructType(Seq(
      StructField("currency_code", StringType),
      StructField("rate", DoubleType)))
    val (clean, quarantined) = Bronze.readJsonQuarantined(spark, s"$dir/data.json", schema)
    assert(clean.collect().map(_.getString(0)).toSet == Set("USD", "JPY"))
    assert(quarantined.count() == 1)
    assert(quarantined.head().getString(0).contains("broken"))
  }

  test("F17 calendar helpers") {
    val d = Seq(Timestamp.valueOf("2025-08-12 10:30:00")).toDF("t")
    val got = d.select(
      F.yyyymmdd($"t"), F.monthKey($"t"),
      date_format(F.firstDayOfMonth($"t"), "yyyy-MM-dd"),
      date_format(F.firstDayOfYear($"t"), "yyyy-MM-dd"),
      date_format(F.lastDayOfMonth($"t"), "yyyy-MM-dd")).head()
    assert(got.toSeq == Seq("20250812", "202508", "2025-08-01", "2025-01-01", "2025-08-31"))
  }

  test("F18 UTC->KST shift (+9h) and ISO formatting") {
    val d = Seq(Timestamp.valueOf("2025-08-12 20:00:00")).toDF("utc")
    val got = d.select(
      F.isoTimestamp($"utc"),
      F.isoTimestamp(F.toKst($"utc"))).head()
    assert(got.getString(0) == "2025-08-12T20:00:00")
    assert(got.getString(1) == "2025-08-13T05:00:00")
  }
}
