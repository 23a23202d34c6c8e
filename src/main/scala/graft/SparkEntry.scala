package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.QueryCatalog
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Nation-level "attractiveness"-style score (weighted + clamped like the
    * reference's F4/F9 scores, exchage_rate_crawler.py:621-642 /
    * google_trends_processor.py:196-223) over the dim-enriched fact table:
    * broadcast joins for every dim, one shuffle at the final aggregate. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, d)
    val sup = Tables.supplier(spark, d)
    val nat = Tables.nation(spark, d)
    val reg = Tables.region(spark, d)
    // supplier grows with SF -> no forced hint (threshold/AQE decides);
    // nation/region are fixed dims -> always broadcast
    li.join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"),
        avg(col("l_discount")).as("avg_discount"))
      .withColumn("attractiveness_score",
        round(least(lit(100.0), greatest(lit(0.0),
          log10(col("revenue")) * 10 + (lit(1.0) - col("avg_discount")) * 20)), 2))
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ §2.11). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryCatalog.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. */
  def oracleSql: Map[String, String] = QueryCatalog.oracleSql
}
