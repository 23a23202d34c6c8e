package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType, StructType, DataType}

/** Bronze-layer IO (SURVEY.md §2.1): the reference's file/config surfaces
  * re-expressed as DataSource reads with explicit schemas (schema inference
  * is allowed only in exploratory code — SURVEY §1.1), plus the JSON/CSV
  * sinks (K1/K2). Ingestion itself (HTTP scrape/REST) is out of engine
  * scope; these are the landed-data readers.
  */
object Bronze {

  /** S5 — CSV scan with explicit schema + header
    * (pandas read_csv at _archive/flight_avg_merge.py:22-23,91). */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** S1..S4 output shape — JSON lines scan with explicit schema. */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** P3 quarantine variant — PERMISSIVE read that routes malformed rows to
    * `_corrupt_record` instead of failing the scan (the declarative twin of
    * the reference's warn-and-skip loops, exchage_rate_crawler.py:281-298).
    * Returns (clean rows, quarantined raw strings). */
  def readJsonQuarantined(
      spark: SparkSession, path: String, schema: StructType): (DataFrame, DataFrame) = {
    val withCorrupt = schema.add("_corrupt_record", StringType)
    val df = spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(withCorrupt).json(path)
      .cache() // PERMISSIVE corrupt-column reads require a materialized scan
    (df.filter(col("_corrupt_record").isNull).drop("_corrupt_record"),
      df.filter(col("_corrupt_record").isNotNull).select(col("_corrupt_record")))
  }

  /** S6 — config-object scan: a single JSON object whose keys are dynamic
    * (country codes) and whose values share a struct shape
    * (config/master_country_crawler.json, loaded at
    * exchage_rate_crawler.py:45-47). Read multiLine, then transpose
    * key→struct into rows via a to_json/from_json map round-trip (works
    * for any key set without declaring per-key fields). */
  def readConfigMap(spark: SparkSession, path: String, valueSchema: DataType): DataFrame =
    spark.read.option("multiLine", "true").json(path)
      .select(explode(from_json(to_json(struct(col("*"))),
        MapType(StringType, valueSchema))).as(Seq("key", "value")))
      .select(col("key"), col("value.*"))

  /** K1 — event-JSON serialization: one JSON string per record
    * (json.dumps at functions/exchange_rate_trigger.py:48). */
  def toEventJson(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("value"))

  /** K1/K2 — sinks. The reference's Event-Hub batch send and blob/file
    * dumps become ordinary DataFrame writes (streaming callers use
    * writeStream with the same formats). */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** K2, ORC variant — same columnar/zone-map properties as parquet
    * (predicate pushdown, column pruning, splittable), built into Spark
    * with no extra dependency; the interchange format when a downstream
    * consumer is Hive/Trino-first. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** K2 at scale — parquet laid out by low-cardinality partition columns
    * (bronze by `rate_type`/`dt`, ARCHITECTURE §2): equality/range filters
    * on them become PartitionFilters (directory pruning) so a day's query
    * never lists, let alone reads, the other days' files. PlanShapeSpec
    * pins the pruning. */
  def writeParquetPartitioned(
      df: DataFrame, path: String, partitionBy: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionBy: _*).parquet(path)

  /** K2 at scale, join-side layout — bucketed table write: hash-bucket
    * (and sort) rows by the join/aggregation key at WRITE time, so every
    * later equi-join or groupBy on that key between same-bucketed tables
    * runs with NO shuffle exchange at all — the one-off write-side shuffle
    * is amortized over every downstream read. This is the 100 TB answer
    * for fact⋈fact joins where neither side broadcasts (customer⋈orders,
    * orders⋈lineitem): co-locate once, join forever. Requires a table
    * catalog (`saveAsTable` — bucketing metadata lives in the metastore;
    * plain `.parquet(path)` cannot carry it). PlanShapeSpec proves the
    * exchange-free join plan. */
  def writeBucketed(
      df: DataFrame, table: String, bucketCols: Seq[String], numBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "writeBucketed needs at least one bucket column")
    val w = df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet").saveAsTable(table)
  }

  /** Gold Delta write — ENVIRONMENT-DEFERRED: the reference's downstream
    * stores gold as Delta in a catalog (README.md:86-87,111). The call
    * shape compiles against plain Spark (format is resolved at runtime),
    * but this offline container has no delta-spark jar, so execution
    * fails at DataSource lookup; on a cluster, add the delta-spark
    * package + `spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension`
    * and this method works unchanged. Partition by ingest date for
    * partition pruning (SURVEY §4). */
  def writeDelta(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.format("delta").mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).save(path)
  }

  /** Delta MERGE upsert — ENVIRONMENT-DEFERRED (same jar caveat). The W2
    * "latest crawl wins" gold upsert (Core.dedupLatest's storage twin) as
    * the SQL MERGE a cluster user runs: `updates` must be a registered
    * temp view, `target` a Delta table name. Built as SQL text so the
    * shape ships without the DeltaTable API on the compile classpath.
    *
    * PRECONDITION: `updatesView` must carry at most ONE row per key —
    * Delta MERGE throws on multiple source matches. Apply
    * `Core.dedupLatest(updates, keyCols, orderCol)` before registering
    * the view. Column identifiers are backtick-quoted; the target/view
    * names are caller-controlled table identifiers (possibly
    * catalog.schema.table) and pass through verbatim. */
  def mergeLatestWins(
      spark: SparkSession, target: String, updatesView: String,
      keyCols: Seq[String], orderCol: String): Unit = {
    def q(c: String) = "`" + c.replace("`", "``") + "`"
    val on = keyCols.map(k => s"t.${q(k)} = u.${q(k)}").mkString(" AND ")
    spark.sql(
      s"""MERGE INTO $target t USING $updatesView u ON $on
         |WHEN MATCHED AND u.${q(orderCol)} > t.${q(orderCol)} THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    ()
  }
}
