package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bundled reference-shaped bronze fixtures (FIXTURES.md §B) — the JSONL
  * files under `src/main/resources/graft/fixtures/`, authored by
  * `tools/make_fixtures.py`. The country master and standard map carry the
  * reference's own public config data verbatim
  * (`config/master_country_crawler.json`, 59 rows incl. the EUR ×17
  * eurozone fan-out; `config/standard_country_map.json`, 739 alias
  * entries); the rate/trends/flight rows are synthetic but shaped per the
  * reference record literals. Every reader pins an explicit schema — no
  * inference drift between runs, mirroring the streaming-source
  * discipline.
  */
object Fixtures {

  private val names = Seq(
    "country_master.jsonl", "standard_country_map.jsonl", "rates_raw.jsonl",
    "trends_interest.jsonl", "flights_raw.jsonl", "city_meta.jsonl",
    "country_config.json")

  /** The filesystem directory holding the fixtures, resolved ONCE and
    * shared by the Spark readers and the DuckDB oracle SQL (which embeds
    * it as an absolute path — both engines, possibly in DIFFERENT
    * processes, must read the same bytes at a path that outlives this
    * JVM):
    *  1. `-Dgraft.fixtures.dir` override;
    *  2. the classpath resource when it is a plain `file:` URL;
    *  3. the in-repo source directory when the cwd is the repo (sbt's
    *     layered classloader does not expose file: resource URLs);
    *  4. otherwise (packaged in an assembly jar, arbitrary cwd) the
    *     bundled resources are materialized to a STABLE tmpdir path —
    *     idempotent overwrite, not deleted on exit, so an oracle process
    *     started later can still read it. */
  lazy val dir: String = sys.props.getOrElse("graft.fixtures.dir", {
    val probe = getClass.getClassLoader.getResource("graft/fixtures/" + names.head)
    val srcDir = new java.io.File("src/main/resources/graft/fixtures")
    if (probe != null && probe.getProtocol == "file")
      // toURI decodes URL escapes (a %20 in getPath would 404 the file)
      new java.io.File(probe.toURI).getParent
    else if (srcDir.isDirectory) srcDir.getAbsolutePath
    else materializeToTemp()
  })

  private def materializeToTemp(): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption => Copy}
    // per-user dir: a fixed shared path would hand user B an
    // AccessDeniedException on user A's files instead of working
    val tmp = Paths.get(sys.props("java.io.tmpdir"),
      "graft-fixtures-" + sys.props.getOrElse("user.name", "anon"))
    Files.createDirectories(tmp)
    names.foreach { n =>
      val in = getClass.getClassLoader.getResourceAsStream(s"graft/fixtures/$n")
      if (in == null)
        // fail HERE with the fixture name, not later as a bare
        // path-not-found from a reader far from the cause
        throw new IllegalStateException(
          s"bundled fixture graft/fixtures/$n missing from the classpath")
      else
        try {
          // write-then-atomic-rename: a concurrent process must never
          // read a torn half-copied fixture
          val staged = Files.createTempFile(tmp, s".$n.", ".part")
          try {
            Files.copy(in, staged, Copy.REPLACE_EXISTING)
            // createTempFile makes 0600 files and the rename keeps the
            // mode — restore world-readable so another user's oracle
            // process (the whole point of the stable path) can read it
            try {
              import java.nio.file.attribute.PosixFilePermissions
              Files.setPosixFilePermissions(
                staged, PosixFilePermissions.fromString("rw-r--r--"))
            } catch { case _: UnsupportedOperationException => () }
            Files.move(staged, tmp.resolve(n),
              Copy.ATOMIC_MOVE, Copy.REPLACE_EXISTING)
          } catch {
            case t: Throwable => Files.deleteIfExists(staged); throw t
          }
        } finally in.close()
    }
    tmp.toString
  }

  /** Resolve a bundled fixture to a filesystem path under [[dir]]. */
  def path(name: String): String = s"$dir/$name"

  /** B1 — parsed exchange-rate scrape rows (exchage_rate_crawler.py:
    * 266-275). Crawl timestamps stay strings: the reference emits ISO
    * strings (F18) and string max() is engine-portable. */
  def ratesRaw(spark: SparkSession): DataFrame =
    spark.read.schema(
      "currency_code string, rate_type string, month_key string, " +
        "buy_rate double, sell_rate double, send_rate double, " +
        "receive_rate double, standard_rate double, " +
        "crawled_at_utc string, crawled_at_kst string")
      .json(path("rates_raw.jsonl"))

  /** B2 — 59-row country master dim, renamed to the gold-record column
    * names the Rates pipeline emits (exchage_rate_crawler.py:338-357). */
  def countryMaster(spark: SparkSession): DataFrame =
    spark.read.schema(
      "country_code_3 string, country_name_eng string, " +
        "country_name_kor string, country_code_2 string, " +
        "currency_code string, is_euro_zone boolean, " +
        "google_trend_keyword_kor string")
      .json(path("country_master.jsonl"))
      .select(
        col("currency_code"), col("country_code_3"),
        col("country_name_kor").as("country_korean_name"),
        col("country_name_eng").as("country_english_name"),
        col("country_code_2"), col("is_euro_zone"))

  /** B3 — 739-entry standard country map; `lookup_key` is the alias the
    * processor looks up by, `korean_name` the canonical name the gold
    * record emits — distinct for 514/739 entries
    * (google_trends_processor.py:146-152). */
  def standardMap(spark: SparkSession): DataFrame =
    spark.read.schema(
      "lookup_key string, korean_name string, english_name string, " +
        "country_code_3 string, country_code_2 string")
      .json(path("standard_country_map.jsonl"))

  /** B4 — long-form trends interest series (google_trends_crawler.py:
    * 56-72): 45 daily rows × 9 keywords incl. the anchor, an
    * epsilon-branch keyword, a standardization miss, and an alias keyword
    * whose canonical korean_name differs. */
  def trendsInterest(spark: SparkSession): DataFrame =
    spark.read.schema(
      "date date, keyword string, interest int, geo string, " +
        "is_partial boolean, batch_id int")
      .json(path("trends_interest.jsonl"))

  private val stationDdl =
    "struct<station:struct<code:string," +
      "city:struct<name:string,legacyId:int>," +
      "country:struct<code:string>," +
      "gps:struct<lat:double,lng:double>>,localTime:string>"

  /** B5 — nested flight itineraries
    * (_archive/flight_price_preprocessing.py:3-49). */
  def flightsRaw(spark: SparkSession): DataFrame =
    spark.read.schema(
      "itineraries array<struct<" +
        "price:struct<amount:double,priceBeforeDiscount:double>," +
        "sector:struct<sectorSegments:array<struct<segment:struct<" +
        s"source:$stationDdl,destination:$stationDdl," +
        "carrier:struct<name:string,code:string>," +
        "cabinClass:string,duration:int>>>>>>")
      .json(path("flights_raw.jsonl"))

  /** B6 — city metadata with the `"['ICN','GMP']"` list-string form
    * (flight_avg_merge.py:91-98); one null row exercises the P8 drop. */
  def cityMeta(spark: SparkSession): DataFrame =
    spark.read.schema("airport_codes string, final_city_code string")
      .json(path("city_meta.jsonl"))

  /** J5 — the 2→3-letter country map for the flight fixture's countries;
    * VN is deliberately absent (miss → null, pandas .map semantics). */
  val code2to3: Map[String, String] =
    Map("KR" -> "KOR", "JP" -> "JPN", "FR" -> "FRA", "TH" -> "THA")
}
