package graft

import org.apache.spark.sql.functions._

/** Two user-facing API surfaces rounding out the catalog's semantics:
  *
  * 1. FILE PROVENANCE — `_metadata` hidden columns + `input_file_name()`:
  *    which physical file each row came from. A curation pipeline needs
  *    this for dedup provenance and takedown compliance (drop every row
  *    that came from shard X); it must survive projection and filtering.
  *
  * 2. `df.stat` — the built-in statistics API (crosstab, freqItems,
  *    approxQuantile, corr). The catalog computes each of these with
  *    exact oracle-checked forms (q172 contingency, q96 Misra-Gries, q65
  *    KLL, q99 exact sufficient statistics); this spec pins that the
  *    BUILT-IN API agrees with those exact forms within each one's
  *    documented contract, so a user arriving with stat-API habits gets
  *    answers consistent with the catalog's.
  */
class ProvenanceStatSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = sf()

  test("_metadata and input_file_name carry file provenance through transforms") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("lang") === "en")
      .select(col("doc_id"),
        col("_metadata.file_path").as("fpath"),
        col("_metadata.file_name").as("fname"),
        col("_metadata.file_size").as("fsize"),
        input_file_name().as("ifn"))
    val rows = docs.collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[String]("fname") == "documents.parquet")
      assert(r.getAs[String]("fpath").endsWith("documents.parquet"))
      assert(r.getAs[Long]("fsize") > 0)
      assert(r.getAs[String]("ifn").endsWith("documents.parquet"))
    }
  }

  test("df.stat.crosstab equals the exact contingency counts") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val ct = docs.stat.crosstab("lang", "source").collect()
      .flatMap { r =>
        val lang = r.getString(0)
        (1 until r.length).map(i =>
          (lang, r.schema.fieldNames(i)) -> r.getLong(i))
      }.toMap.filter(_._2 > 0)
    val exact = docs.groupBy(col("lang"), col("source")).count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(ct == exact)
  }

  test("df.stat.freqItems is a superset of true heavy hitters (MG contract)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val freq = docs.stat.freqItems(Array("lang"), 0.1).head()
      .getAs[scala.collection.Seq[String]](0).toSet
    // every language above 10% support must appear (false positives allowed)
    val n = docs.count()
    val heavy = docs.groupBy(col("lang")).count()
      .filter(col("count") > n / 10).collect().map(_.getString(0)).toSet
    assert(heavy.subsetOf(freq), s"missing heavy hitters: ${heavy.diff(freq)}")
  }

  test("df.stat.approxQuantile at relativeError=0 equals the exact quantile") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val Array(q25, q50, q75) =
      docs.stat.approxQuantile("n_chars", Array(0.25, 0.5, 0.75), 0.0)
    val sorted = docs.select(col("n_chars").cast("double"))
      .collect().map(_.getDouble(0)).sorted
    // GK at err=0 returns AN element at the requested rank (not interpolated)
    def rankOk(v: Double, p: Double) = {
      val below = sorted.count(_ <= v).toDouble / sorted.length
      val strictly = sorted.count(_ < v).toDouble / sorted.length
      strictly <= p && below >= p
    }
    assert(rankOk(q25, 0.25) && rankOk(q50, 0.5) && rankOk(q75, 0.75),
      s"quantiles out of rank: $q25 $q50 $q75")
  }

  test("df.stat.corr agrees with the exact sufficient-statistics form") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_quantity").cast("double").as("x"),
        col("l_extendedprice").cast("double").as("y"))
    val built = li.stat.corr("x", "y")
    val r = li.agg(
      count(lit(1)).cast("double").as("n"), sum(col("x")).as("sx"),
      sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"), sum(col("x") * col("y")).as("sxy"))
      .head()
    val (n, sx, sy, sxx, syy, sxy) = (r.getDouble(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    val exact = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    // built-in corr uses a Welford-style update whose float order differs
    // from the closed form — agreement is to analysis tolerance, and the
    // ORACLE-grade path stays q99's exact integer statistics
    assert(math.abs(built - exact) < 1e-9, s"built $built vs exact $exact")
  }
}
