package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** North-star text / dedup operators (SURVEY.md §2.11) — the production
  * (100 TB) variants. The oracle-checked QueryCatalog twins use md5-derived
  * hashes so DuckDB can mirror them; these use xxhash64 (codegen'd, no
  * digest allocation) and are the ones a real pipeline would run.
  *
  * Shuffle budget per operator:
  *  - exactDedup: one shuffle on the digest;
  *  - minHash LSH: explode to (doc × bands) rows, one shuffle on the band
  *    bucket, candidate verify joins shuffle only candidate pairs — never
  *    O(n²);
  *  - simHash: bit votes aggregated map-side first (partial hash agg).
  */
object Text {

  def tokens(text: Column): Column = filter(split(text, " "), t => t =!= "")

  /** Word n-gram shingles (default 3); empty array for short docs
    * (sequence(1, 0) would count DOWN in Spark, so guard explicitly). */
  def shingles(toks: Column, n: Int = 3): Column =
    when(size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*)))
      .otherwise(array().cast("array<string>"))

  /** MinHash signature: `numHashes` xxhash64-seeded minima over shingles.
    * Null for docs with no shingles. */
  def minHashSignature(sh: Column, numHashes: Int = 16): Column =
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      seed => array_min(transform(sh, s => xxhash64(seed, s))))

  /** LSH band digests from a signature: `bands` hashes of `rowsPerBand`
    * consecutive signature slots. */
  def lshBands(sig: Column, bands: Int = 4, rowsPerBand: Int = 4): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => struct(
        b.as("band_id"),
        xxhash64(b, array_join(transform(
          slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)),
          x => x.cast("string")), "|")).as("band_hash")))

  /** Exact-duplicate groups: one row per distinct content, keeper = min id. */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(xxhash64(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** MinHash+LSH near-duplicate pairs with exact Jaccard verification.
    * Returns (doc_a, doc_b, jaccard >= threshold). */
  def nearDupPairs(
      docs: DataFrame,
      threshold: Double = 0.5,
      numHashes: Int = 16,
      bands: Int = 4): DataFrame = {
    val base = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("sig", minHashSignature(shingles(col("toks")), numHashes))
      .filter(size(col("sig")) > 0 && col("sig").getItem(0).isNotNull)
    val banded = base.select(
      col("doc_id"),
      explode(lshBands(col("sig"), bands, numHashes / bands)).as("band"))
      .select(col("doc_id"), col("band.band_id"), col("band.band_hash"))
    val pairs = banded.as("a")
      .join(banded.as("b"),
        col("a.band_id") === col("b.band_id") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val tokset = docs.select(col("doc_id"), array_distinct(tokens(col("text"))).as("toks"))
    val jac = size(array_intersect(col("ta.toks"), col("tb.toks"))).cast("double") /
      size(array_union(col("ta.toks"), col("tb.toks")))
    pairs
      .join(tokset.as("ta"), col("doc_a") === col("ta.doc_id"))
      .join(tokset.as("tb"), col("doc_b") === col("tb.doc_id"))
      .select(col("doc_a"), col("doc_b"), jac.as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash per document (token-level, xxhash64 bit votes). */
  def simHash64(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tok = docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("tok"))
      .withColumn("hv", xxhash64(col("tok")))
    tok
      .select(col("doc_id"), col("hv"), explode(sequence(lit(0), lit(63))).as("b"))
      .withColumn("contrib", when(expr("(hv >> b) & 1") === 1, 1).otherwise(-1))
      .groupBy(col("doc_id"), col("b"))
      .agg(sum(col("contrib")).as("s"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("s") > 0, expr("shiftleft(1L, b)")).otherwise(0L)).as("simhash"))
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: band the 64 bits into `bands` chunks, join on
    * any equal chunk (guarantees recall for hamming <= bands-1), verify by
    * exact hamming. */
  def simHashPairs(sim: DataFrame, maxHamming: Int = 3, bands: Int = 4): DataFrame = {
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val chunks = (0 until bands).map(b => struct(
      lit(b).as("band_id"),
      shiftright(col("simhash"), b * width).bitwiseAND(lit(mask)).as("chunk")))
    val banded = sim.select(
      col("doc_id"), col("simhash"), explode(array(chunks: _*)).as("p"))
      .select(col("doc_id"), col("simhash"), col("p.band_id"), col("p.chunk"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band_id") === col("b.band_id") && col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        hamming64(col("a.simhash"), col("b.simhash")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
