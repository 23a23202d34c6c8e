package graft

import org.apache.spark.sql.functions._

import graft.ops.{Corpus, Text}
import graft.sources.Tables

/** Corpus curation operators: deterministic sampling and sequence
  * packing, checked against naive in-memory models on the real sf0.001
  * documents table. */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf())

  test("hashSample is exactly reproducible and honors per-stratum rates") {
    def run() = Corpus.hashSample(
      docs, col("doc_id"), col("lang"), Map("en" -> 0.5), 0.2, "s1")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val a = run()
    assert(a == run(), "same salt must select identical rows")
    // loose binomial bounds: 218 en docs at 0.5, 282 others at 0.2
    val langs = Corpus.hashSample(
      docs, col("doc_id"), col("lang"), Map("en" -> 0.5), 0.2, "s1")
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val en = langs.getOrElse("en", 0L)
    val rest = langs.filter(_._1 != "en").values.sum
    assert(en > 70 && en < 150, s"en kept $en of 218 at rate 0.5")
    assert(rest > 25 && rest < 90, s"rest kept $rest of 282 at rate 0.2")
  }

  test("different salts draw (near-)independent samples") {
    def ids(salt: String) = Corpus.hashSample(
      docs, col("doc_id"), col("lang"), Map.empty, 0.3, salt)
      .select("doc_id").as[Long].collect().toSet
    val a = ids("sA")
    val b = ids("sB")
    // expected overlap ~0.09 * 500 = 45; identical samples would be ~150
    assert(a != b && (a & b).size < a.size.min(b.size))
  }

  test("uniformHash stays in [0,1) and is roughly uniform") {
    val u = docs.select(Corpus.uniformHash(col("doc_id"), "u").as("u"))
      .as[Double].collect()
    assert(u.forall(x => x >= 0.0 && x < 1.0))
    assert(math.abs(u.count(_ < 0.5).toDouble / u.length - 0.5) < 0.1)
  }

  test("packSequences matches the naive per-shard running-sum model") {
    val got = Corpus.packSequences(
      docs, Text.wsTokenCount(col("text")), budget = 1024L, nShards = 3)
      .select("doc_id", "shard", "n_tok", "bin")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val toks = docs.select(col("doc_id"), Text.wsTokenCount(col("text")).as("t"))
      .as[(Long, Long)].collect().sortBy(_._1)
    val expected = toks.groupBy(_._1 % 3).toSeq.flatMap { case (shard, rows) =>
      var cum = 0L
      rows.sortBy(_._1).toSeq.map { case (id, t) =>
        val bin = cum / 1024L
        cum += t
        (id, shard, t, bin)
      }
    }.sortBy(_._1)
    assert(got.toSeq == expected)
  }

  test("packSequences bins hold consecutive docs and bounded token totals") {
    val packed = Corpus.packSequences(
      docs, Text.wsTokenCount(col("text")), budget = 512L, nShards = 2)
      .select("doc_id", "shard", "n_tok", "bin")
      .as[(Long, Long, Long, Long)].collect()
    assert(packed.map(_._1).distinct.length == packed.length, "each doc exactly once")
    val maxTok = packed.map(_._3).max
    packed.groupBy(p => (p._2, p._4)).foreach { case ((_, _), rows) =>
      assert(rows.map(_._3).sum < 512L + maxTok, "bin total < budget + one doc")
    }
    // within a shard, bin index is non-decreasing in doc order
    packed.groupBy(_._2).foreach { case (_, rows) =>
      val bins = rows.sortBy(_._1).map(_._4)
      assert(bins.zip(bins.drop(1)).forall { case (a, b) => a <= b })
    }
  }
}
