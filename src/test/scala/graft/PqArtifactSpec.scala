package graft

import org.apache.spark.sql.functions._

import graft.ops.{PqCodebookArtifact, PqServe, Similarity}

/** The frozen PQ codebook artifact (train/serve split behind q137b):
  * structural invariants, generated-oracle sanity, and a recall floor for
  * serving FROZEN codebooks on a fixture they were not trained on —
  * the production situation (train once at index build, serve forever). */
class PqArtifactSpec extends SparkSpec {
  import spark.implicits._

  test("artifact shape and values are a valid 8x16x8 codebook") {
    val b = PqCodebookArtifact.books
    assert(b.length == PqCodebookArtifact.m)
    assert(b.forall(_.length == PqCodebookArtifact.kCent))
    assert(b.forall(_.forall(_.length ==
      PqCodebookArtifact.dim / PqCodebookArtifact.m)))
    val flat = b.flatten.flatten
    assert(flat.forall(v => !v.isNaN && !v.isInfinite))
    // trained on unit-normalized vectors: centroid coords stay small
    assert(flat.forall(v => math.abs(v) < 1.0))
    // no degenerate duplicate centroids inside a subspace
    b.foreach { book =>
      assert(book.map(_.toSeq).distinct.length == book.length)
    }
  }

  test("generated oracle SQL embeds the artifact and parses structurally") {
    val sql = PqServe.oracleSql
    // one distance list + one ADC centroid table per subspace
    assert((0 until PqCodebookArtifact.m).forall(j => sql.contains(s"AS c$j")))
    assert(sql.contains("list_dot_product"))
    // spot-check a literal from the artifact round-trips into the SQL text
    val sample = PqCodebookArtifact.books(0)(0)(0).toString
    assert(sql.contains(sample))
    // balanced brackets — a truncated render would fail DuckDB parse
    assert(sql.count(_ == '[') == sql.count(_ == ']'))
    assert(sql.count(_ == '(') == sql.count(_ == ')'))
  }

  test("serving frozen codebooks on sf0.001: recall@10 floor vs brute force") {
    // The artifact was fit on sf0.01; serving it against sf0.001 is the
    // cross-corpus generalization a persisted index must deliver. Floor is
    // deliberately loose (random embeddings are near-worst-case for PQ);
    // what it pins is that frozen-codebook serving is not broken.
    val emb = graft.sources.Tables.embeddings(spark, sf())
    val queries = emb.filter($"vec_id" < 20)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = pairs(Similarity.bruteForceTopK(emb, queries, 10))
    val pq = pairs(Similarity.pqTopKWithBooks(
      emb, queries, 10, PqCodebookArtifact.books))
    val recall = (bf & pq).size.toDouble / bf.size
    info(f"frozen-codebook PQ recall@10 = $recall%.3f")
    assert(recall >= 0.15, f"frozen-codebook recall $recall%.3f under floor")
  }

  test("serving is deterministic: two runs, identical rows") {
    val emb = graft.sources.Tables.embeddings(spark, sf())
    val q = emb.filter($"vec_id" < 5)
    def run() = Similarity.pqTopKWithBooks(emb, q, 5, PqCodebookArtifact.books)
      .orderBy("q_id", "vec_id").collect().toSeq
    assert(run() == run())
  }
}
