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

  test("pqDistortion equals the encode→reconstruct error identity") {
    // The audit's min-distance shortcut (min_c ||c||²−2v·c + ||v_j||²)
    // must equal the literal per-subspace ||v_j − reconstruct(codes)_j||²
    // computed the long way via pqCodes + pqReconstruct — same micro-
    // rounding, same mean. This pins the algebra AND the rounding path
    // the q137 oracle row relies on.
    val emb = graft.sources.Tables.embeddings(spark, sf())
    val books = PqCodebookArtifact.books
    val m = books.length
    val subLen = books(0)(0).length
    val audit = Similarity.pqDistortion(emb, books)
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(audit.size == m)

    val nv = emb.select(
      Similarity.unitNorm(Similarity.asDouble($"embedding")).as("nv"))
    val recon = nv.select($"nv",
      Similarity.pqReconstruct(Similarity.pqCodes($"nv", books), books).as("rv"))
    val longWay = recon.select(posexplode(array((0 until m).map { j =>
        val sub = slice($"nv", j * subLen + 1, subLen)
        val rsub = slice($"rv", j * subLen + 1, subLen)
        val diff = zip_with(sub, rsub, (a, b) => a - b)
        floor(aggregate(diff, lit(0.0), (acc, x) => acc + x * x) * 1000000
          + lit(0.5))
      }.toIndexedSeq: _*)).as(Seq("subspace", "erru")))
      .groupBy($"subspace").agg(count(lit(1)).as("n"), sum($"erru").as("su"))
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getLong(2)))).toMap

    (0 until m).foreach { j =>
      val (n, mse) = audit(j)
      val (n2, su2) = longWay(j)
      assert(n == n2)
      val mse2 = math.floor(su2.toDouble / n2.toDouble + 0.5) / 1000000.0
      // identical algebra in exact arithmetic; double rounding can move a
      // micro-unit at the ulp boundary, so allow 1 micro-unit of slack
      assert(math.abs(mse - mse2) <= 2e-6,
        s"subspace $j: audit mse $mse vs reconstruct mse $mse2")
    }
  }

  test("serving is deterministic: two runs, identical rows") {
    val emb = graft.sources.Tables.embeddings(spark, sf())
    val q = emb.filter($"vec_id" < 5)
    def run() = Similarity.pqTopKWithBooks(emb, q, 5, PqCodebookArtifact.books)
      .orderBy("q_id", "vec_id").collect().toSeq
    assert(run() == run())
  }
}
