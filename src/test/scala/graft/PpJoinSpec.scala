package graft

import org.apache.spark.sql.functions._

import graft.ops.Text

/** PPJoin prefix filtering on a NON-degenerate corpus. The q153 fixture's
  * 31-token vocab is the worst case for prefix filtering (every token is a
  * stopword, candidates approach all-pairs — documented in-code there);
  * this spec builds a Zipfian corpus where rare tokens EXIST, and pins
  * both halves of the PPJoin claim:
  *   1. exact recall — row-identical to the naive quadratic join;
  *   2. the pruning actually bites — candidate pairs ≪ n(n−1)/2.
  */
class PpJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic Zipf(1.0) corpus over a 2000-token vocabulary:
    * 240 base docs of 24 distinct tokens each, plus 30 planted near-dup
    * pairs (copy of a base doc with 4 of 24 tokens swapped → Jaccard
    * 20/28 ≈ 0.714 against its source). */
  private lazy val corpus: Seq[(Long, Seq[String])] = {
    val rnd = new scala.util.Random(20260814L)
    val vocabSize = 2000
    // Zipf sampler via inverse CDF over precomputed cumulative weights
    val weights = (1 to vocabSize).map(k => 1.0 / k)
    val total = weights.sum
    val cum = weights.scanLeft(0.0)(_ + _).tail.map(_ / total).toArray
    def zipfTok(): String = {
      val u = rnd.nextDouble()
      val i = {
        val p = java.util.Arrays.binarySearch(cum, u)
        if (p >= 0) p else -p - 1
      }
      s"tok${math.min(i, vocabSize - 1)}"
    }
    def doc(): Seq[String] = {
      val s = scala.collection.mutable.LinkedHashSet.empty[String]
      while (s.size < 24) s += zipfTok()
      s.toSeq
    }
    val base = (0 until 240).map(i => (i.toLong, doc()))
    val nearDups = (0 until 30).map { i =>
      val (srcId, toks) = base(i * 8)
      val mutated = toks.drop(4) ++ (0 until 4).map(j => s"nd${i}_$j")
      ((1000 + srcId), mutated)
    }
    base ++ nearDups
  }

  private def docsDf = corpus.toDF("doc_id", "toks")

  test("exact recall: ppJoin row-identical to the naive quadratic join") {
    val t = 0.5
    val got = Text.ppJoin(docsDf, t)
      .select($"doc_a", $"doc_b", round($"jac", 9).as("jac"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val d = docsDf
    val naive = d.select($"doc_id".as("doc_a"), $"toks".as("ta"))
      .crossJoin(d.select($"doc_id".as("doc_b"), $"toks".as("tb")))
      .filter($"doc_a" < $"doc_b")
      .withColumn("jac", round(
        size(array_intersect($"ta", $"tb")).cast("double") /
          size(array_union($"ta", $"tb")), 9))
      .filter($"jac" >= t)
      .select($"doc_a", $"doc_b", $"jac")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(naive.nonEmpty, "fixture bug: no similar pairs planted")
    // all 30 planted pairs must be present (Jaccard 20/28 > 0.5)
    assert(naive.size >= 30)
    assert(got == naive,
      s"ppJoin diverged: missing=${(naive -- got).take(5)} " +
        s"extra=${(got -- naive).take(5)}")
  }

  test("pruning bites: candidates well under n(n-1)/2 on Zipfian tokens") {
    // t=0.7 is the realistic near-dup threshold (planted pairs sit at
    // 0.714): prefix length drops to n − ⌈0.7n⌉ + 1 = 8 of 24 tokens and
    // the rarest-first keys prune hard. (At t=0.5 the 13-token prefixes
    // still cut all-pairs ~6.6× on this corpus — measured 15.1% — but the
    // sharp claim belongs at the threshold the dedup pipeline runs.)
    val n = corpus.size.toLong
    val allPairs = n * (n - 1) / 2
    val cands = Text.ppJoinCandidates(docsDf, 0.7).count()
    info(s"candidates $cands of $allPairs all-pairs " +
      f"(${cands * 100.0 / allPairs}%.2f%%)")
    assert(cands < allPairs / 10,
      s"prefix filtering did not prune: $cands of $allPairs")
    // ...while still containing every truly-similar pair (subset of recall
    // test, but cheap and names the failure precisely)
    val verified = Text.ppJoin(docsDf, 0.7).count()
    assert(verified >= 30)
  }

  test("length filter (round 14) prunes size-incompatible candidates losslessly") {
    // Common tokens c1..c20 (df ≥ 4 via three filler docs) push the rare
    // tokens to the front of every prefix. Pair (1,2) shares prefix token
    // rare1 but has |A|/|B| = 4/20 < 0.5 → the size filter must prune it
    // (and no such pair can reach Jaccard 0.5, so recall is unharmed).
    // Pair (4,5) sits EXACTLY on the bound (7/14 = 0.5) → must survive,
    // and indeed verifies at jac = 7/14 = 0.5.
    val common = (1 to 20).map(i => s"c$i")
    val docs = (Seq(
      (1L, Seq("rare1") ++ common.take(3)),
      (2L, Seq("rare1") ++ common.take(19)),
      (4L, Seq("rare2") ++ common.take(13)),
      (5L, Seq("rare2") ++ common.take(6))) ++
      (0 until 3).map(i => (100L + i, common))).toDF("doc_id", "toks")
    val cands = Text.ppJoinCandidates(docs, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!cands.contains((1L, 2L)),
      s"size filter did not prune the 4-vs-20 pair: $cands")
    assert(cands.contains((4L, 5L)),
      s"boundary ratio exactly t was wrongly pruned: $cands")
    // exact recall on this corpus: ppJoin ≡ naive quadratic
    import org.apache.spark.sql.DataFrame
    def pairs(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = pairs(Text.ppJoin(docs, 0.5)
      .select($"doc_a", $"doc_b", round($"jac", 9).as("jac")))
    val d = docs
    val naive = pairs(d.select($"doc_id".as("doc_a"), $"toks".as("ta"))
      .crossJoin(d.select($"doc_id".as("doc_b"), $"toks".as("tb")))
      .filter($"doc_a" < $"doc_b")
      .withColumn("jac", round(
        size(array_intersect($"ta", $"tb")).cast("double") /
          size(array_union($"ta", $"tb")), 9))
      .filter($"jac" >= 0.5)
      .select($"doc_a", $"doc_b", $"jac"))
    assert(got == naive,
      s"length filter broke recall: missing=${naive -- got} extra=${got -- naive}")
    assert(got.exists(p => p._1 == 4L && p._2 == 5L && p._3 == 0.5))
  }
}
