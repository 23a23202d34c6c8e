package graft

import org.apache.spark.sql.functions._

import graft.ops.{CentroidArtifact, CentroidArtifact64, SemDedup, Similarity}

/** The SemDeDup scale dial, measured in code (round-8 ask): within-cell
  * all-pairs is the algorithm's quadratic, and the production answer is
  * cells ∝ n — grow k with the corpus so per-cell sizes (and therefore
  * per-document pair work) stay FLAT as n grows. q164's frozen k=8
  * artifact is the sf0.01-sized instance; `CentroidArtifact64` is the
  * 10×-corpus instance (k=64, trained on the tools/sf1 embeddings by
  * `CentroidArtifactGen`). This spec takes the 10× fixture step the repo
  * always has (sf0.01 → sf0.1) and pins:
  *  - per-document pair work with k∝n stays within a small constant of
  *    the small-corpus baseline (flat), while
  *  - the same step under a FROZEN k=8 multiplies per-document work by
  *    ~the corpus growth (the documented 11.5× q164 caveat, reproduced
  *    here as the counterfactual).
  */
class SemDedupScaleSpec extends SparkSpec {

  /** Per-cell histogram → (n, maxCell, pairsPerDoc): pair work is
    * Σ c·(c−1)/2 over cells, the exact number of cosine evaluations the
    * within-cell join performs. Goes through `assignCells` (the shipping
    * strategy switch), so the cells counted are the cells the dedup runs
    * with at any k — including k=640, where only the fused kernel form
    * exists. */
  private def cellStats(sfDir: String, cents: Array[Array[Double]]): (Long, Long, Double) = {
    graft.plans.GraftExtensions.install(spark)
    val sizes = SemDedup.assignCells(
        graft.sources.Tables.embeddings(spark, sfDir), cents)
      .groupBy(col("cell")).agg(count(lit(1)).as("c"))
      .select(col("c")).collect().map(_.getLong(0))
    val n = sizes.sum
    val pairs = sizes.map(c => c * (c - 1) / 2).sum
    (n, sizes.max, pairs.toDouble / n)
  }

  test("cells ∝ n keeps per-document pair work flat as the corpus grows") {
    // the embeddings fixture grows 4× from sf0.001 to sf0.1 (500 → 2000);
    // k grows 8× (8 → 64) — per-doc pair work must NOT grow with n
    val (n8, max8, ppd8) = cellStats(sf(), CentroidArtifact.centers)
    val (n64, max64, ppd64) = cellStats(sf("sf0.1"), CentroidArtifact64.centers)
    info(f"sf0.001 k=8:  n=$n8%d maxCell=$max8%d pairs/doc=$ppd8%.1f")
    info(f"sf0.1  k=64: n=$n64%d maxCell=$max64%d pairs/doc=$ppd64%.1f")
    assert(n64 >= 4 * n8, "fixture step is not 4×+ — spec premise broken")
    // FLAT: with k grown ≥ the corpus factor, per-doc pair work may
    // wobble with cell balance but must not exceed the small-corpus
    // baseline. (Measured: it DROPS, 35.2 → 15.8.) A frozen-k run over
    // the same step multiplies it by ~the corpus factor (see below).
    assert(ppd64 <= 2.0 * ppd8,
      f"per-doc pair work grew ${ppd64 / ppd8}%.1f× — cells not absorbing n")
    assert(max64 <= 2 * max8,
      s"max cell $max64 vs $max8 — skewed cells break the bounded-quadratic claim")
  }

  test("counterfactual: frozen k=8 on the grown corpus multiplies per-doc work") {
    val (_, _, ppdSmallK8) = cellStats(sf("sf0.01"), CentroidArtifact.centers)
    val (_, _, ppdBigK8) = cellStats(sf("sf0.1"), CentroidArtifact.centers)
    val (_, _, ppdBigK64) = cellStats(sf("sf0.1"), CentroidArtifact64.centers)
    info(f"sf0.01 k=8: pairs/doc=$ppdSmallK8%.1f; sf0.1 k=8: $ppdBigK8%.1f; " +
      f"sf0.1 k=64: $ppdBigK64%.1f")
    // frozen k: per-doc work tracks (even outruns, via cell skew) corpus
    // growth — the measured 11.5× sf1 caveat in BASELINE.md, reproduced
    // at this step (measured 36.5 → 148.8 for 2× vectors)
    assert(ppdBigK8 >= 2.5 * ppdSmallK8,
      "frozen-k counterfactual unexpectedly flat — measurement premise broken")
    // the dial: same corpus, k×8 → per-doc work drops by ~the same factor
    // (measured 148.8 → 15.8, a 9.4× cut)
    assert(ppdBigK64 <= ppdBigK8 / 3.0,
      f"k=64 should cut per-doc work vs k=8, got $ppdBigK64%.1f vs $ppdBigK8%.1f")
  }

  test("all three argmin forms (unrolled expr, broadcast join, fused kernel) are bit-identical") {
    // cellOf (k unrolled into one expression, argmin via struct-sort
    // head) vs assignByJoin (k as broadcast data, argmin via min(struct))
    // vs the round-10 VectorArgminCell kernel (k as one plan reference
    // object, argmin as a generated loop): same ‖c‖² host fold, same
    // left-to-right dot, same lowest-index tie rule → same IEEE doubles
    // → same cells. This is what licenses the strategy switches without
    // touching the oracle twin.
    graft.plans.GraftExtensions.install(spark)
    val emb = graft.sources.Tables.embeddings(spark, sf())
    val viaExpr = emb.select(col("vec_id"),
        SemDedup.cellOf(Similarity.unitNorm(
          Similarity.asDouble(col("embedding"))), CentroidArtifact64.centers)
          .as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaJoin = SemDedup.assignByJoin(emb, CentroidArtifact64.centers)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaKernel = SemDedup.semDedup(emb, tau = 0.40, CentroidArtifact64.centers)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaJoin == viaExpr, "join form diverged from the unrolled expression")
    assert(viaKernel == viaExpr, "kernel form diverged from the unrolled expression")
  }

  test("kernel ≡ join at the decade artifact's k=640 (where unrolling no longer compiles)") {
    graft.plans.GraftExtensions.install(spark)
    val emb = graft.sources.Tables.embeddings(spark, sf("sf0.1"))
    val cents = graft.ops.CentroidArtifact640.centers
    val viaKernel = SemDedup.assignCells(emb, cents)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaJoin = SemDedup.assignByJoin(emb, cents)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaKernel == viaJoin)
  }

  test("decade third point: k∝n holds at n×10 (tools/sf1, k=640)") {
    // The spec's first test pins (n=2 000, k=64) ppd ≈ 15.8. The decade
    // artifact grows BOTH tenfold: (n=20 000, k=640) must keep per-doc
    // pair work flat (measured 15.9 — the k∝n invariant at its third
    // point). tools/sf1 is a regenerated-per-container fixture
    // (tools/make_sf.py), so the test cancels rather than fails when it
    // is absent.
    assume(new java.io.File("tools/sf1/embeddings.parquet").exists(),
      "tools/sf1 fixture not generated in this container")
    val (nBase, _, ppdBase) = cellStats(sf("sf0.1"), CentroidArtifact64.centers)
    val (n10, max10, ppd10) = cellStats("tools/sf1",
      graft.ops.CentroidArtifact640.centers)
    info(f"sf0.1 k=64:      n=$nBase%d ppd=$ppdBase%.1f")
    info(f"tools/sf1 k=640: n=$n10%d maxCell=$max10%d ppd=$ppd10%.1f")
    assert(n10 >= 10 * nBase, "fixture step is not 10× — spec premise broken")
    assert(ppd10 <= 2.0 * ppdBase,
      f"per-doc pair work grew ${ppd10 / ppdBase}%.1f× under k∝n — dial broken")
  }

  test("scaled-k dedup output is consistent: every dup_of points into the same cell") {
    val out = SemDedup.semDedup(
      graft.sources.Tables.embeddings(spark, sf()), tau = 0.40,
      CentroidArtifact64.centers)
    val rows = out.collect().map(r => (r.getLong(0), r.getInt(1),
      if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getBoolean(3)))
    val cellOf = rows.map(r => r._1 -> r._2).toMap
    rows.foreach { case (id, cell, dupOf, kept) =>
      assert(kept == dupOf.isEmpty)
      dupOf.foreach { d =>
        assert(d < id, s"dup_of $d not lower than $id")
        assert(cellOf(d) == cell, s"dup_of $d crosses cells")
      }
    }
  }
}
