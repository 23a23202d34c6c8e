package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import org.scalacheck.Gen.Parameters

import graft.ops.Text

/** Cluster resolution (`Text.connectedComponents` / `dedupClusters`):
  * the distributed min-label + pointer-jumping iteration must reach the
  * exact same fixpoint as a naive in-memory union-find, on shapes that
  * stress it (long chains = worst-case diameter, random graphs, isolated
  * nodes, self-loops). */
class DedupClusterSpec extends SparkSpec {
  import spark.implicits._

  private def unionFind(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // min-id canonicalization: path-compress then relabel roots to the
    // component min (roots already are the min because we always hang the
    // larger root under the smaller one)
    nodes.map(n => n -> find(n)).toMap
  }

  private def ccOf(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Text.connectedComponents(edges.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("long chain collapses to its min id (worst-case diameter)") {
    val chain = (0L until 40L).sliding(2).map(s => (s(1), s(0))).toSeq
    val got = ccOf(chain)
    assert(got.size == 40 && got.values.forall(_ == 0L))
  }

  test("random graphs agree with union-find") {
    val seed0 = rng.Seed(7L)
    val gEdge = Gen.zip(Gen.chooseNum(0L, 60L), Gen.chooseNum(0L, 60L))
    val edges = Iterator.iterate((gEdge.pureApply(Parameters.default, seed0), seed0.next)) {
      case (_, s) => (gEdge.pureApply(Parameters.default, s), s.next)
    }.map(_._1).take(120).toList
    // connectedComponents drops self-loops, so the naive model must too:
    // a node appearing ONLY in self-loops is not part of any edge
    val real = edges.filter(e => e._1 != e._2)
    val nodes = real.flatMap(e => Seq(e._1, e._2)).distinct
    val expected = unionFind(nodes, real)
    val got = ccOf(edges)
    assert(got == expected)
  }

  test("dedupClusters: singletons keep themselves; sizes and keepers exact") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("doc_id")
    val pairs = Seq((2L, 5L), (5L, 7L), (3L, 4L)).toDF("doc_a", "doc_b")
    val got = Text.dedupClusters(docs, pairs)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    val expected = Map(
      1L -> ((1L, 1L, true)),
      2L -> ((2L, 3L, true)), 5L -> ((2L, 3L, false)), 7L -> ((2L, 3L, false)),
      3L -> ((3L, 2L, true)), 4L -> ((3L, 2L, false)),
      6L -> ((6L, 1L, true)))
    assert(got == expected)
  }

  test("empty pair set yields all-singleton clusters") {
    val docs = Seq(10L, 11L).toDF("doc_id")
    val pairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val got = Text.dedupClusters(docs, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    assert(got == Set((10L, 10L, 1L, true), (11L, 11L, 1L, true)))
  }

  test("q202 recursive BFS agrees with q46 components: every reached doc shares a seed's cluster") {
    // The WITH RECURSIVE radius query and the iterative pointer-jumping
    // components run over the SAME edge set; radius-reached docs (dist>=1)
    // must therefore lie in a cluster that contains at least one seed, and
    // dist 0 must count exactly the seeds.
    val dir = sf()
    val seeds = graft.sources.Tables.documents(spark, dir)
      .filter(col("doc_id") % 97 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val clusters = graft.queries.QueryCatalog.queries("q46_dedup_clusters")(spark, dir)
      .select("doc_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val seedClusters = seeds.map(clusters)
    val radius = graft.queries.QueryCatalog.queries("q202_recursive_radius")(spark, dir)
      .collect()
      .map(r => r.getAs[Int]("dist") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("min_doc"), r.getAs[Long]("max_doc"))))
      .toMap
    assert(radius(0)._1 == seeds.size.toLong)
    // membership: every doc within the radius shares a cluster with a seed.
    // Check via cluster mass: the non-seed docs BFS reaches can never
    // exceed the non-seed docs living in seed-containing clusters.
    val seedClusterSizes = clusters.values.groupBy(identity)
      .collect { case (cid, g) if seedClusters(cid) => g.size.toLong }.sum
    val reachedMass = radius.collect { case (d, (n, _, _)) if d >= 1 => n }.sum
    assert(reachedMass <= seedClusterSizes - seeds.size,
      s"BFS reached $reachedMass docs but seed clusters only hold ${seedClusterSizes - seeds.size} non-seed docs")
  }
}
