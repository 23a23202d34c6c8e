package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.QueryCatalog

/** Pins the catalog's canonical-vs-pedagogical pair metadata (Q.scalePath /
  * Q.scaleTwin): the set of non-scale-path rows is FROZEN here, every
  * scaleTwin must resolve to an existing catalog row that is itself a
  * scale path, and a non-scale-path row must always name its twin —
  * the catalog never ships a scale-weak plan without a machine-readable
  * pointer to the form that replaces it. Growing the frozen set is a
  * reviewed decision (the row's Scaladoc must say WHY the pedagogical
  * form is kept), not an accident. */
class CatalogMetadataSpec extends AnyFunSuite {

  test("non-scale-path rows are exactly the frozen pedagogical set") {
    val expected = Set(
      // Expand-based multi-column countDistinct → q31b's re-aggregation
      "q31_distinct_agg",
      // 10-value fixture label block (quadratic in-block pairs) → learned
      // k∝n cells
      "q32_embedding_neardup",
      // exact day×window re-expansion → per-day sketch partials + merge
      "q82_rolling_dau",
      // frozen k=8 centroid artifact (fixed cell count) → k∝n artifact
      "q164_semdedup")
    val actual = QueryCatalog.all.filter(!_.scalePath).map(_.name).toSet
    assert(actual == expected,
      s"non-scale-path set drifted: +${actual -- expected} -${expected -- actual}")
  }

  test("every scaleTwin resolves to an existing scale-path row") {
    val byName = QueryCatalog.all.map(q => q.name -> q).toMap
    QueryCatalog.all.foreach { q =>
      q.scaleTwin.foreach { t =>
        assert(byName.contains(t), s"${q.name}: scaleTwin $t is not a catalog row")
        assert(byName(t).scalePath,
          s"${q.name}: scaleTwin $t must itself be a scale path")
        assert(t != q.name, s"${q.name}: scaleTwin must not be self")
      }
      if (!q.scalePath)
        assert(q.scaleTwin.nonEmpty,
          s"${q.name}: a non-scale-path row must name its scale twin")
    }
  }
}
