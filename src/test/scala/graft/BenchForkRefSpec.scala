package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the fork-reference parser behind Bench's self-correcting outlier
  * recheck. Round 13's parser required the compact Scala serialization
  * (`"queries":{`, `"name":1.23`); the newest committed reference at the
  * time (BENCH_r12_full.json) was Python-serialized with `": "`
  * separators, so the parser matched nothing and the recheck never fired
  * — three contention phantoms (q226 at 6.67 s vs 0.87 s same-box) stood
  * uncorrected in the committed driver artifact. Both serializations must
  * parse identically from now on. */
class BenchForkRefSpec extends AnyFunSuite {

  private val compact =
    """{"metric":"total","value":3.0,"unit":"sec","mode":"forked","queries":{"q01_pricing_summary":0.723,"q02_filter_project":0.431,"q99_failed":-1.0},"errors":{},"sf":"/root/testdata/sf0.1"}"""

  private val pythonStyle =
    """{"metric": "total", "value": 3.0, "unit": "sec", "mode": "forked", "queries": {"q01_pricing_summary": 0.723, "q02_filter_project": 0.431, "q99_failed": -1.0}, "errors": {}, "sf": "/root/testdata/sf0.1", "note": "x"}"""

  test("compact Scala serialization parses") {
    val m = Bench.parseForkRef(compact, "/root/testdata/sf0.1")
    assert(m === Map("q01_pricing_summary" -> 0.723, "q02_filter_project" -> 0.431))
  }

  test("Python json.dump serialization (': ' separators) parses identically") {
    val m = Bench.parseForkRef(pythonStyle, "/root/testdata/sf0.1")
    assert(m === Map("q01_pricing_summary" -> 0.723, "q02_filter_project" -> 0.431))
  }

  test("the actual committed reference artifact parses non-empty") {
    val f = new java.io.File("BENCH_r12_full.json")
    assume(f.exists(), "committed reference not present")
    val txt = new String(java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
    val m = Bench.parseForkRef(txt, "/root/testdata/sf0.1")
    assert(m.size > 200, s"expected the full catalog, got ${m.size} entries")
    assert(m.values.forall(_ > 0))
  }

  test("scale-factor mismatch yields an empty reference (sf guard)") {
    assert(Bench.parseForkRef(pythonStyle, "/root/testdata/sf1").isEmpty)
  }

  test("failed entries (-1) are dropped") {
    val m = Bench.parseForkRef(compact, "/root/testdata/sf0.1")
    assert(!m.contains("q99_failed"))
  }
}
