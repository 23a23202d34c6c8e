package graft

import org.apache.spark.sql.functions._

/** Imperative pins for the two-sample / omnibus test rows: q217's
  * histogram identity 2U = Σ a(2·cumB+b) is checked against the TEXTBOOK
  * construction (average ranks over the sorted pooled sample, U = R₁ −
  * n₁(n₁+1)/2) — an independent derivation, not a re-execution of the
  * query's own algebra — and q218's F/eta² against the direct
  * two-pass SSB/SSW decomposition. */
class StatTestSpec extends SparkSpec {

  private def h60(key: String, salt: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest((key + salt).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  private def lengths(): Array[(String, Long)] = {
    import spark.implicits._
    graft.sources.Tables.documents(spark, sf())
      .select(col("source"), col("n_chars").cast("long"))
      .as[(String, Long)].collect()
  }

  test("q217: histogram 2U equals textbook average-rank U; z matches") {
    val docs = lengths().map { case (src, v) =>
      (v, h60(src, "graft-mwu") % 2 == 0)
    }
    val n1 = docs.count(_._2).toLong
    val n2 = docs.length.toLong - n1
    // textbook: pooled sort, average ranks for ties, R1 = Σ ranks of A
    val sorted = docs.sortBy(_._1)
    var r1x2 = 0L // 2·R1 so tie half-ranks stay integral
    var i = 0
    while (i < sorted.length) {
      var j = i
      while (j < sorted.length && sorted(j)._1 == sorted(i)._1) j += 1
      val rank2 = (i + 1).toLong + j.toLong // 2 · average rank
      (i until j).foreach(k => if (sorted(k)._2) r1x2 += rank2)
      i = j
    }
    val u2Expected = r1x2 - n1 * (n1 + 1) // 2·U_A
    // tie term from value multiplicities
    val ties3 = docs.groupBy(_._1).values
      .map(g => { val t = g.length.toLong; t * t * t - t }).sum

    val r = graft.queries.QueryCatalog.queries("q217_mannwhitney_u")(
      spark, sf()).collect().head
    assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("n2") == n2)
    assert(n1 > 0 && n2 > 0)
    assert(r.getAs[Long]("u2a") == u2Expected, "2U mismatch vs rank sums")
    assert(r.getAs[Long]("ties3") == ties3)
    val nd = (n1 + n2).toDouble
    val sig2 = n1.toDouble * n2.toDouble / 12.0 *
      ((nd + 1.0) - ties3.toDouble / (nd * (nd - 1.0)))
    assert(r.getAs[Long]("z_micro") ==
      math.floor((u2Expected.toDouble - n1.toDouble * n2.toDouble) /
        (2.0 * math.sqrt(sig2)) * 1000000 + 0.5).toLong)
    assert(r.getAs[Long]("rb_micro") ==
      math.floor((u2Expected.toDouble / (n1.toDouble * n2.toDouble) - 1.0)
        * 1000000 + 0.5).toLong)
  }

  test("q218: F and eta² equal the direct SSB/SSW decomposition") {
    val docs = lengths()
    val groups = docs.groupBy(_._1).values.map(_.map(_._2)).toSeq
    val k = groups.size.toLong
    val n = docs.length.toLong
    val sTot = docs.map(_._2).sum
    val grand = sTot.toDouble / n
    // direct two-pass decomposition — independent of the query's
    // sufficient-statistics identity, except the per-group micro grid
    // q218 rounds sx²/n on (reproduced here to land on the same grid)
    val tMicro = groups.map { g =>
      val sx = g.sum
      math.floor(sx.toDouble * sx.toDouble / g.length.toDouble
        * 1000000 + 0.5).toLong
    }.sum
    val q = docs.map(v => v._2 * v._2).sum.toDouble
    val ssb = tMicro.toDouble / 1000000.0 -
      sTot.toDouble * sTot.toDouble / n.toDouble
    val ssw = q - tMicro.toDouble / 1000000.0
    // sanity: the micro-gridded SSB/SSW agree with the pure-double
    // textbook decomposition to within the grid resolution
    val ssbRef = groups.map { g =>
      val m = g.sum.toDouble / g.length
      g.length * (m - grand) * (m - grand)
    }.sum
    assert(math.abs(ssb - ssbRef) < 1e-3 * math.max(1.0, ssbRef),
      s"micro-grid SSB $ssb vs textbook $ssbRef")
    val f = (ssb / (k - 1).toDouble) / (ssw / (n - k).toDouble)

    val r = graft.queries.QueryCatalog.queries("q218_anova_f")(
      spark, sf()).collect().head
    assert(r.getAs[Long]("k") == k && r.getAs[Long]("n") == n)
    assert(r.getAs[Long]("ssb_centi") == math.floor(ssb * 100 + 0.5).toLong)
    assert(r.getAs[Long]("ssw_centi") == math.floor(ssw * 100 + 0.5).toLong)
    assert(r.getAs[Long]("f_micro") ==
      math.floor(f * 1000000 + 0.5).toLong)
    assert(r.getAs[Long]("eta2_micro") ==
      math.floor(ssb / (ssb + ssw) * 1000000 + 0.5).toLong)
    assert(k > 1 && r.getAs[Long]("f_micro") != 0L)
  }
}
