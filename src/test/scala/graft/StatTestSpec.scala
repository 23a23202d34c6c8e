package graft

import org.apache.spark.sql.functions._

/** Imperative pins for the statistics rows, each against an INDEPENDENT
  * textbook construction rather than a re-execution of the query's own
  * algebra: q217's histogram identity 2U = Σ a(2·cumB+b) vs average
  * ranks over the sorted pooled sample (U = R₁ − n₁(n₁+1)/2); q218's
  * F/eta² vs the direct two-pass SSB/SSW decomposition; q220's
  * cross-multiplied W₁ vs a per-unit-step CDF integration; q221's
  * range-join inverse CDF vs a per-doc sorted-array quantile lookup
  * (plus the two properties that make quantile normalization correct:
  * within-source monotonicity and exact marginal agreement); q222's
  * grid decomposition vs a direct per-day fold. */
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

  test("q220: cross-multiplied W1 equals per-unit-step CDF integration") {
    val docs = lengths().map { case (src, v) =>
      (v, h60(src, "graft-mwu") % 2 == 0)
    }
    val av = docs.filter(_._2).map(_._1).sorted
    val bv = docs.filterNot(_._2).map(_._1).sorted
    val (n1, n2) = (av.length.toLong, bv.length.toLong)
    assert(n1 > 0 && n2 > 0)
    // integrate |F_A(x) - F_B(x)| over every INTEGER unit step of the
    // support, keeping the integrand rational via cross-multiplication
    val lo = math.min(av.head, bv.head)
    val hi = math.max(av.last, bv.last)
    var num = 0L // Σ_x |cntA(≤x)·n2 − cntB(≤x)·n1| — denominator n1·n2
    (lo until hi).foreach { x =>
      val ca = av.count(_ <= x).toLong
      val cb = bv.count(_ <= x).toLong
      num += math.abs(ca * n2 - cb * n1)
    }
    val r = graft.queries.QueryCatalog.queries("q220_wasserstein_drift")(
      spark, sf()).collect().head
    assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("n2") == n2)
    assert(r.getAs[Long]("w1_num") == num, "W1 numerator mismatch")
    assert(r.getAs[Long]("v_range") == hi - lo)
    assert(r.getAs[Long]("w1_micro") ==
      math.floor(num.toDouble / (n1.toDouble * n2.toDouble)
        * 1000000 + 0.5).toLong)
    assert(r.getAs[Long]("w1_micro") > 0L,
      "zero W1 — the fixture cohorts don't separate, nothing pinned")
  }

  test("q221: range-join inverse CDF equals the sorted-array quantile lookup") {
    val docs = {
      import spark.implicits._
      graft.sources.Tables.documents(spark, sf())
        .select(col("doc_id"), col("source"), col("n_chars").cast("long"))
        .as[(Long, String, Long)].collect()
    }
    val global = docs.map(_._3).sorted
    val n = global.length.toLong
    val bySource = docs.groupBy(_._2)
    val got = graft.queries.QueryCatalog.queries("q221_quantile_norm")(
      spark, sf()).collect()
    assert(got.length == docs.length)
    val gm = got.map(r => r.getAs[Long]("doc_id") -> r).toMap
    docs.foreach { case (id, src, v) =>
      val sv = bySource(src).map(_._3)
      val ns = sv.length.toLong
      val rank = sv.count(_ <= v).toLong // right-continuous F_S(v)·ns
      // smallest global value whose CDF ≥ rank/ns: index ⌈rank·n/ns⌉−1
      val idx = ((rank * n + ns - 1) / ns - 1).toInt
      val expect = global(idx)
      val r = gm(id)
      assert(r.getAs[Long]("mapped") == expect,
        s"doc $id: v=$v rank=$rank/$ns mapped=${r.getAs[Long]("mapped")} expect=$expect")
      assert(r.getAs[Long]("shift") == expect - v)
    }
    // monotonicity within each source: higher value never maps lower
    got.groupBy(_.getAs[String]("source")).values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("n_chars"))
      sorted.sliding(2).foreach {
        case Array(x, y) =>
          assert(x.getAs[Long]("mapped") <= y.getAs[Long]("mapped"))
        case _ =>
      }
    }
    // the operator must actually move mass on the fixture
    assert(got.exists(_.getAs[Long]("shift") != 0L), "identity mapping")
  }

  test("q222: grid decomposition equals the direct per-day fold") {
    val days = {
      import spark.implicits._
      graft.sources.Tables.events(spark, sf())
        .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("cnt"))
        .select(date_format(col("day"), "yyyy-MM-dd"),
          datediff(col("day"), lit("1970-01-01")).cast("long"), col("cnt"))
        .as[(String, Long, Long)].collect().sortBy(_._2)
    }
    val byDow = days.groupBy(_._2 % 7)
    val got = graft.queries.QueryCatalog.queries("q222_seasonal_decomposition")(
      spark, sf()).collect().map(r => r.getAs[String]("day") -> r).toMap
    assert(got.size == days.length && days.nonEmpty)
    days.zipWithIndex.foreach { case ((dayStr, epoch, cnt), i) =>
      val r = got(dayStr)
      val dow = epoch % 7
      assert(r.getAs[Long]("dow") == dow)
      assert(r.getAs[Long]("cnt") == cnt)
      val grp = byDow(dow).map(_._3)
      val seasonal =
        math.floor(grp.sum.toDouble / grp.length * 1000000 + 0.5).toLong
      assert(r.getAs[Long]("seasonal_micro") == seasonal)
      assert(r.getAs[Long]("resid_micro") == cnt * 1000000L - seasonal)
      // trend: centered 7-CALENDAR-DAY range window, null unless all 7
      // days are present (gap-robust — the q154 calendar lesson)
      val win = days.filter(dd => math.abs(dd._2 - epoch) <= 3).map(_._3)
      if (win.length == 7) {
        assert(r.getAs[Long]("trend_micro") ==
          math.floor(win.sum.toDouble / 7.0 * 1000000 + 0.5).toLong)
      } else assert(r.isNullAt(r.fieldIndex("trend_micro")))
      val nd = grp.length.toDouble
      val variance =
        (grp.map(c => c * c).sum.toDouble -
          grp.sum.toDouble * grp.sum.toDouble / nd) / (nd - 1.0)
      if (grp.length >= 3 && variance > 0.0) {
        val z = (cnt * 1000000L - seasonal).toDouble /
          (1000000.0 * math.sqrt(variance))
        assert(r.getAs[Long]("z_micro") ==
          math.floor(z * 1000000 + 0.5).toLong)
        assert(r.getAs[Boolean]("is_anomaly") == (math.abs(z) > 2.0))
      } else {
        assert(r.isNullAt(r.fieldIndex("z_micro")))
        assert(!r.getAs[Boolean]("is_anomaly"))
      }
    }
  }

  test("q222: a gap day nulls the trend window instead of shrinking it") {
    // synthetic 15-day stream with day 8 missing: a ROWS frame would
    // silently average 7 rows-with-events across the gap; the RANGE
    // frame must yield null trend for every day within 3 of the gap
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_gap").toFile
    try {
      val rows = (0 until 15).filter(_ != 8).flatMap { day =>
        (0 until 10).map { k =>
          (java.sql.Timestamp.valueOf(
            java.time.LocalDateTime.of(2024, 3, 1 + day, 12, 0, k)),
            (day * 10 + k).toLong, (day * 100 + k).toLong, "view",
            1.0 + k)
        }
      }
      rows.toDF("ts", "user_id", "event_id", "event_type", "value")
        .coalesce(1).write.parquet(dir.getPath + "/events.parquet")
      val got = graft.queries.QueryCatalog.queries(
        "q222_seasonal_decomposition")(spark, dir.getPath)
        .collect().map(r => r.getAs[String]("day") -> r).toMap
      assert(got.size == 14)
      def trendNull(day: String): Boolean =
        got(day).isNullAt(got(day).fieldIndex("trend_micro"))
      // every day within 3 calendar days of the missing 2024-03-09 must
      // have a null trend
      Seq("2024-03-06", "2024-03-07", "2024-03-08", "2024-03-10",
        "2024-03-11", "2024-03-12")
        .foreach(d => assert(trendNull(d), s"$d has a trend"))
      // a day with a full 7-day neighborhood keeps its trend
      assert(!trendNull("2024-03-05"))
      assert(got("2024-03-05").getAs[Long]("trend_micro") ==
        math.floor(70.0 / 7.0 * 1000000 + 0.5).toLong)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }
}
