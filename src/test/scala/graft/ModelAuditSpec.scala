package graft

import org.apache.spark.sql.functions._

/** Imperative pins for the model-shaped rows: q223's Kneser–Ney scores
  * against a hash-map LM trained and applied in plain Scala, q224's
  * stationary distribution against a direct matrix power iteration on
  * the same micro grid (plus the mass-conservation and convergence
  * properties the query itself can't assert), q225's confident joint
  * against per-row threshold logic. */
class ModelAuditSpec extends SparkSpec {

  private def h60(key: String, salt: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest((key + salt).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  test("q223: engine scores == hash-map Kneser-Ney LM") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf())
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect()
    def pairsOf(text: String): Seq[(String, String)] = {
      val t = text.split(" ").filter(_.nonEmpty)
      if (t.length < 2) Seq.empty else t.init.zip(t.tail).toSeq
    }
    val (trainDocs, scoreDocs) =
      docs.partition(d => h60(d._2, "graft-kn") % 2 == 0)
    val trainPairs = trainDocs.flatMap(d => pairsOf(d._3))
    val c2 = trainPairs.groupBy(identity).map { case (k, v) =>
      k -> v.length.toLong }
    val c1 = c2.groupBy(_._1._1).map { case (w1, m) =>
      w1 -> (m.values.sum, m.size.toLong) } // (context total, N1+(w1,·))
    val n1r = c2.groupBy(_._1._2).map { case (w2, m) => w2 -> m.size.toLong }
    val nbig = c2.size.toLong
    assert(nbig > 0)

    val expect = scoreDocs.flatMap { d =>
      val ps = pairsOf(d._3)
      if (ps.isEmpty) None
      else {
        val lps = ps.map { case (w1, w2) =>
          val pc = n1r.getOrElse(w2, 0L).toDouble / nbig.toDouble
          val p = c1.get(w1) match {
            case None => pc
            case Some((tot, n1f)) =>
              (math.max(c2.getOrElse((w1, w2), 0L).toDouble - 0.75, 0.0) +
                0.75 * n1f.toDouble * pc) / tot.toDouble
          }
          math.floor(math.log(math.max(p, 1e-9)) * 1000000 + 0.5).toLong
        }
        Some(d._1 -> (lps.length.toLong, lps.sum,
          math.floor(lps.sum.toDouble / lps.length.toDouble + 0.5).toLong))
      }
    }.toMap

    val got = graft.queries.QueryCatalog.queries("q223_kneser_ney_lm")(
      spark, sf()).collect()
    assert(got.length == expect.size && got.nonEmpty)
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (n, sum, mean) = expect(id)
      assert(r.getAs[Long]("n_pairs") == n, s"n_pairs for $id")
      assert(r.getAs[Long]("sum_lp") == sum, s"sum_lp for $id")
      assert(r.getAs[Long]("mean_lp_micro") == mean, s"mean for $id")
    }
    // KN must actually discriminate on the fixture: scores not constant
    assert(expect.values.map(_._3).toSet.size > 1, "degenerate LM scores")
  }

  test("q224: engine pi == direct micro power iteration; mass conserved") {
    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, sf())
      .select(col("user_id"), col("event_id"), col("event_type"))
      .as[(Long, Long, String)].collect()
    val cells = ev.groupBy(_._1).values.flatMap { rows =>
      val o = rows.sortBy(_._2).map(_._3)
      o.init.zip(o.tail)
    }.toSeq.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val marg = ev.groupBy(_._3).map { case (t, rs) => t -> rs.length.toLong }
    val rowTot = cells.groupBy(_._1._1).map { case (i, m) =>
      i -> m.values.sum }
    val states = marg.keySet.toSeq.sorted
    // self-loop for FROM-less states
    val mat: Map[(String, String), (Long, Long)] =
      cells.map { case ((i, j), n) => (i, j) -> (n, rowTot(i)) } ++
        states.filterNot(rowTot.contains).map(t => (t, t) -> (1L, 1L))
    var pi: Map[String, Long] = states.map(t =>
      t -> math.floor(1000000.0 / states.size).toLong).toMap
    (1 to 8).foreach { _ =>
      val next = scala.collection.mutable.Map[String, Long]()
      mat.foreach { case ((i, j), (n, r)) =>
        val term = math.floor(
          pi.getOrElse(i, 0L).toDouble * n.toDouble / r.toDouble + 0.5).toLong
        next(j) = next.getOrElse(j, 0L) + term
      }
      pi = next.toMap
    }
    val mt = marg.values.sum
    val got = graft.queries.QueryCatalog.queries("q224_markov_stationary")(
      spark, sf()).collect()
    assert(got.length == pi.size && got.nonEmpty)
    got.foreach { r =>
      val t = r.getAs[String]("event_type")
      assert(r.getAs[Long]("pi_micro") == pi(t), s"pi for $t")
      val emp = math.floor(
        marg(t).toDouble / mt.toDouble * 1000000 + 0.5).toLong
      assert(r.getAs[Long]("empirical_micro") == emp)
      assert(r.getAs[Long]("gap_micro") ==
        math.abs(pi(t) - emp))
    }
    // mass conservation on the micro grid: drift bounded by rounding
    val mass = got.map(_.getAs[Long]("pi_micro")).sum
    assert(math.abs(mass - 1000000L) <= 8L * mat.size,
      s"pi mass $mass drifted beyond the rounding envelope")
    // convergence: one more step moves every state by < 1% of its mass
    val next = {
      val n9 = scala.collection.mutable.Map[String, Long]()
      mat.foreach { case ((i, j), (n, r)) =>
        n9(j) = n9.getOrElse(j, 0L) +
          math.floor(pi.getOrElse(i, 0L).toDouble * n.toDouble
            / r.toDouble + 0.5).toLong
      }
      n9.toMap
    }
    states.foreach { t =>
      val a = pi.getOrElse(t, 0L)
      val b = next.getOrElse(t, 0L)
      assert(math.abs(a - b) <= math.max(a / 100, 200L),
        s"state $t still moving after 8 steps: $a -> $b")
    }
  }

  test("q225: confident joint == per-row threshold logic") {
    import spark.implicits._
    val w = Array.tabulate(64) { j =>
      (scala.util.hashing.MurmurHash3.productHash((j, "graft-linear")) % 1000) / 1000.0
    }
    val rows = graft.sources.Tables.embeddings(spark, sf())
      .select((col("label") % 2).cast("long"),
        transform(col("embedding"), x => x.cast("double")))
      .as[(Long, Seq[Double])].collect()
    val scored = rows.map { case (y, emb) =>
      var z = -0.1
      var i = 0
      while (i < math.min(emb.length, 64)) { z += emb(i) * w(i); i += 1 }
      (y, math.floor(1.0 / (1.0 + math.exp(-z)) * 1000000 + 0.5).toLong)
    }
    val p1 = scored.filter(_._1 == 1L).map(_._2)
    val p0 = scored.filter(_._1 == 0L).map(_._2.unary_- + 1000000L)
    val t1 = math.floor(p1.sum.toDouble / p1.length.toDouble + 0.5).toLong
    val t0 = math.floor(p0.sum.toDouble / p0.length.toDouble + 0.5).toLong
    val joint = scored.map { case (y, p) =>
      val c1 = p >= t1
      val c0 = 1000000L - p >= t0
      val guess =
        if (c1 && c0) { if (p >= 1000000L - p) 1L else 0L }
        else if (c1) 1L else if (c0) 0L else -1L
      (y, guess)
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val got = graft.queries.QueryCatalog.queries("q225_label_noise")(
      spark, sf()).collect()
    assert(got.length == joint.size && got.nonEmpty)
    got.foreach { r =>
      val k = (r.getAs[Long]("y"), r.getAs[Long]("guess"))
      assert(r.getAs[Long]("cnt") == joint(k), s"cell $k")
      assert(r.getAs[Boolean]("is_noise") == (k._2 >= 0 && k._2 != k._1))
    }
    // the audit must find SOME confidently mislabeled rows on the fixture
    assert(joint.exists { case ((y, g), n) => g >= 0 && g != y && n > 0 },
      "no off-diagonal mass — the noise audit pins nothing")
  }

  test("q226: engine weights == imperative excess-loss exponential tilt") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf())
      .select(col("source"), col("text")).as[(String, String)].collect()
    def pairsOf(text: String): Seq[(String, String)] = {
      val t = text.split(" ").filter(_.nonEmpty)
      if (t.length < 2) Seq.empty else t.init.zip(t.tail).toSeq
    }
    val all = docs.flatMap { case (src, txt) => pairsOf(txt).map(src -> _) }
    val c2 = all.map(_._2).groupBy(identity).map { case (k, v) =>
      k -> v.length.toLong }
    val c1 = c2.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    val vocab = all.map(_._2._2).distinct.length.toLong
    val perSrc = all.groupBy(_._1).map { case (src, ps) =>
      val lps = ps.map { case (_, (w1, w2)) =>
        math.floor(math.log((c2((w1, w2)).toDouble + 1.0) /
          (c1(w1) + vocab).toDouble) * 1000000 + 0.5).toLong
      }
      src -> (lps.length.toLong, lps.sum)
    }
    val totLp = perSrc.values.map(_._2).sum
    val totPairs = perSrc.values.map(_._1).sum
    val base = math.floor(-totLp.toDouble / totPairs.toDouble + 0.5).toLong
    val tilt = perSrc.map { case (src, (n, sum)) =>
      val loss = math.floor(-sum.toDouble / n.toDouble + 0.5).toLong
      val excess = math.max(loss - base, 0L)
      val e = math.floor(math.exp(2.0 * excess.toDouble / 1000000.0)
        * 1000000 + 0.5).toLong
      src -> (n, loss, excess, e)
    }
    val totE = tilt.values.map(_._4).sum

    val got = graft.queries.QueryCatalog.queries("q226_doremi_weights")(
      spark, sf()).collect()
    assert(got.length == tilt.size && got.nonEmpty)
    got.foreach { r =>
      val src = r.getAs[String]("source")
      val (n, loss, excess, e) = tilt(src)
      assert(r.getAs[Long]("n_pairs") == n, s"pairs for $src")
      assert(r.getAs[Long]("loss_micro") == loss, s"loss for $src")
      assert(r.getAs[Long]("excess_micro") == excess, s"excess for $src")
      assert(r.getAs[Long]("weight_micro") ==
        math.floor(e.toDouble / totE.toDouble * 1000000 + 0.5).toLong,
        s"weight for $src")
      assert(r.getAs[Long]("share_micro") ==
        math.floor(n.toDouble / totPairs.toDouble * 1000000 + 0.5).toLong)
    }
    // weights are a distribution (up to per-row rounding) and the tilt
    // actually moved at least one source off its pair share
    val mass = got.map(_.getAs[Long]("weight_micro")).sum
    assert(math.abs(mass - 1000000L) <= got.length.toLong)
    assert(got.exists(r => math.abs(r.getAs[Long]("weight_micro") -
      r.getAs[Long]("share_micro")) > 1000L),
      "tilt is a no-op on the fixture — nothing pinned")
  }
}
