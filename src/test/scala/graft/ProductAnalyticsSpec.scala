package graft

import org.apache.spark.sql.functions._

/** q204/q207/q209: the closed-form dataflow rewrites pinned against the
  * imperative algorithms they replace. Each catalog query avoids a
  * sequential scan (CUSUM's recursion, the funnel's stateful pass, the
  * kappa formula) with windows/aggregates; these tests recompute the
  * textbook form per partition key from collected rows and require exact
  * agreement — the same discipline as OlsTrendSpec/BpeMergeSpec. */
class ProductAnalyticsSpec extends SparkSpec {

  test("q204: window-form CUSUM equals the imperative Page recursion per type") {
    import spark.implicits._
    val daily = graft.sources.Tables.events(spark, sf())
      .select(col("event_type"),
        datediff(to_date(col("ts")), to_date(lit("1970-01-01"))).cast("long").as("x"))
      .groupBy("event_type", "x").agg(count(lit(1)).as("y"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1)

    // imperative one-sided CUSUM in the same n_days-scaled integer units:
    // S_t = max(0, S_{t-1} + (y_t*n - total))
    val expect: Map[(String, Long), (Long, Boolean)] = daily.flatMap {
      case (tpe, rows) =>
        val sorted = rows.sortBy(_._2)
        val n = sorted.length.toLong
        val total = sorted.map(_._3).sum
        var s = 0L
        sorted.map { case (_, x, y) =>
          s = math.max(0L, s + (y * n - total))
          (tpe, x) -> ((s, s > 2 * total))
        }
    }

    val got = graft.queries.QueryCatalog.queries("q204_cusum_changepoint")(spark, sf())
      .collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val k = (r.getAs[String]("event_type"), r.getAs[Long]("day_epoch"))
      val (cs, alarm) = expect(k)
      assert(r.getAs[Long]("cusum_scaled") == cs, s"cusum mismatch at $k")
      assert(r.getAs[Boolean]("alarm") == alarm, s"alarm mismatch at $k")
    }
  }

  test("q207: chained-window funnel equals the imperative per-user sequential scan") {
    import spark.implicits._
    val events = graft.sources.Tables.events(spark, sf())
      .select(col("user_id"), col("event_id"), col("event_type"))
      .as[(Long, Long, String)].collect()
      .groupBy(_._1)

    var nView = 0L; var nClick = 0L; var nPurchase = 0L
    events.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      var v = Option.empty[Long]; var c = Option.empty[Long]
      var p = Option.empty[Long]
      sorted.foreach { case (_, id, tpe) =>
        tpe match {
          case "view" if v.isEmpty => v = Some(id)
          case "click" if c.isEmpty && v.exists(_ < id) => c = Some(id)
          case "purchase" if p.isEmpty && c.exists(_ < id) => p = Some(id)
          case _ =>
        }
      }
      if (v.isDefined) nView += 1
      if (c.isDefined) nClick += 1
      if (p.isDefined) nPurchase += 1
    }

    val row = graft.queries.QueryCatalog.queries("q207_funnel")(spark, sf())
      .collect().head
    assert(row.getAs[Long]("n_users") == events.size.toLong)
    assert(row.getAs[Long]("n_view") == nView)
    assert(row.getAs[Long]("n_click_after_view") == nClick)
    assert(row.getAs[Long]("n_purchase_chain") == nPurchase)
    // the funnel must be monotone by construction
    assert(nView >= nClick && nClick >= nPurchase)
  }

  test("q211: transition matrix equals the imperative per-user sequence walk") {
    import spark.implicits._
    val seqs = graft.sources.Tables.events(spark, sf())
      .select(col("user_id"), col("event_id"), col("event_type"))
      .as[(Long, Long, String)].collect()
      .groupBy(_._1)

    val counts = collection.mutable.Map.empty[(String, String), Long]
    seqs.foreach { case (_, rows) =>
      rows.sortBy(_._2).map(_._3).toSeq.sliding(2).foreach {
        case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + 1
        case _ =>
      }
    }
    val rowTotals = counts.groupBy(_._1._1).map { case (p, m) => p -> m.values.sum }
    val entTerms = counts.map { case ((p, n), c) =>
      val pr = c.toDouble / rowTotals(p)
      (p, n) -> math.floor(-pr * math.log(pr) * 1000000 + 0.5).toLong
    }
    val entropy = entTerms.groupBy(_._1._1).map { case (p, m) => p -> m.values.sum }

    val got = graft.queries.QueryCatalog.queries("q211_markov_transitions")(spark, sf())
      .collect()
    assert(got.length == counts.size && got.nonEmpty)
    got.foreach { r =>
      val k = (r.getAs[String]("prev_type"), r.getAs[String]("next_type"))
      assert(r.getAs[Long]("n") == counts(k), s"count at $k")
      assert(r.getAs[Long]("row_total") == rowTotals(k._1), s"row total at $k")
      assert(r.getAs[Long]("p_micro") ==
        math.floor(counts(k).toDouble / rowTotals(k._1) * 1000000 + 0.5).toLong,
        s"p at $k")
      assert(r.getAs[Long]("row_entropy_micro") == entropy(k._1), s"entropy at $k")
    }
  }

  test("q209: aggregate kappa equals the direct formula over collected decisions") {
    val row = graft.queries.QueryCatalog.queries("q209_rater_agreement")(spark, sf())
      .collect().head
    val n = row.getAs[Long]("n")
    val n11 = row.getAs[Long]("n11"); val n10 = row.getAs[Long]("n10")
    val n01 = row.getAs[Long]("n01"); val n00 = row.getAs[Long]("n00")
    assert(n == n11 + n10 + n01 + n00)
    val po = (n11 + n00).toDouble / n
    val pe = ((n11 + n10).toDouble * (n11 + n01) +
      (n01 + n00).toDouble * (n10 + n00)) / (n.toDouble * n)
    val kappa = if (pe == 1.0) 0L
      else math.floor((po - pe) / (1 - pe) * 1000000 + 0.5).toLong
    // common-denominator BIGINT form in the query == the float textbook
    // form within 1 micro (the integer form avoids double cancellation,
    // so allow the single-ulp divergence the rewrite exists to remove)
    assert(math.abs(row.getAs[Long]("kappa_micro") - kappa) <= 1,
      s"kappa ${row.getAs[Long]("kappa_micro")} vs textbook $kappa")
    // both raters must actually disagree somewhere on the fixture, or the
    // test pins nothing
    assert(n10 + n01 > 0, "raters never disagree on the fixture")
    assert(n11 > 0 && n00 > 0, "degenerate marginals on the fixture")
  }
}
