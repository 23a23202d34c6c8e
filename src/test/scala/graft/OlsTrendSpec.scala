package graft

import org.apache.spark.sql.functions._

/** q201: closed-form per-group OLS over daily event counts, pinned
  * against an imperative least-squares reference computed from the same
  * collected daily aggregates. The catalog query must agree with the
  * textbook formulas on every group, and the sufficient-statistic
  * formulation must be exactly the two-shuffle plan ShuffleBudget pins. */
class OlsTrendSpec extends SparkSpec {

  test("q201: slope/intercept/r2 match the imperative least-squares fit per group") {
    import spark.implicits._
    val daily = graft.sources.Tables.events(spark, sf())
      .select(col("event_type"),
        datediff(to_date(col("ts")), to_date(lit("1970-01-01"))).cast("long").as("x"))
      .groupBy("event_type", "x").agg(count(lit(1)).as("y"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1)

    def micro(num: Double, den: Double): Long =
      if (den == 0) 0L else math.floor(num / den * 1000000 + 0.5).toLong

    val expect = daily.map { case (tpe, rows) =>
      val n = rows.length.toLong
      val sx = rows.map(_._2).sum; val sy = rows.map(_._3).sum
      val sxx = rows.map(r => r._2 * r._2).sum
      val sxy = rows.map(r => r._2 * r._3).sum
      val syy = rows.map(r => r._3 * r._3).sum
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      val dy = n * syy - sy * sy
      val r2 = if (den == 0 || dy == 0) 0L
        else math.floor(num.toDouble * num.toDouble / (den.toDouble * dy.toDouble) * 1000000 + 0.5).toLong
      tpe -> ((n, micro(num.toDouble, den.toDouble),
        micro((sy * sxx - sx * sxy).toDouble, den.toDouble), r2))
    }

    val got = graft.queries.QueryCatalog.queries("q201_ols_trend")(spark, sf())
      .collect()
      .map(r => r.getAs[String]("event_type") -> ((r.getAs[Long]("n_days"),
        r.getAs[Long]("slope_micro"), r.getAs[Long]("intercept_micro"),
        r.getAs[Long]("r2_micro")))).toMap

    assert(got == expect, s"got $got\nexpected $expect")
    assert(got.nonEmpty)
    // a fit over >= 2 distinct days must produce a non-degenerate r2 range
    assert(got.values.forall { case (_, _, _, r2) => r2 >= 0L && r2 <= 1000000L })
  }
}
