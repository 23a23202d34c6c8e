package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Retirement pins for q89's two superseded plans.
  *
  * The catalog row q89_equidepth_histogram (and q89b) now runs the
  * round-10 COUNTING-SORT plan (Shared.equidepthHistogram): hash-agg to
  * the (flag, price) value-domain histogram, coarse-grid two-pass offset
  * index for exact per-value global ranks, closed-form ntile bucket
  * overlap. Both prior forms live HERE as executable counterexamples:
  *
  *  1. the ORIGINAL ntile window (rounds 1–8) — its WindowExec partitions
  *     by the 3-value returnflag, so the sort parallelism ceiling
  *     (3 tasks, each sorting n/3 rows; sf3 measured 4.3× for 3× data)
  *     is visible in the static plan;
  *  2. the INTERIM range-exchange + zipWithIndex form (round 9) — scaled
  *     past the ntile ceiling but its RDD round-trip broke whole-stage
  *     codegen and added a count-pass job; the sf10 decade probe measured
  *     it at 10.9×, the worst in-bar slope of round 9.
  *
  * Row-identity across all THREE forms is asserted below, so each
  * retirement changed performance shape, never semantics.
  */
class EquidepthSpec extends SparkSpec {

  /** The RETIRED rounds-1–8 plan, verbatim: exact equi-depth buckets via
    * a per-returnflag ntile window. Counterexample — do not re-point the
    * catalog at this. */
  private def retiredNtilePlan(d: String) = {
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    Tables.lineitem(spark, d)
      .select(col("l_returnflag"), col("l_extendedprice"),
        col("l_orderkey"), col("l_linenumber"))
      .withColumn("bucket", ntile(8).over(w))
      .groupBy(col("l_returnflag"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        floor(min(col("l_extendedprice")) * 100 + 0.5) / 100 as "lo",
        floor(max(col("l_extendedprice")) * 100 + 0.5) / 100 as "hi")
  }

  /** The RETIRED round-9 plan, verbatim: range exchange + zipWithIndex
    * global index (Corpus.globalIndex), ntile recovered in closed form
    * per row. Counterexample — kept executable so its identity to the
    * shipping counting-sort plan stays proven. */
  private def retiredRangeIndexPlan(d: String) = {
    import graft.ops.Corpus
    val base = Tables.lineitem(spark, d).select(
      col("l_returnflag"), col("l_extendedprice"),
      col("l_orderkey"), col("l_linenumber"))
    val idxed = Corpus.globalIndex(base,
      Seq(col("l_returnflag"), col("l_extendedprice"),
        col("l_orderkey"), col("l_linenumber")),
      numPartitions = 16, indexName = "gidx")
    val offs = base.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("grp_n"))
      .withColumn("off", coalesce(
        sum(col("grp_n")).over(Window.orderBy(col("l_returnflag"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    idxed.join(broadcast(offs), Seq("l_returnflag"))
      .withColumn("idx", col("gidx") - col("off"))
      .withColumn("bucket", expr("""
        CAST(CASE WHEN idx < (grp_n % 8) * (grp_n DIV 8 + 1)
          THEN idx DIV (grp_n DIV 8 + 1)
          ELSE (grp_n % 8) + (idx - (grp_n % 8) * (grp_n DIV 8 + 1)) DIV (grp_n DIV 8)
        END + 1 AS INT)"""))
      .groupBy(col("l_returnflag"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        floor(min(col("l_extendedprice")) * 100 + 0.5) / 100 as "lo",
        floor(max(col("l_extendedprice")) * 100 + 0.5) / 100 as "hi")
  }

  test("both retired plans and the shipping counting-sort plan are row-identical") {
    val d = sf("sf0.01")
    val cols = Seq("l_returnflag", "bucket", "n", "lo", "hi").map(col)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(cols: _*).orderBy(cols: _*).collect().toSeq
    val shipping = rows(
      graft.queries.QueryCatalog.queries("q89_equidepth_histogram")(spark, d))
    assert(shipping.nonEmpty, "equi-depth histogram must be non-empty at sf0.01")
    assert(shipping == rows(retiredNtilePlan(d)),
      "counting-sort plan diverged from the per-row ntile semantics")
    assert(shipping == rows(retiredRangeIndexPlan(d)),
      "counting-sort plan diverged from the range-index form")
  }

  test("counting-sort plan handles tiny groups (grp_n < 8) without dividing by zero") {
    // grp_n DIV 8 = 0 here: the CASE guard must keep every row in the
    // ⌈n/8⌉-size branch. Identity against ntile is the semantics check.
    val d = sf("sf0.001")
    val cols = Seq("l_returnflag", "bucket", "n", "lo", "hi").map(col)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(cols: _*).orderBy(cols: _*).collect().toSeq
    // a 5-row single-flag lineitem: grp_n = 5 < 8 buckets
    val small = Tables.lineitem(spark, d)
      .filter(col("l_returnflag") === "R").limit(5)
    val dir = java.nio.file.Files.createTempDirectory("equidepth_tiny").toFile
    small.write.mode("overwrite")
      .parquet(new java.io.File(dir, "lineitem.parquet").getPath)
    val got = rows(graft.queries.QueryCatalog
      .queries("q89_equidepth_histogram")(spark, dir.getPath))
    val want = rows(retiredNtilePlan(dir.getPath))
    assert(got == want, "tiny-group bucket assignment diverged from ntile")
    assert(got.map(_.getLong(2)).sum == 5L)
  }

  test("retired plans sort corpus rows in few tasks or break codegen; shipping plan does neither") {
    val d = sf()
    // counterexample 1: corpus-sized ntile window hash-partitions ALL
    // lineitem rows by the 3-value l_returnflag — the 3-task sort ceiling
    val retired = retiredNtilePlan(d).queryExecution.executedPlan.toString
    assert(retired.contains("ntile(8)") &&
      retired.contains("hashpartitioning(l_returnflag"),
      s"ntile counterexample lost its shape:\n$retired")
    // counterexample 2: the range-index form carries the zipWithIndex RDD
    // boundary (surfaces as an ExistingRDD scan — the codegen break)
    val rangeIdx = retiredRangeIndexPlan(d).queryExecution.executedPlan.toString
    assert(rangeIdx.contains("ExistingRDD"),
      s"range-index counterexample lost its RDD boundary:\n$rangeIdx")
    // the shipping plan: no per-row ntile window, no RDD boundary, no
    // range exchange — the corpus appears only under a map-side-combined
    // streaming grid aggregate and the semi-join-pruned resolve pass, so
    // no exchange in the plan carries corpus-sized rows
    val shipping = graft.queries.QueryCatalog
      .queries("q89_equidepth_histogram")(spark, d)
      .queryExecution.executedPlan.toString
    assert(!shipping.contains("ntile"),
      s"shipping plan must not run the ntile window:\n$shipping")
    // round 14: the CORPUS path must stay RDD-free (round 9's
    // zipWithIndex RDD boundary broke whole-stage codegen on every
    // lineitem row) — the only permitted ExistingRDD is the
    // localCheckpoint'ed BOUNDED grid index (carries cell counts, never
    // corpus columns)
    val rddScans = "ExistingRDD\\s*\\[[^\\]]*\\]".r.findAllIn(shipping).toList
    assert(rddScans.nonEmpty && rddScans.forall(s =>
      s.contains("rb_n") && !s.contains("l_extendedprice")),
      s"ExistingRDD may only be the bounded grid index, got $rddScans in:\n$shipping")
    assert(!shipping.contains("rangepartitioning"),
      s"shipping plan must not range-exchange the corpus:\n$shipping")
    // round 14 (guide §2.4): the resolve pass keys its ONE exchange on
    // (flag, rb) so the distinct-value aggregate and the per-cell rank
    // window share it — the old (flag, rb, price) aggregate exchange
    // followed by a second (flag, rb) window exchange must stay retired
    assert("hashpartitioning\\(l_returnflag#\\d+, rb#\\d+L?, \\d+\\)".r
      .findFirstIn(shipping).isDefined,
      s"resolve pass must exchange once on (flag, cell):\n$shipping")
    assert(("hashpartitioning\\(l_returnflag#\\d+, rb#\\d+L?, " +
      "l_extendedprice#\\d+").r.findFirstIn(shipping).isEmpty,
      s"resolve pass must not re-exchange by (flag, cell, value):\n$shipping")
    // round 14: the static log grid retired the per-group (vmin, vmax)
    // stats pass — no min/max aggregate over the corpus may reappear
    assert(!shipping.contains("vmin"),
      s"the adaptive-grid stats pass must stay retired:\n$shipping")
  }
}
