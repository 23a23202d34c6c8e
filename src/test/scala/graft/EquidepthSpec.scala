package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-9 retirement pin for q89's original ntile-window plan.
  *
  * The catalog row q89_equidepth_histogram now runs the closed-form
  * range-exchange plan (Shared.equidepthHistogram, shared with q89b); the
  * ntile form it replaced lives HERE, as a counterexample that stays
  * executable:
  *
  *  1. row-identity — the retired plan and the shipping plan produce
  *     bit-identical results, so the retirement changed performance
  *     shape, never semantics (the original q89→q89b proof, kept alive);
  *  2. the reason it was retired — its WindowExec partitions by the
  *     3-value returnflag, so the sort parallelism ceiling (3 tasks,
  *     each sorting n/3 rows; sf3 measured 4.3× for 3× data) is visible
  *     in the static plan, while the shipping plan's only corpus-sized
  *     exchange is the range repartition whose parallelism scales with
  *     numPartitions, not with key cardinality.
  */
class EquidepthSpec extends SparkSpec {

  /** The RETIRED plan, verbatim from rounds 1–8's q89: exact equi-depth
    * buckets via a per-returnflag ntile window. Kept as a counterexample
    * — do not re-point the catalog at this. */
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

  test("retired ntile plan and shipping closed-form plan are row-identical") {
    val d = sf("sf0.01")
    val shipping = graft.queries.QueryCatalog.queries("q89_equidepth_histogram")(spark, d)
    val retired = retiredNtilePlan(d)
    val cols = Seq("l_returnflag", "bucket", "n", "lo", "hi").map(col)
    val a = shipping.select(cols: _*).orderBy(cols: _*).collect().toSeq
    val b = retired.select(cols: _*).orderBy(cols: _*).collect().toSeq
    assert(a.nonEmpty, "equi-depth histogram must be non-empty at sf0.01")
    assert(a == b, "retirement must not change a single row")
  }

  test("retired plan sorts corpus rows inside a 3-value hash partition; shipping plan does not") {
    val d = sf()
    // the retired plan's corpus-sized ntile window hash-partitions ALL
    // lineitem rows by l_returnflag — the 3-task sort ceiling, visible
    // statically as the ntile WindowExec over that exchange
    val retired = retiredNtilePlan(d).queryExecution.executedPlan.toString
    assert(retired.contains("ntile(8)") &&
      retired.contains("hashpartitioning(l_returnflag"),
      s"counterexample lost its shape:\n$retired")
    // the shipping plan recovers the same buckets with NO ntile window:
    // its corpus-sized exchange is the RANGE repartition inside
    // Corpus.globalIndex, which sits behind the zipWithIndex RDD
    // boundary — downstream it surfaces as the ExistingRDD scan (the
    // range exchange itself is asserted on the pre-zip lineage below);
    // the l_returnflag hash exchanges that remain carry only
    // partial-aggregate rows (3 per input partition), never sorted
    // corpus rows
    val shipping = graft.queries.QueryCatalog
      .queries("q89_equidepth_histogram")(spark, d)
      .queryExecution.executedPlan.toString
    assert(shipping.contains("ExistingRDD"),
      s"shipping plan must carry the globalIndex RDD boundary:\n$shipping")
    assert(!shipping.contains("ntile"),
      s"shipping plan must not run the ntile window:\n$shipping")
    // the exchange feeding that boundary IS a range partition: assert it
    // on the pre-zip lineage directly
    val prezip = Tables.lineitem(spark, d)
      .select(col("l_returnflag"), col("l_extendedprice"),
        col("l_orderkey"), col("l_linenumber"))
      .repartitionByRange(16, col("l_returnflag"), col("l_extendedprice"),
        col("l_orderkey"), col("l_linenumber"))
      .sortWithinPartitions(col("l_returnflag"), col("l_extendedprice"),
        col("l_orderkey"), col("l_linenumber"))
      .queryExecution.executedPlan.toString
    assert(prezip.contains("rangepartitioning"),
      s"globalIndex's exchange must be a range partition:\n$prezip")
  }
}
