package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{RollingHash, VectorDot}

/** SparkSessionExtensions entry point: makes graft's native expressions
  * available in any session via
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  * (the standard injection hook — SURVEY §2.10: custom `Rule`s and
  * `SparkStrategy`s are deliberately NOT needed for reference parity, so
  * the only injection is the function registry).
  *
  * For an already-running session (tests, notebooks) use `install(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.rollingHashDescriptor)
    e.injectFunction(GraftExtensions.vectorDotDescriptor)
    e.injectFunction(GraftExtensions.vectorNormDescriptor)
    e.injectFunction(GraftExtensions.frequentItemsDescriptor)
    e.injectFunction(GraftExtensions.hllDistinctDescriptor)
    GraftExtensions.hllStoredDescriptors.foreach(e.injectFunction)
    GraftExtensions.thetaDescriptors.foreach(e.injectFunction)
    GraftExtensions.vectorAggDescriptors.foreach(e.injectFunction)
    GraftExtensions.bloomDescriptors.foreach(e.injectFunction)
    GraftExtensions.cmsDescriptors.foreach(e.injectFunction)
    GraftExtensions.kllDescriptors.foreach(e.injectFunction)
    GraftExtensions.sketchMergeDescriptors.foreach(e.injectFunction)
    e.injectFunction(GraftExtensions.zValueDescriptor)
    e.injectFunction(GraftExtensions.topkDescriptor)
  }
}

object GraftExtensions {
  private[plans] val rollingHashDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("rolling_hash"),
    new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
    (exprs: Seq[Expression]) => RollingHash(exprs.head))

  private[plans] val vectorDotDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[graft.functions.VectorDot].getName, "vec_dot"),
    (exprs: Seq[Expression]) => graft.functions.VectorDot(exprs.head, exprs(1)))

  private[plans] val vectorNormDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_norm"),
    new ExpressionInfo(classOf[graft.functions.VectorNorm].getName, "vec_norm"),
    (exprs: Seq[Expression]) => graft.functions.VectorNorm(exprs.head))

  private[plans] val frequentItemsDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("frequent_items"),
    new ExpressionInfo(classOf[graft.functions.FrequentItemsAgg].getName, "frequent_items"),
    (exprs: Seq[Expression]) => graft.functions.FrequentItems.build(exprs))

  private[plans] val hllDistinctDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hll_distinct"),
    new ExpressionInfo(classOf[graft.functions.HllDistinctAgg].getName, "hll_distinct"),
    (exprs: Seq[Expression]) => graft.functions.DistinctSketch.build(exprs))

  private[plans] val hllStoredDescriptors
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("hll_sketch"),
      new ExpressionInfo(classOf[graft.functions.HllDistinctAgg].getName, "hll_sketch"),
      (es: Seq[Expression]) => graft.functions.DistinctSketch.buildSketch(es)),
    (FunctionIdentifier("hll_estimate"),
      new ExpressionInfo(classOf[graft.functions.HllEstimate].getName, "hll_estimate"),
      (es: Seq[Expression]) => graft.functions.DistinctSketch.buildEstimate(es)))

  private[plans] val thetaDescriptors
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = {
    import graft.functions.{ThetaSketch => T}
    def info(n: String) = new ExpressionInfo(T.getClass.getName, n)
    Seq(
      (FunctionIdentifier("theta_sketch"), info("theta_sketch"),
        (es: Seq[Expression]) => T.buildAgg(es)),
      (FunctionIdentifier("theta_estimate"), info("theta_estimate"),
        (es: Seq[Expression]) => T.buildEstimate(es)),
      (FunctionIdentifier("theta_intersect_estimate"), info("theta_intersect_estimate"),
        (es: Seq[Expression]) => T.buildSetEstimate(es, intersect = true)),
      (FunctionIdentifier("theta_union_estimate"), info("theta_union_estimate"),
        (es: Seq[Expression]) => T.buildSetEstimate(es, intersect = false)))
  }

  private[plans] val vectorAggDescriptors
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = {
    import graft.functions.{VectorAgg => V}
    def info(n: String) = new ExpressionInfo(classOf[graft.functions.VecSumAvgAgg].getName, n)
    Seq(
      (FunctionIdentifier("vec_avg"), info("vec_avg"),
        (es: Seq[Expression]) => V.build(es, isAvg = true)),
      (FunctionIdentifier("vec_sum"), info("vec_sum"),
        (es: Seq[Expression]) => V.build(es, isAvg = false)))
  }

  private[plans] val bloomDescriptors
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = {
    import graft.functions.{BloomFilter => B}
    Seq(
      (FunctionIdentifier("bloom_agg"),
        new ExpressionInfo(classOf[graft.functions.BloomAgg].getName, "bloom_agg"),
        (es: Seq[Expression]) => B.buildAgg(es)),
      (FunctionIdentifier("bloom_might_contain"),
        new ExpressionInfo(classOf[graft.functions.BloomMightContain].getName, "bloom_might_contain"),
        (es: Seq[Expression]) => B.buildContains(es)))
  }

  private[plans] val cmsDescriptors
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = {
    import graft.functions.{CountMin => C}
    Seq(
      (FunctionIdentifier("cms_agg"),
        new ExpressionInfo(classOf[graft.functions.CountMinAgg].getName, "cms_agg"),
        (es: Seq[Expression]) => C.buildAgg(es)),
      (FunctionIdentifier("cms_estimate"),
        new ExpressionInfo(classOf[graft.functions.CountMinEstimate].getName, "cms_estimate"),
        (es: Seq[Expression]) => C.buildEstimate(es)))
  }

  private[plans] val kllDescriptors
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = {
    import graft.functions.{QuantileSketch => K}
    Seq(
      (FunctionIdentifier("kll_agg"),
        new ExpressionInfo(classOf[graft.functions.KllAgg].getName, "kll_agg"),
        (es: Seq[Expression]) => K.buildAgg(es)),
      (FunctionIdentifier("kll_quantile"),
        new ExpressionInfo(classOf[graft.functions.KllQuantile].getName, "kll_quantile"),
        (es: Seq[Expression]) => K.buildQuantile(es)),
      (FunctionIdentifier("kll_n"),
        new ExpressionInfo(classOf[graft.functions.KllN].getName, "kll_n"),
        (es: Seq[Expression]) => K.buildN(es)))
  }

  private[plans] val sketchMergeDescriptors
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    graft.functions.SketchMerge.builders.map { case (name, b) =>
      (FunctionIdentifier(name),
        new ExpressionInfo(classOf[graft.functions.SketchMergeAgg].getName, name),
        b)
    }

  private[plans] val zValueDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("z_value"),
    new ExpressionInfo(classOf[graft.functions.ZValue].getName, "z_value"),
    (exprs: Seq[Expression]) => graft.functions.ZOrder.build(exprs))

  private[plans] val topkDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("topk_by"),
    new ExpressionInfo(classOf[graft.functions.TopKAgg].getName, "topk_by"),
    (exprs: Seq[Expression]) => graft.functions.TopK.build(exprs))

  /** Register everything on a live session (idempotent). */
  def install(spark: SparkSession): Unit = {
    RollingHash.register(spark)
    VectorDot.register(spark)
    graft.functions.FrequentItems.register(spark)
    graft.functions.DistinctSketch.register(spark)
    graft.functions.ThetaSketch.register(spark)
    graft.functions.VectorAgg.register(spark)
    graft.functions.BloomFilter.register(spark)
    graft.functions.CountMin.register(spark)
    graft.functions.QuantileSketch.register(spark)
    graft.functions.SketchMerge.register(spark)
    graft.functions.ZOrder.register(spark)
    graft.functions.TopK.register(spark)
    graft.functions.CharNgrams.register(spark)
  }
}
