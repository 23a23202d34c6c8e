package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SemDeDup cells-∝-n decade probe (round-10 ask): q164b's catalog row
  * freezes k=64 (its oracle anchor), and at sf10 that frozen artifact
  * reads 8.2× — the k∝n rule says the decade corpus wants k≈640. This
  * main runs the FULL semDedup (assignment + within-cell pair join +
  * keep-lowest-id) against the k=640 artifact `CentroidArtifact640`
  * (trained once on the tools/sf10 embeddings by CentroidArtifactGen)
  * and reports, per run:
  *  - wall seconds (median of SPARK_GRAFT_PASSES timed passes after an
  *    untimed warm-up — Bench's methodology);
  *  - the cell histogram's n / maxCell / pairsPerDoc (Σc·(c−1)/2 ÷ n,
  *    the exact within-cell cosine-evaluation count per document) — the
  *    flat-per-cell invariant the dial exists to hold.
  * Run at sf3 and sf10 (SPARK_GRAFT_SF_DIR) to measure the ≤~3× step
  * BASELINE.md records. Output: ONE JSON line.
  */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "tools/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.get("SPARK_GRAFT_PASSES").map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_K ∈ {8, 64, 640}: which frozen artifact to run — 640 is
    // the decade measurement, 64/8 the frozen-k counterfactuals.
    val cents = sys.env.getOrElse("SPARK_GRAFT_K", "640") match {
      case "8"   => graft.ops.CentroidArtifact.centers
      case "64"  => graft.ops.CentroidArtifact64.centers
      case "640" => graft.ops.CentroidArtifact640.centers
      case other => sys.error(s"SPARK_GRAFT_K must be 8|64|640, got $other")
    }
    def emb = graft.sources.Tables.embeddings(spark, sfDir)
    emb.count() // footer/reader warm-up, untimed

    // cell histogram → the dial's invariant numbers
    val sizes = graft.ops.SemDedup.assignCells(emb, cents)
      .groupBy(col("cell")).agg(count(lit(1)).as("c"))
      .select(col("c")).collect().map(_.getLong(0))
    val n = sizes.sum
    val pairs = sizes.map(c => c * (c - 1) / 2).sum
    val ppd = pairs.toDouble / n

    def run(): Double = {
      val t0 = System.nanoTime()
      graft.ops.SemDedup.semDedup(emb, tau = 0.40, cents)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run() // codegen warm-up, untimed
    val times = (1 to passes).map(_ => run()).sorted
    val med = times(times.size / 2)
    println(s"""{"metric":"semdedup_probe","sec":$med,"n_vectors":$n,""" +
      s""""k":${cents.length},"max_cell":${sizes.max},""" +
      s""""pairs_per_doc":${math.round(ppd * 10) / 10.0},"sf":"$sfDir"}""")
    spark.stop()
  }
}
