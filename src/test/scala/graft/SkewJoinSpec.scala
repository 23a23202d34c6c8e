package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Skew-path evidence for the join family (q108/q45/q133 shapes): a
  * 90%-hot-key fact joined to a per-key dim, the distribution where a
  * naive shuffle join puts 90% of the probe side in ONE task. Two pinned
  * escapes:
  *   1. AQE skew-join handling splits the fat partition — measured from
  *      real task metrics: no task's shuffle read exceeds ~2× the median
  *      of its stage, and the join stage runs MORE tasks than shuffle
  *      partitions (the split happened);
  *   2. with skew handling OFF the same join concentrates ≥ 5× the
  *      median in one task — proving the test bites, not just passes;
  *   3. Core.saltedJoin bounds the same join WITHOUT AQE (the static
  *      answer when runtime re-planning is unavailable), row-identical
  *      to the plain join.
  */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // 90% of fact rows carry the hot key; ~200B payload per row so byte
  // thresholds are meaningful at test scale (~9 MB fact).
  private val NFact = 40000
  private def factOn(s: org.apache.spark.sql.SparkSession) = s.range(NFact.toLong).select(
    when(col("id") % 10 =!= 0, lit("hot"))
      .otherwise(concat(lit("cold"), (col("id") % 100).cast("string")))
      .as("key"),
    col("id").as("fact_id"),
    // incompressible payload: shuffle blocks are lz4-compressed, so a
    // constant pad would shrink the hot partition under the skew
    // threshold and the split would silently never trigger
    concat(sha2(col("id").cast("string"), 256),
      sha2(concat(col("id").cast("string"), lit("b")), 256),
      sha2(concat(col("id").cast("string"), lit("c")), 256)).as("payload"))
  private def dimOn(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    (Seq("hot") ++ (0 until 100).map("cold" + _))
      .toDF("key").withColumn("dim_tag", length(col("key")))
  }
  private lazy val fact = factOn(spark)
  private lazy val dim = dimOn(spark)

  /** Per-task shuffle-read bytes, grouped by stage — scoped to ONE job
    * group. The listener rides the shared SparkContext, so under the
    * parallel-suite regime a concurrent suite's heavy shuffle stage
    * could otherwise win the maxBy below and flake the skew-ratio
    * assertions; only stages belonging to jobs tagged with `group`
    * (runJoin sets it via setJobGroup, a thread-local property, so
    * other suites' jobs never carry it) are metered. */
  private final class TaskMeter(group: String) extends SparkListener {
    private val myStages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val byStage = new scala.collection.concurrent.TrieMap[Int, List[Long]]()
    override def onJobStart(j: SparkListenerJobStart): Unit =
      if (Option(j.properties)
          .exists(p => p.getProperty("spark.jobGroup.id") == group))
        j.stageIds.foreach(id => myStages.add(id))
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (myStages.contains(t.stageId)) {
        val br = Option(t.taskMetrics).map(_.shuffleReadMetrics.totalBytesRead)
          .getOrElse(0L)
        byStage.updateWith(t.stageId) {
          case Some(l) => Some(br :: l)
          case None    => Some(br :: Nil)
        }
        ()
      }
  }

  /** Runs the skewed join with the given confs, returns (rowCount,
    * (taskShuffleReads of the heaviest-read stage)). */
  private def runJoin(skewHandling: Boolean): (Long, List[Long]) = {
    // isolated SQLConf: the skew thresholds and especially the -1
    // broadcast threshold must not be visible to concurrently-planning
    // suites (they turned PlanAuditSpec's broadcast joins into SMJ)
    val s = isolated(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> skewHandling.toString,
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "128k",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      // force a sort-merge join: broadcast would hide the skew entirely
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    import s.implicits._
    val group = s"skewjoin-probe-$skewHandling"
    val meter = new TaskMeter(group)
    try {
      spark.sparkContext.addSparkListener(meter)
      s.sparkContext.setJobGroup(group, "SkewJoinSpec probe", false)
      // the aggregate must CONSUME payload post-join: a bare count() lets
      // column pruning drop the 192-byte payload from the exchange and the
      // "skewed" partition shrinks to a few KB of repeated keys
      val n = factOn(s).join(dimOn(s), "key")
        .agg(sum(length(col("payload")))).as[Long].head() / 192L
      // listener bus is async; poll until the event stream drains
      val deadline = System.nanoTime() + 10_000_000_000L
      var last = -1
      var cur = meter.byStage.values.map(_.size).sum
      while (cur != last && System.nanoTime() < deadline) {
        last = cur; Thread.sleep(300)
        cur = meter.byStage.values.map(_.size).sum
      }
      // diagnostic, not opaque: if the job-group filter matched nothing
      // (a Spark rename of spark.jobGroup.id) or the drain heuristic
      // exited before the first metered event, fail with the cause
      // instead of an empty.maxBy
      assert(meter.byStage.nonEmpty,
        s"no stages metered for job group $group — either the " +
          "spark.jobGroup.id property no longer reaches task events or " +
          "the listener drain exited before the first event landed")
      val joinStage = meter.byStage.maxBy(_._2.sum)._2
      (n, joinStage)
    } finally {
      s.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(meter)
    }
  }

  private def maxOverMedian(reads: List[Long]): Double = {
    val nz = reads.filter(_ > 0).sorted
    assert(nz.nonEmpty, "no shuffle reads recorded")
    nz.max.toDouble / nz(nz.size / 2)
  }

  test("AQE skew handling splits the hot partition: max task <= ~2x median") {
    val (n, reads) = runJoin(skewHandling = true)
    assert(n == NFact.toLong) // per-key dim: join preserves fact rows
    val ratio = maxOverMedian(reads)
    val nzTasks = reads.count(_ > 0)
    info(f"skew ON: $nzTasks tasks with shuffle reads, max/median $ratio%.2f, " +
      s"reads=${reads.filter(_ > 0).sorted.reverse.take(8).mkString(",")}")
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(nzTasks > parts,
      s"hot partition was not split: $nzTasks tasks <= $parts partitions")
    assert(ratio <= 2.5, f"task skew survived AQE: max/median $ratio%.2f")
  }

  test("control: without skew handling one task carries the hot key") {
    val (n, reads) = runJoin(skewHandling = false)
    assert(n == NFact.toLong)
    val ratio = maxOverMedian(reads)
    info(f"skew OFF: max/median $ratio%.2f")
    assert(ratio >= 5.0,
      f"control failed to produce skew (max/median $ratio%.2f) — " +
        "thresholds need retuning, the ON-case assertion is not proving anything")
  }

  test("saltedJoin bounds the same join statically, row-identical") {
    val plain = fact.join(dim, "key")
      .select("fact_id", "key", "dim_tag")
      .collect().map(_.toString).sorted
    val salted = graft.ops.Core.saltedJoin(fact, dim, Seq("key"), salt = 8)
      .select("fact_id", "key", "dim_tag")
      .collect().map(_.toString).sorted
    assert(salted.sameElements(plain))
  }
}
