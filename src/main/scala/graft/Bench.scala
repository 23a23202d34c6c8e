package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query seconds over
  * SPARK_GRAFT_SF_DIR. An untimed warmup action per table loads file
  * indexes/footers and JIT-warms the parquet reader so the first timed
  * query doesn't absorb session startup.
  *
  * The timed action is a noop-format write (`format("noop")`): every
  * output row and column is fully materialized through the physical plan
  * and then discarded executor-side. A `count()` would let Catalyst prune
  * all projection work for map-only queries (a fingerprint query would
  * bench as a row-count over the scan), and a `collect()` would add
  * driver transfer that a cluster sink never pays.
  *
  * Each query reports the MEDIAN of `Passes` (3) timed runs — single-pass
  * timings on a busy box swing enough (~±30% observed round-over-round on
  * unchanged code) to drown real regressions; the total is the sum of the
  * medians. Failures are NOT swallowed: a failing query is reported with
  * value -1 and its error message in the `errors` map, and the process
  * exits non-zero.
  */
object Bench {
  /** Timed passes per query (median reported). SPARK_GRAFT_PASSES
    * overrides the default 3 — the sf10 decade probe uses 1: at 30–200 s
    * per query the jitter a median absorbs is proportionally small, and
    * the untimed warm-up pass still runs first, so a single timed pass
    * halves a multi-hour sweep without changing the methodology class.
    * Both wrong-input classes fail loudly and name the env var: a
    * silently-defaulted 0 and an uncontextualized NumberFormatException
    * are equally misleading at the top of a multi-hour sweep. */
  private val Passes = sys.env.get("SPARK_GRAFT_PASSES") match {
    case None => 3
    case Some(raw) =>
      val n = raw.toIntOption.getOrElse(sys.error(
        s"SPARK_GRAFT_PASSES must be a positive integer, got '$raw'"))
      if (n < 1) sys.error(
        s"SPARK_GRAFT_PASSES must be >= 1, got $n")
      n
  }

  private def materialize(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** SPARK_GRAFT_FORK=true: per-query FORKED-JVM sweep. Motivation
    * (round 8): an in-JVM 230-query sweep measures sweep-context, not the
    * plan — codegen/broadcast-cache pressure from the preceding ~200
    * compiled plans inflated individual entries 2.5–5× in committed
    * artifacts (q46/q164b), and the GC-settle flag cannot clear it
    * because it isn't heap. Each query here runs in a FRESH child JVM
    * (same classpath/JVM flags/env, SPARK_GRAFT_ONLY=<query>), which is
    * BY CONSTRUCTION the isolated-median methodology the per-query
    * numbers in BASELINE.md were always quoted with — so a fork-mode
    * artifact needs no isolated-re-measurement footnotes, ever. Each
    * child still does its own table + codegen warm-up pass, so JVM cold
    * start stays untimed. Cost: ~10–15 s session startup per query —
    * a sweep takes ~1 h instead of ~3 min; use it for COMMITTED
    * artifacts, not iteration. Requires a real `java -cp` launch (under
    * sbt's layered classloader java.class.path lacks the project
    * classes, so fork mode refuses to start rather than fork broken
    * children). */
  private def forkedSweep(names: Seq[String], sfDir: String): Unit = {
    val cp = System.getProperty("java.class.path")
    require(cp.split(java.io.File.pathSeparator).exists(_.contains("classes")),
      "fork mode needs a direct `java -cp target/scala-2.13/classes:...` launch; " +
        s"current classpath has no project classes: $cp")
    val javaBin = java.nio.file.Paths
      .get(System.getProperty("java.home"), "bin", "java").toString
    val jvmArgs = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments
    // Children inherit THIS JVM's args, so a parent launched without the
    // JDK-17 --add-opens set (spark-submit and build.sbt inject it; a
    // bare `java -cp` launch silently doesn't) would fork a whole sweep
    // of degraded children: Spark's Platform/UTF8String reflective fast
    // paths fall back to copies, costing up to 5× on text/codec-heavy
    // queries (round-11 finding: q230 at sf10 read 321 s without the
    // flags, 66 s with) while arithmetic-heavy plans barely move — a
    // skew that poisons every ratio in the artifact without a single
    // error. Refuse to start rather than measure the wrong JVM. The gate
    // checks EVERY module of the set, not one representative substring:
    // a parent carrying only java.lang (e.g. a hand-typed launch) would
    // pass a one-substring gate while children still degrade on the
    // Unsafe/DirectByteBuffer paths java.nio and sun.nio.ch open up —
    // reproducing exactly the silent skew this guard exists to prevent.
    val requiredOpens = Seq(
      "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
      "java.net", "java.nio", "java.util", "java.util.concurrent",
      "java.util.concurrent.atomic",
      "sun.nio.ch", "sun.nio.cs", "sun.security.action", "sun.util.calendar")
      .map(p => s"java.base/$p=ALL-UNNAMED")
    val argsStr = jvmArgs.toString
    val missingOpens = requiredOpens.filterNot(argsStr.contains)
    require(missingOpens.isEmpty,
      "fork mode requires the FULL JDK-17 --add-opens set (see build.sbt " +
        "jdk17AddOpens / tools/run_fork.sh); the parent is missing: " +
        missingOpens.mkString(", ") + " — children inherit this JVM's " +
        "args, and without the full set Spark's Unsafe fast paths degrade " +
        "up to 5× on codec/text-heavy queries and the sweep measures " +
        "the wrong JVM")
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    names.zipWithIndex.foreach { case (name, i) =>
      val cmd = new java.util.ArrayList[String]()
      cmd.add(javaBin)
      jvmArgs.forEach(a => cmd.add(a))
      cmd.add("-cp"); cmd.add(cp); cmd.add("graft.Bench")
      val pb = new ProcessBuilder(cmd)
      pb.environment.put("SPARK_GRAFT_ONLY", name)
      pb.environment.remove("SPARK_GRAFT_FORK")
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      // stdout → file, so a hung child can't deadlock us on a full pipe
      // and waitFor's timeout stays the only liveness dependency
      val outFile = java.io.File.createTempFile(s"bench-fork-$name-", ".json")
      outFile.deleteOnExit()
      pb.redirectOutput(outFile)
      val t0 = System.nanoTime()
      val proc = pb.start()
      // bound a hung child (a query 10× slower than the slowest known one
      // is a hang, not a measurement) without leaving orphans
      val finished = proc.waitFor(30, java.util.concurrent.TimeUnit.MINUTES)
      if (!finished) { proc.destroyForcibly(); proc.waitFor() }
      val wall = (System.nanoTime() - t0) / 1e9
      val stdout = new String(
        java.nio.file.Files.readAllBytes(outFile.toPath),
        java.nio.charset.StandardCharsets.UTF_8)
      outFile.delete()
      // Scan ALL stdout lines for the summary (not lastOption): a log4j
      // console appender or a shutdown message printed AFTER the child's
      // summary println would otherwise mark a green query FAILED.
      val timeRe = ("\"" + java.util.regex.Pattern.quote(name) + "\":(-?[0-9.Ee+-]+)").r
      val lines = stdout.linesIterator.toSeq
      val line = lines.findLast(l =>
        l.contains("\"metric\":\"total\"") && timeRe.findFirstIn(l).isDefined)
        .orElse(lines.lastOption).getOrElse("")
      val time = timeRe.findFirstMatchIn(line).map(_.group(1).toDouble)
      time match {
        case Some(t) if t >= 0 && finished && proc.exitValue == 0 =>
          out(name) = t
          System.err.println(
            f"[bench-fork] ${i + 1}/${names.size} $name: $t%.3f s (child wall $wall%.0f s)")
        case _ =>
          val why =
            if (!finished) "child timed out after 30 min"
            else s"child exit ${proc.exitValue}, last line: ${line.take(160)}"
          errors(name) = why
          out(name) = -1.0
          System.err.println(s"[bench-fork] ${i + 1}/${names.size} $name FAILED: $why")
      }
    }
    def jstr(s: String) = "\"" + s.replaceAll("[\"\\\\\\p{Cntrl}]", " ") + "\""
    val qs = out.map { case (k, v) => s"\"" + k + "\":" + sec3(v) }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }
      .mkString("{", ",", "}")
    val total = out.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":${sec3(total)},"unit":"sec","mode":"forked","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    if (errors.nonEmpty) sys.exit(1)
  }

  /** Per-query seconds at 3 decimals in the one-line JSON (round-13
    * verdict item 2): full-precision doubles made the 234-entry summary
    * line long enough that the driver's tail capture truncated it
    * (BENCH_r12's `parsed: null`), losing the round-over-round record.
    * 1 ms resolution is below the box's noise floor by two orders of
    * magnitude. Locale-pinned so a non-POSIX JVM can't emit decimal
    * commas. Failed queries stay exactly "-1". */
  private def sec3(v: Double): String =
    if (v < 0) "-1"
    else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  /** Parse a fork-mode reference artifact's `queries` map, keeping only
    * entries at the sweep's own scale factor. Whitespace-tolerant on
    * purpose (round-13 verdict item 1): the newest committed reference
    * may be Python-serialized (`"queries": {` / `"name": 1.23`), and the
    * round-13 compact-token parser silently matched nothing against it,
    * leaving the >2.5× outlier recheck dead while three contention
    * phantoms (q226 6.67 s / q107 4.79 s / q106 2.28 s — all sub-second
    * isolated) stood in the committed driver artifact. Exposed for
    * BenchForkRefSpec, which pins both serializations. */
  private[graft] def parseForkRef(txt: String, sfDir: String): Map[String, Double] = {
    // the reference binds only at its own scale factor (an sf1 sweep
    // must not recheck against sf0.1 numbers)
    val sfOk = "\"sf\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(txt)
      .exists(m => new java.io.File(m.group(1)).getName ==
        new java.io.File(sfDir).getName)
    val body = "\"queries\"\\s*:\\s*\\{".r.findFirstMatchIn(txt) match {
      case None    => ""
      case Some(m) => txt.substring(m.end, txt.indexOf('}', m.end))
    }
    if (!sfOk) Map.empty[String, Double]
    else "\"([^\"]+)\"\\s*:\\s*(-?[0-9.Ee+]+)".r.findAllMatchIn(body)
      .map(m => m.group(1) -> m.group(2).toDouble)
      .filter(_._2 > 0).toMap
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // local iteration aid: SPARK_GRAFT_ONLY=q55_repeated_spans,q56_span_cutlist
    // times just those queries; unset (the driver's mode) runs everything
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // SPARK_GRAFT_SKIP: exclusions for scale sweeps — e.g. q153 at sf3,
    // whose Θ(output) growth on the degenerate fixture vocab is already
    // documented (BASELINE.md) and would add hours without information.
    // Exclusions MUST be named in the committed artifact's write-up.
    val skip = sys.env.get("SPARK_GRAFT_SKIP")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    def selected = (only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None        => SparkEntry.queries
    }).filter { case (n, _) => !skip(n) }
    if (sys.env.get("SPARK_GRAFT_FORK").contains("true")) {
      forkedSweep(selected.keys.toSeq.sorted, sfDir)
      return
    }
    // SPARK_GRAFT_SHUFFLE_PARTITIONS decouples shuffle-partition count
    // from core count (default: = cpus, the standing convention every
    // committed artifact used). Exists for partition-SIZING probes: the
    // round-12 movement audit's only nonzero spill (q61 at sf10, ~2 GB in
    // post-regime-switch SMJ sorts) has "more shuffle partitions" as its
    // asserted fix, and demonstrating that must not also change query
    // parallelism or the local[n] master the methodology is quoted under.
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    // SPARK_GRAFT_CONF: semicolon-separated key=value Spark confs for
    // sizing probes. Exists because the q61 spill probe DISPROVED the
    // bare shuffle-partition knob: with AQE coalescing on (the default,
    // and the production posture), raising spark.sql.shuffle.partitions
    // 32→128 left both the ~2 GB spill and the post-coalesce partition
    // count unchanged — the knob that actually sizes reduce partitions
    // under AQE is spark.sql.adaptive.advisoryPartitionSizeInBytes.
    // Probes must be able to set THAT (and peers) without growing a
    // bespoke env var per conf.
    val extraConf = sys.env.get("SPARK_GRAFT_CONF").iterator
      .flatMap(_.split(";")).map(_.trim).filter(_.nonEmpty)
      .map { kv =>
        val i = kv.indexOf('=')
        require(i > 0, s"SPARK_GRAFT_CONF entries must be key=value, got '$kv'")
        kv.substring(0, i) -> kv.substring(i + 1)
      }.toSeq
    // Codegen class cache sized to the catalog (round-13). The default
    // 100-entry cache can't hold 234 distinct plans' codegen units, so a
    // full sweep recompiled EVERY whole-stage source on EVERY timed pass
    // (Janino time, not plan time): the top-40 subset measured 59.9 s at
    // the default vs 45.0 s at 5000 entries, and a 1-entry control ran
    // >8 min — the conf is live and the effect is compilation, not noise.
    // Not a local[32] trick: any long-lived driver cycling a catalog of
    // plans (scheduled batches, a query service) hits the same cliff;
    // 5000 entries bounds metaspace at a few hundred MB worst-case.
    // Set BEFORE extraConf so SPARK_GRAFT_CONF probes can override it.
    val spark = extraConf.foldLeft(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.shuffle.partitions", shufflePartitions))(
      (b, kv) => b.config(kv._1, kv._2))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // The driver fixtures are one parquet file per table (one input
    // partition): let map-heavy queries (q20/q21/q46) spread the scan.
    // Default-off everywhere else so the production plan stays shuffle-free.
    // SPARK_GRAFT_SINGLE_FILE=false for multi-row-group fixtures (the sf1
    // scale probe), where the scan parallelizes natively and the spread
    // would inject a shuffle the production plan doesn't have.
    spark.conf.set("graft.bench.singleFileFixture",
      sys.env.getOrElse("SPARK_GRAFT_SINGLE_FILE", "true"))
    // Table warm-up is guarded per table: round 5 lost the ENTIRE bench
    // (rc=1, zero timings) to one unguarded count when a fixture's physical
    // schema drifted. A broken table must degrade to per-query errors in
    // the report below, never kill the process before a single timing.
    val tableWarmups: Seq[(String, () => Long)] =
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings").map { t =>
        t -> (() => graft.sources.Tables.table(spark, sfDir, t).count())
      } :+ ("events" -> (() => graft.sources.Tables.events(spark, sfDir).count()))
    tableWarmups.foreach { case (t, load) =>
      try load() catch {
        // NonFatal only: an OOM/LinkageError means the JVM is corrupted —
        // continuing would report misleading per-query failures.
        case scala.util.control.NonFatal(ex) =>
          System.err.println(s"[bench] table warm-up failed for $t: ${ex.getMessage}")
      }
    }
    // untimed warm-up pass: whole-stage codegen compiles per query plan the
    // first time; the timed pass below measures steady-state execution
    selected.foreach { case (name, fn) =>
      try {
        spark.sparkContext.setJobDescription(s"warmup $name")
        materialize(fn(spark, sfDir))
      } catch {
        case scala.util.control.NonFatal(t) =>
          System.err.println(s"[bench] warm-up failed for $name: ${t.getMessage}")
      } finally spark.sparkContext.setJobDescription(null)
    }

    // SPARK_GRAFT_GC_SETTLE=true: full GC + settle pause before each
    // timed pass, so a committed sweep artifact doesn't carry the
    // previous query's collection debt (sf1 sweeps showed isolated-run
    // 0.9 s queries reporting 7 s purely from inherited heap pressure).
    // Off by default — the per-round sf0.1 driver bench favors wall
    // speed and its queries are small enough not to interact.
    val gcSettle = sys.env.get("SPARK_GRAFT_GC_SETTLE").contains("true")
    def settle(): Unit = if (gcSettle) { System.gc(); Thread.sleep(300) }

    // SPARK_GRAFT_SHUFFLE_METRICS=true: record per-query shuffle-write and
    // spill BYTES from task metrics alongside the timings ("shuffle_bytes"/
    // "spill_bytes" maps, per single run). Exchange COUNTS are already
    // frozen by ShuffleBudget; bytes are the scale signal counts can't
    // give — comparing sf0.1 vs sf1 artifacts shows whether data MOVEMENT
    // grows linearly or an operator hides a quadratic shuffle behind an
    // unchanged plan shape. Off by default: listener-bus drain costs a
    // bounded poll per query, and the driver's per-round artifact contract
    // is timings.
    val shuffleMetrics = sys.env.get("SPARK_GRAFT_SHUFFLE_METRICS").contains("true")
    val accShuffle = new java.util.concurrent.atomic.AtomicLong
    val accSpill = new java.util.concurrent.atomic.AtomicLong
    if (shuffleMetrics) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) {
            accShuffle.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            accSpill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
          }
        }
      })
    // The listener bus is async and its drain API is private: poll the
    // counters until two consecutive 50 ms reads agree (bounded at 1 s).
    // Shuffle bytes per pass are deterministic, so a straggler event past
    // the bound only perturbs the per-run average, never the timings.
    def drainListeners(): Unit = if (shuffleMetrics) {
      var prev = -1L
      var spins = 0
      while (spins < 20 && (accShuffle.get + accSpill.get) != prev) {
        prev = accShuffle.get + accSpill.get
        Thread.sleep(50)
        spins += 1
      }
    }

    // SPARK_GRAFT_STORAGE_METRICS=true: record per-query PEAK block-store
    // bytes (memory + disk) across the timed passes ("storage_bytes" map).
    // Exists for the round-13 verdict's item 3: the localCheckpoint'ed
    // intermediates materialize into executor-local storage, and whether
    // the materialize-once trade still wins when those bytes grow 10×
    // (sf1) is a claim that needs the BYTES, not just the seconds. The
    // reading is taken right after each pass while the pass's DataFrame
    // still references its checkpointed RDDs; a System.gc() between
    // queries (this mode only) lets ContextCleaner drop the previous
    // query's blocks so readings don't accumulate across queries.
    val storageMetrics = sys.env.get("SPARK_GRAFT_STORAGE_METRICS").contains("true")
    val storageBytes = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val shuffleBytes = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    val spillBytes = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      drainListeners()
      val sh0 = accShuffle.get; val sp0 = accSpill.get
      var passesRun = 0
      if (storageMetrics) { System.gc(); Thread.sleep(200) }
      val times = (1 to Passes).flatMap { _ =>
        if (errors.contains(name)) None // first failure wins, skip reruns
        else {
          settle()
          // guide §1.5: label the timed jobs so the UI/event log maps
          // stages back to queries (thread-local; cost-free when UI off)
          spark.sparkContext.setJobDescription(name)
          val t0 = System.nanoTime()
          try {
            materialize(fn(spark, sfDir))
            passesRun += 1
            if (storageMetrics) {
              val cur = spark.sparkContext.getRDDStorageInfo
                .map(i => i.memSize + i.diskSize).sum
              storageBytes(name) = math.max(storageBytes.getOrElse(name, 0L), cur)
            }
            Some((System.nanoTime() - t0) / 1e9)
          } catch {
            case scala.util.control.NonFatal(t) =>
              System.err.println(s"[bench] FAILED $name: ${t.getMessage}")
              errors(name) = Option(t.getMessage).getOrElse(t.getClass.getName).take(200)
              None
          } finally spark.sparkContext.setJobDescription(null)
        }
      }
      // Failed queries record NO byte metrics: passesRun counts successes
      // only, but a pass that dies mid-query still accumulated its partial
      // shuffle/spill into the window — dividing that contaminated delta
      // by the success count would inflate the per-pass average. (Known
      // residual: a straggler listener event past the 1 s drain bound is
      // attributed to the NEXT query's window — bytes per pass are
      // deterministic, so this perturbs only the opt-in averages.)
      if (shuffleMetrics && passesRun > 0 && !errors.contains(name)) {
        drainListeners()
        shuffleBytes(name) = (accShuffle.get - sh0) / passesRun
        spillBytes(name) = (accSpill.get - sp0) / passesRun
      }
      if (errors.contains(name)) name -> -1.0
      else name -> times.sorted.apply(times.size / 2) // median of the passes
    }
    // ------------------------------------------------------------------
    // Self-correcting outlier recheck (round 10): an in-JVM sweep can
    // carry end-of-sweep context stalls — round 9's driver artifact
    // showed q91/q92 at 14–20× their committed fork-mode values on
    // identical code. Queries whose in-sweep time exceeds 2.5× their
    // entry in the committed fork-mode reference artifact (the newest
    // BENCH_r*_full.json, each entry an isolated-JVM median by
    // construction) are re-timed in THIS process after clearCache() + a
    // GC settle; the summary's `queries` map carries the recheck (the
    // honest isolated-median number) and `rechecks` records both, so a
    // phantom regression is self-labeling instead of contradicting the
    // committed record. A real regression rechecks high and stays high.
    // Scoped to full sweeps at the reference's own SF; SPARK_GRAFT_RECHECK
    // =false disables.
    // ------------------------------------------------------------------
    val rechecks = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Double)]
    val recheckOn = !sys.env.get("SPARK_GRAFT_RECHECK").contains("false") &&
      only.isEmpty && Passes >= 2
    lazy val forkRef: Map[String, Double] = {
      val cwd = new java.io.File(".")
      val refFile = Option(cwd.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.matches("BENCH_r\\d+_full\\.json"))
        // numeric round order, not lexicographic ("r100" sorts before
        // "r99" as a string)
        .sortBy(f => "\\d+".r.findFirstIn(f.getName).get.toInt).lastOption
      refFile.map { f =>
        val txt = new String(java.nio.file.Files.readAllBytes(f.toPath),
          java.nio.charset.StandardCharsets.UTF_8)
        parseForkRef(txt, sfDir)
      }.getOrElse(Map.empty)
    }
    val finalResults =
      if (!recheckOn || forkRef.isEmpty) results
      else results.map { case (name, t) =>
        forkRef.get(name) match {
          case Some(ref) if t >= 0 && t > 2.5 * ref =>
            spark.catalog.clearCache()
            System.gc(); Thread.sleep(300)
            val fn = selected(name)
            val again = (1 to Passes).flatMap { _ =>
              val t0 = System.nanoTime()
              try { materialize(fn(spark, sfDir)); Some((System.nanoTime() - t0) / 1e9) }
              catch { case scala.util.control.NonFatal(_) => None }
            }
            if (again.isEmpty) name -> t
            else {
              val re = again.sorted.apply(again.size / 2)
              System.err.println(
                f"[bench-recheck] $name: in-sweep $t%.3f s vs fork-ref $ref%.3f s → recheck $re%.3f s")
              rechecks(name) = (t, re)
              name -> re
            }
          case _ => name -> t
        }
      }
    val qs = finalResults.map { case (k, v) => s"\"" + k + "\":" + sec3(v) }
      .mkString("{", ",", "}")
    // \p{Cntrl} (not just \n\r\t): ANY control character in an exception
    // message would otherwise break the one-line JSON contract
    def jstr(s: String) = "\"" + s.replaceAll("[\"\\\\\\p{Cntrl}]", " ") + "\""
    val errJson = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }
      .mkString("{", ",", "}")
    val recheckJson = if (rechecks.isEmpty) "" else
      "," + rechecks.map { case (k, (a, b)) =>
        "\"" + k + "\":{\"in_sweep\":" + sec3(a) + ",\"recheck\":" + sec3(b) + "}"
      }.mkString("\"rechecks\":{", ",", "}")
    val total = finalResults.map(_._2).filter(_ >= 0).sum
    val shufJson = if (!shuffleMetrics) "" else {
      def m(mm: scala.collection.Map[String, Long]) =
        mm.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
      s""","shuffle_bytes":${m(shuffleBytes)},"spill_bytes":${m(spillBytes)}"""
    }
    val storJson = if (!storageMetrics) "" else
      storageBytes.map { case (k, v) => s"\"" + k + "\":" + v }
        .mkString(""","storage_bytes":{""", ",", "}")
    println(s"""{"metric":"total","value":${sec3(total)},"unit":"sec","queries":$qs,"errors":$errJson$recheckJson$shufJson$storJson,"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
