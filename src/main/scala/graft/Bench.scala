package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query seconds at
  * SPARK_GRAFT_SF_DIR (default sf0.1).
  *
  * Each query gets ONE untimed warmup execution, then three timed runs,
  * reporting the fastest: the warmup pays every one-time cost — memoized
  * table/index builds (ensureBucketed's ~10 s bucketed-table write was
  * landing inside run1 and, under cross-JVM scheduling variance, could
  * leak into the min — the r6 bucketed_join 0.21->0.82 s mystery),
  * whole-stage-codegen compilation, and most JIT — so the min-of-3 is a
  * pure steady-state number, the one that extrapolates to cluster scale.
  *
  * Queries are materialized through the `noop` sink — every output column
  * of every row is produced and handed to the writer, so projection-heavy
  * work cannot be pruned the way a bare count() would allow.
  *
  * IN-SWEEP VARIANCE INSTRUMENTATION (VERDICT r10 "what's wrong" #1): a
  * fixed CANARY set of floor queries is re-timed at sweep start, middle,
  * and end, and the spread lands in the artifact (`"canary"` object, with
  * `max_drift_ratio` = the worst canary's max/min across the three
  * checkpoints). Three consecutive rounds adjudicated round-over-round
  * bench movements with fresh same-machine tree A/Bs because the artifact
  * itself carried no environment signal; now a mover can be read against
  * the sweep's own measured drift band — a mover inside the band is the
  * container, outside it is the code.
  */
object Bench {

  /** Floor queries spanning the plan families (scan+agg, filter, top-k,
    * tokenize, window/streaming-shaped event agg): cheap, cache-free
    * steady-state plans whose only reason to move within one sweep is the
    * environment.
    */
  val Canaries: Seq[String] =
    Seq("q1_agg", "scan_filter", "topk_orders", "token_stats",
      "events_tumbling")

  /** Rows whose runtime is a DELIBERATE function of fixture size rather
    * than engine speed (VERDICT r11 "what's wrong" #3): hybrid_rrf_bulk's
    * correctness fixture is one request per document, so its cost scales
    * with the corpus by construction (~11 ms/request at sf0.1, both arms)
    * and dominates the sweep headline. The artifact names them (and a
    * `total_net` without them) so round-over-round comparisons and the
    * ArtifactGate read the trend net of fixture-scaled work.
    */
  val FixtureScaled: Seq[String] = Seq("hybrid_rrf_bulk")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // AQE partition coalescing by TARGET SIZE, not session parallelism
    // (optimization round r16, guide §2.2/§9 and VERDICT r15 #6): the
    // default parallelismFirst=true re-spreads every small exchange across
    // the session's partition count — near-empty reduce tasks whose launch
    // cost dominates the sweep's many sub-second rows (the r15 scaling
    // block measured ~10 rows FASTER at 8 cores than 32 for exactly this
    // reason). Sizing is load-bound per partition, so the setting is
    // scale-neutral by construction; the advisory size is env-tunable
    // (SPARK_GRAFT_ADVISORY_PART) with a 16m local default — a production
    // cluster would run the guide's 64-256m with the same flag.
    val advisory = sys.env.getOrElse("SPARK_GRAFT_ADVISORY_PART", "16m")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", advisory)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val all = SparkEntry.queries
    def once(name: String,
             fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }
    // canaries warm first (their one-time costs must not pollute the
    // start checkpoint), then each checkpoint is min-of-2 per canary.
    // THREE warmup passes: a single pass measured the start checkpoint
    // ~2x slower than mid/end from residual JIT, which would read as
    // phantom environment drift
    (1 to 3).foreach(_ => Canaries.foreach(c => once(c, all(c))))
    def canaryPass(): Seq[(String, Double)] = Canaries.map { c =>
      val ts = Seq(once(c, all(c)), once(c, all(c))).filter(_ >= 0)
      c -> (if (ts.nonEmpty) ts.min else -1.0)
    }
    def sweep(part: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)]) =
      part.map { case (name, fn) =>
        val times = Iterator.continually(once(name, fn)).take(4)
          .takeWhile(_ >= 0).toSeq
        // drop the warmup run; report min of the 3 steady-state runs
        name -> (if (times.size == 4) times.tail.min else -1.0)
      }
    val names = all.toSeq.sortBy(_._1)
    val (firstHalf, secondHalf) = names.splitAt(names.size / 2)
    val cStart = canaryPass()
    val r1 = sweep(firstHalf)
    val cMid = canaryPass()
    val r2 = sweep(secondHalf)
    val cEnd = canaryPass()
    val results = r1 ++ r2
    // end of sweep: release query-registered caches (shared subtrees are
    // kept DURING the sweep — cross-query reuse is their point)
    CacheRegistry.releaseAll()
    def obj(m: Seq[(String, Double)]) =
      m.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = obj(results)
    val total = results.map(_._2).filter(_ >= 0).sum
    // -1 (not NaN: invalid JSON for strict parsers) when a canary failed
    def drift(passes: Seq[Seq[(String, Double)]]): Double = {
      val ratios = Canaries.flatMap { c =>
        val ts = passes.map(_.toMap.apply(c)).filter(_ > 0)
        if (ts.size == passes.size) Some(ts.max / ts.min) else None
      }
      if (ratios.size == Canaries.size) ratios.max else -1.0
    }
    // mid/end are both deep in the warmed JVM — their ratio is the clean
    // environment signal; max_drift_ratio additionally includes whatever
    // JIT residue survived the start checkpoint's three warmup passes
    val canary = s"""{"start":${obj(cStart)},"mid":${obj(cMid)},""" +
      s""""end":${obj(cEnd)},""" +
      s""""max_drift_ratio":${drift(Seq(cStart, cMid, cEnd))},""" +
      s""""mid_end_drift_ratio":${drift(Seq(cMid, cEnd))}}"""
    val totalNet = results
      .filter { case (n, v) => v >= 0 && !FixtureScaled.contains(n) }
      .map(_._2).sum
    val fixtureScaled =
      FixtureScaled.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"canary":$canary,"fixture_scaled":$fixtureScaled,"total_net":$totalNet,"sf":"$sfDir","runs_per_query":3,"warmup_runs":1,"reported":"min"}"""
    // Stdout capture can truncate the head of a long line; the file is the
    // auditable artifact with all per-query numbers. Default is a
    // TIMESTAMPED file under bench_out/ (gitignored) so re-running Bench
    // never dirties a committed snapshot — BENCH_FULL.json previously sat
    // tracked and was silently overwritten in place by every run.
    val out = sys.env.get("SPARK_GRAFT_BENCH_OUT").map(java.nio.file.Paths.get(_))
      .getOrElse {
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get("bench_out"))
        java.nio.file.Paths.get(s"bench_out/BENCH_${System.currentTimeMillis() / 1000}.json")
      }
    emitResult(line, out, () => spark.stop(), println, System.err.println)
  }

  /** Emit the artifact file, the stderr note, stop Spark, and FINALLY print
    * the one-line JSON. The ORDER is the contract: the JSON must be the
    * LAST stdout line of the run — the driver parses the captured stream's
    * tail, and round 14's bench went unparsed (`BENCH_r14.json parsed:
    * null`, costing the round its official PERF table) because the
    * "[bench] wrote ..." note, printed AFTER the JSON, trailed it in the
    * combined capture (sbt re-tags stderr as `[error]` stdout lines).
    * Everything that can still write a line — the artifact note AND
    * spark.stop()'s shutdown logging — now runs BEFORE the JSON print.
    * BenchEmitSpec pins the ordering.
    */
  private[graft] def emitResult(line: String, out: java.nio.file.Path,
                                stop: () => Unit,
                                stdout: String => Unit,
                                stderr: String => Unit): Unit = {
    java.nio.file.Files.write(out, (line + "\n").getBytes("UTF-8"))
    stderr(s"[bench] wrote $out")
    stop()
    stdout(line)
  }
}
