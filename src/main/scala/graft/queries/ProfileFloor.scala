package graft.queries

import org.apache.spark.sql.SparkSession

/** Dev tool (optimization round r16): where does the per-query FLOOR go?
  * For a cheap query, splits each repetition into
  *   construct  — building the DataFrame (plan assembly, driver-side)
  *   analyze    — analysis + optimization + physical planning
  *                (forcing queryExecution.executedPlan)
  *   execute    — the noop write (job scheduling + tasks + AQE re-planning)
  * plus the per-run JOB COUNT and TASK COUNT from a SparkListener, so
  * "floor is scheduling" vs "floor is Catalyst" vs "floor is task launch"
  * is a measurement, not a guess.
  * Run: scripts/run-main.sh graft.queries.ProfileFloor [names...]
  */
object ProfileFloor {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet(): Unit
        override def onStageSubmitted(
            s: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit = {
          stages.incrementAndGet()
          tasks.addAndGet(s.stageInfo.numTasks): Unit
        }
      })

    val names = if (args.nonEmpty) args.toSeq
      else Seq("corpus_stats", "partitioned_prune", "sample_weighted",
        "topk_orders", "scan_filter")
    names.foreach { n =>
      (1 to 4).foreach { i =>
        val t0 = System.nanoTime()
        val df = graft.Queries.all(n)(spark, dir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimization+planning
        val t2 = System.nanoTime()
        jobs.set(0); tasks.set(0); stages.set(0)
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        println(f"$n run$i: construct=${(t1 - t0) / 1e3}%6.0fus " +
          f"analyze=${(t2 - t1) / 1e3}%6.0fus execute=${(t3 - t2) / 1e3}%6.0fus " +
          f"jobs=${jobs.get}%2d stages=${stages.get}%2d tasks=${tasks.get}%3d " +
          f"total=${(t3 - t0) / 1e9}%.3fs")
      }
    }
    spark.stop()
  }
}
