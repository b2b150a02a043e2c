package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev tool (optimization round): per-micro-batch duration breakdown for
  * the stream_* bench rows — attaches a StreamingQueryListener and prints
  * each batch's durationMs map, so the engine-overhead vs data-work split
  * is visible. Run: scripts/run-main.sh graft.queries.ProfileStream [names...]
  */
object ProfileStream {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"  [stream] started ${e.name} ${e.id}")
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dm = p.durationMs
        println(s"  [batch ${p.batchId}] rows=${p.numInputRows} " +
          s"total=${dm.get("triggerExecution")} " +
          s"addBatch=${dm.get("addBatch")} getBatch=${dm.get("getBatch")} " +
          s"latestOffset=${dm.get("latestOffset")} " +
          s"queryPlanning=${dm.get("queryPlanning")} " +
          s"walCommit=${dm.get("walCommit")} " +
          s"commitOffsets=${dm.get("commitOffsets")}")
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })

    val names = if (args.nonEmpty) args.toSeq
      else Seq("stream_tumbling", "stream_attribution")
    names.foreach { n =>
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        graft.Queries.all(n)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        println(f"$n run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
