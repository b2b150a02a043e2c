package graft
import org.apache.spark.sql.SparkSession
// Dev tool: repeat-run timer for single queries (steady-state vs warmup).
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { n =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        Queries.all(n)(spark, dir).write.format("noop").mode("overwrite").save()
        println(f"$n run$i: ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
