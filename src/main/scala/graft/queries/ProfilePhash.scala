package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (optimization round): stage timing for dedup_phash_clusters —
  * codec round-trip vs banding vs connected components vs final joins.
  */
object ProfilePhash {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f  $label"); r
    }

    (1 to 3).foreach { round =>
      println(s"--- pass $round ---")
      graft.CacheRegistry.releaseAll()
      import graft.functions.{TextHash, Tokenizer}
      import graft.operators.Multimodal
      import spark.implicits._
      val px = graft.Tables.documents(spark, dir)
        .select(col("doc_id"),
          transform(Tokenizer.tokenize(col("text")),
            t => TextHash.hash64(t) % 256).as("px"))
        .filter(size(col("px")) > 0)
      val sigs = px.as[(Long, Seq[Long])].mapPartitions { rows =>
        rows.flatMap { case (id, p) =>
          val lumas = Array.tabulate(32)(i => if (i < p.length) p(i).toInt else 0)
          val payload = (id % 3) match {
            case 0 => Multimodal.bmpFromLumas(lumas, 8)
            case 1 => Multimodal.pngFromLumas(lumas, 8)
            case _ => Multimodal.gifFromLumas(lumas, 8)
          }
          Multimodal.decodeImage(payload)
            .map(img => (id, Multimodal.averageHash32(img)))
        }
      }.toDF("id", "phash")
        .withColumn("lo", col("phash") % 65536)
        .withColumn("hi", (col("phash") / 65536).cast("long"))
      time("phashSigs codec roundtrip (count)")(sigs.count())
      val full = graft.Queries.all("dedup_phash_clusters")
      time("dedup_phash_clusters full (noop)")(
        full(spark, dir).write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
