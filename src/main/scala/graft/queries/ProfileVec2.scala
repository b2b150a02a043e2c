package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Pq, Similarity}

/** Dev tool: finer dissection of the IVF-PQ bulk candidate join. */
object ProfileVec2 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(f: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"${ts.tail.min}%8.2f  $label (runs ${ts.map(t => f"$t%.2f").mkString(",")})")
    }

    val vecPrefix = SimilarityQueries.persistedVectorIndexPrefix(spark, dir)
    val requests = TextIndexQueries.bulkRequests(spark, dir)
    val probes = spark.table(s"${vecPrefix}_forward")
      .join(requests.select(col("query_id").as("id")), "id")
      .select(col("id"), col("v"))
    val nprobe = SimilarityQueries.ivfNProbe // production constant (ADVICE r15)

    val codes = spark.table(s"${vecPrefix}_codes")
      .orderBy("m", "k").collect()
      .map(r => Pq.Code(r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
      .toSeq
    val pqM = codes.map(_.m).max + 1
    val pqSubDim = codes.head.carr.length
    val c = spark.table(s"${vecPrefix}_centroids")
    val pw = Window.partitionBy(col("probe_id"))
      .orderBy(col("psim").desc, col("cent_id").asc)

    val vecsNarrow = spark.table(s"${vecPrefix}_vectors")
      .select(col("id").as("cand_id"), col("codes"), col("cent_id"))
    time("a: vectors scan alone")(vecsNarrow)

    val probeCentsNoLut = probes
      .select(col("id").as("probe_id"), col("v").as("pv"))
      .crossJoin(broadcast(c))
      .withColumn("psim", Similarity.cosine(col("pv"), col("cv")))
      .withColumn("pr", row_number().over(pw))
      .filter(col("pr") <= nprobe)
      .select(col("probe_id"), col("cent_id"))
    time("b: join only, no lut (probe_id,cand_id)")(
      probeCentsNoLut.join(vecsNarrow, Seq("cent_id"))
        .filter(col("probe_id") =!= col("cand_id"))
        .select(col("probe_id"), col("cand_id")))

    val probeCents = probes
      .select(col("id").as("probe_id"), col("v").as("pv"))
      .crossJoin(broadcast(c))
      .withColumn("psim", Similarity.cosine(col("pv"), col("cv")))
      .withColumn("pr", row_number().over(pw))
      .filter(col("pr") <= nprobe)
      .select(col("probe_id"),
        Pq.lutCol(col("pv"), codes, pqM, pqSubDim).as("lut"), col("cent_id"))
    val cands = probeCents.join(vecsNarrow, Seq("cent_id"))
      .filter(col("probe_id") =!= col("cand_id"))
      .withColumn("qscore", Pq.adcScore(col("lut"), col("codes"), pqM))
      .select(col("probe_id"), col("cand_id"), col("qscore"))
    println("==== plan for c (join + lut + adcScore) ====")
    cands.explain("formatted")
    time("c: join + lut + adcScore")(cands)

    spark.stop()
  }
}
