package graft.queries

import graft.operators.{Pq, Similarity, VectorIndex}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool (optimization round): stage-level timing of the IVF-PQ bulk
  * serving plan (VectorIndex.searchBulk) — replicates servePlan's stages
  * one cut at a time to locate the cost. Run after the persisted index
  * exists (e.g. right after graft.queries.ProfileBulk):
  * scripts/run-main.sh graft.queries.ProfileVec
  */
object ProfileVec {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(f: => DataFrame): Unit = {
      val ts = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"${ts.tail.min}%8.2f  $label (runs ${ts.map(t => f"$t%.2f").mkString(",")})")
    }

    val vecPrefix = SimilarityQueries
      .persistedVectorIndexPrefix(spark, dir)
    val requests = TextIndexQueries.bulkRequests(spark, dir)
    val probes = spark.table(s"${vecPrefix}_forward")
      .join(requests.select(col("query_id").as("id")), "id")
      .select(col("id"), col("v"))
    // the production constants, not literals: if SimilarityQueries' served
    // geometry drifts, the profiler must profile the SAME plan (ADVICE r15)
    val (k, nprobe, shortlist) =
      (10, SimilarityQueries.ivfNProbe, SimilarityQueries.ivfShortlist)

    val codes = spark.table(s"${vecPrefix}_codes")
      .orderBy("m", "k").collect()
      .map(r => Pq.Code(r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
      .toSeq
    val pqM = codes.map(_.m).max + 1
    val pqSubDim = codes.head.carr.length
    val c = spark.table(s"${vecPrefix}_centroids")
    val pw = Window.partitionBy(col("probe_id"))
      .orderBy(col("psim").desc, col("cent_id").asc)

    val probeSims = probes
      .select(col("id").as("probe_id"), col("v").as("pv"))
      .crossJoin(broadcast(c))
      .withColumn("psim", Similarity.cosine(col("pv"), col("cv")))
    time("1: probe x centroids cosine (no window)")(probeSims)

    val probeCents = probeSims
      .withColumn("pr", row_number().over(pw))
      .filter(col("pr") <= nprobe)
      .select(col("probe_id"), col("pv"),
        Pq.lutCol(col("pv"), codes, pqM, pqSubDim).as("lut"), col("cent_id"))
    time("2: + nprobe window + lut")(probeCents)

    val vecs = spark.table(s"${vecPrefix}_vectors")
      .select(col("id").as("cand_id"), col("v").as("cv"), col("codes"),
        col("cent_id"))
    val cands = probeCents
      .join(vecs, Seq("cent_id"))
      .filter(col("probe_id") =!= col("cand_id"))
      .withColumn("qscore", Pq.adcScore(col("lut"), col("codes"), pqM))
    time("3: + join lists + adcScore (no window)")(
      cands.select(col("probe_id"), col("cand_id"), col("qscore")))

    val cw = Window.partitionBy(col("probe_id"))
      .orderBy(col("qscore").desc, col("cand_id").asc)
    val short = cands
      .withColumn("qrank", row_number().over(cw))
      .filter(col("qrank") <= shortlist)
    time("4: + shortlist window")(
      short.select(col("probe_id"), col("cand_id"), col("qscore")))

    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("cand_id").asc)
    val full = short
      .withColumn("cosine", Similarity.cosine(col("pv"), col("cv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("cand_id"), col("cosine"))
    time("5: + exact re-rank window (≈ full)")(full)

    time("searchBulk (reference)")(
      VectorIndex.searchBulk(spark, vecPrefix, probes, k, nprobe, shortlist))

    spark.stop()
  }
}
