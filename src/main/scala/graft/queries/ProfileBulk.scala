package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Search, VectorIndex}

/** Dev tool (optimization round): arm-level timing of hybrid_rrf_bulk —
  * which stage of the bulk serving plan owns the wall-clock. Mirrors the
  * exact sub-plans of Search.hybridBulkSearchPrebuilt / bulkSearch so the
  * deltas between successive stages isolate the explosion join, the
  * (query,doc) aggregation exchange, the rank windows, the vector arm and
  * the fusion. Run: scripts/run-main.sh graft.queries.ProfileBulk
  */
object ProfileBulk {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(f: => DataFrame): Unit = {
      // warmup + min of 3, bench methodology
      val ts = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"${ts.tail.min}%8.2f  $label (runs ${ts.map(t => f"$t%.2f").mkString(",")})")
    }

    val textPrefix = TextIndexQueries.ensurePrebuilt(spark, dir)
    val vecPrefix = SimilarityQueries.persistedVectorIndexPrefix(spark, dir)
    val requests = TextIndexQueries.bulkRequests(spark, dir)

    val postings = spark.table(s"${textPrefix}_postings")
    val termDf = spark.table(s"${textPrefix}_term_df")
    val docInfo = spark.table(s"${textPrefix}_doc_info")

    time("requests only")(requests)

    val stats = docInfo.agg(
      count(lit(1)).cast("double").as("n_docs"), avg(col("length")).as("avg_len"))
    val qTerms = requests.select(col("query_id"),
      explode(array_distinct(
        graft.functions.Tokenizer.tokenize(col("query_text")))).as("term"))
    val joined = qTerms
      .join(termDf, "term")
      .join(postings.select("term", "doc_id", "tf")
        .join(docInfo.select("doc_id", "length"), "doc_id"), "term")
    val scored = joined
      .crossJoin(broadcast(stats))
      .withColumn("score", graft.operators.BM25.termScore(col("tf"),
        graft.operators.BM25.idf(col("n_docs"), col("df")), col("length"), col("avg_len")))
      .select(col("query_id"), col("doc_id"), col("score"))

    time("text: explode+joins+score (90M rows, no agg)")(scored)

    val summed = scored.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("score")).as("score"))
    time("text: + groupBy(q,d).sum")(summed)

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    val top = summed.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10)
    time("text: + rank window")(top)

    time("text arm full (bulkSearch)")(
      Search.bulkSearch(requests, postings, termDf, docInfo, 10))

    val probes = spark.table(s"${vecPrefix}_forward")
      .join(requests.select(col("query_id").as("id")), "id")
      .select(col("id"), col("v"))
    time("vec: probes only")(probes)
    time("vec arm full (searchBulk)")(
      VectorIndex.searchBulk(spark, vecPrefix, probes, 10,
        SimilarityQueries.ivfNProbe, SimilarityQueries.ivfShortlist))

    time("hybrid_rrf_bulk full")(
      TextIndexQueries.hybridRrfBulk(spark, dir))

    spark.stop()
  }
}
