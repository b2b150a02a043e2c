package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{TextHash, Tokenizer}
import graft.operators.Dedup

/** Ad-hoc stage profiler for the heavy queries (dev tool, not driver API). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f  $label"); r
    }

    // ---- ngram stages ----
    val docs = Tables.documents(spark, dir).filter(col("doc_id") % 2 === 0)
    val sets = docs.select(col("doc_id").as("id"),
        array_distinct(Tokenizer.tokenShingles(col("text"), 3)).as("sh"))
      .filter(size(col("sh")) > 0).cache()
    time("ngram: sets count")(sets.count())
    val inv = sets.select(col("id"), explode(col("sh")).as("shingle"))
    time("ngram: inv count")(inv.count())
    val rare = inv.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") <= 20).select("shingle")
    time("ngram: rare count")(rare.count())
    val invRare = inv.join(rare, "shingle").cache()
    time("ngram: invRare count")(invRare.count())
    val a = invRare.alias("a"); val b = invRare.alias("b")
    val cands = a.join(b, col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= 2).cache()
    time("ngram: cands count")(cands.count())
    val sa = sets.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val sb = sets.select(col("id").as("id_b"), col("sh").as("sh_b"))
    val verified = cands.join(sa, "id_a").join(sb, "id_b")
      .withColumn("jaccard", Dedup.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= 0.02)
    time("ngram: verify count")(verified.count())

    // ---- simhash stages ----
    val sdocs = Tables.documents(spark, dir).filter(col("doc_id") % 3 === 0)
    val tokens = sdocs.select(col("doc_id").as("id"),
      explode(Tokenizer.tokenize(col("text"))).as("term"))
    time("simhash: token count")(tokens.count())
    val sigs = Dedup.simHashSignatures(tokens)
      .withColumn("lo", col("simhash") % 65536)
      .withColumn("hi", (col("simhash") / 65536).cast("long")).cache()
    time("simhash: sigs count")(sigs.count())
    val aa = sigs.select(col("id").as("id_a"), col("simhash").as("sh_a"),
      col("lo").as("lo_a"), col("hi").as("hi_a"))
    val bb = sigs.select(col("id").as("id_b"), col("simhash").as("sh_b"),
      col("lo").as("lo_b"), col("hi").as("hi_b"))
    val byLo = aa.join(bb, col("lo_a") === col("lo_b") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
    val byHi = aa.join(bb, col("hi_a") === col("hi_b") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
    val pairs = byLo.union(byHi).distinct()
    time("simhash: pair count")(pairs.count())
    time("simhash: verified")(pairs
      .withColumn("hamming", Dedup.hamming(col("sh_a"), col("sh_b")))
      .filter(col("hamming") <= 6).count())

    // ---- minhash stages ----
    val msets = Tables.documents(spark, dir).filter(col("doc_id") % 5 === 0)
      .select(col("doc_id").as("id"),
        array_distinct(Tokenizer.tokenize(col("text"))).as("toks"))
      .filter(size(col("toks")) > 0).cache()
    time("minhash: sets")(msets.count())
    val msigs = msets.select(col("id") +: Dedup.minHashSignatures(col("toks"), 8): _*).cache()
    time("minhash: sigs")(msigs.count())
    val mcands = Dedup.lshCandidates(msigs, 8, 2).cache()
    time("minhash: cands")(mcands.count())
    val va = msets.select(col("id").as("id_a"), col("toks").as("toks_a"))
    val vb = msets.select(col("id").as("id_b"), col("toks").as("toks_b"))
    time("minhash: verified")(mcands.join(va, "id_a").join(vb, "id_b")
      .withColumn("jaccard", Dedup.jaccard(col("toks_a"), col("toks_b")))
      .filter(col("jaccard") >= 0.8).count())

    spark.stop()
  }
}
