package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextHash, Tokenizer}

/** The corpus-refresh composition: what actually runs when a crawl batch
  * arrives at a training corpus, as ONE lazy plan.
  *
  *   exact-dup gate (bloom prefilter + exact anti-join vs the existing
  *   corpus, AND first-occurrence-per-digest within the batch — a crawl
  *   batch carries its own duplicates) ->
  *   near-dup gate (3-token-shingle MinHash bands: batch vs the existing
  *   corpus signatures AND within the batch; jaccard-verified) ->
  *   PII scrub -> quality gate -> accepted manifest.
  *
  * Shingles, not unigrams, feed the MinHash: on a dense shared vocabulary
  * unigram bands collide almost everywhere (measured 3.6M candidate pairs
  * for a 1.2k-doc batch at sf0.1; 3-shingles: 129). Keeper conventions
  * match the dedup family — min doc_id wins exact groups; a doc is
  * near-removed when ANY lower-id near-dup exists (semantic_dedup's rule).
  */
object Ingest {

  /** @param existing (doc_id, text, ...) the standing corpus
    * @param batch    (doc_id, text, ...) the arriving documents
    * @return accepted manifest (doc_id, n_tokens, quality, scrub_digest)
    */
  def pipeline(spark: SparkSession, existing: DataFrame, batch: DataFrame,
               numHashes: Int, rowsPerBand: Int,
               minQuality: Double): DataFrame = {
    import graft.CacheRegistry.RegisteredCache
    val exactNew = Dedup.incrementalNew(existing, batch, "doc_id", "text")
      .groupBy(col("digest")).agg(min(col("id")).as("doc_id"))
      .select(col("doc_id"))
      .registeredCache()
    def setsOf(df: DataFrame) = df.select(col("doc_id").as("id"),
        array_distinct(TextHash.hashedShingles(
          transform(Tokenizer.tokenize(col("text")),
            t => TextHash.hashMod(t)), 3)).as("toks"))
      .filter(size(col("toks")) > 0)
    def sigsOf(df: DataFrame) = df.select(
      col("id") +: Dedup.minHashSignaturesHashed(col("toks"), numHashes): _*)
    // the existing-corpus shingle sets are the pipeline's standing asset
    // (at scale they live as a persisted SignatureIndex)
    val exSets = setsOf(existing).registeredCache()
    val bSets = setsOf(batch.join(exactNew, "doc_id"))
    val nearMatched = Dedup.lshCandidatesBetween(
        sigsOf(bSets), sigsOf(exSets), numHashes, rowsPerBand)
      .join(bSets.select(col("id").as("id_new"), col("toks").as("tn")), "id_new")
      .join(exSets.select(col("id").as("id_old"), col("toks").as("to")), "id_old")
      .filter(graft.plans.ArrayJaccard.jaccardLong(col("tn"), col("to")) >= 0.8)
      .select(col("id_new").as("doc_id")).distinct()
    val withinMatched = Dedup.lshCandidates(sigsOf(bSets), numHashes, rowsPerBand)
      .join(bSets.select(col("id").as("id_a"), col("toks").as("ta")), "id_a")
      .join(bSets.select(col("id").as("id_b"), col("toks").as("tb")), "id_b")
      .filter(graft.plans.ArrayJaccard.jaccardLong(col("ta"), col("tb")) >= 0.8)
      .select(col("id_b").as("doc_id")).distinct()
    batch.join(exactNew, "doc_id")
      .join(nearMatched.unionByName(withinMatched).distinct(),
        Seq("doc_id"), "left_anti")
      .withColumn("toks", Tokenizer.tokenize(col("text")))
      .withColumn("quality", Curation.qualityOf(col("text"), col("toks")))
      .filter(col("quality") >= minQuality)
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        col("quality").cast("double").as("quality"),
        md5(Scrub.scrubText(col("text"))).as("scrub_digest"))
      .orderBy("doc_id")
  }
}
