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
               minQuality: Double): DataFrame =
    assemble(spark, existing, batch, None, None, numHashes, rowsPerBand,
      minQuality)

  /** The same gate chain with the INTRA-batch duplicate detections arriving
    * from the streaming engine's keyed state (DocStreams.bucketCollisions
    * run as the batch streams in): `exactPairs` are candidate same-digest
    * pairs (id_a < id_b; digest equality is re-verified here, so a keyed-
    * state hash collision can never drop a non-duplicate), `withinCands`
    * are within-batch band-collision candidate pairs (jaccard-verified
    * here). Pair-based exact removal is equivalent to the batch path's
    * min-per-digest keep: the higher end of every same-digest pair is
    * removed, and a group whose digest exists in the standing corpus loses
    * every member to the vs-existing gate in both formulations.
    */
  def pipelineWithStreamedPairs(spark: SparkSession, existing: DataFrame,
                                batch: DataFrame, exactPairs: DataFrame,
                                withinCands: DataFrame,
                                numHashes: Int, rowsPerBand: Int,
                                minQuality: Double): DataFrame =
    assemble(spark, existing, batch, Some(exactPairs), Some(withinCands),
      numHashes, rowsPerBand, minQuality)

  private def assemble(spark: SparkSession, existing: DataFrame,
                       batch: DataFrame,
                       exactPairsOpt: Option[DataFrame],
                       withinCandsOpt: Option[DataFrame],
                       numHashes: Int, rowsPerBand: Int,
                       minQuality: Double): DataFrame = {
    import graft.CacheRegistry.RegisteredCache
    val exactNew = (exactPairsOpt match {
      case None =>
        Dedup.incrementalNew(existing, batch, "doc_id", "text")
          .groupBy(col("digest")).agg(min(col("id")).as("doc_id"))
          .select(col("doc_id"))
      case Some(pairs) =>
        // vs-existing via the same bloom+anti-join; intra-batch via the
        // streamed pairs with digest equality re-verified
        val bDig = batch.select(col("doc_id").as("id"),
          md5(Tokenizer.normalizeWhitespace(col("text"))).as("digest"))
        val dup = pairs
          .join(bDig.select(col("id").as("id_a"), col("digest").as("dga")), "id_a")
          .join(bDig.select(col("id").as("id_b"), col("digest").as("dgb")), "id_b")
          .filter(col("dga") === col("dgb"))
          .select(col("id_b").as("doc_id")).distinct()
        Dedup.incrementalNew(existing, batch, "doc_id", "text")
          .select(col("id").as("doc_id"))
          .join(dup, Seq("doc_id"), "left_anti")
    }).registeredCache()
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
    // exact survivors tokenized ONCE, shared by the shingle/near-dup gate
    // and the final manifest's token count + quality metrics (tokenize is
    // the pipeline's heaviest scalar work — three consumers, one pass)
    val survivors = batch.join(exactNew, "doc_id")
      .withColumn("toks", Tokenizer.tokenize(col("text")))
      .registeredCache()
    val bSets = survivors.select(col("doc_id").as("id"),
        array_distinct(TextHash.hashedShingles(
          transform(col("toks"), t => TextHash.hashMod(t)), 3)).as("toks"))
      .filter(size(col("toks")) > 0)
    val nearMatched = Dedup.lshCandidatesBetween(
        sigsOf(bSets), sigsOf(exSets), numHashes, rowsPerBand)
      .join(bSets.select(col("id").as("id_new"), col("toks").as("tn")), "id_new")
      .join(exSets.select(col("id").as("id_old"), col("toks").as("to")), "id_old")
      .filter(graft.plans.ArrayJaccard.jaccardLong(col("tn"), col("to")) >= 0.8)
      .select(col("id_new").as("doc_id")).distinct()
    // streamed candidates are collisions over the WHOLE batch; joining
    // both ends onto the exact-survivor sets restricts them to exactly
    // the pairs the batch formulation generates
    val withinRaw = withinCandsOpt.getOrElse(
      Dedup.lshCandidates(sigsOf(bSets), numHashes, rowsPerBand))
    val withinMatched = withinRaw
      .join(bSets.select(col("id").as("id_a"), col("toks").as("ta")), "id_a")
      .join(bSets.select(col("id").as("id_b"), col("toks").as("tb")), "id_b")
      .filter(graft.plans.ArrayJaccard.jaccardLong(col("ta"), col("tb")) >= 0.8)
      .select(col("id_b").as("doc_id")).distinct()
    survivors
      .join(nearMatched.unionByName(withinMatched).distinct(),
        Seq("doc_id"), "left_anti")
      .withColumn("quality", Curation.qualityOf(col("text"), col("toks")))
      .filter(col("quality") >= minQuality)
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        col("quality").cast("double").as("quality"),
        md5(Scrub.scrubText(col("text"))).as("scrub_digest"))
      .orderBy("doc_id")
  }
}
