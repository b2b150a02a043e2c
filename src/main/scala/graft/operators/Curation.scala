package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextAnalysis, TextHash, Tokenizer}

/** Composed corpus-curation pipeline — the end-to-end LLM-training-data
  * flow the individual operators exist for:
  *
  *   quality gate -> language gate -> exact dedup -> prefix-fingerprint
  *   near-dedup -> curated rows with provenance metrics
  *
  * Every stage is a narrow projection or one hash-shuffle; the pipeline is
  * a single lazy plan (no driver materialization between stages), so it
  * scales with partition count. Prefix-fingerprint near-dedup (first-k-token
  * fingerprint collision) is the linear-cost family member; the MinHash /
  * SimHash operators in Dedup are the recall-heavier alternatives.
  */
object Curation {

  val PrefixTokens = 16

  /** Quality metrics used by the gate (mirrors TextAnalysisQueries). */
  def qualityExpr(text: Column): Column =
    qualityOf(text, Tokenizer.tokenize(text))

  /** Quality from an already-tokenized array — callers that need tokens
    * for other stages pass the shared aliased column so the regex+split
    * runs once per row, not once per referencing expression.
    */
  def qualityOf(text: Column, toks: Column): Column = {
    val nTokens = size(toks).cast("double")
    val avgTokLen = when(nTokens === 0, 0.0)
      .otherwise(length(array_join(toks, "")).cast("double") / nTokens)
    val nChars = length(text).cast("double")
    val punct = TextAnalysis.charClassCount(text, "(?U)[^\\w\\s]").cast("double")
    val digits = TextAnalysis.charClassCount(text, "[0-9]").cast("double")
    val punctRatio = when(nChars === 0, 0.0).otherwise(punct / nChars)
    val digitRatio = when(nChars === 0, 0.0).otherwise(digits / nChars)
    when(nTokens === 0, 0.0).otherwise(
      least(lit(1.0), avgTokLen / 8.0) * (lit(1.0) - punctRatio) * (lit(1.0) - digitRatio))
  }

  /** Domain balancing: cap every source at `quota` documents, keeping the
    * highest-quality ones (quality DESC, doc_id ASC tiebreak) — the
    * standard web-corpus move against over-represented domains. One window
    * shuffle keyed by source; at 100 TB the quota rank streams per source
    * partition, nothing corpus-wide.
    * @param docs (doc_id, text, source)
    */
  def sourceQuota(docs: DataFrame, quota: Int): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("quality").desc, col("doc_id").asc)
    docs.withColumn("quality", qualityExpr(col("text")))
      .withColumn("src_rank", row_number().over(w).cast("long"))
      .filter(col("src_rank") <= quota)
  }

  /** Deterministic mixture sampling — the data-mixing step that hits a
    * target language/source composition. Each doc passes through a
    * content-independent md5 hash gate: kept iff
    * hash64(doc_id) mod 1000 < rate(lang) * 1000. No RNG: the sample is
    * reproducible across engines, runs and cluster sizes, and a rate
    * change keeps the surviving set nested (raising a rate only ADDS
    * docs — stable ablation sets). Narrow, no shuffle.
    * @param docs (doc_id, lang, ...)
    */
  def mixtureSample(docs: DataFrame, rates: Map[String, Double],
                    defaultRate: Double): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (lang, r)) =>
      when(col("lang") === lang, lit(r)).otherwise(acc)
    }
    docs
      .withColumn("bucket",
        (TextHash.hash64(col("doc_id").cast("string")) % 1000).cast("long"))
      .filter(col("bucket") < rate * 1000)
  }

  /** Temperature-sampled mixture — the pretraining reweighting that
    * upweights RARE sources: source s with corpus share p_s is sampled
    * proportionally to p_s^alpha (alpha < 1 flattens the distribution;
    * alpha=1 is natural sampling, alpha=0 uniform-over-sources). The
    * per-source keep rate hits an overall target fraction f:
    * rate_s = min(1, f * N * w_s / n_s) with w_s = p_s^alpha / sum w.
    *
    * The gate stays the md5-hash idiom (content-independent,
    * reproducible, nested under rate increases), with the rate pinned to
    * an integer-micro threshold so the same comparison runs in any
    * engine. Everything derives from the (tiny) per-source count table:
    * one groupBy on source, a broadcast join back, a narrow filter — at
    * 100 TB the only shuffle is the count.
    *
    * @param docs  (doc_id, source, ...)
    * @return surviving docs with their source kept for composition audits
    */
  def mixtureTemperature(docs: DataFrame, alpha: Double,
                         targetFraction: Double): DataFrame = {
    val counts = docs.groupBy(col("source"))
      .agg(count(lit(1)).cast("double").as("n"))
    val tot = org.apache.spark.sql.expressions.Window
      .partitionBy() // source table is a handful of rows: global window OK
    val rates = counts
      .withColumn("nn", sum(col("n")).over(tot))
      // w pinned to the 1e-6 grid (Money.micros): pow is libm, and the
      // cross-source wsum would otherwise add last-ulp-different doubles
      // in engine-specific order; grid values sum EXACTLY in any order
      .withColumn("w", graft.Money.micros(pow(col("n") / col("nn"), alpha)))
      .withColumn("wsum", sum(col("w")).over(tot))
      .withColumn("thr",
        round(least(lit(1.0),
          lit(targetFraction) * col("nn") * (col("w") / col("wsum")) / col("n"))
          * 1000000.0).cast("long"))
      .select(col("source"), col("thr"))
    docs.join(broadcast(rates), "source")
      .filter(TextHash.hash64(col("doc_id").cast("string")) % 1000000L
        < col("thr"))
  }

  /** DSIR-style importance weighting: score every document by how much
    * more its content resembles a TARGET subset (the in-domain sample you
    * want more of) than the corpus at large. Features are hashed bigrams
    * in a fixed `dim`-bucket space; each bucket's weight is the smoothed
    * log count-ratio ln((ct+1)/(Nt+dim) · (Nr+dim)/(cr+1)) between target
    * and corpus occurrence counts, and a document's importance is its
    * features' mean weight. Positive = more target-like than average;
    * rank or gate on it to resample toward the target distribution.
    *
    * Determinism: weights are quantized to integer micro-nats before the
    * per-doc sum (the unigram_nll idiom), so reduction order can't move
    * results. Scale: the feature table is linear in corpus tokens and
    * feeds four consumers (two counts, the totals, the scoring join) —
    * cache it; the bucket-weight table is ≤ dim rows, so the scoring join
    * broadcasts and the only shuffles are the two partial-aggregated
    * counts and the per-doc rollup.
    *
    * @param isTarget boolean Column over `docs`' columns selecting the
    *                 target subset
    * @return (id, n_feats, imp) — docs with ≥ 2 tokens (≥ 1 bigram)
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        isTarget: Column, dim: Int = 1024): DataFrame = {
    import graft.CacheRegistry.RegisteredCache
    val feats = docs.select(col(idCol).as("id"), isTarget.as("tgt"),
        transform(Tokenizer.tokenize(col(textCol)),
          t => TextHash.hashMod(t)).as("th"))
      .select(col("id"), col("tgt"),
        explode(TextHash.hashedShingles(col("th"), 2)).as("sh"))
      .select(col("id"), col("tgt"), (col("sh") % dim).as("b"))
      .registeredCache()
    val tgtCnt = feats.filter(col("tgt")).groupBy("b")
      .agg(count(lit(1)).as("ct"))
    val rawCnt = feats.groupBy("b").agg(count(lit(1)).as("cr"))
    val tots = feats.agg(
      sum(when(col("tgt"), 1L).otherwise(0L)).as("nt"),
      count(lit(1)).as("nr"))
    val weights = rawCnt.join(tgtCnt, Seq("b"), "left")
      .select(col("b"), coalesce(col("ct"), lit(0L)).as("ct"), col("cr"))
      .crossJoin(broadcast(tots))
      .select(col("b"),
        round(log(((col("ct") + 1) * (col("nr") + dim)).cast("double") /
            ((col("cr") + 1) * (col("nt") + dim)).cast("double")) * 1e6)
          .cast("long").as("lr_micro"))
    feats.join(broadcast(weights), "b")
      .groupBy(col("id"))
      .agg(count(lit(1)).cast("long").as("n_feats"),
        sum(col("lr_micro")).as("micro"))
      .select(col("id"), col("n_feats"),
        (col("micro").cast("double") / lit(1000000.0) /
          col("n_feats").cast("double")).as("imp"))
  }

  /** @param docs (doc_id, text, lang); returns curated docs with metrics. */
  def curate(docs: DataFrame, minQuality: Double,
             keepLangs: Seq[String]): DataFrame = {
    val gated = docs
      .withColumn("toks", Tokenizer.tokenize(col("text")))
      .withColumn("quality", qualityOf(col("text"), col("toks")))
      .filter(col("quality") >= minQuality && col("lang").isInCollection(keepLangs))
      .withColumn("digest", md5(Tokenizer.normalizeWhitespace(col("text"))))
      .withColumn("prefix_fp",
        TextHash.fingerprint(slice(col("toks"), 1, PrefixTokens)))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
    // exact dedup then prefix-fingerprint near-dedup, min doc_id kept
    val exactW = Window.partitionBy(col("digest"))
    val prefixW = Window.partitionBy(col("prefix_fp"))
    gated
      .withColumn("keep_exact", col("doc_id") === min(col("doc_id")).over(exactW))
      .filter(col("keep_exact"))
      .withColumn("keep_prefix", col("doc_id") === min(col("doc_id")).over(prefixW))
      .filter(col("keep_prefix"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("quality").cast("double").as("quality"), col("prefix_fp"))
  }
}
