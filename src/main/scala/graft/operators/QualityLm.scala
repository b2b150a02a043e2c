package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram language-model quality scoring: each document's mean surprisal
  * under the corpus's OWN unigram distribution,
  * nll(d) = Σ_t tf(t,d)·ln(total_tokens / count(t)) / |d| — the classic
  * perplexity-style quality gate with the n-gram order cut to 1.
  * Boilerplate built from the corpus's commonest tokens scores low;
  * rare-token gibberish scores high.
  *
  * Determinism: each addend is quantized to the 1e-6 grid as an INTEGER
  * (micro-nats), so the per-doc sum is an integer sum — exact and
  * reduction-order-free — and only the final division returns to double.
  * A groupBy's nondeterministic float-sum order can therefore never move
  * the result (the same pinning the IVF centroid means use).
  *
  * Scale: term counts and the corpus total derive from the (doc,term,tf)
  * aggregate (partial aggs), and the scoring join shuffles on term — the
  * key the count agg just produced. Total joins in as a broadcast
  * singleton; no all-token re-shuffle, no driver action.
  */
object QualityLm {

  /** Over a pre-aggregated (doc_id, term, tf) relation (cache it if the
    * caller's plan would otherwise recompute it thrice).
    */
  def unigramNll(tfs: DataFrame): DataFrame = {
    val cnts = tfs.groupBy("term").agg(sum(col("tf")).cast("double").as("cnt"))
    val tot = tfs.agg(sum(col("tf")).cast("double").as("total"))
    tfs.join(cnts, "term")
      .crossJoin(broadcast(tot))
      .withColumn("addend",
        round(col("tf") * log(col("total") / col("cnt")) * lit(1000000.0))
          .cast("long"))
      .groupBy("doc_id")
      .agg(sum(col("tf")).cast("long").as("n_tokens"),
        sum(col("addend")).as("micro"))
      .select(col("doc_id"), col("n_tokens"),
        (col("micro").cast("double") / lit(1000000.0) /
          col("n_tokens").cast("double")).as("nll"))
  }

  /** Convenience over raw (doc_id, text). The (doc_id, term, tf) aggregate
    * is registered-cached here because the nll plan references it three
    * times (term counts, corpus total, scoring join) — uncached, the
    * tokenize+explode+aggregate pipeline would run three times per action.
    */
  def unigramNllOfDocs(docs: DataFrame): DataFrame = {
    import graft.CacheRegistry.RegisteredCache
    unigramNll(Indexer.tokenPositions(docs)
      .groupBy("doc_id", "term").agg(count(lit(1)).cast("long").as("tf"))
      .registeredCache())
  }
}
