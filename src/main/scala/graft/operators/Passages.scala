package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextHash, Tokenizer}

/** Passage-granular dedup: chunk documents into fixed-size token windows
  * and remove every passage whose content already occurred earlier in the
  * corpus (global first-occurrence wins), then reassemble the surviving
  * text. This is the "remove duplicated passages, keep the document"
  * curation step — document-level dedup (Dedup.exact / LSH) drops whole
  * near-copies, while this recovers partially-novel documents by excising
  * only the boilerplate they share.
  *
  * Scale design (100 TB):
  *  - chunking is narrow — one tokenize + one explode per document, each
  *    token hashed exactly once (a token belongs to one passage);
  *  - the keep-decision is a groupBy(min) on the passage hash, NOT a
  *    window over the hash partition: min(struct(id, idx)) partial-
  *    aggregates map-side, so a boilerplate passage repeated a million
  *    times combines to one row per map task instead of sorting a
  *    million-row hash partition in one reducer;
  *  - reassembly is one groupBy on the document id.
  *  Three shuffles total, each partial-aggregated or key-bounded.
  */
object Passages {

  /** One row per `n`-token passage: (id, n_chunks, idx, ptoks, h) where
    * `h` is the order-sensitive polynomial fingerprint of the passage
    * tokens and `n_chunks` the document's total passage count (carried so
    * downstream per-doc stats need no second aggregation). The final
    * partial passage is kept (it is its own content — dropping it would
    * delete document tails). Token-less documents yield no rows.
    */
  def chunked(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      Tokenizer.tokenize(col(textCol)).as("toks"))
    val nChunks = ceil(size(col("toks")).cast("double") / n).cast("long")
    val idxs = when(size(col("toks")) > 0,
      sequence(lit(0L), nChunks - 1)).otherwise(array().cast("array<long>"))
    toks.select(col("id"), nChunks.as("n_chunks"),
        explode(idxs).as("idx"), col("toks"))
      .select(col("id"), col("n_chunks"), col("idx"),
        slice(col("toks"), (col("idx") * n + 1).cast("int"), lit(n)).as("ptoks"))
      .withColumn("h", TextHash.fingerprint(col("ptoks")))
  }

  /** Passages surviving global first-occurrence dedup: a passage row is
    * kept iff (id, idx) is the minimum occurrence of its hash over the
    * whole input. Input must carry (id, idx, h); all columns pass through.
    */
  def firstOccurrences(chunks: DataFrame): DataFrame = {
    val first = chunks.groupBy(col("h"))
      .agg(min(struct(col("id"), col("idx"))).as("f"))
    chunks.join(first, "h")
      .filter(col("f.id") === col("id") && col("f.idx") === col("idx"))
      .drop("f")
  }

  /** Reassembled per-document result after passage dedup:
    * (id, n_chunks, kept_chunks, clean_text) with passages re-joined in
    * document order. A document whose EVERY passage occurred earlier keeps
    * zero rows and disappears — full-document dedup falls out as the
    * degenerate case (the first copy retains all its passages).
    */
  def removeDuplicatePassages(docs: DataFrame, idCol: String, textCol: String,
                              n: Int): DataFrame = {
    import graft.CacheRegistry.RegisteredCache
    // the chunk table feeds both the first-occurrence agg and the join
    // probe — cache so tokenize + per-token md5 runs once, not twice
    val kept = firstOccurrences(
      chunked(docs, idCol, textCol, n).registeredCache())
    kept.groupBy(col("id"), col("n_chunks"))
      .agg(sort_array(collect_list(struct(col("idx"), col("ptoks")))).as("ks"))
      .select(col("id"), col("n_chunks"),
        size(col("ks")).cast("long").as("kept_chunks"),
        concat_ws(" ", flatten(col("ks.ptoks"))).as("clean_text"))
  }
}
