package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextHash, Tokenizer}

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03;
  * the MOSS plagiarism detector's selection algorithm).
  *
  * Hash every k-token shingle, slide a w-hash window over the shingle
  * sequence, keep each window's minimum hash. Guarantees: (1) any match
  * of at least w+k-1 consecutive tokens between two documents yields at
  * least one SHARED fingerprint (every length-w window inside the shared
  * run selects the same minimum in both docs); (2) expected density is
  * 2/(w+1) of the shingles — a tunable sample with a detection floor,
  * which mod-p sampling lacks.
  *
  * Scale: selection is position-local per-document array arithmetic (no
  * shuffle, no state); the cross-document overlap report joins on the
  * fingerprint value — the key its own distinct-agg produced — with
  * corpus-boilerplate fingerprints (document frequency above a cap)
  * dropped BEFORE the self-join, the same bucket-occupancy-cap device the
  * LSH dedup family uses, so no bucket can go quadratic at 100 TB.
  */
object Winnow {

  val DefaultK = 4
  val DefaultW = 4

  /** Distinct winnowed fingerprints per document.
    *
    * @param docs (doc_id, text)
    * @return (doc_id, fps: array<long>) — empty array when the doc has
    *   fewer than k tokens; a document with at least one shingle always
    *   has at least one fingerprint (its final, possibly short, window).
    */
  def fingerprints(docs: DataFrame, k: Int = DefaultK,
                   w: Int = DefaultW): DataFrame =
    docs
      .select(col("doc_id"),
        TextHash.hashedShingles(
          transform(Tokenizer.tokenize(col("text")), t => TextHash.hashMod(t)),
          k).as("g"))
      .select(col("doc_id"), winnowSelect(col("g"), w).as("fps"))

  /** The window-min selection over a shingle-hash array: one window per
    * start position 1..max(len-w+1, 1); slice() truncates the final
    * window at the array end, so short docs (0 < len < w) contribute the
    * minimum of their whole sequence.
    */
  def winnowSelect(g: Column, w: Int = DefaultW): Column =
    when(size(g) === 0, array().cast("array<bigint>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), greatest(size(g) - (w - 1), lit(1))),
        st => array_min(slice(g, st, lit(w))))))

  /** MOSS-style overlap report: document pairs sharing >= minShared
    * fingerprints, fingerprints appearing in more than maxDf documents
    * (corpus boilerplate) excluded before the pair join.
    *
    * @param fps output of [[fingerprints]]
    */
  def overlap(fps: DataFrame, maxDf: Int = 16, minShared: Int = 2): DataFrame = {
    import graft.CacheRegistry.RegisteredCache
    // both sides of the pair join read the same winnowed table — cached,
    // or the whole tokenize→shingle→window-min pipeline runs twice
    val fp = fps.select(col("doc_id"), explode(col("fps")).as("fp"))
    val kept = fp
      .withColumn("df", count(lit(1)).over(Window.partitionBy("fp")))
      .filter(col("df").between(2, maxDf))
      .registeredCache()
    kept.select(col("doc_id").as("doc_a"), col("fp"))
      .join(kept.select(col("doc_id").as("doc_b"), col("fp")), "fp")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).cast("long").as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
