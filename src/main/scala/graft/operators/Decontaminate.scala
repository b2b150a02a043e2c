package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextHash, Tokenizer}

/** Training-set decontamination: flag corpus documents that share word
  * n-grams with an evaluation/benchmark set — the standard guard against
  * benchmark leakage into training data (published pipelines check 8-13
  * gram collisions between every training document and every eval set).
  *
  * Plan shape at 100 TB: the EVAL side is benchmarks — tiny — while the
  * corpus is not. Both sides reduce to (doc, shingle-hash) postings with
  * the shared md5 token hashing and polynomial shingle combine (one
  * narrow pass each, no per-shingle md5 or string concat); the overlap
  * join is shingle equality with the eval postings BROADCAST, so corpus
  * rows stream through the probe once and nothing shuffles on the corpus
  * side until the per-doc count aggregation — the single corpus-keyed
  * exchange. Emitting per-doc counts (not per-pair rows) keeps the output
  * proportional to contaminated docs.
  */
object Decontaminate {

  /** @param corpus (idCol, textCol)
    * @param evalSet (idCol, textCol) — small enough to broadcast its
    *                shingle postings (benchmarks, not a second corpus)
    * @param n shingle width; 8+ for production decontamination
    * @return one row per corpus doc sharing at least one n-gram with the
    *         eval set: (id, n_shared_shingles — distinct overlapping
    *         shingles, n_eval_docs — distinct eval docs hit)
    */
  def overlap(corpus: DataFrame, evalSet: DataFrame, idCol: String,
              textCol: String, n: Int = 8): DataFrame = {
    def shingles(df: DataFrame) = df.select(
      col(idCol).as("id"),
      explode(array_distinct(TextHash.hashedShingles(
        transform(Tokenizer.tokenize(col(textCol)), t => TextHash.hashMod(t)),
        n))).as("shingle"))
    val evalShingles = shingles(evalSet)
      .select(col("id").as("eval_id"), col("shingle"))
    shingles(corpus).join(broadcast(evalShingles), "shingle")
      .groupBy(col("id"))
      .agg(countDistinct(col("shingle")).as("n_shared_shingles"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
  }
}
