package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** BM25 ranking formula, matching the reference's (non-standard) variant
  * exactly (app/query.py:145,170,186-188):
  *
  *   idf(df)  = ln(max(1, N / max(1, df)))      — floored at 0, no +0.5 smoothing
  *   score    = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
  *   k1 = 1.0 (reference uses 1.0, not the textbook 1.2), b = 0.75
  *
  * Expressed as pure Column arithmetic so it compiles into WholeStageCodegen —
  * no UDF, no driver-side loop (the reference scores every posting in a
  * single-threaded Python loop, app/query.py:182-190).
  */
object BM25 {
  val DefaultK1 = 1.0
  val DefaultB = 0.75

  /** Non-standard reference IDF: ln(max(1, N / max(1, df))). */
  def idf(n: Column, df: Column): Column =
    log(greatest(lit(1.0), n.cast("double") / greatest(lit(1.0), df.cast("double"))))

  /** Per-(term, doc) BM25 contribution. */
  def termScore(tf: Column, idfCol: Column, docLen: Column, avgLen: Column,
                k1: Double = DefaultK1, b: Double = DefaultB): Column = {
    val tfD = tf.cast("double")
    idfCol * tfD * lit(k1 + 1.0) /
      (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * docLen.cast("double") / avgLen))
  }
}
