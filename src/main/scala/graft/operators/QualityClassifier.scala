package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextHash, Tokenizer}

/** Linear quality classifier over hashed token features — the fastText-style
  * serving shape of corpus filtering: every token maps into a fixed
  * `Dim`-bucket feature space (the hashing trick bounds model size
  * independently of vocabulary), each bucket carries a weight, and a
  * document's logit is the sum of its tokens' bucket weights.
  *
  * Weights here are derived analytically from md5 of the bucket id
  * (deterministic, cross-engine reproducible — this stands in for a
  * trained model the container can't ship). A LEARNED model drops in by
  * replacing `weightMicro` with `element_at(<broadcast weight-array
  * literal>, bucket + 1)` — the plan shape is identical: completely
  * narrow, one pass over each document's tokens, no shuffle, no UDF.
  * Weights are integer micro-units so the per-doc sum is exact and
  * reduction-order-free; only the final mean returns to double.
  */
object QualityClassifier {

  /** Feature-space size (buckets). */
  val Dim = 1024

  /** Feature bucket of a token: 60-bit md5 prefix mod Dim (non-negative). */
  def bucketOf(tok: Column): Column = TextHash.hash64(tok) % Dim

  /** Deterministic bucket weight in integer micro-units, range
    * [-1000, 1000] ~ [-0.001, 0.001] per token.
    */
  def weightMicro(bucket: Column): Column =
    TextHash.hash64(concat(lit("qw_"), bucket.cast("string"))) % 2001 - 1000

  /** Per-document classifier output:
    * (id, n_tokens, logit_micro, quality, label) where quality is the
    * mean per-token weight and label gates on its sign. Token-less
    * documents are excluded (no features to score).
    */
  def score(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        Tokenizer.tokenize(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("id"), size(col("toks")).cast("long").as("n_tokens"),
        aggregate(col("toks"), lit(0L),
          (acc, t) => acc + weightMicro(bucketOf(t))).as("logit_micro"))
      .select(col("id"), col("n_tokens"), col("logit_micro"),
        (col("logit_micro").cast("double") / lit(1000000.0) /
          col("n_tokens").cast("double")).as("quality"),
        when(col("logit_micro") >= 0, "keep").otherwise("drop").as("label"))
}
