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
    * [-1000, 1000] ~ [-0.001, 0.001] per token (expression form — the
    * oracle mirrors this; the hot path uses the precomputed literal
    * array below instead, WeightSpec pins their equality).
    */
  def weightMicro(bucket: Column): Column =
    TextHash.hash64(concat(lit("qw_"), bucket.cast("string"))) % 2001 - 1000

  /** Driver-side mirror of `weightMicro` (same md5 → 60-bit prefix). */
  def weightMicroValue(b: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"qw_$b".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16) % 2001 - 1000
  }

  /** The whole weight vector as a constant array literal — the broadcast
    * model. One md5 per TOKEN (the feature hash) remains; the weight
    * lookup is an array index instead of a second md5 (halves the hashing
    * on the hot path; r2 lesson — md5-derived constants fold driver-side,
    * never per-row).
    */
  private lazy val weightsLit: Column =
    array((0 until Dim).map(b => lit(weightMicroValue(b))): _*)

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
          (acc, t) => acc +
            element_at(weightsLit, (bucketOf(t) + 1).cast("int")))
          .as("logit_micro"))
      .select(col("id"), col("n_tokens"), col("logit_micro"),
        (col("logit_micro").cast("double") / lit(1000000.0) /
          col("n_tokens").cast("double")).as("quality"),
        when(col("logit_micro") >= 0, "keep").otherwise("drop").as("label"))
}
