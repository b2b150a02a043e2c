package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context-window packing for LLM pretraining: the concat-and-split plan.
  * Training pipelines concatenate the token streams of many documents and
  * cut the result into fixed-size windows (e.g. 2048/4096/8192 tokens);
  * every window is exactly full, and documents straddle window boundaries.
  * This operator plans that packing relationally — which token span of
  * which document lands in which window — without materializing tokens.
  *
  * Packing is per SHARD: a deterministic partition key bounds the ordered
  * prefix-sum to one shard, so the only wide operation is a window
  * function partitioned by shard (each shard's cumsum is independent; no
  * global sort of the corpus). At 100 TB, shards are the unit of
  * parallelism — thousands of shards each pack locally, which is exactly
  * how production packers shard their input.
  */
object Packing {

  /** @param docs (shard, doc_id, n_tokens) — token counts, not tokens
    * @param windowTokens tokens per packed context window
    * @return one row per (document, window) segment:
    *   (shard, doc_id, win, win_off, doc_off, n_tokens_in_win), where
    *   `win` numbers windows within the shard, `win_off` is the segment's
    *   offset inside the window, `doc_off` its offset inside the document.
    *   Zero-token documents occupy no window and are dropped.
    */
  def contextWindows(docs: DataFrame, windowTokens: Int): DataFrame = {
    require(windowTokens > 0, "windowTokens must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val started = docs.filter(col("n_tokens") > 0)
      .withColumn("start_tok",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
    // a document spans windows floor(start/W) .. floor((start+n-1)/W);
    // the per-window segment is the intersection of the doc's token range
    // with the window's [win*W, (win+1)*W)
    val firstWin = floor(col("start_tok") / windowTokens).cast("long")
    val lastWin =
      floor((col("start_tok") + col("n_tokens") - 1) / windowTokens).cast("long")
    started
      .withColumn("win", explode(sequence(firstWin, lastWin)))
      .withColumn("seg_start",
        greatest(col("start_tok"), col("win") * windowTokens))
      .withColumn("seg_end",
        least(col("start_tok") + col("n_tokens"), (col("win") + 1) * windowTokens))
      .select(col("shard"), col("doc_id"), col("win"),
        (col("seg_start") - col("win") * windowTokens).cast("long").as("win_off"),
        (col("seg_start") - col("start_tok")).cast("long").as("doc_off"),
        (col("seg_end") - col("seg_start")).cast("long").as("n_tokens_in_win"))
  }
}
