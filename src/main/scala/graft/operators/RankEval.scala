package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking-quality metrics over a search result set — the offline eval
  * loop of a retrieval engine (compare /root/reference/app/query.py's
  * interactive display: the reference ships rankings, this measures them).
  *
  * Scale design: everything is per-query — the joins key on
  * (query_id, doc_id) and the windows partition by query_id, so a
  * million-query eval shuffles each ranked row once and never
  * concentrates on a single task. The ranked lists are k rows per query
  * by construction; the relevance table is the only data-sized input and
  * it arrives already aggregated.
  */
object RankEval {

  /** MRR@k and NDCG@k per query.
    *
    * @param ranked (query_id, rank, doc_id) — rank 1-based, at most k rows
    *               per query
    * @param rels   (query_id, doc_id, rel) — graded relevance, rel >= 1
    *               (absent pairs grade 0)
    * @return (query_id, mrr, ndcg, n_rel): reciprocal rank of the first
    *         relevant hit (0.0 if none in the top k), DCG over the ranked
    *         list normalized by the ideal DCG of the best k relevant docs
    *         (ties broken by doc_id for cross-engine determinism), and the
    *         total count of relevant docs.
    */
  def rankingMetrics(ranked: DataFrame, rels: DataFrame, k: Int): DataFrame = {
    val gains = ranked.join(rels, Seq("query_id", "doc_id"), "left_outer")
      .withColumn("rel", coalesce(col("rel"), lit(0L)))
    val perQ = gains.groupBy(col("query_id")).agg(
      sum((pow(lit(2.0), col("rel")) - 1.0) / log2(col("rank") + 1.0)).as("dcg"),
      min(when(col("rel") > 0, col("rank"))).as("first_rel"))
    val iw = Window.partitionBy(col("query_id"))
      .orderBy(col("rel").desc, col("doc_id").asc)
    val ideal = rels.withColumn("irank", row_number().over(iw).cast("long"))
      .filter(col("irank") <= k)
      .groupBy(col("query_id"))
      .agg(sum((pow(lit(2.0), col("rel")) - 1.0) / log2(col("irank") + 1.0))
        .as("idcg"))
    val nRel = rels.groupBy(col("query_id"))
      .agg(count(lit(1)).cast("long").as("n_rel"))
    perQ.join(ideal, Seq("query_id"), "left_outer")
      .join(nRel, Seq("query_id"), "left_outer")
      .select(col("query_id"),
        // metrics pinned to the 1e-9 grid (Money.nanos): DCG chains
        // through pow/log2, whose last ulp is engine-specific
        graft.Money.nanos(coalesce(lit(1.0) / col("first_rel"), lit(0.0))).as("mrr"),
        graft.Money.nanos(coalesce(col("dcg") / col("idcg"), lit(0.0))).as("ndcg"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"))
  }
}
