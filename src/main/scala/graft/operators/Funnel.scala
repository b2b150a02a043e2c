package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-stage funnel analysis — the product-analytics staple: how many
  * users progress through a sequence of event stages, where stage k must
  * happen strictly AFTER the user's entry into stage k-1 (first A, first
  * B after that A, first C after that B — not mere co-occurrence, which a
  * plain per-type count would conflate).
  *
  * Each stage is one filtered aggregation joined on the user key; every
  * groupBy/join in the chain shuffles on that same key, so the exchanges
  * line up and AQE can reuse partitioning. Counts are integers and the
  * conversion ratio is a single final division — nothing order-sensitive.
  */
object Funnel {

  /** @param events any relation with (userCol, typeCol, tsCol)
    * @param stages event types in funnel order (≥ 1)
    * @return (stage_idx, stage, n_users, conversion) — conversion is
    *   relative to stage 1; one row per stage
    */
  def funnel(events: DataFrame, stages: Seq[String],
             userCol: String = "user_id", typeCol: String = "event_type",
             tsCol: String = "ts"): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val entered = stages.tail.scanLeft(
      events.filter(col(typeCol) === stages.head)
        .groupBy(userCol).agg(min(col(tsCol)).as("t_prev"))) { (prev, st) =>
      events.filter(col(typeCol) === st)
        .join(prev, userCol)
        .filter(col(tsCol) > col("t_prev"))
        .groupBy(userCol).agg(min(col(tsCol)).as("t_prev"))
    }
    val counts = stages.zip(entered).zipWithIndex.map { case ((name, df), i) =>
      df.agg(count(lit(1)).cast("long").as("n_users"))
        .select(lit(i + 1).cast("long").as("stage_idx"),
          lit(name).as("stage"), col("n_users"))
    }.reduce(_.unionByName(_))
    conversions(counts)
  }

  /** Attach the stage-1-relative conversion ratio to a (stage_idx, stage,
    * n_users) stage-count table — shared by the batch funnel above and the
    * streaming funnel's sink aggregation.
    */
  def conversions(counts: DataFrame): DataFrame = {
    val first = counts.filter(col("stage_idx") === 1)
      .select(col("n_users").as("n_first"))
    counts.crossJoin(broadcast(first))
      .select(col("stage_idx"), col("stage"), col("n_users"),
        // empty funnel: 0/0 is defined as 0.0, not a silent null
        when(col("n_first") === 0, lit(0.0))
          .otherwise(col("n_users").cast("double") / col("n_first").cast("double"))
          .as("conversion"))
  }
}
