package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of additive materialized views — the lakehouse
  * pattern behind every "daily rollup" table: the stored MV holds partial
  * aggregates that are ADDITIVE (counts, sums — anything a commutative
  * monoid merges), so refreshing with a new batch never rescans history.
  *
  * refresh = (stored MV rows ∪ delta partial-aggregates) re-aggregated by
  * the view key. Keys untouched by the delta pass through unchanged (their
  * group has one row); touched keys merge old + new partials — which also
  * handles LATE data that lands on an already-materialized key, the case
  * that breaks naive "append new days only" refreshers.
  *
  * Scale shape: the delta partial-agg is the only pass over new data
  * (map-side combine, one shuffle on the view key); the stored-MV side is
  * view-sized, not history-sized. AVG/stddev ride as (sum, count) pairs;
  * non-additive aggregates (MIN over deletions, exact distinct) need a
  * different maintenance strategy and are out of scope by design.
  */
object MaterializedView {

  /** Merge a stored additive MV with a delta's partial aggregates.
    *
    * @param mv    the stored view: key columns ++ additive columns
    * @param delta partial aggregates of the NEW batch, same schema
    * @param keys  the view key columns
    * @param adds  the additive (sum-mergeable) columns
    */
  def additiveRefresh(mv: DataFrame, delta: DataFrame,
                      keys: Seq[String], adds: Seq[String]): DataFrame = {
    val cols = (keys ++ adds).map(col)
    val merged = mv.select(cols: _*).unionByName(delta.select(cols: _*))
    val aggs = adds.map(c => sum(col(c)).as(c))
    merged.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
