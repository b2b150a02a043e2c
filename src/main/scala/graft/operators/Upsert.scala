package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic MERGE INTO (upsert) for immutable columnar stores — the
  * lakehouse CDC-ingest primitive the reference cannot express (Cassandra
  * upserts row-wise; a parquet corpus must be REWRITTEN as merge-on-read
  * or copy-on-write). This is the copy-on-write form: target rows with a
  * matching update key are replaced, unmatched updates are inserted,
  * everything else passes through.
  *
  * Plan shape: tag + union + one partial-aggregating groupBy(key) taking
  * the max-priority row (updates win over target; among duplicate update
  * rows the caller-supplied tiebreak wins). No join at all — the same
  * single-shuffle trick AsOfJoin uses: a full-outer join formulation
  * shuffles both sides anyway and then needs null-merging projections,
  * while max_by over the union is one exchange and skew-safe (a hot key
  * partial-aggregates map-side instead of building a join hash bucket).
  * At 100 TB the rewrite cost is the scan+write itself; partition-pruned
  * variants (rewrite only affected partitions) layer on top by filtering
  * the target side first.
  */
object Upsert {

  /** @param target   current table state
    * @param updates  upsert batch, same schema
    * @param key      match column name
    * @param tiebreak column ordering duplicate UPDATE rows (highest wins);
    *                 must exist in both inputs
    * @return merged table state (one row per key from updates ∪ target)
    */
  def mergeInto(target: DataFrame, updates: DataFrame, key: String,
                tiebreak: String): DataFrame = {
    require(target.columns.sameElements(updates.columns),
      "target and updates must share a schema")
    val cols = target.columns
    val tagged = target.select(lit(0L).as("__pri"), struct(cols.map(col): _*).as("__row"))
      .unionByName(
        updates.select(lit(1L).as("__pri"), struct(cols.map(col): _*).as("__row")))
    tagged
      .groupBy(col(s"__row.$key").as("__k"))
      .agg(max_by(col("__row"),
        struct(col("__pri"), col(s"__row.$tiebreak"))).as("__w"))
      .select(col("__w.*"))
  }
}
