package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextHash

/** Deterministic probabilistic sketches — a Bloom filter and a count-min
  * sketch built from the engine's md5-prefix hash family, so a SQL oracle
  * can reproduce every bit and counter exactly (no RNG, no engine-private
  * hash).
  *
  * Scale design:
  *  - the Bloom filter collapses to ONE row (the sorted set-bit array) via
  *    a partial-aggregated distinct over positions, then broadcasts to the
  *    probe side — membership pre-filtering costs a narrow map over the
  *    fact table, no shuffle, no join. This is the classic semi-join
  *    pre-filter: ship O(m) bits instead of shuffling O(fact) rows.
  *  - the count-min sketch is a fixed d×w cell table produced by one
  *    partial-aggregated shuffle of the (j, bucket) cells; cells from
  *    different partitions merge by addition (the sketch is a monoid), so
  *    at 100 TB the combine happens map-side and only d×w rows move.
  *    Estimates join the broadcast sketch — again no fact shuffle.
  */
object Sketches {

  /** Hash j of `key` reduced to a bucket in [0, m) — md5-prefix keyed by
    * the (j, key) pair; TextHash.hash64 is 60-bit non-negative so the mod
    * is safe in both engines.
    */
  def bucket(j: Column, key: Column, m: Int): Column =
    TextHash.hash64(concat_ws("_", j.cast("string"), key.cast("string"))) % m

  /** All k positions of `key` in an m-bit filter. */
  def positions(key: Column, m: Int, k: Int): Column =
    array((0 until k).map(j => bucket(lit(j), key, m)): _*)

  /** Build: one row holding the filter's set-bit positions, sorted. The
    * distinct runs inside the aggregate (collect_set), so the only data
    * movement is the final single-row combine.
    */
  def bloomBuild(keys: DataFrame, keyCol: String, m: Int, k: Int): DataFrame =
    keys.select(explode(positions(col(keyCol), m, k)).as("p"))
      .agg(sort_array(collect_set(col("p"))).as("bits"))

  /** Probe: `df` plus boolean `passCol` — true iff ALL k positions of
    * `keyCol` are set. Broadcast of the one-row bits table; the membership
    * test itself is narrow.
    *
    * The sparse set-bit array is expanded ONCE (on the single build row)
    * into a dense m-slot boolean mask so each probe is k O(1) lookups —
    * `array_contains` on the sparse form scans O(set bits) per probe,
    * which at a 150k-row probe side is ~10^9 comparisons (measured 8.5 s;
    * the dense mask takes it to sub-second).
    */
  def bloomProbe(df: DataFrame, keyCol: String, bits: DataFrame,
                 m: Int, k: Int, passCol: String): DataFrame = {
    val mask = bits.select(
      transform(sequence(lit(0L), lit(m - 1L)),
        i => array_contains(col("bits"), i)).as("mask"))
    df.crossJoin(broadcast(mask))
      .withColumn(passCol,
        forall(positions(col(keyCol), m, k),
          p => element_at(col("mask"), (p + 1L).cast("int"))))
      .drop("mask")
  }

  /** Build the d×w counter cells over `df`'s key column. */
  def cmsBuild(df: DataFrame, keyCol: String, d: Int, w: Int): DataFrame =
    df.select(explode(array((0 until d).map(j =>
        struct(lit(j).as("j"), bucket(lit(j), col(keyCol), w).as("b"))): _*))
        .as("cell"))
      .groupBy(col("cell.j").as("j"), col("cell.b").as("b"))
      .agg(count(lit(1)).as("c"))

  /** Point estimates for `probes`' keys: min over the key's d cells.
    * Unseen keys estimate 0 (their cells may be absent — left join).
    */
  def cmsEstimate(probes: DataFrame, keyCol: String, sketch: DataFrame,
                  d: Int, w: Int): DataFrame = {
    val exploded = probes.select(col(keyCol),
      explode(array((0 until d).map(lit): _*)).as("pj"))
      .withColumn("pb", bucket(col("pj"), col(keyCol), w))
    exploded.join(broadcast(sketch),
        col("pj") === col("j") && col("pb") === col("b"), "left_outer")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("c"), lit(0L))).cast("long").as("cms_est"))
  }
}
