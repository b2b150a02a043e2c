package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Bounded time-range join: pairs (left, right) with the same key and
  * `right.time in [left.time, left.time + window]`.
  *
  * A naive `l.key = r.key AND r.ts BETWEEN l.ts AND l.ts + w` plans as a
  * join on key alone with the range as a post-filter — every hot key
  * explodes into |l|·|r| pairs first. Bucketing by `window`-sized time
  * buckets makes the range part of the equi-join key: each left row joins
  * only its own and the next bucket, so pair volume tracks the true match
  * count (+ one-bucket slack), not the key cardinality product.
  */
object RangeJoin {

  /** Times are exact integer epoch-MICROseconds (`unix_micros`) — long
    * arithmetic keeps bucket assignment and range bounds bit-identical
    * across engines (float epochs differ in the last ulp).
    *
    * @param left  carries long column `t` (+ key, payload)
    * @param right carries long column `r_t` (+ key, payload)
    * @param windowMicros range width (also the bucket size), microseconds
    */
  def timeRangePairs(left: DataFrame, right: DataFrame, key: String,
                     windowMicros: Long): DataFrame = {
    def bucket(t: Column): Column = floor(t / lit(windowMicros)).cast("long")
    // left row joins buckets b and b+1 of the right side
    val l = left.withColumn("__b", explode(array(bucket(col("t")), bucket(col("t")) + 1)))
    val r = right.withColumn("__b", bucket(col("r_t")))
    l.join(r, Seq(key, "__b"))
      .filter(col("r_t") >= col("t") && col("r_t") <= col("t") + windowMicros)
      .drop("__b")
  }
}
