package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A plain shuffle join sends every row of a hot key to one reducer; with a
  * power-law key (one customer with 10^8 orders), that task dominates the
  * stage. Salting splits each hot key into `buckets` sub-keys: the skewed
  * side picks a deterministic salt from its full row hash, the build side
  * is replicated `buckets` times, and the join runs on (key, salt) —
  * spreading the hot key over `buckets` tasks at the cost of replicating
  * the (small) build side.
  *
  * AQE's skew-join handling does this adaptively for sort-merge joins;
  * this operator is the explicit form for when the optimizer can't see the
  * skew (e.g. pre-aggregated inputs or non-SMJ plans).
  */
object SkewJoin {

  /** @param skewed   large, skew-keyed side
    * @param build    smaller side, replicated `buckets` times
    * @param key      equi-join column name (present in both)
    * @param buckets  salt fan-out
    */
  def saltedInnerJoin(skewed: DataFrame, build: DataFrame, key: String,
                      buckets: Int): DataFrame = {
    // Deterministic salt: hash of all columns spreads rows of one hot key
    // uniformly without RNG (reruns and retries see the same salt).
    val salt = pmod(hash(skewed.columns.map(col): _*), lit(buckets))
    val salted = skewed.withColumn("__salt", salt)
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
