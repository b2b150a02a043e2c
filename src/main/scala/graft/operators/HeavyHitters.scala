package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Exact heavy hitters in two bounded-memory passes: a Misra-Gries sketch
  * finds a small candidate set, then only the candidates are recounted
  * exactly. The reference aggregates exact per-key counts by shuffling
  * every key (`app/mapreduce/reducer2.py:3-5` is the same shape for term
  * df); at 100 TB a full groupBy over a billion-key domain just to find
  * the few dominant keys shuffles the entire domain. This operator never
  * holds more than `k` counters per task:
  *
  *  - pass 1 (narrow + one 1-row agg): each map task folds its rows into a
  *    k-counter Misra-Gries summary; summaries merge pairwise (Agarwal et
  *    al., "Mergeable Summaries", PODS'12) into ONE row of at most k
  *    (key, lower-bound) pairs. MG guarantees every key with true
  *    frequency > n/k survives — the candidate set is a superset of the
  *    answer no matter how adversarial the partitioning.
  *  - pass 2: candidates (≤ k rows) broadcast back against the input; only
  *    matching rows are counted — a partial-aggregated groupBy over ≤ k
  *    distinct keys — and the exact counts are thresholded with pure
  *    integer arithmetic (freq · k > n), so the result is EXACTLY
  *    {key : freq > n/k}, independent of sketch error.
  *
  * Nothing is collected to the driver; the only wide ops are the 1-row
  * summary agg and the ≤ k-key recount.
  */
object HeavyHitters {

  /** MG summary entry: `cnt` is the undercounting lower bound. */
  case class Entry(key: Long, cnt: Long)
  case class Buf(items: Map[Long, Long])

  /** Misra-Gries with `k` counters over long keys. `reduce` is the classic
    * step (hit: +1; room: insert; full: decrement-all); `merge` sums the
    * two summaries and, if over capacity, subtracts the (k+1)-th largest
    * count from every counter and drops the non-positive — the mergeable-
    * summaries construction that preserves the ≤ n/k undercount bound.
    */
  class MisraGries(k: Int) extends Aggregator[Long, Buf, Map[Long, Long]] {
    require(k >= 1, "k must be >= 1")
    override def zero: Buf = Buf(Map.empty)
    override def reduce(b: Buf, key: Long): Buf = {
      val m = b.items
      m.get(key) match {
        case Some(c) => Buf(m.updated(key, c + 1))
        case None if m.size < k => Buf(m.updated(key, 1L))
        case None =>
          // decrement-all: one "vote" of every tracked key is cancelled
          // against the incoming key; zeros vacate their counter
          Buf(m.flatMap { case (x, c) => if (c > 1) Some(x -> (c - 1)) else None })
      }
    }
    override def merge(a: Buf, b: Buf): Buf = {
      val sum = b.items.foldLeft(a.items) { case (m, (x, c)) =>
        m.updated(x, m.getOrElse(x, 0L) + c)
      }
      if (sum.size <= k) Buf(sum)
      else {
        val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
        Buf(sum.flatMap { case (x, c) => if (c > cut) Some(x -> (c - cut)) else None })
      }
    }
    override def finish(b: Buf): Map[Long, Long] = b.items
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Map[Long, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()
  }

  def misraGries(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new MisraGries(k), Encoders.scalaLong)

  /** Exact {key : freq > n/k} over `df.keyCol` (nulls ignored), as
    * (keyCol, freq). See class doc for the two-pass shape.
    */
  def exactHeavyHitters(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    val rows = df.filter(col(keyCol).isNotNull).select(col(keyCol).as("key"))
    val summary = rows.agg(
      misraGries(k)(col("key")).as("cands"),
      count(lit(1)).as("n"))
    val cands = summary.select(explode(map_keys(col("cands"))).as("key"),
      col("n"))
    rows.join(broadcast(cands), "key")
      .groupBy(col("key"), col("n"))
      .agg(count(lit(1)).as("freq"))
      .filter(col("freq") * lit(k.toLong) > col("n"))
      .select(col("key").as(keyCol), col("freq"))
  }
}
