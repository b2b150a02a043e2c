package graft

import org.apache.spark.sql.functions._

import graft.operators.HeavyHitters

/** Misra-Gries sketch + two-pass exact heavy hitters (operators/HeavyHitters). */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish skew: key i appears ~ N/i times, far more keys than counters. */
  private def skewed(nKeys: Int, scale: Int): Seq[Long] =
    (1 to nKeys).flatMap(i => Seq.fill(scale / i)(i.toLong))

  test("MG summary contains every key with freq > n/k (guarantee), k << distinct") {
    val data = skewed(nKeys = 200, scale = 1000)
    val n = data.size.toLong
    val k = 8
    val summary = data.toDF("key")
      .agg(HeavyHitters.misraGries(k)(col("key")))
      .as[Map[Long, Long]].head()
    assert(summary.size <= k)
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val mustHave = truth.filter { case (_, c) => c * k > n }.keySet
    assert(mustHave.nonEmpty, "test data must produce at least one heavy hitter")
    assert(mustHave.subsetOf(summary.keySet),
      s"missing guaranteed keys: ${mustHave -- summary.keySet}")
    // MG counts are lower bounds with undercount <= n/k
    summary.foreach { case (key, c) =>
      assert(c <= truth(key), s"overcount for $key")
      assert(truth(key) - c <= n / k, s"undercount bound violated for $key")
    }
  }

  test("exactHeavyHitters == naive groupBy-filter on skewed data") {
    val data = skewed(nKeys = 50, scale = 400)
    val n = data.size.toLong
    val k = 8
    val df = data.toDF("user_id")
    val got = HeavyHitters.exactHeavyHitters(df, "user_id", k)
      .as[(Long, Long)].collect().toMap
    val want = data.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * k > n }.toMap
    assert(got == want)
  }

  test("uniform data below threshold yields an empty exact result") {
    val data = (1L to 64L).flatMap(i => Seq.fill(10)(i))
    val got = HeavyHitters.exactHeavyHitters(data.toDF("user_id"), "user_id", 16)
    assert(got.count() == 0)
  }

  test("merge across many partitions preserves the guarantee") {
    val data = skewed(nKeys = 300, scale = 2000)
    val n = data.size.toLong
    val k = 12
    // adversarial layout: sorted, so partitions see disjoint key ranges
    val df = spark.sparkContext.parallelize(data.sorted, 16).toDF("key")
    val summary = df.agg(HeavyHitters.misraGries(k)(col("key")))
      .as[Map[Long, Long]].head()
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val mustHave = truth.filter { case (_, c) => c * k > n }.keySet
    assert(mustHave.subsetOf(summary.keySet))
  }
}
