package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Pins the ANN determinism contract: the driver-side plane constants must
  * equal the engine-portable md5 Column form (which the DuckDB oracles
  * mirror in SQL), and LSH bucketing must behave like a sign-pattern hash.
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("planeValue equals the md5 Column form over the full 8x64 grid") {
    val grid = for { j <- 0 until 8; d <- 0 until 64 } yield (j, d)
    val fromSpark = grid.toDF("j", "d")
      .select(Similarity.planeComponent(col("j"), col("d")).as("p"))
      .collect().map(_.getDouble(0)).toSeq
    val fromDriver = grid.map { case (j, d) => Similarity.planeValue(j, d) }
    assert(fromSpark == fromDriver)
  }

  test("lshBuckets: equal vectors collide, negated vectors flip every bit") {
    val v = (0 until 64).map(i => math.sin(i + 1.0))
    val df = Seq((1L, v), (2L, v), (3L, v.map(-_))).toDF("id", "v")
    val b = Similarity.lshBuckets(spark, df, 8, 64)
      .select("id", "bucket")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b(1L) == b(2L))
    // no plane dot is exactly zero for this vector, so negation flips all
    // 8 sign bits: buckets are bitwise complements within the low byte
    assert((b(1L) ^ b(3L)) == 0xffL)
  }
}
