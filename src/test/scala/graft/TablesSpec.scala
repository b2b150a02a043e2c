package graft

import org.apache.spark.sql.functions._

/** Pins the schema-adaptive events loader: driver testdata regenerations
  * have shipped `ts` as TIMESTAMP(NANOS) (reads as a raw nanos LONG under
  * the legacy conf) and as TIMESTAMP(MICROS) (reads as TIMESTAMP_NTZ) —
  * r5 lost 46 green queries to a loader that assumed one physical type.
  * All representations must load to the identical canonical µs TIMESTAMP.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // three known epochs, sub-second micros included
  private val epochsMicros = Seq(1700000000000000L, 1700000123456789L, 0L)

  private def writeEvents(tag: String, tsCol: org.apache.spark.sql.Column): String = {
    val dir = ScratchDirs.fresh("graft_test", s"events_$tag")
    epochsMicros.zipWithIndex.toDF("us", "event_id")
      .select(col("event_id").cast("long"), tsCol.as("ts"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir.toString
  }

  private def load(dir: String): Map[Long, Long] =
    Tables.events(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .as[(Long, Long)].collect().toMap

  test("long-nanos, timestamp_ntz, and timestamp events all load identically") {
    val asNanosLong = writeEvents("nanos", (col("us") * 1000L).cast("long"))
    val asNtz = writeEvents("ntz", timestamp_micros(col("us")).cast("timestamp_ntz"))
    val asLtz = writeEvents("ltz", timestamp_micros(col("us")))
    val expected = epochsMicros.zipWithIndex
      .map { case (us, i) => (i.toLong, us) }.toMap
    assert(load(asNanosLong) == expected, "nanos-long path")
    assert(load(asNtz) == expected, "timestamp_ntz path")
    assert(load(asLtz) == expected, "timestamp path")
  }

  test("loader rejects an unsupported ts type loudly") {
    val asString = writeEvents("str", lit("2024-01-01").cast("string"))
    val e = intercept[RuntimeException](Tables.events(spark, asString))
    assert(e.getMessage.contains("unsupported parquet type"))
  }
}
