package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  * All reads are plain parquet scans — column pruning and filter pushdown
  * reach the scan via Catalyst (verify with .explain: PushedFilters/ReadSchema).
  */
object Tables {
  def lineitem(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/lineitem.parquet")
  def orders(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/orders.parquet")
  def customer(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/customer.parquet")
  def supplier(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/supplier.parquet")
  def part(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/part.parquet")
  def nation(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/nation.parquet")
  def region(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/region.parquet")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses natively.
    * Read it as raw nanos (legacy conf) and convert to a microsecond
    * timestamp — the same truncation DuckDB applies when it reads NANOS into
    * its µs TIMESTAMP, so oracle epoch arithmetic agrees exactly.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // `div` (integer division): `/` on longs routes through DOUBLE, whose
    // 53-bit mantissa mis-rounds epoch-nanos by ±1us at 2024 magnitudes
    s.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def embeddings(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/embeddings.parquet")

  /** documents with doc_id kept as the source long — cast to string only where
    * reference-format parity (FIXTURES.md A1) requires it.
    */
  def documents(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/documents.parquet")
}
