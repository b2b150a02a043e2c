package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout: interleave the bits of two dimension
  * columns so that sorting by the combined value clusters rows that are
  * close in BOTH dimensions into the same files. File- and row-group-level
  * min/max statistics on the original columns then prune a 2-dimensional
  * box predicate (user X AND time Y) the way a 1-column sort can only
  * prune for its leading column — the standard lakehouse layout trick for
  * multi-dimensional scans over immutable columnar storage.
  *
  * The interleave is a pure bit expression (shiftleft/or fold — codegen
  * collapses it into straight-line long arithmetic, no UDF), so it
  * computes identically in any engine with 64-bit integers; the layout
  * write is repartitionByRange(z) + sortWithinPartitions(z): one range
  * exchange, and every output file covers a compact z-interval.
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of `a` and `b` (each must be a
    * non-negative integral column; values are masked to `bits`). Bit i of
    * `a` lands at position 2i+1, bit i of `b` at position 2i — so `a` is
    * the higher-order dimension on ties. bits <= 31 keeps the result in a
    * positive long.
    */
  def interleave(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val mask = (1L << bits) - 1
    val am = a.cast("long").bitwiseAND(lit(mask))
    val bm = b.cast("long").bitwiseAND(lit(mask))
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(am, i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(bm, i).bitwiseAND(lit(1L)), 2 * i))
    }
  }

  /** The SQL mirror of `interleave` for the DuckDB oracle. Every term is
    * fully parenthesized: DuckDB (following PostgreSQL) gives `|`, `&`,
    * `<<` ONE shared precedence level, left-associative — an unwrapped
    * `t1 | x << 3` parses as `(t1 | x) << 3` and overflows.
    */
  def interleaveSql(a: String, b: String, bits: Int): String = {
    val mask = (1L << bits) - 1
    val terms = (0 until bits).flatMap { i =>
      Seq(s"(((($a & $mask) >> $i) & 1) << ${2 * i + 1})",
        s"(((($b & $mask) >> $i) & 1) << ${2 * i})")
    }
    terms.mkString("(", " | ", ")")
  }

  /** Rewrite `df` into `nFiles` z-clustered parquet files under `path`:
    * range-partition by the z-value of (dimA, dimB), sort within each
    * file, write. Cost is one range exchange + the write itself — the
    * same one-pass shape as compaction; at 100 TB this runs per partition
    * of a partitioned table, not globally.
    */
  def writeZOrdered(df: DataFrame, dimA: String, dimB: String, bits: Int,
                    nFiles: Int, path: String): Unit =
    df.withColumn("__z", interleave(col(dimA), col(dimB), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
