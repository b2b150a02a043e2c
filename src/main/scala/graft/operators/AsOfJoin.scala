package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the latest right row with
  * `right.time <= left.time` in the same key group.
  *
  * Implemented as tag + union + one window pass — a single shuffle on the
  * key, linear in input size. The naive range join (`l.key = r.key AND
  * r.ts <= l.ts` + max) explodes to O(left × right-per-key) pairs before
  * aggregating; this never materializes pairs at all, so it survives hot
  * keys with millions of rows on both sides.
  */
object AsOfJoin {

  /** @param left      probe side; all its columns are kept
    * @param right     reference side; carried as a nullable struct `asof`
    * @param key       equi-key column name present in both
    * @param leftTime  event-time column in `left`
    * @param rightTime event-time column in `right`
    * @param rightTiebreak column of `right` ordering simultaneous rows
    *                      (latest wins); required for determinism
    */
  def asOfPrior(left: DataFrame, right: DataFrame, key: String,
                leftTime: String, rightTime: String,
                rightTiebreak: String): DataFrame = {
    val rStructCols = right.columns.filter(_ != key).map(col)
    val rStructType = struct(rStructCols: _*)
    val l = left.select(col(key).as("__k"), col(leftTime).as("__t"),
      lit(1).as("__side"), struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast("bigint").as("__tb"),
      lit(null).cast(right.select(rStructType).schema.head.dataType).as("__r"))
    val r = right.select(col(key).as("__k"), col(rightTime).as("__t"),
      lit(0).as("__side"), lit(null).cast(left.select(struct(left.columns.map(col): _*)).schema.head.dataType).as("__l"),
      col(rightTiebreak).cast("bigint").as("__tb"), rStructType.as("__r"))
    // Rights sort before lefts at equal time (side 0 < 1), so "prior or
    // simultaneous" rights are visible; among simultaneous rights the
    // highest tiebreak wins.
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__tb").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.union(r)
      .withColumn("asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*"), col("asof"))
  }

  /** Forward as-of join: for every left row, the EARLIEST right row with
    * `right.time >= left.time` in the same key group — the other half of
    * the pandas/kdb as-of surface (direction='forward'), e.g. "the next
    * purchase after each click". Same tag + union + one-window-pass shape
    * as asOfPrior (single key shuffle, no pair blowup): time DESCENDING
    * with rights sorting before lefts at equal time, so the running
    * last-non-null right is the nearest at-or-after match; among
    * simultaneous rights the LOWEST tiebreak wins (earliest event).
    *
    * @param toleranceSeconds if set, matches farther than this past the
    *   left time are nulled — `asof` whole-struct null, exactly like "no
    *   match" (the pandas `tolerance` parameter). Applied AFTER the window
    *   pass as a narrow projection, so it costs nothing extra.
    */
  def asOfNext(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightTiebreak: String,
               toleranceSeconds: Option[Long] = None): DataFrame = {
    val rStructCols = right.columns.filter(_ != key).map(col)
    val rStructType = struct(rStructCols: _*)
    val l = left.select(col(key).as("__k"), col(leftTime).as("__t"),
      lit(1).as("__side"), struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast("bigint").as("__tb"),
      lit(null).cast(right.select(rStructType).schema.head.dataType).as("__r"))
    val r = right.select(col(key).as("__k"), col(rightTime).as("__t"),
      lit(0).as("__side"), lit(null).cast(left.select(struct(left.columns.map(col): _*)).schema.head.dataType).as("__l"),
      col(rightTiebreak).cast("bigint").as("__tb"), rStructType.as("__r"))
    // Descending time: rights at or after the left row were already seen.
    // __tb DESC so that among rights at the SAME time, the lowest tiebreak
    // is seen last and wins.
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").desc, col("__side").asc, col("__tb").desc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l.union(r)
      .withColumn("asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*"), col("asof"))
    toleranceSeconds.fold(joined) { tol =>
      // exact integer-microsecond comparison (a seconds cast would
      // truncate and admit matches up to a second past the bound)
      joined.withColumn("asof",
        when(unix_micros(col(s"asof.$rightTime")) - unix_micros(col(leftTime))
          <= tol * 1000000L, col("asof")))
    }
  }
}
