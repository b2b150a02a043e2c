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
}
