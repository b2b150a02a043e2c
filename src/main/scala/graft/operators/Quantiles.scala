package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed exact interpolated quantiles (quantile_cont semantics).
  *
  * Low-cardinality group-bys make window/sort formulations collapse to one
  * task per group (a 2-group percentile over 10^9 rows would sort 5·10^8
  * rows on one core). This keeps full parallelism:
  *
  *   1. range-repartition by (group, value): global order becomes
  *      (partition id, within-partition order) — a parallel sort
  *   2. rank within (partition id, group) — the window is salted by the
  *      physical partition, so every core ranks its own slice
  *   3. per-(partition, group) counts -> driver computes each partition's
  *      global offset and the floor/ceil target positions of (n-1)·p
  *   4. one more pass joins the tiny (group, position) target list and
  *      fetches ONLY those rows; interpolation happens on the driver
  *
  * Driver traffic is O(partitions·groups + groups·percentiles), never the
  * data. Ties at any rank carry equal values, so the result is
  * deterministic and matches DuckDB's quantile_cont.
  */
object Quantiles {

  /** @return one row per group: (groupCol, q0 .. q{ps.size-1}) */
  def exactQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                     ps: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    val ranked = df
      .select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("double").as("v"))
      .repartitionByRange(col("g"), col("v"))
      .withColumn("pid", spark_partition_id())
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("pid"), col("g")).orderBy(col("v"))))
      .cache()

    val counts: Array[(Int, String, Long)] = ranked
      .groupBy("pid", "g").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))

    // Global offset of each (pid, group) block + total n per group.
    val totals = mutable.LinkedHashMap.empty[String, Long]
    val offsets = mutable.Map.empty[(Int, String), Long]
    counts.sortBy(_._1).foreach { case (pid, g, c) =>
      offsets((pid, g)) = totals.getOrElse(g, 0L)
      totals.update(g, totals.getOrElse(g, 0L) + c)
    }

    val targets: Seq[(String, Long)] = totals.toSeq.flatMap { case (g, n) =>
      ps.flatMap { p =>
        val r = (n - 1) * p
        Seq(g -> math.floor(r).toLong, g -> math.ceil(r).toLong)
      }.distinct
    }

    val offsetDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        offsets.toSeq.map { case ((pid, g), off) => Row(pid, g, off) }, 1),
      StructType(Seq(StructField("pid", IntegerType),
        StructField("g", StringType), StructField("off", LongType))))
    val targetDf = spark.createDataFrame(
      spark.sparkContext.parallelize(targets.map { case (g, t) => Row(g, t) }, 1),
      StructType(Seq(StructField("g", StringType), StructField("gidx", LongType))))

    val picked: Map[(String, Long), Double] = ranked
      .join(broadcast(offsetDf), Seq("pid", "g"))
      .withColumn("gidx", col("off") + col("rn") - 1)
      .join(broadcast(targetDf), Seq("g", "gidx"))
      .select(col("g"), col("gidx"), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    ranked.unpersist()

    val rows = totals.toSeq.map { case (g, n) =>
      val qs = ps.map { p =>
        val r = (n - 1) * p
        val lo = math.floor(r).toLong
        val hi = math.ceil(r).toLong
        val frac = r - lo
        picked((g, lo)) * (1.0 - frac) + picked((g, hi)) * frac
      }
      Row.fromSeq(g +: qs)
    }
    val schema = StructType(
      StructField(groupCol, StringType) +:
        ps.indices.map(i => StructField(s"q$i", DoubleType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toList, 1), schema)
  }
}
