package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking (the Deequ pattern): a
  * rule set is evaluated in ONE scan — every rule becomes a conditional
  * count inside a single 1-row aggregate, then the wide row unpivots to
  * the (rule, n_rows, n_violations, violation_rate) report. The reference
  * has no validation at all (malformed TSV rows are silently skipped,
  * app/mapreduce/mapper1.py:20); a 100 TB ingest needs the violations
  * COUNTED, and needs all rules to share one pass — N separate
  * `df.filter(rule).count()` calls would scan the corpus N times, this
  * scans once and partial-aggregates map-side.
  */
object DataQuality {

  /** @param name output label; @param violated true on BAD rows */
  case class Rule(name: String, violated: Column)

  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    require(rules.map(_.name).distinct.size == rules.size, "rule names must be unique")
    val aggs = count(lit(1)).as("__n") +: rules.map(r =>
      sum(when(r.violated, 1L).otherwise(0L)).as(r.name))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    wide.select(col("__n"),
        explode(array(rules.map(r => struct(lit(r.name).as("rule"),
          coalesce(col(r.name), lit(0L)).as("v"))): _*)).as("s"))
      .select(col("s.rule").as("rule"),
        col("__n").as("n_rows"),
        col("s.v").as("n_violations"),
        (col("s.v").cast("double") / col("__n").cast("double"))
          .as("violation_rate"))
  }
}
