package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: sweep every registered query's physical plan at sf0.001 and
  * flag scale anti-patterns — CartesianProduct / BroadcastNestedLoopJoin
  * anywhere, and single-partition exchanges feeding non-presentation
  * work. A structural complement to PlanSpec's targeted pins: PlanSpec
  * asserts the plans we designed; this catches the ones we didn't look at.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}

    // a build side is BOUNDED if it reduces to a grouping-key-less
    // aggregate (exactly one row: corpus totals, scalar stats) or a
    // literal local relation — the standard crossJoin(broadcast(scalar))
    // shape, safe at any corpus size
    def bounded(p: SparkPlan): Boolean = {
      val s = p.toString
      s.contains("keys=[]") || s.contains("LocalTableScan") ||
        s.contains("OneRowRelation") || s.contains("ReusedExchange")
    }

    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

    // SparkPlan.collect does NOT descend through AdaptiveSparkPlanExec
    // (its `children` is empty — the wrapped plan hides in
    // currentPhysicalPlan) nor QueryStageExec; walk those explicitly or
    // the audit is vacuous under AQE
    def nodes(p: SparkPlan): Iterator[SparkPlan] = {
      val kids: Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      Iterator(p) ++ kids.iterator.flatMap(nodes)
    }

    // BNLJ build sides that ARE bounded but not provably so from the plan
    // text: config-sized tables (probe sets limited to NQueries=10,
    // centroid/codebook tables of nlist=64 / M*Ks=64 rows) and the one
    // labeled cartesian baseline. Adjudicated by hand; a NEW query
    // acquiring a nested-loop join still gets flagged.
    val allowed: Map[String, String] = Map(
      "ann_brute_force" -> "labeled all-pairs baseline: 10-probe set x corpus",
      "ann_quantized" -> "10-probe set x corpus, int8 exact re-rank baseline",
      "ann_ivf_pq_prebuilt" -> "probes x 64-row stored centroid table (ADC prep)",
      "ann_ivf_pq_appended" -> "probes x 64-row stored centroid table (ADC prep)",
      "ann_ivf_pq_deleted" -> "probes x 64-row stored centroid table (ADC prep)",
      "stream_vector_ingest" -> "serving read: probes x 64-row centroid table",
      "cross_join_regions" -> "labeled cartesian: 5 regions x 25 nations",
      "quantile_bins" -> "values x 10-row quantile cut-point table")

    var flagged = 0
    Queries.all.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan
        val bad = nodes(plan).toSeq.collect {
          case j: BroadcastNestedLoopJoinExec =>
            val build = j.buildSide match {
              case BuildLeft => j.left
              case BuildRight => j.right
            }
            if (bounded(build)) None
            else Some(s"BNLJ(${j.joinType}) build=${build.nodeName}")
          case c: CartesianProductExec => Some(s"Cartesian ${c.nodeName}")
        }.flatten
        if (bad.nonEmpty) {
          allowed.get(name) match {
            case Some(reason) => println(s"OK   $name (allowed: $reason)")
            case None =>
              flagged += 1
              println(s"FLAG $name: ${bad.mkString("; ")}")
          }
        }
      } catch {
        case e: Throwable =>
          flagged += 1
          println(s"ERR  $name: ${String.valueOf(e.getMessage).take(120)}")
      }
    }
    println(s"audit done: $flagged flagged of ${Queries.all.size}")
    spark.stop()
  }
}
