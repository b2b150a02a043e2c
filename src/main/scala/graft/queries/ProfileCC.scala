package graft.queries

import org.apache.spark.sql.SparkSession

/** Dev tool (optimization round r16, VERDICT r15 #5): the connected-
  * components ROUND-COUNT evidence. For each CC consumer's exact
  * production edge input (the phash rep graph and the shingled-pair text
  * graph), runs Components.connectedComponentsResult at several
  * `checkEvery` values and prints rounds-to-converge, batch count, and
  * wall time — the histogram the checkEvery decision needs: if the loop
  * converges in ≤2 propagation rounds, checkEvery=4 computes 2 wasted
  * rounds before the first (and only) convergence check; if it needs 3-4,
  * checkEvery=2 pays an extra counting job instead.
  * Run: scripts/run-main.sh graft.queries.ProfileCC [sfDir]
  */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption
      .getOrElse(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val inputs: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "phash_rep_graph" -> (() =>
        MultimodalQueries.phashRepPairs(MultimodalQueries.phashGroups(spark, dir))),
      "shingled_text_graph" -> (() =>
        DedupQueries.shingledPairs(spark, dir)
          .select(org.apache.spark.sql.functions.col("doc_id_a").as("a"),
            org.apache.spark.sql.functions.col("doc_id_b").as("b"))))

    inputs.foreach { case (name, edges) =>
      println(s"== $name: ${edges().count()} edges")
      Seq(1, 2, 4).foreach { ce =>
        (1 to 3).foreach { i =>
          val t0 = System.nanoTime()
          val r = graft.operators.Components
            .connectedComponentsResult(edges(), checkEvery = ce,
              pointerJump = false)
          val n = r.labels.count()
          val dt = (System.nanoTime() - t0) / 1e9
          println(f"  checkEvery=$ce run$i: rounds=${r.rounds} " +
            f"converged=${r.converged} labels=$n time=$dt%.2fs")
        }
      }
    }
    spark.stop()
  }
}
