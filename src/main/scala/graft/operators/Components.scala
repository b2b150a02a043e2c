package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the clustering step
  * a dedup pipeline runs after candidate pairs are verified (pairs alone
  * don't answer "which doc do we keep"; transitive groups do).
  *
  * Iterative min-label propagation: every node starts labeled with its own
  * id; each round replaces a node's label with the min over itself and its
  * neighbors' labels; fixpoint = component id (= min node id reachable).
  * This is the classic Spark formulation (cf. GraphX's RDD version): each
  * round is one shuffle-join over the edge list, and the loop terminates in
  * O(component diameter) rounds. Near-dup clusters are dense and shallow
  * (diameter 2-3), so the round count stays tiny at any corpus size; the
  * per-round cost is the edge join, which partitions by edge key and never
  * materializes anything quadratic.
  *
  * The driver-side loop exists only to test convergence (an aggregate per
  * round) — the per-round data path is fully distributed and lazy.
  */
object Components {

  /** @param edges (a, b) undirected pairs, node ids numeric
    * @return (id, component) for every node appearing in `edges`
    *
    * Each round ends in localCheckpoint, not cache: caching short-circuits
    * EXECUTION but the logical plan still grows by one join per round, and
    * re-analyzing that ever-deeper lineage dominates wall-clock after a few
    * iterations (the classic iterative-plan trap). Checkpointing truncates
    * lineage so every round optimizes a constant-size plan.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 30): DataFrame = {
    val sym = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .distinct().localCheckpoint()
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("component", col("id")).localCheckpoint()
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < maxIter) {
      val nbrMin = sym.join(labels.select(col("id").as("b"), col("component")), "b")
        .groupBy(col("a").as("id")).agg(min(col("component")).as("nbr_min"))
      val next = labels.withColumnRenamed("component", "prev")
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("prev"), coalesce(col("nbr_min"), col("prev"))).as("component"),
          col("prev"))
        .localCheckpoint(eager = false)
      // one job per round: this count materializes the lazy checkpoint
      changed = next.filter(col("component") < col("prev")).count()
      labels = next.drop("prev")
      rounds += 1
    }
    labels
  }
}
