package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source breadth-first search over an edge table — the "blast
  * radius" primitive: which nodes sit within k hops of a seed set (tainted
  * docs spreading through a near-dup graph, compromised accounts through a
  * transaction graph).
  *
  * Frontier expansion, one hash join per hop: frontier ⋈ edges produces
  * the next wave, an anti-join against the visited set keeps first
  * (= shortest) discovery only — so the result carries exact hop
  * distances without a min-dist fixpoint. Each round's outputs are
  * eagerly localCheckpoint-ed: the per-round lineage stays ONE join deep
  * instead of compounding (the Components loop's lesson; reliable
  * checkpointing swaps in for executor-loss tolerance). Rounds are
  * bounded by `maxHops`, shuffle volume by frontier x degree — at 100 TB
  * the frontier join partitions on the edge key and the visited set stays
  * (nodes-reached)-sized, never edge-sized. Exits early once a wave comes
  * back empty.
  */
object Bfs {

  /** @param edges DIRECTED edge table (a, b) — symmetrize first for
    *              undirected graphs
    * @param seeds  (id) seed nodes, hop distance 0
    * @return (id, dist) for every node within maxHops of any seed
    */
  def multiSource(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    val e = edges.select(col("a"), col("b"))
    var dist = seeds.select(col("id"), lit(0L).as("dist"))
      .localCheckpoint(true)
    var frontier = dist.select(col("id"))
    var hop = 1
    var done = false
    while (hop <= maxHops && !done) {
      val next = e.join(frontier.select(col("id").as("a")), "a")
        .select(col("b").as("id")).distinct()
        .join(dist.select("id"), Seq("id"), "left_anti")
        .select(col("id"), lit(hop.toLong).as("dist"))
        .localCheckpoint(true)
      if (next.isEmpty) done = true
      else {
        dist = dist.unionByName(next).localCheckpoint(true)
        frontier = next.select(col("id"))
        hop += 1
      }
    }
    dist
  }
}
