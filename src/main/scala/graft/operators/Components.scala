package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the clustering step
  * a dedup pipeline runs after candidate pairs are verified (pairs alone
  * don't answer "which doc do we keep"; transitive groups do).
  *
  * Iterative min-label propagation: every node starts labeled with its own
  * id; each round replaces a node's label with the min over itself and its
  * neighbors' labels; fixpoint = component id (= min node id reachable).
  * This is the classic Spark formulation (cf. GraphX's RDD version), with
  * three plan-level economies:
  *
  *  - Everything up to the first convergence check is ONE job: the
  *    symmetrized edge table, the initial labels and each round are lazy
  *    checkpoints, and a round's repeated references resolve to the same
  *    underlying RDD, so the edge build runs once and its blocks cache at
  *    first use (stages dedup by RDD identity within a job).
  *  - The edge table is checkpointed pre-partitioned on the join key
  *    (Dataset.checkpoint preserves outputPartitioning through LogicalRDD),
  *    so no round pays the edge-side exchange — at scale that is the loop's
  *    dominant shuffle, paid once instead of once per round.
  *  - Convergence is checked once per `checkEvery` rounds; the counting
  *    action is also what materializes the batch of rounds, so detection
  *    costs no extra pass. Superseded rounds' checkpoint blocks are
  *    unpersisted as soon as the next batch lands (storage stays O(1)
  *    copies of the label table, not O(rounds)).
  *
  * Rounds scale with component diameter; near-dup clusters are dense and
  * shallow (diameter 2-3), so the round count stays tiny at any corpus
  * size. For adversarially deep graphs, `pointerJump` adds a label-of-label
  * self-join per round, which contracts chains exponentially
  * (O(log diameter) rounds) at the cost of one extra small join per round —
  * leave it on for unknown graph shapes, off for bounded-diameter ones.
  *
  * The driver-side loop exists only to test convergence — the per-round
  * data path is fully distributed and lazy.
  */
object Components {

  /** Labels plus loop telemetry, for callers that must detect truncation
    * instead of failing (e.g. best-effort clustering with a round budget).
    */
  final case class Result(labels: DataFrame, rounds: Int, converged: Boolean)

  /** @param edges (a, b) undirected pairs, node ids numeric
    * @return (id, component) for every node appearing in `edges`
    *
    * Throws IllegalStateException if maxIter rounds pass without reaching
    * the fixpoint — silently returning truncated labels would emit clusters
    * whose `component` is not a cluster member's converged label (and no
    * is_keeper row), a wrong answer rather than a slow one. Use
    * `connectedComponentsResult` to opt into inspecting partial labels.
    *
    * @param checkpointDir when set, each round is reliably checkpointed
    *   under this directory (spark.sparkContext.setCheckpointDir) instead
    *   of localCheckpoint. localCheckpoint stores blocks on executors —
    *   fine single-JVM, but at cluster scale an executor loss mid-loop
    *   kills the job; the reliable variant trades a write to stable
    *   storage per batch for restartability.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 30,
                          checkEvery: Int = 2,
                          checkpointDir: Option[String] = None,
                          pointerJump: Boolean = true): DataFrame = {
    val r = connectedComponentsResult(edges, maxIter, checkEvery, checkpointDir,
      pointerJump)
    if (!r.converged) throw new IllegalStateException(
      s"connectedComponents: not converged after ${r.rounds} rounds " +
        s"(maxIter=$maxIter) — labels would be truncated; raise maxIter")
    r.labels
  }

  def connectedComponentsResult(edges: DataFrame, maxIter: Int = 30,
                                checkEvery: Int = 2,
                                checkpointDir: Option[String] = None,
                                pointerJump: Boolean = true): Result = {
    require(checkEvery >= 1, "checkEvery must be >= 1")
    val spark = edges.sparkSession
    // NOTE: setCheckpointDir is SparkContext-global; reliable-mode callers
    // own that setting for the app. Checkpoint files are bounded by one
    // (small) label-table copy per batch; set
    // spark.cleaner.referenceTracking.cleanCheckpoints=true to reap
    // superseded ones, or clear the directory after the job.
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    val reliable = checkpointDir.isDefined
    // Reliable checkpoints pay Spark's recompute-on-write caveat: the
    // write job re-runs the RDD unless its blocks are cached. Pin a
    // persist across the materializing count (the write reads the cache)
    // and release it right after — `pinned` holds the persists to drop.
    var pinned: List[DataFrame] = Nil
    def ckptLazy(df: DataFrame): DataFrame =
      if (reliable) {
        val p = df.persist()
        pinned ::= p
        p.checkpoint(eager = false)
      } else df.localCheckpoint(eager = false)
    def releasePinned(): Unit = {
      pinned.foreach(_.unpersist(blocking = false))
      pinned = Nil
    }
    // the checkpointed RDD behind a checkpoint()-returned Dataset, for
    // freeing its blocks once a later round supersedes it
    def ckptRdd(df: DataFrame): Option[RDD[_]] =
      df.queryExecution.analyzed.collectFirst { case l: LogicalRDD => l.rdd }

    // Repartition BEFORE distinct: HashPartitioning(b) satisfies the
    // distinct's ClusteredDistribution((a,b)) (same (a,b) ⇒ same b ⇒ same
    // partition), so the dedup runs in place and the edge build pays ONE
    // shuffle, not two. Checkpointing then preserves that partitioning for
    // every round's edge-side join.
    val symRaw = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .repartition(col("b")).distinct()
    // Reliable mode checkpoints the edge table EAGERLY and keeps ITS OWN
    // persist pinned for the whole loop (not released with batch 1's
    // pins): a lazy mark here would never be written — RDD.doCheckpoint
    // stops at the first marked RDD reachable from the job root
    // (checkpointAllMarkedAncestors defaults false), so only each
    // batch-final label table gets files — and dropping the persist after
    // batch 1 would recompute the edge build from source every later
    // batch. The eager write computes symRaw once into the cache and
    // writes from it; rounds read the persisted checkpoint-backed table.
    var symPinned: Option[DataFrame] = None
    val sym =
      if (reliable) {
        val raw = symRaw.persist()
        val c = raw.checkpoint(eager = true) // write reads raw's cache
        raw.unpersist(blocking = false)
        val s = c.persist() // rounds read memory; lineage = checkpoint files
        symPinned = Some(s)
        s
      } else symRaw.localCheckpoint(eager = false)
    // Round 1 fused into initialization: with every label = own id, the
    // first round's nbr_min is just min(neighbor id), so seeding with
    // min(id, min(b)) IS the round-1 fixmath — same single shuffle the
    // plain `distinct` over ids would cost, one fewer propagation round.
    var labels = ckptLazy(sym.groupBy(col("a"))
      .agg(least(col("a"), min(col("b"))).as("component"))
      .select(col("a").as("id"), col("component")))
    var live: List[RDD[_]] = ckptRdd(labels).toList
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxIter) {
      val steps = math.min(checkEvery, maxIter - rounds)
      var cur = labels
      for (_ <- 1 to steps) {
        val nbrMin = sym
          .join(cur.select(col("id").as("b"), col("component")), "b")
          .groupBy(col("a").as("id")).agg(min(col("component")).as("nbr_min"))
        val prevNbr = cur.select(col("id"), col("component").as("prev"))
          .join(nbrMin, Seq("id"), "left")
        val next = (if (pointerJump) {
          // pointer jump: this node's label's current label
          val hop = cur.select(col("component").as("cid"), col("id"))
            .join(cur.select(col("id").as("cid"), col("component").as("jump")),
              "cid")
            .select(col("id"), col("jump"))
          prevNbr.join(hop, Seq("id"), "left")
            .select(col("id"),
              least(col("prev"),
                coalesce(col("nbr_min"), col("prev")),
                coalesce(col("jump"), col("prev"))).as("component"),
              col("prev"))
        } else {
          prevNbr.select(col("id"),
            least(col("prev"), coalesce(col("nbr_min"), col("prev")))
              .as("component"),
            col("prev"))
        })
        cur = next
      }
      // Only the BATCH-FINAL round is checkpointed: the intermediate
      // rounds' lineage is bounded by checkEvery, computes exactly once
      // inside the counting job, and storing it would buy nothing. (This
      // also keeps reliable mode to one persisted copy per batch and
      // avoids Spark's recompute-on-checkpoint caveat for the chain.)
      val last = ckptLazy(cur)
      // ONE job per batch: materializes the chain of rounds, then counts
      // strict label decreases in the final round. Monotonicity makes the
      // last-round check sufficient: a round with zero changes is the
      // fixpoint.
      val changed = last.filter(col("component") < col("prev")).count()
      releasePinned() // reliable mode: checkpoint files are written now
      val lastRdd = ckptRdd(last)
      // the previous batch's checkpoint blocks are now unreachable
      live.foreach(_.unpersist(blocking = false))
      live = lastRdd.toList
      labels = last.drop("prev")
      converged = changed == 0
      rounds += steps
    }
    // the returned labels are their own checkpoint; the edge blocks are
    // no longer reachable from them
    ckptRdd(sym).foreach(_.unpersist(blocking = false))
    symPinned.foreach(_.unpersist(blocking = false))
    Result(labels, rounds, converged)
  }
}
