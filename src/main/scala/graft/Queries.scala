package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Indexer, Search}

/** The operator inventory (SURVEY.md §2) as named queries with DuckDB oracles.
  * Split into thematic traits; assembled here.
  */
object Queries {

  /** q1_agg — TPC-H Q1-style grouped aggregation (A1-family: hash agg with
    * partial aggregation; no join). SURVEY §2.4.
    *
    * Money columns sum on the integer-cent grid ([[Money]]) so the
    * ~100k-row-per-group totals are accumulation-order-free; `sum_qty`
    * stays a raw double sum because l_quantity is integer-valued (1..50)
    * and integer double sums below 2^53 are exact in any order.
    */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity")).cast("double").as("sum_qty"),
        Money.sumCents(col("l_extendedprice")).as("sum_base_price"),
        Money.sumCents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        (Money.sumCentsLong(col("l_discount")).cast("double") / 100.0
          / count(lit(1)).cast("double")).as("avg_disc"),
        count(lit(1)).cast("long").as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q1AggSql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
       |  ${Money.sumCentsSql("l_extendedprice")} AS sum_base_price,
       |  ${Money.sumCentsSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
       |  CAST(${Money.sumCentsLongSql("l_discount")} AS DOUBLE) / 100.0
       |    / CAST(count(*) AS DOUBLE) AS avg_disc,
       |  CAST(count(*) AS BIGINT) AS count_order
       |FROM lineitem
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] =
    Map("q1_agg" -> (q1Agg _)) ++
      graft.queries.RelationalQueries.queries ++
      graft.queries.TpchShapeQueries.queries ++
      graft.queries.LayoutQueries.queries ++
      graft.queries.TextIndexQueries.queries ++
      graft.queries.EventQueries.queries ++
      graft.queries.TextAnalysisQueries.queries ++
      graft.queries.DedupQueries.queries ++
      graft.queries.SimilarityQueries.queries ++
      graft.queries.MultimodalQueries.queries ++
      graft.queries.FunctionQueries.queries ++
      graft.queries.SketchQueries.queries

  /** Oracle-stability baseline → production twin.
    *
    * Most keys are baselines whose candidate volume is bounded by a FIXED
    * partition count (LSH buckets / bands / k-means lists) — occupancy
    * grows linearly with the corpus and pair volume quadratically, so
    * each one DNF'd the x100 probe (SCALE_r7.md); their twins re-derive
    * the same geometry from `count(*)` with integer-exact cross-engine
    * arithmetic and complete at every probed scale. The remaining keys
    * are pair-list forms whose OUTPUT is quadratic in the duplication
    * factor (twins: per-doc/per-image linear forms) or serving queries
    * that rescan the corpus (twin: the persisted-index form). The CLI's
    * `query` command resolves a key to its twin unless `--baseline` is
    * passed, and every internal consumer (label_propagation's graph
    * input, graph_pagerank's and the cluster family's pair source) reads
    * the twin form directly — no caller reaches a scale-fatal plan
    * without an explicit opt-in.
    */
  val productionTwin: Map[String, String] = Map(
    "knn_graph"              -> "knn_graph_auto",
    "dedup_embedding_cosine" -> "dedup_embedding_auto",
    "dedup_minhash_lsh"      -> "dedup_minhash_shingled",
    "semantic_dedup"         -> "semantic_dedup_auto",
    "ann_lsh"                -> "ann_lsh_auto",
    // pair-level match list is quadratic in the DUPLICATION factor (every
    // replica pair x every shared run — x100 probe OOM); span removal
    // consumes the per-document linear form
    "dedup_substrings"       -> "dedup_substring_spans",
    // same adjudication on the image column: the verified pair list grows
    // quadratically with the duplication factor (44k -> 3.6M pairs at x10,
    // SCALE_r8.md); the cluster form is one row per matched image
    "dedup_phash"            -> "dedup_phash_clusters",
    // different failure class, same remedy: the baseline's vector arm is a
    // full-corpus brute-force scan (linear, but a scan per query is not a
    // serving plan); the twin reads both persisted indexes only
    "hybrid_rrf_search"      -> "hybrid_rrf_prebuilt",
    // same adjudication as hybrid: the baseline's candidate arm is a
    // full-corpus brute-force scan; the twin shortlists from the
    // persisted IVF-PQ index (the greedy MMR tail is corpus-independent
    // either way — O(k*n) over the n-row shortlist)
    "mmr_rerank"             -> "mmr_rerank_prebuilt")

  val oracles: Map[String, String] =
    Map("q1_agg" -> q1AggSql) ++
      graft.queries.RelationalQueries.oracles ++
      graft.queries.TpchShapeQueries.oracles ++
      graft.queries.LayoutQueries.oracles ++
      graft.queries.TextIndexQueries.oracles ++
      graft.queries.EventQueries.oracles ++
      graft.queries.TextAnalysisQueries.oracles ++
      graft.queries.DedupQueries.oracles ++
      graft.queries.SimilarityQueries.oracles ++
      graft.queries.MultimodalQueries.oracles ++
      graft.queries.FunctionQueries.oracles ++
      graft.queries.SketchQueries.oracles
}
