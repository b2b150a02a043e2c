package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Sketches

/** Sketch-backed approximation queries with exact DuckDB mirrors — the
  * md5-prefix hash family makes every bit and counter reproducible in SQL,
  * so the oracle checks the sketch CONTENTS, not just its invariants.
  */
object SketchQueries {

  // Bloom geometry: ~300 member keys at sf0.01 → kn/m ≈ 0.44, expected
  // false-positive rate (1-e^-0.44)^3 ≈ 4% — small enough to be a useful
  // pre-filter, large enough that the query's n_false_pos column actually
  // exercises the collision path.
  private val BloomM = 2048
  private val BloomK = 3

  // ---- bloom_prefilter: semi-join pre-filter accounting -------------------
  // Membership filter built from one customer segment, probed by every
  // order: per priority, how many orders the Bloom filter would let
  // through vs the exact semi join, and how many are false positives.
  // The filter is ONE broadcast row; the probe is narrow — the pattern
  // that replaces a fact-table shuffle with O(m) bits at scale. Exact
  // flags attach via a broadcast left join on the (small) key set.
  def bloomPrefilter(s: SparkSession, dir: String): DataFrame = {
    val segKeys = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("key")).distinct()
    val bits = Sketches.bloomBuild(segKeys, "key", BloomM, BloomK)
    Sketches.bloomProbe(
        Tables.orders(s, dir).select(col("o_custkey"), col("o_orderpriority")),
        "o_custkey", bits, BloomM, BloomK, "bloom_pass")
      .join(broadcast(segKeys), col("o_custkey") === col("key"), "left_outer")
      .withColumn("exact_pass", col("key").isNotNull)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).cast("long").as("n_orders"),
        sum(when(col("bloom_pass"), 1L).otherwise(0L)).cast("long").as("n_bloom"),
        sum(when(col("exact_pass"), 1L).otherwise(0L)).cast("long").as("n_exact"),
        sum(when(col("bloom_pass") && !col("exact_pass"), 1L).otherwise(0L))
          .cast("long").as("n_false_pos"))
      .orderBy("o_orderpriority")
  }

  private def bloomPos(jExpr: String, keyExpr: String): String =
    s"(${OracleSql.hash64(s"concat(CAST($jExpr AS VARCHAR), '_', CAST($keyExpr AS VARCHAR))")} % $BloomM)"

  val bloomPrefilterSql: String =
    s"""WITH keys AS (
       |  SELECT DISTINCT c_custkey AS key FROM customer
       |  WHERE c_mktsegment = 'BUILDING'),
       |bits AS (
       |  SELECT list(DISTINCT ${bloomPos("j", "key")}) AS bs
       |  FROM keys, range($BloomK) t(j)),
       |flags AS (
       |  SELECT o_orderpriority,
       |    (SELECT bool_and(list_contains(bits.bs, ${bloomPos("t.j", "o_custkey")}))
       |     FROM range($BloomK) t(j), bits) AS bloom_pass,
       |    o_custkey IN (SELECT key FROM keys) AS exact_pass
       |  FROM orders)
       |SELECT o_orderpriority,
       |  CAST(count(*) AS BIGINT) AS n_orders,
       |  CAST(count(*) FILTER (bloom_pass) AS BIGINT) AS n_bloom,
       |  CAST(count(*) FILTER (exact_pass) AS BIGINT) AS n_exact,
       |  CAST(count(*) FILTER (bloom_pass AND NOT exact_pass) AS BIGINT) AS n_false_pos
       |FROM flags
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin

  // CMS geometry: 150 users over w=64 buckets → ~2.3 keys per cell, so
  // collisions (and therefore visible overestimates) are guaranteed while
  // min-over-d=4 keeps them modest — the estimate-vs-exact gap the query
  // reports is real sketch behavior, reproduced exactly by the oracle.
  private val CmsD = 4
  private val CmsW = 64

  // ---- cms_estimate: count-min point estimates vs exact counts ------------
  // Per-user event counts estimated from the d×w sketch next to the true
  // counts. est >= exact always (ApproxSpec pins it); equality whenever
  // some row of the sketch gave the key a private cell.
  def cmsEstimate(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"))
    val sketch = Sketches.cmsBuild(ev, "user_id", CmsD, CmsW)
    val exact = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).cast("long").as("exact_cnt"))
    exact.join(
        Sketches.cmsEstimate(exact.select(col("user_id")), "user_id",
          sketch, CmsD, CmsW),
        Seq("user_id"))
      .select(col("user_id"), col("exact_cnt"), col("cms_est"))
      .orderBy("user_id")
  }

  private def cmsPos(jExpr: String, keyExpr: String): String =
    s"(${OracleSql.hash64(s"concat(CAST($jExpr AS VARCHAR), '_', CAST($keyExpr AS VARCHAR))")} % $CmsW)"

  val cmsEstimateSql: String =
    s"""WITH f AS (SELECT user_id FROM events),
       |cnt AS (
       |  SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt
       |  FROM f GROUP BY user_id),
       |cells AS (
       |  SELECT j, ${cmsPos("j", "user_id")} AS b, count(*) AS c
       |  FROM f, range($CmsD) t(j)
       |  GROUP BY 1, 2),
       |est AS (
       |  SELECT k.user_id, min(c.c) AS e
       |  FROM cnt k, range($CmsD) t(j), cells c
       |  WHERE c.j = t.j AND c.b = ${cmsPos("t.j", "k.user_id")}
       |  GROUP BY k.user_id)
       |SELECT cnt.user_id, exact_cnt, CAST(e AS BIGINT) AS cms_est
       |FROM cnt JOIN est ON cnt.user_id = est.user_id
       |ORDER BY cnt.user_id""".stripMargin

  // ---- hll_shard_union: mergeable per-shard cardinality sketches ----------
  // THE sketch pattern that matters at 100 TB: each shard (here: source)
  // builds its own HLL sketch of distinct tokens in one pass, and the
  // global distinct count comes from UNIONING the fixed-size sketches —
  // never re-touching the data. Register state depends only on the input
  // value SET (per-bucket max of hashed values), so the estimate is
  // deterministic under any partitioning/arrival order, and union is
  // commutative — exactly what lets per-day/per-shard sketches be stored
  // and merged incrementally. The global exact distinct is NOT the sum of
  // shard exacts (shared vocabulary) — the union sketch estimates it
  // correctly anyway.
  //
  // Oracle story: DataSketches estimates can't be reproduced in DuckDB, so
  // the query emits the EXACT distinct counts (hash-checkable) plus an
  // `est_ok` flag asserting the sketch estimate landed within 2% of exact
  // (lgK=12 → ~1.6% relative stddev at this scale, and the estimator is
  // near-exact below ~3/4·2^lgK items; measured max error 0.0% at sf0.01
  // and sf0.1). Determinism makes the flag stable run-to-run; ApproxSpec
  // additionally pins the real estimate errors and union-vs-rebuild
  // equality.
  private val HllLgK = 12
  private val HllTol = 0.02

  def hllShardUnion(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir).select(col("source"),
      explode(graft.functions.Tokenizer.tokenize(col("text"))).as("tok"))
    val shard = toks.groupBy(col("source"))
      .agg(hll_sketch_agg(col("tok"), HllLgK).as("sk"),
        count_distinct(col("tok")).cast("long").as("exact_distinct"))
    val perShard = shard.select(col("source").as("shard"), col("exact_distinct"),
      (abs(hll_sketch_estimate(col("sk")).cast("double")
          - col("exact_distinct").cast("double"))
        <= lit(HllTol) * col("exact_distinct").cast("double")).as("est_ok"))
    val globalExact = toks.agg(count_distinct(col("tok")).cast("long")
      .as("exact_distinct"))
    val globalEst = shard.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).cast("double").as("est"))
    val global = globalEst.crossJoin(globalExact)
      .select(lit("__all__").as("shard"), col("exact_distinct"),
        (abs(col("est") - col("exact_distinct").cast("double"))
          <= lit(HllTol) * col("exact_distinct").cast("double")).as("est_ok"))
    perShard.unionByName(global).orderBy("shard")
  }

  val hllShardUnionSql: String =
    s"""WITH ${OracleSql.TokCte},
       |st AS (
       |  SELECT d.source, t.term
       |  FROM toks t JOIN documents d ON d.doc_id = t.doc_id)
       |SELECT source AS shard,
       |  CAST(count(DISTINCT term) AS BIGINT) AS exact_distinct,
       |  TRUE AS est_ok
       |FROM st GROUP BY source
       |UNION ALL
       |SELECT '__all__' AS shard,
       |  CAST(count(DISTINCT term) AS BIGINT) AS exact_distinct,
       |  TRUE AS est_ok
       |FROM st
       |ORDER BY shard""".stripMargin

  // ---- hll_incremental: the stored-sketch lifecycle ------------------------
  // Day-1 builds per-source sketches and PERSISTS them (binary column in
  // parquet); day-2's batch arrives, sketches only ITS tokens, and merges
  // with the stored sketches — the historical corpus is never re-read.
  // That read-merge-write loop is how per-day distinct counts stay O(shard
  // count), not O(data), at 100 TB; serialization round-trip + merge both
  // preserve the register state exactly (est_ok stays within the same 2%
  // band as the one-shot sketch, checked against the full-corpus exact).
  def hllIncremental(s: SparkSession, dir: String): DataFrame = {
    val store = graft.sources.Pipelines.freshScratch(
      "hll_store_" + dir.replaceAll("[^A-Za-z0-9]", "_"))
    val docs = Tables.documents(s, dir)
    def toks(df: DataFrame): DataFrame = df.select(col("source"),
      explode(graft.functions.Tokenizer.tokenize(col("text"))).as("tok"))
    val old = docs.filter(col("doc_id") % 5 =!= 0)
    val fresh = docs.filter(col("doc_id") % 5 === 0)
    toks(old).groupBy(col("source"))
      .agg(hll_sketch_agg(col("tok"), HllLgK).as("sk"))
      .write.mode("overwrite").parquet(store)
    val merged = s.read.parquet(store)
      .unionByName(toks(fresh).groupBy(col("source"))
        .agg(hll_sketch_agg(col("tok"), HllLgK).as("sk")))
      .groupBy(col("source")).agg(hll_union_agg(col("sk")).as("sk"))
    val exact = toks(docs).groupBy(col("source"))
      .agg(count_distinct(col("tok")).cast("long").as("exact_distinct"))
    merged.join(exact, "source")
      .select(col("source").as("shard"), col("exact_distinct"),
        (abs(hll_sketch_estimate(col("sk")).cast("double")
            - col("exact_distinct").cast("double"))
          <= lit(HllTol) * col("exact_distinct").cast("double")).as("est_ok"))
      .orderBy("shard")
  }

  val hllIncrementalSql: String =
    s"""WITH ${OracleSql.TokCte},
       |st AS (
       |  SELECT d.source, t.term
       |  FROM toks t JOIN documents d ON d.doc_id = t.doc_id)
       |SELECT source AS shard,
       |  CAST(count(DISTINCT term) AS BIGINT) AS exact_distinct,
       |  TRUE AS est_ok
       |FROM st GROUP BY source
       |ORDER BY shard""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bloom_prefilter" -> (bloomPrefilter _),
    "cms_estimate" -> (cmsEstimate _),
    "hll_shard_union" -> (hllShardUnion _),
    "hll_incremental" -> (hllIncremental _))

  val oracles: Map[String, String] = Map(
    "bloom_prefilter" -> bloomPrefilterSql,
    "cms_estimate" -> cmsEstimateSql,
    "hll_shard_union" -> hllShardUnionSql,
    "hll_incremental" -> hllIncrementalSql)
}
