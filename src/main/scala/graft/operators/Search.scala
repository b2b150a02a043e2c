package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The flagship ranking query — the reference's entire `query.py` driver loop
  * (app/query.py:149-197) re-expressed as ONE lazy DataFrame plan:
  *
  *   terms ⋈ term_df ⋈ postings ⋈ doc_info
  *     → withColumn(score) → groupBy(doc_id).sum → orderBy desc → limit k
  *
  * Catalyst/AQE picks the physical strategy. The query-terms side is a tiny
  * literal relation, so both term joins become broadcast hash joins with the
  * terms side broadcast — postings are filtered to the query terms *at the
  * probe*, never materialized in full. The final top-k plans as
  * TakeOrderedAndProject (bounded per-partition heap + driver merge), the
  * distributed equivalent of the reference's `takeOrdered(10)`.
  *
  * Scale: with postings bucketed by term, the only remaining shuffle is the
  * per-doc score sum over the (small) candidate set. No collect() anywhere
  * until the final k rows.
  */
object Search {

  /** Above this many requests, serving routes to the bulk join plan
    * ([[hybridBulkSearchPrebuilt]]): the batch form's per-term/per-id
    * literals are what PRUNE the index scans for a small batch, but the
    * expression tree and the driver's request collect grow linearly with
    * the batch — past a few thousand requests one shared pass over the
    * touched index regions is both safer and faster. Shared by the CLI
    * `hbatch` auto-route and the serving stream
    * ([[graft.streaming.DocStreams.hybridServe]]).
    */
  val BulkRequestThreshold = 4096L

  /** Driver-side tokenization of the scalar query string — same semantics
    * as Tokenizer.tokenize, distinct terms in first-occurrence order.
    */
  def queryTokens(query: String): Seq[String] =
    "(?U)[^\\w\\s]".r.replaceAllIn(query.toLowerCase, " ")
      .split("\\s+").filter(_.nonEmpty).distinct.toSeq

  /** Tokenize the query string driver-side (it is a scalar, not data). */
  def queryTerms(spark: SparkSession, query: String): DataFrame = {
    import spark.implicits._
    queryTokens(query).toDF("term")
  }

  /** Per-(term, doc) BM25 components for a query — the plan up to but
    * excluding the final per-doc sum (reference J1+J2+J3+F9+F10).
    * Columns: (term, doc_id, tf, df, length, n_docs, avg_len, idf, score).
    */
  def termComponents(spark: SparkSession, query: String,
                     postings: DataFrame, termDf: DataFrame,
                     docInfo: DataFrame): DataFrame =
    componentsOver(queryTerms(spark, query), postings, termDf, docInfo)

  /** The scoring chain over an arbitrary (small) terms relation — shared
    * by the literal-query path and the fuzzy-expanded path.
    */
  private def componentsOver(terms: DataFrame,
                             postings: DataFrame, termDf: DataFrame,
                             docInfo: DataFrame): DataFrame = {
    // Collection stats (A4/A5) join in as a broadcast singleton — no driver
    // action during plan construction, so the whole search stays ONE lazy
    // DAG (the reference caches stats per session, app/query.py:52-61; the
    // deferred-plan form subsumes that).
    val stats = docInfo.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(col("length")).as("avg_len"))

    // J1 + P6: inner join drops df==0 terms (terms absent from the index
    // simply have no match). Broadcast the tiny terms relation.
    // J2: postings fetch; J3: doc length attach; J4: stats broadcast.
    broadcast(terms)
      .join(termDf, "term")
      .join(postings.select("term", "doc_id", "tf"), "term")
      .join(docInfo.select("doc_id", "length"), "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf", BM25.idf(col("n_docs"), col("df")))
      .withColumn("score",
        BM25.termScore(col("tf"), col("idf"), col("length"), col("avg_len")))
  }

  /** Per-doc top-k + display-metadata attach shared by every search shape. */
  private def topAndTitle(components: DataFrame, docInfo: DataFrame,
                          k: Int): DataFrame = {
    val top = components
      .groupBy("doc_id")
      .agg(sum(col("score")).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
    docInfo.select(col("doc_id"), col("title"))
      .join(broadcast(top), "doc_id")
      // display score pinned to the 1e-6 grid (Money.micros): the raw
      // score chains through libm ln, whose last ulp is engine-specific;
      // ordering and the top-k cut stay on the raw value
      .select(col("doc_id"), col("title"), graft.Money.micros(col("score")).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
  }

  /** Typo-tolerant search: each query token expands to every vocabulary
    * term within `maxDist` edits, and the DISTINCT expanded set feeds the
    * standard BM25 chain. The expansion joins the (vocabulary-sized)
    * term_df table against the broadcast query tokens with a length-band
    * prefilter — |len(term) - len(qterm)| <= maxDist is necessary for
    * edit distance <= maxDist, so the cheap codegen'd guard rejects
    * almost all of the vocabulary before the O(len^2) levenshtein runs.
    * Cost at 100 TB: one scan of the vocab table per query batch (the
    * vocab grows with distinct terms, not corpus rows), then the normal
    * term-pruned search.
    */
  def fuzzySearch(spark: SparkSession, query: String,
                  postings: DataFrame, termDf: DataFrame, docInfo: DataFrame,
                  k: Int = 10, maxDist: Int = 1): DataFrame = {
    val qt = queryTerms(spark, query).select(col("term").as("qterm"))
    val expanded = termDf.select("term").join(broadcast(qt),
        abs(length(col("term")) - length(col("qterm"))) <= maxDist &&
          levenshtein(col("term"), col("qterm")) <= maxDist)
      .select("term").distinct()
    topAndTitle(componentsOver(expanded, postings, termDf, docInfo), docInfo, k)
  }

  /** Full search over pre-built index DataFrames. Returns
    * (doc_id, title, score) — the reference's result display shape
    * (app/query.py:199-213 prints rank, id, title, score).
    * @param postings (term, doc_id, tf, ...)
    * @param termDf   (term, df)
    * @param docInfo  (doc_id, title, length)
    */
  def search(spark: SparkSession, query: String,
             postings: DataFrame, termDf: DataFrame, docInfo: DataFrame,
             k: Int = 10): DataFrame =
    // A6 + T1: per-doc sum (partial agg map-side), then top-k with a
    // deterministic (score DESC, doc_id ASC) tiebreak (SURVEY.md §7.6).
    // Display metadata attaches to the k winners ONLY: the scoring plan
    // never carries title through its shuffles, and that join broadcasts
    // the k-row side (inner + BuildRight), probing docInfo — cost ∝ k.
    topAndTitle(termComponents(spark, query, postings, termDf, docInfo),
      docInfo, k)

  /** Search over the persisted term-bucketed index tables built by
    * Indexer.buildBucketedIndex — the reference's actual architecture
    * (app/index.sh persists once; app/query.py:97-139 reads per query),
    * minus Cassandra. Literal IN-list `term` filters prune buckets
    * (SelectedBucketsCount) and parquet row groups at the scan; the
    * postings ⋈ term_df term join is co-located by the shared bucketing,
    * so no exchange lands on either index scan. At 100 TB each query
    * touches |terms| buckets of the postings table, not the corpus.
    */
  def searchPrebuilt(spark: SparkSession, query: String, prefix: String,
                     k: Int = 10): DataFrame = {
    val toks = queryTokens(query)
    val postings = spark.table(s"${prefix}_postings")
      .filter(col("term").isin(toks: _*))
    val termDf = spark.table(s"${prefix}_term_df")
      .filter(col("term").isin(toks: _*))
    val docInfo = spark.table(s"${prefix}_doc_info")
    search(spark, query, postings, termDf, docInfo, k)
  }

  /** Hybrid retrieval served ENTIRELY from persisted stores: the lexical
    * arm from the term-bucketed BM25 index (searchPrebuilt — IN-list
    * bucket + row-group pruning), the semantic arm from the persisted
    * IVF-PQ index (VectorIndex.searchPrebuilt — DPP-pruned `_vectors`
    * scan), fused with reciprocal rank fusion (Cormack et al. SIGIR'09:
    * score = Σ_arms 1/(60 + rank)). Fusion reads only the two ≤k-row arm
    * outputs, and display titles come from the index's own doc_info table
    * — the whole query touches index tables only, never the corpus
    * (the reference's serving pattern, app/query.py:97-122). Ranks are
    * deterministic in both arms (Money-grid score / exact-cosine re-rank,
    * doc_id tiebreak).
    * @param probe (id, v) — the query vector, ≤1 row by contract.
    */
  def hybridSearchPrebuilt(spark: SparkSession, query: String,
                           textPrefix: String, vecPrefix: String,
                           probe: DataFrame, k: Int = 10, nprobe: Int = 8,
                           shortlist: Int = 40): DataFrame = {
    // bounded: the window orders the k surviving rows of the arm's top cut
    val textRank = searchPrebuilt(spark, query, textPrefix, k)
      .select(col("doc_id").cast("long").as("doc_id"),
        row_number().over(Window.orderBy(col("score").desc, col("doc_id")))
          .cast("long").as("text_rank"))
    val vecRank = VectorIndex
      .searchPrebuilt(spark, vecPrefix, probe, k, nprobe, shortlist)
      .select(col("cand_id").as("doc_id"), col("rank").as("vec_rank"))
    val fused = textRank.join(vecRank, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(60.0) + col("text_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60.0) + col("vec_rank")), lit(0.0)))
      .orderBy(col("rrf").desc, col("doc_id")).limit(k)
    spark.table(s"${textPrefix}_doc_info")
      .select(col("doc_id").cast("long").as("doc_id"), col("title"))
      .join(broadcast(fused), "doc_id")
      .select(col("doc_id"), col("title"), col("text_rank"), col("vec_rank"),
        col("rrf").cast("double").as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
  }

  /** Batch hybrid retrieval — [[hybridSearchPrebuilt]] generalized from
    * one (query, probe) pair to a TABLE of pairs, the actual serving
    * workload shape (a request batch, not a point call). Both arms stay
    * index-only and probe-derived:
    *  - text arm: the union of all query terms becomes ONE literal
    *    IN-list, so every per-query probe shares one bucket-pruned scan of
    *    postings/term_df (the batchSearchPrebuilt pattern) — cost is
    *    |distinct terms| buckets, independent of the corpus;
    *  - vector arm: probe vectors point-fetched from the bucket-pruned
    *    `_forward` store by the literal id list, then one DPP-pruned pass
    *    over the probed `_vectors` lists — VectorIndex.searchPrebuilt is
    *    already multi-probe, so the batch costs |probed lists| partitions,
    *    not |queries| passes;
    *  - fusion: per-pair RRF over the two ≤k-row-per-query arm outputs, a
    *    |queries|·k-row window — O(1) per query.
    * The pairs are a Scala Seq, not a DataFrame, for the same reason
    * fuzzySearchPrebuilt materializes its expansion: the literal lists ARE
    * what prunes buckets at the scan (query rewrite before index access).
    *
    * @param queries (probe_id, query_text): probe_id keys both the stored
    *                probe vector and the output rows
    */
  def hybridBatchSearchPrebuilt(spark: SparkSession,
                                queries: Seq[(Long, String)],
                                textPrefix: String, vecPrefix: String,
                                k: Int = 10, nprobe: Int = 8,
                                shortlist: Int = 40): DataFrame = {
    import spark.implicits._
    val ids = queries.map(_._1)
    val allTerms = queries.flatMap(q => queryTokens(q._2)).distinct
    val postings = spark.table(s"${textPrefix}_postings")
      .filter(col("term").isin(allTerms: _*))
    val termDf = spark.table(s"${textPrefix}_term_df")
      .filter(col("term").isin(allTerms: _*))
    val docInfo = spark.table(s"${textPrefix}_doc_info")
    // per-query re-rank of the k survivors on the Money-grid score (the
    // single-probe hybrid's convention — the window orders ≤k rows/query)
    val tw = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    val textRank = batchSearch(
        queries.toDF("query_id", "query_text"), postings, termDf, docInfo, k)
      .select(col("query_id"), col("doc_id").cast("long").as("doc_id"),
        col("score"))
      .withColumn("text_rank", row_number().over(tw).cast("long"))
      .drop("score")
    val probes = spark.table(s"${vecPrefix}_forward")
      .filter(col("id").isin(ids: _*)).select(col("id"), col("v"))
    val vecRank = VectorIndex
      .searchPrebuilt(spark, vecPrefix, probes, k, nprobe, shortlist)
      .select(col("probe_id").as("query_id"), col("cand_id").as("doc_id"),
        col("rank").as("vec_rank"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("doc_id"))
    val fused = textRank.join(vecRank, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(60.0) + col("text_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60.0) + col("vec_rank")), lit(0.0)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
    spark.table(s"${textPrefix}_doc_info")
      .select(col("doc_id").cast("long").as("doc_id"), col("title"))
      .join(broadcast(fused), "doc_id")
      .select(col("query_id"), col("doc_id"), col("title"), col("text_rank"),
        col("vec_rank"), col("rrf").cast("double").as("rrf"))
      .orderBy(col("query_id"), col("rrf").desc, col("doc_id"))
  }

  /** BULK hybrid serving over an UNBOUNDED request TABLE — the scale-out
    * twin of [[hybridBatchSearchPrebuilt]]. The batch form's contract
    * silently caps batch size: its driver-side `Seq` of (id, query) pairs
    * becomes literal IN-lists whose pruning is exactly right for a serving
    * micro-batch but whose expression tree (and the driver's memory) dies
    * at offline-bulk scale — 10M stored queries for an eval sweep, an
    * offline rerank, a RAG corpus annotation (the reference's own
    * limitation: its per-term driver loop, app/query.py:97-122). Here
    * NOTHING request-derived is collected, broadcast, or inlined as a
    * literal:
    *  - text arm: requests tokenize IN-PLAN and probe postings/term_df by
    *    JOIN on term ([[bulkSearch]]) — against the term-bucketed index
    *    tables the join lands exchange-free on the index side, and the
    *    request side shuffles by term once;
    *  - vector arm: probe vectors come from a JOIN of the requests against
    *    the id-bucketed `_forward` store (requests without a stored vector
    *    simply have no semantic arm — the full-outer fusion handles them),
    *    candidates from [[VectorIndex.searchBulk]], which scores the
    *    probed lists through a shuffle join on cent_id instead of a probe
    *    broadcast;
    *  - fusion and the per-query top-k are partitionBy(query_id) windows,
    *    and the display-title attach is a plain join of doc_info against
    *    the |requests|·k winners.
    * Cost ∝ |requests| + touched index data; every shuffle key
    * (term, cent_id, doc_id, query_id) partitions across the cluster, so
    * no single task, no broadcast, and no driver structure scales with the
    * request count. Above a literal-pruning sweet spot (a few thousand
    * requests) this form replaces the batch one — below it, the literals
    * ARE the pruning and the batch form wins.
    *
    * @param requests (query_id: long, query_text: string); query_id keys
    *                 the stored probe vector and the output rows, and must
    *                 be UNIQUE — duplicate rows under one id are an
    *                 ill-defined request ("one query, two texts") and
    *                 double-score the text arm (the batch form shares this
    *                 contract; AUDIT_r11 #7)
    */
  def hybridBulkSearchPrebuilt(spark: SparkSession, requests: DataFrame,
                               textPrefix: String, vecPrefix: String,
                               k: Int = 10, nprobe: Int = 8,
                               shortlist: Int = 40): DataFrame = {
    val postings = spark.table(s"${textPrefix}_postings")
    val termDf = spark.table(s"${textPrefix}_term_df")
    val docInfo = spark.table(s"${textPrefix}_doc_info")
    // per-query re-rank of the k raw-score survivors on the Money-grid
    // score — the batch form's convention, unchanged
    val tw = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    val textRank = bulkSearch(requests, postings, termDf, docInfo, k)
      .select(col("query_id"), col("doc_id").cast("long").as("doc_id"),
        col("score"))
      .withColumn("text_rank", row_number().over(tw).cast("long"))
      .drop("score")
    val probes = spark.table(s"${vecPrefix}_forward")
      .join(requests.select(col("query_id").as("id")), "id")
      .select(col("id"), col("v"))
    val vecRank = VectorIndex
      .searchBulk(spark, vecPrefix, probes, k, nprobe, shortlist)
      .select(col("probe_id").as("query_id"), col("cand_id").as("doc_id"),
        col("rank").as("vec_rank"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("doc_id"))
    val fused = textRank.join(vecRank, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(60.0) + col("text_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60.0) + col("vec_rank")), lit(0.0)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
    spark.table(s"${textPrefix}_doc_info")
      .select(col("doc_id").cast("long").as("doc_id"), col("title"))
      .join(fused, "doc_id")
      .select(col("query_id"), col("doc_id"), col("title"), col("text_rank"),
        col("vec_rank"), col("rrf").cast("double").as("rrf"))
      .orderBy(col("query_id"), col("rrf").desc, col("doc_id"))
  }

  /** "Did you mean": for each query token, the best correction among
    * vocabulary terms within `maxDist` edits — closest distance first,
    * then highest document frequency (the commoner word is the likelier
    * intent), then lexicographic. One vocabulary-sized expansion scan
    * (length-band guard before the levenshtein, as in fuzzySearch), one
    * window over the per-token candidates. Tokens with no neighbour
    * produce no row.
    */
  def spellSuggest(spark: SparkSession, query: String, termDf: DataFrame,
                   maxDist: Int = 2): DataFrame = {
    import spark.implicits._
    val qt = queryTokens(query).toDF("qterm")
    val cand = termDf.join(broadcast(qt),
      abs(length(col("term")) - length(col("qterm"))) <= maxDist &&
        levenshtein(col("term"), col("qterm")) <= maxDist)
      .withColumn("dist", levenshtein(col("term"), col("qterm")))
    val best = Window.partitionBy(col("qterm"))
      .orderBy(col("dist").asc, col("df").desc, col("term").asc)
    cand.withColumn("rn", row_number().over(best))
      .filter(col("rn") === 1)
      .select(col("qterm"), col("term").as("suggestion"),
        col("dist").cast("int").as("dist"), col("df").cast("long").as("df"))
      .orderBy("qterm")
  }

  /** Typo-tolerant search over the persisted bucketed index. Two phases:
    * the expansion scans the (vocabulary-sized) stored term_df table for
    * terms within `maxDist` edits of the query tokens and collects the
    * tiny match set — a driver round-trip bounded by the expansion size,
    * never the index. The expanded literals then drive the SAME
    * bucket-pruned search as the exact path: without the materialized
    * IN-list the term filter would be a join against a computed set, and
    * SelectedBucketsCount pruning — the thing that makes a query touch
    * |terms| buckets instead of the corpus at 100 TB — cannot happen.
    * The lost laziness is the price of the pruning; production engines
    * make the same trade (query rewrite before index access).
    */
  def fuzzySearchPrebuilt(spark: SparkSession, query: String, prefix: String,
                          k: Int = 10, maxDist: Int = 1): DataFrame = {
    val qt = queryTerms(spark, query).select(col("term").as("qterm"))
    val expanded = spark.table(s"${prefix}_term_df").select("term")
      .join(broadcast(qt),
        abs(length(col("term")) - length(col("qterm"))) <= maxDist &&
          levenshtein(col("term"), col("qterm")) <= maxDist)
      .select("term").distinct()
      .collect().map(_.getString(0)).toSeq
    val postings = spark.table(s"${prefix}_postings")
      .filter(col("term").isin(expanded: _*))
    val termDf = spark.table(s"${prefix}_term_df")
      .filter(col("term").isin(expanded: _*))
    val docInfo = spark.table(s"${prefix}_doc_info")
    import spark.implicits._
    topAndTitle(componentsOver(expanded.toDF("term"), postings, termDf, docInfo),
      docInfo, k)
  }

  /** Batch search: score a whole TABLE of queries in one lazy plan — the
    * 100-TB serving pattern (thousands of queries per pass, one shuffle
    * set, no per-query driver round-trips; collection stats join in as a
    * broadcast singleton rather than a driver action).
    *
    * @param queries (query_id, query_text)
    * @return top-k per query: (query_id, rank, doc_id, title, score) — the
    *         same display shape as the single-query path (the reference
    *         prints a title for every result, app/query.py:199-213); title
    *         attaches to the |queries|·k winners only, never riding the
    *         scoring shuffles.
    */
  def batchSearch(queries: DataFrame,
                  postings: DataFrame, termDf: DataFrame, docInfo: DataFrame,
                  k: Int = 10): DataFrame =
    batchSearchImpl(queries, postings, termDf, docInfo, k,
      broadcastRequests = true)

  /** [[batchSearch]] for an UNBOUNDED requests table: identical math, but
    * nothing derived from the requests is ever broadcast — the term probe
    * and the winners' title attach are plain shuffle joins, so the plan
    * holds at 10M requests where the batch form's broadcasts (and the
    * prebuilt path's literal IN-lists) die. Against a term-bucketed index
    * the term joins land exchange-free on the postings/term_df side.
    */
  def bulkSearch(requests: DataFrame,
                 postings: DataFrame, termDf: DataFrame, docInfo: DataFrame,
                 k: Int = 10): DataFrame =
    batchSearchImpl(requests, postings, termDf, docInfo, k,
      broadcastRequests = false)

  private def batchSearchImpl(queries: DataFrame,
                              postings: DataFrame, termDf: DataFrame,
                              docInfo: DataFrame, k: Int,
                              broadcastRequests: Boolean): DataFrame = {
    val stats = docInfo.agg(
      count(lit(1)).cast("double").as("n_docs"), avg(col("length")).as("avg_len"))
    val qTerms0 = queries.select(col("query_id"),
        explode(array_distinct(
          graft.functions.Tokenizer.tokenize(col("query_text")))).as("term"))
    val qTerms = if (broadcastRequests) broadcast(qTerms0) else qTerms0
    // Join ORDER differs by form, and it matters enormously at scale. The
    // broadcast (micro-batch) form prunes postings down to the batch's
    // terms first, so the doc-length attach touches only the pruned rows.
    // The bulk form's term join MULTIPLIES rows (every posting row matches
    // ~|queries sharing the term|), so attaching length AFTER it would
    // shuffle the |requests|-times-larger scored relation by doc_id — the
    // x10 probe measured exactly that as the dominant cost. Attaching
    // length to postings BEFORE the term join keeps every shuffle
    // proportional to the postings table, never the scored blow-up (which
    // then flows straight into the map-side partial aggregation).
    val joined =
      if (broadcastRequests)
        qTerms
          .join(termDf, "term")
          .join(postings.select("term", "doc_id", "tf"), "term")
          .join(docInfo.select("doc_id", "length"), "doc_id")
      else
        qTerms
          .join(termDf, "term")
          .join(postings.select("term", "doc_id", "tf")
            .join(docInfo.select("doc_id", "length"), "doc_id"), "term")
    val scored = joined
      .crossJoin(broadcast(stats))
      .withColumn("score", BM25.termScore(col("tf"),
        BM25.idf(col("n_docs"), col("df")), col("length"), col("avg_len")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    // Bulk form: place the (query_id, doc_id) exchange BEFORE the partial
    // aggregation, not after it. The scored relation leaves the term join
    // partitioned by TERM, where a (query, doc) pair appears at most once
    // per shared term — map-side partial aggregation achieves no reduction
    // there, yet builds a per-task hash map over the entire partition
    // (multi-million entries at bench scale: spill + GC, the dominant cost
    // of the arm — optimization round r15, guide §2.3/§5). Repartitioning
    // the narrow (query_id, doc_id, score) projection first ships the same
    // bytes the old partial-agg output did, and both aggregation phases
    // then run post-exchange where groups are co-located, so the partial
    // map holds |groups in partition| entries and fully reduces. The
    // (query_id, doc_id) key keeps a hot query's candidate set spread
    // across the cluster (skew safety, guide §2.5); the rank window's
    // WindowGroupLimit then cuts to k per query per partition before the
    // small query_id exchange, exactly as before.
    val preAgg = {
      val narrow = scored.select(col("query_id"), col("doc_id"), col("score"))
      if (broadcastRequests) narrow
      else narrow.repartition(col("query_id"), col("doc_id"))
    }
    val summed = preAgg.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("score")).as("score"))
    // Bulk form: the per-query top-k runs as a bounded TOP-K AGGREGATE
    // (graft.plans.TopKAgg), not a rank window. The window form sorted the
    // ENTIRE (query, doc) aggregate by (query_id, score, doc_id) — tens of
    // millions of rows at the bench fixture, corpus-bound at 100 TB — kept
    // k per query per partition, exchanged, and sorted again, all to
    // discard everything but k rows per query. The aggregate's partial
    // buffers cap at k entries per (query, partition): no sort anywhere,
    // and the query_id exchange carries only the k-entry buffers. Ordering
    // inside the buffer is the window's exact total order
    // (score DESC, doc_id ASC), so posexplode reproduces the same rows
    // with the same ranks. Batch (broadcast) form keeps the window — its
    // volumes are literal-pruned and its plans are regression-adjudicated.
    val top =
      if (broadcastRequests)
        summed
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= k)
      else {
        // object-hash aggregation falls back to SORT-based past 128
        // distinct keys per task by default — which would re-introduce a
        // full sort of the aggregate by query_id. Top-k buffers are
        // bounded (k entries ≈ 4+16k bytes each), so even 64k in-flight
        // groups per task is ~20 MB: raise the fallback threshold. This
        // is load-bound per TASK (keys per partition), so it is
        // scale-neutral: a bigger corpus grows partition COUNT, not the
        // per-task group count, which the (query_id, doc_id) exchange
        // above spreads evenly.
        queries.sparkSession.conf
          .set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 65536)
        summed
          .groupBy(col("query_id"))
          .agg(graft.plans.TopKAgg.topK(col("score"),
            col("doc_id").cast("long"), k).as("top"))
          .select(col("query_id"),
            posexplode(col("top")).as(Seq("pos", "e")))
          .select(col("query_id"), col("e.doc_id").as("doc_id"),
            col("e.score").as("score"),
            (col("pos") + 1).cast("long").as("rank"))
      }
    // display metadata joins the winners only (cost ∝ |queries|·k) —
    // mirrors the single-query search(); the winners side broadcasts in
    // the batch form but stays a shuffle join under an unbounded bulk run
    docInfo.select(col("doc_id"), col("title"))
      .join(if (broadcastRequests) broadcast(top) else top, "doc_id")
      .select(col("query_id"), col("rank"), col("doc_id"), col("title"),
        graft.Money.micros(col("score")).as("score"))
  }

  /** RM3-style pseudo-relevance-feedback expansion: run the query, treat
    * the top `fbDocs` results as relevant, pick the `fbTerms` most
    * characteristic terms from them (idf x total-tf, original terms
    * excluded), and re-rank with the expanded weighted query (originals at
    * weight 1, expansions at `expWeight`). Everything is ONE lazy plan —
    * the feedback "round trip" is just a broadcast of the fbDocs ids back
    * into the postings probe, not a driver materialization.
    *
    * Determinism: the per-term expansion score multiplies idf by the
    * INTEGER Σtf once (never a float sum over docs), so expansion
    * selection is bit-stable; final scores keep bm25's established
    * epsilon contract.
    */
  def rm3Search(spark: SparkSession, query: String,
                postings: DataFrame, termDf: DataFrame, docInfo: DataFrame,
                k: Int = 10, fbDocs: Int = 10, fbTerms: Int = 5,
                expWeight: Double = 0.5): DataFrame = {
    val origTerms = queryTokens(query)
    val stats = docInfo.agg(
      count(lit(1)).cast("double").as("n_docs"), avg(col("length")).as("avg_len"))
    val top = termComponents(spark, query, postings, termDf, docInfo)
      .groupBy("doc_id").agg(sum(col("score")).as("s"))
      .orderBy(col("s").desc, col("doc_id").asc).limit(fbDocs)
      .select(col("doc_id"))
    val expansion = postings.select("term", "doc_id", "tf")
      .join(broadcast(top), "doc_id")
      .filter(!col("term").isin(origTerms: _*))
      .groupBy("term").agg(sum(col("tf")).cast("long").as("stf"))
      .join(termDf, "term")
      .crossJoin(broadcast(stats))
      .withColumn("escore",
        BM25.idf(col("n_docs"), col("df")) * col("stf").cast("double"))
      .orderBy(col("escore").desc, col("term").asc).limit(fbTerms)
    val weighted = queryTerms(spark, query).withColumn("w", lit(1.0))
      .unionByName(expansion.select(col("term"), lit(expWeight).as("w")))
    val rescored = broadcast(weighted)
      .join(termDf, "term")
      .join(postings.select("term", "doc_id", "tf"), "term")
      .join(docInfo.select("doc_id", "length"), "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("score", col("w") * BM25.termScore(col("tf"),
        BM25.idf(col("n_docs"), col("df")), col("length"), col("avg_len")))
      .groupBy("doc_id").agg(sum(col("score")).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc).limit(k)
    docInfo.select(col("doc_id"), col("title"))
      .join(broadcast(rescored), "doc_id")
      .select(col("doc_id"), col("title"), graft.Money.micros(col("score")).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
  }

  /** Best highlight window per top-k result: the query-term position whose
    * following `window` positions cover the most DISTINCT query terms,
    * ties to the earliest start. Candidate volume is top-k docs x
    * query-term occurrences — the window join never touches the corpus.
    * Returns (doc_id, best_start, n_terms).
    */
  def snippets(spark: SparkSession, query: String,
               postings: DataFrame, termDf: DataFrame, docInfo: DataFrame,
               k: Int = 10, window: Int = 10): DataFrame = {
    val toks = queryTokens(query)
    val top = termComponents(spark, query, postings, termDf, docInfo)
      .groupBy("doc_id").agg(sum(col("score")).as("s"))
      .orderBy(col("s").desc, col("doc_id").asc).limit(k)
      .select(col("doc_id"))
    val qp = postings.filter(col("term").isin(toks: _*))
      .join(broadcast(top), "doc_id")
      .select(col("doc_id"), col("term"), explode(col("positions")).as("pos"))
    val win = qp.select(col("doc_id"), col("pos").as("start"))
      .join(qp.select(col("doc_id"), col("term").as("bterm"),
        col("pos").as("bpos")), Seq("doc_id"))
      .filter(col("bpos") >= col("start") &&
        col("bpos") <= col("start") + window)
      .groupBy(col("doc_id"), col("start"))
      .agg(countDistinct(col("bterm")).as("nt"))
    win.groupBy("doc_id")
      .agg(min(struct((-col("nt")).as("negn"), col("start").as("s"))).as("b"))
      .select(col("doc_id"),
        col("b.s").as("best_start"), (-col("b.negn")).as("n_terms"))
  }

  /** Positional phrase search over the postings table (the positions the
    * reference stores but never reads, app/query.py:115-119). For terms
    * t0..tn-1: join each term's posting list on doc_id, then intersect
    * position arrays shifted by their phrase offset — an occurrence is a
    * start position p with p+i in term i's positions for every i. One
    * narrow join per phrase term (n is tiny), no token re-explosion.
    * Returns (doc_id, n_occurrences > 0).
    */
  def phraseSearch(postings: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "phrase must have at least one term")
    val joined = terms.zipWithIndex.map { case (t, i) =>
      postings.filter(col("term") === t)
        .select(col("doc_id"), col("positions").as(s"pos$i"))
    }.reduce((a, b) => a.join(b, "doc_id"))
    val starts = terms.indices.tail.foldLeft(col("pos0")) { (acc, i) =>
      array_intersect(acc, transform(col(s"pos$i"), x => x - i))
    }
    joined.withColumn("n_occurrences", size(starts).cast("long"))
      .filter(col("n_occurrences") > 0)
      .select(col("doc_id"), col("n_occurrences"))
  }

  /** Positional PROXIMITY search: documents where `termA` and `termB`
    * occur within `window` token positions of each other, with the closest
    * distance and the count of close cross pairs. The sorted position
    * arrays ride in from the two posting rows and the kernels
    * (plans.PositionProximity) run the two-pointer merges in O(|a|+|b|)
    * per doc inside codegen — never a position self-join, whose pair
    * blowup is quadratic in term frequency exactly for the frequent terms
    * proximity queries target.
    */
  def proximitySearch(postings: DataFrame, termA: String, termB: String,
                      window: Int): DataFrame = {
    val a = postings.filter(col("term") === termA)
      .select(col("doc_id"), col("positions").as("pa"))
    val b = postings.filter(col("term") === termB)
      .select(col("doc_id"), col("positions").as("pb"))
    a.join(b, "doc_id")
      .select(col("doc_id"),
        graft.plans.PositionProximity.minAbsDiff(col("pa"), col("pb"))
          .as("min_dist"),
        graft.plans.PositionProximity.pairsWithin(col("pa"), col("pb"), window)
          .as("n_within"))
      .filter(col("min_dist") <= window)
  }

  /** Convenience: index documents (doc_id, text) in-memory and search. */
  def searchDocs(spark: SparkSession, docs: DataFrame, query: String,
                 k: Int = 10): DataFrame = {
    val p = Indexer.postings(docs)
    search(spark, query, p, Indexer.termDf(p), Indexer.docInfo(docs), k)
  }
}
