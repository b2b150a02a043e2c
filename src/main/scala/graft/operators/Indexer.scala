package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Tokenizer

/** Inverted-index construction — replaces the reference's three Hadoop
  * Streaming MapReduce jobs + Cassandra loader (app/index.sh, app/mapreduce,
  * app/app.py) with three declarative DataFrame plans over one tokenized
  * intermediate.
  *
  * Output schemas mirror the reference's Cassandra DDL (app/app.py:42-67):
  *   postings: (term, doc_id, tf, positions array<int>)
  *   termDf:   (term, df)
  *   docInfo:  (doc_id, length)
  *
  * Scale notes (100 TB): the only shuffle is the groupBy(term, doc_id) /
  * groupBy(term) hash aggregation, which Spark executes with partial
  * (map-side) aggregation — unlike the reference MR jobs, which configure no
  * combiner and shuffle every token occurrence raw (app/index.sh:28-33).
  * docInfo is shuffle-free (a map-only projection). Positions are kept sorted
  * (`sort_array`) for deterministic output; the reference's position order is
  * partition-dependent (SURVEY.md §7.6).
  */
object Indexer {

  /** Expects columns (doc_id, text). One row per (doc_id, position, term). */
  def tokenPositions(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      posexplode(Tokenizer.tokenize(col("text"))).as(Seq("pos", "term")))

  /** A1 — (term, doc_id) -> (tf, positions). */
  def postings(docs: DataFrame): DataFrame =
    tokenPositions(docs)
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).cast("int").as("tf"),
           sort_array(collect_list(col("pos"))).as("positions"))

  /** A2 — term -> document frequency. Derived from postings (already one row
    * per (term, doc_id)) so it is a plain count, not a countDistinct.
    */
  def termDf(postings: DataFrame): DataFrame =
    postings.groupBy("term").agg(count(lit(1)).cast("int").as("df"))

  /** A3 — doc_id -> (title, token count). Map-only, no shuffle.
    * The reference's documents_info stores (doc_id, title, length)
    * (app/app.py:53-59) and search results display titles
    * (app/query.py:199-213). Testdata has no title column, so when the
    * input lacks one we synthesize the reference prep's form — the leading
    * slice of the text (app/prepare_data.py derives titles from the doc
    * content the same way prep_pipeline does).
    */
  def docInfo(docs: DataFrame): DataFrame = {
    val title =
      if (docs.columns.contains("title")) col("title")
      else substring(col("text"), 1, 50)
    docs.select(col("doc_id"), title.as("title"),
      Tokenizer.tokenCount(col("text")).as("length"))
  }

  /** Incremental index growth: merge a new (disjoint) document batch into
    * existing index tables WITHOUT re-tokenizing the old corpus.
    * postings/docInfo union (doc sets disjoint => no key collisions);
    * term_df merges by summing per-term counts. At 100 TB this turns
    * corpus append from a full reindex into work proportional to the batch.
    */
  def appendIndex(existing: (DataFrame, DataFrame, DataFrame),
                  newDocs: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val (oldPostings, oldTermDf, oldDocInfo) = existing
    val p = postings(newDocs)
    val mergedPostings = oldPostings.unionByName(p)
    val mergedTermDf = mergeTermDf(oldTermDf, p)
    val mergedDocInfo = oldDocInfo.unionByName(docInfo(newDocs))
    (mergedPostings, mergedTermDf, mergedDocInfo)
  }

  /** old per-term counts + the new batch's postings merged in ONE exchange:
    * the batch side feeds (term, 1) rows straight into the merge groupBy,
    * whose partial (map-side) aggregation combines them per term before
    * the shuffle — aggregating the batch to its own term_df first would
    * shuffle the same combined volume one extra time.
    */
  private def mergeTermDf(oldTermDf: DataFrame, newPostings: DataFrame): DataFrame =
    oldTermDf.unionByName(
        newPostings.select(col("term"), lit(1).cast("int").as("df")))
      .groupBy("term").agg(sum(col("df")).cast("int").as("df"))

  /** Build and persist all three index tables as parquet (replaces Cassandra).
    * Partitioned by the shuffle that produced them; for the co-located
    * query path use buildBucketedIndex instead.
    */
  def buildIndex(spark: SparkSession, docs: DataFrame, indexDir: String): Unit = {
    val p = postings(docs).cache()
    p.write.mode("overwrite").parquet(s"$indexDir/postings")
    termDf(p).write.mode("overwrite").parquet(s"$indexDir/term_df")
    docInfo(docs).write.mode("overwrite").parquet(s"$indexDir/doc_info")
    p.unpersist()
  }

  /** Bucket count for the persisted index tables. Sized so one bucket of
    * postings fits an executor comfortably at the target scale (at 100 TB
    * this would be thousands; the co-location property is bucket-count
    * agnostic as long as postings and term_df agree).
    */
  val IndexBuckets = 8

  /** Persist the index as TERM-BUCKETED tables (the reference's index.sh →
    * Cassandra step, re-expressed as Spark bucketed parquet). postings and
    * term_df share bucketBy(IndexBuckets, term) + sortBy(term), so:
    *  - the query-time term join is co-located — zero exchange on either
    *    index scan (Search.searchPrebuilt);
    *  - literal term predicates prune to matching buckets
    *    (SelectedBucketsCount in the scan node);
    *  - within-bucket sort gives row-group skipping on term min/max.
    * doc_info stays a plain table (joined by doc_id on an already-tiny
    * candidate set).
    */
  /** Drop a managed table AND its warehouse location — the catalog is
    * in-memory per JVM, so a previous run's table directory survives as an
    * orphan that saveAsTable(overwrite) refuses to reuse.
    */
  private[operators] def dropManagedTable(spark: SparkSession, name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val path = new org.apache.hadoop.fs.Path(wh, name.toLowerCase)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
  }

  def buildBucketedIndex(spark: SparkSession, docs: DataFrame,
                         prefix: String): Unit = {
    Seq("postings", "term_df", "doc_info")
      .foreach(t => dropManagedTable(spark, s"${prefix}_$t"))
    val p = postings(docs).cache()
    p.write.mode("overwrite").format("parquet")
      .bucketBy(IndexBuckets, "term").sortBy("term")
      .saveAsTable(s"${prefix}_postings")
    termDf(p).write.mode("overwrite").format("parquet")
      .bucketBy(IndexBuckets, "term").sortBy("term")
      .saveAsTable(s"${prefix}_term_df")
    docInfo(docs).write.mode("overwrite").format("parquet")
      .saveAsTable(s"${prefix}_doc_info")
    p.unpersist()
  }

  /** Append a document batch (disjoint doc_ids) into the PERSISTED
    * bucketed index that searchPrebuilt reads — the reference
    * architecture's first growth operation (index once, grow forever;
    * app/index.sh re-runs load batches into the same Cassandra tables).
    *
    *  - postings / doc_info: append-mode writes by table name. The writer
    *    declares the SAME bucketing as the existing table (Spark verifies
    *    the specs match), so the batch lands as one extra file per touched
    *    bucket — normal bucketed-table growth; the co-located term join
    *    stays exchange-free. Cost ∝ batch, not corpus. (File counts grow
    *    one per bucket per batch — compactBucketedIndex is the matching
    *    maintenance operation.)
    *  - term_df: per-term counts must MERGE, not append (a term present in
    *    both halves would otherwise surface twice with partial dfs). The
    *    merged aggregate is vocabulary-sized — orders of magnitude smaller
    *    than postings — so it is rewritten: staged to a sibling bucketed
    *    table, then swapped in with catalog renames (a table cannot be
    *    overwritten while the overwrite plan reads it).
    */
  def appendBucketedIndex(spark: SparkSession, newDocs: DataFrame,
                          prefix: String): Unit = {
    val p = postings(newDocs).cache()
    p.write.mode("append").format("parquet")
      .bucketBy(IndexBuckets, "term").sortBy("term")
      .saveAsTable(s"${prefix}_postings")
    docInfo(newDocs).write.mode("append").format("parquet")
      .saveAsTable(s"${prefix}_doc_info")
    val merged = mergeTermDf(spark.table(s"${prefix}_term_df"), p)
    stageAndSwap(spark, merged, s"${prefix}_term_df", bucketed = true)
    p.unpersist()
  }

  /** Write `df` to a staging table, then swap it in as `target` with a
    * rename-aside sequence: target → target_old, staging → target, drop
    * target_old. Unlike drop-then-rename, every intermediate state keeps a
    * complete copy of the table under SOME recoverable name — a failure
    * between statements never leaves the index with no table at all.
    * (Managed-table RENAME moves the warehouse directory with the table.)
    */
  private[operators] def stageAndSwap(spark: SparkSession, df: DataFrame,
                                      target: String, bucketed: Boolean,
                                      bucketCol: String = "term"): Unit = {
    val staging = s"${target}_staged"
    val old = s"${target}_old"
    dropManagedTable(spark, staging)
    dropManagedTable(spark, old) // leftover from a crashed prior swap
    val w = df.write.mode("overwrite").format("parquet")
    (if (bucketed) w.bucketBy(IndexBuckets, bucketCol).sortBy(bucketCol) else w)
      .saveAsTable(staging)
    spark.sql(s"ALTER TABLE $target RENAME TO $old")
    spark.sql(s"ALTER TABLE $staging RENAME TO $target")
    dropManagedTable(spark, old)
  }

  /** File count per bucket id of a managed bucketed table (bucket id is
    * encoded in the file name: part-NNNNN-uuid_BBBBB.*.parquet).
    */
  def bucketFileCounts(spark: SparkSession, table: String): Map[Int, Int] = {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val path = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bucketRe = "_(\\d{5})\\.".r
    fs.listStatus(path).toSeq.map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith("."))
      .flatMap(n => bucketRe.findFirstMatchIn(n).map(_.group(1).toInt))
      .groupBy(identity).map { case (b, fs0) => b -> fs0.size }
  }

  /** Document DELETION from the persisted bucketed index — the lifecycle
    * operation a right-to-be-forgotten request forces on a 100 TB corpus
    * (the reference only ever grows its Cassandra tables; a complete
    * engine must also shrink them). Three bucket-preserving rewrites, all
    * swap via the crash-safe rename-aside sequence:
    *
    *  - term_df FIRST (while old postings are still live): the deleted
    *    docs' per-term posting counts flow as NEGATIVE df rows into the
    *    same merge aggregation appends use; terms whose df reaches zero
    *    drop out entirely (P6 semantics — a vanished term must vanish
    *    from the vocabulary).
    *  - postings: broadcast LEFT ANTI against the (tiny) delete set over
    *    a forced bucketed scan — narrow, so each task still holds exactly
    *    one bucket and writes exactly one file. Deletion doubles as
    *    compaction.
    *  - doc_info: plain filtered rewrite.
    *
    * Cost is one read+write of the index — same shape as compaction; the
    * per-bucket selective variant applies identically at cluster scale.
    * Each table swap is individually crash-safe but the three are not one
    * transaction: a concurrent reader can observe term_df already
    * shrunken while postings still carry the deleted docs (the same
    * non-transactional window the reference's sequential Cassandra
    * loaders have) — run maintenance single-writer, off the query path.
    *
    * @param docIds one column `doc_id`, the documents to forget
    */
  def deleteFromBucketedIndex(spark: SparkSession, prefix: String,
                              docIds: DataFrame): Unit =
    MaintenanceLease.withLease(spark, prefix, "index-delete") {
      deleteFromBucketedIndexImpl(spark, prefix, docIds)
    }

  private def deleteFromBucketedIndexImpl(spark: SparkSession, prefix: String,
                                          docIds: DataFrame): Unit = {
    val ids = docIds.select(col("doc_id"))
    val deletedPostings = spark.table(s"${prefix}_postings")
      .join(broadcast(ids), Seq("doc_id"), "left_semi")
    // negative merge: old counts + (-1 per deleted (term, doc)) — same
    // partial-agg exchange as the append merge; df==0 terms drop
    val newTermDf = spark.table(s"${prefix}_term_df")
      .unionByName(deletedPostings.select(col("term"),
        lit(-1).cast("int").as("df")))
      .groupBy("term").agg(sum(col("df")).cast("int").as("df"))
      .filter(col("df") > 0)
    stageAndSwap(spark, newTermDf, s"${prefix}_term_df", bucketed = true)
    val conf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(conf)
    spark.conf.set(conf, "false") // one partition per bucket at the scan
    try {
      val keptPostings = spark.table(s"${prefix}_postings")
        .join(broadcast(ids), Seq("doc_id"), "left_anti")
        .select("term", "doc_id", "tf", "positions") // USING join reorders
      stageAndSwap(spark, keptPostings, s"${prefix}_postings", bucketed = true)
    } finally spark.conf.set(conf, prev)
    val keptInfo = spark.table(s"${prefix}_doc_info")
      .join(broadcast(ids), Seq("doc_id"), "left_anti")
    stageAndSwap(spark, keptInfo, s"${prefix}_doc_info", bucketed = false)
  }

  /** Compaction — the maintenance half of the append story. Each bucketed
    * write lands one file per (task, touched bucket), so a build plus N
    * append batches leaves every bucket a pile of small files and scan
    * efficiency decays. When any bucket's file count exceeds
    * `maxFilesPerBucket`, rewrite the postings table WITHOUT ANY SHUFFLE:
    * with the bucketed scan forced on (autoBucketedScan would disable it
    * for a plain pass-through read), the source produces exactly one
    * partition per bucket, every row in a task already belongs to that
    * task's bucket, and the bucket-spec'd writer emits ONE file per
    * bucket. The swap reuses the same rename-aside machinery as the
    * term_df merge. Bucket spec and in-file term sort are preserved, so
    * pruning (SelectedBucketsCount) and the exchange-free term join
    * survive (IndexerSpec pins both).
    *
    * (A `repartition(IndexBuckets, term)` formulation is a trap: the
    * catalog bucketing satisfies the repartition's required distribution,
    * so the exchange is elided — and the planner then disables the
    * bucketed scan anyway, leaving arbitrary file-split tasks that each
    * write one file per bucket they touch.)
    *
    * Cost is one read+write of postings — amortized across the appends
    * that triggered it, shuffle-free, and at cluster scale parallel over
    * IndexBuckets tasks. The refinement there is per-bucket selective
    * rewrite (read only over-threshold buckets' files, write with
    * preserved bucket ids), which needs writer-internal file naming; the
    * whole-table form keeps to public APIs and the same plan shape.
    *
    * @return true if a rewrite happened, false if all buckets were within
    *         the threshold.
    */
  /** Snapshot the persisted index under a tag — the point-in-time copy a
    * risky maintenance window takes first (append/delete/compact are
    * individually crash-safe via rename-aside, but a bad BATCH — wrong
    * data appended, over-eager delete set — needs semantic rollback, not
    * crash recovery). Each table is copied through a forced bucketed scan
    * into a same-bucket-spec table, so the snapshot is itself a complete,
    * searchable, pruning-capable index; rollbackIndex swaps it live via
    * the same rename-aside sequence every other lifecycle op uses. Cost:
    * one read+write of the index (identical shape to compaction); at
    * cluster scale a storage-level snapshot (object-store copy) replaces
    * the data movement, with the same two-name catalog discipline.
    */
  def snapshotIndex(spark: SparkSession, prefix: String, tag: String): Unit = {
    val conf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(conf)
    spark.conf.set(conf, "false")
    try {
      Seq(("postings", true), ("term_df", true), ("doc_info", false))
        .foreach { case (t, bucketed) =>
          val snap = s"${prefix}_${tag}_$t"
          dropManagedTable(spark, snap)
          val w = spark.table(s"${prefix}_$t")
            .write.mode("overwrite").format("parquet")
          (if (bucketed) w.bucketBy(IndexBuckets, "term").sortBy("term") else w)
            .saveAsTable(snap)
        }
    } finally spark.conf.set(conf, prev)
  }

  /** Restore the live index from a snapshot taken by snapshotIndex. The
    * snapshot is CONSUMED (renamed in); take another if you need to keep it.
    * Swaps the live tables, so it takes the maintenance lease like every
    * other writer.
    */
  def rollbackIndex(spark: SparkSession, prefix: String, tag: String): Unit =
    MaintenanceLease.withLease(spark, prefix, "index-rollback") {
      rollbackIndexImpl(spark, prefix, tag)
    }

  private def rollbackIndexImpl(spark: SparkSession, prefix: String,
                                tag: String): Unit =
    Seq("postings", "term_df", "doc_info").foreach { t =>
      val live = s"${prefix}_$t"
      val snap = s"${prefix}_${tag}_$t"
      val old = s"${live}_old"
      dropManagedTable(spark, old)
      spark.sql(s"ALTER TABLE $live RENAME TO $old")
      spark.sql(s"ALTER TABLE $snap RENAME TO $live")
      dropManagedTable(spark, old)
    }

  /** Merge two persisted bucketed indexes over DISJOINT corpora into a
    * third — the shard-merge step of distributed index construction (build
    * each shard's index where its data lives, then combine; the reference
    * instead funnels every shard through one Cassandra loader,
    * app/app.py:119-259). Inputs are untouched; the output is a complete
    * index under `outPrefix` that searchPrebuilt reads like any other.
    *
    *  - postings / doc_info: union written into the new table. For
    *    postings, the bucketed scan is forced on, so each source yields
    *    one partition per bucket and every task holds rows of exactly ONE
    *    bucket (both inputs share the bucket spec — same hash, same
    *    count); the bucket-spec'd writer then emits one file per task.
    *    Result: two files per bucket, ZERO shuffle, cost = one sequential
    *    read+write of both inputs. Doc sets are disjoint, so no (term,
    *    doc_id) key can collide.
    *  - term_df: per-term counts must SUM across the halves — one
    *    vocabulary-sized partial-aggregated exchange, same merge shape as
    *    appends.
    */
  def mergeBucketedIndexes(spark: SparkSession, prefixA: String,
                           prefixB: String, outPrefix: String): Unit = {
    require(outPrefix != prefixA && outPrefix != prefixB,
      "merge target must be a new index (use appendBucketedIndex to grow in place)")
    MaintenanceLease.withLease(spark, outPrefix, "index-merge") {
      mergeBucketedIndexesImpl(spark, prefixA, prefixB, outPrefix)
    }
  }

  private def mergeBucketedIndexesImpl(spark: SparkSession, prefixA: String,
                                       prefixB: String, outPrefix: String): Unit = {
    Seq("postings", "term_df", "doc_info")
      .foreach(t => dropManagedTable(spark, s"${outPrefix}_$t"))
    // Union-of-co-bucketed-children is the ONE shape where Spark 4.1's
    // union partitioning propagation (spark.sql.unionOutputPartitioning)
    // miscompiles a downstream bucketed-table write: the union CLAIMS the
    // children's hash(term) partitioning, so neither the final merge
    // aggregate nor the writer inserts an exchange, but the executed union
    // concatenates child partitions — the written term_df then carries one
    // PER-SHARD row per term (observed: df split 202/193 instead of 395).
    // Scope the propagation off for the whole merge; the plain read path
    // is unaffected and every other index lifecycle op unions
    // non-co-partitioned children.
    val unionConf = "spark.sql.unionOutputPartitioning"
    val prevUnion = spark.conf.get(unionConf)
    spark.conf.set(unionConf, "false")
    try {
      val conf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
      val prev = spark.conf.get(conf)
      spark.conf.set(conf, "false") // one partition per bucket at each scan
      try {
        spark.table(s"${prefixA}_postings")
          .unionByName(spark.table(s"${prefixB}_postings"))
          .write.mode("overwrite").format("parquet")
          .bucketBy(IndexBuckets, "term").sortBy("term")
          .saveAsTable(s"${outPrefix}_postings")
      } finally spark.conf.set(conf, prev)
      spark.table(s"${prefixA}_term_df")
        .unionByName(spark.table(s"${prefixB}_term_df"))
        .groupBy("term").agg(sum(col("df")).cast("int").as("df"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(IndexBuckets, "term").sortBy("term")
        .saveAsTable(s"${outPrefix}_term_df")
      spark.table(s"${prefixA}_doc_info")
        .unionByName(spark.table(s"${prefixB}_doc_info"))
        .write.mode("overwrite").format("parquet")
        .saveAsTable(s"${outPrefix}_doc_info")
    } finally spark.conf.set(unionConf, prevUnion)
  }

  /** One-row DESCRIBE of a persisted index: vocabulary size, posting
    * volume, corpus size, average doc length, and the df distribution
    * (max + p50/p99 via the range-partitioned exact quantile operator) —
    * the heavy-term skew signal a maintainer reads before stop-term or
    * compaction decisions. Runs over the same tables the searches serve.
    */
  def describeIndex(spark: SparkSession, prefix: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val tdf = spark.table(s"${prefix}_term_df")
    val base = tdf.agg(
      count(lit(1)).cast("long").as("n_terms"),
      sum(col("df")).cast("long").as("n_postings"),
      max(col("df")).cast("long").as("max_df"))
    val docs = spark.table(s"${prefix}_doc_info")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        avg(col("length")).cast("double").as("avg_len"))
    val nPost = spark.table(s"${prefix}_postings")
      .agg(count(lit(1)).cast("long").as("n_posting_rows"))
    // an EMPTY index (everything deleted) has no df quantiles — substitute
    // a null row rather than letting the crossJoin annihilate the report
    // (exactQuantiles already runs driver actions, so the isEmpty probe
    // adds no new materialization boundary)
    val q0 = Quantiles.exactQuantiles(
        tdf.withColumn("g", lit("all")), "g", "df", Seq(0.5, 0.99))
      .select(col("q0").as("p50_df"), col("q1").as("p99_df"))
    val q = if (q0.isEmpty)
      spark.range(1).select(lit(null).cast("double").as("p50_df"),
        lit(null).cast("double").as("p99_df"))
    else q0
    base.crossJoin(docs).crossJoin(nPost).crossJoin(q)
      .select(col("n_terms"), col("n_postings"), col("n_posting_rows"),
        col("n_docs"), col("avg_len"), col("max_df"),
        col("p50_df").cast("double").as("p50_df"),
        col("p99_df").cast("double").as("p99_df"))
  }

  /** Total data-file count of a managed (possibly unbucketed) table —
    * the growth signal for doc_info, which appends one file per batch.
    */
  def tableFileCount(spark: SparkSession, table: String): Int = {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val path = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(path).count { f =>
      val n = f.getPath.getName
      f.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
  }

  def compactBucketedIndex(spark: SparkSession, prefix: String,
                           maxFilesPerBucket: Int = 8): Boolean =
    MaintenanceLease.withLease(spark, prefix, "index-compact") {
      compactBucketedIndexImpl(spark, prefix, maxFilesPerBucket)
    }

  private def compactBucketedIndexImpl(spark: SparkSession, prefix: String,
                                       maxFilesPerBucket: Int): Boolean = {
    val name = s"${prefix}_postings"
    val counts = bucketFileCounts(spark, name)
    val didPostings = counts.values.exists(_ > maxFilesPerBucket)
    if (didPostings) {
      val conf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
      val prev = spark.conf.get(conf)
      spark.conf.set(conf, "false") // one partition per bucket at the scan
      try stageAndSwap(spark, spark.table(name), name, bucketed = true)
      finally spark.conf.set(conf, prev)
    }
    // doc_info grows one file per append batch too (plain unbucketed
    // appends) — same IndexBuckets-scaled threshold, coalesced rewrite
    // (the table is corpus-row-sized but narrow: doc_id, length, title)
    val info = s"${prefix}_doc_info"
    val didInfo = tableFileCount(spark, info) > maxFilesPerBucket * IndexBuckets
    if (didInfo)
      stageAndSwap(spark,
        spark.table(info).coalesce(IndexBuckets), info, bucketed = false)
    didPostings || didInfo
  }
}
