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
    val mergedTermDf = oldTermDf.unionByName(termDf(p))
      .groupBy("term").agg(sum(col("df")).cast("int").as("df"))
    val mergedDocInfo = oldDocInfo.unionByName(docInfo(newDocs))
    (mergedPostings, mergedTermDf, mergedDocInfo)
  }

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
  private def dropManagedTable(spark: SparkSession, name: String): Unit = {
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
    *    stays exchange-free. Cost ∝ batch, not corpus.
    *  - term_df: per-term counts must MERGE, not append (a term present in
    *    both halves would otherwise surface twice with partial dfs). The
    *    merged aggregate is vocabulary-sized — orders of magnitude smaller
    *    than postings — so it is rewritten: staged to a sibling bucketed
    *    table, then swapped in with a catalog rename (a table cannot be
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
    val merged = spark.table(s"${prefix}_term_df").unionByName(termDf(p))
      .groupBy("term").agg(sum(col("df")).cast("int").as("df"))
    val staging = s"${prefix}_term_df_staged"
    dropManagedTable(spark, staging)
    merged.write.mode("overwrite").format("parquet")
      .bucketBy(IndexBuckets, "term").sortBy("term")
      .saveAsTable(staging)
    dropManagedTable(spark, s"${prefix}_term_df") // drop + clear the location
    spark.sql(s"ALTER TABLE $staging RENAME TO ${prefix}_term_df")
    p.unpersist()
  }
}
