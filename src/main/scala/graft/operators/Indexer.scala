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

  /** A3 — doc_id -> token count. Map-only, no shuffle. */
  def docInfo(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      Tokenizer.tokenCount(col("text")).as("length"))

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
    * Partitioned by the shuffle that produced them; at cluster scale the
    * postings table would additionally be bucketed by `term` so the query
    * path's term join is co-located.
    */
  def buildIndex(spark: SparkSession, docs: DataFrame, indexDir: String): Unit = {
    val p = postings(docs).cache()
    p.write.mode("overwrite").parquet(s"$indexDir/postings")
    termDf(p).write.mode("overwrite").parquet(s"$indexDir/term_df")
    docInfo(docs).write.mode("overwrite").parquet(s"$indexDir/doc_info")
    p.unpersist()
  }
}
