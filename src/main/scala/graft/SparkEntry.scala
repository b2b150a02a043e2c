package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Search

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * Every entry in `queries` takes (spark, sfDir) and returns a DataFrame over
  * the parquet tables in sfDir; `oracleSql` carries the equivalent DuckDB SQL
  * (run by the driver against the same parquet, registered under bare table
  * names). Column names AND types are aligned between both sides: aggregates
  * are cast to bigint/double explicitly so the hash compare sees identical
  * schemas.
  */
object SparkEntry {

  /** Flagship: BM25 full-text search over the documents table, the entire
    * reference pipeline (index build + ranking) as one DataFrame plan.
    */
  val FlagshipQuery = "spark filter join stream data"

  def entry(spark: SparkSession): DataFrame =
    Search.searchDocs(spark,
      Tables.documents(spark, "/root/testdata/sf0.001"), FlagshipQuery)

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all

  def oracleSql: Map[String, String] =
    Queries.oracles
}
