package graft.sources

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Tokenizer

/** The reference's data-preparation stage and file formats
  * (SURVEY.md §2.1 S1-S8, §3.3), Spark-native:
  *
  *  - prepare: select/sample/limit + whitespace-normalized title
  *    (app/prepare_data.py:19-29 — the Python UDF becomes a built-in
  *    expression)
  *  - TSV sink/scan: the MapReduce interchange format
  *    (app/prepare_data.py:41, mapper stdin parsing)
  *  - per-document text files: the foreach side-effect sink
  *    (app/prepare_data.py:31-38), as foreachPartition
  *  - raw text-dir scan replacing the `hdfs dfs -cat` subprocess reads
  *    (app/app.py:74-104)
  */
object Pipelines {

  val DocSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("title", StringType),
    StructField("text", StringType)))

  /** P1-P3 + F7: project, Bernoulli-sample (seed 0), cap at n, normalize
    * title whitespace. Mirrors app/prepare_data.py:19-29.
    */
  def prepare(docs: DataFrame, n: Int, totalCount: Long): DataFrame = {
    val fraction = math.min(1.0, if (totalCount == 0) 1.0 else 100.0 * n / totalCount)
    docs.select(col("id"), col("title"), col("text"))
      .sample(fraction, seed = 0)
      .limit(n)
      .withColumn("title", Tokenizer.normalizeWhitespace(col("title")))
  }

  /** `prepare` with the Bernoulli limb replaced by a deterministic md5
    * hash gate (the mixture_sample idiom): a row survives when
    * hash64(id) % 1e6 < floor(fraction * 1e6), and the cap becomes the
    * lexicographically-lowest n ids (TakeOrderedAndProject) instead of an
    * arbitrary limit. Same fraction arithmetic as `prepare`, but every
    * step is reproducible in ANY engine — this is the variant the driver
    * oracle checks (prep_pipeline); seed-0 `prepare` stays as the
    * reference-parity surface, pinned by PipelineSpec.
    *
    * Scale: the gate is a codegen'd per-row predicate (no RNG state, no
    * sort until the final top-n, which is a partial top-n per partition).
    */
  def prepareHashGate(docs: DataFrame, n: Int, totalCount: Long): DataFrame = {
    val fraction = math.min(1.0, if (totalCount == 0) 1.0 else 100.0 * n / totalCount)
    val threshold = math.floor(fraction * 1e6).toLong
    docs.select(col("id"), col("title"), col("text"))
      .filter(graft.functions.TextHash.hash64(col("id")) % 1000000L < threshold)
      .orderBy(col("id"))
      .limit(n)
      .withColumn("title", Tokenizer.normalizeWhitespace(col("title")))
  }

  /** S2: tab-separated sink, overwrite (app/prepare_data.py:41).
    * Spark's CSV WRITER trims leading/trailing whitespace by default
    * (ignore*WhiteSpace default true on write, false on read) — that
    * silently corrupts content through a round-trip, so the sink turns it
    * off: what goes in comes back byte-exact (tsv_roundtrip hash-checks
    * this against the source rows).
    */
  def writeTsv(df: DataFrame, path: String): Unit =
    df.write.option("sep", "\t")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .mode("overwrite").csv(path)

  /** S4: quote-aware TSV scan (the MR mappers' csv.reader semantics).
    * multiLine=true so quoted fields CONTAINING the line separator — which
    * the writer emits for any text with an embedded newline — parse back
    * as one record instead of shredding into PERMISSIVE garbage rows. The
    * cost is per-FILE instead of per-line split granularity; parallelism
    * at scale comes from file count (the writer emits one file per task),
    * and a corpus known to be newline-free can flip the option back.
    * One documented non-identity: the parser normalizes line separators
    * inside quoted fields to \n (CRLF becomes LF) — PipelineSpec pins
    * both behaviors.
    */
  def readTsv(spark: SparkSession, path: String,
              multiLine: Boolean = true): DataFrame =
    spark.read.option("sep", "\t").option("multiLine", multiLine.toString)
      .schema(DocSchema).csv(path)

  /** JSON-Lines sink/scan — the interchange format for training-data
    * pipelines (one JSON object per line; every major corpus distribution
    * ships this way). The writer emits one file per task like the TSV
    * sink; the reader applies an explicit schema so malformed lines fall
    * into PERMISSIVE nulls rather than failing the scan, mirroring the
    * TSV path's P5 semantics. JSON escapes embedded newlines/tabs by
    * construction, so unlike TSV no writer options are needed for
    * byte-exact round-trips (jsonl_roundtrip hash-checks this).
    */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJsonl(spark: SparkSession, path: String,
                schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC sink/scan — the columnar interchange format for warehouses that
    * standardized on Hive (vectorized reader, predicate pushdown and
    * column pruning like parquet; Spark bundles native support). Typed
    * columns survive exactly (no string round-trip), so unlike TSV/JSONL
    * no schema re-application is needed: the files carry it
    * (orc_roundtrip hash-checks content; PipelineSpec pins the schema).
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** F8: sanitize a filename exactly like the reference
    * (spaces -> _, then keep only [a-zA-Z0-9_-]; app/prepare_data.py:32-33).
    */
  def sanitizeName(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(regexp_replace(c, " ", "_"), "[^a-zA-Z0-9_-]", "")

  /** S3/U2: one `<id>_<sanitized title>.txt` per document, written from the
    * executors via foreachPartition (app/prepare_data.py:31-38). `outDir`
    * must be visible to all executors (local FS in local mode).
    */
  def writePerDocFiles(docs: DataFrame, outDir: String): Unit = {
    new File(outDir).mkdirs()
    docs.select(
        sanitizeName(concat_ws("_", col("id"), col("title"))).as("fname"),
        col("text"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        rows.foreach { r =>
          // explicit UTF-8: Spark's text reader decodes UTF-8 by spec, so
          // a platform-default-charset writer (FileWriter) would corrupt
          // non-ASCII content through the round-trip on non-UTF-8 JVMs
          val w = java.nio.file.Files.newBufferedWriter(
            new File(outDir, r.getString(0) + ".txt").toPath,
            java.nio.charset.StandardCharsets.UTF_8)
          try w.write(if (r.isNullAt(1)) "" else r.getString(1)) finally w.close()
        }
      }
  }

  /** S5: read a directory of text files as (path, value) rows. */
  def readTextDir(spark: SparkSession, dir: String): DataFrame =
    spark.read.text(dir).withColumn("path", input_file_name())

  /** S5 (whole-file form): one row per file — newline-exact content, for
    * consumers that need the document back, not its lines.
    */
  def readTextFilesWhole(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("wholetext", "true").text(dir)
      .withColumn("path", input_file_name())

  /** Per-process, per-run scratch for sink round-trips: a NEVER-REUSED
    * directory per call (graft.ScratchDirs) — a lazy DataFrame returned by
    * an earlier round-trip keeps reading its own files after a re-run, and
    * each run sees exactly the files its own write produced.
    */
  def freshScratch(name: String): String =
    graft.ScratchDirs.fresh("graft_pipe", name).toString
}
