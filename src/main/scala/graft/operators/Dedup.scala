package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextHash, Tokenizer}

/** Deduplication operators for large-scale corpus curation.
  *
  * Scale design (100 TB): every variant is candidate-generation + verify —
  * never an unblocked O(n²) cross join.
  *  - exact: one hash-groupBy (single shuffle on the digest).
  *  - MinHash/LSH: signatures are one narrow shuffle-free projection; the
  *    band-bucket self-join only expands real collisions. Band count / row
  *    count tune the jaccard-recall curve.
  *  - SimHash: one token explode + hash-groupBy; pairs blocked on a
  *    signature half (pigeonhole), hamming-verified with bit_count.
  *  - n-gram: inverted shingle index; pairs materialize only for docs that
  *    actually share a shingle, verified with exact set jaccard.
  * All hashes are TextHash md5-based — deterministic across engines/runs.
  */
object Dedup {

  /** Exact dedup bookkeeping: per-row digest, group size, and a
    * deterministic keeper flag (min id per digest group).
    * Expects (idCol, textCol); emits (id, digest, group_size, keep).
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(col("digest"))
    docs.select(col(idCol).as("id"),
        md5(Tokenizer.normalizeWhitespace(col(textCol))).as("digest"))
      .withColumn("group_size", count(lit(1)).over(w).cast("long"))
      .withColumn("keep", col("id") === min(col("id")).over(w))
  }

  /** MinHash signature columns mh0..mh{n-1} over a distinct-element array. */
  def minHashSignatures(set: Column, numHashes: Int): Seq[Column] =
    (0 until numHashes).map(i => TextHash.minHash(set, i).as(s"mh$i"))

  /** Same, over an already-hashed `array<long>` set. */
  def minHashSignaturesHashed(set: Column, numHashes: Int): Seq[Column] =
    (0 until numHashes).map(i => TextHash.minHashOfHashes(set, i).as(s"mh$i"))

  /** One row per (id, band, band-hash-struct) from a signature table
    * (id, mh0..mh{n-1}) — the shared banding step of the LSH joins, also
    * the row shape streaming collision detection keys its state by
    * (graft.streaming.DocStreams.bucketCollisions).
    */
  def banded(sigs: DataFrame, numHashes: Int, rowsPerBand: Int): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val bandStructs = (0 until numBands).map { b =>
      struct(lit(b).as("band"),
        struct((0 until rowsPerBand).map(r =>
          col(s"mh${b * rowsPerBand + r}").as(s"r$r")): _*).as("h"))
    }
    sigs.select(col("id"), explode(array(bandStructs: _*)).as("bh"))
      .select(col("id"), col("bh.band").as("band"), col("bh.h").as("h"))
  }

  /** LSH candidate pairs from a signature table (id, mh0..mh{n-1}):
    * bands of `rowsPerBand` signatures; pairs sharing any full band collide.
    * Emits distinct (id_a, id_b), id_a < id_b.
    */
  def lshCandidates(sigs: DataFrame, numHashes: Int, rowsPerBand: Int): DataFrame = {
    val bd = banded(sigs, numHashes, rowsPerBand)
    val a = bd.alias("a")
    val b = bd.alias("b")
    a.join(b, col("a.band") === col("b.band") && col("a.h") === col("b.h") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** LSH candidates BETWEEN two signature tables — the ingest-time shape:
    * a new batch's signatures against the persisted corpus signature
    * index. Candidate volume is (new × existing) band collisions only —
    * the corpus is never self-paired, and the batch side is small enough
    * to broadcast, so the corpus band table streams through the probe
    * unshuffled. Emits distinct (id_new, id_old).
    */
  def lshCandidatesBetween(newSigs: DataFrame, existingSigs: DataFrame,
                           numHashes: Int, rowsPerBand: Int): DataFrame = {
    val nb = banded(newSigs, numHashes, rowsPerBand)
      .select(col("id").as("id_new"), col("band"), col("h"))
    val eb = banded(existingSigs, numHashes, rowsPerBand)
      .select(col("id").as("id_old"), col("band"), col("h"))
    broadcast(nb).join(eb, Seq("band", "h"))
      .select(col("id_new"), col("id_old"))
      .distinct()
  }

  /** Exact set jaccard between two array columns (distinct semantics). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Per-id 32-bit SimHash from exploded (id, term) rows: hash each term
    * once, sum ±1 votes per bit, pack sign bits. One shuffle (the groupBy).
    */
  def simHashSignatures(tokens: DataFrame, bits: Int = 32): DataFrame = {
    // Hash once per token row (projected before the agg so md5 isn't
    // re-evaluated per bit), then 32 partial-aggregated vote sums.
    val hashed = tokens.select(col("id"), TextHash.hash64(col("term")).as("h"))
    val voteCols = (0 until bits).map { j =>
      sum(when(shiftright(col("h"), j) % 2 === 1, 1L).otherwise(-1L)).as(s"v$j")
    }
    val packed = (0 until bits).map { j =>
      when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    hashed.groupBy(col("id"))
      .agg(voteCols.head, voteCols.tail: _*)
      .select(col("id"), packed.as("simhash"))
  }

  /** Hamming distance between two packed signature columns. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("long")

  /** Incremental-ingest dedup: which incoming docs are NEW versus an
    * existing corpus' digest set? The standard 100 TB ingest shape — a
    * Bloom filter of the existing digests (built distributed via
    * DataFrameStatFunctions.bloomFilter, broadcast once) pre-filters the
    * incoming batch:
    *
    *  - bloom-NEGATIVE rows are definitely new (no false negatives) and
    *    skip the join entirely — at scale that is almost every row, so
    *    the anti-join's shuffle volume collapses to the tiny maybe-dup
    *    set;
    *  - bloom-POSITIVE rows (real dups + fpp false positives) are
    *    resolved EXACTLY by a left-anti join against the existing
    *    digests.
    *
    * The result is therefore exact — the bloom is a performance device,
    * not an approximation of the answer — and hash-checkable against a
    * plain anti-join oracle. The probe is a codegen'd expression over the
    * broadcast sketch (graft.plans.BloomMightContain — probes the UTF-8
    * bytes with no per-row boxing, keeping the gate inside the
    * whole-stage-codegen span); one hash + a few bit probes per row,
    * never the bottleneck next to the md5 digest itself. NULL digests
    * (null text) are definitely new — SQL equality never matches NULL,
    * matching the NOT EXISTS oracle semantics.
    *
    * Cost shape: building the bloom is one scan of the existing digests
    * (pass `expectedItems` to skip the sizing count — at real scale the
    * caller knows the corpus cardinality); the returned plan evaluates the
    * incoming digest projection in both union branches, so cache the
    * incoming batch upstream if its md5 pass is expensive. The broadcast
    * sketch lives until the JVM (or explicit unpersist) reclaims it —
    * ingest pipelines reuse it across batches, which is the point.
    *
    * @return incoming rows that are new: (id, digest)
    */
  def incrementalNew(existing: DataFrame, incoming: DataFrame,
                     idCol: String, textCol: String,
                     fpp: Double = 0.01,
                     expectedItems: Option[Long] = None): DataFrame = {
    val spark = existing.sparkSession
    def digests(df: DataFrame) = df.select(col(idCol).as("id"),
      md5(Tokenizer.normalizeWhitespace(col(textCol))).as("digest"))
    val ex = digests(existing).select("digest").filter(col("digest").isNotNull)
    val expected = math.max(1000L, expectedItems.getOrElse(ex.count()))
    val bloom = ex.stat.bloomFilter("digest", expected, fpp)
    val bloomBc = spark.sparkContext.broadcast(bloom)
    def mightContain(c: org.apache.spark.sql.Column) =
      graft.plans.BloomMightContain.probeCol(c, bloomBc)
    val in = digests(incoming)
    val definitelyNew = in.filter(!mightContain(col("digest")))
    val maybeDup = in.filter(mightContain(col("digest")))
      .join(ex, Seq("digest"), "left_anti")
      .select("id", "digest")
    definitelyNew.select("id", "digest").unionByName(maybeDup)
  }
}
