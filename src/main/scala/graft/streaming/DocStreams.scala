package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Streaming forms of the DOCUMENT pipeline: near-dup candidate detection
  * with per-bucket keyed state, and live index ingestion (micro-batches
  * appended into the persisted bucketed index). The events pipeline's
  * streaming forms live in EventStreams; this file covers the corpus side.
  */
object DocStreams {

  /** One MinHash band row: (band, h1, h2) is the bucket key (rowsPerBand =
    * 2 signature values), `id` the document. NEGATIVE band values carry a
    * second detection CHANNEL through the same keyed state (ch 0; ch 1 for
    * band >= 0) — e.g. exact-digest buckets riding along with near-dup
    * band buckets in ONE streaming query, so a composed pipeline pays one
    * stateful pass instead of two.
    */
  case class BandRow(band: Int, h1: Long, h2: Long, id: Long)
  case class BucketState(ids: Seq[Long])
  case class CandPair(id_a: Long, id_b: Long, ch: Int)

  /** The documents parquet as a STREAMING file source. `dir` may be the
    * testdata dir or a staged directory holding the corpus split into
    * several files (maxFilesPerTrigger=1 then yields one micro-batch per
    * file — real cross-batch state instead of a single-batch degenerate
    * run).
    */
  def docsFileStream(s: SparkSession, dir: String,
                     oneFilePerBatch: Boolean = false): DataFrame = {
    val schema = s.read.parquet(s"$dir/documents.parquet").schema
    val r = s.readStream.schema(schema).option("basePath", dir)
    (if (oneFilePerBatch) r.option("maxFilesPerTrigger", "1") else r)
      .parquet(s"$dir/documents.parquet*")
  }

  /** Stage `docs` into a fresh stream-source dir as `nFiles` separate
    * parquet files (doc_id mod nFiles), so the file stream sees several
    * micro-batches. Returns the directory.
    */
  def stagedDocSplits(docs: DataFrame, nFiles: Int): String = {
    val dir = graft.ScratchDirs.fresh("graft_stream", "docs_src")
    (0 until nFiles).foreach { i =>
      val tmp = dir.resolve(s"_split_$i")
      docs.filter(pmod(col("doc_id"), lit(nFiles)) === i)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.toFile.listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"doc split $i produced no parquet part file"))
      java.nio.file.Files.move(part.toPath,
        dir.resolve(if (i == 0) "documents.parquet" else s"documents.parquet$i"))
      locally {
        import scala.reflect.io.Directory
        new Directory(tmp.toFile).deleteRecursively(): Unit
      }
    }
    dir.toString
  }

  /** Stateful LSH bucket-collision detection: per-bucket keyed state holds
    * every id seen in that bucket so far; each arriving id emits a
    * candidate pair with every EXISTING member (plus pairs within its own
    * batch), so the emitted SET over the whole run equals the batch
    * self-join's candidates no matter how arrival interleaves — each pair
    * surfaces exactly once per bucket, when its second member arrives. No
    * sentinel is needed (unlike accumulate-and-evaluate operators): pair
    * emission is monotone in the arrival prefix.
    *
    * State is bounded by bucket occupancy — the same collision-bounded
    * quantity that bounds the batch join's candidate volume; at 100 TB the
    * banding width controls it (more bits → smaller buckets), and state
    * partitions by bucket key across executors.
    */
  def bucketCollisions(spark: SparkSession,
                       rows: Dataset[BandRow]): Dataset[CandPair] = {
    import spark.implicits._
    rows
      .groupByKey(r => (r.band, r.h1, r.h2))
      .flatMapGroupsWithState[BucketState, CandPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Int, Long, Long), it: Iterator[BandRow], state: GroupState[BucketState]) =>
          val ch = if (key._1 < 0) 0 else 1
          val existing = state.getOption.map(_.ids).getOrElse(Seq.empty)
          val known = existing.toSet // Seq.contains per arrival is O(n^2)/bucket
          // a doc contributes one row per (band, bucket); ids can still
          // repeat across batches if a source replays — drop known ids
          val incoming = it.map(_.id).toVector.distinct
            .filterNot(known).sorted
          val crossPairs = for (n <- incoming; e <- existing)
            yield CandPair(math.min(n, e), math.max(n, e), ch)
          val withinPairs = for {
            i <- incoming.indices; j <- (i + 1) until incoming.size
          } yield CandPair(incoming(i), incoming(j), ch)
          state.update(BucketState(existing ++ incoming))
          (crossPairs ++ withinPairs).iterator
      }
  }

  /** Run the stateful collision detector over a staged multi-batch corpus
    * stream and return the DISTINCT candidate pairs as a batch DataFrame
    * (cross-band duplicates collapse here, exactly like the batch
    * lshCandidates' distinct).
    */
  def nearDupCandidates(s: SparkSession, bandRows: DataFrame,
                        tag: String): DataFrame = {
    import s.implicits._
    val typed = bandRows.select(
      col("band").cast("int").as("band"), col("h1"), col("h2"), col("id"))
      .as[BandRow]
    EventStreams.runToSink(bucketCollisions(s, typed).toDF(),
        OutputMode.Append, tag)
      .distinct()
  }

  /** Per-source quality monitoring computed BY THE STREAMING ENGINE: the
    * corpus arrives as micro-batches and a Complete-mode aggregation
    * maintains count + integer micro-quality sums per source — the live
    * corpus-health dashboard an ingest pipeline watches. Per-doc quality
    * is quantized to micro-units BEFORE the stateful sum (the repo-wide
    * idiom), so the streamed totals are bit-identical to the batch
    * oracle's regardless of arrival order or micro-batch boundaries.
    * @param staged a staged multi-file dir of (doc_id, text, source)
    */
  def qualityBySourceAvailableNow(s: SparkSession, staged: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val src = docsFileStream(s, staged, oneFilePerBatch = true)
    val toks = graft.functions.Tokenizer.tokenize(col("text"))
    val agg = src
      .withColumn("qm",
        round(graft.operators.Curation.qualityOf(col("text"), toks)
          * lit(1000000.0)).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("qm")).as("sum_qm"))
    EventStreams.runToSink(agg, OutputMode.Complete, "quality_by_source")
      .select(col("source"), col("n_docs").cast("long").as("n_docs"),
        (col("sum_qm").cast("double") / lit(1000000.0) /
          col("n_docs").cast("double")).as("avg_quality"))
      .orderBy("source")
  }

  /** Drift-triggered RETRAIN policy for the vector ingest stream (VERDICT
    * r11 "next" #1 — the automation half of the maintenance loop, now that
    * compaction is wired): every `everyNBatches` non-empty micro-batches,
    * read the occupancy-skew drift signal
    * ([[graft.operators.VectorIndex.occupancySkew]] — a <= NList-row
    * partition-column aggregate) and past `skewThreshold` run a
    * snapshot-fenced [[graft.operators.VectorIndex.retrain]]. Appends
    * encode with frozen quantizers, so a long-lived ingest whose corpus
    * drifts from the training distribution loses recall until someone
    * re-Lloyds — this closes that loop the way the compaction policy
    * closed file-count growth (the self-maintaining-store role the
    * reference delegates to Cassandra, app/app.py:42-67).
    *
    * @param everyNBatches check cadence (the check is cheap; retrain is
    *   the expensive part and only fires past the threshold)
    * @param skewThreshold max/mean list-occupancy ratio above which the
    *   index is declared drifted. Balanced ~1-2; a drifted ingest piles
    *   onto few stale lists (StreamingSpec's drifted fixture measures >3
    *   while its pre-drift index sits under 2). <= 0 fires at every
    *   check — the deterministic always-retrain setting the oracle row
    *   and throughput probe use.
    * @param iters Lloyd rounds for the re-train
    * @param snapshotFence take `<prefix>_preretrain` before each retrain
    *   (the CLI `vretrain` fence; rollback target if a retrain dies)
    */
  case class RetrainPolicy(everyNBatches: Int = 8, skewThreshold: Double = 3.0,
                           iters: Int = 2, snapshotFence: Boolean = true) {
    require(everyNBatches > 0, s"check cadence must be >= 1 ($everyNBatches)")
  }

  /** Applied-batch guard for the ingest streams' foreachBatch bodies
    * (AUDIT_r12 #6): foreachBatch is at-least-once — a crash between a
    * COMMITTED append job and the streaming checkpoint's batch commit
    * replays the batch on restart, and an index append is not naturally
    * idempotent (unlike the serving sink's overwrite subdirs). A marker
    * file per applied batch, living INSIDE the checkpoint directory
    * (keyed by the same batchId, reclaimed with the checkpoint), makes
    * the append effectively-once: a replayed batch sees its marker and
    * skips. Residual window: a crash between the append's job commit and
    * the marker write still double-appends — two driver-side filesystem
    * ops apart instead of the whole batch, the practical narrowing short
    * of a transactional store. The body must hold ONLY the append
    * (VERDICT r12 "what's wrong" #1): maintenance that dies after the
    * append's job commit but inside the marker scope would leave the
    * batch unmarked and a restart double-appending — the exact window
    * the guard exists to close. Only meaningful with a STABLE caller
    * checkpoint (the fresh-checkpoint default can never replay).
    *
    * The ledger is O(1), not O(batches) (VERDICT r12 smaller note):
    * batchIds are monotonic and `AvailableNow` foreachBatch replays at
    * most the LAST uncommitted batch, so a single high-water-mark marker
    * decides "applied" for every batch — after writing `batch_N` the
    * guard deletes the superseded markers, and the applied check is
    * "any marker id >= batchId". The new marker is created (atomic)
    * BEFORE the old ones delete, so a crash between the two fs ops
    * leaves two markers — still correct, reclaimed at the next batch.
    */
  private def runAppliedOnce(s: SparkSession, ckpt: String, batchId: Long,
                             what: String)(body: => Unit): Boolean = {
    val dir = new org.apache.hadoop.fs.Path(ckpt, "_graft_applied")
    val fs = dir.getFileSystem(s.sparkContext.hadoopConfiguration)
    val markers: Seq[(org.apache.hadoop.fs.Path, Long)] =
      if (fs.exists(dir))
        fs.listStatus(dir).toSeq.flatMap(st =>
          st.getPath.getName.stripPrefix("batch_").toLongOption
            .map(st.getPath -> _))
      else Seq.empty
    if (markers.exists(_._2 >= batchId)) {
      System.err.println(s"[graft] $what batch $batchId already applied " +
        "(at-least-once replay) — skipping")
      false
    } else {
      body
      fs.mkdirs(dir)
      fs.create(new org.apache.hadoop.fs.Path(dir, s"batch_$batchId"), true)
        .close()
      markers.foreach { case (p, _) => fs.delete(p, false): Unit }
      true
    }
  }

  /** Outcome of a resumable ingest run: how many policy retrains fired
    * and how many replayed (already-applied) batches the marker guard
    * skipped. Replay skips were stderr-only (VERDICT r13 smaller note);
    * returning them makes replay observability symmetric with the
    * retrain counter — an unattended operator reads both from the call,
    * not from grepping logs.
    */
  final case class IngestReport(retrains: Int, replaySkips: Int)

  /** Run an in-stream maintenance POLICY op with skip-not-fail lease
    * semantics (VERDICT r12 "what's missing" #2): policy compaction /
    * retrain contending with a manual CLI op on the same store is exactly
    * the overlap the maintenance lease exists to surface — but for an
    * UNATTENDED policy the right response is "the store is being
    * maintained by someone else right now; retry at the next batch", not
    * killing the ingest stream. Both skipped and redone policy rounds are
    * safe by construction: compaction is file-count-driven and
    * results-invisible, retrain re-checks its drift signal every cadence.
    * Anything that is not lease contention still propagates (and, hitting
    * it AFTER the applied-marker write, can no longer un-mark a committed
    * append).
    */
  private def policyOp(what: String)(body: => Unit): Unit =
    try body
    catch {
      case e: graft.operators.MaintenanceLease.LeaseHeldException =>
        System.err.println(s"[graft] $what skipped (lease contention; " +
          s"retrying at the next batch): ${e.getMessage}")
    }

  /** Live VECTOR-index ingestion: stream a staged embeddings directory one
    * file per micro-batch, each batch encoded with the FROZEN stored
    * quantizers and appended into the persisted IVF-PQ index
    * (VectorIndex.append) — the vector twin of ingestAppend. A concurrent
    * ANN searcher reads the same tables as the corpus grows.
    * `maxFilesPerUnit` wires in the compaction policy (file-count bound),
    * `retrainPolicy` the drift policy (recall bound) — together the store
    * self-maintains under unattended continuous ingest.
    *
    * Policy-vs-serving race, disposed: each policy op takes the
    * maintenance lease, so policies and manual CLI maintenance can never
    * interleave swap windows (contention skips the policy round —
    * [[policyOp]]); a CONCURRENT SEARCHER during a triggered retrain can
    * observe the documented mixed-quantizer window while the three
    * external tables re-point (the same window manual `vretrain` has —
    * the snapshot fence bounds the damage to a rollback).
    *
    * @param checkpointDir STABLE checkpoint for resumable ingest: a
    *   second call with the same checkpoint processes only files the
    *   source has not yet seen, and a batch replayed after a crash
    *   mid-commit is skipped by the applied-marker guard
    *   ([[runAppliedOnce]]) instead of double-appending. Default: a
    *   fresh one-shot checkpoint (the existing fixture behavior).
    * @return number of policy-triggered retrains (0 without a policy) —
    *   observable so tests and probes can pin when the policy fired
    */
  def vectorIngestAppend(s: SparkSession, stagedDir: String, prefix: String,
                         maxFilesPerUnit: Option[Int] = None,
                         retrainPolicy: Option[RetrainPolicy] = None,
                         checkpointDir: Option[String] = None): IngestReport = {
    val ckpt = checkpointDir.getOrElse(
      graft.ScratchDirs.fresh("graft_stream", "vingest_ckpt").toString)
    val schema = s.read.parquet(s"$stagedDir/embeddings.parquet").schema
    val src = s.readStream.schema(schema).option("basePath", stagedDir)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$stagedDir/embeddings.parquet*")
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    // foreachBatch runs serially on the driver, so plain vars are safe
    var retrains = 0
    var replaySkips = 0
    try {
      val q = src.writeStream
        .outputMode(OutputMode.Append)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          if (!batch.isEmpty) {
            // the marker scope holds ONLY the append; maintenance runs
            // after the marker is durable (VERDICT r12 #1) — a policy op
            // dying on lease contention can no longer leave a committed
            // append unmarked for a restart to double-apply
            if (!runAppliedOnce(s, ckpt, batchId, "vector ingest") {
              graft.operators.VectorIndex.append(s,
                batch.select(col("id"), col("v")), prefix)
            }) replaySkips += 1
            // bounded-file-count policy, same as ingestAppend: one listing
            // per batch, a per-list/per-bucket rewrite only past the
            // threshold — continuous embedding ingest no longer implies
            // unbounded file-count growth. Runs on replayed batches too:
            // compaction is idempotent and results-invisible.
            maxFilesPerUnit.foreach(t => policyOp("in-stream compaction") {
              graft.operators.VectorIndex.compact(s, prefix, t): Unit
            })
            retrainPolicy.foreach { p =>
              // the cadence keys off batchId — monotonic across restarts
              // on a stable checkpoint — so a resumed ingest fires the
              // check at the same global batch count a single-session run
              // would (ADVICE r12: the old in-memory counter reset to 0 on
              // every resume, silently losing the policy on an ingest
              // restarted more often than its cadence)
              if ((batchId + 1) % p.everyNBatches == 0) {
                val skew = graft.operators.VectorIndex.occupancySkew(s, prefix)
                if (skew > p.skewThreshold) {
                  System.err.println(f"[graft] $prefix occupancy skew " +
                    f"$skew%.2f exceeds ${p.skewThreshold}%.2f at batch " +
                    f"$batchId — retraining (fence: " +
                    s"${if (p.snapshotFence) s"${prefix}_preretrain" else "OFF"})")
                  policyOp("policy retrain") {
                    // fence + retrain under ONE lease (ADVICE r13): with
                    // separate leases a writer sneaking between them left
                    // an orphaned fence snapshot and a rollback hazard for
                    // whatever it wrote in the gap — contention now skips
                    // the pair atomically
                    if (p.snapshotFence)
                      graft.operators.VectorIndex
                        .snapshotFencedRetrain(s, prefix, p.iters)
                    else
                      graft.operators.VectorIndex.retrain(s, prefix, p.iters)
                    retrains += 1
                  }
                }
              }
            }
          }
        }
        .start()
      q.awaitTermination()
    } finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    IngestReport(retrains, replaySkips)
  }

  /** Stage `emb` (id, v) into a fresh stream-source dir as `nFiles`
    * parquet files (id mod nFiles) matching the glob above.
    */
  def stagedEmbSplits(emb: DataFrame, nFiles: Int): String = {
    val dir = graft.ScratchDirs.fresh("graft_stream", "emb_src")
    (0 until nFiles).foreach { i =>
      val tmp = dir.resolve(s"_split_$i")
      emb.filter(pmod(col("id"), lit(nFiles)) === i)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.toFile.listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"emb split $i produced no parquet part file"))
      java.nio.file.Files.move(part.toPath,
        dir.resolve(if (i == 0) "embeddings.parquet" else s"embeddings.parquet$i"))
      locally {
        import scala.reflect.io.Directory
        new Directory(tmp.toFile).deleteRecursively(): Unit
      }
    }
    dir.toString
  }

  /** Stage a request table (query_id, query_text) as `nFiles` parquet
    * files (query_id mod nFiles) — the arriving-queries side of online
    * serving, same staging mechanics as the ingest streams.
    */
  def stagedRequestSplits(reqs: DataFrame, nFiles: Int): String = {
    val dir = graft.ScratchDirs.fresh("graft_stream", "req_src")
    stageRequestSplitsInto(dir.toString, reqs, nFiles, startAt = 0)
    dir.toString
  }

  /** Stage `nFiles` more request splits into an EXISTING staged dir,
    * numbered from `startAt` — how a test (or producer) extends a served
    * request stream so a resumed `hybridServe` on the same checkpoint
    * picks up only the new files as its next micro-batches. File names
    * sort after the earlier round's (`requests.parquet` <
    * `requests.parquetK`), and each split lands as one sequential write,
    * so batch order stays deterministic.
    */
  def stageRequestSplitsInto(dirPath: String, reqs: DataFrame, nFiles: Int,
                             startAt: Int): Unit = {
    val dir = java.nio.file.Paths.get(dirPath)
    (0 until nFiles).foreach { i =>
      val tmp = dir.resolve(s"_split_${startAt + i}")
      reqs.filter(pmod(col("query_id"), lit(nFiles)) === i)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.toFile.listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"request split $i produced no parquet part file"))
      java.nio.file.Files.move(part.toPath,
        dir.resolve(if (startAt + i == 0) "requests.parquet"
        else s"requests.parquet${startAt + i}"))
      locally {
        import scala.reflect.io.Directory
        new Directory(tmp.toFile).deleteRecursively(): Unit
      }
    }
  }

  /** ONLINE hybrid serving: a micro-batched request stream (query_id =
    * stored probe vector id, query_text) served from the persisted
    * text + vector indexes — each micro-batch goes through the SAME
    * batch serving path a synchronous caller uses
    * (Search.hybridBatchSearchPrebuilt: IN-list bucket pruning, forward
    * point fetch, DPP'd lists, per-query RRF top-k), results appended to
    * a parquet sink. Per-query results are independent of batching (each
    * query joins only its own terms / probe), so the union over
    * micro-batches equals one big batch call — the replay-invariance
    * contract the ingest streams pin, here on the QUERY side. A
    * micro-batch larger than `bulkThreshold` routes to the bulk JOIN
    * plan instead (Search.hybridBulkSearchPrebuilt), so the driver-side
    * collect is bounded by the threshold, never by whatever a producer
    * staged.
    *
    * foreachBatch is at-least-once, so each micro-batch writes to a
    * batchId-keyed subdirectory in OVERWRITE mode: a retried batch
    * replaces its own previous (possibly partial) output instead of
    * double-appending — the sink stays equal to the one-shot batch call
    * under replay, which is exactly the invariance stream_hybrid_serving
    * pins.
    */
  /** Serving-SINK compaction (the last store without a file-count bound):
    * every micro-batch appends one `batch_id=N` subdirectory of small
    * parquet files, so a year of unattended serving is ~9k directories —
    * the same growth the index compaction policies bound for the two
    * serving stores, here on the results log. With `maxSinkDirs` set,
    * each batch is followed by a directory count; past the threshold the
    * COMMITTED batch dirs (everything except the current batch's, which
    * is the only one foreachBatch can replay-overwrite) merge into one
    * `compacted_<batchId>` generation — see [[compactServingSink]] for
    * the two-tier absorption that keeps the rewrite cost proportional to
    * the NEW batches, not the accumulated log. The rewrite is
    * results-invisible: the union read bin-packs the small files and
    * writes few large ones.
    *
    * Crash safety, same discipline as the index swaps (staged + marker +
    * recover-at-entry): the staged union is written under an
    * underscore-prefixed name (invisible to parquet readers), THEN a
    * marker naming the target and every absorbed dir is created, THEN the
    * absorbed dirs delete and the staging renames into place, THEN the
    * marker deletes. A crash at any point recovers at the next
    * compaction-capable stream start or batch: marker present → staging
    * is authoritative (it was complete before the marker existed), so
    * recovery deletes the listed dirs, lands the staging at the named
    * target if not already landed, and clears the marker; marker absent →
    * any stale staging is an incomplete write whose rows are all still
    * live, deleted outright. Readers see a transient under-return between
    * the deletes and the rename (the documented maintenance transient the
    * vector index shares), never a duplicate.
    */
  private[graft] def recoverSinkCompaction(s: SparkSession, outPath: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(outPath)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    // per-sink single-writer lease (ADVICE r13): a restart racing a
    // still-live predecessor on the same outPath must not "recover" the
    // live writer's in-progress staging/marker out from under it. Held
    // lease = a live compactor owns the swap protocol right now — skip,
    // its own recover-at-entry (or the stale-lease expiry if it crashed)
    // heals the sink instead.
    graft.operators.MaintenanceLease
      .tryWithDirLease(s, root, "sink-recovery") {
        recoverSinkLocked(s, root, fs)
      }.getOrElse(
        System.err.println(s"[graft] sink recovery at $outPath skipped " +
          "(lease held by a live sink writer)"))
  }

  /** Full sink recovery under a held lease: first the swap-level protocol
    * (a crashed compaction/forget SWAP — staging + absorbed-marker), then
    * the forget-level one (a forget crashed BETWEEN its two swaps — the
    * erasure marker + persisted id list let recovery finish the purge
    * instead of leaving it silently partial; VERDICT r14 "what's wrong"
    * #3). Order matters: the in-flight swap must land before the forget
    * re-runs over the healed directory layout.
    */
  private def recoverSinkLocked(
      s: SparkSession, root: org.apache.hadoop.fs.Path,
      fs: org.apache.hadoop.fs.FileSystem): Unit = {
    recoverSinkCompactionLocked(s, root, fs)
    recoverSinkForgetLocked(s, root, fs)
  }

  private def recoverSinkCompactionLocked(
      s: SparkSession, root: org.apache.hadoop.fs.Path,
      fs: org.apache.hadoop.fs.FileSystem): Unit = {
    val marker = new org.apache.hadoop.fs.Path(root, "_sink_absorbed")
    val staging = new org.apache.hadoop.fs.Path(root, "_sink_staging")
    // a .tmp marker is an INCOMPLETE write (the real marker lands by
    // atomic rename): the crashed compaction never reached its
    // destructive phase, so every row is still live in the source dirs —
    // drop the debris. Without the rename protocol a partially-written
    // marker would mislead recovery into deleting only the parsed subset
    // of absorbed dirs and landing the staging beside the rest:
    // duplicates (AUDIT_r13 #16).
    fs.delete(new org.apache.hadoop.fs.Path(root, "_sink_absorbed.tmp"),
      false)
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val lines = new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
        .split("\n").map(_.trim).filter(_.nonEmpty).toSeq
      in.close()
      val target = lines.head.stripPrefix("target=")
      System.err.println(s"[graft] completing crashed sink compaction at " +
        s"$root (target $target)")
      val targetPath = new org.apache.hadoop.fs.Path(root, target)
      // the staging's existence decides HOW FAR the crashed swap got —
      // critical when the target's name is also in the absorbed list (a
      // swap absorbing a same-named prior generation, the tier-0
      // collision form, or an in-place purge): post-rename, the dir at
      // the target name is the RESULT, and deleting every listed dir
      // unconditionally would destroy it (AUDIT_r14 #14)
      if (fs.exists(staging)) {
        // rename not reached: every listed dir is still the absorbed
        // SOURCE (a same-named one is the old generation) — delete them
        // all, then land the staging
        lines.tail.foreach(d =>
          fs.delete(new org.apache.hadoop.fs.Path(root, d), true): Unit)
        if (!fs.rename(staging, targetPath))
          sys.error(s"sink compaction recovery rename failed for $target")
      } else
        // staging gone = the rename happened (it was complete before the
        // marker existed, so only the rename can have consumed it): the
        // swap is done — clear any absorbed leftovers EXCEPT the landed
        // target, then the marker
        lines.tail.filter(_ != target).foreach(d =>
          fs.delete(new org.apache.hadoop.fs.Path(root, d), true): Unit)
      fs.delete(marker, false): Unit
    } else
      // no marker: an incomplete staged write whose rows are all still
      // live in the source dirs — drop it
      fs.delete(staging, true): Unit
  }

  /** TIERED absorption (VERDICT r13 "what's wrong" #2): a single-tier
    * policy that absorbs prior `compacted_*` output along with the batch
    * dirs re-reads and re-writes the ENTIRE accumulated log every cycle —
    * over a long-lived serve that is O(cycles × total-log-size) write
    * amplification, quadratic in sink lifetime. Two tiers instead:
    * each over-threshold cycle absorbs only `batch_id=*` dirs into a new
    * `compacted_<batchId>` generation (cost = the new batches, never the
    * history), and the generations themselves merge only when THEIR count
    * crosses the same threshold — once per ~maxDirs generations, i.e.
    * ~maxDirs² batches. Dir count stays bounded at ~2×maxDirs; a byte of
    * old data is rewritten once per generation merge, not once per cycle.
    * At most one tier swaps per call so the crash protocol stays
    * one-marker-per-swap.
    */
  private[graft] def compactServingSink(s: SparkSession, outPath: String,
                                        maxDirs: Int,
                                        currentBatchId: Long,
                                        excludeBatch: Option[String] = None)
      : Boolean = {
    val root = new org.apache.hadoop.fs.Path(outPath)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return false
    // the whole cycle (recovery + absorb decision + staged swap) runs
    // under the per-sink lease (ADVICE r13): two compactors on one
    // outPath would interleave the shared _sink_staging/_sink_absorbed
    // paths, deleting each other's staged union or absorbing a dir the
    // other is mid-swap on. Contention throws LeaseHeldException — the
    // in-stream call site treats it as skip-and-retry-next-batch
    // (policyOp), same as the index stores' policies.
    graft.operators.MaintenanceLease.withDirLease(s, root, "sink-compact") {
      recoverSinkLocked(s, root, fs)
      val dirs = fs.listStatus(root).toSeq.filter(_.isDirectory)
        .map(_.getPath)
      val batchDirs = dirs.filter(_.getName.startsWith("batch_id="))
      val generations = dirs.filter(_.getName.startsWith("compacted_"))
      if (generations.size > maxDirs)
        // tier 1: merge the generations (rare — every ~maxDirs²
        // batches). The `g` suffix keeps the target distinct from a
        // tier-0 `compacted_<id>` landed at the same batchId.
        swapServingSink(s, root, fs, generations,
          s"compacted_${currentBatchId}g")
      else if (batchDirs.size > maxDirs) {
        // tier 0: absorb only the batch dirs — prior generations are
        // not re-read. Never absorb the CURRENT batch's dir (in-stream:
        // the one a replayed batch overwrites; standalone: the newest
        // batch dir, same replay exposure if a crashed serve resumes) —
        // absorbing it would double its rows on replay.
        val keepBatch = excludeBatch.getOrElse(s"batch_id=$currentBatchId")
        val target = s"compacted_$currentBatchId"
        // a serve restarted on a FRESH checkpoint replays batchIds from
        // 0, so the target name can collide with a generation an earlier
        // run landed (AUDIT_r14): renaming onto it would fail AFTER the
        // absorbed batch dirs deleted, and recovery would then drop the
        // staged union as "already landed" — data loss. Absorbing the
        // same-named generation frees the name and keeps its rows (the
        // single-tier code got this for free by absorbing everything).
        val absorb = batchDirs.filter(_.getName != keepBatch) ++
          generations.filter(_.getName == target)
        if (absorb.size < 2) false
        else swapServingSink(s, root, fs, absorb, target)
      } else false
    }
  }

  /** The as-of batch id a STANDALONE maintenance op derives from the
    * sink's own layout: the highest id any result dir carries (a batch
    * dir contributes its batch id, a generation its absorbed max). None
    * when the sink holds no id-carrying dir (empty, or only a legacy
    * unknown-age generation) — the caller must no-op rather than guess.
    */
  private def sinkMaxId(fs: org.apache.hadoop.fs.FileSystem,
                        root: org.apache.hadoop.fs.Path): Option[Long] =
    fs.listStatus(root).toSeq.filter(_.isDirectory)
      .flatMap(d => sinkDirId(d.getPath.getName)).maxOption

  /** STANDALONE sink compaction — the same tiered cycle the in-stream
    * policy runs per batch (`hserve --sink-max-dirs`), callable against
    * a STOPPED serve's results log (CLI `scompact`), so bounding an idle
    * sink's dir count no longer requires starting a serve. The as-of id
    * for the generation name comes from the layout itself (its highest
    * carried id — naming lower would break the retention invariant "a
    * generation holds only batches <= its name" if a higher-id dir were
    * absorbed); the NEWEST batch dir is excluded from absorption by its
    * own name, preserving the replay-overwrite safety a resumed serve
    * relies on even though the documented contract (like `forget
    * --sink`) is serve-stopped. Runs full recovery first under the sink
    * lease, so it also heals crashed-swap debris and completes a crashed
    * forget. No-ops (false) when no dir carries an id.
    */
  def compactServingSinkNow(s: SparkSession, outPath: String,
                            maxDirs: Int): Boolean = {
    val root = new org.apache.hadoop.fs.Path(outPath)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return false
    sinkMaxId(fs, root) match {
      case None =>
        // nothing to name a generation by, but the heal-crash-debris
        // half of the contract still applies
        recoverSinkCompaction(s, outPath)
        false
      case Some(asOf) =>
        val newestBatch = fs.listStatus(root).toSeq.filter(_.isDirectory)
          .map(_.getPath.getName).filter(_.startsWith("batch_id="))
          .maxByOption(n => sinkDirId(n).getOrElse(-1L))
        compactServingSink(s, outPath, maxDirs, asOf,
          excludeBatch = newestBatch.orElse(Some("")))
    }
  }

  /** STANDALONE sink retention — the in-stream age bound (`hserve
    * --sink-retain`) callable against a stopped serve's log (CLI
    * `sretain`): drops every result dir whose carried id is at or below
    * (highest id in the layout) − retainBatches. Ages are relative to
    * the newest data the log holds, so an idle sink can be bounded
    * without serving a batch. No-ops (0) when no dir carries an id —
    * unknown age is never guessed at, same as the per-dir rule.
    */
  def retainServingSinkNow(s: SparkSession, outPath: String,
                           retainBatches: Int): Int = {
    val root = new org.apache.hadoop.fs.Path(outPath)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0
    sinkMaxId(fs, root) match {
      case None => 0
      case Some(asOf) => retainServingSink(s, outPath, retainBatches, asOf)
    }
  }

  /** Right-to-be-forgotten for the serving RESULTS log (the last place a
    * purged document survives): `forget` on the CLI deletes a document
    * from both serving stores, but every result row the sink accumulated
    * still names it — doc_id, title snippet, ranks. This op rewrites the
    * sink without those rows, completing the erasure path end-to-end.
    * Reference anchor: the deletion half of the index lifecycle
    * (`/root/reference/app/app.py` keyspace teardown re-creates tables;
    * here deletion is a first-class operator on every store, and the
    * results log is a store).
    *
    * Mechanics: the whole log necessarily rewrites (erasure must touch
    * every byte), as ONE staged swap of everything except the
    * highest-numbered batch dir into a purged generation named by the
    * HIGHEST ABSORBED id (`compacted_<maxAbsorbedId>` — the purged union
    * holds only batches at or below that id, so the retention invariant
    * "a generation holds only batches <= N" is preserved exactly and the
    * generation stays AGEABLE; the r14 `compacted_forget` name made the
    * entire pre-forget log retention-immune forever when compaction was
    * off — VERDICT r14 "what's wrong" #1), plus an in-place purge swap of
    * the last batch dir — kept under its own name because it is the one
    * dir a resumed stream can replay-overwrite; folding it into the
    * generation would DUPLICATE its rows when the replay lands. Both
    * swaps run the marker protocol under the sink lease, so a crash at
    * any point recovers.
    *
    * Crash completeness (VERDICT r14 "what's wrong" #3): the two swaps
    * are not one atomic unit, and a crash between them would leave the
    * forgotten ids alive in the newest batch dir with no swap debris for
    * the generic recovery to complete. So the op is bracketed by its own
    * ERASURE marker: the forget set persists to `_sink_forget_ids`
    * (underscore-prefixed = invisible to readers), then
    * `_sink_forget_pending` lands by atomic rename, then the swaps run,
    * then marker and id list clear. Any crash leaves the marker + the id
    * list, `sstats` reports `forget_pending=true`, and the next
    * forget/serve/compaction on the sink COMPLETES the erasure from the
    * persisted ids ([[recoverSinkForgetLocked]]) — never silently
    * half-erased.
    *
    * Operator contract: purge the INDEXES first (the CLI `forget
    * --sink=` orders this), so a serve resumed mid-purge can only
    * re-serve from stores that no longer contain the forgotten ids —
    * nothing can re-introduce them into the sink afterwards. The serve
    * must be STOPPED for the duration, not merely resumable (ADVICE
    * r14): per-batch result writes take no lease, so a CONCURRENT serve
    * could overwrite the just-purged newest batch dir from an in-flight
    * batch that read the indexes pre-purge, landing forgotten ids after
    * this returns.
    *
    * @param ids one `doc_id` column; rows whose doc_id matches are erased
    */
  def forgetFromServingSink(s: SparkSession, outPath: String,
                            ids: DataFrame): Unit = {
    val root = new org.apache.hadoop.fs.Path(outPath)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    graft.operators.MaintenanceLease.withDirLease(s, root, "sink-forget") {
      // heal swap debris AND complete any PRIOR crashed forget (its
      // persisted id list is a different erasure request — it must land
      // in full before this one replaces the list)
      recoverSinkLocked(s, root, fs)
      // forget's "highest batch dir = the replay-overwritable dir"
      // premise holds within ONE serve lineage; warn when the sink has
      // seen more (AUDIT_r15 #9 — the op still runs: the erasure itself
      // purges every dir regardless of id order)
      locally {
        val lineages = countSinkLineages(fs, root)
        if (lineages > 1)
          System.err.println(s"[graft] WARNING: sink $outPath holds " +
            s"results from $lineages serve lineages — batch ids may " +
            "have regressed; if a crashed serve from an older lineage " +
            "is resumed after this forget, its replayed batch can " +
            "rewrite a dir this op absorbed (run forget again after " +
            "any such resume)")
      }
      val idsDir = new org.apache.hadoop.fs.Path(root, "_sink_forget_ids")
      ids.select(col("doc_id")).write.mode("overwrite")
        .parquet(idsDir.toString)
      // the marker gates "an erasure is owed": written AFTER the id list
      // is durable (so a present marker always has a complete list to
      // resume from) by the same tmp+rename discipline as the swap marker
      val marker =
        new org.apache.hadoop.fs.Path(root, "_sink_forget_pending")
      val markerTmp =
        new org.apache.hadoop.fs.Path(root, "_sink_forget_pending.tmp")
      val out = fs.create(markerTmp, true)
      out.write("ids=_sink_forget_ids\n".getBytes("UTF-8"))
      out.close()
      if (!fs.rename(markerTmp, marker))
        sys.error("sink forget marker rename failed")
      forgetLocked(s, root, fs)
    }
  }

  /** The forget body, from a durable `_sink_forget_ids` +
    * `_sink_forget_pending` pair to a fully purged log with both cleared.
    * Caller holds the sink lease. Idempotent — recovery re-runs it
    * verbatim from whatever point the crash left.
    */
  private def forgetLocked(s: SparkSession,
                           root: org.apache.hadoop.fs.Path,
                           fs: org.apache.hadoop.fs.FileSystem): Unit = {
    val idsDir = new org.apache.hadoop.fs.Path(root, "_sink_forget_ids")
    val forgetIds = s.read.parquet(idsDir.toString).select(col("doc_id"))
    // left_anti keys the purge; broadcast is safe (a forget set is an
    // operator-supplied id list, not data-scale) but NOT forced — a
    // genuinely huge erasure list shuffles like any other join
    val purge = (df: DataFrame) =>
      df.join(forgetIds, df("doc_id") === forgetIds("doc_id"), "left_anti")
    val dirs = fs.listStatus(root).toSeq.filter(d => d.isDirectory &&
      (d.getPath.getName.startsWith("batch_id=") ||
        d.getPath.getName.startsWith("compacted_"))).map(_.getPath)
    val lastBatch = dirs.filter(_.getName.startsWith("batch_id="))
      .sortBy(_.getName.stripPrefix("batch_id=").toLongOption
        .getOrElse(-1L)).lastOption
    val bulk = dirs.filterNot(lastBatch.contains)
    if (bulk.nonEmpty) {
      // ageable target name: max id over the absorbed dirs (a tier-1
      // `compacted_Ng` contributes N). A same-named survivor is the
      // self-absorbed-target form the swap protocol already handles. The
      // non-numeric fallback is unreachable for sinks this code wrote
      // (every dir it produces carries an id) — it only preserves the
      // conservative never-aged name for a legacy r14 `compacted_forget`
      // that is the sole absorbable dir.
      val target = bulk.flatMap(p => sinkDirId(p.getName)).maxOption
        .map(i => s"compacted_$i").getOrElse("compacted_forget")
      swapServingSink(s, root, fs, bulk, target, purge): Unit
    }
    lastBatch.foreach(p =>
      swapServingSink(s, root, fs, Seq(p), p.getName, purge): Unit)
    fs.delete(new org.apache.hadoop.fs.Path(root, "_sink_forget_pending"),
      false)
    fs.delete(idsDir, true): Unit
  }

  /** Forget-level recovery: a present `_sink_forget_pending` means an
    * erasure was requested, its id list is durable, and the op did not
    * reach its end — re-run it to completion (idempotent; the purge of
    * already-purged dirs removes nothing further). A `.tmp` marker or an
    * id list WITHOUT the marker is a forget that never entered its
    * destructive phase (nothing is owed — the caller saw a failure) —
    * drop the debris.
    */
  private def recoverSinkForgetLocked(
      s: SparkSession, root: org.apache.hadoop.fs.Path,
      fs: org.apache.hadoop.fs.FileSystem): Unit = {
    val marker = new org.apache.hadoop.fs.Path(root, "_sink_forget_pending")
    fs.delete(
      new org.apache.hadoop.fs.Path(root, "_sink_forget_pending.tmp"), false)
    if (fs.exists(marker)) {
      System.err.println(s"[graft] completing crashed sink forget at " +
        s"$root from its persisted id list")
      forgetLocked(s, root, fs)
    } else
      fs.delete(
        new org.apache.hadoop.fs.Path(root, "_sink_forget_ids"), true): Unit
  }

  /** RETENTION for the serving-results log (default OFF) — the third leg
    * of sink maintenance after compaction (bound the dir count) and
    * forget (erasure): bound the log's LIFETIME. A year of unattended
    * serving otherwise retains every result ever produced; with
    * `retainBatches` set, each batch drops result dirs whose id is at or
    * below `currentBatchId - retainBatches`.
    *
    * Dir age comes from the id its name carries: `batch_id=K` is batch
    * K; a generation `compacted_N`/`compacted_Ng` holds only batches
    * <= N (tier-0 absorbs dirs older than its landing batch, tier-1
    * merges such generations, and a forget's purged generation is named
    * by its highest absorbed id — every producer preserves the
    * invariant), so dropping it at N <= cutoff never over-deletes — a
    * generation survives until its NEWEST absorbed batch ages out
    * (retention lags for absorbed data, never the other direction). A
    * dir whose name carries no numeric id is never dropped: unknown age
    * is treated as young, retention never guesses.
    * Deletion needs no staging protocol — it is idempotent
    * and a crash mid-pass is just an earlier retry state — but runs
    * under the sink lease so it cannot interleave a live compaction's
    * swap (deleting a dir the marker lists mid-swap would make recovery
    * double-count its absence as completed work).
    *
    * @return the number of dirs dropped
    */
  private[graft] def retainServingSink(s: SparkSession, outPath: String,
                                       retainBatches: Int,
                                       currentBatchId: Long): Int = {
    require(retainBatches >= 1, s"retainBatches must be >= 1 ($retainBatches)")
    val root = new org.apache.hadoop.fs.Path(outPath)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0
    val cutoff = currentBatchId - retainBatches
    graft.operators.MaintenanceLease.withDirLease(s, root, "sink-retention") {
      val drop = fs.listStatus(root).toSeq.filter(_.isDirectory)
        .map(_.getPath)
        .filter(p => sinkDirId(p.getName).exists(_ <= cutoff))
      drop.foreach(p => fs.delete(p, true): Unit)
      if (drop.nonEmpty)
        System.err.println(s"[graft] sink retention at $outPath dropped " +
          s"${drop.size} result dir(s) at or below batch $cutoff")
      drop.size
    }
  }

  /** Register the serving LINEAGE writing this sink and return how many
    * distinct lineages have ever written it. A lineage is a checkpoint:
    * batch ids are monotone within one and RESTART AT ZERO under a fresh
    * one, which silently breaks the age/replay premises the sink's
    * maintenance ops rest on (forget's "highest batch dir = the
    * replay-overwritable dir", retention's "higher id = younger" —
    * the carried accepted-risk of AUDIT_r15 #9/#14). This does not
    * detect or prevent the regression — it makes the precondition's
    * violation VISIBLE: `sstats` reports `lineages`, serve start and
    * `forget --sink` warn when it exceeds one, and the operator contract
    * (one stable checkpoint per sink) becomes checkable instead of
    * implicit. One create-if-absent marker file per lineage
    * (`_sink_lineage_<hash>` — underscore-hidden from readers): no
    * rewrite, no crash window, idempotent re-registration.
    */
  private[graft] def registerSinkLineage(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, checkpoint: String): Int = {
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(checkpoint.getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString
    val marker = new org.apache.hadoop.fs.Path(root, s"_sink_lineage_$digest")
    if (!fs.exists(marker)) {
      val out = fs.create(marker, false)
      out.write((checkpoint + "\n").getBytes("UTF-8"))
      out.close()
    }
    countSinkLineages(fs, root)
  }

  private def countSinkLineages(fs: org.apache.hadoop.fs.FileSystem,
                                root: org.apache.hadoop.fs.Path): Int =
    if (!fs.exists(root)) 0
    else fs.listStatus(root).count(st =>
      !st.isDirectory && st.getPath.getName.startsWith("_sink_lineage_"))

  /** Numeric age a sink dir's name carries: `batch_id=K` is batch K; a
    * generation `compacted_N`/`compacted_Ng` holds only batches <= N.
    * None for any other name — unknown age, which retention treats as
    * young.
    */
  private def sinkDirId(name: String): Option[Long] =
    if (name.startsWith("batch_id="))
      name.stripPrefix("batch_id=").toLongOption
    else if (name.startsWith("compacted_"))
      name.stripPrefix("compacted_").stripSuffix("g").toLongOption
    else None

  /** One-row describe of a serving-results sink — the observability the
    * other two stores get from `stats`/`vstats` (CLI `sstats`): how many
    * batch dirs and generations the log holds (the compaction policy's
    * own trigger quantities), total result rows, total bytes, whether
    * crash debris (marker/staging) is present, whether an erasure is
    * OWED (`forget_pending` — a forget crashed between its swaps; the
    * next forget/serve/compaction on the sink completes it), and how
    * many serve LINEAGES have written it (`lineages` — more than one
    * means batch ids may have regressed and the maintenance ops' age
    * premises are no longer guaranteed; see [[registerSinkLineage]]).
    * Read-only; takes no lease (a mid-swap read sees the documented
    * maintenance transient, same as any other reader).
    */
  def describeServingSink(s: SparkSession, outPath: String): DataFrame = {
    import s.implicits._
    val root = new org.apache.hadoop.fs.Path(outPath)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    val (nBatch, nGen, bytes, debris, fgtPending, lineages) =
      if (!fs.exists(root)) (0L, 0L, 0L, false, false, 0L)
      else {
        val st = fs.listStatus(root).toSeq
        val dirs = st.filter(_.isDirectory).map(_.getPath.getName)
        val resultDirs = st.filter(d => d.isDirectory &&
          (d.getPath.getName.startsWith("batch_id=") ||
            d.getPath.getName.startsWith("compacted_")))
        (dirs.count(_.startsWith("batch_id=")).toLong,
          dirs.count(_.startsWith("compacted_")).toLong,
          resultDirs.map(d => fs.getContentSummary(d.getPath).getLength).sum,
          fs.exists(new org.apache.hadoop.fs.Path(root, "_sink_absorbed")) ||
            fs.exists(new org.apache.hadoop.fs.Path(root, "_sink_staging")),
          fs.exists(
            new org.apache.hadoop.fs.Path(root, "_sink_forget_pending")),
          countSinkLineages(fs, root).toLong)
      }
    val rows =
      if (nBatch + nGen == 0) 0L
      else s.read.option("recursiveFileLookup", "true")
        .parquet(outPath).count()
    Seq((nBatch, nGen, rows, bytes, debris, fgtPending, lineages))
      .toDF("batch_dirs", "generations", "rows", "bytes", "crash_debris",
        "forget_pending", "lineages")
  }

  /** One staged swap: union `absorb` (through `transform` — identity for
    * compaction, an anti-join for forget) into `_sink_staging`, marker,
    * delete absorbed, rename staging to `target` — the crash protocol
    * [[recoverSinkCompaction]] completes. Caller holds the sink lease.
    * The target name MAY be in the absorb set (same-named prior
    * generation, or an in-place purge): the staging write happens before
    * the marker, and recovery distinguishes pre- from post-rename by the
    * staging's existence, so the same-named source deletes as a source
    * and the landed result is never mistaken for one.
    */
  private def swapServingSink(s: SparkSession,
                              root: org.apache.hadoop.fs.Path,
                              fs: org.apache.hadoop.fs.FileSystem,
                              absorb: Seq[org.apache.hadoop.fs.Path],
                              target: String,
                              transform: DataFrame => DataFrame =
                                identity): Boolean = {
    val staging = new org.apache.hadoop.fs.Path(root, "_sink_staging")
    fs.delete(staging, true)
    // recursiveFileLookup disables partition inference — without it the
    // batch_id=K path components would be inferred as a partition column
    // and conflict with the compacted_M dirs' non-kv names
    transform(s.read.option("recursiveFileLookup", "true")
      .parquet(absorb.map(_.toString): _*))
      .write.mode("overwrite").parquet(staging.toString)
    // the marker gates the destructive phase, so it must be all-or-
    // nothing: write to a .tmp and RENAME into place (atomic on local
    // and HDFS) — recovery treats a .tmp as never-started
    val marker = new org.apache.hadoop.fs.Path(root, "_sink_absorbed")
    val markerTmp = new org.apache.hadoop.fs.Path(root, "_sink_absorbed.tmp")
    val out = fs.create(markerTmp, true)
    out.write((s"target=$target\n" + absorb.map(_.getName).mkString("\n"))
      .getBytes("UTF-8"))
    out.close()
    if (!fs.rename(markerTmp, marker))
      sys.error("sink compaction marker rename failed")
    absorb.foreach(p => fs.delete(p, true): Unit)
    if (!fs.rename(staging, new org.apache.hadoop.fs.Path(root, target)))
      sys.error(s"sink compaction rename failed for $target")
    fs.delete(marker, false)
    true
  }

  /** @param checkpointDir STABLE checkpoint for a resumable serving
    *   stream: a restart answers only requests the source has not yet
    *   seen. No applied-marker is needed here — the batch_id-keyed
    *   overwrite sink is already idempotent under replay.
    * @param maxSinkDirs bound on the sink's result-directory count (the
    *   file-growth policy for the serving log — see
    *   [[compactServingSink]]); None = off, the pre-r13 layout
    * @param retainBatches bound on the sink's LIFETIME: each batch drops
    *   result dirs at or below `batchId - retainBatches` — see
    *   [[retainServingSink]]; None = off, results are kept forever
    * @param bulkThreshold micro-batches above this many requests serve
    *   through the bulk JOIN plan instead of the literal-pruned batch
    *   plan (VERDICT r12 "what's missing" #1): a micro-batch is "whatever
    *   a producer staged", not a bounded constant, so an oversized
    *   request file must not become a driver-scale collect plus a
    *   thousands-of-literals IN-list — the same auto-route the CLI
    *   `hbatch` applies, decided per micro-batch by a LIMIT-bounded
    *   count probe. Both plans return row-identical results (CliSpec
    *   pins the twin equality), so routing never changes what a caller
    *   is served.
    */
  def hybridServe(s: SparkSession, stagedDir: String, textPrefix: String,
                  vecPrefix: String, outPath: String, k: Int = 10,
                  checkpointDir: Option[String] = None,
                  bulkThreshold: Long =
                    graft.operators.Search.BulkRequestThreshold,
                  maxSinkDirs: Option[Int] = None,
                  retainBatches: Option[Int] = None): Unit = {
    // a negative threshold would make the probe limit(0) and silently
    // DROP every request; clamp the probe at Int range for huge values
    // (AUDIT_r13 #3)
    require(bulkThreshold >= 0, s"bulkThreshold must be >= 0 ($bulkThreshold)")
    val probeLimit = math.min(bulkThreshold, Int.MaxValue - 1L).toInt + 1
    val ckpt = checkpointDir.getOrElse(
      graft.ScratchDirs.fresh("graft_stream", "hserve_ckpt").toString)
    // a restarted serving stream heals crashed-compaction debris before
    // answering anything (readers would under-return from a mid-swap
    // sink). UNCONDITIONALLY (VERDICT r13 "what's missing" #1): the crash
    // may have happened under a --sink-max-dirs run and the restart
    // without it — gating recovery on the flag would strand the absorbed
    // rows in the hidden staging dir indefinitely. A no-op when no
    // marker/staging exists. And BEFORE the shuffle-partitions pin
    // (VERDICT r13 "what's wrong" #1): recovery is real filesystem work
    // that can fail — a failure here must abort the serve with the
    // caller's session conf UNTOUCHED, not leave it pinned 4-wide.
    recoverSinkCompaction(s, outPath)
    // make a violated single-lineage precondition VISIBLE before any
    // batch lands: a fresh checkpoint over an old sink regresses batch
    // ids, silently breaking forget/retention age premises (AUDIT_r15
    // #9/#14 — contract-covered, now checkable via sstats `lineages`)
    locally {
      val sinkRoot = new org.apache.hadoop.fs.Path(outPath)
      val sinkFs =
        sinkRoot.getFileSystem(s.sparkContext.hadoopConfiguration)
      val lineages = registerSinkLineage(sinkFs, sinkRoot, ckpt)
      if (lineages > 1)
        System.err.println(s"[graft] WARNING: sink $outPath now holds " +
          s"results from $lineages serve lineages — batch ids may have " +
          "regressed; forget/retention age premises assume ONE stable " +
          "checkpoint per sink (sstats reports `lineages`)")
    }
    val schema = s.read.parquet(s"$stagedDir/requests.parquet").schema
    val src = s.readStream.schema(schema).option("basePath", stagedDir)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$stagedDir/requests.parquet*")
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val q = src.writeStream
        .outputMode(OutputMode.Append)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val reqDf = batch.select(
            col("query_id").cast("long").as("query_id"), col("query_text"))
          // LIMIT-bounded probe, never a full count: reads just enough of
          // the micro-batch to know which side of the threshold it is on
          val n = reqDf.limit(probeLimit).count()
          if (n > 0) {
            if (n > bulkThreshold) {
              System.err.println(s"[graft] serving micro-batch $batchId " +
                s"exceeds the literal-pruning sweet spot " +
                s"($bulkThreshold requests) — routing to the bulk join " +
                "plan (no driver collect, nothing request-derived " +
                "inlined as a literal)")
              // the stream pins shuffle.partitions low for micro-batch
              // serving; a bulk-routed oversized batch is a full
              // distributed job whose term/cent_id/query_id shuffles
              // should run at the session's own parallelism, exactly as
              // the same job does through `hbulk` — on a cluster, 4
              // reduce partitions would idle all but 4 slots. (In the
              // single-JVM probe container the width is a wash — CPU
              // saturates either way — SCALE_r13 §4.)
              s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
              try graft.operators.Search.hybridBulkSearchPrebuilt(
                  s, reqDf, textPrefix, vecPrefix, k)
                .write.mode("overwrite")
                .parquet(s"$outPath/batch_id=$batchId")
              finally s.conf.set("spark.sql.shuffle.partitions", "4")
            } else {
              // below the threshold the literal IN-lists ARE the index
              // pruning, and this collect is bounded by the threshold
              val reqs = reqDf.collect()
                .map(r => (r.getLong(0), r.getString(1))).toSeq
              graft.operators.Search.hybridBatchSearchPrebuilt(
                  s, reqs, textPrefix, vecPrefix, k)
                .write.mode("overwrite")
                .parquet(s"$outPath/batch_id=$batchId")
            }
          }
          // the sink's maintenance policies, AFTER this batch's results
          // are durable. Retention first (dropping aged dirs shrinks what
          // compaction would absorb), then the file-growth bound; both
          // treat lease contention (another writer on the same sink) as
          // skip-and-retry-next-batch — the index policies' semantics.
          retainBatches.foreach(r => policyOp("sink retention") {
            retainServingSink(s, outPath, r, batchId): Unit
          })
          maxSinkDirs.foreach(t => policyOp("sink compaction") {
            compactServingSink(s, outPath, t, batchId): Unit
          })
        }
        .start()
      q.awaitTermination()
    } finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
  }

  /** Live index ingestion: stream a staged corpus directory one file per
    * micro-batch, appending each batch into the persisted bucketed index
    * via the SAME appendBucketedIndex the batch lifecycle uses — the
    * streaming half of the reference's "index once, grow forever" pattern
    * (app/index.sh re-runs into the same Cassandra tables; here the
    * arriving stream grows the same tables a concurrent searcher reads).
    *
    * `maxFilesPerUnit` wires the MAINTENANCE POLICY into the stream: every
    * append adds one file per touched bucket, so an unattended ingest
    * grows file counts without bound (a year of hourly batches is ~9k
    * files per bucket — the reference gets this for free from Cassandra's
    * automatic compaction, app/app.py:42-67). With the threshold set, each
    * micro-batch is followed by a compaction CHECK (one directory listing;
    * compactBucketedIndex no-ops under threshold), so files-per-bucket
    * stays bounded for the stream's whole life and a concurrent searcher
    * keeps reading correct results — compaction is results-invisible by
    * contract. Amortized cost: the rewrite only triggers every ~threshold
    * batches and touches only over-threshold buckets.
    */
  def ingestAppend(s: SparkSession, stagedDir: String, prefix: String,
                   maxFilesPerUnit: Option[Int] = None,
                   checkpointDir: Option[String] = None): IngestReport = {
    val ckpt = checkpointDir.getOrElse(
      graft.ScratchDirs.fresh("graft_stream", "ingest_ckpt").toString)
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    var replaySkips = 0
    try {
      val q = docsFileStream(s, stagedDir, oneFilePerBatch = true)
        .writeStream
        .outputMode(OutputMode.Append)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          if (!batch.isEmpty) {
            // marker scope = the append alone; the compaction policy runs
            // after the marker is durable, with lease contention as
            // skip-and-retry (VERDICT r12 #1 — same reorder as
            // vectorIngestAppend)
            if (!runAppliedOnce(s, ckpt, batchId, "index ingest") {
              graft.operators.Indexer.appendBucketedIndex(s,
                batch.select(col("doc_id"), col("text")), prefix)
            }) replaySkips += 1
            maxFilesPerUnit.foreach(t => policyOp("in-stream compaction") {
              graft.operators.Indexer.compactBucketedIndex(s, prefix, t): Unit
            })
          }
        }
        .start()
      q.awaitTermination()
    } finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    IngestReport(retrains = 0, replaySkips = replaySkips)
  }
}
