package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextHash, Tokenizer}

/** Exact-substring deduplication (Lee et al., "Deduplicating Training
  * Data Makes Language Models Better", ACL 2022): report every MAXIMAL
  * cross-document run of >= minLen tokens that repeats exactly — the one
  * canonical LLM-dedup method the shingle-granularity family
  * (dedup_spans / dedup_passages) approximates but cannot express, since
  * those dedup at fixed chunk boundaries while exact repeats start
  * anywhere and have any length.
  *
  * The paper builds a corpus-wide suffix array — inherently sequential
  * and memory-resident, the wrong shape for a 1000-executor cluster. The
  * shuffle-friendly equivalent: hash every minLen-token gram (positional
  * rolling window, the same 60-bit md5 polynomial the shingle family
  * uses), join gram occurrences on the hash, and extend adjacent matches
  * into maximal runs with a gaps-and-islands window along the alignment
  * diagonal (start_a - start_b is constant over a contiguous shared run).
  *
  * Equivalence: a maximal shared run of M >= minLen tokens contributes
  * exactly M - minLen + 1 shared grams at consecutive starts on ONE
  * diagonal, so the run recovers as gram_count + minLen - 1 with its
  * start at the island minimum; a diagonal gap breaks the island, so
  * nothing shorter or longer reports. Periodic text matching at several
  * alignments reports one maximal run PER diagonal (the per-alignment
  * view a span-remover consumes).
  *
  * Scale shape: the gram build is per-document narrow arithmetic (no
  * shuffle); the self-join is bounded by the corpus-derived stop-gram
  * cap max(floor, ceil(N/1000)) — the SCALE_r7 family rule: an absolute
  * cap inverts on dup-heavy corpora (df ~ dup factor), a fixed bucket
  * geometry goes quadratic — applied to total OCCURRENCES, which bounds
  * per-gram pair volume at cap^2 outright and treats heavy within-doc
  * repetition as the boilerplate it is. The islands window partitions by
  * (doc_a, doc_b, diagonal): bounded by the documents' own lengths,
  * never by the corpus. A capped boilerplate gram inside a longer true
  * run splits the reported run at the cap boundary — the price of
  * bounded join volume, same trade the paper's length-filtered output
  * makes.
  *
  * Gram hashes are 60-bit md5 polynomials; a cross-gram collision
  * (~2^-60 per candidate) could fuse a false match — the suffix array
  * has no false positives; at trillion-gram scale add a verify join
  * re-reading the token slices (the jaccard-verify idiom the MinHash
  * family uses).
  */
object ExactSubstrings {

  val DefaultMinLen = 8
  val DfFloor = 20

  /** Per-gram stats shape. Auto computes the flip from the corpus (one
    * partial-aggregating pass over the gram table); Window / Agg force a
    * shape — test and bench hooks for the row-identity pin.
    */
  sealed trait Shape
  case object Auto extends Shape
  case object WindowShape extends Shape
  case object AggShape extends Shape

  /** Window-shape buffer guard (the AUDIT_r9 trade-off, now computed):
    * per-gram stats as WINDOW aggregates buffer every occurrence of a
    * gram in one task before any filter can drop it — AQE cannot
    * skew-split a window partition, so a boilerplate gram with ~1e9
    * occurrences is a single-task OOM regardless of the stop-gram cap.
    * The aggregate-then-rejoin shape is immune (partial aggregation
    * collapses the heavy gram map-side, and capped grams never reach the
    * probe join) but pays a second scan of the gram build. Flip when the
    * heaviest gram's occurrence count exceeds `SkewFlipFactor`x the
    * stop-gram cap — the point where one window partition's buffer is an
    * order of magnitude past the volume the cap was sized to bound.
    * Division, not multiplication: `cap` may be Long.MaxValue (the
    * brute-force-parity override).
    */
  val SkewFlipFactor = 16L

  def windowShapeSafe(maxOcc: Long, cap: Long): Boolean =
    maxOcc / SkewFlipFactor <= cap

  /** Maximal cross-document exact token repeats of >= minLen tokens —
    * the pair-level DETAIL view. Output is quadratic in the corpus's
    * duplication factor by definition (every replica pair x every shared
    * run); at a 100x dup factor that list is the problem, not the answer
    * — production span removal consumes [[duplicatedSpans]], this
    * operator's production twin in `Queries.productionTwin`.
    *
    * @param docs (doc_id, text)
    * @param capOverride replaces the corpus-derived stop-gram cap —
    *   test hook (Long.MaxValue disables capping for brute-force parity)
    * @return (doc_id_a, doc_id_b, start_a, start_b, match_len), ids
    *   ordered a < b, starts 0-based token offsets, fully deterministic
    */
  /** (doc_id, pos, g): the minLen-token rolling gram at every 0-based
    * token start — per-document narrow arithmetic, no shuffle.
    */
  private def grams(docs: DataFrame, minLen: Int): DataFrame =
    docs
      .select(col("doc_id"),
        posexplode(TextHash.hashedShingles(
          transform(Tokenizer.tokenize(col("text")),
            t => TextHash.hashMod(t)), minLen)))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col").as("g"))

  /** (doc_id, pos, g) rows of grams that survive the cross-doc test and
    * the `cap` occurrence filter, in whichever stats shape the corpus
    * calls for. `cap` bounds what SURVIVES (Long.MaxValue = no cap, the
    * spans semantics); `flipAt` is the skew threshold the Auto decision
    * compares the heaviest gram against — the two differ exactly when the
    * output must keep boilerplate grams the window shape cannot afford to
    * buffer.
    */
  private def crossDocOccurrences(gr0: DataFrame, cap: Long, flipAt: Long,
                                  shape: Shape): DataFrame = {
    // Auto pays an extra pass over the gram build for the flip signal. The
    // probe runs UNCACHED: it is a count-only pass whose partial aggregation
    // collapses map-side, so recomputing the gram build for it is cheap —
    // while caching the FULL gram table (corpus-scale at the 100 TB target)
    // just to share that compute would cost more storage/eviction pressure
    // than the one rescan it saves.
    val gr = gr0
    def windowForm = {
      val wg = Window.partitionBy("g")
      gr.withColumn("occ", count(lit(1)).over(wg))
        .withColumn("d0", min("doc_id").over(wg))
        .withColumn("d1", max("doc_id").over(wg))
        .filter(col("occ") <= cap && col("d0") =!= col("d1"))
        .select("doc_id", "pos", "g")
    }
    def aggForm = {
      // partial aggregation collapses heavy grams map-side; capped grams
      // never reach the probe join, so no task ever buffers them
      val keep = gr.groupBy("g")
        .agg(count(lit(1)).as("occ"), min("doc_id").as("d0"),
          max("doc_id").as("d1"))
        .filter(col("occ") <= cap && col("d0") =!= col("d1"))
        .select("g")
      gr.join(keep, "g").select("doc_id", "pos", "g")
    }
    shape match {
      case WindowShape => windowForm
      case AggShape => aggForm
      case Auto =>
        // count-only payload, map-side combined: skew-safe by construction
        val maxOcc = gr.groupBy("g").count()
          .agg(max(col("count"))).head().get(0) match {
          case null => 0L
          case n: java.lang.Long => n.longValue()
        }
        if (windowShapeSafe(maxOcc, flipAt)) windowForm else aggForm
    }
  }

  def matches(docs: DataFrame, minLen: Int = DefaultMinLen,
              capOverride: Option[Long] = None,
              shape: Shape = Auto): DataFrame = {
    import graft.CacheRegistry.RegisteredCache
    val gr = grams(docs, minLen)
    val cap = capOverride.getOrElse(
      math.max(DfFloor.toLong, (docs.count() + 999L) / 1000L))
    // min<>max doc_id is the cheap cross-doc test (no count-distinct).
    // Default shape: WINDOW aggregates over the gram key — one shuffle of
    // the gram table and one scan of its build, where aggregate-then-
    // rejoin scans the tokenize+gram subtree twice (the partial-agg
    // exchange and the probe exchange carry different payloads, so
    // ReuseExchange cannot collapse them). Same idiom as Winnow.overlap's
    // df cap. The singleton majority dies here, before the pair join.
    // Above the computed skew flip ([[windowShapeSafe]]) the agg shape
    // takes over: heavy grams collapse map-side and die at the stats
    // filter, never reaching a single task's buffer.
    val occ = crossDocOccurrences(gr, cap, flipAt = cap, shape)
      // both pair sides read the filtered occurrence table — cache it,
      // or the whole chain above executes twice
      .registeredCache()
    val pairs = occ
      .select(col("g"), col("doc_id").as("doc_id_a"), col("pos").as("pa"))
      .join(occ.select(col("g"), col("doc_id").as("doc_id_b"),
        col("pos").as("pb")), "g")
      .filter(col("doc_id_a") < col("doc_id_b"))
      .withColumn("diag", col("pa") - col("pb"))
    val w = Window.partitionBy(col("doc_id_a"), col("doc_id_b"), col("diag"))
      .orderBy(col("pa"))
    pairs
      .withColumn("run", col("pa") - row_number().over(w))
      .groupBy("doc_id_a", "doc_id_b", "diag", "run")
      .agg(min("pa").as("start_a"), min("pb").as("start_b"),
        (count(lit(1)) + lit(minLen - 1).cast("long")).as("match_len"))
      .select(col("doc_id_a"), col("doc_id_b"), col("start_a"),
        col("start_b"), col("match_len"))
  }

  /** Per-document maximal DUPLICATED SPANS — the production twin of
    * [[matches]], and the object Lee et al. actually remove.
    *
    * The pair-level match list is quadratic in the duplication factor by
    * definition (every replica pair reports every shared run): on the
    * x100 probe's 100x-replicated corpus that is ~1.2B intermediate
    * gram pairs, and the probe OOM'd — an all-pairs data property, not a
    * plan defect (the graph_pagerank adjudication). A span-remover needs
    * none of it: a token is duplicated iff it sits inside a gram that
    * occurs in more than one document, so mark shared-gram starts and
    * merge overlapping [pos, pos+minLen) intervals per document —
    * gaps-and-islands on a per-DOC window. No pair join anywhere; work
    * and output are linear in the corpus at any duplication factor, and
    * no occurrence cap is needed (boilerplate is exactly what a span
    * remover wants marked).
    *
    * @return (doc_id, span_start, span_len): 0-based token offset and
    *   length of each maximal span covered by cross-document repeats.
    */
  def duplicatedSpans(docs: DataFrame,
                      minLen: Int = DefaultMinLen,
                      shape: Shape = Auto): DataFrame = {
    val gr = grams(docs, minLen)
    // cross-doc mark, same two shapes as matches() — but NO occurrence
    // cap (boilerplate is exactly what a span remover wants marked), so
    // the skew flip threshold comes from the corpus-derived stop-gram
    // formula alone: a span corpus whose heaviest gram is orders of
    // magnitude past it must not buffer that gram in one window task
    val flipAt = math.max(DfFloor.toLong, (docs.count() + 999L) / 1000L)
    val marked = crossDocOccurrences(gr, cap = Long.MaxValue,
        flipAt = flipAt, shape = shape)
      .select("doc_id", "pos")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    marked
      // intervals [pos, pos+minLen) merge while the gap between starts
      // is <= minLen (end-exclusive adjacency included); NULL lag on the
      // first row falls through to 0 in both engines
      .withColumn("brk",
        when(col("pos") - lag("pos", 1).over(w) > minLen, 1).otherwise(0))
      .withColumn("island", sum("brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "island")
      .agg(min("pos").as("span_start"),
        (max("pos") + lit(minLen.toLong) - min("pos")).as("span_len"))
      .select(col("doc_id"), col("span_start"), col("span_len"))
  }
}
