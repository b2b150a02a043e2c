package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextHash, Tokenizer}
import graft.operators.Dedup

class DedupSpec extends SparkSpec {

  test("connectedComponents: chains merge transitively, min id labels the cluster") {
    import spark.implicits._
    // 1-2-3 is a chain (no direct 1-3 edge): label must cross two hops;
    // 4-5 is separate; 7 is a self-loop singleton
    val edges = Seq((2L, 1L), (2L, 3L), (5L, 4L), (7L, 7L)).toDF("a", "b")
    val comps = graft.operators.Components.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 7L -> 7L))
  }

  test("connectedComponents equals driver-side union-find on a random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val es = Seq.fill(150)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
    // reference union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    es.foreach { case (a, b) => val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra) = rb }
    val expect = parent.keys.map { n =>
      n -> parent.keys.filter(m => find(m) == find(n)).min
    }.toMap
    val got = graft.operators.Components
      .connectedComponents(es.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }
  test("connectedComponents stress: long-chain graph (diameter >> cluster depth)") {
    import spark.implicits._
    // a 64-node path: min-label needs the full chain crossed — with pointer
    // jumping rounds scale with log2(64), not 63; batched checks keep the
    // job count at rounds/checkEvery
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("a", "b")
    val r = graft.operators.Components
      .connectedComponentsResult(chain, maxIter = 12, checkEvery = 3)
    assert(r.converged, s"expected convergence within 12 rounds, ran ${r.rounds}")
    assert(r.rounds <= 12)
    val labels = r.labels.collect().map(x => x.getLong(0) -> x.getLong(1))
    assert(labels.length == 64 && labels.forall(_._2 == 0L))
  }

  test("connectedComponents: truncation throws instead of returning wrong labels") {
    import spark.implicits._
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("a", "b")
    // 1 round cannot converge a 64-node path
    intercept[IllegalStateException] {
      graft.operators.Components.connectedComponents(chain, maxIter = 1)
    }
    val partial = graft.operators.Components
      .connectedComponentsResult(chain, maxIter = 1)
    assert(!partial.converged && partial.rounds == 1)
  }

  test("connectedComponents: reliable checkpoint dir matches localCheckpoint labels") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_ckpt").toString
    val rnd = new scala.util.Random(7)
    val es = Seq.fill(120)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    val local = graft.operators.Components
      .connectedComponents(es.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val reliable = graft.operators.Components
      .connectedComponents(es.toDF("a", "b"), checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reliable == local)
  }

  import spark.implicits._

  test("hash64 matches the cross-engine md5-prefix value") {
    // DuckDB: CAST('0x'||substring(md5('abc'),1,15) AS BIGINT) = 648541476951500027
    val h = Seq("abc").toDF("s").select(TextHash.hash64(col("s"))).head().getLong(0)
    assert(h == 648541476951500027L)
  }

  test("fingerprint: empty tokens -> 0; order-sensitive") {
    val fps = Seq("a b", "b a", "").toDF("text")
      .select(TextHash.fingerprint(Tokenizer.tokenize(col("text"))).as("fp"))
      .collect().map(_.getLong(0))
    assert(fps(2) == 0L)
    assert(fps(0) != fps(1)) // order matters
  }

  test("exact dedup: duplicates share digest, min id kept") {
    val docs = Seq((1L, "same  text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val res = Dedup.exact(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    // whitespace-normalized: docs 1 and 2 are identical
    assert(res(1L) == (2L, true))
    assert(res(2L) == (2L, false))
    assert(res(3L) == (1L, true))
  }

  test("minhash: identical sets -> identical signatures; LSH finds the pair") {
    val sets = Seq((1L, Seq("x", "y", "z")), (2L, Seq("z", "y", "x")),
      (3L, Seq("p", "q", "r"))).toDF("id", "toks")
    val sigs = sets.select(col("id") +: Dedup.minHashSignatures(col("toks"), 8): _*)
    val rows = sigs.collect().map(r => r.getLong(0) -> (1 to 8).map(r.getLong)).toMap
    assert(rows(1L) == rows(2L)) // same set, order-insensitive
    assert(rows(1L) != rows(3L))
    val cands = Dedup.lshCandidates(sigs, 8, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(cands.contains((1L, 2L)))
  }

  test("CacheRegistry: releaseAll uncaches every registered subtree") {
    // dedup_minhash_lsh registers its shared caches via .registeredCache()
    Queries.all("dedup_minhash_lsh")(spark, "/root/testdata/sf0.001").collect()
    assert(CacheRegistry.registeredCount > 0, "query registered no caches")
    CacheRegistry.releaseAll()
    assert(CacheRegistry.registeredCount == 0)
    // a re-registered cache works again afterwards (idempotent lifecycle)
    Queries.all("dedup_minhash_lsh")(spark, "/root/testdata/sf0.001").collect()
    assert(CacheRegistry.registeredCount > 0)
    CacheRegistry.releaseAll()
  }

  test("leak-proof splits: both sides of every near-dup pair share a split") {
    val dir = "/root/testdata/sf0.001"
    val split = Queries.all("dedup_splits")(spark, dir)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // splits are cluster-protected by the SHINGLED production graph
    // (full corpus); the guarantee applies to every shingled pair whose
    // BOTH ends fall in the %5 fixture subset splits covers
    val pairs = Queries.all("dedup_minhash_shingled")(spark, dir)
      .select("doc_id_a", "doc_id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => a % 5 == 0 && b % 5 == 0 }
    assert(pairs.nonEmpty, "no in-subset near-dup pairs at sf0.001 — test is vacuous")
    pairs.foreach { case (a, b) =>
      assert(split(a) == split(b), s"near-dup pair ($a,$b) straddles splits")
    }
    // all three splits actually materialize at this corpus size
    assert(split.values.toSet == Set("train", "validation", "test"))
  }

  test("incremental dedup is exact: new docs pass, dups (incl. normalized) drop") {
    import spark.implicits._
    val existing = Seq((1L, "a b c"), (2L, "x y z")).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "a  b   c"),    // whitespace-normalized dup of doc 1
      (11L, "fresh words"), // new
      (12L, "x y z"),       // exact dup of doc 2
      (13L, "more new text")).toDF("doc_id", "text")
    // fpp 0.5 forces bloom false positives through the exact verify join —
    // the result must be identical to the precise answer regardless
    for (fpp <- Seq(0.01, 0.5)) {
      val ids = Dedup.incrementalNew(existing, incoming, "doc_id", "text", fpp)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(ids == Set(11L, 13L), s"fpp=$fpp")
    }
  }

  test("TextHash.simHash (array form) equals Dedup.simHashSignatures (exploded form)") {
    import spark.implicits._
    // pins the single-pass array fold (hash each token once, all bit votes
    // in one traversal) to the groupBy formulation bit-for-bit
    val docs = Seq((1L, "spark makes big data simple"),
      (2L, "big data big wins again and again"),
      (3L, "zebra quantum flux")).toDF("id", "text")
    val arrayForm = docs.select(col("id"),
        TextHash.simHash(Tokenizer.tokenize(col("text"))).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val explodedForm = Dedup.simHashSignatures(
        docs.select(col("id"), explode(Tokenizer.tokenize(col("text"))).as("term")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(arrayForm == explodedForm)
  }

  test("simhash: identical docs hamming 0; disjoint docs differ") {
    val toks = Seq((1L, "aa"), (1L, "bb"), (2L, "aa"), (2L, "bb"), (3L, "zz"))
      .toDF("id", "term")
    val sigs = Dedup.simHashSignatures(toks).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
  }

  test("fused LongArrayJaccard matches composed intersect/union jaccard") {
    val pairs = Seq(
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)),        // 2/4
      (Seq(1L, 1L, 2L), Seq(2L, 2L, 1L)),        // dup elements: 2/2
      (Seq(1L, 2L), Seq(3L, 4L)),                 // disjoint: 0
      (Seq.empty[Long], Seq.empty[Long]))         // empty: 0 by convention
    val df = pairs.toDF("x", "y")
    val fused = df.select(graft.plans.ArrayJaccard.jaccardLong(col("x"), col("y")))
      .collect().map(_.getDouble(0))
    assert(fused(0) == 0.5 && fused(1) == 1.0 && fused(2) == 0.0 && fused(3) == 0.0)
    // parity with the composed form on non-empty inputs
    val composed = df.limit(3)
      .select(graft.operators.Dedup.jaccard(col("x"), col("y")))
      .collect().map(_.getDouble(0))
    assert(fused.take(3).sameElements(composed))
  }

  test("jaccard on array columns") {
    val j = Seq((Seq("a", "b", "c"), Seq("b", "c", "d")))
      .toDF("x", "y").select(Dedup.jaccard(col("x"), col("y"))).head().getDouble(0)
    assert(math.abs(j - 0.5) < 1e-12)
  }

  test("passage dedup: first occurrence wins, tails survive, full dup vanishes") {
    import spark.implicits._
    import graft.operators.Passages
    // n=2 passages: doc 1 = [a b][c d][e] (partial tail kept);
    // doc 2 repeats doc 1's first passage then adds novel text;
    // doc 3 is an exact copy of doc 1 — every passage duplicate, vanishes;
    // doc 4 repeats its OWN first passage (within-doc dup removed too).
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a b x y"),
      (3L, "a b c d e"),
      (4L, "p q p q")).toDF("doc_id", "text")
    val out = Passages.removeDuplicatePassages(docs, "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out == Map(
      1L -> ((3L, 3L, "a b c d e")),
      2L -> ((2L, 1L, "x y")),
      4L -> ((2L, 1L, "p q"))))
    assert(!out.contains(3L))
  }

  test("SignatureIndex: build+append+probe equals direct recompute") {
    import graft.operators.SignatureIndex
    import graft.plans.ArrayJaccard
    def sets(rows: Seq[(Long, Seq[Long])]) =
      rows.toDF("id", "toks")
    // near-identical sets collide; disjoint ones don't
    val c1 = sets(Seq(1L -> Seq(1L, 2L, 3L, 4L), 2L -> Seq(9L, 10L, 11L, 12L)))
    val c2 = sets(Seq(3L -> Seq(20L, 21L, 22L, 23L)))
    val batch = sets(Seq(
      11L -> Seq(1L, 2L, 3L, 4L),     // dup of corpus id 1 (built half)
      12L -> Seq(20L, 21L, 22L, 24L), // near-dup of id 3 (appended half)
      13L -> Seq(50L, 51L, 52L, 53L)))
    SignatureIndex.build(spark, c1, "graft_sigidx_spec", 8, 2)
    SignatureIndex.append(spark, c2, "graft_sigidx_spec", 8, 2)
    val got = SignatureIndex
      .probe(spark, batch, "graft_sigidx_spec", 8, 2, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // direct recompute over the union corpus
    val corpus = c1.unionByName(c2)
    def sigsOf(df: org.apache.spark.sql.DataFrame) = df.select(
      col("id") +: Dedup.minHashSignaturesHashed(col("toks"), 8): _*)
    val want = Dedup.lshCandidatesBetween(sigsOf(batch), sigsOf(corpus), 8, 2)
      .join(batch.select(col("id").as("id_new"), col("toks").as("tn")), "id_new")
      .join(corpus.select(col("id").as("id_old"), col("toks").as("to")), "id_old")
      .filter(ArrayJaccard.jaccardLong(col("tn"), col("to")) >= 0.5)
      .select("id_new", "id_old")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.contains((11L, 1L)) && got.contains((12L, 3L)))
    assert(!got.exists(_._1 == 13L))
  }

  test("passage chunking: empty doc yields no passages, hash is order-sensitive") {
    import spark.implicits._
    import graft.operators.Passages
    val docs = Seq((1L, ""), (2L, "a b"), (3L, "b a")).toDF("doc_id", "text")
    val ch = Passages.chunked(docs, "doc_id", "text", 2).collect()
    assert(!ch.exists(_.getLong(0) == 1L))
    val hs = ch.map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(hs(2L) != hs(3L))
  }

  test("Ingest.pipeline gates duplicates vs the corpus AND within the batch") {
    import spark.implicits._
    def doc(words: String*): String = words.mkString(" ")
    val base = (1 to 14).map(i => s"alpha$i beta$i gamma$i delta$i").mkString(" ")
    val existing = Seq(
      (1L, doc("the quick brown fox jumps over the lazy dog again and again", base)),
      (3L, doc("completely different existing content about streams and joins", base.reverse))
    ).toDF("doc_id", "text")
    val batch = Seq(
      // 10: exact duplicate OF AN EXISTING doc -> dropped by the exact gate
      (10L, doc("the quick brown fox jumps over the lazy dog again and again", base)),
      // 12 and 14: exact duplicates OF EACH OTHER (new text) -> only 12 survives
      (12L, doc("fresh arriving content one two three four five six seven eight", base)),
      (14L, doc("fresh arriving content one two three four five six seven eight", base)),
      // 16: near-dup of EXISTING doc 3 (one word changed) -> near gate drops it
      (16L, doc("completely different existing content about streams and hashes", base.reverse)),
      // 18 and 20: near-dups of each other (one word changed) -> 20 dropped
      (18L, doc("brand new unique arriving document nine ten eleven twelve moons", base)),
      (20L, doc("brand new unique arriving document nine ten eleven twelve stars", base)),
      // 22: genuinely novel -> accepted
      (22L, doc("entirely unrelated survivor text with its own vocabulary words", base.toUpperCase))
    ).toDF("doc_id", "text")
    val out = graft.operators.Ingest
      .pipeline(spark, existing, batch, numHashes = 8, rowsPerBand = 2,
        minQuality = 0.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(12L, 18L, 22L),
      s"expected Set(12, 18, 22), got $out")
  }

  // dedup_substrings claims exact equivalence to the suffix-array method's
  // output at token granularity: every maximal cross-doc run >= L. Pin it
  // against a quadratic per-pair diagonal scan (the obviously-correct
  // in-memory reference) with the stop-gram cap disabled, over a real
  // corpus slice large enough to contain overlapping + multiple runs.
  test("exact-substring matches equal the brute-force maximal-run reference") {
    val L = 8
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 80).select("doc_id", "text")
    val got = operators.ExactSubstrings.matches(docs, L, Some(Long.MaxValue))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    // in-memory reference: tokenize exactly as Tokenizer does, then walk
    // every alignment diagonal of every doc pair collecting maximal runs
    val toks = docs.collect().map { r =>
      r.getLong(0) -> r.getString(1).toLowerCase
        .replaceAll("(?U)[^\\w\\s]", " ").split("\\s+").filter(_.nonEmpty)
    }.sortBy(_._1)
    val expected = scala.collection.mutable.Set[(Long, Long, Long, Long, Long)]()
    for {
      ai <- toks.indices; bi <- (ai + 1) until toks.length
      (da, x) = toks(ai); (db, y) = toks(bi)
      d <- -(y.length - 1) to (x.length - 1)
    } {
      var i = math.max(0, d); var j = i - d
      var runLen = 0; var si = 0; var sj = 0
      while (i < x.length && j < y.length) {
        if (x(i) == y(j)) { if (runLen == 0) { si = i; sj = j }; runLen += 1 }
        else { if (runLen >= L) expected += ((da, db, si.toLong, sj.toLong,
          runLen.toLong)); runLen = 0 }
        i += 1; j += 1
      }
      if (runLen >= L) expected += ((da, db, si.toLong, sj.toLong, runLen.toLong))
    }
    assert(expected.nonEmpty, "reference found no runs — test is vacuous")
    assert(got == expected.toSet,
      s"missing=${(expected.toSet -- got).take(5)} extra=${(got -- expected).take(5)}")
  }

  test("duplicated spans equal the merged union of uncapped match intervals") {
    val L = 8
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 80).select("doc_id", "text")
    val matches = operators.ExactSubstrings.matches(docs, L, Some(Long.MaxValue))
      .collect()
    // union the [start, start+len) intervals each doc participates in
    // (either side of a pair), merging overlap/adjacency
    val byDoc = scala.collection.mutable.Map[Long, Vector[(Long, Long)]]()
      .withDefaultValue(Vector())
    matches.foreach { r =>
      byDoc(r.getLong(0)) :+= (r.getLong(2), r.getLong(2) + r.getLong(4))
      byDoc(r.getLong(1)) :+= (r.getLong(3), r.getLong(3) + r.getLong(4))
    }
    val expected = byDoc.flatMap { case (d, iv) =>
      iv.sorted.foldLeft(Vector[(Long, Long)]()) { case (acc, (s, e)) =>
        acc.lastOption match {
          case Some((ps, pe)) if s <= pe => acc.init :+ (ps, math.max(pe, e))
          case _ => acc :+ (s, e)
        }
      }.map { case (s, e) => (d, s, e - s) }
    }.toSet
    val got = operators.ExactSubstrings.duplicatedSpans(docs, L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(expected.nonEmpty && got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }

  test("exact-substring stop-gram cap drops corpus boilerplate runs") {
    import spark.implicits._
    val boiler = "the quick brown fox jumps over the lazy dog"
    val unique = "zeta eta theta iota kappa lambda mu nu xi"
    val docs = ((0L until 25L).map(i => (i, s"$boiler filler$i")) ++
      Seq((100L, s"alpha $unique"), (101L, s"beta $unique")))
      .toDF("doc_id", "text")
    val out = operators.ExactSubstrings.matches(docs, 8, Some(10L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    // the 25-doc boilerplate (occurrence 25 > cap 10) must not report;
    // the unique 9-token repeat reports once, maximal (9, not two 8s)
    assert(out.toSeq == Seq((100L, 101L, 9L)), out.mkString(","))
  }

  test("exact-substring skew flip engages above the computed threshold; shapes agree") {
    import spark.implicits._
    import operators.ExactSubstrings
    // the flip rule itself (maxOcc/16 <= cap is window-safe; integer div)
    assert(ExactSubstrings.windowShapeSafe(320L, 20L))
    assert(!ExactSubstrings.windowShapeSafe(400L, 20L))
    assert(ExactSubstrings.windowShapeSafe(Long.MaxValue / 2,
      Long.MaxValue / 16), "near-overflow domain must stay well-defined")
    // skewed fixture: one 8-token boilerplate gram in 400 docs (occ 400 >
    // 16 x cap 20 -> Auto must flip to the agg shape), plus one genuine
    // 2-doc repeat so the matches output is non-vacuous under the cap
    val boiler = "alpha beta gamma delta epsilon zeta eta theta"
    val shared = "one two three four five six seven eight"
    val docs = (0L until 400L).map { i =>
      val tail = if (i < 2) s" $shared" else ""
      (i, s"$boiler tail$i$tail")
    }.toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val mWin = ExactSubstrings.matches(docs, 8,
      shape = ExactSubstrings.WindowShape)
    val mAgg = ExactSubstrings.matches(docs, 8,
      shape = ExactSubstrings.AggShape)
    val mWinRows = rows(mWin)
    assert(mWinRows.nonEmpty, "fixture produced no matches — vacuous pin")
    assert(mWinRows == rows(mAgg),
      "window and agg shapes disagree on matches()")
    val sWin = ExactSubstrings.duplicatedSpans(docs, 8,
      shape = ExactSubstrings.WindowShape)
    val sAgg = ExactSubstrings.duplicatedSpans(docs, 8,
      shape = ExactSubstrings.AggShape)
    val sWinRows = rows(sWin)
    assert(sWinRows.size >= 400, "boilerplate spans missing — vacuous pin")
    assert(sWinRows == rows(sAgg),
      "window and agg shapes disagree on duplicatedSpans()")
    // Auto must have PICKED the agg shape here: the only Window operator
    // left in the plan is the islands window, never the per-gram stats.
    // (analyzed, not optimized: cache substitution folds the occurrence
    // subtree into an InMemoryRelation and would hide the Window)
    def gWindows(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.exists(_.references.exists(_.name == "g")) => w
      }.size
    assert(gWindows(mWin) > 0 && gWindows(sWin) > 0,
      "forced window shape lost its per-gram window (test harness broken)")
    assert(gWindows(ExactSubstrings.matches(docs, 8)) == 0,
      "Auto kept the per-gram window on a 400x-skewed gram (no flip)")
    assert(gWindows(ExactSubstrings.duplicatedSpans(docs, 8)) == 0,
      "Auto spans kept the per-gram window on a skewed corpus (no flip)")
    // and on a uniform corpus Auto keeps the cheaper window shape
    val uniform = (0L until 40L)
      .map(i => (i, s"u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f u${i}g u${i}h u${i}i"))
      .toDF("doc_id", "text")
    assert(gWindows(ExactSubstrings.matches(uniform, 8)) > 0,
      "Auto flipped to agg on a skew-free corpus")
  }

  // graph_link_prediction's AA micro-weight round(1e6/ln deg) claims to be
  // cross-libm stable. ln is libm-dependent (±1 ulp), so the claim only
  // holds if no weight lands NEAR a .5 rounding boundary. deg is bounded
  // to [2, HubDegreeCap=64] — check the whole domain: a ±few-ulp
  // perturbation of ln(d) moves 1e6/ln(d) by ~1e-9, so a 1e-6 distance
  // from the boundary is 1000× the worst cross-engine wobble.
  // Independent end-to-end check: the engine's Adamic-Adar output over
  // the kNN-auto graph must equal an in-memory sweep over the same edge
  // set (undirected dedup, hub cap, missing-edge anti-filter, micro-grid
  // sum). Guards the whole wedge-join chain with a brute force that
  // shares none of its joins.
  test("graph_link_prediction == in-memory Adamic-Adar over the kNN graph") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.DedupQueries.graphLinkPrediction(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got.nonEmpty, "link prediction should emit candidates")
    val knn = graft.queries.SimilarityQueries.knnGraphAuto(spark, dir)
      .select("src_id", "nbr_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = knn
      .map { case (s0, n0) => (math.min(s0, n0), math.max(s0, n0)) }
      .distinct
    val existing = edges.toSet
    val adj = scala.collection.mutable.Map[Long, List[Long]]()
    edges.foreach { case (a, b) =>
      adj(a) = b :: adj.getOrElse(a, Nil)
      adj(b) = a :: adj.getOrElse(b, Nil)
    }
    val deg = adj.map { case (k, v) => k -> v.length.toLong }
    val expect = scala.collection.mutable.Map[(Long, Long), (Long, Long)]()
    adj.foreach { case (w, neigh) =>
      if (deg(w) <= 64) {
        val micro = math.round(1e6 / math.log(deg(w).toDouble))
        for (u <- neigh; v <- neigh
             if u < v && !existing.contains((u, v))) {
          val (c, s) = expect.getOrElse((u, v), (0L, 0L))
          expect((u, v)) = (c + 1, s + micro)
        }
      }
    }
    val expected = expect.map { case (k, (c, s)) => k -> (c, s / 1e6) }.toMap
    assert(got == expected,
      s"engine=${got.size} rows, brute=${expected.size} rows")
  }

  test("graph_triangles equals an in-memory enumeration and is non-vacuous") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.DedupQueries.graphTriangles(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent count over the same kNN-auto pair set: adjacency sets +
    // per-edge neighborhood intersection (no joins, no explode)
    val pairs = graft.queries.SimilarityQueries.knnGraphAuto(spark, dir)
      .select(least(col("src_id"), col("nbr_id")),
        greatest(col("src_id"), col("nbr_id")))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val adj = scala.collection.mutable.Map[Long, Set[Long]]()
    pairs.foreach { case (a, b) =>
      adj(a) = adj.getOrElse(a, Set.empty) + b
      adj(b) = adj.getOrElse(b, Set.empty) + a
    }
    val cnt = scala.collection.mutable.Map[Long, Long]()
    pairs.foreach { case (a, b) =>
      (adj(a) intersect adj(b)).foreach { c =>
        // each triangle counted once per corner via its a<b edge and the
        // common neighbor above b (a<b<c exactly like the engine's chain)
        if (c > b) Seq(a, b, c).foreach(n => cnt(n) = cnt.getOrElse(n, 0L) + 1)
      }
    }
    assert(got == cnt.toMap, s"engine=${got.size} rows, brute=${cnt.size} rows")
    assert(got.nonEmpty, "triangle gate is vacuous at sf0.001")
  }

  test("AA micro-weights stay clear of .5 rounding boundaries for all degrees") {
    for (d <- 2 to 64) {
      val x = 1e6 / math.log(d.toDouble)
      val frac = x - math.floor(x)
      assert(math.abs(frac - 0.5) > 1e-6,
        f"deg $d: 1e6/ln(d) = $x%.9f sits within 1e-6 of a rounding boundary " +
          "— a last-ulp libm difference could flip round() between engines")
    }
  }
}
