package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextHash

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>` cast to double for exact cross-engine arithmetic).
  *
  * Two paths:
  *  - brute-force: probes × corpus cosine + per-probe top-k. The probe set
  *    is broadcast; the corpus is never shuffled. Baseline and verifier.
  *  - random-hyperplane LSH: deterministic md5-derived hyperplanes bucket
  *    every vector (narrow, shuffle-free per vector); probes only score
  *    their own bucket. At 100 TB the bucket join replaces the full scan —
  *    candidate volume scales with bucket occupancy, not corpus size.
  *
  * No RNG anywhere: hyperplane components derive from hash64(j || '_' || d),
  * so Spark, DuckDB and any future engine build identical planes.
  */
object Similarity {

  /** Cosine between two double-array columns. Uses the native
    * DoubleArrayDot expression (graft.plans.VectorExprs) — a codegen'd
    * primitive loop, ~10x the interpreted zip_with/aggregate fold — with
    * identical sequential IEEE semantics (DuckDB list_dot_product agrees).
    */
  def cosine(a: Column, b: Column): Column =
    graft.plans.VectorExprs.dot(a, b) /
      (sqrt(graft.plans.VectorExprs.dot(a, a)) *
        sqrt(graft.plans.VectorExprs.dot(b, b)))

  /** Brute-force cosine top-k: every probe against the full corpus.
    * @param probes (id, v) — small; broadcast
    * @param corpus (id, v)
    */
  def bruteForceTopK(probes: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val p = probes.select(col("id").as("probe_id"), col("v").as("pv"))
    val c = corpus.select(col("id").as("cand_id"), col("v").as("cv"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("cand_id").asc)
    broadcast(p).join(c, col("probe_id") =!= col("cand_id"))
      .withColumn("cosine", cosine(col("pv"), col("cv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("cand_id"), col("cosine"))
  }

  /** Maximal-marginal-relevance rerank (Carbonell & Goldstein, SIGIR'98)
    * of an ALREADY-BOUNDED candidate shortlist: greedily pick the
    * candidate maximizing `lambda*rel - beta*max_{s in picked} cos(c, s)`,
    * trading query relevance against redundancy with what is already
    * selected — the standard diversity pass a retrieval stack runs AFTER
    * ANN candidate generation, never instead of it.
    *
    * Greedy selection is inherently sequential over the shortlist, so it
    * runs as ONE single-partition `mapPartitions` over the <=n candidate
    * rows (n is a query constant — 20 here; the heavy, corpus-sized work
    * happened upstream in the candidate generator). O(k*n) cosines over
    * in-memory arrays; the same sanctioned imperative-kernel shape as the
    * covariance gram accumulation. `lambda` and `beta` are BOTH literal
    * parameters (beta is not computed as 1-lambda: 1.0-0.7 =
    * 0.30000000000000004 in IEEE, and the oracle writes the literal 0.3).
    *
    * Cross-engine determinism: cosines use the same sequential dot
    * product as DuckDB's list_dot_product and the codegen'd
    * DoubleArrayDot; selection compares raw doubles with cand_id
    * tiebreak, so both engines make identical picks.
    *
    * @param cands (cand_id, v: array<double>, rel) — the shortlist
    */
  def mmrRerank(cands: DataFrame, lambda: Double, beta: Double,
                k: Int): DataFrame = {
    val s = cands.sparkSession
    import s.implicits._
    cands
      .select(col("cand_id").cast("long"), col("v").cast("array<double>"),
        col("rel").cast("double"))
      .as[(Long, Array[Double], Double)]
      .repartition(1)
      .mapPartitions(it => mmrGreedy(it.toArray, lambda, beta, k))
      .toDF("rank", "doc_id", "relevance", "mmr")
  }

  /** [[mmrRerank]] over a BATCH of probes: one greedy selection per
    * probe_id group, each over its own shortlist. `groupByKey` shuffles
    * the |probes|·n candidate rows once; the greedy tails run in parallel
    * across executors, each corpus-independent (O(k·n) over its n-row
    * group). The serving-batch twin of the single-probe form — same
    * kernel, so per-probe output is bit-identical to calling mmrRerank
    * per probe.
    *
    * @param cands (probe_id, cand_id, v: array<double>, rel)
    */
  def mmrRerankBatch(cands: DataFrame, lambda: Double, beta: Double,
                     k: Int): DataFrame = {
    val s = cands.sparkSession
    import s.implicits._
    cands
      .select(col("probe_id").cast("long"), col("cand_id").cast("long"),
        col("v").cast("array<double>"), col("rel").cast("double"))
      .as[(Long, Long, Array[Double], Double)]
      .groupByKey(_._1)
      .flatMapGroups { (pid, it) =>
        mmrGreedy(it.map(t => (t._2, t._3, t._4)).toArray, lambda, beta, k)
          .map { case (rank, id, rel, mmr) => (pid, rank, id, rel, mmr) }
      }
      .toDF("probe_id", "rank", "doc_id", "relevance", "mmr")
  }

  /** The sequential greedy MMR kernel both forms share (selection order
    * is scan-independent: argmax with cand_id tiebreak over the whole
    * array each step, so input order never matters).
    */
  private def mmrGreedy(cs: Array[(Long, Array[Double], Double)],
                        lambda: Double, beta: Double,
                        k: Int): Iterator[(Long, Long, Double, Double)] = {
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val n = cs.length
    val picked = new scala.collection.mutable.ArrayBuffer[Int](k)
    // max cosine to any already-picked candidate, maintained
    // incrementally: one O(n) update per pick, O(k*n) total
    val maxSim = Array.fill(n)(Double.NegativeInfinity)
    val out = Vector.newBuilder[(Long, Long, Double, Double)]
    var step = 1
    while (step <= math.min(k, n)) {
      var best = -1; var bestScore = 0.0
      var i = 0
      while (i < n) {
        if (!picked.contains(i)) {
          // first pick has no redundancy term: pure relevance order
          val score =
            if (picked.isEmpty) cs(i)._3
            else lambda * cs(i)._3 - beta * maxSim(i)
          if (best < 0 || score > bestScore ||
            (score == bestScore && cs(i)._1 < cs(best)._1)) {
            best = i; bestScore = score
          }
        }
        i += 1
      }
      val mmr =
        if (picked.isEmpty) lambda * cs(best)._3
        else bestScore
      out += ((step.toLong, cs(best)._1, cs(best)._3, mmr))
      picked += best
      var j = 0
      while (j < n) {
        if (!picked.contains(j)) {
          val sim = cos(cs(j)._2, cs(best)._2)
          if (sim > maxSim(j)) maxSim(j) = sim
        }
        j += 1
      }
      step += 1
    }
    out.result().iterator
  }

  /** Deterministic hyperplane component for (plane j, dimension d):
    * uniform in [-1, 1] with 1/1000 resolution.
    */
  def planeComponent(j: Column, d: Column): Column =
    (TextHash.hash64(concat(j.cast("string"), lit("_"), d.cast("string")))
      % 2001 - 1000) / 1000.0

  /** Driver-side mirror of planeComponent — md5 is engine-portable, so
    * these are the exact doubles the DuckDB oracle derives in SQL. The
    * planes are (numPlanes x dim) CONSTANTS: evaluating them here keeps the
    * expression tree to plain literals. (The foldable-md5 Column form works
    * too, but Catalyst re-folds the numPlanes*dim hash expressions across
    * rule batches, and that plan-time cost dominated the whole query.)
    */
  def planeValue(j: Int, d: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"${j}_$d".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    (java.lang.Long.parseLong(hex, 16) % 2001 - 1000) / 1000.0
  }

  /** The j-th hyperplane as a plain constant vector (codegen embeds it
    * as one referenced double[] via DoubleArrayDotConst — never dim
    * inline literals).
    */
  def planeValues(j: Int, dim: Int): Array[Double] =
    Array.tabulate(dim)(d => planeValue(j, d))

  /** Codegen-friendly dot of the vector column against plane j. */
  def planeDot(v: Column, j: Int, dim: Int): Column =
    graft.plans.VectorExprs.dotConst(v, planeValues(j, dim))

  /** The j-th hyperplane as a constant array<double> literal. */
  def planeArray(j: Int, dim: Int): Column =
    array((0 until dim).map(d => lit(planeValue(j, d))): _*)

  /** Bucket each vector by the sign pattern of `numPlanes` hyperplane dots.
    * Input (id, v); output (id, v, bucket).
    *
    * Entirely narrow: each plane dot is one codegen'd sequential
    * DoubleArrayDot against a constant plane array — no explode, no shuffle,
    * and (unlike a groupBy sum) the summation order is fixed, so DuckDB's
    * list_dot_product computes the bit-identical value and bucket bits never
    * flip across engines.
    */
  def lshBuckets(spark: SparkSession, vectors: DataFrame, numPlanes: Int,
                 dim: Int): DataFrame = {
    val bucket = (0 until numPlanes).map { j =>
      when(planeDot(col("v"), j, dim) > 0,
        lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    vectors.withColumn("bucket", bucket)
  }

  /** IVF-style ANN: assign every corpus vector to its nearest coarse
    * centroid (broadcast centroid set, one narrow pass); probes score only
    * the inverted lists of their `nprobe` closest centroids. Candidate
    * volume ~ nprobe/nlist of the corpus instead of all of it.
    *
    * Centroids here are a deterministic sample of the corpus (training-free
    * IVF); a k-means refinement would slot in without changing the plan
    * shape.
    */
  def ivfAssign(vectors: DataFrame, centroids: DataFrame): DataFrame =
    ivfAssignN(vectors, centroids, 1)

  /** Top-`n` nearest-centroid assignment — `n` rows per vector. n=1 is the
    * IVF build assignment; n>1 is multi-probe indexing (a vector posted to
    * its n closest lists), the standard recall knob when cluster boundaries
    * split near-neighbors. Ties break on cent_id, same as everywhere.
    *
    * Shape: `n` passes of a partial-aggregating argmax — each pass
    * crossJoins the broadcast centroid table (map-side, codegen'd dots),
    * excludes the previously-picked lists with a narrow array filter, and
    * collapses to one row per vector BEFORE the exchange, so every pass
    * shuffles N rows. The previous form ranked with a row_number window
    * over the unaggregated N x nlist cross join with the vector column
    * riding along — at the x100 probe's corpus-sized nlist (200k vectors
    * x 1563 lists x ~600 B/row ≈ 180 GB into one window sort) it was the
    * assignment itself, not the pair verify, that died. Iterative argmax
    * picks the identical set: per pass the max of (sim, -cent_id) is
    * exactly the next row_number under ORDER BY sim DESC, cent_id ASC —
    * the DuckDB oracles keep the window form.
    */
  def ivfAssignN(vectors: DataFrame, centroids: DataFrame, n: Int): DataFrame = {
    import graft.CacheRegistry.RegisteredCache
    val c = broadcast(centroids
      .select(col("id").as("cent_id"), col("v").as("cv")))
    // (id, v, picked) accumulator; picked = lists already assigned
    var cur = vectors.select(col("id"), col("v"),
      array().cast("array<long>").as("picked"))
    val picks = (1 to n).map { k =>
      val best = cur.crossJoin(c)
        .filter(!array_contains(col("picked"), col("cent_id")))
        .withColumn("sim", cosine(col("v"), col("cv")))
        .groupBy(col("id"))
        // v and picked ride INSIDE the max struct (compared only on full
        // (sim, nc) ties, impossible — nc is distinct per candidate), so
        // the argmax needs no re-join to recover them
        .agg(max(struct(col("sim").as("s"), (-col("cent_id")).as("nc"),
          col("v").as("vv"), col("picked").as("pk"))).as("m"))
        .select(col("id"), col("m.vv").as("v"), (-col("m.nc")).as("cent_id"),
          col("m.pk").as("picked"))
      // each pass's accumulator is CACHED before the next pass stacks on
      // it (release via CacheRegistry with the sweep's other caches):
      // uncached, pass k re-executes the whole 1..k-1 chain and the final
      // union re-executes every prefix — O(n^2) broadcast-argmax passes,
      // quadratically wasteful the moment a caller raises the probe
      // count. The last pass's accumulator is never consumed — skip it.
      cur =
        if (k < n) best.select(col("id"), col("v"),
          array_union(col("picked"), array(col("cent_id"))).as("picked"))
          .registeredCache()
        else cur
      best.select(col("id"), col("v"), col("cent_id"))
    }
    picks.reduce(_.unionByName(_))
  }

  /** The NList hash-smallest ids' vectors — the deterministic uniform seed
    * sample both engines reproduce (no RNG). Returns (cent_id, cv0).
    */
  def ivfSeed(emb: DataFrame, nlist: Int): DataFrame =
    emb.orderBy(TextHash.hash64(col("id").cast("string")), col("id"))
      .limit(nlist)
      .select(col("id").as("cent_id"), col("v").as("cv0"))

  /** One Lloyd step: nearest-centroid assignment (ivfAssign — the SAME
    * broadcast argmax the serving path uses, one source of truth for
    * tie-breaks), then per-centroid element-wise mean via `dim` scalar avg
    * aggregates (ONE shuffle of nlist·dim partials — no posexplode row
    * blowup). Means are rounded to the 1e-6 grid so partial-aggregation
    * sum order can never flip a later assignment; empty clusters keep
    * their previous centroid.
    */
  def lloydStep(emb: DataFrame, cents: DataFrame, dim: Int): DataFrame = {
    val assigned = ivfAssign(emb,
        cents.select(col("cent_id").as("id"), col("cv0").as("v")))
      .select(col("cent_id"), col("v"))
    val means = assigned.groupBy(col("cent_id"))
      .agg(array((0 until dim).map(i =>
        round(avg(col("v").getItem(i)), 6)): _*).as("mv"))
    // both sides are <= nlist (config-bounded) rows at any corpus scale;
    // broadcast explicitly — the aggregated subtree hides its true size
    // from the planner and this otherwise rides a sort-merge join
    // (r7 PlanAudit finding)
    cents.join(broadcast(means), Seq("cent_id"), "left")
      .select(col("cent_id"), coalesce(col("mv"), col("cv0")).as("cv0"))
  }

  /** `iters` Lloyd rounds from the hash-ordered seed, collected to the
    * driver as the bounded (nlist rows) centroid table — the amortized
    * build step of an IVF index.
    */
  def trainCentroids(emb: DataFrame, nlist: Int, iters: Int,
                     dim: Int): Seq[(Long, Seq[Double])] = {
    val fin = (1 to iters).foldLeft(ivfSeed(emb, nlist))((c, _) =>
      lloydStep(emb, c, dim))
    fin.collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
  }

  def ivfTopK(probes: DataFrame, corpus: DataFrame, centroids: DataFrame,
              k: Int, nprobe: Int): DataFrame = {
    val assigned = ivfAssign(corpus, centroids)
      .select(col("id").as("cand_id"), col("v").as("cv"), col("cent_id"))
    val c = centroids.select(col("id").as("cent_id"), col("v").as("cv0"))
    val pw = Window.partitionBy(col("probe_id"))
      .orderBy(col("psim").desc, col("cent_id").asc)
    val probeCents = probes.select(col("id").as("probe_id"), col("v").as("pv"))
      .crossJoin(broadcast(c))
      .withColumn("psim", cosine(col("pv"), col("cv0")))
      .withColumn("pr", row_number().over(pw))
      .filter(col("pr") <= nprobe)
      .select(col("probe_id"), col("pv"), col("cent_id"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("cand_id").asc)
    broadcast(probeCents).join(assigned, Seq("cent_id"))
      .filter(col("probe_id") =!= col("cand_id"))
      .withColumn("cosine", cosine(col("pv"), col("cv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("cand_id"), col("cosine"))
  }

  /** Split each vector's numPlanes-bit signature into bands of `bandBits`
    * sign bits — one row per (id, band, sig), vectors NOT carried through
    * the explode. Collision in ANY band makes a candidate pair: the
    * standard multi-table LSH construction. A full-signature match costs
    * near neighbors (1-θ/π)^numPlanes collision probability — effectively
    * zero recall at moderate similarity — while a short band collides with
    * (1-θ/π)^bandBits per table, and numPlanes/bandBits tables buy recall
    * back without admitting far pairs in bulk.
    */
  /** Band geometry sized to a corpus: more bits per band as N grows, so
    * EXPECTED bucket occupancy stays near `targetOccupancy` instead of
    * growing linearly with the corpus (and the bucket self-join's
    * per-bucket volume quadratically — the r7 ScaleProbe finding). Fixed
    * band count keeps recall semantics stable; bits clamp to [2, 16]
    * (4 .. 65536 buckets per band). Deployments pass n from a corpus
    * count (a driver-side scalar, the prep_pipeline idiom); the
    * knn_graph neighbor-side cap remains the safety bound for skewed
    * buckets this sizing can't see.
    *
    * The clamp tops at 15 bits, not 16: all bands pack into ONE long
    * signature, and 4 bands x 16 bits would place plane 63 in the sign
    * bit, where arithmetic shiftright and the two engines' negative-%
    * conventions make band extraction fragile. 4x15 = 60 planes keeps
    * the whole signature in the 62 value bits. Past the clamp
    * (n >= 64*2^15 ~ 2.1M vectors) occupancy grows linearly again —
    * that's the regime where BANDS must grow (more signature longs),
    * not bits.
    */
  def autoBandGeometry(n: Long, targetOccupancy: Int = 64,
                       bands: Int = 4): (Int, Int) = {
    val buckets = math.max(1.0, n.toDouble / targetOccupancy)
    val bits = math.min(15,
      math.max(2, math.ceil(math.log(buckets) / math.log(2.0)).toInt))
    (bands * bits, bits)
  }

  /** Integer-exact twin of [[autoBandGeometry]]: ceil-log2 via bit length
    * instead of libm log — bits = bitLength(ceil(n/occupancy) - 1). The
    * DuckDB oracle mirrors it as `length(bin(cb - 1))`, so a query whose
    * RESULT depends on the geometry (ann_lsh_auto) can derive it from a
    * corpus count in both engines with zero float involvement.
    * SimilaritySpec pins agreement with the float formula across the
    * clamp range.
    */
  def autoBandGeometryExact(n: Long, targetOccupancy: Int = 64,
                            bands: Int = 4): (Int, Int) = {
    // overflow-safe ceil division (n + occ - 1 wraps at Long.MaxValue)
    val cb = math.max(1L,
      n / targetOccupancy + (if (n % targetOccupancy == 0L) 0L else 1L))
    val raw =
      if (cb <= 1L) 1 else 64 - java.lang.Long.numberOfLeadingZeros(cb - 1)
    val bits = math.min(15, math.max(2, raw))
    (bands * bits, bits)
  }

  def lshBands(spark: SparkSession, vectors: DataFrame, numPlanes: Int,
               dim: Int, bandBits: Int): DataFrame = {
    require(numPlanes % bandBits == 0, "bandBits must divide numPlanes")
    val numBands = numPlanes / bandBits
    // Per-band signatures computed DIRECTLY (sig_b = Σ_r [dot_{b*bits+r}
    // > 0] << r), not extracted from the packed bucket column: a bucket
    // reference in each of numBands expressions gets re-inlined by
    // CollapseProject, so the wide-geometry form (48 planes at the x100
    // probe) evaluated every plane dot numBands times AND blew past
    // Janino's method limit into interpreted fallback. Bit-identical to
    // (bucket >> b*bits) % 2^bits — the oracle keeps the packed form.
    val sigs = (0 until numBands).map { b =>
      (0 until bandBits).map { r =>
        when(planeDot(col("v"), b * bandBits + r, dim) > 0,
          lit(1L << r)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
    vectors.select(col("id"),
      posexplode(array(sigs: _*)).as(Seq("band", "sig")))
  }

  /** Probe-side band rows with MULTI-PROBE extension (Lv et al. 2007):
    * for every band, emit the original signature AND the signature with
    * the band's least-confident sign bit flipped — the plane whose |dot|
    * is smallest is the one a near neighbor most likely lands on the
    * other side of. Candidate volume at most doubles per band while
    * recall approaches a twice-as-wide table's; fully deterministic
    * (exact dots, ties to the lower bit index).
    */
  def lshBandsMultiprobe(spark: SparkSession, vectors: DataFrame,
                         numPlanes: Int, dim: Int, bandBits: Int): DataFrame = {
    require(numPlanes % bandBits == 0, "bandBits must divide numPlanes")
    val numBands = numPlanes / bandBits
    val withBucket = lshBuckets(spark, vectors, numPlanes, dim)
    val bandStructs = (0 until numBands).flatMap { b =>
      val sig = shiftright(col("bucket"), b * bandBits) % (1 << bandBits)
      val rstar = array_min(array((0 until bandBits).map { r =>
        struct(abs(planeDot(col("v"), b * bandBits + r, dim)).as("a"),
          lit(r).as("r"))
      }: _*)).getField("r")
      val flipMask = (0 until bandBits)
        .map(r => when(rstar === r, lit(1L << r)))
        .reduce((a, c) => coalesce(a, c))
      Seq(struct(lit(b).as("band"), sig.as("sig")),
        struct(lit(b).as("band"), sig.bitwiseXOR(flipMask).as("sig")))
    }
    withBucket
      .select(col("id"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** Banded-LSH top-k with multi-probe on the QUERY side only: the corpus
    * index is untouched (same band table the plain path scans) — the
    * probe simply checks 2x the buckets. The serving trade every ANN
    * system tunes: recall bought at query time, not index size.
    */
  def lshTopKMultiprobe(spark: SparkSession, probes: DataFrame,
                        corpus: DataFrame, k: Int, numPlanes: Int, dim: Int,
                        bandBits: Int = 2): DataFrame = {
    val cb = lshBands(spark, corpus, numPlanes, dim, bandBits)
      .select(col("id").as("cand_id"), col("band"), col("sig"))
    val pb = lshBandsMultiprobe(spark, probes, numPlanes, dim, bandBits)
      .select(col("id").as("probe_id"), col("band"), col("sig"))
    val cands = broadcast(pb).join(cb, Seq("band", "sig"))
      .filter(col("probe_id") =!= col("cand_id"))
      .select("probe_id", "cand_id").distinct()
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("cand_id").asc)
    cands
      .join(broadcast(probes.select(col("id").as("probe_id"), col("v").as("pv"))),
        "probe_id")
      .join(corpus.select(col("id").as("cand_id"), col("v").as("cv")), "cand_id")
      .withColumn("cosine", cosine(col("pv"), col("cv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("cand_id"), col("cosine"))
  }

  /** DISTINCT (probe_id, cand_id) pairs colliding in at least one
    * signature band — the shared candidate generator of every banded-LSH
    * consumer (lshTopK, the composed quantized path). The band tables
    * carry only (id, band, sig): wide vector rows never ride through the
    * explode or the collision join, and candidate volume scales with
    * band-bucket occupancy, not corpus size.
    */
  def bandCollisions(spark: SparkSession, probes: DataFrame, corpus: DataFrame,
                     numPlanes: Int, dim: Int, bandBits: Int): DataFrame = {
    val cb = lshBands(spark, corpus, numPlanes, dim, bandBits)
      .select(col("id").as("cand_id"), col("band"), col("sig"))
    val pb = lshBands(spark, probes, numPlanes, dim, bandBits)
      .select(col("id").as("probe_id"), col("band"), col("sig"))
    broadcast(pb).join(cb, Seq("band", "sig"))
      .filter(col("probe_id") =!= col("cand_id"))
      .select("probe_id", "cand_id").distinct()
  }

  /** Banded-LSH top-k: candidates collide with the probe in at least one
    * signature band; only candidates pay the exact cosine, joined back
    * onto the distinct pairs.
    */
  def lshTopK(spark: SparkSession, probes: DataFrame, corpus: DataFrame,
              k: Int, numPlanes: Int, dim: Int, bandBits: Int = 2): DataFrame = {
    val cands = bandCollisions(spark, probes, corpus, numPlanes, dim, bandBits)
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("cand_id").asc)
    cands
      .join(broadcast(probes.select(col("id").as("probe_id"), col("v").as("pv"))),
        "probe_id")
      .join(corpus.select(col("id").as("cand_id"), col("v").as("cv")), "cand_id")
      .withColumn("cosine", cosine(col("pv"), col("cv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("cand_id"), col("cosine"))
  }
}
