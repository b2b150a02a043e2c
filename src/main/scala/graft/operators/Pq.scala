package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextHash

/** Product quantization (PQ) for embedding columns — the memory side of
  * large-scale ANN serving (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search"; the FAISS IVF-PQ index is this composed with
  * IVF lists).
  *
  * The vector space is split into `mSub` subspaces of `subDim` dims; each
  * subspace gets its own `ks`-entry codebook, and a vector is stored as
  * `mSub` small code ids (here 4x4 bits ≈ 2 bytes instead of 256 — a 128x
  * compression of the scan payload). Probes score candidates with
  * asymmetric distance computation (ADC): the probe precomputes a
  * `mSub x ks` lookup table of subspace dot products once, and each
  * candidate costs `mSub` table lookups instead of a full-precision dot.
  *
  * Determinism (the cross-engine contract every graft operator keeps):
  *  - codebook seeds are the `ks` hash-smallest ids' subvectors (the same
  *    md5-ordered uniform sample the IVF centroids use — no RNG);
  *  - one distributed Lloyd step refines them: nearest-code assignment by
  *    L2 with ties broken on code id, means rounded to the 1e-6 grid so
  *    partial-aggregation sum order can never flip a later assignment;
  *  - ADC scores are summed in integer micro-units (each subspace dot
  *    rounded to 1e-6 and cast to long), so the shortlist ranking is
  *    reduction-order-free and bit-identical in any engine.
  *
  * Scale shape: training collects exactly `mSub*ks` rows (constant);
  * encoding is a narrow per-row expression; the codebook rides into every
  * task as plan literals (a few KiB). Nothing grows with the corpus.
  */
object Pq {

  /** One codebook entry: subspace `m`, code id `k`, centroid `carr`. */
  final case class Code(m: Int, k: Int, carr: Seq[Double])

  private def sub(v: Column, m: Int, subDim: Int): Column =
    slice(v, m * subDim + 1, subDim)

  private def codeLit(c: Code): Column = array(c.carr.map(lit): _*)

  /** argmin_k L2(s, code_k) for one subspace, ties to the smallest k.
    * L2^2 = |s|^2 - 2<s,c> + |c|^2; the |s|^2 term is constant across k so
    * the comparison key is |c|^2 - 2<s,c> — |c|^2 is a driver-side literal
    * (left-to-right sum, the same sequence DuckDB's list_dot_product runs)
    * and the dot is the codegen'd sequential DoubleArrayDot, so the float
    * is bit-identical across engines and the tie-break total.
    */
  private def nearestCode(s: Column, codesM: Seq[Code]): Column = {
    val arr = array(codesM.map { c =>
      val c2 = c.carr.foldLeft(0.0)((acc, x) => acc + x * x)
      struct(
        (lit(c2) - lit(2.0) * graft.plans.VectorExprs.dot(s, codeLit(c))).as("d"),
        lit(c.k).as("k"))
    }: _*)
    array_min(arr).getField("k")
  }

  /** Train the `mSub x ks` codebooks over `vectors` (id, v): hash-ordered
    * seed subvectors + one Lloyd step. One distributed pass (a union of the
    * per-subspace assignments feeds one grouped aggregation); the collect
    * is bounded at `mSub*ks` rows regardless of corpus size. Codes whose
    * cluster comes back empty keep their seed centroid.
    */
  def train(vectors: DataFrame, mSub: Int, subDim: Int, ks: Int): Seq[Code] = {
    val seed = vectors
      .orderBy(TextHash.hash64(col("id").cast("string")), col("id"))
      .limit(ks).select(col("v")).collect()
      .map(_.getSeq[Double](0).toArray)
    require(seed.length == ks,
      s"PQ training needs >= $ks vectors for the codebook seed, got ${seed.length}")
    require(seed.head.length >= mSub * subDim,
      s"vectors have ${seed.head.length} dims, codebooks need ${mSub * subDim}")
    val codes0 = for (m <- 0 until mSub; k <- 0 until ks)
      yield Code(m, k, seed(k).slice(m * subDim, (m + 1) * subDim).toSeq)
    val byM = codes0.groupBy(_.m)
    val updated = (0 until mSub).map { m =>
      vectors.select(sub(col("v"), m, subDim).as("s"))
        .withColumn("k", nearestCode(col("s"), byM(m)))
        .groupBy(col("k"))
        .agg(array((0 until subDim).map(i =>
          round(avg(col("s").getItem(i)), 6)): _*).as("carr"))
        .select(lit(m).as("m"), col("k"), col("carr"))
    }.reduce(_.unionByName(_))
    val refined = updated.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    codes0.map(c => c.copy(carr = refined.getOrElse((c.m, c.k), c.carr)))
  }

  /** Encode a vector column into its `mSub` code ids (`array<int>`) —
    * entirely narrow, one argmin per subspace against literal codebooks.
    */
  def encodeCol(v: Column, codes: Seq[Code], mSub: Int, subDim: Int): Column = {
    val byM = codes.groupBy(_.m)
    array((0 until mSub).map(m => nearestCode(sub(v, m, subDim), byM(m))): _*)
  }

  /** The probe-side ADC lookup table: `lut[m][k]` = <probe_sub_m, code_mk>
    * in integer micro-units (`array<array<long>>`). Computed once per probe
    * row; `mSub*ks` sequential subspace dots.
    */
  def lutCol(v: Column, codes: Seq[Code], mSub: Int, subDim: Int): Column = {
    val byM = codes.groupBy(_.m)
    array((0 until mSub).map { m =>
      array(byM(m).sortBy(_.k).map { c =>
        round(graft.plans.VectorExprs.dot(sub(v, m, subDim), codeLit(c))
          * lit(1000000.0)).cast("long")
      }: _*)
    }: _*)
  }

  /** ADC score of a candidate: sum over subspaces of the probe's LUT entry
    * at the candidate's code — `mSub` lookups, exact integer addition.
    */
  def adcScore(lut: Column, codeIds: Column, mSub: Int): Column =
    (0 until mSub).map(m =>
      element_at(element_at(lut, m + 1), element_at(codeIds, m + 1) + 1))
      .reduce(_ + _)
}
