package graft

import org.apache.spark.sql.functions._

/** Recall guards for the approximate similarity family, measured on the
  * real sf0.01 testdata. Each approximate path is scored against its exact
  * counterpart with a pinned lower bound — a future tuning change (plane
  * count, band geometry, shortlist size, centroid count) that silently
  * collapses recall becomes a red test instead of a green-but-useless
  * index. Bounds are pinned a few points under the measured recall so
  * legitimate nondeterminism-free refactors don't flap: the pipelines are
  * fully deterministic (md5 planes, fixed centroids), so any movement is a
  * real behavior change.
  */
class RecallSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def topk(name: String): Map[Long, Set[Long]] =
    Queries.all(name)(spark, dir).select("probe_id", "cand_id").collect()
      .groupBy(_.getLong(0))
      .map { case (p, rows) => p -> rows.map(_.getLong(1)).toSet }

  /** Mean per-probe recall of `approxName` against the exact top-k. Probes
    * the approximate index returns nothing for count as zero recall.
    */
  private def recallVs(exact: Map[Long, Set[Long]], approxName: String): Double = {
    val approx = topk(approxName)
    val per = exact.toSeq.map { case (p, ex) =>
      approx.getOrElse(p, Set.empty[Long]).intersect(ex).size.toDouble / ex.size
    }
    per.sum / per.size
  }

  test("ANN recall@5 vs brute force stays above pinned floors") {
    val exact = topk("ann_brute_force")
    val lsh = recallVs(exact, "ann_lsh")
    val lshMp = recallVs(exact, "ann_lsh_multiprobe")
    val ivf = recallVs(exact, "ann_ivf")
    val ivfPq = recallVs(exact, "ann_ivf_pq")
    val lshQ = recallVs(exact, "ann_lsh_quantized")
    val quant = recallVs(exact, "ann_quantized")
    info(f"recall@5 sf0.01: lsh=$lsh%.3f lsh_multiprobe=$lshMp%.3f " +
      f"ivf=$ivf%.3f ivf_pq=$ivfPq%.3f " +
      f"lsh_quantized=$lshQ%.3f quantized=$quant%.3f")
    // measured 0.900 with 4 bands x 2 bits (the single-table
    // full-signature form measured 0.000 — banding is load-bearing)
    assert(lsh >= 0.80, f"ann_lsh recall collapsed: $lsh%.3f")
    // multi-probe candidates are a superset of the plain banded path's,
    // and both re-rank by exact cosine, so per-probe recall cannot drop;
    // measured 1.000 (vs 0.900 plain) — the flipped weakest bit recovers
    // exactly the neighbors the hard band boundary was losing
    assert(lshMp >= lsh - 1e-12,
      f"multi-probe recall below the plain banded path: $lshMp%.3f < $lsh%.3f")
    assert(lshMp >= 0.95, f"ann_lsh_multiprobe recall collapsed: $lshMp%.3f")
    // measured 0.64 at nprobe=8/64 with 2 Lloyd iterations (0.42 with raw
    // sampled centroids) on near-uniform synthetic vectors — the
    // adversarial case for coarse quantization (see SimilarityQueries)
    assert(ivf >= 0.60, f"ann_ivf recall collapsed: $ivf%.3f")
    // IVF-PQ shares ann_ivf's candidate lists; measured 0.60 with 4x16
    // codebooks + a 40-deep shortlist — 94% of the coarse path's 0.64.
    // (No <= ivf assertion: ADC truncation can legitimately push a true
    // neighbor ranked 6th-by-exact-cosine INTO the PQ top-5 by dropping a
    // high-cosine non-neighbor from the shortlist, so PQ recall is not
    // bounded by IVF's.)
    assert(ivfPq >= 0.50, f"ann_ivf_pq recall collapsed: $ivfPq%.3f")
    // the composed path can't beat its candidate generator
    assert(lshQ >= 0.80, f"ann_lsh_quantized recall collapsed: $lshQ%.3f")
    assert(lshQ <= lsh + 1e-12,
      "composed path returned candidates its LSH stage cannot generate")
    // full-scan int8 coarse pass with a 20-deep shortlist: measured 1.000
    assert(quant >= 0.95, f"ann_quantized recall collapsed: $quant%.3f")
  }

  test("auto-sized band geometry holds a recall floor at BOTH test SFs") {
    // ann_lsh_auto derives bits-per-band from count(*): 500 vectors
    // (sf0.01) -> 3-bit bands, 2000 (sf0.1) -> 5-bit. Auto-sizing holds
    // OCCUPANCY (join volume) flat; per-band collision decays p^bits, and
    // the query's one-flip multiprobe buys part of it back (0.425 -> 0.645
    // measured at the 5-bit geometry). Floors are pinned per geometry a
    // few points under measurement — the deterministic pipeline moves only
    // when behavior does; production recall targets stack more query-side
    // flips/tables on the same index.
    for ((d, floor) <- Seq("/root/testdata/sf0.01" -> 0.85,
        "/root/testdata/sf0.1" -> 0.60)) {
      val exact = Queries.all("ann_brute_force")(spark, d)
        .select("probe_id", "cand_id").collect()
        .groupBy(_.getLong(0))
        .map { case (p, rows) => p -> rows.map(_.getLong(1)).toSet }
      val approx = Queries.all("ann_lsh_auto")(spark, d)
        .select("probe_id", "cand_id").collect()
        .groupBy(_.getLong(0))
        .map { case (p, rows) => p -> rows.map(_.getLong(1)).toSet }
      val per = exact.toSeq.map { case (p, ex) =>
        approx.getOrElse(p, Set.empty[Long]).intersect(ex).size.toDouble / ex.size
      }
      val recall = per.sum / per.size
      info(f"ann_lsh_auto recall@5 at $d: $recall%.3f")
      assert(recall >= floor,
        f"auto-geometry recall collapsed at $d: $recall%.3f (floor $floor)")
    }
  }

  test("retrain recovers recall on a drifted corpus that stale quantizers lose") {
    import spark.implicits._
    import graft.operators.VectorIndex
    // deterministic two-epoch fixture: epoch A (ids 0..199) carries its
    // signal in dims 0..31, epoch B (ids 1000..1199 — the DRIFT: think a
    // new embedding domain) in dims 32..63. Quantizers trained on A alone
    // have near-noise codewords for B's subspaces, so ADC cannot rank B
    // candidates for a B probe — the shortlist cut happens on garbage and
    // the exact re-rank never sees the true neighbors. That is precisely
    // the degradation append-without-retrain accumulates.
    // each epoch is 4 sub-clusters (anchor by id%4) with a small per-id
    // perturbation: a probe's true top-5 live in its own sub-cluster, so
    // recall is a sharp signal — reachable by any quantizer trained on the
    // epoch, unreachable through codebooks that never saw its subspaces
    def vec(id: Long, lo: Int): Seq[Double] = (0 until 64).map { d =>
      if (d >= lo && d < lo + 32)
        math.sin(0.5 * (id % 4 + 1) * (d - lo)) +
          0.05 * math.sin(0.91 * ((id * 7 + d) % 53))
      else 0.01 * (((id * 31 + d * 17) % 11).toDouble)
    }
    val a = (0L until 200L).map(i => (i, vec(i, 0)))
    val b = (1000L until 1200L).map(i => (i, vec(i, 32)))
    val prefix = "vecdrift_spec"
    VectorIndex.trainAndBuild(spark, a.toDF("id", "v"), prefix,
      nlist = 8, iters = 2, pqM = 4, pqKs = 16)
    VectorIndex.append(spark, b.toDF("id", "v"), prefix)
    // exact ground truth for the drifted probes, driver-side
    val all = (a ++ b).toMap
    def cos(x: Seq[Double], y: Seq[Double]): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < x.length) { d += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1 }
      d / (math.sqrt(nx) * math.sqrt(ny))
    }
    val probeIds = (1000L until 1200L by 20L).toSeq
    val exact: Map[Long, Set[Long]] = probeIds.map { p =>
      p -> all.toSeq.filter(_._1 != p)
        .map { case (id, v) => (id, cos(all(p), v)) }
        .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1).toSet
    }.toMap
    val probesDf = probeIds.map(p => (p, all(p))).toDF("id", "v")
    def recallNow(): Double = {
      val got = VectorIndex
        .searchPrebuilt(spark, prefix, probesDf, k = 5, nprobe = 4,
          shortlist = 40)
        .select("probe_id", "cand_id").collect()
        .groupBy(_.getLong(0))
        .map { case (p, rows) => p -> rows.map(_.getLong(1)).toSet }
      val per = probeIds.map(p =>
        got.getOrElse(p, Set.empty[Long]).intersect(exact(p)).size / 5.0)
      per.sum / per.size
    }
    val stale = recallNow()
    VectorIndex.retrain(spark, prefix)
    val retrained = recallNow()
    info(f"drifted-probe recall@5: stale=$stale%.3f retrained=$retrained%.3f")
    // stale quantizers measured 0.380 (near-constant ADC over B's
    // subspaces cuts the shortlist on noise, and the exact re-rank never
    // sees the lost neighbors); retrained measured 1.000 — floors pinned
    // with margin, fully deterministic fixture
    assert(stale <= 0.60,
      f"fixture no longer drifts: stale recall $stale%.3f — the test " +
        "proves nothing")
    assert(retrained >= 0.85,
      f"retrain failed to recover recall: $retrained%.3f")
    assert(retrained >= stale + 0.25,
      f"retrain recovery margin collapsed: $stale%.3f -> $retrained%.3f")
  }

  test("banded embedding dedup recovers most exact-cosine pairs") {
    val banded = Queries.all("dedup_embedding_cosine")(spark, dir)
      .select("vec_id_a", "vec_id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact ground truth: all-pairs cosine at the query's 0.35 threshold
    // (affordable at sf0.01; the production path never runs this)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("v"))
    val exact = emb.select(col("id").as("id_a"), col("v").as("va"))
      .crossJoin(emb.select(col("id").as("id_b"), col("v").as("vb")))
      .filter(col("id_a") < col("id_b"))
      .filter(graft.operators.Similarity.cosine(col("va"), col("vb")) >= 0.35)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = banded.intersect(exact).size.toDouble / exact.size
    info(f"banded dedup recall at cosine>=0.35: $recall%.3f " +
      s"(${banded.size} banded / ${exact.size} exact)")
    // banded pairs that pass the exact-cosine verify are a subset of truth
    assert(banded.subsetOf(exact), "banded dedup emitted a non-duplicate pair")
    assert(recall >= 0.75, f"banded dedup recall collapsed: $recall%.3f")
  }

  test("semantic dedup removals are true duplicates and recover strong pairs") {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("v"))
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val manifest = Queries.all("semantic_dedup")(spark, dir)
      .select("vec_id", "dup_of", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // subset-of-truth: every emitted removal names a genuinely-similar keeper
    manifest.foreach { case (id, keeper, c) =>
      assert(keeper < id, s"keeper $keeper is not a lower id than $id")
      val real = cos(vecs(id), vecs(keeper))
      assert(math.abs(real - c) < 1e-9, s"reported cosine drifted for ($keeper,$id)")
      assert(real >= 0.35, s"removed $id against a non-duplicate keeper")
    }
    // recall on the STRONGEST pairs the synthetic data has (cosine >= 0.45;
    // the corpus-wide max is ~0.51 — no planted twins exist): the more
    // similar two vectors are, the likelier they share an argmax centroid,
    // so the higher id of each strong pair should be removed
    val ids = vecs.keys.toSeq.sorted
    val strongDups = (for {
      i <- ids; j <- ids if i < j && cos(vecs(i), vecs(j)) >= 0.45
    } yield j).toSet
    val removed = manifest.map(_._1).toSet
    val recall =
      if (strongDups.isEmpty) 1.0
      else strongDups.intersect(removed).size.toDouble / strongDups.size
    info(f"semantic dedup: ${manifest.length} removals, " +
      f"strong-pair recall=$recall%.3f (${strongDups.size} strong dups)")
    assert(strongDups.nonEmpty, "testdata lost its strong near-duplicate pairs")
    assert(recall >= 0.75, f"semantic dedup strong-pair recall collapsed: $recall%.3f")
  }

  test("auto-geometry dedup twins keep subset-of-truth and strong-pair recall") {
    // the corpus-sized production variants trade recall on MODERATE pairs
    // for flat occupancy (collision decays p^bits as bands widen); what a
    // dedup gate must NOT lose are the STRONG pairs (cosine -> 1 keeps
    // per-band collision -> 1 at any width). Pins: emitted pairs/removals
    // are always a subset of exact truth, and strong-pair (>= 0.45; the
    // corpus max is ~0.51, no planted twins) recall holds a floor.
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("v"))
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val ids = vecs.keys.toSeq.sorted
    val exactPairs = (for {
      i <- ids; j <- ids if i < j && cos(vecs(i), vecs(j)) >= 0.35
    } yield (i, j)).toSet
    val strongPairs = exactPairs.filter { case (i, j) =>
      cos(vecs(i), vecs(j)) >= 0.45
    }
    assert(strongPairs.nonEmpty, "testdata lost its strong near-duplicate pairs")

    // -- dedup_embedding_auto: pair manifest --
    val autoPairs = Queries.all("dedup_embedding_auto")(spark, dir)
      .select("vec_id_a", "vec_id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(autoPairs.subsetOf(exactPairs),
      "auto-geometry banded dedup emitted a non-duplicate pair")
    val pairRecall =
      strongPairs.intersect(autoPairs).size.toDouble / strongPairs.size
    info(f"dedup_embedding_auto: ${autoPairs.size} pairs, " +
      f"strong-pair recall=$pairRecall%.3f (${strongPairs.size} strong)")

    // -- semantic_dedup_auto: removal manifest --
    val manifest = Queries.all("semantic_dedup_auto")(spark, dir)
      .select("vec_id", "dup_of", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    manifest.foreach { case (id, keeper, c) =>
      assert(keeper < id, s"keeper $keeper is not a lower id than $id")
      val real = cos(vecs(id), vecs(keeper))
      assert(math.abs(real - c) < 1e-9, s"reported cosine drifted for ($keeper,$id)")
      assert(real >= 0.35, s"removed $id against a non-duplicate keeper")
    }
    val removed = manifest.map(_._1).toSet
    val strongDupIds = strongPairs.map(_._2)
    val semRecall =
      strongDupIds.intersect(removed).size.toDouble / strongDupIds.size
    info(f"semantic_dedup_auto: ${manifest.length} removals, " +
      f"strong-pair recall=$semRecall%.3f")
    // measured 0.786 (11/14 strong pairs) for BOTH twins at sf0.01 — the
    // same as the fixed semantic form, because the corpus's "strong" pairs
    // top out at cosine ~0.51 (real near-dup corpora sit near 1.0, where
    // collision is near-certain at any geometry); floors pinned a few
    // points under measurement, deterministic pipeline
    assert(pairRecall >= 0.70,
      f"dedup_embedding_auto strong-pair recall collapsed: $pairRecall%.3f")
    assert(semRecall >= 0.75,
      f"semantic_dedup_auto strong-pair recall collapsed: $semRecall%.3f")
  }
}
