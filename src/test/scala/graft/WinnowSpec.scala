package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Winnow

/** Winnowing fingerprint invariants (SIGMOD'03 guarantees) + the CCNet
  * quality-bucket tercile contract.
  */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val K = Winnow.DefaultK
  private val W = Winnow.DefaultW

  private val word = Gen.oneOf(
    "alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta",
    "iota", "kappa", "lam", "mu", "nu", "xi", "omi", "pi")

  private def gen[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private def fpSet(rows: Array[(String, Seq[Long])]): Map[String, Set[Long]] =
    rows.map { case (d, f) => d -> f.toSet }.toMap

  private def fps(docs: Seq[(String, String)]): Map[String, Set[Long]] =
    fpSet(Winnow.fingerprints(docs.toDF("doc_id", "text"))
      .as[(String, Seq[Long])].collect())

  test("detection guarantee: a shared run of w+k-1 tokens => shared fingerprint") {
    // Any match of length >= w+k-1 tokens must produce at least one common
    // fingerprint (the paper's correctness property) — for ANY surrounding
    // context, which is what the randomized prefixes/suffixes exercise.
    for (seed <- 1 to 20) {
      val shared = gen(Gen.listOfN(W + K - 1, word), seed).mkString(" ")
      val (pa, sa) = (gen(Gen.listOfN(6, word), seed + 100).mkString(" "),
        gen(Gen.listOfN(6, word), seed + 200).mkString(" "))
      val (pb, sb) = (gen(Gen.listOfN(9, word), seed + 300).mkString(" "),
        gen(Gen.listOfN(3, word), seed + 400).mkString(" "))
      val m = fps(Seq(
        ("a", s"$pa $shared $sa"), ("b", s"$pb $shared $sb")))
      assert(m("a").intersect(m("b")).nonEmpty,
        s"seed=$seed no shared fingerprint for shared run '$shared'")
    }
  }

  test("degenerate sizes: <k tokens => no fingerprints; >=k => at least one") {
    val m = fps(Seq(
      ("empty", ""),
      ("short", "alpha beta gamma"),          // k-1 tokens, no shingle
      ("exact", "alpha beta gamma delta"),    // one shingle, one window
      ("mid", "alpha beta gamma delta eps"))) // 2 shingles < w, one window
    assert(m("empty").isEmpty && m("short").isEmpty)
    assert(m("exact").size == 1 && m("mid").size == 1)
  }

  test("density: fingerprints are a subset of shingle hashes, at most one per window") {
    for (seed <- 1 to 10) {
      val toks = gen(Gen.listOfN(30, word), seed)
      val df = Seq(("d", toks.mkString(" "))).toDF("doc_id", "text")
      val m = fps(Seq(("d", toks.mkString(" "))))("d")
      val shingleHashes = df.select(
        graft.functions.TextHash.hashedShingles(
          transform(graft.functions.Tokenizer.tokenize(col("text")),
            t => graft.functions.TextHash.hashMod(t)), K).as("g"))
        .as[Seq[Long]].collect().head.toSet
      val nWindows = math.max(toks.size - K + 1 - (W - 1), 1)
      assert(m.subsetOf(shingleHashes))
      assert(m.nonEmpty && m.size <= nWindows)
    }
  }

  test("selection is context-local: same text => same fingerprints regardless of partitioning") {
    val docs = (0 until 40)
      .map(i => (s"d$i", gen(Gen.listOfN(25, word), i.toLong).mkString(" ")))
    val one = fpSet(Winnow.fingerprints(docs.toDF("doc_id", "text"))
      .as[(String, Seq[Long])].collect())
    val many = fpSet(Winnow.fingerprints(docs.toDF("doc_id", "text")
      .repartition(7)).as[(String, Seq[Long])].collect())
    assert(one == many)
  }

  test("overlap report: duplicated passage detected, boilerplate fingerprint capped away") {
    // 20 docs all start with the same boilerplate phrase (df=20 > maxDf=16,
    // dropped); docs p1/p2 additionally share a long unique passage.
    val boiler = "terms of service apply to all content here"
    val passage = "the quick brown fox jumps over the lazy dog again today"
    val docs = (0 until 20).map { i =>
      val tail =
        if (i <= 1) passage
        else gen(Gen.listOfN(11, word), 1000L + i).mkString(" ")
      (s"p$i", s"$boiler $tail")
    }
    val rep = Winnow.overlap(
      Winnow.fingerprints(docs.toDF("doc_id", "text")), maxDf = 16)
      .as[(String, String, Long)].collect().toSet
    assert(rep.exists { case (a, b, _) => a == "p0" && b == "p1" },
      s"expected (p0,p1) in $rep")
    // no pair is reported on boilerplate alone: every reported pair must
    // involve the two passage docs
    assert(rep.forall { case (a, b, _) => Set(a, b).subsetOf(Set("p0", "p1")) },
      s"boilerplate-only pair leaked: $rep")
  }

  test("quality_buckets: per-lang terciles are balanced and exhaustive") {
    val out = graft.queries.TextAnalysisQueries
      .qualityBuckets(spark, "/root/testdata/sf0.001")
      .groupBy("lang", "bucket").count()
      .as[(String, String, Long)].collect()
    val byLang = out.groupBy(_._1)
    assert(byLang.nonEmpty)
    byLang.foreach { case (lang, rows) =>
      val m = rows.map(r => r._2 -> r._3).toMap
      val n = m.values.sum
      assert(m.keySet == Set("head", "middle", "tail"), s"$lang: $m")
      m.values.foreach(c => assert(math.abs(c - n / 3.0) <= 2.0,
        s"$lang buckets unbalanced: $m"))
    }
  }
}
