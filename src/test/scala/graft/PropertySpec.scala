package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Indexer, Search, SkewJoin}

/** Property-based invariants (SURVEY.md §5.4), driven by raw ScalaCheck
  * generators over fixed seeds (the scalatestplus bridge isn't in the
  * offline dependency cache).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "x1", "naïve_word")
  private val docGen = Gen.listOfN(8, word).map(_.mkString(" "))
  private val corpusGen: Gen[List[(String, String)]] =
    Gen.chooseNum(1, 6).flatMap(k =>
      Gen.listOfN(k, docGen).map(_.zipWithIndex.map { case (t, i) => (s"d$i", t) }))

  private def forAll(g: Gen[List[(String, String)]], n: Int = 10)(
      check: List[(String, String)] => Unit): Unit =
    (1 to n).foreach { i =>
      check(g.apply(Gen.Parameters.default, Seed(i.toLong)).get)
    }

  test("sum(tf) per term == total occurrences; df == docs containing term") {
    forAll(corpusGen) { corpus =>
      val docs = corpus.toDF("doc_id", "text")
      val postings = Indexer.postings(docs).collect()
        .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      val truth = corpus.flatMap { case (id, text) =>
        text.split(" ").filter(_.nonEmpty).map(t => (t.toLowerCase, id))
      }
      // tf sums
      val tfByTerm = postings.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      val occByTerm = truth.groupBy(_._1).view.mapValues(_.size).toMap
      assert(tfByTerm == occByTerm)
      // df
      val df = Indexer.termDf(Indexer.postings(docs)).collect()
        .map(r => r.getString(0) -> r.getInt(1)).toMap
      val dfTruth = truth.distinct.groupBy(_._1).view.mapValues(_.size).toMap
      assert(df == dfTruth)
    }
  }

  test("scores positive; top-k invariant under input repartitioning") {
    forAll(corpusGen) { corpus =>
      val docs = corpus.toDF("doc_id", "text")
      val r1 = Search.searchDocs(spark, docs, "alpha beta", 10).collect()
        .map(r => (r.getAs[String]("doc_id"), r.getAs[Double]("score")))
      val r2 = Search.searchDocs(spark, docs.repartition(7), "alpha beta", 10)
        .collect().map(r => (r.getAs[String]("doc_id"), r.getAs[Double]("score")))
      // idf floors at 0 when a term hits every doc, so scores are >= 0
      assert(r1.forall(_._2 >= 0))
      assert(r1.map(_._1).sameElements(r2.map(_._1)))
      r1.zip(r2).foreach { case ((_, a), (_, b)) => assert(math.abs(a - b) < 1e-9) }
    }
  }

  test("fingerprints and minhash signatures invariant under repartitioning") {
    forAll(corpusGen, n = 5) { corpus =>
      val docs = corpus.toDF("doc_id", "text")
      def fps(df: org.apache.spark.sql.DataFrame) = df
        .select(col("doc_id"), graft.functions.TextHash.fingerprint(
          graft.functions.Tokenizer.tokenize(col("text"))).as("fp"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(fps(docs) == fps(docs.repartition(5)))
    }
  }

  test("JSONL round-trip preserves documents") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    val docs = Seq(("a", "text with \"quotes\" and\ttabs"), ("b", ""))
      .toDF("doc_id", "text")
    docs.write.mode("overwrite").json(dir)
    val back = spark.read.schema(docs.schema).json(dir)
    assert(back.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("a", "text with \"quotes\" and\ttabs"), ("b", "")))
  }

  test("salted join equals plain join on skewed data") {
    val skewed = (1 to 2000).map(i => (if (i % 10 == 0) 1L else i.toLong, s"v$i"))
      .toDF("k", "payload")
    val dim = Seq((1L, "hot"), (2L, "a"), (30L, "b")).toDF("k", "name")
    val plain = skewed.join(dim, "k").select("k", "payload", "name")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val salted = SkewJoin.saltedInnerJoin(skewed, dim, "k", buckets = 8)
      .select("k", "payload", "name")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(salted == plain && plain.nonEmpty)
  }

  test("SQL function registration: graft_* callable from spark.sql") {
    GraftFunctions.register(spark)
    val toks = spark.sql("SELECT graft_tokenize('Hello, Wörld! x2') AS t")
      .head().getSeq[String](0)
    assert(toks == Seq("hello", "wörld", "x2"))
    val dot = spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(dot == 11.0)
    val cosSql = spark.sql(
      "SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 1.0d)) AS c")
      .head().getDouble(0)
    val cosCol = Seq((Seq(1.0, 0.0), Seq(1.0, 1.0))).toDF("a", "b")
      .select(graft.operators.Similarity.cosine(col("a"), col("b")))
      .head().getDouble(0)
    assert(cosSql == cosCol && math.abs(cosSql - 1.0 / math.sqrt(2)) < 1e-12)
    val idf = spark.sql("SELECT graft_bm25_idf(4.0d, 2) AS i").head().getDouble(0)
    assert(math.abs(idf - math.log(2.0)) < 1e-12)
    // SQL path computes the same values as the Column API path
    val h = spark.sql("SELECT graft_hash64('abc') AS h").head().getLong(0)
    assert(h == 648541476951500027L)
    val fpSql = spark.sql("SELECT graft_fingerprint(graft_tokenize('a b c')) AS f")
      .head().getLong(0)
    val fpCol = Seq("a b c").toDF("t")
      .select(graft.functions.TextHash.fingerprint(
        graft.functions.Tokenizer.tokenize(col("t")))).head().getLong(0)
    assert(fpSql == fpCol)
    // the codegen kernels through the SQL surface
    val jac = spark.sql(
      "SELECT graft_jaccard(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j")
      .head().getDouble(0)
    assert(jac == 0.5)
    val md = spark.sql(
      "SELECT graft_min_dist(array(1, 5, 9), array(3, 20)) AS d")
      .head().getLong(0)
    assert(md == 2L)
    val pw = spark.sql(
      "SELECT graft_pairs_within(array(1, 5, 9), array(3, 20), 5) AS n")
      .head().getLong(0)
    assert(pw == 2L) // (1,3) d=2 and (5,3) d=2; (9,3) d=6 and 20 are out
    // extensions entry point builds the same registrations
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
  }
  test("Packing conserves tokens and fills every non-final window exactly") {
    val counts = Gen.listOfN(40, Gen.chooseNum(0L, 37L))
    (1 to 10).foreach { i =>
      val ns = counts.apply(Gen.Parameters.default, Seed(100L + i)).get
      val docs = ns.zipWithIndex.map { case (n, d) =>
        ((d % 3).toLong, d.toLong, n) }.toDF("shard", "doc_id", "n_tokens")
      val w = 16
      val segs = graft.operators.Packing.contextWindows(docs, w)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
      // token conservation: every doc's tokens land somewhere exactly once
      val perDoc = segs.groupBy(_._2).view.mapValues(_.map(_._6).sum).toMap
      ns.zipWithIndex.foreach { case (n, d) =>
        assert(perDoc.getOrElse(d.toLong, 0L) == n,
          s"doc $d: ${perDoc.getOrElse(d.toLong, 0L)} of $n tokens packed")
      }
      // every window except each shard's last is exactly full
      val byShard = segs.groupBy(_._1)
      byShard.foreach { case (shard, ss) =>
        val winSums = ss.groupBy(_._3).view.mapValues(_.map(_._6).sum)
        val lastWin = winSums.keys.max
        winSums.foreach { case (win, sum) =>
          if (win != lastWin) assert(sum == w,
            s"shard $shard win $win holds $sum of $w tokens")
          else assert(sum <= w)
        }
      }
      // segment offsets tile each document contiguously
      segs.groupBy(_._2).foreach { case (_, ss) =>
        val sorted = ss.sortBy(_._3)
        sorted.foldLeft(0L) { case (expected, seg) =>
          assert(seg._5 == expected); expected + seg._6
        }
      }
    }
  }

  test("PageRank conserves rank mass within the integer-floor bound") {
    import spark.implicits._
    // a graph with mixed degrees: chain + hub
    val edges = (Seq((1L, 2L), (2L, 3L), (3L, 4L)) ++
      (10L to 20L).map(i => (5L, i))).toDF("a", "b")
    val iters = 10
    val pr = graft.operators.PageRank.pagerank(edges, iters).collect()
    val n = pr.length
    val total = pr.map(_.getAs[Long]("r")).sum
    val symEdges = edges.count() * 2
    // each iteration floors once per contribution (|sym| terms) and once
    // per node on the damped total; mass can only leak DOWN from n * 1e6
    val slack = iters * (symEdges + 2L * n)
    assert(total <= n * 1000000L, s"rank mass above n: $total vs ${n * 1000000L}")
    assert(total >= n * 1000000L - slack,
      s"rank mass leaked past the floor bound: $total < ${n * 1000000L - slack}")
  }

  test("weighted priority sample is biased toward heavier docs") {
    val dir = "/root/testdata/sf0.001"
    val sample = Queries.all("sample_weighted")(spark, dir)
      .agg(avg(col("n_chars"))).head().getDouble(0)
    val corpus = Tables.documents(spark, dir)
      .agg(avg(col("n_chars"))).head().getDouble(0)
    assert(sample > corpus,
      f"weighted sample mean $sample%.1f not above corpus mean $corpus%.1f")
  }

  test("Bfs.multiSource equals an in-memory reference BFS on random graphs") {
    import spark.implicits._
    val edgeGen = Gen.listOfN(40,
      Gen.zip(Gen.choose(0L, 14L), Gen.choose(0L, 14L)).suchThat(p => p._1 != p._2))
    (1 to 5).foreach { i =>
      val edges = edgeGen(Gen.Parameters.default, Seed(i.toLong)).get.distinct
      val sym = (edges ++ edges.map(_.swap)).distinct
      val seeds = sym.map(_._1).distinct.filter(_ % 5 == 0)
      // reference: plain queue BFS over the adjacency map
      val adj = sym.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      val expect = scala.collection.mutable.Map(seeds.map(_ -> 0L): _*)
      var frontier = seeds
      var d = 1L
      while (frontier.nonEmpty && d <= 4) {
        frontier = frontier.flatMap(adj.getOrElse(_, Nil)).distinct
          .filterNot(expect.contains)
        frontier.foreach(expect(_) = d)
        d += 1
      }
      val got = graft.operators.Bfs.multiSource(
        sym.toDF("a", "b"), seeds.toDF("id"), maxHops = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect.toMap, s"graph seed $i: $got vs $expect")
    }
  }


  test("ExactSubstrings window and agg shapes are row-identical on random corpora") {
    // the skew flip's load-bearing claim (DedupSpec pins one skewed
    // fixture; this generalizes it): for ANY corpus and ANY cap, the
    // window form and the aggregate-then-rejoin form of the per-gram
    // stats produce identical matches() and duplicatedSpans() rows
    import graft.operators.ExactSubstrings
    val tok = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")
    val docTokens = Gen.chooseNum(6, 14).flatMap(Gen.listOfN(_, tok))
    val corpus: Gen[List[(Long, String)]] =
      Gen.chooseNum(4, 8).flatMap(k =>
        Gen.listOfN(k, docTokens).map(_.zipWithIndex.map {
          case (ts, i) => (i.toLong, ts.mkString(" "))
        }))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    var nonVacuous = 0
    (1 to 6).foreach { i =>
      val docs = corpus.apply(Gen.Parameters.default, Seed(100L + i)).get
        .toDF("doc_id", "text")
      for (cap <- Seq(None, Some(3L))) {
        val w = rows(ExactSubstrings.matches(docs, 4, cap,
          ExactSubstrings.WindowShape))
        val a = rows(ExactSubstrings.matches(docs, 4, cap,
          ExactSubstrings.AggShape))
        assert(w == a, s"seed ${100 + i} cap $cap: matches shapes disagree")
      }
      val sw = rows(ExactSubstrings.duplicatedSpans(docs, 4,
        ExactSubstrings.WindowShape))
      val sa = rows(ExactSubstrings.duplicatedSpans(docs, 4,
        ExactSubstrings.AggShape))
      assert(sw == sa, s"seed ${100 + i}: span shapes disagree")
      if (sw.nonEmpty) nonVacuous += 1
    }
    // a sample with no cross-doc 4-gram proves nothing — require that the
    // generator produced real repeats in most samples
    assert(nonVacuous >= 4, s"only $nonVacuous/6 samples had spans — vacuous")
  }
}
