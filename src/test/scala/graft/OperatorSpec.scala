package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Quantiles}

/** Direct unit specs for the standalone operators (beyond the oracle gate). */
class OperatorSpec extends SparkSpec {
  import spark.implicits._

  test("mixtureSample: deterministic and nested under rate increases") {
    val docs = (1L to 200L).map(i =>
      (i, "text " + i, if (i % 3 == 0) "en" else "de")).toDF("doc_id", "text", "lang")
    def kept(enRate: Double, deRate: Double): Set[Long] =
      graft.operators.Curation.mixtureSample(
        docs, Map("en" -> enRate, "de" -> deRate), 0.0)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val low = kept(0.5, 0.2)
    assert(kept(0.5, 0.2) == low, "same rates must reproduce the same sample")
    val high = kept(0.9, 0.6)
    assert(low.subsetOf(high), "raising rates must only ADD documents")
    // rate 1.0 keeps everything of that language
    val full = kept(1.0, 0.0)
    assert(full == (3L to 200L by 3).toSet)
  }

  test("mixtureTemperature: flattens toward rare sources; thresholds off boundaries") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    val alpha = 0.5
    val target = 0.5
    // cross-libm safety guard (the AA-weight idiom): every libm-derived
    // intermediate the hash gate compares against must sit > 1e-6 from a
    // .5 rounding boundary, or a last-ulp pow() difference between
    // engines could flip a per-source threshold
    val counts = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nn = counts.values.sum.toDouble
    val ws = counts.map { case (src, n) =>
      val x = math.pow(n / nn, alpha) * 1e6
      val frac = x - math.floor(x)
      assert(math.abs(frac - 0.5) > 1e-6,
        s"source $src: w*1e6 = $x sits on a rounding boundary")
      src -> math.round(x).toDouble / 1e6
    }
    val wsum = ws.values.sum
    counts.foreach { case (src, n) =>
      val rate = math.min(1.0, target * nn * (ws(src) / wsum) / n)
      if (rate < 1.0) {
        val y = rate * 1e6
        val frac = y - math.floor(y)
        assert(math.abs(frac - 0.5) > 1e-6,
          s"source $src: threshold $y sits on a rounding boundary")
      }
    }
    // behavior: overall volume near the target fraction (realized counts
    // carry hash-gate binomial noise, so only the big total is checked),
    // and the DETERMINISTIC per-source keep RATES are monotone
    // non-increasing in source size — alpha<1 flattens the mix
    val kept = graft.operators.Curation.mixtureTemperature(docs, alpha, target)
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fracTotal = kept.values.sum.toDouble / nn
    assert(math.abs(fracTotal - target) < 0.1,
      s"overall kept fraction $fracTotal far from target $target")
    val rateOf = counts.map { case (src, n) =>
      src -> math.min(1.0, target * nn * (ws(src) / wsum) / n)
    }
    counts.toSeq.sortBy(_._2).sliding(2).foreach {
      case Seq((rare, _), (common, _)) =>
        assert(rateOf(rare) >= rateOf(common) - 1e-12,
          s"rarer source $rare rate ${rateOf(rare)} below " +
            s"more-common $common's ${rateOf(common)}")
      case _ => ()
    }
  }

  test("sourceQuota: caps per source, keeps the highest-quality docs") {
    // src A: 3 docs with increasing digit pollution (lower quality);
    // quota 2 must keep the two clean ones
    val docs = Seq(
      (1L, "clean wholesome prose entirely", "a"),
      (2L, "mostly clean prose here too", "a"),
      (3L, "99 111 000 22 333", "a"),
      (4L, "another source text", "b")).toDF("doc_id", "text", "source")
    val got = graft.operators.Curation.sourceQuota(docs, 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 4L))
  }

  test("Packing.contextWindows: straddling, exact-fill and empty docs") {
    // shard 0: docs of 3, 5, 8 tokens into windows of 4:
    //   d1 [0,3) -> win0 off0..3; d2 [3,8) -> win0 3..4 + win1 0..4;
    //   d3 [8,16) -> win2+win3 exactly (exact fill, no spill into win4)
    // zero-token d4 occupies nothing
    val docs = Seq((0L, 1L, 3L), (0L, 2L, 5L), (0L, 3L, 8L), (0L, 4L, 0L))
      .toDF("shard", "doc_id", "n_tokens")
    val got = graft.operators.Packing.contextWindows(docs, 4)
      .orderBy("doc_id", "win")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == Seq(
      (1L, 0L, 0L, 0L, 3L),
      (2L, 0L, 3L, 0L, 1L), (2L, 1L, 0L, 1L, 4L),
      (3L, 2L, 0L, 0L, 4L), (3L, 3L, 0L, 4L, 4L)))
    // packing invariant: every window except the shard's last is full
    val winSums = graft.operators.Packing.contextWindows(docs, 4)
      .groupBy("shard", "win")
      .agg(org.apache.spark.sql.functions.sum("n_tokens_in_win").as("s"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(winSums == Map(0L -> 4L, 1L -> 4L, 2L -> 4L, 3L -> 4L))
  }

  test("Quantiles matches a locally sorted computation, many partitions") {
    val vals = (1 to 997).map(i => ("g" + (i % 3), (i * 37 % 1000).toDouble))
    val df = vals.toDF("g", "v").repartition(13)
    val got = Quantiles.exactQuantiles(df, "g", "v", Seq(0.0, 0.25, 0.5, 0.9, 1.0))
      .collect().map(r => r.getString(0) -> (1 to 5).map(r.getDouble)).toMap
    vals.groupBy(_._1).foreach { case (g, xs) =>
      val sorted = xs.map(_._2).sorted
      val n = sorted.size
      Seq(0.0, 0.25, 0.5, 0.9, 1.0).zipWithIndex.foreach { case (p, i) =>
        val r = (n - 1) * p
        val lo = math.floor(r).toInt
        val hi = math.ceil(r).toInt
        val expected = sorted(lo) * (1 - (r - lo)) + sorted(hi) * (r - lo)
        assert(math.abs(got(g)(i) - expected) < 1e-9,
          s"group $g p$p: got ${got(g)(i)} expected $expected")
      }
    }
  }

  test("AsOfJoin: latest prior right row; ties at same ts resolved by tiebreak") {
    def ts(m: Int) = new Timestamp(1704067200000L + m * 60000L)
    val left = Seq((1L, ts(10), "p1"), (1L, ts(30), "p2"), (2L, ts(5), "p3"))
      .toDF("user_id", "ts", "tag")
    val right = Seq(
      (101L, 1L, ts(5)),   // before p1
      (102L, 1L, ts(10)),  // simultaneous with p1 (same ts)
      (103L, 1L, ts(25)),  // before p2
      (104L, 2L, ts(50)))  // after p3 -> p3 unmatched
      .toDF("event_id", "user_id", "ts")
    val out = AsOfJoin.asOfPrior(left, right, "user_id", "ts", "ts", "event_id")
      .select(col("tag"), col("asof.event_id"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out("p1") == 102L) // simultaneous right visible; higher id wins ties
    assert(out("p2") == 103L)
    assert(out("p3") == -1L)  // nothing prior
  }

  test("AsOfJoin.asOfNext: earliest at-or-after right; tolerance nulls far matches") {
    def ts(m: Int) = new Timestamp(1704067200000L + m * 60000L)
    val left = Seq((1L, ts(10), "c1"), (1L, ts(30), "c2"), (2L, ts(5), "c3"),
        (3L, ts(0), "c4"))
      .toDF("user_id", "ts", "tag")
    val right = Seq(
      (201L, 1L, ts(10)),  // simultaneous with c1 — included, wins over 202
      (202L, 1L, ts(10)),  // same ts: LOWEST id wins forward ties
      (203L, 1L, ts(31)),  // next after c2
      (204L, 2L, ts(500)), // far after c3 — nulled by tolerance
      (205L, 3L, ts(-5)))  // before c4 only -> unmatched
      .toDF("event_id", "user_id", "ts")
    def run(tol: Option[Long]) = AsOfJoin
      .asOfNext(left, right, "user_id", "ts", "ts", "event_id", tol)
      .select(col("tag"), col("asof.event_id"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    val unbounded = run(None)
    assert(unbounded("c1") == 201L) // simultaneous included, lowest id wins
    assert(unbounded("c2") == 203L)
    assert(unbounded("c3") == 204L) // no tolerance: far match kept
    assert(unbounded("c4") == -1L)  // nothing at-or-after
    val bounded = run(Some(3600L))
    assert(bounded("c1") == 201L && bounded("c2") == 203L)
    assert(bounded("c3") == -1L, "match past the tolerance must null out")
  }

  test("ZOrder.interleave matches a reference Morton encode") {
    import graft.operators.ZOrder
    def ref(a: Long, b: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L)((acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i + 1)) | (((b >> i) & 1L) << (2 * i)))
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 3L), (255L, 255L),
      (123456L, 654321L), ((1L << 20) - 1, (1L << 20) - 1))
    val df = cases.toDF("a", "b")
      .select(ZOrder.interleave(col("a"), col("b"), 20).as("z"))
    val got = df.collect().map(_.getLong(0)).toSeq
    val want = cases.map { case (a, b) => ref(a, b, 20) }
    assert(got == want)
    // masking: bits above the width are dropped, not smeared
    val masked = Seq(((1L << 25) + 7L, 1L)).toDF("a", "b")
      .select(ZOrder.interleave(col("a"), col("b"), 20).as("z"))
      .head().getLong(0)
    assert(masked == ref(7L, 1L, 20))
  }

  test("z-ordered layout prunes a user-narrow box query a time sort cannot") {
    import graft.operators.ZOrder
    // Dimensions must be normalized to comparable bit widths before
    // interleaving: a 150-value user dim against a 2^20-minute time dim
    // leaves every high user bit zero and the z-order degenerates to a
    // time sort. Scale both to 8 bits.
    val raw = Tables.events(spark, "/root/testdata/sf0.01")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("mnt", expr("unix_micros(ts) div 60000000"))
    val (mn, mx) = {
      val r = raw.agg(min(col("mnt")), max(col("mnt"))).head()
      (r.getLong(0), r.getLong(1))
    }
    val ev = raw.withColumn("t8",
      ((col("mnt") - mn) * 255L / (mx - mn + 1)).cast("long"))
    val zDir = java.nio.file.Files.createTempDirectory("graft_z").toString
    val tDir = java.nio.file.Files.createTempDirectory("graft_t").toString
    ZOrder.writeZOrdered(ev, "user_id", "t8", bits = 8, nFiles = 16, zDir)
    // baseline: same file count, time-sorted only (the 1-d layout)
    ev.repartitionByRange(16, col("mnt")).sortWithinPartitions(col("mnt"))
      .write.mode("overwrite").parquet(tDir)
    def scanRows(path: String): Long = {
      // narrow in USER, wide in time — the box a time sort cannot prune
      val q = spark.read.parquet(path).filter(col("user_id").between(10, 20))
      q.collect()
      val scan = q.queryExecution.executedPlan.collectLeaves().head
      scan.metrics("numOutputRows").value
    }
    val (zRows, tRows) = (scanRows(zDir), scanRows(tDir))
    info(s"scan rows after row-group pruning: z-ordered=$zRows time-sorted=$tRows")
    assert(zRows * 2 <= tRows,
      s"z-order layout should at least halve scanned rows ($zRows vs $tRows)")
  }

  test("Upsert.mergeInto: updates replace, inserts add, rest passes through") {
    import graft.operators.Upsert
    val target = Seq((1L, "a", 10L), (2L, "b", 10L), (3L, "c", 10L))
      .toDF("id", "v", "ver")
    val updates = Seq(
      (2L, "b2", 11L),  // update
      (2L, "b3", 12L),  // later duplicate update for the same key — wins
      (4L, "d", 11L))   // insert
      .toDF("id", "v", "ver")
    val got = Upsert.mergeInto(target, updates, "id", "ver")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got == Map(
      1L -> ("a", 10L), 2L -> ("b3", 12L), 3L -> ("c", 10L), 4L -> ("d", 11L)))
    // an update always beats target even with a LOWER tiebreak value
    val demote = Seq((1L, "a0", 1L)).toDF("id", "v", "ver")
    val got2 = Upsert.mergeInto(target, demote, "id", "ver")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got2(1L) == "a0", "update row must win regardless of tiebreak")
  }

  test("DataQuality.report: per-rule violation counts from one scan") {
    import graft.operators.DataQuality
    import graft.operators.DataQuality.Rule
    val df = Seq((1L, 5.0, "a"), (2L, -1.0, "b"), (3L, -2.0, "zz"),
        (4L, 0.0, "a")).toDF("id", "v", "cat")
    val rep = DataQuality.report(df, Seq(
      Rule("neg_v", col("v") < 0),
      Rule("bad_cat", !col("cat").isin("a", "b")),
      Rule("null_id", col("id").isNull)))
    val rows = rep.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(rows("neg_v") == ((4L, 2L, 0.5)))
    assert(rows("bad_cat") == ((4L, 1L, 0.25)))
    assert(rows("null_id") == ((4L, 0L, 0.0)))
    // all rules share ONE aggregate over one scan — no per-rule passes
    val nAggs = rep.queryExecution.executedPlan.toString
      .linesIterator.count(_.trim.startsWith("+- HashAggregate"))
    assert(nAggs <= 2, s"expected one partial+final aggregate pair, got $nAggs")
  }

  test("partitioned write enables partition pruning at read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables.documents(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("lang") === "en")
      .agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"no partition pruning in plan:\n$plan")
    val full = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("lang") === "en").count()
    assert(q.head().getLong(0) == full)
  }

  test("observe() exposes pipeline metrics without a second pass") {
    val df = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .observe("li_metrics", count(lit(1)).as("rows"),
        sum(col("l_quantity")).as("qty"))
      .filter(col("l_quantity") > 25)
    // metrics attach to the execution that ran; count() would build its own
    val filtered = df.collect().length
    val m = df.queryExecution.observedMetrics("li_metrics")
    assert(m.getAs[Long]("rows") > filtered) // metrics observed pre-filter
    assert(m.getAs[Double]("qty") > 0)
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    val o = Tables.orders(spark, "/root/testdata/sf0.001")
    val l = Tables.lineitem(spark, "/root/testdata/sf0.001")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/b_orders").saveAsTable("b_orders")
    l.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/b_lineitem").saveAsTable("b_lineitem")
    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(sum("l_quantity").as("q"))
    val plan = joined.queryExecution.executedPlan.toString
    // bucketed co-located join: no shuffle before the join itself
    // (the only exchange allowed is the post-join aggregation one)
    val joinPart = plan.split("SortMergeJoin|ShuffledHashJoin").drop(1).mkString
    assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey") &&
      !joinPart.contains("Exchange hashpartitioning(o_orderkey"),
      s"join inputs were shuffled:\n$plan")
    assert(joined.count() > 0)
  }

  test("Keywords: hand-computed tfidf, tie broken by term, stopwords rank out") {
    // N=3; df: apple 1, banana 2, cherry 2, date 1
    val docs = Seq(("d1", "apple apple banana"), ("d2", "banana cherry"),
      ("d3", "cherry cherry cherry date")).toDF("doc_id", "text")
    val p = graft.operators.Indexer.postings(docs)
    val got = graft.operators.Keywords
      .topKeywords(p, graft.operators.Indexer.termDf(p),
        graft.operators.Indexer.docInfo(docs), k = 2)
      .orderBy("doc_id", "rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getDouble(3))).toSeq
    def g(x: Double): Double = math.round(x * 1e6) / 1e6
    assert(got == Seq(
      ("d1", 1L, "apple", g(2.0 / 3 * math.log(3.0))),
      ("d1", 2L, "banana", g(1.0 / 3 * math.log(1.5))),
      // d2: banana and cherry tie exactly (1/2·ln(3/2)) — term asc decides
      ("d2", 1L, "banana", g(0.5 * math.log(1.5))),
      ("d2", 2L, "cherry", g(0.5 * math.log(1.5))),
      ("d3", 1L, "cherry", g(3.0 / 4 * math.log(1.5))),
      ("d3", 2L, "date", g(0.25 * math.log(3.0)))))
    // a term in EVERY doc gets ln(1) = 0: it can never beat a distinctive one
    val docs2 = Seq(("a", "the apple"), ("b", "the pear")).toDF("doc_id", "text")
    val p2 = graft.operators.Indexer.postings(docs2)
    val top1 = graft.operators.Keywords
      .topKeywords(p2, graft.operators.Indexer.termDf(p2),
        graft.operators.Indexer.docInfo(docs2), k = 1)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(top1 == Map("a" -> "apple", "b" -> "pear"))
  }

  test("QualityLm: hand-computed nll; common-token doc scores below rare-token doc") {
    // corpus: a×3, b×1, c×1 (total 5)
    val docs = Seq(("d1", "a a b"), ("d2", "a c")).toDF("doc_id", "text")
    val got = graft.operators.QualityLm.unigramNllOfDocs(docs)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def micro(x: Double): Long = math.round(x * 1e6)
    val d1 = (micro(2 * math.log(5.0 / 3)) + micro(math.log(5.0))) / 1e6 / 3
    val d2 = (micro(math.log(5.0 / 3)) + micro(math.log(5.0))) / 1e6 / 2
    assert(got("d1")._1 == 3L && got("d2")._1 == 2L)
    assert(math.abs(got("d1")._2 - d1) < 1e-12)
    assert(math.abs(got("d2")._2 - d2) < 1e-12)
    // all-commonest-token doc is the lowest-surprisal doc in its corpus
    val docs2 = Seq(("common", "x x x x"), ("mixed", "x x y z"),
      ("rare", "q w y z")).toDF("doc_id", "text")
    val nll = graft.operators.QualityLm.unigramNllOfDocs(docs2)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(nll("common") < nll("mixed") && nll("mixed") < nll("rare"))
  }

  test("PageRank: hand-computed path graph; hub ranks highest; repartition-invariant") {
    // path a-b-c (ids 1-2-3), deg 1/2/1, micro-units:
    //   iter1: shares 1000000/500000/1000000 -> r = (575000, 1850000, 575000)
    //   iter2: shares 575000/925000/575000  -> r = (936250, 1127500, 936250)
    val path = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val got = graft.operators.PageRank.pagerank(path, iterations = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(1L -> (1L, 936250L), 2L -> (2L, 1127500L),
      3L -> (1L, 936250L)))
    // star: the hub out-ranks every leaf; leaves all tie exactly
    val star = (2L to 9L).map(i => (1L, i)).toDF("a", "b")
    val ranks = graft.operators.PageRank.pagerank(star, iterations = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert((2L to 9L).forall(i => ranks(1L) > ranks(i)))
    assert((2L to 9L).map(ranks).toSet.size == 1)
    // integer arithmetic: bit-identical under a different input layout
    val again = graft.operators.PageRank
      .pagerank(path.repartition(7), iterations = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(again == got)
  }

  test("MoreLikeThis: identical doc ranks first; disjoint doc is no candidate") {
    val docs = Seq(
      (1L, "apple banana cherry"), (2L, "apple banana grape"),
      (3L, "kiwi mango peach"), (4L, "apple banana cherry")
    ).toDF("doc_id", "text")
    val p = graft.operators.Indexer.postings(docs)
    val w = graft.operators.MoreLikeThis.weights(
      p, graft.operators.Indexer.termDf(p), graft.operators.Indexer.docInfo(docs))
    val got = graft.operators.MoreLikeThis
      .moreLikeThis(w, Seq(1L).toDF("doc_id"), mTerms = 8, k = 5)
      .orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    // d4 is d1 verbatim -> cosine 1 (up to sqrt rounding), d2 shares 2 of 3
    // terms, d3 shares none and must not appear at all
    assert(got.map(_._2) == Seq(4L, 2L))
    assert(math.abs(got(0)._3 - 1.0) < 1e-12)
    assert(got(1)._3 < got(0)._3 && got(1)._3 > 0)
  }

  test("Funnel: strictly-ordered stages, not co-occurrence") {
    def t(sec: Int) = new Timestamp(sec * 1000L)
    val ev = Seq(
      ("u1", "view", t(1)), ("u1", "click", t(2)), ("u1", "purchase", t(3)),
      ("u2", "click", t(1)), ("u2", "view", t(2)), // click BEFORE view: no stage 2
      ("u3", "view", t(1)), ("u3", "purchase", t(2)), // skips click: no stage 3
      ("u4", "view", t(1)), ("u4", "click", t(1)) // same ts: strict > rejects
    ).toDF("user_id", "event_type", "ts")
    val got = graft.operators.Funnel
      .funnel(ev, Seq("view", "click", "purchase"))
      .orderBy("stage_idx")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == Seq((1L, "view", 4L, 1.0), (2L, "click", 1L, 0.25),
      (3L, "purchase", 1L, 0.25)))
    // empty first stage: conversions are a defined 0.0, not null
    val none = graft.operators.Funnel
      .funnel(ev, Seq("signup", "purchase")).orderBy("stage_idx")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSeq
    assert(none == Seq((1L, 0L, 0.0), (2L, 0L, 0.0)))
  }

  test("packShuffle: a deterministic permutation of the packed windows") {
    val dir = "/root/testdata/sf0.001"
    val wins = graft.queries.TextAnalysisQueries.packWindows(spark, dir)
      .select("shard", "win").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val shuffled = graft.queries.TextAnalysisQueries.packShuffle(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    // every packed window appears exactly once (a permutation, no loss)
    assert(shuffled.map(s => (s._3, s._4)).toSet == wins)
    assert(shuffled.size == wins.size)
    // positions are dense 0..n-1 within each batch, batches within range
    shuffled.groupBy(_._1).foreach { case (batch, rows) =>
      assert(batch >= 0 && batch < 16)
      assert(rows.map(_._2).sorted == (0L until rows.size).toSeq)
    }
    // deterministic: a second run is byte-identical
    val again = graft.queries.TextAnalysisQueries.packShuffle(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(shuffled == again)
  }

  test("qualityClassifier: per-token additive logit, empty docs excluded") {
    import graft.operators.QualityClassifier
    val docs = Seq((1L, "spark"), (2L, "spark spark"), (3L, ""))
      .toDF("doc_id", "text")
    val out = QualityClassifier.score(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(!out.contains(3L))
    assert(out(1L)._1 == 1L && out(2L)._1 == 2L)
    // doubling the token doubles the logit (pure sum of bucket weights)
    assert(out(2L)._2 == 2 * out(1L)._2)
  }

  test("importanceWeights: target-characteristic content scores higher") {
    import graft.operators.Curation
    // targets are "x y" docs; doc 30 looks like the target, doc 31 doesn't
    val docs = ((1L to 20L).map(i => (i, "x y x y x y", "tgt")) ++
        (21L to 29L).map(i => (i, "p q p q p q", "raw")) ++
        Seq((30L, "x y x y", "raw"), (31L, "p q p q", "raw")))
      .toDF("doc_id", "text", "source")
    val imp = Curation.importanceWeights(docs, "doc_id", "text",
        col("source") === "tgt")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(imp(30L) > imp(31L))
    assert(imp(30L) > 0 && imp(31L) < 0)
    // single-token docs have no bigram features and are absent
    val one = Curation.importanceWeights(
      Seq((1L, "x y", "t"), (2L, "z", "r")).toDF("doc_id", "text", "source"),
      "doc_id", "text", col("source") === "t")
    assert(one.collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("bpeTrainer: hand-computed merges, early stop when no pairs remain") {
    import graft.operators.BpeTrainer
    // tokens: ab(x2), abc(x1). Round 1: pair (a,b) freq 3 wins -> "ab";
    // round 2: only pair left is (ab, c) freq 1 -> "abc"; round 3: no
    // pairs anywhere -> early return with 2 rows despite rounds=6.
    val docs = Seq((1L, "ab ab abc")).toDF("doc_id", "text")
    val rows = BpeTrainer.trainOnDocs(docs, "text", 6)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(rows == Seq(
      (1L, "a", "b", "ab", 3L),
      (2L, "ab", "c", "abc", 1L)))
  }

  test("bpeTrainer: adjacent pair occurrences both merge in one round") {
    import graft.operators.BpeTrainer
    // "abab": after (a,b) wins, BOTH occurrences in the same word must
    // merge ("|ab| |ab|"), so round 2's best pair is (ab, ab).
    val docs = Seq((1L, "abab abab ab")).toDF("doc_id", "text")
    val rows = BpeTrainer.trainOnDocs(docs, "text", 2)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(rows == Seq(
      (1L, "a", "b", "ab", 5L),
      (2L, "ab", "ab", "abab", 2L)))
  }

  test("bpeTrainer.segmentUnits: unit counts shrink as rules apply in order") {
    import graft.operators.BpeTrainer
    val docs = Seq((1L, "abab abab ab")).toDF("doc_id", "text")
    val rules = BpeTrainer.learnRules(BpeTrainer.docFreqs(docs, "text"), 2)
    // with both rules every word is one unit; with only the first,
    // "abab" is [ab][ab] = 2 units
    val full = BpeTrainer.segmentUnits(docs, "doc_id", "text", rules)
      .head()
    assert((full.getLong(1), full.getLong(2)) == ((3L, 3L)))
    val partial = BpeTrainer
      .segmentUnits(docs, "doc_id", "text", rules.take(1)).head()
    assert((partial.getLong(1), partial.getLong(2)) == ((3L, 5L)))
  }

  test("PositionProximity kernels match the quadratic pair formulation") {
    import graft.plans.PositionProximity
    // hand vectors incl. window-boundary hits, interleaved runs, and a
    // no-close-pair doc; arrays sorted as the postings contract requires
    val cases = Seq(
      (Seq(1, 5, 9), Seq(3, 20)),          // min 2; within-5 pairs: (1,3)(5,3)...
      (Seq(0), Seq(100)),                  // far apart: min 100, none within
      (Seq(2, 4, 6, 8), Seq(3, 5, 7)),     // dense interleave
      (Seq(10, 11, 12), Seq(5, 17)),       // both sides exactly at window edge
      (Seq(7), Seq(7 + 5)))                // boundary: d == window counts
    val w = 5
    val df = cases.zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }.toDF("id", "pa", "pb")
      .select(col("id"),
        PositionProximity.minAbsDiff(col("pa"), col("pb")).as("md"),
        PositionProximity.pairsWithin(col("pa"), col("pb"), w).as("nw"))
    val got = df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    cases.zipWithIndex.foreach { case ((a, b), i) =>
      val dists = for (x <- a; y <- b) yield math.abs(x.toLong - y.toLong)
      val expect = (dists.min, dists.count(_ <= w).toLong)
      assert(got(i.toLong) == expect, s"case $i: got ${got(i.toLong)}, want $expect")
    }
  }

  test("compactDayPartitions: heavy partitions collapse to one file, rows unchanged") {
    import graft.queries.LayoutQueries
    val dir = "/root/testdata/sf0.001"
    val base = graft.ScratchDirs.fresh("graft_layout", "compact_spec").toString
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
    (0 to 2).foreach { i =>
      ev.filter(col("event_id") % 3 === i).drop("event_id")
        .write.mode("append").partitionBy("day").parquet(base)
    }
    def filesPerDay: Map[String, Int] = {
      val root = new org.apache.hadoop.fs.Path(base)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(root).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("day="))
        .map(st => st.getPath.getName ->
          fs.listStatus(st.getPath)
            .count(_.getPath.getName.endsWith(".parquet"))).toMap
    }
    val before = filesPerDay
    assert(before.values.max > 2, s"appends did not fragment: $before")
    val rowsBefore = spark.read.parquet(base)
      .groupBy("day", "event_type").count()
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet
    val compacted = LayoutQueries.compactDayPartitions(spark, base,
      maxFilesPerPartition = 2)
    assert(compacted.nonEmpty, "nothing compacted despite fragmentation")
    val after = filesPerDay
    compacted.foreach { d =>
      assert(after(s"day=$d") == 1,
        s"partition day=$d still has ${after(s"day=$d")} files after compaction")
    }
    val rowsAfter = spark.read.parquet(base)
      .groupBy("day", "event_type").count()
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet
    assert(rowsAfter == rowsBefore, "compaction changed table contents")
  }

  test("additiveRefresh merges late data into stored partials; untouched keys pass through") {
    import graft.operators.MaterializedView
    val mv = Seq(("click", "2024-01-01", 5L, 100L), ("view", "2024-01-01", 3L, 30L))
      .toDF("event_type", "day", "n", "tv")
    // delta carries a LATE batch for an already-materialized key plus a new key
    val delta = Seq(("click", "2024-01-01", 2L, 50L), ("view", "2024-01-02", 1L, 10L))
      .toDF("event_type", "day", "n", "tv")
    val out = MaterializedView
      .additiveRefresh(mv, delta, Seq("event_type", "day"), Seq("n", "tv"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(out == Map(
      ("click", "2024-01-01") -> ((7L, 150L)),
      ("view", "2024-01-01") -> ((3L, 30L)),
      ("view", "2024-01-02") -> ((1L, 10L))))
  }

  test("fuzzySearch recovers a one-edit typo and matches the corrected query") {
    import graft.operators.{Indexer, Search}
    // controlled vocabulary: no OTHER term sits within 1 edit of "alpho",
    // so the expansion is exactly {alpha} and fuzzy(typo) == exact(fixed)
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha alpha delta"),
      (3L, "beta gamma delta")).toDF("doc_id", "text")
    val p = Indexer.postings(docs)
    val (tdf, di) = (Indexer.termDf(p), Indexer.docInfo(docs))
    val fuzzy = Search.fuzzySearch(spark, "alpho", p, tdf, di, k = 5)
      .select("doc_id", "score").collect().map(r => (r.get(0), r.getDouble(1)))
    val exact = Search.search(spark, "alpha", p, tdf, di, k = 5)
      .select("doc_id", "score").collect().map(r => (r.get(0), r.getDouble(1)))
    assert(fuzzy.nonEmpty && fuzzy.toSeq == exact.toSeq)
    // a typo 2 edits from every vocab term expands to nothing — empty result
    val far = Search.fuzzySearch(spark, "zzzzq", p, tdf, di, k = 5)
    assert(far.isEmpty)
  }

  test("phrase_bigram_index: next-word-index plan equals the positional 3-way join plan") {
    // two different physical strategies, one semantics — the bigram-index
    // plan must reproduce the positional plan row-for-row
    val dir = "/root/testdata/sf0.01" // sf0.001's corpus lacks the 3-gram
    val viaIndex = graft.queries.TextIndexQueries
      .phraseBigramIndex(spark, dir).collect().map(r => (r.getLong(0), r.getLong(1)))
    val viaPositions = graft.queries.TextIndexQueries
      .phraseSearch3(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(viaIndex.nonEmpty, "phrase should occur in the fixture corpus")
    assert(viaIndex.toSeq == viaPositions.toSeq)
  }

  test("bm25_fielded: title hits outrank body-only hits of equal body evidence") {
    // same body tf everywhere; docs whose TITLE (50-char prefix) contains a
    // query term must score strictly above those where the term appears
    // only past the prefix
    val out = graft.queries.TextIndexQueries
      .bm25Fielded(spark, "/root/testdata/sf0.001").collect()
    assert(out.length == 10)
    val scores = out.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // the top hit's displayed title carries at least one flagship term
    val topTitle = out.head.getString(1).toLowerCase
    assert(graft.queries.TextIndexQueries.SearchTerms.exists(topTitle.contains),
      s"top title '$topTitle' has no query term — title boost not engaged")
  }

  test("rangeJoinBins: binned equi-join rewrite == naive BETWEEN theta join") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.EventQueries.rangeJoinBins(spark, dir).collect()
    assert(got.nonEmpty, "range join produced no windows")
    // naive form: same anchors, plain theta join (BNL) — the semantics the
    // oracle states; must agree row-for-row with the scale rewrite
    import org.apache.spark.sql.expressions.Window
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("es"),
        col("user_id"), col("event_type"), col("value"))
    val byTypeDay = Window.partitionBy(col("event_type"), col("day"))
      .orderBy(col("value").desc, col("es").asc, col("event_id").asc)
    val anchors = ev
      .withColumn("day", expr("es div 86400000000"))
      .withColumn("rn", row_number().over(byTypeDay))
      .where(col("rn") === 1)
      .select(col("event_id").as("win_id"), col("event_type").as("win_type"),
        (col("es") - 1800000000L).as("lo"), (col("es") + 1800000000L).as("hi"))
    val naive = anchors.join(ev, col("es").between(col("lo"), col("hi")))
      .groupBy(col("win_id"), col("win_type"))
      .agg(count(lit(1)).cast("long").as("n_events"),
        countDistinct(col("user_id")).cast("long").as("n_users"),
        graft.Money.sumCents(col("value")).as("total_value"))
      .orderBy("win_id")
      .collect()
    assert(got.toSeq == naive.toSeq)
  }

  test("sessionConcurrency: two-level prefix sum == independent minute sweep") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.EventQueries.sessionConcurrency(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    // independent oracle: sessions in memory, then concurrency counted at
    // EVERY minute between the first and last boundary bin (not only at
    // delta bins) — this samples the carried-in value at each day start and
    // covers days with open sessions but no deltas, so it would catch the
    // day-boundary underreporting a delta-bin-only sweep shares with the
    // implementation
    val rows = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("es"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val bounds = rows.groupBy(_._1).values.flatMap { evs =>
      val sorted = evs.sortBy(e => (e._3, e._2)).toList
      // split on >30 min gaps
      val sessions = sorted.tail.foldLeft(List(List(sorted.head))) {
        case (acc @ cur :: rest, e) =>
          if (e._3 - cur.head._3 > 1800000000L) List(e) :: acc
          else (e :: cur) :: rest
        case (Nil, e) => List(List(e))
      }
      sessions.map { ses =>
        val ts = ses.map(_._3)
        (ts.min / 60000000L, ts.max / 60000000L)
      }
    }.toList
    val minBin = bounds.map(_._1).min
    val maxBin = bounds.map(_._2 + 1).max
    val n = (maxBin - minBin + 1).toInt
    val diff = new Array[Long](n + 1)
    bounds.foreach { case (sb, eb) =>
      diff((sb - minBin).toInt) += 1L
      diff((eb + 1 - minBin).toInt) -= 1L
    }
    var run = 0L
    val maxPerDay = scala.collection.mutable.Map[Long, Long]()
    var m = 0
    while (m < n) {
      run += diff(m)
      val day = Math.floorDiv(minBin + m, 1440L)
      maxPerDay(day) = math.max(maxPerDay.getOrElse(day, Long.MinValue), run)
      m += 1
    }
    assert(got == maxPerDay.toMap)
  }
}
