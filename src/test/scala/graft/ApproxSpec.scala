package graft

import org.apache.spark.sql.functions._

/** Error-bound and determinism guards for the shapes the DuckDB oracle
  * cannot hash (engine-specific RNG / sketch internals). These live
  * OUTSIDE the driver registry — the registry carries deterministic
  * md5-gate twins (sample_hash, sample_stratified_hash, prep_pipeline)
  * that oracle exactly — and this spec owns the RNG/sketch variants
  * directly: estimates land within their documented error, seeded
  * samples reproduce exactly. "No oracle" never degrades into
  * "unchecked".
  */
class ApproxSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private val rq = graft.queries.RelationalQueries

  test("approx_percentile lands within 2% of the exact distributed quantiles") {
    val exact = graft.operators.Quantiles.exactQuantiles(
      Tables.lineitem(spark, dir).select(col("l_linestatus"), col("l_extendedprice")),
      "l_linestatus", "l_extendedprice", Seq(0.25, 0.5, 0.75, 0.95))
      .collect().map(r => r.getString(0) ->
        (1 to 4).map(r.getDouble)).toMap
    val approx = rq.percentilesApprox(spark, dir)
      .collect().map(r => r.getString(0) ->
        (1 to 4).map(r.getDouble)).toMap
    assert(approx.keySet == exact.keySet)
    for ((g, aps) <- approx; (a, e) <- aps.zip(exact(g))) {
      assert(math.abs(a - e) / e <= 0.02,
        f"group $g: approx $a%.2f vs exact $e%.2f drifted ${math.abs(a - e) / e * 100}%.2f%%")
    }
  }

  test("approx_count_distinct lands within 5% of exact distinct counts") {
    val exact = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("p"),
        countDistinct(col("l_suppkey")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = rq.distinctApprox(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet == exact.keySet)
    for ((g, (ap, as_)) <- approx; (ep, es) = exact(g)) {
      assert(math.abs(ap - ep).toDouble / ep <= 0.05, s"$g parts: $ap vs $ep")
      assert(math.abs(as_ - es).toDouble / es <= 0.05, s"$g supps: $as_ vs $es")
    }
  }

  test("seeded Bernoulli sample reproduces exactly and hits its fraction") {
    def keys() = rq.sampleBernoulli(spark, dir)
      .select("l_orderkey", "l_linenumber")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val k1 = keys()
    assert(k1 == keys(), "same seed must reproduce the identical sample")
    val total = Tables.lineitem(spark, dir).count()
    val frac = k1.size.toDouble / total
    // 0.1 target; binomial 4-sigma band
    val sigma = math.sqrt(0.1 * 0.9 / total)
    assert(math.abs(frac - 0.1) <= 4 * sigma,
      f"sample fraction $frac%.4f outside 0.1 +/- ${4 * sigma}%.4f")
  }

  test("stratified sample reproduces exactly and respects per-stratum rates") {
    def rows() = rq.sampleStratified(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val r1 = rows()
    assert(r1 == rows(), "same seed must reproduce the identical sample")
    val strata = Tables.lineitem(spark, dir).groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val target = Map("A" -> 0.05, "N" -> 0.2, "R" -> 0.05)
    val got = r1.groupBy(_._3).view.mapValues(_.size.toDouble).toMap
    for ((flag, rate) <- target) {
      val n = strata(flag)
      val frac = got.getOrElse(flag, 0.0) / n
      val sigma = math.sqrt(rate * (1 - rate) / n)
      assert(math.abs(frac - rate) <= 4 * sigma,
        f"stratum $flag: $frac%.4f outside $rate +/- ${4 * sigma}%.4f")
    }
  }

  test("bloom filter admits every member and keeps false positives under 10%") {
    val rows = Queries.all("bloom_prefilter")(spark, dir).collect()
    val (orders, bloom, exact, fp) = rows.map(r =>
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .reduce((a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3, a._4 + b._4))
    // no false negatives by construction: everything exact admits, bloom admits
    assert(bloom - fp == exact,
      s"bloom pass minus false positives must equal the exact semi join ($bloom - $fp != $exact)")
    assert(bloom >= exact, "bloom filter dropped a member (false negative)")
    val nonMembers = orders - exact
    assert(fp.toDouble / nonMembers <= 0.10,
      f"false-positive rate ${fp.toDouble / nonMembers}%.4f above the geometry's budget")
  }

  test("count-min never underestimates and stays within the w-collision bound") {
    val rows = Queries.all("cms_estimate")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val total = rows.map(_._2).sum
    rows.foreach { case (u, exact, est) =>
      assert(est >= exact, s"user $u: CMS underestimated ($est < $exact)")
      // Markov bound with d=4, w=64: P[err > 2e/w * total] < (1/2)^... —
      // deterministic check uses the hard eN/w ceiling times a slack of 4.
      assert(est - exact <= 4.0 * math.E * total / 64,
        s"user $u: overestimate ${est - exact} beyond the sketch's error budget")
    }
    assert(rows.exists { case (_, exact, est) => est > exact },
      "w=64 over 150 keys must produce at least one visible collision " +
        "(otherwise the estimate path is not being exercised)")
  }

  test("HLL shard sketches: union estimate within 2%, equal to a full rebuild") {
    import org.apache.spark.sql.DataFrame
    val toks = Tables.documents(spark, dir).select(col("source"),
      explode(graft.functions.Tokenizer.tokenize(col("text"))).as("tok"))
    def est(df: DataFrame): Double = df.collect()(0).getDouble(0)
    // merged per-shard sketches == one sketch over everything (mergeability:
    // union of register maxima is the register maxima of the union)
    val merged = est(toks.groupBy(col("source"))
      .agg(hll_sketch_agg(col("tok"), 12).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).cast("double")))
    val rebuilt = est(toks.agg(
      hll_sketch_estimate(hll_sketch_agg(col("tok"), 12)).cast("double")))
    assert(merged == rebuilt,
      f"union-of-shards $merged%.1f != single-pass sketch $rebuilt%.1f")
    val exact = toks.select(col("tok")).distinct().count().toDouble
    assert(math.abs(merged - exact) / exact <= 0.02,
      f"HLL estimate $merged%.1f drifted >2%% from exact $exact%.1f")
    // repartitioning must not move the estimate (order/placement invariance
    // is what makes stored per-shard sketches trustworthy)
    val reparted = est(toks.repartition(7, col("tok")).agg(
      hll_sketch_estimate(hll_sketch_agg(col("tok"), 12)).cast("double")))
    assert(reparted == rebuilt, "estimate changed under repartitioning")
  }
}
