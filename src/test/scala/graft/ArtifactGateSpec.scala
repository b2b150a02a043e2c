package graft

import org.scalatest.funsuite.AnyFunSuite

/** The stale-artifact gate (VERDICT r8 #1c). Two consecutive rounds
  * committed a PLANAUDIT whose registry count lagged late query
  * additions, so the "0 flagged" claim silently covered a subset. Prose
  * discipline failed twice; this makes the drift a named test failure:
  * the NEWEST committed PLANAUDIT_r*.txt must (a) exist, (b) say
  * "0 flagged", and (c) have audited exactly `Queries.all.size` queries.
  * Adding a query without re-running `graft.PlanAudit` and committing the
  * refreshed artifact now fails `sbt test`.
  *
  * No SparkSession — pure file parse, runs in milliseconds.
  */
class ArtifactGateSpec extends AnyFunSuite {

  private val root = new java.io.File(".")

  private def newestAudit: java.io.File = {
    val audits = root.listFiles()
      .filter(f => f.getName.matches("PLANAUDIT_r\\d+\\.txt"))
    assert(audits.nonEmpty, "no committed PLANAUDIT_r*.txt artifact")
    audits.maxBy(f => f.getName.stripPrefix("PLANAUDIT_r")
      .stripSuffix(".txt").toInt)
  }

  test("newest PLANAUDIT artifact covers the FULL registry with zero flags") {
    val f = newestAudit
    val lines = scala.io.Source.fromFile(f, "UTF-8").getLines().toVector
    val summary = lines.reverse.find(_.startsWith("audit done:"))
      .getOrElse(fail(s"${f.getName} has no 'audit done:' summary line"))
    val m = "audit done: (\\d+) flagged of (\\d+)".r
      .findFirstMatchIn(summary)
      .getOrElse(fail(s"unparseable summary in ${f.getName}: $summary"))
    val (flagged, audited) = (m.group(1).toInt, m.group(2).toInt)
    assert(flagged == 0,
      s"${f.getName} reports $flagged flagged plans — fix or allowlist " +
        "with a boundedness reason, then re-run graft.PlanAudit")
    assert(audited == Queries.all.size,
      s"${f.getName} audited $audited queries but the registry has " +
        s"${Queries.all.size} — re-run graft.PlanAudit and commit the " +
        "refreshed artifact (stale-audit gate, VERDICT r8 #1c)")
  }

  test("fixture-scaled bench rows are registered queries") {
    // Bench prices deliberately-fixture-scaled rows in the artifact; a
    // renamed/removed row here would silently stop netting it out
    Bench.FixtureScaled.foreach(c =>
      assert(Queries.all.contains(c),
        s"fixture-scaled row '$c' is not a registered query"))
  }

  test("driver round artifacts are committed through the previous round") {
    // VERDICT r10/r11 hygiene item: the driver writes BENCH_r{N}.json /
    // CORRECTNESS_r{N}.json at round close; round N+1 must COMMIT them at
    // open. The newest committed driver artifact may lag the newest local
    // sweep (BENCH_LOCAL_r{N+1} lands mid-round, before the driver's
    // N+1 artifacts exist) by at most one round.
    import scala.sys.process._
    val tracked =
      try Process(Seq("git", "ls-files"), root).!!.linesIterator.toSet
      catch { case _: Throwable => cancel("git unavailable in this checkout") }
    def newestTracked(re: String): Int = tracked
      .flatMap(re.r.findFirstMatchIn(_).map(_.group(1).toInt))
      .maxOption.getOrElse(0)
    val localNewest = root.listFiles()
      .flatMap(f => "BENCH_LOCAL_r(\\d+)\\.json".r
        .findFirstMatchIn(f.getName).map(_.group(1).toInt))
      .maxOption.getOrElse(0)
    Seq("BENCH_r0*(\\d+)\\.json" -> "BENCH_r*",
        "CORRECTNESS_r0*(\\d+)\\.json" -> "CORRECTNESS_r*").foreach {
      case (re, label) =>
        val committed = newestTracked("^" + re + "$")
        assert(committed >= localNewest - 1,
          s"newest committed $label is round $committed but the local " +
            s"sweep is at round $localNewest — commit the driver's round " +
            "artifacts (VERDICT r11 'what's wrong' #4)")
    }
  }

  test("bench canaries are registered queries") {
    // Bench.main resolves canaries through the registry at startup; a
    // renamed/removed canary would kill the whole sweep at its first line
    Bench.Canaries.foreach(c =>
      assert(Queries.all.contains(c),
        s"bench canary '$c' is not a registered query"))
  }

  test("newest BENCH_LOCAL artifact benches the FULL registry") {
    val benches = root.listFiles()
      .filter(f => f.getName.matches("BENCH_LOCAL_r\\d+\\.json"))
    assert(benches.nonEmpty, "no committed BENCH_LOCAL_r*.json artifact")
    val f = benches.maxBy(b => b.getName.stripPrefix("BENCH_LOCAL_r")
      .stripSuffix(".json").toInt)
    val text = scala.io.Source.fromFile(f, "UTF-8").mkString
    // the queries object is flat {"name":sec,...}: count its keys without
    // a JSON library (none on the test classpath by design)
    val at = text.indexOf("\"queries\":{")
    assert(at >= 0, s"${f.getName} has no \"queries\" object — " +
      "not a graft.Bench JSON line")
    val inner = text.substring(at + 11).takeWhile(_ != '}')
    assert(!inner.contains('{'),
      s"${f.getName}'s queries object is not flat — the key-count parse " +
        "below would miscount; fix the parser if Bench's shape changed")
    val n = if (inner.trim.isEmpty) 0 else inner.count(_ == ':')
    assert(n == Queries.all.size,
      s"${f.getName} benches $n queries but the registry has " +
        s"${Queries.all.size} — re-run graft.Bench at sf0.1 and commit " +
        "the refreshed artifact (stale-artifact gate, VERDICT r8 #1c)")
    // r11+: the artifact must carry its own in-sweep variance signal
    // (start/mid/end canary checkpoints + max_drift_ratio), so bench
    // movements are adjudicated from the artifact instead of a fresh
    // same-machine tree A/B every round (VERDICT r10 "what's wrong" #1)
    assert(text.contains("\"canary\":") && text.contains("max_drift_ratio"),
      s"${f.getName} has no canary variance block — re-run graft.Bench " +
        "(the canary instrumentation landed in r11)")
    // r12 (ADVICE r11): key presence is not enough — a canary that FAILED
    // mid-sweep writes the -1.0 sentinel, and such an artifact carries no
    // usable variance signal; reject it like a stale one. A real ratio is
    // max/min of positive times, so >= 1.0 by construction.
    Seq("max_drift_ratio", "mid_end_drift_ratio").foreach { key =>
      val v = ("\"" + key + "\":(-?[0-9.]+)").r.findFirstMatchIn(text)
        .getOrElse(fail(s"${f.getName}: unparseable $key"))
        .group(1).toDouble
      assert(v >= 1.0,
        s"${f.getName}: $key=$v — a failed-canary sentinel (or corrupt " +
          "value); the artifact has no usable variance signal, re-run " +
          "graft.Bench on an idle machine")
    }
    // r12+: fixture-scaled rows must be priced in the artifact so trend
    // math can net them out (VERDICT r11 "what's wrong" #3)
    val round = f.getName.stripPrefix("BENCH_LOCAL_r")
      .stripSuffix(".json").toInt
    if (round >= 12)
      assert(text.contains("\"fixture_scaled\":") &&
          text.contains("\"total_net\":"),
        s"${f.getName} does not price its fixture-scaled rows — re-run " +
          "graft.Bench (fields landed in r12)")
  }
}
