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
  }
}
