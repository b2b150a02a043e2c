package graft

import graft.operators.Scrub

/** Pattern-layer vectors for the PII scrubber: every class (email, secret,
  * IP, the three phone forms) plus the conservative negatives — prose
  * digit groups and short hex runs must NOT be redacted. Cross-engine
  * equivalence of the same patterns is pinned by the pii_scrub oracle row;
  * these vectors pin the intended matches themselves.
  */
class ScrubSpec extends SparkSpec {
  import spark.implicits._

  private def scrubOne(text: String): (String, Long, Long, Long, Long) = {
    val r = Scrub.scrub(Seq((1L, text)).toDF("doc_id", "text")).head()
    (r.getAs[String]("scrubbed"), r.getAs[Long]("n_emails"),
      r.getAs[Long]("n_secrets"), r.getAs[Long]("n_ips"),
      r.getAs[Long]("n_phones"))
  }

  test("email redaction incl. plus-tag and subdomain") {
    val (s, e, _, _, _) = scrubOne("mail a.b+c%d@sub.example.co today")
    assert(s == "mail <EMAIL> today" && e == 1)
  }

  test("phone forms: dashed, parenthesized, international space-separated") {
    val (s, _, _, _, p) = scrubOne(
      "call +1-555-123-4567 or (555) 123-4567 or (555)123 4567 or +44 20 7946 0958 now")
    assert(s == "call <PHONE> or <PHONE> or <PHONE> or <PHONE> now", s)
    assert(p == 4)
  }

  test("bare digit groups in prose are not phones") {
    val (s, _, _, _, p) = scrubOne(
      "in 2024 we shipped 10 000 units and 123 4567 parts")
    assert(p == 0, s)
    assert(s == "in 2024 we shipped 10 000 units and 123 4567 parts")
  }

  test("ipv4 redaction") {
    val (s, _, _, i, _) = scrubOne("server 10.0.3.25 responded")
    assert(s == "server <IP> responded" && i == 1)
  }

  test("secrets: 32+ hex run and 40+ base64 run; short hex untouched") {
    val hex32 = "deadbeef" * 4
    val b64 = "QmFzZTY0U2VjcmV0VG9rZW5CYXNlNjRTZWNyZXRUb2tlbg=="
    val (s, _, n, _, _) = scrubOne(s"key $hex32 token $b64 tag deadbeef done")
    assert(s == "key <SECRET> token <SECRET> tag deadbeef done", s)
    assert(n == 2)
  }

  test("phone pattern never bites into an email local part") {
    val (s, e, _, _, p) = scrubOne("reach x+1-555-123-4567@example.com ok")
    assert(s == "reach <EMAIL> ok", s)
    assert(e == 1 && p == 0)
  }

  test("audit counts equal placeholder counts in the scrubbed text") {
    val (s, e, n, i, p) = scrubOne(
      "a@b.co then " + ("0123456789abcdef" * 2) + " via 192.168.0.1 call (555) 123-9999")
    assert(e == s.sliding(7).count(_ == "<EMAIL>"))
    assert(n == s.sliding(8).count(_ == "<SECRET>"))
    assert(i == s.sliding(4).count(_ == "<IP>"))
    assert(p == s.sliding(7).count(_ == "<PHONE>"))
  }
}
