package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction for training corpora: emails, credential-looking secret
  * strings, phone numbers and IPv4 addresses are replaced with typed
  * placeholder tokens, and per-class match counts ride along for audit.
  * Entirely narrow (regex projections, no shuffle); patterns are
  * deliberately RE2-compatible — simple character classes, bounded
  * alternation, no lookaround, no word boundaries (`\b` is Unicode-aware in
  * Java but ASCII in RE2) — so any engine (and the DuckDB oracle) computes
  * the identical redaction. Alternations rely on leftmost-FIRST semantics,
  * which Java regex and default-mode RE2 share.
  *
  * This is the pattern layer only — production stacks layer NER models on
  * top for names/addresses; the relational shape (scrub + audit counts in
  * one pass) is the same.
  */
object Scrub {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Phone forms, most specific alternative first:
    *  - parenthesized area code: `(555) 123-4567` / `(555)123 4567`
    *  - international space-separated: `+44 20 7946 0958` (leading `+`
    *    required — bare space-separated digit groups are ordinary prose)
    *  - dashed: `+1-555-123-4567`, `555-123-4567`
    */
  val PhonePattern =
    "\\([0-9]{3}\\)[ ]?[0-9]{3}[- ][0-9]{4}" +
      "|\\+[0-9]{1,3}(?:[ ][0-9]{2,4}){2,3}" +
      "|\\+?[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}-?[0-9]{0,4}"

  val Ipv4Pattern = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** Conservative credential heuristic: a run of 32+ lowercase-hex chars
    * (API keys, md5/sha digests) or 40+ base64-alphabet chars (tokens,
    * signed blobs). Hex tried first — leftmost-first alternation makes the
    * choice identical across engines even where the classes overlap.
    */
  val SecretPattern = "[0-9a-f]{32,}|[A-Za-z0-9+/=]{40,}"

  /** Redaction order matters: emails first (an email contains no phone /
    * IP match but a phone regex could bite into a local part), then
    * secrets (long runs, never produced by earlier placeholders), then
    * IPs, then phones.
    */
  def scrubText(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, EmailPattern, "<EMAIL>"),
          SecretPattern, "<SECRET>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")

  /** @param docs needs (doc_id, and `textCol`)
    * @return doc_id, scrubbed text, per-class counts, scrubbed digest
    *
    * Each count is taken on the text AS THE CORRESPONDING REPLACE SEES IT
    * (secrets on the email-free form, IPs on the email+secret-free form,
    * phones on the email+secret+IP-free form), so the audit counts always
    * equal the number of placeholders in `scrubbed` — a digit run inside
    * an already-redacted match is never double-counted.
    */
  def scrub(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val noEmail = regexp_replace(t, EmailPattern, "<EMAIL>")
    val noSecret = regexp_replace(noEmail, SecretPattern, "<SECRET>")
    val noIp = regexp_replace(noSecret, Ipv4Pattern, "<IP>")
    docs.withColumn("n_emails", regexp_count(t, lit(EmailPattern)).cast("long"))
      .withColumn("n_secrets",
        regexp_count(noEmail, lit(SecretPattern)).cast("long"))
      .withColumn("n_ips", regexp_count(noSecret, lit(Ipv4Pattern)).cast("long"))
      .withColumn("n_phones", regexp_count(noIp, lit(PhonePattern)).cast("long"))
      .withColumn("scrubbed", regexp_replace(noIp, PhonePattern, "<PHONE>"))
      .withColumn("scrub_digest", md5(col("scrubbed")))
  }
}
