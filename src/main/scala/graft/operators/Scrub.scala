package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction for training corpora: emails, phone numbers and IPv4
  * addresses are replaced with typed placeholder tokens, and per-class
  * match counts ride along for audit. Entirely narrow (regex projections,
  * no shuffle); patterns are deliberately RE2-compatible simple character
  * classes so any engine (and the DuckDB oracle) computes the identical
  * redaction.
  *
  * This is the pattern layer only — production stacks layer NER models on
  * top for names/addresses; the relational shape (scrub + audit counts in
  * one pass) is the same.
  */
object Scrub {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+?[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}-?[0-9]{0,4}"
  val Ipv4Pattern = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** Redaction order matters: emails first (an email contains no phone /
    * IP match but a phone regex could bite into a local part), then IPs,
    * then phones.
    */
  def scrubText(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")

  /** @param docs needs (doc_id, and `textCol`)
    * @return doc_id, scrubbed text, per-class counts, scrubbed digest
    *
    * Each count is taken on the text AS THE CORRESPONDING REPLACE SEES IT
    * (IPs on the email-free form, phones on the email+IP-free form), so
    * the audit counts always equal the number of placeholders in
    * `scrubbed` — a digit run inside an already-redacted match is never
    * double-counted.
    */
  def scrub(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val noEmail = regexp_replace(t, EmailPattern, "<EMAIL>")
    val noIp = regexp_replace(noEmail, Ipv4Pattern, "<IP>")
    docs.withColumn("n_emails", regexp_count(t, lit(EmailPattern)).cast("long"))
      .withColumn("n_ips", regexp_count(noEmail, lit(Ipv4Pattern)).cast("long"))
      .withColumn("n_phones", regexp_count(noIp, lit(PhonePattern)).cast("long"))
      .withColumn("scrubbed", regexp_replace(noIp, PhonePattern, "<PHONE>"))
      .withColumn("scrub_digest", md5(col("scrubbed")))
  }
}
