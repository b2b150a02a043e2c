package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Single source of truth for text tokenization (reference: the four parallel
  * copies of `re.sub(r'[^\w\s]', ' ', s.lower()).split()` at
  * app/mapreduce/mapper1.py:7, mapper3.py:7, app/query.py:84, app/app.py:13).
  *
  * Python `\w` is Unicode-aware; Java's is ASCII by default, so the pattern
  * carries the `(?U)` flag for parity (`héllo`, `naïve_word`, digits and `_`
  * are kept; em-dash and other punctuation split).
  *
  * Everything is built from codegen'd `org.apache.spark.sql.functions` — no
  * UDFs — so the tokenizer stays inside WholeStageCodegen and Catalyst can
  * push the surrounding projection into the scan.
  */
object Tokenizer {

  /** `[^\w\s]` with Unicode character classes, as a Java regex. */
  val NonWordPattern = "(?U)[^\\w\\s]"

  /** Lowercase, strip punctuation to spaces, split on whitespace runs,
    * drop empty tokens. Returns `array<string>`.
    *
    * Implemented as the fused single-pass expression
    * (graft.plans.TokenizeText): one scan on ASCII input instead of two
    * regex passes + split + filter over materialized intermediates; the
    * non-ASCII fallback runs the identical JDK regex machinery the
    * composed form compiled to (TokenizerSpec pins the parity vectors;
    * every DuckDB text oracle pins the corpus behavior).
    */
  def tokenize(c: Column): Column = graft.plans.TokenizeText.tokenizeCol(c)

  /** The composed Column form the fused expression replaced — kept as the
    * executable spec of the tokenizer's semantics (TokenizerSpec asserts
    * fused == composed on the parity vectors and the test corpus).
    */
  def tokenizeComposed(c: Column): Column =
    filter(
      split(regexp_replace(lower(c), NonWordPattern, " "), "\\s+"),
      t => t =!= lit(""))

  /** Token count = reference "document length"
    * (app/mapreduce/mapper3.py:7 `len(tokenize(text))`).
    */
  def tokenCount(c: Column): Column = size(tokenize(c))

  /** `(pos, term)` pairs — use with `select($"doc_id", posexplode(...))`
    * (reference `enumerate(tokens)`, app/mapreduce/mapper1.py:17).
    */
  def tokens(c: Column): Column = tokenize(c)

  /** Whitespace-normalize: collapse runs, trim edges (reference title UDF,
    * app/prepare_data.py:23-29 — built-in here, no UDF needed).
    */
  def normalizeWhitespace(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** Character n-gram shingles over the whitespace-normalized lowercase text,
    * as `array<string>`. Used by MinHash / SimHash dedup. Built from
    * `sequence` + `transform` so it stays declarative (no UDF).
    * NB: Spark `sequence(a, b)` descends when a > b, hence the `when` guard.
    */
  def charShingles(c: Column, n: Int): Column = {
    val s = normalizeWhitespace(lower(c))
    when(length(s) < n, array().cast("array<string>"))
      .otherwise(
        transform(sequence(lit(1), length(s) - (n - 1)), i => s.substr(i, lit(n))))
  }

  /** Token n-gram shingles (e.g. 3-token shingles joined by a space).
    * Built from n shifted copies of the token array zipped together —
    * O(n · tokens) total, vs the naive per-position slice which copies
    * O(tokens²) elements.
    */
  def tokenShingles(c: Column, n: Int): Column =
    shinglesOf(tokenize(c), n)

  /** Shingles over an existing `array<string>` column. The shifted copies
    * are aliased "0".."n-1": arrays_zip names struct fields after NAMED
    * input columns, so without the alias a named attribute input would
    * produce a field named after itself instead of its position.
    */
  def shinglesOf(toks: Column, n: Int): Column = {
    val shifted = (0 until n).map { i =>
      val c = if (i == 0) toks
        else slice(toks, lit(i + 1), greatest(size(toks) - i, lit(0)))
      c.as(i.toString)
    }
    val joined = transform(arrays_zip(shifted: _*),
      s => concat_ws(" ", (0 until n).map(i => s.getField(i.toString)): _*))
    slice(joined, lit(1), greatest(size(toks) - (n - 1), lit(0)))
  }
}
