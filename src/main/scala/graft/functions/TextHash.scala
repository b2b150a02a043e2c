package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing primitives.
  *
  * Built on md5 (identical hex output in Spark, DuckDB, Python, …) rather
  * than engine-native hash() functions, whose algorithms differ. A 60-bit
  * prefix of the digest is parsed as int64: Spark `conv(hex,16,10)`,
  * DuckDB `CAST('0x'||hex AS BIGINT)`. All downstream arithmetic stays
  * below 2^63 (values are reduced mod P first), so no overflow on either
  * engine — DuckDB errors on int64 overflow rather than wrapping.
  *
  * These feed document fingerprinting, MinHash, SimHash and LSH bucketing;
  * everything is a codegen'd Column expression (no UDF).
  */
object TextHash {

  /** Large prime modulus for rolling/minhash arithmetic. */
  val P = 1000000007L

  /** 60-bit md5-prefix hash of a string column — the fused digest-to-long
    * expression (graft.plans.Md5Prefix64); see its scaladoc. TokenizerSpec
    * asserts fused == composed.
    */
  def hash64(c: Column): Column = graft.plans.Md5Prefix64.hash64Col(c)

  /** The composed Column form the fused expression replaced — kept as the
    * executable spec of the hash's cross-engine definition.
    */
  def hash64Composed(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** hash64 reduced mod P (fits comfortably in later products). */
  def hashMod(c: Column): Column = hash64(c) % lit(P)

  /** Order-sensitive polynomial fingerprint of a token array:
    * fp = fold(0, (acc, t) => (acc * 1000003 + hashMod(t)) mod P).
    */
  def fingerprint(tokens: Column): Column =
    aggregate(tokens, lit(0L),
      (acc, t) => (acc * lit(1000003L) + hashMod(t)) % lit(P))

  /** n-gram shingle hashes from an already-hashed token array (`array<long>`,
    * values < P): each shingle hash is the polynomial combine of its n token
    * hashes — one md5 per token instead of one per shingle, and no string
    * concatenation. hashCombine(h1..hn) = fold((acc*1000003 + h) mod P).
    *
    * The input expression is BOUND ONCE through a single-element transform
    * lambda: the shingle construction references its token array n+2 times
    * (n slices + two sizes), and Catalyst's project collapse would
    * otherwise inline an expensive `tokenHashes` expression (the md5
    * transform) into every reference — higher-order functions are
    * interpreted, so no codegen CSE rescues that.
    */
  def hashedShingles(tokenHashes: Column, n: Int): Column =
    element_at(transform(array(tokenHashes), ths => boundShingles(ths, n)), 1)

  /** Shingle construction over an already-evaluated array reference. */
  private def boundShingles(toks: Column, n: Int): Column = {
    // aliased "0".."n-1" so arrays_zip field names are positional even for
    // named attribute inputs (see Tokenizer.shinglesOf)
    val shifted = (0 until n).map { i =>
      val c = if (i == 0) toks
        else slice(toks, lit(i + 1), greatest(size(toks) - i, lit(0)))
      c.as(i.toString)
    }
    val combined = transform(arrays_zip(shifted: _*), s =>
      (0 until n).map(i => s.getField(i.toString))
        .foldLeft(lit(0L): Column)((acc, h) => (acc * lit(1000003L) + h) % lit(P)))
    slice(combined, lit(1), greatest(size(toks) - (n - 1), lit(0)))
  }

  /** The i-th MinHash signature over a token/shingle array:
    * min over elements of (a_i * h(x) + b_i) mod P, with (a_i, b_i) derived
    * deterministically from the seed index (no RNG — reproducible across
    * engines and runs).
    */
  def minHash(tokens: Column, i: Int): Column =
    minHashOfHashes(transform(tokens, hashMod(_)), i)

  /** MinHash over an already-hashed (`array<long>`, values < P) column —
    * lets callers hash each element once and reuse the longs for the
    * jaccard verify too.
    */
  def minHashOfHashes(hashes: Column, i: Int): Column = {
    val a = 2L * i + 1  // odd multiplier
    val b = 1099511628211L % P * (i + 1) % P
    array_min(transform(hashes, h => (h * lit(a) + lit(b)) % lit(P)))
  }

  /** SimHash over a token array with `bits` bit positions (default 32):
    * for each bit j, sum +1/-1 votes of each token's hash bit; the signature
    * packs the sign bits.
    *
    * Each token is md5-hashed ONCE (the per-bit-aggregate formulation
    * re-evaluated the md5 inside every bit's fold — `bits`× the hashing for
    * the same signature), and ONE fold accumulates all `bits` vote counters
    * in an array accumulator, so the token array is traversed once, not per
    * bit. Output is bit-identical to the per-bit form (DedupSpec pins it to
    * Dedup.simHashSignatures).
    */
  def simHash(tokens: Column, bits: Int = 32): Column =
    simHashOfHashes(transform(tokens, hash64(_)), bits)

  /** SimHash from already-hashed tokens (`array<long>`, non-negative). */
  def simHashOfHashes(hashes: Column, bits: Int): Column = {
    val powers = array((0 until bits).map(j => lit(1L << j)): _*)
    // votes[j] = sum over tokens of (bit_j(h) ? +1 : -1), all bits in one pass
    val votes = aggregate(hashes, array_repeat(lit(0L), bits),
      (acc, h) => zip_with(acc, powers, (a, p) =>
        a + when(h.bitwiseAND(p) =!= 0, lit(1L)).otherwise(lit(-1L))))
    // pack sign bits; votes referenced once (no re-fold per bit)
    aggregate(
      zip_with(votes, powers, (v, p) => when(v > 0, p).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }
}
