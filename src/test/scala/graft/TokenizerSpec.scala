package graft

import org.apache.spark.sql.functions._
import graft.functions.Tokenizer

/** Parity vectors for the reference tokenizer
  * `re.sub(r'[^\w\s]', ' ', s.lower()).split()` — Python Unicode `\w`
  * (SURVEY.md §2.8 F2, §7.6). Expected values computed with CPython re.
  */
class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  private def tok(s: String): Seq[String] =
    Seq(s).toDF("text")
      .select(Tokenizer.tokenize(col("text")).as("t"))
      .head().getSeq[String](0)

  test("basic lowercase + punctuation split") {
    assert(tok("Hello, World!") == Seq("hello", "world"))
  }
  test("unicode letters kept (Python \\w parity)") {
    assert(tok("héllo wörld") == Seq("héllo", "wörld"))
  }
  test("underscore and digits kept") {
    assert(tok("naïve_word x2 3rd") == Seq("naïve_word", "x2", "3rd"))
  }
  test("em-dash splits") {
    assert(tok("foo—bar") == Seq("foo", "bar"))
  }
  test("punctuation runs collapse; edges trimmed") {
    assert(tok("  ...a--b!!  ") == Seq("a", "b"))
  }
  test("empty and whitespace-only -> no tokens") {
    assert(tok("") == Seq())
    assert(tok("   \t\n ") == Seq())
  }
  test("token count = doc length") {
    val n = Seq("a b  c\td").toDF("text")
      .select(Tokenizer.tokenCount(col("text"))).head().getInt(0)
    assert(n == 4)
  }
  test("normalizeWhitespace collapses runs and trims") {
    val s = Seq("  a \t b\n\nc ").toDF("text")
      .select(Tokenizer.normalizeWhitespace(col("text"))).head().getString(0)
    assert(s == "a b c")
  }
  test("token shingles") {
    val sh = Seq("a b c d").toDF("text")
      .select(Tokenizer.tokenShingles(col("text"), 2).as("s"))
      .head().getSeq[String](0)
    assert(sh == Seq("a b", "b c", "c d"))
  }
  test("token shingles shorter than n -> empty") {
    val sh = Seq("a").toDF("text")
      .select(Tokenizer.tokenShingles(col("text"), 3).as("s"))
      .head().getSeq[String](0)
    assert(sh == Seq())
  }
  test("char shingles") {
    val sh = Seq("abcd").toDF("text")
      .select(Tokenizer.charShingles(col("text"), 3).as("s"))
      .head().getSeq[String](0)
    assert(sh == Seq("abc", "bcd"))
  }

  test("fused tokenizer equals the composed Column form on parity vectors and corpus") {
    val vectors = Seq(
      "Hello, World! foo_bar 42",
      "héllo naïve_word café",          // Unicode letters kept
      "em—dash and … ellipsis",          // non-ASCII punctuation splits
      "tabs\tand\nnewlines  runs",
      "",
      "   ",
      "ALL CAPS MiXeD",
      "digits123 _lead trail_ 1_2",
      "ПРИВЕТ Мир",                      // non-ASCII lowercasing
      "a b",                        // NBSP is \s under (?U)
      "ascii.only;string!with?punct")
    val df = vectors.toDF("text")
      .select(Tokenizer.tokenize(col("text")).as("fused"),
        Tokenizer.tokenizeComposed(col("text")).as("composed"))
    df.collect().zip(vectors).foreach { case (r, v) =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"fused != composed for <$v>: ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
    }
    // whole test corpus: token streams identical doc-for-doc
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(Tokenizer.tokenize(col("text")).as("fused"),
        Tokenizer.tokenizeComposed(col("text")).as("composed"))
      .filter(not(col("fused") === col("composed")))
    assert(docs.count() == 0, "fused tokenizer diverged on the corpus")
  }

  test("fused hash64 equals the conv(md5) Column form") {
    val vectors = Seq("", "a", "hello world", "héllo", "ПРИВЕТ", "123",
      "#2", "a\tb\nc", "0", "deadbeef" * 20)
    val df = vectors.toDF("s")
      .select(graft.functions.TextHash.hash64(col("s")).as("fused"),
        graft.functions.TextHash.hash64Composed(col("s")).as("composed"))
    df.collect().zip(vectors).foreach { case (r, v) =>
      assert(r.getLong(0) == r.getLong(1),
        s"hash64 fused != composed for <$v>: ${r.getLong(0)} vs ${r.getLong(1)}")
    }
    // every token of the test corpus
    val diverged = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(Tokenizer.tokenize(col("text"))).as("t"))
      .select(graft.functions.TextHash.hash64(col("t")).as("fused"),
        graft.functions.TextHash.hash64Composed(col("t")).as("composed"))
      .filter(col("fused") =!= col("composed"))
    assert(diverged.count() == 0, "hash64 diverged on corpus tokens")
  }

  test("NfcNormalize composes decomposed sequences; normalized text passes through") {
    val cases = Seq(
      "é" -> "é",           // combining acute composes
      "Å" -> "Å",           // combining ring
      "가" -> "가",      // Hangul jamo L+V -> syllable
      "plain ascii" -> "plain ascii",  // untouched
      "é" -> "é",            // already composed: identity
      "" -> "")
    val got = cases.map(_._1).toDF("s")
      .select(graft.plans.NfcNormalize.nfcNormalize(col("s")).as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(got == cases.map(_._2),
      s"nfc mismatch: ${got.map(_.codePoints().toArray.toSeq)}")
  }
}
