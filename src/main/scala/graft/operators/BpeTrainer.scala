package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE-style tokenizer training over the corpus — the "learn the merge
  * table" half of byte-pair encoding: starting from characters, repeatedly
  * find the adjacent symbol pair with the highest corpus frequency and
  * merge it into one symbol.
  *
  * Scale design (100 TB): the iteration runs over the WORD-TYPE frequency
  * table (term, freq) — the corpus-sized work is the one token count that
  * builds it; every merge round then aggregates pair counts over word
  * types (millions of rows for a real corpus, distributed) and collects
  * exactly ONE winning row to the driver. Driver traffic is O(rounds),
  * not O(corpus). The merge-apply is a narrow per-row string rewrite.
  *
  * Symbol sequences are represented as boundary-delimited strings
  * ("|a| |b| |c|"): literal left-to-right replace of "|l| |r|" with
  * "|lr|" is then exactly the BPE merge — delimiters make partial-symbol
  * matches impossible and adjacent occurrences self-delimit (the second
  * occurrence keeps its own leading "|"). Both engines' `replace` scan
  * left-to-right over non-overlapping occurrences, so the rewrite is
  * deterministic and cross-engine identical. Ties on pair count break by
  * (left, right) symbol order.
  */
object BpeTrainer {

  /** One learned merge: delimited left/right symbols and the pair's
    * weighted corpus frequency when it was merged. `pattern`/`replacement`
    * are the literal-replace forms ("|l| |r|" -> "|lr|").
    */
  final case class Merge(l: String, r: String, cnt: Long) {
    def pattern: String = s"$l $r"
    def replacement: String = l.dropRight(1) + r.drop(1) // "|l" + "r|"
  }

  /** Boundary-delimited symbol string of a term: "|c1| |c2| ...". */
  def delimited(term: Column): Column =
    concat(lit("|"), concat_ws("| |", split(term, "")), lit("|"))

  /** Learn the merge rules (driver-side list, one row collected per
    * round — see scaladoc above for why that is the honest 100 TB shape).
    */
  def learnRules(wordFreqs: DataFrame, rounds: Int): Seq[Merge] = {
    var words = wordFreqs.select(delimited(col("term")).as("s"), col("freq"))
    val out = Seq.newBuilder[Merge]
    for (_ <- 1 to rounds) {
      val syms = split(col("s"), " ")
      // guard: size 1 would make sequence(1, 0) DESCEND, not empty
      val idxs = when(size(syms) > 1, sequence(lit(1), size(syms) - 1))
        .otherwise(array().cast("array<int>"))
      val pairs = words.select(col("freq"),
          explode(transform(idxs, i =>
            struct(element_at(syms, i).as("l"),
              element_at(syms, (i + 1).cast("int")).as("r")))).as("p"))
        .select(col("p.l").as("l"), col("p.r").as("r"), col("freq"))
      val best = pairs.groupBy("l", "r")
        .agg(sum(col("freq")).cast("long").as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) return out.result()
      val m = Merge(best(0).getString(0), best(0).getString(1),
        best(0).getLong(2))
      out += m
      words = words.select(
        replace(col("s"), lit(m.pattern), lit(m.replacement)).as("s"),
        col("freq"))
    }
    out.result()
  }

  /** Learned merge table as a DataFrame:
    * (round, lhs, rhs, merged, cnt) — symbols shown without delimiters.
    *
    * @param wordFreqs (term, freq) word-type frequency table
    */
  def merges(wordFreqs: DataFrame, rounds: Int): DataFrame = {
    val spark = wordFreqs.sparkSession
    import spark.implicits._
    def strip(s: String) = s.stripPrefix("|").stripSuffix("|")
    learnRules(wordFreqs, rounds).zipWithIndex.map { case (m, i) =>
      ((i + 1).toLong, strip(m.l), strip(m.r), strip(m.replacement), m.cnt)
    }.toDF("round", "lhs", "rhs", "merged", "cnt")
  }

  /** Apply learned rules to segment documents into BPE units. The replace
    * chain runs once per word TYPE, not per occurrence — segmentation is
    * a pure function of the word, so the chain evaluates over the
    * distinct-term table (vocabulary-sized) and the per-occurrence work
    * collapses to a broadcast probe + per-doc rollup. (A vocabulary too
    * large to broadcast drops the hint and shuffle-joins on term — still
    * vocabulary-bounded chain work.) Emits per-document
    * (id, n_words, n_units, units_per_word) — the compression diagnostic
    * that tells you whether the merge table fits the corpus.
    */
  def segmentUnits(docs: DataFrame, idCol: String, textCol: String,
                   rules: Seq[Merge]): DataFrame = {
    val applied = rules.foldLeft(delimited(col("term")))((e, m) =>
      replace(e, lit(m.pattern), lit(m.replacement)))
    val toks = docs.select(col(idCol).as("id"),
      explode(graft.functions.Tokenizer.tokenize(col(textCol))).as("term"))
    val typeUnits = toks.select("term").distinct()
      .select(col("term"), size(split(applied, " ")).cast("long").as("units"))
    toks.join(broadcast(typeUnits), "term")
      .groupBy("id")
      .agg(count(lit(1)).cast("long").as("n_words"),
        sum(col("units")).as("n_units"))
      .withColumn("units_per_word",
        col("n_units").cast("double") / col("n_words").cast("double"))
  }

  /** Merge training over raw documents: word-type frequencies from the
    * shared tokenizer, then `rounds` merges. The word table feeds every
    * round — cache it once here (rounds re-derive `s` narrowly from it).
    */
  def trainOnDocs(docs: DataFrame, textCol: String, rounds: Int): DataFrame =
    merges(docFreqs(docs, textCol), rounds)

  /** Word-type frequency table over raw documents (cached — every merge
    * round starts from it).
    */
  def docFreqs(docs: DataFrame, textCol: String): DataFrame = {
    import graft.CacheRegistry.RegisteredCache
    docs.select(
        explode(graft.functions.Tokenizer.tokenize(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).cast("long").as("freq"))
      .registeredCache()
  }
}
