package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Learned merge table: (round, left, right, merged, cnt) — one row per
    * merge round, `cnt` the pair's weighted corpus frequency at the time
    * it was merged, symbols shown without delimiters.
    *
    * @param wordFreqs (term, freq) word-type frequency table
    */
  def merges(wordFreqs: DataFrame, rounds: Int): DataFrame = {
    val spark = wordFreqs.sparkSession
    import spark.implicits._
    // initial symbol string: "|c1| |c2| ..." (split(term, "") yields chars)
    var words = wordFreqs.select(
      concat(lit("|"),
        concat_ws("| |", split(col("term"), "")), lit("|")).as("s"),
      col("freq"))
    val out = Seq.newBuilder[(Long, String, String, String, Long)]
    for (round <- 1 to rounds) {
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
      if (best.isEmpty) return out.result().toDF(
        "round", "lhs", "rhs", "merged", "cnt")
      val (l, r, cnt) =
        (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
      val merged = l.dropRight(1) + r.drop(1) // "|l" + "r|"
      out += ((round.toLong, l.stripPrefix("|").stripSuffix("|"),
        r.stripPrefix("|").stripSuffix("|"),
        merged.stripPrefix("|").stripSuffix("|"), cnt))
      words = words.select(
        expr(s"replace(s, '$l $r', '$merged')").as("s"), col("freq"))
    }
    out.result().toDF("round", "lhs", "rhs", "merged", "cnt")
  }

  /** Merge training over raw documents: word-type frequencies from the
    * shared tokenizer, then `rounds` merges. The word table feeds every
    * round — cache it once here (rounds re-derive `s` narrowly from it).
    */
  def trainOnDocs(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    import graft.CacheRegistry.RegisteredCache
    val wf = docs.select(
        explode(graft.functions.Tokenizer.tokenize(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).cast("long").as("freq"))
      .registeredCache()
    merges(wf, rounds)
  }
}
