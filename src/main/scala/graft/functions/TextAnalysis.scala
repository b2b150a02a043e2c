package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-quality / language-ID heuristics for large-scale corpus curation
  * (SURVEY.md §7.5 / builder extension scope). Pure Column expressions —
  * every metric mirrors 1:1 into the DuckDB oracle SQL.
  */
object TextAnalysis {

  /** Function-word marker lists per language (public stopword heads). The
    * zh list is hanzi and never matches ASCII corpora — kept for structure.
    */
  val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and", "to", "in"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "fr" -> Seq("le", "les", "des", "est", "une"),
    "zh" -> Seq("的", "是", "了", "在", "和"))

  /** Occurrences of any marker of `lang` in the token array. */
  def markerHits(tokens: Column, lang: String): Column = {
    val set = Markers.toMap.apply(lang)
    size(filter(tokens, t => t.isInCollection(set)))
  }

  /** Deterministic argmax over marker hit counts: highest count wins,
    * earlier language in `Markers` order wins ties; all-zero -> "und".
    */
  def predictLang(hits: Seq[(String, Column)]): Column = {
    val allZero = hits.map(_._2 === 0).reduce(_ && _)
    val cases = hits.zipWithIndex.map { case ((lang, c), i) =>
      val geAll = hits.drop(i + 1).map { case (_, o) => c >= o } ++
        hits.take(i).map { case (_, o) => c > o }
      (if (geAll.isEmpty) lit(true) else geAll.reduce(_ && _), lang)
    }
    val chain = cases.foldRight(lit("und")) { case ((cond, lang), els) =>
      when(cond, lit(lang)).otherwise(els)
    }
    when(allZero, lit("und")).otherwise(chain)
  }

  /** Count of characters matching a regex class (computed as
    * length - length(after removal) — identical in DuckDB).
    */
  def charClassCount(c: Column, pattern: String): Column =
    (length(c) - length(regexp_replace(c, pattern, ""))).cast("long")
}
