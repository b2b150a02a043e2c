package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{TextAnalysis, TextHash, Tokenizer}

/** Text-analysis pipeline operators (builder extension scope): token
  * counting (whitespace + BPE-ish regex), language-ID heuristic, quality
  * scoring, and order-sensitive document fingerprinting — each mirrored
  * exactly in DuckDB SQL.
  */
object TextAnalysisQueries {

  private val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  // ---- Token counting ---------------------------------------------------------
  def tokenStats(s: SparkSession, dir: String): DataFrame = {
    val toks = Tokenizer.tokenize(col("text"))
    Tables.documents(s, dir).select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      size(toks).cast("long").as("ws_tokens"),
      regexp_count(col("text"), lit(BpePattern)).cast("long").as("bpe_tokens"),
      TextAnalysis.charClassCount(col("text"), "(?U)[^\\w\\s]").as("punct_chars"),
      TextAnalysis.charClassCount(col("text"), "[0-9]").as("digit_chars"))
      .orderBy("doc_id")
  }

  val tokenStatsSql: String =
    s"""WITH ${OracleSql.TokCte}
       |SELECT d.doc_id,
       |  CAST(length(d.text) AS BIGINT) AS n_chars,
       |  CAST(len(docs_l.l) AS BIGINT) AS ws_tokens,
       |  CAST(len(regexp_extract_all(d.text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS bpe_tokens,
       |  CAST(length(d.text) - length(regexp_replace(d.text, '[^\\w\\s]', '', 'g')) AS BIGINT) AS punct_chars,
       |  CAST(length(d.text) - length(regexp_replace(d.text, '[0-9]', '', 'g')) AS BIGINT) AS digit_chars
       |FROM documents d JOIN docs_l ON d.doc_id = docs_l.doc_id
       |ORDER BY d.doc_id""".stripMargin

  // ---- Language identification ------------------------------------------------
  def langId(s: SparkSession, dir: String): DataFrame = {
    // Tokenize ONCE into an attribute: five inline markerHits(tokenize(..))
    // copies would each re-run the regex+split (CollapseProject keeps a
    // non-cheap aliased expression shared when it's referenced many times,
    // but five syntactically separate copies are five evaluations).
    val hitCols = TextAnalysis.Markers.map { case (lang, _) =>
      TextAnalysis.markerHits(col("toks"), lang).cast("long").as(s"${lang}_hits")
    }
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang").as("labeled_lang"),
        Tokenizer.tokenize(col("text")).as("toks"))
      .select(col("doc_id") +: col("labeled_lang") +: hitCols: _*)
      .withColumn("predicted_lang", TextAnalysis.predictLang(
        TextAnalysis.Markers.map { case (lang, _) => lang -> col(s"${lang}_hits") }))
      .orderBy("doc_id")
  }

  private def markerListSql(lang: String): String =
    TextAnalysis.Markers.toMap.apply(lang).map(m => s"'$m'").mkString("[", ",", "]")

  val langIdSql: String = {
    val hitExprs = TextAnalysis.Markers.map { case (lang, _) =>
      s"CAST(len(list_filter(l, x -> list_contains(${markerListSql(lang)}, x))) AS BIGINT) AS ${lang}_hits"
    }.mkString(",\n  ")
    s"""WITH ${OracleSql.TokCte},
       |hits AS (
       |  SELECT d.doc_id, d.lang AS labeled_lang,
       |  $hitExprs
       |  FROM documents d JOIN docs_l ON d.doc_id = docs_l.doc_id)
       |SELECT doc_id, labeled_lang, en_hits, de_hits, es_hits, fr_hits, zh_hits,
       |  CASE WHEN en_hits = 0 AND de_hits = 0 AND es_hits = 0 AND fr_hits = 0 AND zh_hits = 0 THEN 'und'
       |       WHEN en_hits >= de_hits AND en_hits >= es_hits AND en_hits >= fr_hits AND en_hits >= zh_hits THEN 'en'
       |       WHEN de_hits >= es_hits AND de_hits >= fr_hits AND de_hits >= zh_hits THEN 'de'
       |       WHEN es_hits >= fr_hits AND es_hits >= zh_hits THEN 'es'
       |       WHEN fr_hits >= zh_hits THEN 'fr'
       |       ELSE 'zh' END AS predicted_lang
       |FROM hits ORDER BY doc_id""".stripMargin
  }

  // ---- Quality scoring --------------------------------------------------------
  def qualityScore(s: SparkSession, dir: String): DataFrame = {
    // one shared tokenize pass (aliased attribute, see langId)
    val toks = col("toks")
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"),
        Tokenizer.tokenize(col("text")).as("toks"))
      .select(col("doc_id"), col("text"),
        size(toks).cast("long").as("n_tokens"),
        length(array_join(toks, "")).cast("double").as("token_chars"),
        length(col("text")).cast("double").as("n_chars"),
        TextAnalysis.markerHits(toks, "en").cast("double").as("stop_hits"),
        TextAnalysis.charClassCount(col("text"), "(?U)[^\\w\\s]").cast("double").as("punct"),
        TextAnalysis.charClassCount(col("text"), "[0-9]").cast("double").as("digits"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        when(col("n_tokens") === 0, 0.0)
          .otherwise(col("token_chars") / col("n_tokens")).as("avg_token_len"),
        when(col("n_tokens") === 0, 0.0)
          .otherwise(col("stop_hits") / col("n_tokens")).as("stop_ratio"),
        when(col("n_chars") === 0, 0.0)
          .otherwise(col("punct") / col("n_chars")).as("punct_ratio"),
        when(col("n_chars") === 0, 0.0)
          .otherwise(col("digits") / col("n_chars")).as("digit_ratio"))
      .withColumn("quality",
        when(col("n_tokens") === 0, 0.0).otherwise(
          least(lit(1.0), col("avg_token_len") / 8.0) *
            (lit(1.0) - col("punct_ratio")) * (lit(1.0) - col("digit_ratio"))))
      .orderBy("doc_id")
  }

  val qualityScoreSql: String = {
    val en = markerListSql("en")
    s"""WITH ${OracleSql.TokCte},
       |m AS (
       |  SELECT d.doc_id,
       |    CAST(len(l) AS BIGINT) AS n_tokens,
       |    CAST(length(array_to_string(l, '')) AS DOUBLE) AS token_chars,
       |    CAST(length(d.text) AS DOUBLE) AS n_chars,
       |    CAST(len(list_filter(l, x -> list_contains($en, x))) AS DOUBLE) AS stop_hits,
       |    CAST(length(d.text) - length(regexp_replace(d.text, '[^\\w\\s]', '', 'g')) AS DOUBLE) AS punct,
       |    CAST(length(d.text) - length(regexp_replace(d.text, '[0-9]', '', 'g')) AS DOUBLE) AS digits
       |  FROM documents d JOIN docs_l ON d.doc_id = docs_l.doc_id),
       |r AS (
       |  SELECT doc_id, n_tokens,
       |    CASE WHEN n_tokens = 0 THEN 0.0 ELSE token_chars / n_tokens END AS avg_token_len,
       |    CASE WHEN n_tokens = 0 THEN 0.0 ELSE stop_hits / n_tokens END AS stop_ratio,
       |    CASE WHEN n_chars = 0 THEN 0.0 ELSE punct / n_chars END AS punct_ratio,
       |    CASE WHEN n_chars = 0 THEN 0.0 ELSE digits / n_chars END AS digit_ratio
       |  FROM m)
       |SELECT doc_id, n_tokens, avg_token_len, stop_ratio, punct_ratio, digit_ratio,
       |  CASE WHEN n_tokens = 0 THEN 0.0 ELSE
       |    least(1.0, avg_token_len / 8.0) * (1.0 - punct_ratio) * (1.0 - digit_ratio)
       |  END AS quality
       |FROM r ORDER BY doc_id""".stripMargin
  }

  // ---- Document fingerprint ---------------------------------------------------
  def docFingerprint(s: SparkSession, dir: String): DataFrame = {
    val toks = Tokenizer.tokenize(col("text"))
    Tables.documents(s, dir).select(
      col("doc_id"),
      TextHash.fingerprint(toks).as("fp"),
      TextHash.hash64(substring(col("text"), 1, 64)).as("prefix_hash"))
      .orderBy("doc_id")
  }

  val docFingerprintSql: String =
    s"""WITH ${OracleSql.TokCte}
       |SELECT d.doc_id,
       |  ${OracleSql.fingerprint("l")} AS fp,
       |  ${OracleSql.hash64("substring(d.text, 1, 64)")} AS prefix_hash
       |FROM documents d JOIN docs_l ON d.doc_id = docs_l.doc_id
       |ORDER BY d.doc_id""".stripMargin

  // ---- Composed curation pipeline --------------------------------------------
  def curationPipeline(s: SparkSession, dir: String): DataFrame =
    graft.operators.Curation
      .curate(Tables.documents(s, dir), minQuality = 0.4,
        keepLangs = Seq("en", "de", "es"))
      .orderBy("doc_id")

  val curationPipelineSql: String =
    s"""WITH ${OracleSql.TokCte},
       |m AS (
       |  SELECT d.doc_id, d.lang, docs_l.l,
       |    CAST(len(l) AS BIGINT) AS n_tokens,
       |    CASE WHEN len(l) = 0 THEN 0.0 ELSE
       |      least(1.0, (length(array_to_string(l, '')) * 1.0 / len(l)) / 8.0) *
       |      (1.0 - CASE WHEN length(d.text) = 0 THEN 0.0 ELSE
       |        (length(d.text) - length(regexp_replace(d.text, '[^\\w\\s]', '', 'g'))) * 1.0 / length(d.text) END) *
       |      (1.0 - CASE WHEN length(d.text) = 0 THEN 0.0 ELSE
       |        (length(d.text) - length(regexp_replace(d.text, '[0-9]', '', 'g'))) * 1.0 / length(d.text) END)
       |    END AS quality,
       |    md5(trim(regexp_replace(d.text, '\\s+', ' ', 'g'))) AS digest,
       |    ${OracleSql.fingerprint(s"l[1:${graft.operators.Curation.PrefixTokens}]")} AS prefix_fp
       |  FROM documents d JOIN docs_l ON d.doc_id = docs_l.doc_id),
       |gated AS (
       |  SELECT * FROM m
       |  WHERE quality >= 0.4 AND lang IN ('en', 'de', 'es')),
       |exact_kept AS (
       |  SELECT * FROM (SELECT *,
       |    min(doc_id) OVER (PARTITION BY digest) AS keeper FROM gated)
       |  WHERE doc_id = keeper),
       |prefix_kept AS (
       |  SELECT * FROM (SELECT *,
       |    min(doc_id) OVER (PARTITION BY prefix_fp) AS pkeeper FROM exact_kept)
       |  WHERE doc_id = pkeeper)
       |SELECT doc_id, lang, n_tokens, CAST(quality AS DOUBLE) AS quality, prefix_fp
       |FROM prefix_kept ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "curation_pipeline" -> (curationPipeline _),
    "token_stats" -> (tokenStats _),
    "lang_id" -> (langId _),
    "quality_score" -> (qualityScore _),
    "doc_fingerprint" -> (docFingerprint _))

  val oracles: Map[String, String] = Map(
    "curation_pipeline" -> curationPipelineSql,
    "token_stats" -> tokenStatsSql,
    "lang_id" -> langIdSql,
    "quality_score" -> qualityScoreSql,
    "doc_fingerprint" -> docFingerprintSql)
}
