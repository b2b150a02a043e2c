package graft.queries

/** Shared DuckDB SQL fragments used by multiple oracle queries. */
object OracleSql {

  /** Tokenized documents: docs_l (doc_id, text, l: list<varchar>) and
    * toks (doc_id, term, pos) — the SQL mirror of Tokenizer.tokenize.
    * docs_l keeps the raw text so title-carrying oracles can derive the
    * synthesized title (substring) without a second documents join.
    */
  val TokCte: String = tokCte()

  /** TokCte over a filtered documents subset (predicate in SQL syntax). */
  def tokCte(where: String = "TRUE"): String =
    s"""docs_l AS (
       |  SELECT doc_id, text, list_filter(string_split_regex(
       |    regexp_replace(lower(text), '[^\\w\\s]', ' ', 'g'), '\\s+'),
       |    x -> x <> '') AS l
       |  FROM documents WHERE $where),
       |toks AS (
       |  SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) - 1 AS pos
       |  FROM docs_l)""".stripMargin

  /** 60-bit md5-prefix hash of a SQL expression (mirror of TextHash.hash64). */
  def hash64(expr: String): String =
    s"CAST('0x' || substring(md5($expr), 1, 15) AS BIGINT)"

  /** hash64 mod P (mirror of TextHash.hashMod). */
  def hashMod(expr: String): String =
    s"(${hash64(expr)} % 1000000007)"

  /** Mirror of Similarity.planeArray: hyperplane j as an ordered
    * list<double> (`planes(j, parr)`), so list_dot_product folds components
    * in the same order as the Spark DoubleArrayDot — sign bits agree
    * bit-for-bit across engines.
    */
  def planesCte(numPlanes: Int, dim: Int): String = {
    val planeHash = hash64("concat(CAST(j AS VARCHAR), '_', CAST(d AS VARCHAR))")
    s"""planes AS (
       |  SELECT j, list(p ORDER BY d) AS parr FROM (
       |    SELECT j, d, ($planeHash % 2001 - 1000) / 1000.0 AS p
       |    FROM range($numPlanes) t1(j), range($dim) t2(d)) comps
       |  GROUP BY j)""".stripMargin
  }

  /** Polynomial fingerprint over a list expression (mirror of
    * TextHash.fingerprint): fold with init 0 via list_prepend.
    */
  def fingerprint(listExpr: String): String =
    s"""list_reduce(
       |  list_prepend(CAST(0 AS BIGINT),
       |    list_transform($listExpr, x -> ${hashMod("x")})),
       |  (a, b) -> (a * 1000003 + b) % 1000000007)""".stripMargin
}
