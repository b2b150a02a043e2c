package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.graft.FunctionBridge
import org.apache.spark.sql.types._

import graft.plans.DoubleArrayDot

/** SQL surface for graft's functions: exposes the engine to `spark.sql`
  * users (the reference's only "API" is shell scripts; ours is the Scala
  * Column API plus SQL).
  *
  * Builders construct raw Catalyst trees (a Column wrapped into an
  * expression stays an Unevaluable column-node inside the function
  * registry, so `functions._` helpers can't be reused here). Semantics are
  * kept identical to the Column API versions — TokenizerSpec/PropertySpec
  * assert the parity.
  *
  * Register on a live session with `GraftFunctions.register(spark)`, or set
  * `spark.sql.extensions=graft.GraftExtensions` for every new session.
  */
object GraftFunctions {

  private val P = Literal(graft.functions.TextHash.P)

  /** The fused single-pass tokenizer (same expression the Column API
    * resolves to — one implementation serves both surfaces).
    */
  private def tokenizeExpr(e: Expression): Expression =
    graft.plans.TokenizeText(e)

  private def hash64Expr(e: Expression): Expression =
    graft.plans.Md5Prefix64(Cast(e, StringType))

  private def hashModExpr(e: Expression): Expression =
    Remainder(hash64Expr(e), P)

  /** aggregate(toks, 0L, (acc, x) -> (acc * 1000003 + hashMod(x)) % P) */
  private def fingerprintExpr(tokens: Expression): Expression = {
    val acc = UnresolvedNamedLambdaVariable(Seq("acc"))
    val x = UnresolvedNamedLambdaVariable(Seq("x"))
    ArrayAggregate(tokens, Literal(0L),
      LambdaFunction(
        Remainder(Add(Multiply(acc, Literal(1000003L)), hashModExpr(x)), P),
        Seq(acc, x)),
      LambdaFunction(acc, Seq(acc)))
  }

  private def d(e: Expression): Expression = Cast(e, DoubleType)

  /** ln(greatest(1.0, n / greatest(1.0, df))) */
  private def idfExpr(n: Expression, df: Expression): Expression =
    Log(Greatest(Seq(Literal(1.0), Divide(d(n), Greatest(Seq(Literal(1.0), d(df)))))))

  /** idf * tf * (k1+1) / (tf + k1*(1-b + b*dl/avgdl)), k1=1, b=0.75 */
  private def bm25Expr(tf: Expression, idf: Expression, dl: Expression,
                       avgdl: Expression): Expression =
    Divide(
      Multiply(Multiply(d(idf), d(tf)), Literal(2.0)),
      Add(d(tf), Add(Literal(0.25),
        Divide(Multiply(Literal(0.75), d(dl)), d(avgdl)))))

  /** (name, description, builder) for every registered function. */
  val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_tokenize", "tokenize text into an array of terms",
      exprs => tokenizeExpr(exprs.head)),
    ("graft_token_count", "number of tokens in text",
      exprs => Size(tokenizeExpr(exprs.head))),
    ("graft_normalize_ws", "collapse whitespace runs and trim",
      exprs => StringTrim(RegExpReplace(exprs.head, Literal("\\s+"), Literal(" ")))),
    ("graft_hash64", "60-bit md5-prefix hash",
      exprs => hash64Expr(exprs.head)),
    ("graft_fingerprint", "order-sensitive fingerprint of a token array",
      exprs => fingerprintExpr(exprs.head)),
    ("graft_dot", "dot product of two array<double> vectors",
      exprs => DoubleArrayDot(exprs(0), exprs(1))),
    ("graft_cosine", "cosine similarity of two array<double> vectors",
      exprs => Divide(DoubleArrayDot(exprs(0), exprs(1)),
        Multiply(Sqrt(DoubleArrayDot(exprs(0), exprs(0))),
          Sqrt(DoubleArrayDot(exprs(1), exprs(1)))))),
    ("graft_bm25_idf", "reference BM25 idf(n, df)",
      exprs => idfExpr(exprs(0), exprs(1))),
    ("graft_bm25_score", "BM25 term score(tf, idf, dl, avgdl), k1=1 b=0.75",
      exprs => bm25Expr(exprs(0), exprs(1), exprs(2), exprs(3))),
    ("graft_jaccard", "fused set jaccard of two array<long> columns",
      exprs => graft.plans.LongArrayJaccard(exprs(0), exprs(1))),
    ("graft_nfc", "Unicode NFC normalization (canonical composition)",
      exprs => graft.plans.NfcNormalize(exprs.head)),
    ("graft_min_dist",
      "minimum |a_i - b_j| between two SORTED array<int> position lists",
      exprs => graft.plans.IntArrayMinAbsDiff(exprs(0), exprs(1))),
    ("graft_pairs_within",
      "count of cross pairs within `w` positions (two sorted array<int>, literal w)",
      exprs => graft.plans.IntArrayPairsWithin(exprs(0), exprs(1), {
        // the window rides as a constructor Int, so the SQL arg must fold
        val f = exprs(2)
        require(f.foldable, "graft_pairs_within window must be a literal")
        f.eval().asInstanceOf[Number].intValue()
      })))

  /** Imperative registration on a live session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      FunctionBridge.registerFunction(spark, name, builder)
    }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name, usage),
        builder))
    }
}
