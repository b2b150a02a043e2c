package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused tokenizer: `filter(split(regexp_replace(lower(s), "(?U)[^\w\s]",
  * " "), "\s+"), _ != "")` as ONE pass.
  *
  * The composed form materializes the lowered string, the
  * punctuation-stripped string, and the raw split array before dropping
  * empties — four allocations and two full regex scans per document, in
  * the hot path of every text query (indexing, shingling, quality,
  * packing). This expression emits tokens directly:
  *
  *  - ASCII fast path (numBytes == numChars): a token is a maximal run of
    *  `[A-Za-z0-9_]` — exactly the composed form's behavior on ASCII,
  *    where `(?U)\w` is `[A-Za-z0-9_]` and every other byte (punctuation
  *    OR whitespace) separates tokens. Bytes are lowercased as they copy;
  *    one scan, no intermediate strings.
  *  - Non-ASCII fallback: the SAME JDK machinery the composed form runs
  *    (`UTF8String.toLowerCase`, `java.util.regex` with `(?U)`), so
  *    Unicode semantics are identical by construction — TokenizerSpec's
  *    parity vectors and every DuckDB text oracle pin it.
  */
case class TokenizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokenize"

  override def nullSafeEval(input: Any): Any =
    TokenizeText.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TokenizeText.tokenize($c)")

  override protected def withNewChildInternal(
      newChild: Expression): TokenizeText = copy(child = newChild)
}

object TokenizeText {

  private val NonWord = java.util.regex.Pattern.compile("(?U)[^\\w\\s]")
  private val Ws = java.util.regex.Pattern.compile("\\s+")

  private def isWord(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      (b >= '0' && b <= '9') || b == '_'

  /** Static kernel shared by eval and generated code. */
  def tokenize(s: UTF8String): ArrayData =
    if (s.numBytes == s.numChars()) ascii(s) else unicode(s)

  private def ascii(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    val n = b.length
    while (i < n) {
      while (i < n && !isWord(b(i))) i += 1
      val start = i
      while (i < n && isWord(b(i))) i += 1
      if (i > start) {
        val tok = new Array[Byte](i - start)
        var j = start
        while (j < i) {
          val c = b(j)
          tok(j - start) = if (c >= 'A' && c <= 'Z') (c + 32).toByte else c
          j += 1
        }
        out.add(UTF8String.fromBytes(tok))
      }
    }
    new GenericArrayData(out.toArray)
  }

  private def unicode(s: UTF8String): ArrayData = {
    // identical machinery to the composed Column form: Spark's lower() is
    // UTF8String.toLowerCase; the same java.util.regex patterns follow
    val lowered = s.toLowerCase.toString
    val stripped = NonWord.matcher(lowered).replaceAll(" ")
    val parts = Ws.split(stripped)
    val out = new java.util.ArrayList[UTF8String](parts.length)
    parts.foreach { p => if (p.nonEmpty) out.add(UTF8String.fromString(p)) }
    new GenericArrayData(out.toArray)
  }

  /** Column wrapper. */
  def tokenizeCol(c: Column): Column =
    ColumnBridge.column(TokenizeText(ColumnBridge.expression(c)))
}
