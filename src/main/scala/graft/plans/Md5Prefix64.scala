package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine-portable 60-bit md5-prefix hash
  * (`conv(substring(md5(s), 1, 15), 16, 10)`) as ONE digest-to-long step.
  *
  * The composed form materializes the 32-char hex string, substrings it,
  * and re-parses 15 hex digits through conv's base conversion — three
  * string allocations per hash, and hashing is the single hottest scalar
  * operation in the dedup/minhash/mixture paths (every token of every
  * document flows through it, often once per signature row). This
  * expression digests the UTF-8 bytes and reads the value directly: the
  * first 15 hex digits of the digest ARE its first 60 bits, i.e. the
  * first 8 bytes big-endian shifted right a nibble. Identical output by
  * construction — the DuckDB oracles keep their
  * `CAST('0x' || substring(md5(x), 1, 15) AS BIGINT)` mirror unchanged.
  */
case class Md5Prefix64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hash64"

  override def nullSafeEval(input: Any): Any =
    Md5Prefix64.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Md5Prefix64.hash($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Md5Prefix64 = copy(child = newChild)
}

object Md5Prefix64 {

  private val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Static kernel shared by eval and generated code. */
  def hash(s: UTF8String): Long = {
    val d = digests.get()
    d.reset()
    val dig = d.digest(s.getBytes)
    val first8 =
      ((dig(0) & 0xffL) << 56) | ((dig(1) & 0xffL) << 48) |
        ((dig(2) & 0xffL) << 40) | ((dig(3) & 0xffL) << 32) |
        ((dig(4) & 0xffL) << 24) | ((dig(5) & 0xffL) << 16) |
        ((dig(6) & 0xffL) << 8) | (dig(7) & 0xffL)
    first8 >>> 4 // 15 hex digits = the top 60 bits
  }

  /** Column wrapper; non-string inputs are cast to string explicitly (the
    * expression itself evaluates UTF8String only).
    */
  def hash64Col(c: Column): Column = {
    val e = ColumnBridge.expression(c)
    val stringy =
      if (e.resolved && e.dataType == StringType) e else Cast(e, StringType)
    ColumnBridge.column(Md5Prefix64(stringy))
  }
}
