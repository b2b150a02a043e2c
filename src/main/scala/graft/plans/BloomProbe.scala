package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd probe of a broadcast [[BloomFilter]] — the engine's last
  * Scala UDF replaced with a whole-stage-codegen expression: the UDF
  * boxed every digest to java.lang.String and broke the codegen span of
  * the filter it sat in; this probes the UTF-8 bytes directly
  * (`putString` hashes exactly those bytes, so `mightContainBinary` on
  * them is identical to `mightContainString`).
  *
  * NULL input returns FALSE (a null digest is definitely new), matching
  * the NOT EXISTS oracle semantics in Dedup.incrementalNew. Output is
  * therefore non-nullable.
  *
  * The expression references the Broadcast HANDLE, not the sketch: the
  * serialized plan ships a pointer and each executor reads the sketch
  * from its local broadcast store once.
  */
case class BloomMightContain(child: Expression,
                             bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom_might_contain"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    v != null && BloomMightContain.probe(bloom.value, v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBc", bloom,
      classOf[Broadcast[BloomFilter]].getName)
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        boolean ${ev.value} = false;
        if (!${c.isNull}) {
          ${ev.value} = graft.plans.BloomMightContain.probe(
            (org.apache.spark.util.sketch.BloomFilter) $ref.value(),
            ${c.value});
        }""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain = copy(child = newChild)
}

object BloomMightContain {

  /** Static kernel shared by eval and generated code. */
  def probe(b: BloomFilter, s: UTF8String): Boolean =
    b.mightContainBinary(s.getBytes)

  /** Column wrapper over a string column. */
  def probeCol(c: Column, bloom: Broadcast[BloomFilter]): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(c), bloom))
}
