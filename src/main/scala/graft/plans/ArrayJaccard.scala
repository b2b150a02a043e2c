package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Fused set-jaccard over two `array<long>` columns.
  *
  * `size(array_intersect(a,b)) / size(array_union(a,b))` materializes two
  * intermediate arrays and builds three hash sets per row pair. This
  * expression makes one pass: set(a), probe b once, jaccard =
  * |a∩b| / (|set a| + |set b| - |a∩b|). It runs once per candidate pair in
  * the dedup verify stages, where pairs outnumber documents by orders of
  * magnitude. Identical set semantics to the composed form — the DuckDB
  * oracles (list_intersect / list_distinct) are unchanged.
  */
case class LongArrayJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "long_array_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData].toLongArray()
    val ys = b.asInstanceOf[ArrayData].toLongArray()
    val setA = new java.util.HashSet[java.lang.Long](xs.length * 2)
    var i = 0
    while (i < xs.length) { setA.add(xs(i)); i += 1 }
    val na = setA.size
    val seenB = new java.util.HashSet[java.lang.Long](ys.length * 2)
    var inter = 0
    var j = 0
    while (j < ys.length) {
      if (seenB.add(ys(j)) && setA.contains(ys(j))) inter += 1
      j += 1
    }
    val nb = seenB.size
    val union = na + nb - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val setA = ctx.freshName("setA")
      val seenB = ctx.freshName("seenB")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val inter = ctx.freshName("inter")
      val union = ctx.freshName("union")
      val v = ctx.freshName("v")
      s"""
         |java.util.HashSet<Long> $setA = new java.util.HashSet<Long>($a.numElements() * 2);
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  $setA.add($a.getLong($i));
         |}
         |java.util.HashSet<Long> $seenB = new java.util.HashSet<Long>($b.numElements() * 2);
         |int $inter = 0;
         |for (int $j = 0; $j < $b.numElements(); $j++) {
         |  long $v = $b.getLong($j);
         |  if ($seenB.add($v) && $setA.contains($v)) $inter++;
         |}
         |int $union = $setA.size() + $seenB.size() - $inter;
         |${ev.value} = ($union == 0) ? 0.0 : ((double) $inter) / $union;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayJaccard =
    copy(left = newLeft, right = newRight)
}

object ArrayJaccard {
  /** Column wrapper: fused jaccard of two array<long> columns. */
  def jaccardLong(a: Column, b: Column): Column =
    ColumnBridge.column(
      LongArrayJaccard(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
