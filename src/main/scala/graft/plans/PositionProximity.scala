package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Fused proximity primitives over two SORTED `array<int>` position lists —
  * the per-(doc, term-pair) kernels of positional proximity search. The
  * index already stores sorted positions (Indexer.postings `sort_array`;
  * the reference writes positions but never reads them, app/query.py:115-119
  * — phrase and proximity queries are what that column is FOR), so both
  * kernels run the classic two-pointer merges in O(|a| + |b|) where the
  * equivalent join formulation materializes |a| x |b| pairs per doc. They
  * run once per candidate (doc, pair) row inside whole-stage codegen; the
  * DuckDB oracles keep the quadratic join form, which is affordable at
  * oracle scale and provably identical.
  */
case class IntArrayMinAbsDiff(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "int_array_min_abs_diff"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toIntArray()
    val y = b.asInstanceOf[ArrayData].toIntArray()
    var i = 0; var j = 0
    var best = Long.MaxValue
    while (i < x.length && j < y.length) {
      val d = math.abs(x(i).toLong - y(j).toLong)
      if (d < best) best = d
      if (x(i) < y(j)) i += 1 else j += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      s"""
         |int $i = 0; int $j = 0;
         |long $best = Long.MAX_VALUE;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  long $d = Math.abs((long) $a.getInt($i) - (long) $b.getInt($j));
         |  if ($d < $best) $best = $d;
         |  if ($a.getInt($i) < $b.getInt($j)) $i++; else $j++;
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntArrayMinAbsDiff =
    copy(left = newLeft, right = newRight)
}

/** Count of (i, j) pairs with |a_i - b_j| <= window, via a monotone sliding
  * window over the sorted right list — O(|a| + |b|) amortized.
  */
case class IntArrayPairsWithin(left: Expression, right: Expression, window: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "int_array_pairs_within"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toIntArray()
    val y = b.asInstanceOf[ArrayData].toIntArray()
    var lo = 0; var hi = 0
    var n = 0L
    var i = 0
    while (i < x.length) {
      while (lo < y.length && y(lo) < x(i) - window) lo += 1
      if (hi < lo) hi = lo
      while (hi < y.length && y(hi) <= x(i) + window) hi += 1
      n += hi - lo
      i += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val n = ctx.freshName("n")
      s"""
         |int $lo = 0; int $hi = 0;
         |long $n = 0L;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  while ($lo < $b.numElements() && $b.getInt($lo) < $a.getInt($i) - $window) $lo++;
         |  if ($hi < $lo) $hi = $lo;
         |  while ($hi < $b.numElements() && $b.getInt($hi) <= $a.getInt($i) + $window) $hi++;
         |  $n += $hi - $lo;
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntArrayPairsWithin =
    copy(left = newLeft, right = newRight)
}

object PositionProximity {
  /** Minimum |a_i - b_j| between two sorted int-array columns. */
  def minAbsDiff(a: Column, b: Column): Column =
    ColumnBridge.column(
      IntArrayMinAbsDiff(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Count of cross pairs within `window` positions. */
  def pairsWithin(a: Column, b: Column, window: Int): Column =
    ColumnBridge.column(
      IntArrayPairsWithin(ColumnBridge.expression(a), ColumnBridge.expression(b),
        window))
}
