package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the vector hot path.
  *
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` evaluates higher-order
  * functions interpretively (one closure call per element, boxed lambda
  * variables) and sits outside whole-stage codegen. This BinaryExpression
  * generates a tight primitive loop instead — the difference is ~10x on
  * 64-dim cosine scoring over pair-joined candidates (ANN / embedding
  * dedup), where the dot product runs once per candidate pair.
  *
  * Semantics match the sequential fold exactly (same order, same IEEE
  * arithmetic), so DuckDB's list_dot_product oracle still agrees.
  */
case class DoubleArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "double_array_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    val y = b.asInstanceOf[ArrayData].toDoubleArray()
    val n = math.min(x.length, y.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x(i) * y(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleArrayDot =
    copy(left = newLeft, right = newRight)
}

/** Dot of an array<double> column against a COMPILE-TIME-CONSTANT vector.
  *
  * The generic form with a `CreateArray` of literals codegens dim
  * `update(i, const)` statements per plane per row — at wide LSH
  * geometries (48 planes x 64 dims at the x100 probe) that's thousands
  * of statements in one projection method: past Janino's 64KB limit into
  * interpreted fallback, and a fresh array allocation per row even when
  * it compiles. Here the constants ride along as ONE referenced double[]
  * (ctx.addReferenceObj — a field of the generated class, materialized
  * once), and the loop is the same tight primitive sweep. IEEE order
  * identical to [[DoubleArrayDot]], so the DuckDB list_dot_product
  * oracle is unaffected.
  */
case class DoubleArrayDotConst(child: Expression, consts: IndexedSeq[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  /** `consts` rides as IndexedSeq, NOT Array: case-class equality over an
    * Array parameter is reference equality, so two builds of the same
    * logical plan would never canonicalize equal — breaking CacheManager's
    * identical-plan dedup (a re-invoked query re-caches instead of
    * reusing; the r7 bench measured label_propagation's edge cache missing
    * on every run, 0.8 s -> 3.5 s, plus duplicate-cache memory pressure
    * across the sweep).
    */
  private lazy val arr: Array[Double] = consts.toArray

  override def dataType: DataType = DoubleType
  override def prettyName: String = "double_array_dot_const"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), arr.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * arr(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val arr = ctx.addReferenceObj("planeConsts", this.arr, "double[]")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $arr.length);
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $arr[$i];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): DoubleArrayDotConst =
    copy(child = newChild)
}

object VectorExprs {
  /** Column wrapper: dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      DoubleArrayDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Dot of an array<double> column against a constant vector (one
    * referenced double[] in codegen, not dim inline literals). The copy
    * to an immutable IndexedSeq buys structural plan equality (see
    * [[DoubleArrayDotConst]]).
    */
  def dotConst(a: Column, consts: Array[Double]): Column =
    ColumnBridge.column(
      DoubleArrayDotConst(ColumnBridge.expression(a), consts.toIndexedSeq))
}
