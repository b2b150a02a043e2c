package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the claims `Money.scala` makes (SURVEY.md §5.4 money convention):
  *
  *  1. every money-typed column in the driver testdata sits EXACTLY on the
  *     cent grid (`x*100` is integral, so `cents` is lossless on raw
  *     columns) and `l_quantity` is integer-valued (the rollup_pricing
  *     exemption in RelationalQueries);
  *  2. Spark's `round` is half-away-from-zero on exact tie products —
  *     the semantics the DuckDB mirrors in `centsSql` assume (both
  *     engines compute the same IEEE product, so agreement on these
  *     pins the shared convention);
  *  3. `sumCents` is invariant under repartitioning (the accumulation-
  *     order independence that raw double sums lack — r4's bucketed_join
  *     red row).
  *
  * A testdata regeneration off the cent grid fails case 1 loudly instead
  * of silently voiding the convention.
  */
class MoneySpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  /** Rows where `c` is NOT the double nearest to an integer number of
    * cents — i.e. where the cents round-trip `round(x*scale)/scale == x`
    * fails. (`x*scale` itself need not be integral in doubles: for
    * x = nearest(k/100), x*100 lands within half an ulp of k, and k/100
    * computed back in doubles is exactly x — the lossless-on-raw-columns
    * claim in Money.scala.)
    */
  private def offGrid(df: DataFrame, c: String, scale: Double = 100.0): Long =
    df.select(col(c).cast("double").as("x"))
      .filter(col("x").isNotNull &&
        round(col("x") * scale) / scale =!= col("x"))
      .count()

  test("every money column in the testdata sits exactly on the cent grid") {
    val cases = Seq(
      (Tables.lineitem(spark, dir), Seq("l_extendedprice", "l_discount", "l_tax")),
      (Tables.orders(spark, dir), Seq("o_totalprice")),
      (Tables.customer(spark, dir), Seq("c_acctbal")),
      (Tables.supplier(spark, dir), Seq("s_acctbal")),
      (Tables.part(spark, dir), Seq("p_retailprice")))
    for ((df, cols) <- cases; c <- cols)
      assert(offGrid(df, c) == 0L, s"$c has values off the cent grid")
  }

  test("l_quantity is integer-valued (rollup_pricing's raw-double-sum exemption)") {
    assert(offGrid(Tables.lineitem(spark, dir), "l_quantity", scale = 1.0) == 0L)
  }

  test("round is half-away-from-zero on exact ties (the centsSql convention)") {
    // products chosen exactly representable in binary: x*100 IS the tie
    val ties = Seq(
      (0.125, 13L),   // 12.5  -> 13 (away from zero)
      (-0.125, -13L), // -12.5 -> -13
      (0.375, 38L),   // 37.5  -> 38
      (2.5, 250L),    // no tie — exact integral product
      (19.99, 1999L)) // classic price point
    val got = ties.map(_._1).toDF("x")
      .select(Money.cents(col("x")).as("c")).as[Long].collect().toSeq
    assert(got == ties.map(_._2), s"cents() mismatch: $got")
  }

  test("sumCents is repartition-invariant (raw double sum is order-dependent)") {
    val li = Tables.lineitem(spark, dir).select(col("l_extendedprice").as("x"))
    val sums = Seq(1, 7, 32).map { n =>
      li.repartition(n).agg(Money.sumCents(col("x")).as("s"))
        .as[Double].head()
    }
    assert(sums.distinct.size == 1,
      s"sumCents varies with partitioning: $sums")
    // and the total is itself on the cent grid
    assert(sums.head * 100.0 == math.rint(sums.head * 100.0))
  }

  // ---- Score grids (micros/nanos — the r7 strict-mode convention) ------------

  test("micros/nanos are idempotent and absorb last-ulp perturbations") {
    val xs = Seq(1.8475805825296261, 0.9999999999999999, -0.3246523063797349,
      2.715907737884824, 1e-4, 0.0)
    val df = xs.toDF("x")
    val once = df.select(Money.micros(col("x")).as("m"),
      Money.nanos(col("x")).as("n")).collect()
    val twice = df.select(Money.micros(Money.micros(col("x"))).as("m"),
      Money.nanos(Money.nanos(col("x"))).as("n")).collect()
    assert(once.map(_.toString).toSeq == twice.map(_.toString).toSeq,
      "grid pin must be idempotent (a grid point maps to itself)")
    // a one-ulp perturbation (the cross-libm case) lands on the SAME
    // grid point — the property the strict oracle relies on
    val ulped = xs.map(x => math.nextUp(x)).toDF("x")
      .select(Money.micros(col("x")).as("m"), Money.nanos(col("x")).as("n"))
      .collect()
    assert(once.map(_.toString).toSeq == ulped.map(_.toString).toSeq,
      "one-ulp input difference must not move the pinned output")
  }

  test("sumMicros is repartition-invariant over the events value column") {
    val ev = Tables.events(spark, dir).select(col("value").as("x"))
    val sums = Seq(1, 7, 32).map { n =>
      ev.repartition(n).agg(Money.sumMicros(col("x")).as("s"))
        .as[Double].head()
    }
    assert(sums.distinct.size == 1, s"sumMicros varies with partitioning: $sums")
  }
}
