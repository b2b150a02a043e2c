package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.CacheRegistry.RegisteredCache

/** Additional TPC-H query shapes over the trimmed test tables — each one a
  * distinct plan pattern the engine must get right at scale:
  *
  *  - Q7: role-playing dimensions (the same nation table joined twice under
  *    different roles) over a 5-way join.
  *  - Q13: outer-join fan-out followed by a two-level aggregation (the
  *    distribution-of-counts shape; the second aggregation is tiny).
  *  - Q15: aggregate-of-aggregate — a max over a grouped aggregate joined
  *    back to select the argmax rows (the "view + max" formulation).
  *  - Q17: per-group average gating its own group's rows (correlated
  *    aggregate subquery, decorrelated into a join).
  *  - Q22: scalar aggregate subquery as a broadcast filter + anti join.
  *
  * All aggregates cast to bigint/double and ordered deterministically so the
  * DuckDB oracle hash-compares.
  */
object TpchShapeQueries {

  // ---- Q7 shape: bidirectional trade volume, nation twice ------------------
  // The same dimension participates under two roles (supplier nation /
  // customer nation) — both broadcast; the fact-side join tree stays the
  // q5 star shape. Inequality on the two roles keeps only cross-nation
  // flows.
  def q7VolumeShipping(s: SparkSession, dir: String): DataFrame = {
    val n1 = broadcast(Tables.nation(s, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
    val n2 = broadcast(Tables.nation(s, dir)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
    val sup = broadcast(Tables.supplier(s, dir)
      .select(col("s_suppkey"), col("s_nationkey")))
    val cust = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
    val ord = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
        col("l_extendedprice"), col("l_discount"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(n1, col("s_nationkey") === col("s_nk"))
      .join(n2, col("c_nationkey") === col("c_nk"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      // cent-grid sum: q7's large per-group row counts make a raw double
      // sum the likeliest next accumulation-order hash flake (Money.scala)
      .agg(graft.Money.sumCents(
        col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val q7VolumeShippingSql: String =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |  ${graft.Money.sumCentsSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE n1.n_name <> n2.n_name
      |GROUP BY 1, 2, 3
      |ORDER BY 1, 2, 3""".stripMargin

  // ---- Q13 shape: outer-join fan-out + distribution of counts --------------
  // Orders-per-customer (zeros kept by the left outer join), then the tiny
  // second-level distribution. The first aggregation carries the data
  // volume; the second groups ~dozens of distinct counts.
  def q13CustDist(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_custkey"), col("o_orderkey"))
    Tables.customer(s, dir).select(col("c_custkey"))
      .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).cast("long").as("custdist"))
      .select(col("c_count").cast("long").as("c_count"), col("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13CustDistSql: String =
    """SELECT CAST(c_count AS BIGINT) AS c_count,
      |  CAST(count(*) AS BIGINT) AS custdist
      |FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey) c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // ---- Q15 shape: aggregate-of-aggregate argmax join-back ------------------
  // Revenue per supplier over a quarter; the single-row max broadcasts back
  // over the (small) grouped aggregate to select the winner(s) — the
  // decorrelated "HAVING total = (SELECT max(..))" plan.
  private val Q15From = "1996-01-01"
  private val Q15To = "1996-04-01"

  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    // revenue kept ON the integer cent grid end to end: the winner is
    // picked by an EXACT-equality join against the max, which is only
    // sound on longs — a raw double sum makes "equal to the max" an
    // accumulation-order coin flip (Money.scala)
    val rev = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit(Q15From).cast("timestamp") &&
        col("l_shipdate") < lit(Q15To).cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(graft.Money.sumCentsLong(
        col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev_cents"))
    val mx = rev.agg(max(col("rev_cents")).as("mx"))
    rev.join(broadcast(mx), col("rev_cents") === col("mx"))
      .join(broadcast(Tables.supplier(s, dir)
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        (col("rev_cents").cast("double") / 100.0).as("total_revenue"))
      .orderBy("s_suppkey")
  }

  val q15TopSupplierSql: String =
    s"""WITH revenue AS (
       |  SELECT l_suppkey,
       |    ${graft.Money.sumCentsLongSql("l_extendedprice * (1.0 - l_discount)")}
       |      AS rev_cents
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '$Q15From'
       |    AND l_shipdate < TIMESTAMP '$Q15To'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name,
       |  CAST(rev_cents AS DOUBLE) / 100.0 AS total_revenue
       |FROM revenue JOIN supplier ON l_suppkey = s_suppkey
       |WHERE rev_cents = (SELECT max(rev_cents) FROM revenue)
       |ORDER BY s_suppkey""".stripMargin

  // ---- Q17 shape: per-group average gating its own rows --------------------
  // Small-quantity line items of one brand: each row compares against 20% of
  // ITS part's average quantity. The correlated subquery decorrelates into a
  // per-part aggregate joined back; restricting to the brand's parts FIRST
  // (broadcast semi-join) means the per-part averages aggregate only the
  // gated parts' rows — identical semantics (the correlation key is the
  // part), a fraction of the work.
  private val Q17Brand = "Brand#4"

  def q17SmallQuantity(s: SparkSession, dir: String): DataFrame = {
    val brandParts = broadcast(Tables.part(s, dir)
      .filter(col("p_brand") === Q17Brand).select(col("p_partkey")))
    val li = Tables.lineitem(s, dir)
      .join(brandParts, col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val perPart = li.groupBy(col("l_partkey").as("t_partkey"))
      .agg((avg(col("l_quantity")) * 0.2).as("qty_thresh"))
    li.join(broadcast(perPart), col("l_partkey") === col("t_partkey"))
      .filter(col("l_quantity") < col("qty_thresh"))
      // cent-grid sum before the /7: whole-corpus money magnitude is
      // exactly the accumulation-order class that flaked bucketed_join
      .agg((graft.Money.sumCents(col("l_extendedprice")) / 7.0)
        .cast("double").as("avg_yearly"))
  }

  val q17SmallQuantitySql: String =
    s"""SELECT CAST(${graft.Money.sumCentsSql("l_extendedprice")} / 7.0 AS DOUBLE) AS avg_yearly
       |FROM lineitem
       |JOIN part ON p_partkey = l_partkey
       |WHERE p_brand = '$Q17Brand'
       |  AND l_quantity < (
       |    SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
       |    WHERE l2.l_partkey = p_partkey)""".stripMargin

  // ---- Q22 shape: scalar subquery threshold + anti join --------------------
  // Well-funded customers with no urgent orders: the positive-balance
  // average is a 1-row broadcast; "no urgent order" is the anti join (the
  // priority condition keeps the set non-trivial on the dense test data,
  // where nearly every customer has SOME order). Grouped by nation (the
  // trimmed schema's stand-in for Q22's phone country code).
  def q22InactiveCustomers(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
    // the threshold GATES row membership, so it must be bit-identical in
    // both engines in any accumulation order: exact cent sum / count
    // (both single IEEE divisions on identical operands), never avg()
    val avgBal = cust.filter(col("c_acctbal") > 0.0)
      .agg((graft.Money.sumCentsLong(col("c_acctbal")).cast("double") / 100.0 /
        count(lit(1)).cast("double")).as("ab"))
    cust.join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("ab"))
      .join(Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).cast("long").as("numcust"),
        graft.Money.sumCents(col("c_acctbal")).as("totacctbal"))
      .select(col("c_nationkey").cast("long").as("nationkey"),
        col("numcust"), col("totacctbal"))
      .orderBy("nationkey")
  }

  val q22InactiveCustomersSql: String =
    s"""SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
      |  CAST(count(*) AS BIGINT) AS numcust,
      |  ${graft.Money.sumCentsSql("c_acctbal")} AS totacctbal
      |FROM customer
      |WHERE c_acctbal > (
      |    SELECT CAST(${graft.Money.sumCentsLongSql("c_acctbal")} AS DOUBLE)
      |      / 100.0 / CAST(count(*) AS DOUBLE)
      |    FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY c_nationkey
      |ORDER BY nationkey""".stripMargin

  // ---- LATERAL correlated subquery -------------------------------------------
  // Top-2 orders per active customer via SQL-text LATERAL — the correlated
  // per-row subquery surface (Spark plans it as a LateralJoin that
  // decorrelates into a ranked join; DuckDB executes the same text shape).
  // Result set equals the window formulation; the plan is the point.
  def lateralTopOrders(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("graft_customer")
    Tables.orders(s, dir).createOrReplaceTempView("graft_orders")
    s.sql(
      """SELECT c_custkey, t.o_orderkey, t.total
        |FROM graft_customer,
        |LATERAL (
        |  SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS total
        |  FROM graft_orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 350000
        |  ORDER BY o_totalprice DESC, o_orderkey ASC
        |  LIMIT 2) t
        |ORDER BY c_custkey, total DESC, o_orderkey""".stripMargin)
  }

  val lateralTopOrdersSql: String =
    """SELECT c_custkey, t.o_orderkey, t.total
      |FROM customer,
      |LATERAL (
      |  SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS total
      |  FROM orders
      |  WHERE o_custkey = c_custkey AND o_totalprice > 350000
      |  ORDER BY o_totalprice DESC, o_orderkey ASC
      |  LIMIT 2) t
      |ORDER BY c_custkey, total DESC, o_orderkey""".stripMargin

  // ---- Q4 shape: EXISTS decorrelated to a semi join ------------------------
  // Orders in a quarter that had at least one returned line item, counted by
  // priority. The EXISTS never needs the lineitem payload — a left-semi hash
  // join on orderkey is the whole plan; the date filter prunes the probe
  // side before the shuffle. (The trimmed lineitem has no commit/receipt
  // dates, so "late delivery" becomes "had a return" — same plan shape.)
  private val Q4From = "1996-01-01"
  private val Q4To = "1996-04-01"

  def q4OrderPriority(s: SparkSession, dir: String): DataFrame = {
    val returned = Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R").select(col("l_orderkey"))
    Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit(Q4From).cast("timestamp") &&
        col("o_orderdate") < lit(Q4To).cast("timestamp"))
      .join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).cast("long").as("order_count"))
      .orderBy("o_orderpriority")
  }

  val q4OrderPrioritySql: String =
    s"""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
       |FROM orders
       |WHERE o_orderdate >= TIMESTAMP '$Q4From'
       |  AND o_orderdate < TIMESTAMP '$Q4To'
       |  AND EXISTS (SELECT 1 FROM lineitem
       |    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin

  // ---- Q8 shape: market share (ratio of conditional sums per group) --------
  // One nation's share of a region's part-type trade, per year: the 6-way
  // star join (all dims broadcast) feeding a conditional-sum ratio. The
  // CASE lives inside the aggregate so one pass computes numerator and
  // denominator — no second scan, no self-join.
  private val Q8Region = "ASIA"
  private val Q8Nation = "CHINA"
  private val Q8Type = "ECONOMY"

  def q8MarketShare(s: SparkSession, dir: String): DataFrame = {
    val asiaNations = broadcast(Tables.nation(s, dir)
      .join(Tables.region(s, dir).filter(col("r_name") === Q8Region),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("c_nk")))
    val suppNation = broadcast(Tables.nation(s, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
    val econParts = broadcast(Tables.part(s, dir)
      .filter(col("p_type") === Q8Type).select(col("p_partkey")))
    val sup = broadcast(Tables.supplier(s, dir)
      .select(col("s_suppkey"), col("s_nationkey")))
    val cust = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
    val ord = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"))
      .join(econParts, col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(asiaNations, col("c_nationkey") === col("c_nk"), "left_semi")
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(suppNation, col("s_nationkey") === col("s_nk"))
      .withColumn("volume", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg((sum(when(col("supp_nation") === Q8Nation, col("volume"))
        .otherwise(lit(0.0))) / sum(col("volume")))
        .cast("double").as("mkt_share"))
      .orderBy("o_year")
  }

  val q8MarketShareSql: String =
    s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       |  CAST(sum(CASE WHEN n2.n_name = '$Q8Nation'
       |        THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END)
       |    / sum(l_extendedprice * (1.0 - l_discount)) AS DOUBLE) AS mkt_share
       |FROM lineitem
       |JOIN part ON p_partkey = l_partkey
       |JOIN orders ON o_orderkey = l_orderkey
       |JOIN customer ON c_custkey = o_custkey
       |JOIN nation n1 ON n1.n_nationkey = c_nationkey
       |JOIN region ON r_regionkey = n1.n_regionkey
       |JOIN supplier ON s_suppkey = l_suppkey
       |JOIN nation n2 ON n2.n_nationkey = s_nationkey
       |WHERE r_name = '$Q8Region' AND p_type = '$Q8Type'
       |GROUP BY 1
       |ORDER BY 1""".stripMargin

  // ---- Q10 shape: returned-item revenue, deterministic top-20 --------------
  // Customers ranked by revenue lost to returns in a quarter. The heavy
  // part is the lineitem-orders join; customer and nation attach by
  // broadcast AFTER the aggregation (k rows, not fact rows) — the same
  // attach-dims-to-winners discipline as the BM25 title join.
  private val Q10From = "1996-07-01"
  private val Q10To = "1996-10-01"

  def q10ReturnedItems(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit(Q10From).cast("timestamp") &&
        col("o_orderdate") < lit(Q10To).cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val perCust = Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      // cent-grid revenue: the top-20 CUT reads this value, so an
      // accumulation-order ulp could otherwise swap the boundary row —
      // a row-set flake, not just a hash ulp
      .agg(graft.Money.sumCents(
        col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("o_custkey").asc)
      .limit(20)
    perCust
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_acctbal"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue"),
        col("c_acctbal").cast("double").as("c_acctbal"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
  }

  val q10ReturnedItemsSql: String =
    s"""SELECT c_custkey, c_name,
       |  ${graft.Money.sumCentsSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |  CAST(c_acctbal AS DOUBLE) AS c_acctbal, n_name
       |FROM lineitem
       |JOIN orders ON o_orderkey = l_orderkey
       |JOIN customer ON c_custkey = o_custkey
       |JOIN nation ON n_nationkey = c_nationkey
       |WHERE l_returnflag = 'R'
       |  AND o_orderdate >= TIMESTAMP '$Q10From'
       |  AND o_orderdate < TIMESTAMP '$Q10To'
       |GROUP BY c_custkey, c_name, c_acctbal, n_name
       |ORDER BY revenue DESC, c_custkey ASC
       |LIMIT 20""".stripMargin

  // ---- Q14 shape: conditional-sum ratio as one scalar ----------------------
  // Share of one part class in a month's revenue: single-pass CASE inside
  // the aggregate over the month's join, one output row. The part dim
  // broadcasts; the month filter prunes the fact scan first.
  private val Q14Month = "1997-03-01"
  private val Q14NextMonth = "1997-04-01"

  def q14ClassShare(s: SparkSession, dir: String): DataFrame = {
    val parts = broadcast(Tables.part(s, dir)
      .select(col("p_partkey"), col("p_type")))
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit(Q14Month).cast("timestamp") &&
        col("l_shipdate") < lit(Q14NextMonth).cast("timestamp"))
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      .join(parts, col("l_partkey") === col("p_partkey"))
      .withColumn("volume", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .agg((lit(100.0) *
        sum(when(col("p_type") === Q8Type, col("volume")).otherwise(lit(0.0))) /
        sum(col("volume"))).cast("double").as("class_share"))
  }

  val q14ClassShareSql: String =
    s"""SELECT CAST(100.0 * sum(CASE WHEN p_type = '$Q8Type'
       |      THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END)
       |    / sum(l_extendedprice * (1.0 - l_discount)) AS DOUBLE) AS class_share
       |FROM lineitem JOIN part ON p_partkey = l_partkey
       |WHERE l_shipdate >= TIMESTAMP '$Q14Month'
       |  AND l_shipdate < TIMESTAMP '$Q14NextMonth'""".stripMargin

  // ---- Q19 shape: OR-of-ANDs join predicate --------------------------------
  // Three disjoint (brand, size-range, quantity-range) clauses OR'd across
  // the part join. The common conjuncts Catalyst can factor out
  // (p_partkey equality, the quantity/size bounds' union) stay pushable;
  // the residual disjunction evaluates post-join — the classic CNF
  // extraction test. Part still broadcasts, so no shuffle either way.
  def q19Disjunctive(s: SparkSession, dir: String): DataFrame = {
    val parts = broadcast(Tables.part(s, dir)
      .select(col("p_partkey"), col("p_brand"), col("p_size")))
    Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
      .join(parts, col("l_partkey") === col("p_partkey") && (
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30))))
      .agg(graft.Money.sumCents(
        col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
  }

  val q19DisjunctiveSql: String =
    s"""SELECT ${graft.Money.sumCentsSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
      |       AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
      |       AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  // ---- Q21 shape: semi + anti correlated on the same fact ------------------
  // Suppliers who were the SOLE returner in multi-supplier finished orders:
  // EXISTS (another supplier in the order) AND NOT EXISTS (another supplier
  // who also returned). Both correlations decorrelate to order-level
  // aggregates over one scan — count distinct suppliers overall and among
  // returners — instead of two more joins against the fact table; the
  // order-level frame then joins back once. Top 20 by count.
  def q21SoleReturner(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
    val finished = Tables.orders(s, dir)
      .filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
    val orderStats = li.join(finished, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_orderkey").as("g_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("l_returnflag") === "R", col("l_suppkey")))
          .as("n_ret_supp"))
      .filter(col("n_supp") > 1 && col("n_ret_supp") === 1)
    val perSupp = li.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
      .join(orderStats, col("l_orderkey") === col("g_orderkey"))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).cast("long").as("numwait"))
    perSupp
      .join(broadcast(Tables.supplier(s, dir)
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
      .limit(20)
  }

  val q21SoleReturnerSql: String =
    """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
      |FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
      |      WHERE l_returnflag = 'R') l1
      |JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
      |JOIN supplier ON s_suppkey = l1.l_suppkey
      |WHERE EXISTS (SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey
      |      AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey
      |      AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R')
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name ASC
      |LIMIT 20""".stripMargin

  // ---- Q6 shape: scan-only predicate aggregation ---------------------------
  // The forecasting-revenue-change query: no join at all — the whole plan
  // is a parquet scan with three pushable predicates feeding one scalar
  // aggregate. Its value as a shape is the SCAN: every predicate
  // (timestamp range, double range, double upper bound) must reach the
  // reader as PushedFilters so at 100 TB only matching row groups are
  // decoded (min/max pruning); PlanAudit's pushdown sweep covers it.
  // Revenue sums on the cent grid (order-free).
  def q6ForecastRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(graft.Money.sumCents(col("l_extendedprice") * col("l_discount"))
        .as("revenue"),
        count(lit(1)).cast("long").as("n_items"))

  val q6ForecastRevenueSql: String =
    s"""SELECT ${graft.Money.sumCentsSql("l_extendedprice * l_discount")} AS revenue,
       |  CAST(count(*) AS BIGINT) AS n_items
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
       |  AND l_shipdate < TIMESTAMP '1997-01-01'
       |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  // ---- Q9 shape: product-type profit rollup --------------------------------
  // Profit by supplier nation and order year for one part family. The
  // classic Q9 prices cost from partsupp; the trimmed schema has no
  // partsupp, so cost is priced off the part's own retail price
  // (0.6 * p_retailprice * l_quantity) — the JOIN TREE is the point:
  // lineitem fans out to TWO role dims (part by partkey, supplier by
  // suppkey) plus orders for the year, with a non-pushable substring
  // filter on p_name trimming the part side before the fact join. Part
  // and supplier are dims (orders of magnitude below the fact table), so
  // both broadcast after the filter/projection; profit lands on the cent
  // grid — one round per row, exact long sum in any order.
  def q9ProductProfit(s: SparkSession, dir: String): DataFrame = {
    val gearParts = broadcast(Tables.part(s, dir)
      .filter(col("p_name").contains("gear"))
      .select(col("p_partkey"), col("p_retailprice")))
    val sup = broadcast(Tables.supplier(s, dir)
      .select(col("s_suppkey"), col("s_nationkey")))
    val nat = broadcast(Tables.nation(s, dir)
      .select(col("n_nationkey"), col("n_name")))
    val ord = Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate"))
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .join(gearParts, col("l_partkey") === col("p_partkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(nat, col("s_nationkey") === col("n_nationkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(graft.Money.sumCents(
        col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          - col("p_retailprice") * col("l_quantity") * lit(0.6)).as("profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val q9ProductProfitSql: String =
    s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       |  ${graft.Money.sumCentsSql(
            "l_extendedprice * (1.0 - l_discount) " +
              "- p_retailprice * l_quantity * 0.6")} AS profit
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN orders ON l_orderkey = o_orderkey
       |WHERE p_name LIKE '%gear%'
       |GROUP BY 1, 2
       |ORDER BY nation, o_year DESC""".stripMargin

  // ---- Q11 shape: group-sum gated by a global scalar aggregate -------------
  // Parts whose revenue exceeds 1.5x the mean per-part revenue. Classic
  // Q11 gates on a FRACTION of the global total; a fixed fraction goes
  // degenerate as the part count scales (mean share ~ 1/|parts|), so the
  // gate here is relative to the mean — same plan shape (grouped
  // aggregate cross-joined against its own one-row rollup, HAVING
  // decorrelated into a broadcast filter), but meaningful at every SF.
  // The compare stays on the integer cent grid (2*cents*n > 3*total is
  // exact long arithmetic), so row MEMBERSHIP can never hash-flake.
  def q11ImportantParts(s: SparkSession, dir: String): DataFrame = {
    val pv = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey"))
      .agg(graft.Money.sumCentsLong(
        col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("cents"))
    val tot = pv.agg(sum(col("cents")).as("t"), count(lit(1)).as("n"))
    pv.join(broadcast(tot))
      .filter(lit(2) * col("cents") * col("n") > lit(3) * col("t"))
      .select(col("l_partkey").cast("long").as("partkey"),
        (col("cents").cast("double") / 100.0).as("part_value"))
      .orderBy(col("part_value").desc, col("partkey"))
  }

  val q11ImportantPartsSql: String =
    s"""WITH pv AS (
       |  SELECT l_partkey,
       |    ${graft.Money.sumCentsLongSql(
            "l_extendedprice * (1.0 - l_discount)")} AS cents
       |  FROM lineitem GROUP BY 1),
       |tot AS (SELECT sum(cents) AS t, count(*) AS n FROM pv)
       |SELECT CAST(l_partkey AS BIGINT) AS partkey,
       |  CAST(cents AS DOUBLE) / 100.0 AS part_value
       |FROM pv, tot
       |WHERE 2 * cents * n > 3 * t
       |ORDER BY part_value DESC, partkey""".stripMargin

  // ---- Q16 shape: NOT-IN exclusion + count distinct by attributes ----------
  // Distinct supplier counts per (brand, type, size) for a filtered part
  // family, excluding flagged suppliers (negative balance stands in for
  // Q16's complaints filter). The NOT IN decorrelates to a broadcast
  // LEFT ANTI against a tiny supplier set BEFORE the aggregation, and
  // countDistinct expands to the standard two-phase (partial distinct,
  // then count) hash aggregation — no row ever carries more than the
  // four output columns through the shuffle.
  def q16SupplierCounts(s: SparkSession, dir: String): DataFrame = {
    val parts = broadcast(Tables.part(s, dir)
      .filter(col("p_brand") =!= "Brand#13" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size")))
    val flagged = broadcast(Tables.supplier(s, dir)
      .filter(col("s_acctbal") < 0.0).select(col("s_suppkey")))
    Tables.lineitem(s, dir).select(col("l_partkey"), col("l_suppkey"))
      .join(parts, col("l_partkey") === col("p_partkey"))
      .join(flagged, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"),
        col("p_size").cast("long").as("p_size"))
      .agg(countDistinct(col("l_suppkey")).cast("long").as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  val q16SupplierCountsSql: String =
    """SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
      |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // ---- Q20 shape: nested aggregate threshold + semi-join chain -------------
  // Suppliers who dominate a part family: shipped more than 2x the part's
  // mean per-supplier quantity, for parts named 'red*', limited to three
  // regions. Q20's correlated "availqty > half of shipped" subquery
  // becomes pair-aggregate vs part-rollup joined on partkey — the
  // threshold compares exact long quantity sums scaled by integer counts
  // (q*ns > 2*tq), and the supplier table attaches by LEFT SEMI so each
  // winner appears once regardless of how many parts it dominates.
  def q20DominantSuppliers(s: SparkSession, dir: String): DataFrame = {
    val redParts = broadcast(Tables.part(s, dir)
      .filter(col("p_name").startsWith("red")).select(col("p_partkey")))
    val pairs = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
      .join(redParts, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).cast("long").as("q"))
    val perPart = pairs.groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("q")).as("tq"), count(lit(1)).as("ns"))
    // distinct FIRST, then an inner join to supplier: a LEFT SEMI pins
    // supplier as the streamed side (Spark cannot build the left), which
    // forces a sort-merge even when the winner set is tiny; after the
    // distinct both orientations are equivalent, and an inner join lets
    // AQE build whichever side is actually small at runtime.
    val winners = pairs.join(perPart, col("l_partkey") === col("pk"))
      .filter(col("q") * col("ns") > lit(2) * col("tq"))
      .select(col("l_suppkey")).distinct()
    val nat = broadcast(Tables.nation(s, dir)
      .filter(col("n_regionkey") < 3)
      .select(col("n_nationkey"), col("n_name")))
    Tables.supplier(s, dir)
      .join(winners, col("s_suppkey") === col("l_suppkey"))
      .join(nat, col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey").cast("long").as("suppkey"), col("s_name"),
        col("n_name").as("nation"))
      .orderBy("s_name")
  }

  val q20DominantSuppliersSql: String =
    """WITH pairs AS (
      |  SELECT l_partkey, l_suppkey, CAST(sum(l_quantity) AS BIGINT) AS q
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_name LIKE 'red%'
      |  GROUP BY 1, 2),
      |per_part AS (
      |  SELECT l_partkey, sum(q) AS tq, count(*) AS ns FROM pairs GROUP BY 1)
      |SELECT CAST(s_suppkey AS BIGINT) AS suppkey, s_name, n_name AS nation
      |FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_regionkey < 3
      |  AND s_suppkey IN (
      |    SELECT l_suppkey FROM pairs JOIN per_part USING (l_partkey)
      |    WHERE q * ns > 2 * tq)
      |ORDER BY s_name""".stripMargin

  // ---- Q2 shape: per-part min-cost argmin join-back, double-scoped ---------
  // The classic Q2 correlated subquery — "the supplier whose cost IS the
  // minimum cost for that part, among suppliers of one region" — with the
  // region scope applied BOTH inside the min and outside (the decorrelated
  // plan must use the same scoped offer set twice or it answers a different
  // question). The trimmed schema has no partsupp, so an offer is priced
  // from lineitem history: a supplier's cost for a part = its minimum
  // observed unit price, on the integer cent grid (one IEEE multiply+divide
  // per row, identical in both engines; min over longs is order-free), so
  // the argmin equality join-back can never hash-flake. Offers aggregate
  // the fact table once; the per-part min is an aggregate OVER that
  // aggregate (bounded by |part|×|supplier|), broadcast back.
  def q2MinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    val euroSupp = broadcast(Tables.supplier(s, dir)
      .join(Tables.nation(s, dir).filter(col("n_regionkey") === 3),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
        col("n_name")))
    val sizedParts = broadcast(Tables.part(s, dir)
      .filter(col("p_type") === "STANDARD" && col("p_size") <= 10)
      .select(col("p_partkey"), col("p_brand")))
    val offers = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        round(lit(100.0) * col("l_extendedprice") / col("l_quantity"))
          .cast("long").as("unit_cents"))
      .join(sizedParts, col("l_partkey") === col("p_partkey"))
      .join(euroSupp.select(col("s_suppkey")), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"), col("p_brand"))
      .agg(min(col("unit_cents")).as("cost_cents"))
      // referenced twice (per-part min build + argmin probe) — cache the
      // aggregate or the fact scan underneath it executes twice
      .registeredCache()
    val perPart = offers.groupBy(col("l_partkey").as("mk"))
      .agg(min(col("cost_cents")).as("min_cents"))
    offers.join(broadcast(perPart),
        col("l_partkey") === col("mk") && col("cost_cents") === col("min_cents"))
      .join(euroSupp, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name").as("nation"),
        col("l_partkey").cast("long").as("partkey"), col("p_brand"),
        (col("cost_cents").cast("double") / 100.0).as("min_unit_cost"))
      .orderBy(col("s_acctbal").desc, col("nation"), col("s_name"),
        col("partkey"))
      .limit(100)
  }

  val q2MinCostSupplierSql: String =
    """WITH offers AS (
      |  SELECT l_partkey, l_suppkey, p_brand,
      |    min(CAST(round(100.0 * l_extendedprice / l_quantity) AS BIGINT))
      |      AS cost_cents
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE p_type = 'STANDARD' AND p_size <= 10 AND n_regionkey = 3
      |  GROUP BY 1, 2, 3),
      |per_part AS (
      |  SELECT l_partkey AS mk, min(cost_cents) AS min_cents
      |  FROM offers GROUP BY 1)
      |SELECT s_acctbal, s_name, n_name AS nation,
      |  CAST(l_partkey AS BIGINT) AS partkey, p_brand,
      |  CAST(cost_cents AS DOUBLE) / 100.0 AS min_unit_cost
      |FROM offers
      |JOIN per_part ON l_partkey = mk AND cost_cents = min_cents
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |ORDER BY s_acctbal DESC, nation, s_name, partkey
      |LIMIT 100""".stripMargin

  // ---- Q12 shape: fact-fact join + two-way conditional count ---------------
  // Late-shipping priority split: line items of one ship year joined to
  // their orders, counted into high/low priority per category in ONE pass
  // (sum-of-CASE — no second scan, no pivot). The trimmed schema has no
  // l_shipmode/l_receiptdate, so l_returnflag plays the mode column and
  // the ship-year window stands in for the receipt window; the PLAN is the
  // point: both join sides are facts (orders cannot broadcast at scale),
  // so this is the canonical shuffled equi-join the engine must get right,
  // with the date filter pushed to the lineitem scan trimming the probe
  // side before the exchange.
  def q12ShipmodePriority(s: SparkSession, dir: String): DataFrame = {
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_returnflag"))
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag").as("ship_mode"))
      .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("ship_mode")
  }

  val q12ShipmodePrioritySql: String =
    """SELECT l_returnflag AS ship_mode,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      |  AND l_shipdate < TIMESTAMP '1996-01-01'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q2_min_cost_supplier" -> (q2MinCostSupplier _),
    "q12_shipmode_priority" -> (q12ShipmodePriority _),
    "q4_order_priority" -> (q4OrderPriority _),
    "q6_forecast_revenue" -> (q6ForecastRevenue _),
    "q7_volume_shipping" -> (q7VolumeShipping _),
    "q8_market_share" -> (q8MarketShare _),
    "q10_returned_items" -> (q10ReturnedItems _),
    "q13_custdist" -> (q13CustDist _),
    "q14_class_share" -> (q14ClassShare _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q17_small_quantity" -> (q17SmallQuantity _),
    "q19_disjunctive" -> (q19Disjunctive _),
    "q21_sole_returner" -> (q21SoleReturner _),
    "q22_inactive_customers" -> (q22InactiveCustomers _),
    "q9_product_profit" -> (q9ProductProfit _),
    "q11_important_parts" -> (q11ImportantParts _),
    "q16_supplier_counts" -> (q16SupplierCounts _),
    "q20_dominant_suppliers" -> (q20DominantSuppliers _),
    "lateral_top_orders" -> (lateralTopOrders _))

  val oracles: Map[String, String] = Map(
    "q2_min_cost_supplier" -> q2MinCostSupplierSql,
    "q12_shipmode_priority" -> q12ShipmodePrioritySql,
    "q4_order_priority" -> q4OrderPrioritySql,
    "q6_forecast_revenue" -> q6ForecastRevenueSql,
    "q7_volume_shipping" -> q7VolumeShippingSql,
    "q8_market_share" -> q8MarketShareSql,
    "q10_returned_items" -> q10ReturnedItemsSql,
    "q13_custdist" -> q13CustDistSql,
    "q14_class_share" -> q14ClassShareSql,
    "q15_top_supplier" -> q15TopSupplierSql,
    "q17_small_quantity" -> q17SmallQuantitySql,
    "q19_disjunctive" -> q19DisjunctiveSql,
    "q21_sole_returner" -> q21SoleReturnerSql,
    "q22_inactive_customers" -> q22InactiveCustomersSql,
    "q9_product_profit" -> q9ProductProfitSql,
    "q11_important_parts" -> q11ImportantPartsSql,
    "q16_supplier_counts" -> q16SupplierCountsSql,
    "q20_dominant_suppliers" -> q20DominantSuppliersSql,
    "lateral_top_orders" -> lateralTopOrdersSql)
}
