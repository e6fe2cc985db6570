package graft.operators

import graft.{Fx, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The remaining TPC-H classics (Q7/Q11/Q12/Q20/Q21/Q22 analogues) —
  * the subquery-heavy tail of the suite, adapted to the testdata
  * schema like [[TpchClassics]] (no partsupp → supply value modeled
  * from retail price; no commit/receipt dates → "late" means shipped
  * more than 60 days after the order date).
  *
  * Scale design mirrors TpchClassics: dimensions broadcast, fact⋈fact
  * shuffles only on keys both sides already produce. The subquery
  * shapes map to their distributed forms — IN → LEFT SEMI, NOT EXISTS
  * → LEFT ANTI, scalar aggregates → 1-row broadcast cross join (a
  * BroadcastNestedLoopJoin over a single row, not a driver collect).
  */
object TpchSubqueries {
  import Fx._

  private def ts(s: String) = to_timestamp(lit(s))

  /** Q7 shape — volume shipping: revenue flowing from suppliers of any
    * nation to customers of one region, per (supp nation, cust nation,
    * ship year) pair, both directions distinct. Two broadcast dim
    * chains hang off the single lineitem⋈orders shuffle. */
  def q116(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val custNat = Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, d).filter($"r_name" === "ASIA")),
        $"n_regionkey" === $"r_regionkey")
      .select($"c_custkey", $"n_name".as("cust_nation"))
    val supNat = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name".as("supp_nation"))
    Tables.lineitem(s, d)
      .filter($"l_shipdate" >= ts("1996-01-01") && $"l_shipdate" < ts("1998-01-01"))
      .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(custNat), $"o_custkey" === $"c_custkey")
      .join(broadcast(supNat), $"l_suppkey" === $"s_suppkey")
      .filter($"supp_nation" =!= $"cust_nation")
      .groupBy($"supp_nation", $"cust_nation",
        year($"l_shipdate").cast("int").as("l_year"))
      .agg(rev4Sum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }

  val q116Sql: String =
    s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       |  CAST(year(l_shipdate) AS INT) AS l_year,
       |  ${sqlRev4Sum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation cn ON c_nationkey = cn.n_nationkey
       |JOIN region ON cn.n_regionkey = r_regionkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation sn ON s_nationkey = sn.n_nationkey
       |WHERE r_name = 'ASIA'
       |  AND sn.n_name <> cn.n_name
       |  AND l_shipdate >= TIMESTAMP '1996-01-01'
       |  AND l_shipdate < TIMESTAMP '1998-01-01'
       |GROUP BY 1, 2, 3
       |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** Q11 shape — important stock: shipped-value per part brand, kept
    * only when the brand carries more than 2% of the global value. The
    * global total is a scalar aggregate → 1-row broadcast cross join;
    * both sides of the comparison are grid-rounded sums, so the
    * threshold test is identical IEEE arithmetic in both engines. */
  def q117(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val valued = Tables.lineitem(s, d)
      .join(broadcast(
        Tables.part(s, d).select($"p_partkey", $"p_brand", $"p_retailprice")),
        $"l_partkey" === $"p_partkey")
      .select($"p_brand", (lit(0.5) * $"p_retailprice" * $"l_quantity").as("v"))
    val byBrand = valued.groupBy($"p_brand").agg(rev4Sum($"v").as("value"))
    val total = valued.agg(rev4Sum($"v").as("total_value"))
    byBrand
      .crossJoin(broadcast(total))
      .filter($"value" > $"total_value" * 0.02)
      .select($"p_brand", $"value")
      .orderBy($"value".desc, $"p_brand")
  }

  val q117Sql: String =
    s"""WITH valued AS (
       |  SELECT p_brand, 0.5 * p_retailprice * l_quantity AS v
       |  FROM lineitem JOIN part ON l_partkey = p_partkey)
       |SELECT p_brand, ${sqlRev4Sum("v")} AS value
       |FROM valued
       |GROUP BY p_brand
       |HAVING ${sqlRev4Sum("v")} >
       |  (SELECT ${sqlRev4Sum("v")} FROM valued) * 0.02
       |ORDER BY value DESC, p_brand""".stripMargin

  /** Q12 shape — shipping-priority classes: per ship quarter of one
    * year, how many lines belong to critical-priority orders
    * (1-URGENT/2-HIGH) vs the rest. Conditional counts after the one
    * fact⋈fact join; the priority test is evaluated map-side. */
  def q118(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val high = $"o_orderpriority" === "1-URGENT" || $"o_orderpriority" === "2-HIGH"
    Tables.lineitem(s, d)
      .filter($"l_shipdate" >= ts("1997-01-01") && $"l_shipdate" < ts("1998-01-01"))
      .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
      .groupBy(quarter($"l_shipdate").cast("int").as("ship_quarter"))
      .agg(
        sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy($"ship_quarter")
  }

  val q118Sql: String =
    """SELECT CAST(quarter(l_shipdate) AS INT) AS ship_quarter,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |       THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |GROUP BY 1 ORDER BY ship_quarter""".stripMargin

  /** Q20 shape — part promotion: suppliers who moved more than 50
    * units of some PROMO-type part during 1997. The IN subquery is a
    * grouped threshold over (supplier, part) that reduces to a LEFT
    * SEMI join on the supplier key; nation resolves via broadcast. */
  def q119(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val promoKeys = broadcast(
      Tables.part(s, d).filter($"p_type" === "PROMO").select($"p_partkey"))
    val movers = Tables.lineitem(s, d)
      .filter($"l_shipdate" >= ts("1997-01-01") && $"l_shipdate" < ts("1998-01-01"))
      .join(promoKeys, $"l_partkey" === $"p_partkey")
      .groupBy($"l_suppkey", $"l_partkey")
      .agg(sum($"l_quantity").as("qty"))
      .filter($"qty" > 50.0)
      .select($"l_suppkey")
    Tables.supplier(s, d)
      .join(movers, $"s_suppkey" === $"l_suppkey", "left_semi")
      .join(broadcast(Tables.nation(s, d)), $"s_nationkey" === $"n_nationkey")
      .select($"s_name", $"n_name")
      .orderBy($"s_name")
  }

  val q119Sql: String =
    """SELECT s_name, n_name
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_type = 'PROMO'
      |    AND l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate < TIMESTAMP '1998-01-01'
      |  GROUP BY l_suppkey, l_partkey
      |  HAVING sum(l_quantity) > 50)
      |ORDER BY s_name""".stripMargin

  /** Q21 shape — suppliers who kept orders waiting: in multi-supplier
    * orders, count per supplier the orders where ONLY that supplier
    * shipped late (> 60 days after the order date). The correlated
    * EXISTS ("another supplier on the order") / NOT EXISTS ("no OTHER
    * late supplier") decorrelate to per-order counts over the
    * (order, supplier) line relation: n_supp ≥ 2 and n_late = 1 for a
    * late row is exactly "others exist, none of them late". One window
    * over the order key replaces a semi- PLUS an anti- self-join, each
    * of which re-derived the whole line relation (the three aliased
    * subplans don't canonicalize equal, so nothing was reused —
    * measured 3 lineitem scans / 3 join-agg stages in the old plan). */
  def q120(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val lines = Tables.lineitem(s, d)
      .join(Tables.orders(s, d).select($"o_orderkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .select($"l_orderkey", $"l_suppkey",
        when($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"), 1)
          .otherwise(0).as("late"))
      // One explicit exchange on the ORDER key serves BOTH the pair
      // aggregation (HashPartitioning(l_orderkey) satisfies
      // ClusteredDistribution(l_orderkey, l_suppkey)) and the window
      // below — without it the plan shuffled the full line relation
      // twice (once per key set). Map-side combine loss is nil here:
      // (order, supplier) pairs are nearly distinct already.
      .repartition($"l_orderkey")
      .groupBy($"l_orderkey", $"l_suppkey")
      .agg((max($"late") === 1).as("late"))
    val w = Window.partitionBy($"l_orderkey")
    lines
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("n_late", sum($"late".cast("int")).over(w))
      .filter($"late" && $"n_supp" >= 2 && $"n_late" === 1)
      .join(broadcast(Tables.supplier(s, d)), $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc, $"s_name")
  }

  val q120Sql: String =
    """WITH lines AS (
      |  SELECT l_orderkey, l_suppkey,
      |    max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
      |        THEN 1 ELSE 0 END) = 1 AS late
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1, 2)
      |SELECT s_name, count(*) AS numwait
      |FROM lines l1 JOIN supplier ON l1.l_suppkey = s_suppkey
      |WHERE l1.late
      |  AND EXISTS (SELECT 1 FROM lines l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lines l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name""".stripMargin

  /** Q22 shape — global sales opportunity: customers with an
    * above-average positive balance and no recent orders, grouped by
    * the 2-character "country code" tail of the customer name. Scalar
    * average → 1-row broadcast; NOT EXISTS → LEFT ANTI against the
    * recent-order keys. The comparison operand is a moneyAvg (grid-
    * rounded), so the filter is cross-engine deterministic. */
  def q121(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val avgBal = Tables.customer(s, d)
      .filter($"c_acctbal" > 0.0)
      .agg(moneyAvg($"c_acctbal").as("avg_bal"))
    val recent = Tables.orders(s, d)
      .filter($"o_orderdate" >= ts("1999-01-01"))
      .select($"o_custkey").distinct()
    Tables.customer(s, d)
      .crossJoin(broadcast(avgBal))
      .filter($"c_acctbal" > $"avg_bal")
      .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy(substring($"c_name", 17, 2).as("cntrycode"))
      .agg(count(lit(1)).as("numcust"), moneySum($"c_acctbal").as("totacctbal"))
      .orderBy($"cntrycode")
  }

  val q121Sql: String =
    s"""SELECT substr(c_name, 17, 2) AS cntrycode,
       |  count(*) AS numcust, ${sqlMoneySum("c_acctbal")} AS totacctbal
       |FROM customer
       |WHERE c_acctbal > (SELECT ${sqlMoneyAvg("c_acctbal")} FROM customer
       |                   WHERE c_acctbal > 0.0)
       |  AND NOT EXISTS (SELECT 1 FROM orders
       |                  WHERE o_custkey = c_custkey
       |                    AND o_orderdate >= TIMESTAMP '1999-01-01')
       |GROUP BY 1 ORDER BY cntrycode""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q116_volume_shipping", q116, Some(q116Sql)),
    QueryDef("q117_important_brands", q117, Some(q117Sql)),
    QueryDef("q118_priority_shipping", q118, Some(q118Sql)),
    QueryDef("q119_part_promotion", q119, Some(q119Sql)),
    QueryDef("q120_waiting_suppliers", q120, Some(q120Sql), bench = true),
    QueryDef("q121_global_opportunity", q121, Some(q121Sql)),
  )
}
