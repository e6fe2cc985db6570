package graft.operators

import graft.{Fx, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Classic TPC-H query shapes (Q3/Q5/Q8/Q9/Q10/Q14 analogues) adapted
  * to the testdata schema (no l_shipmode/commitdate, no partsupp —
  * supply cost is modeled as 0.5 × retail, exact in binary so the
  * grid-determinism rules of [[graft.Fx]] still hold).
  *
  * Scale design: every dimension (customer-filtered segment, supplier,
  * nation, region, part) is explicitly `broadcast()`; only fact⋈fact
  * (lineitem⋈orders) shuffles, on the join key both sides already
  * produce. Top-k results compile to TakeOrderedAndProject, and date/
  * segment filters sit directly on the scan so parquet row-group
  * pruning applies (PushedFilters — pinned for siblings in PlanSpec).
  */
object TpchClassics {
  import Fx._

  private def ts(s: String) = to_timestamp(lit(s))

  /** Q3 shape — shipping priority: top-10 unshipped-revenue orders in
    * a market segment at a cutoff date. */
  def q64(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cutoff = "1998-06-01"
    val c = Tables.customer(s, d).filter($"c_mktsegment" === "BUILDING")
    val o = Tables.orders(s, d).filter($"o_orderdate" < ts(cutoff))
    val l = Tables.lineitem(s, d).filter($"l_shipdate" > ts(cutoff))
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(c), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate")
      .agg(rev4Sum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      .orderBy($"revenue".desc, $"o_orderdate", $"l_orderkey")
      .limit(10)
  }

  val q64Sql: String =
    s"""SELECT l_orderkey, o_orderdate,
       |${sqlRev4Sum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-06-01'
       |  AND l_shipdate > TIMESTAMP '1998-06-01'
       |GROUP BY l_orderkey, o_orderdate
       |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin

  /** Q5 shape — local supplier volume: revenue from orders where the
    * customer and the supplier share a nation, per nation of one
    * region, one order-year. */
  def q65(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, d)
      .filter($"o_orderdate" >= ts("1997-01-01") && $"o_orderdate" < ts("1998-01-01"))
    val c = Tables.customer(s, d)
    val sup = Tables.supplier(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d).filter($"r_name" === "ASIA")
    Tables.lineitem(s, d)
      .join(o, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(c),
        $"o_custkey" === $"c_custkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(rev4Sum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  val q65Sql: String =
    s"""SELECT n_name,
       |${sqlRev4Sum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1997-01-01'
       |  AND o_orderdate < TIMESTAMP '1998-01-01'
       |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** Q8 shape — market share: one nation's share of PROMO-part revenue
    * sold into one region, per order year. Numerator and denominator
    * are grid-rounded BEFORE the division (see Fx scaladoc), so the
    * quotient is identical IEEE arithmetic on identical inputs. */
  def q66(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val p = Tables.part(s, d).filter($"p_type" === "PROMO")
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d).filter($"r_name" === "AMERICA")
    val supNat = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d).select($"n_nationkey".as("sn_key"), $"n_name".as("s_nation"))),
        $"s_nationkey" === $"sn_key")
    val vol = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(p), $"l_partkey" === $"p_partkey")
      .join(broadcast(c), $"o_custkey" === $"c_custkey")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .join(broadcast(supNat.select($"s_suppkey", $"s_nation")), $"l_suppkey" === $"s_suppkey")
      .select(year($"o_orderdate").as("o_year"),
        ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("vol"),
        $"s_nation")
    vol.groupBy($"o_year")
      .agg(
        r4(sum(when($"s_nation" === "NATION_5", $"vol").otherwise(lit(0.0)))).as("nation_vol"),
        r4(sum($"vol")).as("total_vol"))
      .select($"o_year", $"nation_vol", $"total_vol",
        r6($"nation_vol" / $"total_vol").as("mkt_share"))
      .orderBy($"o_year")
  }

  val q66Sql: String =
    s"""SELECT o_year, nation_vol, total_vol,
       |${sqlR6("nation_vol / total_vol")} AS mkt_share FROM (
       |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       |    ${sqlR4("sum(CASE WHEN sn.n_name = 'NATION_5' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END)")} AS nation_vol,
       |    ${sqlR4("sum(l_extendedprice * (1.0 - l_discount))")} AS total_vol
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN part ON l_partkey = p_partkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation cn ON c_nationkey = cn.n_nationkey
       |  JOIN region ON cn.n_regionkey = r_regionkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation sn ON s_nationkey = sn.n_nationkey
       |  WHERE p_type = 'PROMO' AND r_name = 'AMERICA'
       |  GROUP BY 1) t
       |ORDER BY o_year""".stripMargin

  /** Q9 shape — product-type profit by supplier nation and year.
    * Supply cost modeled as 0.5 × p_retailprice × quantity: the 0.5
    * multiply is exact (power of two), keeping line profit on the
    * 1e-4 grid that rev4Sum's determinism argument needs. */
  def q67(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val p = Tables.part(s, d).filter($"p_name".startsWith("red"))
    val n = Tables.nation(s, d)
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(p), $"l_partkey" === $"p_partkey")
      .join(broadcast(Tables.supplier(s, d)), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name", year($"o_orderdate").cast("int").as("o_year"))
      .agg(rev4Sum(
        $"l_extendedprice" * (lit(1.0) - $"l_discount") -
          lit(0.5) * $"p_retailprice" * $"l_quantity").as("profit"))
      .orderBy($"n_name", $"o_year".desc)
  }

  val q67Sql: String =
    s"""SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
       |${sqlRev4Sum("l_extendedprice * (1.0 - l_discount) - 0.5 * p_retailprice * l_quantity")} AS profit
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN part ON l_partkey = p_partkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |WHERE p_name LIKE 'red%'
       |GROUP BY n_name, 2 ORDER BY n_name, o_year DESC""".stripMargin

  /** Q10 shape — returned-item reporting: top-20 customers by revenue
    * lost to returns in one quarter. */
  def q68(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, d)
      .filter($"o_orderdate" >= ts("1997-10-01") && $"o_orderdate" < ts("1998-01-01"))
    val l = Tables.lineitem(s, d).filter($"l_returnflag" === "R")
    val n = Tables.nation(s, d)
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.customer(s, d)), $"o_custkey" === $"c_custkey")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_custkey", $"c_name", $"n_name", $"c_acctbal")
      .agg(rev4Sum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  val q68Sql: String =
    s"""SELECT c_custkey, c_name, n_name, c_acctbal,
       |${sqlRev4Sum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R'
       |  AND o_orderdate >= TIMESTAMP '1997-10-01'
       |  AND o_orderdate < TIMESTAMP '1998-01-01'
       |GROUP BY c_custkey, c_name, n_name, c_acctbal
       |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** Q14 shape — promo revenue share per ship month: conditional
    * aggregate ratio, both sides grid-rounded before the divide. */
  def q69(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val p = Tables.part(s, d)
    Tables.lineitem(s, d)
      .filter($"l_shipdate" >= ts("1997-01-01") && $"l_shipdate" < ts("1998-01-01"))
      .join(broadcast(p.select($"p_partkey", $"p_type")), $"l_partkey" === $"p_partkey")
      .groupBy(date_format($"l_shipdate", "yyyy-MM").as("ship_month"))
      .agg(
        r4(sum(when($"p_type" === "PROMO",
          $"l_extendedprice" * (lit(1.0) - $"l_discount")).otherwise(lit(0.0)))).as("promo_rev"),
        r4(sum($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("total_rev"))
      .select($"ship_month", $"promo_rev", $"total_rev",
        r6(lit(100.0) * $"promo_rev" / $"total_rev").as("promo_pct"))
      .orderBy($"ship_month")
  }

  val q69Sql: String =
    s"""SELECT ship_month, promo_rev, total_rev,
       |${sqlR6("100.0 * promo_rev / total_rev")} AS promo_pct FROM (
       |  SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
       |    ${sqlR4("sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END)")} AS promo_rev,
       |    ${sqlR4("sum(l_extendedprice * (1.0 - l_discount))")} AS total_rev
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
       |    AND l_shipdate < TIMESTAMP '1998-01-01'
       |  GROUP BY 1) t
       |ORDER BY ship_month""".stripMargin

  /** Q4 shape — order-priority checking: orders of one quarter with at
    * least one late lineitem (shipped > 60 days after the order date —
    * this schema has no commit/receipt dates), counted per priority.
    * The EXISTS is a LEFT SEMI join: lineitem is ~4× orders, so the
    * semi join keeps the probe side small and never duplicates an
    * order no matter how many of its lines are late. Both join keys
    * hash-partition on l_orderkey/o_orderkey — one shuffle each side,
    * no distinct needed (semi join dedups by construction). */
  def q138(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, d)
      .filter($"o_orderdate" >= ts("1997-01-01") && $"o_orderdate" < ts("1997-04-01"))
    val l = Tables.lineitem(s, d).select($"l_orderkey", $"l_shipdate")
    o.join(l, $"o_orderkey" === $"l_orderkey" &&
        $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"), "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  val q138Sql: String =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-04-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Q6 shape — forecasting revenue change: a pure scan-side filter
    * aggregate, the canonical pushdown benchmark (every predicate
    * reaches the parquet scan; no join, no shuffle beyond the final
    * 1-row agg). Discount bounds compare stored doubles (no
    * arithmetic); price×discount lands on the 4-decimal grid. */
  def q139(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .filter($"l_shipdate" >= ts("1997-01-01") && $"l_shipdate" < ts("1998-01-01") &&
        $"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24.0)
      .agg(rev4Sum($"l_extendedprice" * $"l_discount").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val q139Sql: String =
    s"""SELECT ${sqlRev4Sum("l_extendedprice * l_discount")} AS revenue,
       |  CAST(count(*) AS BIGINT) AS n_items
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
       |  AND l_shipdate < TIMESTAMP '1998-01-01'
       |  AND l_discount >= 0.05 AND l_discount <= 0.07
       |  AND l_quantity < 24.0""".stripMargin

  /** q146 — z-order locality audit: Morton-interleave
    * (l_partkey, l_suppkey) via [[graft.functions.ZOrder.zValue]] and
    * group rows into coarse z-cells. Each cell bounds BOTH keys at
    * once (the min/max spans in the output are the proof) — which is
    * exactly why z-ordered files let parquet min/max stats prune scans
    * for predicates on either column. The z-value is pure codegen'd
    * bit arithmetic, mirrored term-for-term in the DuckDB oracle. */
  def q146(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val zv = graft.functions.ZOrder.zValue(Seq($"l_partkey", $"l_suppkey"), 16)
    Tables.lineitem(s, d)
      .select($"l_partkey", $"l_suppkey", shiftright(zv, 14).as("z_cell"))
      .groupBy($"z_cell")
      .agg(count(lit(1)).as("n_rows"),
        min($"l_partkey").as("min_part"), max($"l_partkey").as("max_part"),
        min($"l_suppkey").as("min_supp"), max($"l_suppkey").as("max_supp"))
      .orderBy($"n_rows".desc, $"z_cell")
      .limit(20)
  }

  val q146Sql: String = {
    val z = graft.functions.ZOrder.zValueSql(Seq("l_partkey", "l_suppkey"), 16)
    s"""SELECT $z >> 14 AS z_cell, count(*) AS n_rows,
       |  min(l_partkey) AS min_part, max(l_partkey) AS max_part,
       |  min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
       |FROM lineitem
       |GROUP BY z_cell
       |ORDER BY n_rows DESC, z_cell LIMIT 20""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("q64_shipping_priority", q64, Some(q64Sql), bench = true),
    QueryDef("q65_local_supplier_volume", q65, Some(q65Sql), bench = true),
    QueryDef("q66_market_share", q66, Some(q66Sql)),
    QueryDef("q67_product_profit", q67, Some(q67Sql)),
    QueryDef("q68_returned_items", q68, Some(q68Sql)),
    QueryDef("q69_promo_revenue", q69, Some(q69Sql)),
    QueryDef("q138_order_priority_check", q138, Some(q138Sql)),
    QueryDef("q139_forecast_revenue", q139, Some(q139Sql), bench = true),
    QueryDef("q146_zorder_cells", q146, Some(q146Sql)),
  )
}
