package graft.operators

import graft.{Fx, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Engine SQL surface: the same tables exposed as temp views and
  * queried through `spark.sql` — correlated subqueries, grouping sets,
  * cube. Oracle SQL is near-identical ANSI (the point: a reference
  * user can bring raw SQL to this engine unchanged).
  */
object SqlSurface {
  import Fx._

  private def withViews(s: SparkSession, d: String, names: String*): Unit =
    names.foreach(n => Tables.load(s, d, n).createOrReplaceTempView(n))

  /** Correlated scalar subquery: parts priced ≥ 1.04× their type's avg. */
  def q27(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "part")
    s.sql(
      s"""SELECT p_partkey, p_type, p_retailprice
         |FROM part p
         |WHERE p_retailprice >= 1.04 * (
         |  SELECT ${sqlR2("sum(p2.p_retailprice)")} / count(*)
         |  FROM part p2 WHERE p2.p_type = p.p_type)
         |ORDER BY p_partkey""".stripMargin)
  }

  val q27Sql: String =
    s"""SELECT p_partkey, p_type, p_retailprice
       |FROM part p
       |WHERE p_retailprice >= 1.04 * (
       |  SELECT ${sqlR2("sum(p2.p_retailprice)")} / count(*)
       |  FROM part p2 WHERE p2.p_type = p.p_type)
       |ORDER BY p_partkey""".stripMargin

  /** GROUPING SETS with grouping() disambiguation of the null rows. */
  def q28(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "orders")
    s.sql(
      s"""SELECT o_orderstatus, o_orderpriority,
         |  grouping(o_orderstatus) AS g_status, grouping(o_orderpriority) AS g_prio,
         |  count(*) AS n, ${sqlMoneySum("o_totalprice")} AS total
         |FROM orders
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         |ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
  }

  val q28Sql: String =
    s"""SELECT o_orderstatus, o_orderpriority,
       |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
       |  CAST(grouping(o_orderpriority) AS INT) AS g_prio,
       |  count(*) AS n, ${sqlMoneySum("o_totalprice")} AS total
       |FROM orders
       |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
       |ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** CUBE over region × order status. */
  def q29(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "orders", "customer", "nation", "region")
    s.sql(
      s"""SELECT r_name, o_orderstatus, count(*) AS n,
         |  ${sqlMoneySum("o_totalprice")} AS total
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY CUBE (r_name, o_orderstatus)
         |ORDER BY r_name NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin)
  }

  val q29Sql: String =
    s"""SELECT r_name, o_orderstatus, count(*) AS n,
       |  ${sqlMoneySum("o_totalprice")} AS total
       |FROM orders
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY CUBE (r_name, o_orderstatus)
       |ORDER BY r_name NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin

  /** TPC-H Q20-style nested IN + correlated scalar aggregate: suppliers
    * who shipped an above-threshold quantity (vs the part's own average)
    * of a large part. Deterministic across engines without rounding:
    * l_quantity is integer-valued, so sums/averages are exact doubles.
    * (Q20's partsupp leg is adapted to this schema's lineitem.) */
  private val q35Text: String =
    """SELECT s_suppkey, s_name, s_acctbal
      |FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT l.l_suppkey FROM lineitem l
      |  WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_size >= 40)
      |    AND l.l_quantity > (SELECT 1.9 * avg(l2.l_quantity) FROM lineitem l2
      |                        WHERE l2.l_partkey = l.l_partkey))
      |ORDER BY s_suppkey""".stripMargin

  def q35(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "supplier", "lineitem", "part")
    s.sql(q35Text)
  }

  /** TPC-H Q21-style EXISTS + NOT EXISTS on the same fact table:
    * per-supplier count of finished multi-supplier orders where this
    * supplier shipped LAST (another supplier's line exists, but none
    * shipped later). (Q21's receipt/commit dates are adapted to this
    * schema's l_shipdate.) */
  private val q36Text: String =
    """SELECT s_name, count(*) AS numwait
      |FROM supplier
      |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE o_orderstatus = 'F'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |              WHERE l3.l_orderkey = l1.l_orderkey
      |                AND l3.l_suppkey <> l1.l_suppkey
      |                AND l3.l_shipdate > l1.l_shipdate)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name""".stripMargin

  def q36(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "supplier", "lineitem", "orders", "nation")
    s.sql(q36Text)
  }

  /** TPC-H Q2-style min-cost supplier: correlated scalar MIN subquery
    * selecting the supplier(s) whose price equals the per-part minimum
    * (lineitem stands in for Q2's partsupp in this schema). Equality is
    * on stored doubles with no arithmetic — bit-identical both engines. */
  private val q37Text: String =
    """SELECT DISTINCT p.p_partkey, p.p_name, s.s_name, l.l_extendedprice AS min_price
      |FROM part p
      |JOIN lineitem l ON l.l_partkey = p.p_partkey
      |JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |WHERE p.p_size >= 48
      |  AND l.l_extendedprice = (SELECT min(l2.l_extendedprice) FROM lineitem l2
      |                           WHERE l2.l_partkey = p.p_partkey)
      |ORDER BY p.p_partkey, s.s_name""".stripMargin

  def q37(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "part", "lineitem", "supplier")
    s.sql(q37Text)
  }

  /** TPC-H Q13-style customer order-count distribution: LEFT OUTER join
    * with an extra join-side predicate, then a two-level aggregate. */
  private val q38Text: String =
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c.c_custkey AS ck, count(o.o_orderkey) AS c_count
      |  FROM customer c LEFT JOIN orders o
      |    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      |  GROUP BY c.c_custkey) t
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  def q38(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "customer", "orders")
    s.sql(q38Text)
  }

  /** TPC-H Q22-style: customers above the global average balance with no
    * urgent orders (NOT EXISTS anti-join), grouped by nation. The average
    * threshold is computed on the exact cents grid (integer sum, then one
    * division) so the comparison is deterministic across engines — a raw
    * avg(double) differs in final ulps between Spark and DuckDB and can
    * flip boundary rows. */
  private val q39Text: String =
    """WITH thresh AS (
      |  SELECT CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS DOUBLE)
      |           / count(*) AS avg_cents
      |  FROM customer WHERE c_acctbal > 0.0)
      |SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
      |  floor(sum(c_acctbal) * 100 + 0.5) / 100 AS totacctbal
      |FROM customer c, thresh
      |WHERE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) > avg_cents
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderpriority = '1-URGENT')
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  def q39(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "customer", "orders")
    s.sql(q39Text)
  }

  /** TPC-H Q15-style: suppliers achieving the maximum windowed revenue
    * (CTE + scalar MAX subquery over the same CTE). Revenue is summed
    * on the 4-decimal grid then rounded to cents BEFORE the equality
    * compare — equality on un-gridded double sums would be engine-
    * dependent in the last ulp. */
  private val q76Text: String =
    """WITH rev AS (
      |  SELECT l_suppkey AS supplier_no,
      |    floor(floor(sum(l_extendedprice * (1 - l_discount)) * 10000 + 0.5)
      |          / 10000 * 100 + 0.5) / 100 AS total_rev
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_rev
      |FROM supplier JOIN rev ON s_suppkey = supplier_no
      |WHERE total_rev = (SELECT max(total_rev) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  def q76(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "lineitem", "supplier")
    s.sql(q76Text)
  }

  /** TPC-H Q17-style: revenue from below-one-fifth-of-average-quantity
    * lines of one brand (correlated scalar AVG subquery per part).
    * Quantities are integer-valued so the correlated average is exact;
    * the money sum is grid-rounded before the /7 annualization. */
  private val q77Text: String =
    """SELECT floor(floor(sum(l_extendedprice) * 100 + 0.5) / 100
      |             / 7.0 * 100 + 0.5) / 100 AS avg_yearly
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#4' AND l_quantity < (
      |  SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
      |  WHERE l2.l_partkey = p_partkey)""".stripMargin

  def q77(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "lineitem", "part")
    s.sql(q77Text)
  }

  /** TPC-H Q18-style large-volume orders: IN over a grouped HAVING
    * subquery on the same fact, three-way join, top-20. */
  private val q78Text: String =
    """SELECT c_name, c_custkey, o_orderkey, o_totalprice,
      |  floor(sum(l_quantity) * 100 + 0.5) / 100 AS total_qty
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      |  HAVING sum(l_quantity) > 300)
      |GROUP BY c_name, c_custkey, o_orderkey, o_totalprice
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  def q78(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "customer", "orders", "lineitem")
    s.sql(q78Text)
  }

  /** TPC-H Q19-style disjunctive predicate (OR of AND-clauses spanning
    * both join sides) — the classic stress test for filter pushdown
    * and join-condition extraction; revenue on the 4-decimal grid. */
  private val q84Text: String =
    """SELECT CAST(count(*) AS BIGINT) AS n,
      |  floor(floor(sum(l_extendedprice * (1 - l_discount)) * 10000 + 0.5)
      |        / 10000 * 100 + 0.5) / 100 AS revenue
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity >= 10 AND l_quantity <= 30)
      |   OR (p_brand = 'Brand#19' AND p_size BETWEEN 10 AND 30
      |       AND l_quantity >= 20 AND l_quantity <= 40)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 20 AND 50
      |       AND l_quantity >= 25 AND l_quantity <= 50)""".stripMargin

  def q84(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "lineitem", "part")
    s.sql(q84Text)
  }

  /** TPC-H Q16-style supplier diversity: DISTINCT count per part group
    * with a NOT IN exclusion subquery. */
  private val q85Text: String =
    """SELECT p_brand, p_type, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_size >= 40
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type
      |ORDER BY supplier_cnt DESC, p_brand, p_type LIMIT 20""".stripMargin

  def q85(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "lineitem", "part", "supplier")
    s.sql(q85Text)
  }

  /** INTERSECT / EXCEPT set operators (distinct semantics both
    * engines), counted per bucket. */
  private val q86Text: String =
    """SELECT 'both' AS bucket, CAST(count(*) AS BIGINT) AS n FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |  INTERSECT
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') t
      |UNION ALL
      |SELECT 'urgent_only', CAST(count(*) AS BIGINT) FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |  EXCEPT
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') t
      |ORDER BY bucket""".stripMargin

  def q86(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "orders")
    s.sql(q86Text)
  }

  /** q130 — LATERAL correlated subquery (SQL:2016 / Spark 3.2+): for
    * each nation, its top-2 customers by balance, expressed as a
    * per-row subquery in FROM. Catalyst decorrelates this to a
    * ranked join (no nested-loop per nation); the same text runs
    * unchanged in DuckDB — exactly the portability the SQL surface is
    * for. */
  val q130Text: String =
    """SELECT n_name, c.c_name, c.c_acctbal
      |FROM nation, LATERAL (
      |  SELECT c_name, c_acctbal FROM customer
      |  WHERE c_nationkey = n_nationkey
      |  ORDER BY c_acctbal DESC, c_name LIMIT 2) c
      |ORDER BY n_name, c_acctbal DESC, c_name""".stripMargin

  def q130(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "nation", "customer")
    s.sql(q130Text)
  }

  /** q135 — recursive CTE (`WITH RECURSIVE`, Spark 4): per-customer
    * order "streaks", maximal chains of consecutive orders ≤ 60 days
    * apart. The successor relation is a window `lead` with a unique
    * (date, orderkey) tie-break, so every order has at most ONE
    * successor — the chain graph is a forest of paths and UNION ALL
    * recursion enumerates each path suffix exactly once (Spark's
    * recursive CTEs do not support UNION-distinct, so cyclic closures
    * are out; a functional-dependency-shaped recursion like this is
    * the terminating form). Each iteration joins only the live chain
    * frontier to the successor table on a key — chains die out
    * geometrically, and depth is bounded by max orders per customer
    * (≪ the 100-level default limit). */
  private val streakGap = 60

  def q135(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "orders")
    s.sql(
      s"""WITH RECURSIVE succ AS (
         |  SELECT o_orderkey AS okey, o_custkey AS ckey, o_totalprice AS price,
         |    lead(o_orderkey) OVER w AS next_okey,
         |    datediff(lead(CAST(o_orderdate AS DATE)) OVER w, CAST(o_orderdate AS DATE)) AS next_gap,
         |    datediff(CAST(o_orderdate AS DATE), lag(CAST(o_orderdate AS DATE)) OVER w) AS prev_gap
         |  FROM orders
         |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
         |chain(head, okey, ckey, pos, price) AS (
         |  SELECT okey, okey, ckey, 1, price FROM succ
         |  WHERE prev_gap IS NULL OR prev_gap > $streakGap
         |  UNION ALL
         |  SELECT c.head, n.okey, c.ckey, c.pos + 1, n.price
         |  FROM chain c JOIN succ cur ON c.okey = cur.okey
         |  JOIN succ n ON cur.next_okey = n.okey
         |  WHERE cur.next_gap <= $streakGap)
         |SELECT head AS streak_head, ckey AS o_custkey,
         |  CAST(max(pos) AS BIGINT) AS streak_len,
         |  ${sqlMoneySum("price")} AS streak_spend
         |FROM chain GROUP BY head, ckey
         |HAVING max(pos) >= 2
         |ORDER BY streak_head""".stripMargin)
  }

  /** Identical shape in DuckDB; only the day-difference spelling
    * differs (`date_diff('day', a, b)` vs Spark's `datediff(b, a)`). */
  val q135Sql: String =
    s"""WITH RECURSIVE succ AS (
       |  SELECT o_orderkey AS okey, o_custkey AS ckey, o_totalprice AS price,
       |    lead(o_orderkey) OVER w AS next_okey,
       |    date_diff('day', CAST(o_orderdate AS DATE), lead(CAST(o_orderdate AS DATE)) OVER w) AS next_gap,
       |    date_diff('day', lag(CAST(o_orderdate AS DATE)) OVER w, CAST(o_orderdate AS DATE)) AS prev_gap
       |  FROM orders
       |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
       |chain(head, okey, ckey, pos, price) AS (
       |  SELECT okey, okey, ckey, 1, price FROM succ
       |  WHERE prev_gap IS NULL OR prev_gap > $streakGap
       |  UNION ALL
       |  SELECT c.head, n.okey, c.ckey, c.pos + 1, n.price
       |  FROM chain c JOIN succ cur ON c.okey = cur.okey
       |  JOIN succ n ON cur.next_okey = n.okey
       |  WHERE cur.next_gap <= $streakGap)
       |SELECT head AS streak_head, ckey AS o_custkey,
       |  CAST(max(pos) AS BIGINT) AS streak_len,
       |  ${sqlMoneySum("price")} AS streak_spend
       |FROM chain GROUP BY head, ckey
       |HAVING max(pos) >= 2
       |ORDER BY streak_head""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q27_correlated_subquery", q27, Some(q27Sql)),
    QueryDef("q28_grouping_sets", q28, Some(q28Sql)),
    QueryDef("q29_cube", q29, Some(q29Sql)),
    QueryDef("q35_nested_in_scalar", q35, Some(q35Text)),
    QueryDef("q36_exists_not_exists", q36, Some(q36Text)),
    QueryDef("q37_min_cost_supplier", q37, Some(q37Text)),
    QueryDef("q38_custdist", q38, Some(q38Text)),
    QueryDef("q39_above_avg_no_urgent", q39, Some(q39Text)),
    QueryDef("q76_top_supplier_revenue", q76, Some(q76Text)),
    QueryDef("q77_small_qty_revenue", q77, Some(q77Text)),
    QueryDef("q78_large_volume_orders", q78, Some(q78Text), bench = true),
    QueryDef("q84_disjunctive_pred", q84, Some(q84Text)),
    QueryDef("q85_supplier_diversity", q85, Some(q85Text)),
    QueryDef("q86_intersect_except", q86, Some(q86Text)),
    QueryDef("q130_lateral_topn", q130, Some(q130Text)),
    QueryDef("q135_order_streaks_recursive", q135, Some(q135Sql)),
  )
}
