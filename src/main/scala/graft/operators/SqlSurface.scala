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

  val all: Seq[QueryDef] = Seq(
    QueryDef("q27_correlated_subquery", q27, Some(q27Sql)),
    QueryDef("q28_grouping_sets", q28, Some(q28Sql)),
    QueryDef("q29_cube", q29, Some(q29Sql)),
    QueryDef("q35_nested_in_scalar", q35, Some(q35Text)),
    QueryDef("q36_exists_not_exists", q36, Some(q36Text)),
  )
}
