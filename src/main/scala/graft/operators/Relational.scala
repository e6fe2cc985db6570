package graft.operators

import graft.{Fx, QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.GraftFunctions.md5_fast

/** Core relational operator coverage (SURVEY.md §2.3–§2.9 plus the §7
  * engine-capability queries): scans with pushdown, projections,
  * filters, hash aggregation, broadcast + shuffle joins, semi/anti
  * joins, windows, rollup, distinct aggregation, top-k, union.
  *
  * Scale design notes (100 TB target):
  *  - filters/projections are expressed declaratively so Catalyst
  *    pushes them into the parquet scan (verified via explain:
  *    PushedFilters / ReadSchema);
  *  - dimension joins (region/nation/part/supplier) are explicitly
  *    `broadcast()` — at SF100k the dim side stays tiny while the fact
  *    side never shuffles for the join;
  *  - aggregations use map-side partial aggregation for free
  *    (HashAggregate partial/final) because they're plain `groupBy`;
  *  - top-k is `orderBy().limit(k)` which Spark executes as
  *    TakeOrderedAndProject (per-partition heap + driver merge of k
  *    rows, no full sort/shuffle).
  */
object Relational {
  import Fx._

  private def ts(s: String): Column = to_timestamp(lit(s))

  /** TPC-H Q1 flavor: full-scan hash aggregation with partial aggs. */
  def q01(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .filter($"l_shipdate" <= ts("2000-06-30"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        moneySum($"l_quantity").as("sum_qty"),
        moneySum($"l_extendedprice").as("sum_base_price"),
        rev4Sum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
        rev6Sum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")).as("sum_charge"),
        moneyAvg($"l_quantity").as("avg_qty"),
        moneyAvg($"l_extendedprice").as("avg_price"),
        moneyAvg($"l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q01Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |${sqlMoneySum("l_quantity")} AS sum_qty,
       |${sqlMoneySum("l_extendedprice")} AS sum_base_price,
       |${sqlRev4Sum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
       |${sqlRev6Sum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
       |${sqlMoneyAvg("l_quantity")} AS avg_qty,
       |${sqlMoneyAvg("l_extendedprice")} AS avg_price,
       |${sqlMoneyAvg("l_discount")} AS avg_disc,
       |count(*) AS count_order
       |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-06-30'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Projection + conjunctive filter, pushed to the parquet scan. */
  def q02(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .filter($"l_shipdate" >= ts("1996-01-01") && $"l_shipdate" < ts("1996-07-01") &&
        $"l_discount" >= 0.05 && $"l_quantity" < 10.0)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice", $"l_discount")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  val q02Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-07-01'
      |  AND l_discount >= 0.05 AND l_quantity < 10.0
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** TPC-H Q3 flavor: fact-fact shuffle join + agg + continuous top-k. */
  def q03(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, d).filter($"o_orderdate" < ts("1998-01-01"))
    val l = Tables.lineitem(s, d).filter($"l_shipdate" > ts("1998-01-01"))
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(rev4Sum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  val q03Sql: String =
    s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
       |${sqlRev4Sum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |WHERE o_orderdate < TIMESTAMP '1998-01-01' AND l_shipdate > TIMESTAMP '1998-01-01'
       |GROUP BY l_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** Broadcast dim join: lineitem ⋈ part, agg by brand. */
  def q04(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand")
      .agg(
        count(lit(1)).as("n_lines"),
        rev4Sum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
        moneyAvg($"l_quantity").as("avg_qty"))
      .orderBy($"p_brand")
  }

  val q04Sql: String =
    s"""SELECT p_brand, count(*) AS n_lines,
       |${sqlRev4Sum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |${sqlMoneyAvg("l_quantity")} AS avg_qty
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** TPC-H Q5 flavor: snowflake multi-join, dims broadcast. */
  def q05(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val l = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
      .filter($"o_orderdate" >= ts("1996-01-01") && $"o_orderdate" < ts("1998-01-01"))
    val sup = Tables.supplier(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(
        rev4Sum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy($"r_name", $"n_name")
  }

  val q05Sql: String =
    s"""SELECT r_name, n_name,
       |${sqlRev4Sum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |count(*) AS n_lines
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
       |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  /** Top-k on a raw column (TakeOrderedAndProject; no full shuffle). */
  def q06(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderdate")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(15)
  }

  val q06Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""".stripMargin

  /** Window lag: per-customer order price delta (SURVEY §2.9 ext). */
  def q07(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    Tables.orders(s, d)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice")
      .withColumn("prev_price", lag($"o_totalprice", 1).over(w))
      .withColumn("price_delta", $"o_totalprice" - $"prev_price")
      .orderBy($"o_custkey", $"o_orderdate", $"o_orderkey")
  }

  val q07Sql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
      |lag(o_totalprice, 1) OVER w AS prev_price,
      |o_totalprice - (lag(o_totalprice, 1) OVER w) AS price_delta
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  /** Window top-n per group: 3 priciest parts per brand. The heavy
    * reduction runs through the native bounded-heap TopKPerGroup (the
    * q124 shape) — ~25 brands over a `row_number` window would funnel
    * the whole part table through 25 tasks at scale; the rank window
    * orders only the ≤ 3 survivors per brand. */
  def q08(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = Tables.part(s, d)
      .select($"p_brand", $"p_partkey", $"p_name", $"p_retailprice")
    val top = graft.plans.TopK.perGroup(base, 3, Seq("p_brand"),
      Seq(graft.plans.TopK.desc("p_retailprice"), graft.plans.TopK.asc("p_partkey")))
    top
      .withColumn("rn", row_number().over(
        Window.partitionBy($"p_brand").orderBy($"p_retailprice".desc, $"p_partkey")))
      .orderBy($"p_brand", $"rn")
  }

  val q08Sql: String =
    """SELECT * FROM (
      |  SELECT p_brand, p_partkey, p_name, p_retailprice,
      |  row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
      |  FROM part) t
      |WHERE rn <= 3 ORDER BY p_brand, rn""".stripMargin

  /** Distinct aggregation (expand-based in Spark). */
  def q09(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_partkey").as("n_parts"),
        countDistinct($"l_suppkey").as("n_supps"),
        count(lit(1)).as("n_lines"))
      .orderBy($"l_returnflag")
  }

  val q09Sql: String =
    """SELECT l_returnflag,
      |count(DISTINCT l_partkey) AS n_parts,
      |count(DISTINCT l_suppkey) AS n_supps,
      |count(*) AS n_lines
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Anti join: customers with no HIGH-VALUE order (NOT EXISTS over a
    * filtered subquery). The predicate is keyed to o_totalprice >
    * 350000 rather than bare existence because at sf0.01 EVERY
    * customer has an order — the original form passed its oracle on
    * empty-vs-empty, verifying nothing (the r12 verdict's one vacuous
    * gate). This shape strands 8 customers at sf0.001 and 68 at
    * sf0.01, so the LeftAnti semantics are witnessed by real rows
    * while the plan stays the same anti-join with the filter pushed
    * to the build side. */
  def q10(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val big = Tables.orders(s, d).filter($"o_totalprice" > 350000.0)
    Tables.customer(s, d)
      .join(big, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  val q10Sql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_totalprice > 350000)
      |ORDER BY c_custkey""".stripMargin

  /** Semi join: customers with ≥1 urgent order (EXISTS). */
  def q11(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val urgent = Tables.orders(s, d).filter($"o_orderpriority" === "1-URGENT")
    Tables.customer(s, d)
      .join(urgent, $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name", $"c_acctbal")
      .orderBy($"c_custkey")
  }

  val q11Sql: String =
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  /** Union-distinct of two key sets (SURVEY §2.6 U1/U2). */
  def q12(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val hi = Tables.orders(s, d).filter($"o_totalprice" > 400000.0).select($"o_custkey")
    val ur = Tables.orders(s, d).filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
    hi.union(ur).distinct().orderBy($"o_custkey")
  }

  val q12Sql: String =
    """SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0
      |UNION
      |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |ORDER BY o_custkey""".stripMargin

  /** Group + having over a broadcast-joined dim. */
  def q13(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_customers"), moneySum($"c_acctbal").as("total_bal"))
      .filter($"n_customers" >= 5)
      .orderBy($"n_name")
  }

  val q13Sql: String =
    s"""SELECT n_name, count(*) AS n_customers, ${sqlMoneySum("c_acctbal")} AS total_bal
       |FROM customer JOIN nation ON c_nationkey = n_nationkey
       |GROUP BY n_name HAVING count(*) >= 5 ORDER BY n_name""".stripMargin

  /** Conditional aggregation (TPC-H Q14 flavor: promo revenue share). */
  def q14(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rev = $"l_extendedprice" * (lit(1.0) - $"l_discount")
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), $"l_partkey" === $"p_partkey")
      .groupBy($"p_type")
      .agg(
        rev4Sum(rev).as("revenue"),
        rev4Sum(when($"l_returnflag" === "R", rev).otherwise(lit(0.0))).as("returned_revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy($"p_type")
  }

  val q14Sql: String =
    s"""SELECT p_type,
       |${sqlRev4Sum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |${sqlRev4Sum("CASE WHEN l_returnflag = 'R' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")} AS returned_revenue,
       |count(*) AS n_lines
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY p_type ORDER BY p_type""".stripMargin

  /** Rollup (grouping sets) over region/nation customer counts. */
  def q15(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
      .rollup($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_customers"), moneySum($"c_acctbal").as("total_bal"))
      .orderBy($"r_name".asc_nulls_first, $"n_name".asc_nulls_first)
  }

  val q15Sql: String =
    s"""SELECT r_name, n_name, count(*) AS n_customers, ${sqlMoneySum("c_acctbal")} AS total_bal
       |FROM customer
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY ROLLUP (r_name, n_name)
       |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin

  /** Time-bucketed aggregation over the events stream table.
    * (DuckDB reads ts as ns; truncate to hour on both sides.) */
  def q16(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(count(lit(1)).as("n_events"), moneySum($"value").as("total_value"))
      .orderBy($"hour", $"event_type")
  }

  val q16Sql: String =
    s"""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
       |count(*) AS n_events, ${sqlMoneySum("value")} AS total_value
       |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  /** Window avg + filter: parts priced above their brand average.
    * brand_avg is grid-exact-sum / count (see Fx.moneyAvg) so the
    * filter boundary and output round identically in both engines.
    * The per-brand average is a GROUP AGGREGATE broadcast back onto
    * the rows, not an unordered window — the window form shuffles the
    * whole table into ~25 brand partitions (one task each at scale)
    * where the aggregate runs map-side partial and the join-back is a
    * ~25-row broadcast. The window-form oracle is unchanged: both
    * compute the identical sum/count per brand. */
  def q17(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val p = Tables.part(s, d)
      .select($"p_partkey", $"p_brand", $"p_retailprice")
    val avgs = p.groupBy($"p_brand")
      .agg((r2(sum($"p_retailprice")) / count(lit(1))).as("brand_avg"))
    p.join(broadcast(avgs), "p_brand")
      .filter($"p_retailprice" > $"brand_avg")
      .select($"p_partkey", $"p_brand", $"p_retailprice", r4($"brand_avg").as("brand_avg"))
      .orderBy($"p_partkey")
  }

  val q17Sql: String =
    s"""SELECT p_partkey, p_brand, p_retailprice, ${sqlR4("brand_avg")} AS brand_avg
       |FROM (
       |  SELECT p_partkey, p_brand, p_retailprice,
       |  ${sqlR2("sum(p_retailprice) OVER (PARTITION BY p_brand)")} / (count(*) OVER (PARTITION BY p_brand)) AS brand_avg
       |  FROM part) t
       |WHERE p_retailprice > brand_avg ORDER BY p_partkey""".stripMargin

  /** Date-part extraction + agg: orders by year and status. */
  def q18(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .groupBy(year($"o_orderdate").as("order_year"), $"o_orderstatus")
      .agg(
        count(lit(1)).as("n_orders"),
        moneySum($"o_totalprice").as("total_price"),
        r2(max($"o_totalprice")).as("max_price"),
        r2(min($"o_totalprice")).as("min_price"))
      .orderBy($"order_year", $"o_orderstatus")
  }

  val q18Sql: String =
    s"""SELECT year(o_orderdate) AS order_year, o_orderstatus,
       |count(*) AS n_orders,
       |${sqlMoneySum("o_totalprice")} AS total_price,
       |${sqlR2("max(o_totalprice)")} AS max_price,
       |${sqlR2("min(o_totalprice)")} AS min_price
       |FROM orders GROUP BY 1, 2 ORDER BY order_year, o_orderstatus""".stripMargin

  /** Regex field extraction from a JSON-ish string column (events.props
    * is `{"k": 87}`; extraction via regex keeps the oracle free of the
    * DuckDB JSON extension, which may not load offline). */
  def q19(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .withColumn("k", regexp_extract($"props", "\"k\":\\s*(\\d+)", 1).cast("int"))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        r4(avg($"k")).as("avg_k"),
        max($"k").as("max_k"),
        min($"k").as("min_k"))
      .orderBy($"event_type")
  }

  val q19Sql: String =
    s"""SELECT event_type, count(*) AS n_events,
       |${sqlR4("avg(k)")} AS avg_k, max(k) AS max_k, min(k) AS min_k
       |FROM (SELECT event_type,
       |  CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INT) AS k
       |  FROM events) t
       |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Projection trio (P1/P2/P3): explicit list, exclusion, drop. */
  def q24(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val notFeatures = Seq("c_acctbal") // exclusion list (P2)
    Tables.customer(s, d)
      .select($"c_custkey", $"c_name", $"c_nationkey", $"c_acctbal", $"c_mktsegment") // P1
      .drop(notFeatures: _*)                                                          // P2
      .drop("c_mktsegment")                                                           // P3
      .orderBy($"c_custkey")
  }

  val q24Sql: String =
    """SELECT c_custkey, c_name, c_nationkey FROM customer ORDER BY c_custkey""".stripMargin

  /** A2: avg + stddev aggregates (CV-fold stats shape). stddev is not
    * grid-recoverable; r4 on a continuous value is boundary-safe in
    * practice (distance to a rounding midpoint ≫ ulp noise). */
  def q25(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .groupBy($"o_orderstatus")
      .agg(
        count(lit(1)).as("n"),
        moneyAvg($"o_totalprice").as("avg_price"),
        r4(stddev_samp($"o_totalprice")).as("stddev_price"))
      .orderBy($"o_orderstatus")
  }

  val q25Sql: String =
    s"""SELECT o_orderstatus, count(*) AS n,
       |${sqlMoneyAvg("o_totalprice")} AS avg_price,
       |${sqlR4("stddev_samp(o_totalprice)")} AS stddev_price
       |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** O4: deterministic pseudo-random sample — order by md5(key). Spark
    * rand(seed) and DuckDB random() are different RNGs, so seeded
    * hashing is the cross-engine (and cluster-stable) sampling form. */
  def q26(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice",
        md5_fast(concat($"o_orderkey".cast("string"), lit("#sample"))).as("rk"))
      .orderBy($"rk")
      .limit(20)
  }

  val q26Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice,
      |md5(concat(CAST(o_orderkey AS VARCHAR), '#sample')) AS rk
      |FROM orders ORDER BY rk LIMIT 20""".stripMargin

  /** Percentiles (exact interpolated, ANSI percentile_cont semantics
    * in both engines). */
  def q31(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .groupBy($"o_orderstatus")
      .agg(
        count(lit(1)).as("n"),
        r4(expr("percentile(o_totalprice, 0.5)")).as("p50"),
        r4(expr("percentile(o_totalprice, 0.9)")).as("p90"))
      .orderBy($"o_orderstatus")
  }

  val q31Sql: String =
    s"""SELECT o_orderstatus, count(*) AS n,
       |${sqlR4("quantile_cont(o_totalprice, 0.5)")} AS p50,
       |${sqlR4("quantile_cont(o_totalprice, 0.9)")} AS p90
       |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** ntile + cume_dist window ranking, re-expressed on the two-phase
    * rank operator: 3 order statuses over a partitioned window would
    * funnel the whole orders table through 3 tasks at scale, so the
    * within-status rank rides [[Ranking.groupRanks]] and both window
    * functions become exact arithmetic on (rank, n) — the tie-break
    * by o_orderkey makes every rank distinct, so ntile's standard
    * bucket rule (first n%4 buckets take one extra row) is integer
    * `div`/`%`, and cume_dist with no peers is rank/n (one IEEE
    * double division, identical in DuckDB). The window-form oracle is
    * unchanged and checks the arithmetic restatement row for row. */
  def q32(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, d)
      .select($"o_orderstatus", $"o_orderkey", $"o_totalprice")
    val ranked = Ranking.groupRanks(o, Seq("o_orderstatus"), 8,
      $"o_totalprice".asc, $"o_orderkey".asc)
    val ns = o.groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
      .withColumnRenamed("o_orderstatus", "__ns")
    ranked.join(broadcast(ns), $"o_orderstatus" <=> $"__ns").drop("__ns")
      .withColumn("__q", expr("n div 4"))
      .withColumn("__r", expr("n % 4"))
      .withColumn("quartile",
        when($"rank" <= $"__r" * ($"__q" + 1L),
          expr("(`rank` - 1) div (__q + 1) + 1"))
          .otherwise(expr("__r + (`rank` - __r * (__q + 1) - 1) div __q + 1"))
          .cast("long"))
      .withColumn("cd", r6($"rank".cast("double") / $"n"))
      .select($"o_orderstatus", $"o_orderkey", $"o_totalprice", $"quartile", $"cd")
      .orderBy($"o_orderstatus", $"o_orderkey")
  }

  val q32Sql: String =
    s"""SELECT o_orderstatus, o_orderkey, o_totalprice,
       |CAST(ntile(4) OVER win AS BIGINT) AS quartile,
       |${sqlR6("cume_dist() OVER win")} AS cd
       |FROM orders
       |WINDOW win AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
       |ORDER BY o_orderstatus, o_orderkey""".stripMargin

  /** Pivot: avg price by year pivoted on order status (explicit value
    * list → stable columns; oracle is the equivalent CASE aggregation). */
  def q33(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .groupBy(year($"o_orderdate").as("order_year"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(moneyAvg($"o_totalprice"))
      .withColumnsRenamed(Map("F" -> "avg_f", "O" -> "avg_o", "P" -> "avg_p"))
      .orderBy($"order_year")
  }

  val q33Sql: String = {
    def cell(st: String) =
      sqlR4(s"${sqlR2(s"sum(CASE WHEN o_orderstatus = '$st' THEN o_totalprice END)")} / count(CASE WHEN o_orderstatus = '$st' THEN 1 END)")
    s"""SELECT year(o_orderdate) AS order_year,
       |${cell("F")} AS avg_f, ${cell("O")} AS avg_o, ${cell("P")} AS avg_p
       |FROM orders GROUP BY 1 ORDER BY order_year""".stripMargin
  }

  /** Sorted collect aggregation, emitted as a joined string (arrays in
    * oracle-checked outputs risk hasher differences; the string is
    * equivalent coverage). */
  def q34(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .groupBy($"o_orderstatus")
      .agg(
        array_join(sort_array(collect_set($"o_orderpriority")), ",").as("priorities"),
        count(lit(1)).as("n"))
      .orderBy($"o_orderstatus")
  }

  val q34Sql: String =
    """SELECT o_orderstatus,
      |array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS priorities,
      |count(*) AS n
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** RANGE-frame moving window: 7-day trailing order count and spend
    * per customer — a true event-time range frame (peers by value, not
    * row position), ordered on epoch seconds so both engines bound the
    * frame identically. */
  def q81(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_custkey")
      .orderBy(unix_timestamp($"o_orderdate"))
      .rangeBetween(-604800L, 0L)
    Tables.load(s, d, "orders")
      .select($"o_orderkey", $"o_custkey",
        count(lit(1)).over(w).as("n_7d"),
        Fx.r2(sum($"o_totalprice").over(w)).as("spend_7d"))
      .orderBy($"o_orderkey")
  }

  val q81Sql: String =
    """SELECT o_orderkey, o_custkey,
      |  CAST(count(*) OVER w AS BIGINT) AS n_7d,
      |  floor(sum(o_totalprice) OVER w * 100 + 0.5) / 100 AS spend_7d
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
      |             RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
      |ORDER BY o_orderkey""".stripMargin

  /** Pearson correlation from grid-exact raw moments: quantities are
    * integer-valued and discounts sit on the 2-decimal grid, so every
    * sum (q, d, q², d², q·d) is EXACTLY recoverable on its grid and the
    * correlation formula then runs on identical inputs in both engines.
    * (A price² second moment would NOT work — sum·10⁴ ≈ 2e16 exceeds
    * 2⁵³, so the grid trick breaks; pick grid-bounded moments.)
    * Built-in corr() is avoided: its streaming covariance accumulation
    * is sum-order-dependent across engines. */
  def q83(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val s0 = Tables.load(s, d, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum($"l_quantity").as("sq"),
        Fx.r2(sum($"l_discount")).as("sd"),
        sum($"l_quantity" * $"l_quantity").as("sqq"),
        Fx.r4(sum($"l_discount" * $"l_discount")).as("sdd"),
        Fx.r2(sum($"l_quantity" * $"l_discount")).as("sqd"))
    s0.select($"l_returnflag", $"n",
        Fx.r6(($"n" * $"sqd" - $"sq" * $"sd") /
          sqrt(($"n" * $"sqq" - $"sq" * $"sq") * ($"n" * $"sdd" - $"sd" * $"sd")))
          .as("corr_qty_disc"))
      .orderBy($"l_returnflag")
  }

  val q83Sql: String =
    """WITH s AS (
      |  SELECT l_returnflag,
      |    count(*) AS n,
      |    sum(l_quantity) AS sq,
      |    floor(sum(l_discount) * 100 + 0.5) / 100 AS sd,
      |    sum(l_quantity * l_quantity) AS sqq,
      |    floor(sum(l_discount * l_discount) * 10000 + 0.5) / 10000 AS sdd,
      |    floor(sum(l_quantity * l_discount) * 100 + 0.5) / 100 AS sqd
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
      |  floor((n * sqd - sq * sd) / sqrt((n * sqq - sq * sq) * (n * sdd - sd * sd))
      |        * 1000000 + 0.5) / 1000000 AS corr_qty_disc
      |FROM s ORDER BY l_returnflag""".stripMargin

  /** q111 — FULL OUTER join: the order-activity vs ship-activity
    * calendar. Ship dates extend past the last order date (and order
    * days can have no shipments), so both null sides of the join are
    * genuinely exercised. Coalesced counts + presence flags. */
  def q111(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, d)
      .groupBy(to_date($"o_orderdate").as("day"))
      .agg(count(lit(1)).as("n_orders"))
    val l = Tables.lineitem(s, d)
      .groupBy(to_date($"l_shipdate").as("ship_day"))
      .agg(count(lit(1)).as("n_ships"))
    o.join(l, $"day" === $"ship_day", "full_outer")
      .select(
        coalesce($"day", $"ship_day").as("cal_day"),
        coalesce($"n_orders", lit(0L)).as("n_orders"),
        coalesce($"n_ships", lit(0L)).as("n_ships"),
        ($"day".isNotNull && $"ship_day".isNotNull).cast("int").as("both_sides"))
      .orderBy($"cal_day")
  }

  val q111Sql: String =
    """WITH o AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_orders
      |  FROM orders GROUP BY 1),
      |l AS (
      |  SELECT CAST(l_shipdate AS DATE) AS ship_day, count(*) AS n_ships
      |  FROM lineitem GROUP BY 1)
      |SELECT COALESCE(day, ship_day) AS cal_day,
      |  COALESCE(n_orders, 0) AS n_orders,
      |  COALESCE(n_ships, 0) AS n_ships,
      |  CAST(day IS NOT NULL AND ship_day IS NOT NULL AS INT) AS both_sides
      |FROM o FULL OUTER JOIN l ON day = ship_day
      |ORDER BY cal_day""".stripMargin

  /** q112 — UNPIVOT (wide → long): per-status order metrics stacked
    * into (status, metric, value) rows via `stack`, the inverse of
    * q33's pivot. */
  def q112(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val wide = Tables.orders(s, d)
      .groupBy($"o_orderstatus")
      .agg(
        count(lit(1)).cast("double").as("n_orders"),
        moneySum($"o_totalprice").as("total_price"),
        moneyAvg($"o_totalprice").as("avg_price"))
    wide.select($"o_orderstatus",
      expr("stack(3, 'n_orders', n_orders, 'total_price', total_price, 'avg_price', avg_price) AS (metric, value)"))
      .orderBy($"o_orderstatus", $"metric")
  }

  val q112Sql: String =
    s"""WITH wide AS (
       |  SELECT o_orderstatus,
       |    CAST(count(*) AS DOUBLE) AS n_orders,
       |    ${sqlMoneySum("o_totalprice")} AS total_price,
       |    ${sqlMoneyAvg("o_totalprice")} AS avg_price
       |  FROM orders GROUP BY o_orderstatus)
       |SELECT o_orderstatus, metric, value FROM (
       |  SELECT o_orderstatus, 'n_orders' AS metric, n_orders AS value FROM wide
       |  UNION ALL
       |  SELECT o_orderstatus, 'total_price', total_price FROM wide
       |  UNION ALL
       |  SELECT o_orderstatus, 'avg_price', avg_price FROM wide) u
       |ORDER BY o_orderstatus, metric""".stripMargin

  /** q115 — exact grouped median: per order priority, the interpolated
    * median of total price. Both engines use the standard
    * rank = (n-1)·p linear interpolation; at p = 0.5 the fraction is
    * exactly 0 or 0.5, so the interpolation arithmetic on the 2-decimal
    * money grid is bit-deterministic (midpoint (a+b)·0.5 is one exact
    * IEEE multiply) — higher/odd quantiles would not be safe to hash. */
  def q115(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .groupBy($"o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        r2(percentile($"o_totalprice", lit(0.5))).as("median_price"))
      .orderBy($"o_orderpriority")
  }

  val q115Sql: String =
    s"""SELECT o_orderpriority, count(*) AS n_orders,
       |${sqlR2("quantile_cont(o_totalprice, 0.5)")} AS median_price
       |FROM orders GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin

  /** q126 — 5%-trimmed mean (robust location estimate): per return
    * flag, drop the k = ⌊n/20⌋ cheapest and k most expensive line
    * items by RANK (total tie-break: price, orderkey, linenumber —
    * value-threshold trims are ambiguous under duplicate prices), then
    * average the survivors on the money grid. The kept-range min/max
    * are the winsorization cut points.
    *
    * Scale note: the exact rank-trim rides [[Ranking.groupRanks]]
    * (range-repartition + Tungsten ordinal), so no flag's rows ever
    * sort in one task. When even the rank pass is too much, the
    * production shortcut is approx-quantile cut points (single pass,
    * mergeable sketches) + a threshold filter; this operator is the
    * exact form those cut points approximate. */
  def q126(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, d)
      .select($"l_returnflag", $"l_extendedprice", $"l_orderkey", $"l_linenumber")
    // two-phase rank (Ranking.groupRanks): 3 return flags over a
    // partitioned window would sort the whole lineitem table in 3
    // tasks; group sizes broadcast back, oracle keeps the window form
    val ranked = Ranking.groupRanks(li, Seq("l_returnflag"), 8,
      $"l_extendedprice".asc, $"l_orderkey".asc, $"l_linenumber".asc)
    val ns = li.groupBy($"l_returnflag").agg(count(lit(1)).as("n"))
      .withColumnRenamed("l_returnflag", "__nf")
    ranked.join(broadcast(ns), $"l_returnflag" <=> $"__nf").drop("__nf")
      .withColumn("k", floor($"n" / 20))
      .filter($"rank" > $"k" && $"rank" <= $"n" - $"k")
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n_kept"),
        moneyAvg($"l_extendedprice").as("trimmed_avg"),
        min($"l_extendedprice").as("lo_cut"),
        max($"l_extendedprice").as("hi_cut"))
      .orderBy($"l_returnflag")
  }

  val q126Sql: String =
    s"""WITH r AS (
       |  SELECT l_returnflag, l_extendedprice,
       |    row_number() OVER (PARTITION BY l_returnflag
       |      ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
       |    count(*) OVER (PARTITION BY l_returnflag) AS n
       |  FROM lineitem),
       |kept AS (
       |  SELECT l_returnflag, l_extendedprice
       |  FROM r WHERE rn > floor(n / 20) AND rn <= n - floor(n / 20))
       |SELECT l_returnflag, count(*) AS n_kept,
       |  ${sqlMoneyAvg("l_extendedprice")} AS trimmed_avg,
       |  min(l_extendedprice) AS lo_cut, max(l_extendedprice) AS hi_cut
       |FROM kept GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q131 — snapshot diff (CDC between two states of a keyed table):
    * full-outer join on the key, verdict per row — added (new only),
    * removed (old only), modified (both, attribute changed). The two
    * snapshots are deterministic slices of `orders` (old = pre-1998;
    * new = drops every 101st key and rewrites every 97th key's
    * priority), so both engines derive identical states. Scale shape:
    * one key-partitioned join comparing typed columns — never
    * stringified rows (number/date formatting is engine-specific; typed
    * comparison is not). */
  def q131(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val orders = Tables.orders(s, d)
    val old = orders.filter($"o_orderdate" < lit("1998-01-01").cast("date"))
      .select($"o_orderkey".as("k"), $"o_orderpriority".as("old_priority"))
    val nw = orders.filter($"o_orderkey" % 101 =!= 0)
      .select($"o_orderkey".as("k"),
        when($"o_orderkey" % 97 === 0, lit("0-RUSH"))
          .otherwise($"o_orderpriority").as("new_priority"))
    old.join(nw, Seq("k"), "full_outer")
      .withColumn("verdict",
        when($"old_priority".isNull, lit("added"))
          .when($"new_priority".isNull, lit("removed"))
          .when($"old_priority" =!= $"new_priority", lit("modified"))
          .otherwise(lit("unchanged")))
      .filter($"verdict" =!= "unchanged")
      .select($"k".as("o_orderkey"), $"verdict",
        coalesce($"old_priority", lit("-")).as("old_priority"),
        coalesce($"new_priority", lit("-")).as("new_priority"))
      .orderBy($"o_orderkey")
  }

  val q131Sql: String =
    """WITH old AS (
      |  SELECT o_orderkey AS k, o_orderpriority AS old_priority
      |  FROM orders WHERE o_orderdate < DATE '1998-01-01'),
      |nw AS (
      |  SELECT o_orderkey AS k,
      |    CASE WHEN o_orderkey % 97 = 0 THEN '0-RUSH'
      |         ELSE o_orderpriority END AS new_priority
      |  FROM orders WHERE o_orderkey % 101 <> 0),
      |diff AS (
      |  SELECT coalesce(old.k, nw.k) AS o_orderkey,
      |    CASE WHEN old.k IS NULL THEN 'added'
      |         WHEN nw.k IS NULL THEN 'removed'
      |         WHEN old_priority <> new_priority THEN 'modified'
      |         ELSE 'unchanged' END AS verdict,
      |    coalesce(old_priority, '-') AS old_priority,
      |    coalesce(new_priority, '-') AS new_priority
      |  FROM old FULL OUTER JOIN nw ON old.k = nw.k)
      |SELECT o_orderkey, verdict, old_priority, new_priority
      |FROM diff WHERE verdict <> 'unchanged'
      |ORDER BY o_orderkey""".stripMargin

  /** q133 — whole-partition window frames: per customer (ordered by
    * date, orderkey) each order sees the partition's first, last, and
    * second price via first_value/last_value/nth_value over ROWS
    * UNBOUNDED PRECEDING..UNBOUNDED FOLLOWING. The full frame makes
    * last_value mean "partition last", not the default "current row" —
    * the classic frame-semantics trap, pinned here against the oracle. */
  def q133(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, d)
      .select($"o_custkey", $"o_orderkey",
        first_value($"o_totalprice").over(w).as("first_p"),
        last_value($"o_totalprice").over(w).as("last_p"),
        nth_value($"o_totalprice", 2).over(w).as("second_p"))
      .filter($"o_orderkey" % 10 === 0)
      .orderBy($"o_custkey", $"o_orderkey")
  }

  val q133Sql: String =
    """SELECT o_custkey, o_orderkey, first_p, last_p, second_p FROM (
      |  SELECT o_custkey, o_orderkey,
      |    first_value(o_totalprice) OVER w AS first_p,
      |    last_value(o_totalprice) OVER w AS last_p,
      |    nth_value(o_totalprice, 2) OVER w AS second_p
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) t
      |WHERE o_orderkey % 10 = 0
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** q134 — forward-fill (LOCF gap fill): error events lose their
    * reading (deterministic null injection so both engines see the
    * same gaps), then each user's timeline carries the last known
    * value forward via last_value(... IGNORE NULLS) over the
    * preceding-rows frame — the standard sensor/metric imputation
    * operator, partition-parallel per user. */
  def q134(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select($"user_id", $"event_id", $"ts",
        when($"event_type" === "error", lit(null).cast("double"))
          .otherwise($"value").as("v"))
      .withColumn("v_filled", last($"v", ignoreNulls = true).over(w))
      .filter($"v".isNull)
      .select($"user_id", $"event_id", coalesce($"v_filled", lit(-1.0)).as("v_filled"))
      .orderBy($"user_id", $"event_id")
  }

  val q134Sql: String =
    """SELECT user_id, event_id, coalesce(v_filled, -1.0) AS v_filled FROM (
      |  SELECT user_id, event_id, v,
      |    last_value(v IGNORE NULLS) OVER (
      |      PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
      |  FROM (
      |    SELECT user_id, event_id, ts,
      |      CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      |    FROM events) e) f
      |WHERE v IS NULL
      |ORDER BY user_id, event_id""".stripMargin

  // ------------------------------------------------------------------
  // q237 — document-model round trip (nest → flatten, invariants kept)
  // ------------------------------------------------------------------

  /** q237 — the relational↔document round trip: each order NESTS its
    * line items into a sorted array<struct> (the document shape the
    * K4/K5 Mongo sink and every JSON/protobuf training-example writer
    * emit — one self-contained record per entity, no join at read
    * time), then the flatten side EXPLODES the documents back and
    * re-derives the per-priority totals from the nested form alone.
    * The oracle states the same totals from the flat relations, so a
    * hash-match proves the nest→flatten cycle preserved every row and
    * value — the losslessness a pipeline must guarantee before it
    * ships documents instead of tables.
    *
    * Scale shape: one shuffle groups lines by order (each array
    * bounded by its own order's lines — max 7 in TPC-H shape, always
    * entity-bounded in the document model by design), the join to
    * orders rides the same key, and the explode is narrow. Money
    * stays on the exact cent grid inside the structs, so nesting
    * introduces no float drift. */
  def q237(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val items = Tables.lineitem(s, d)
      .select($"l_orderkey",
        struct($"l_linenumber".as("ln"),
          $"l_quantity".cast("long").as("qty"),
          floor($"l_extendedprice" * 100 + 0.5).cast("long").as("cents"))
          .as("item"))
      .groupBy($"l_orderkey")
      .agg(sort_array(collect_list($"item")).as("items"))
    val docs = Tables.orders(s, d)
      .select($"o_orderkey", $"o_orderpriority")
      .join(items, $"o_orderkey" === $"l_orderkey")
      .select($"o_orderkey", $"o_orderpriority", $"items")
    // r19: n_orders via posexplode instead of countDistinct(o_orderkey).
    // Each pre-explode row IS one distinct order (items are grouped by
    // orderkey upstream, arrays never empty), so counting the pos=0 rows
    // is the same number — without the distinct-aggregate rewrite that
    // ran the exploded relation through FOUR HashAggregates keyed on
    // (priority, orderkey) and an extra exchange of the orderkey domain.
    // Plan diff: 4 HashAggregate + 2 Exchange → 2 HashAggregate +
    // 1 Exchange past the Generate (guide §2.3 aggregate-before-shuffle:
    // the partial agg now collapses to ≤ |priorities| rows per task).
    docs
      .select($"o_orderkey", $"o_orderpriority",
        posexplode($"items").as(Seq("pos", "it")))
      .groupBy($"o_orderpriority")
      .agg(count(when($"pos" === 0, lit(1))).as("n_orders"),
        count(lit(1)).as("n_items"),
        sum($"it.qty").as("sum_qty"),
        sum($"it.cents").as("sum_cents"))
      .orderBy($"o_orderpriority")
  }

  val q237Sql: String =
    """SELECT o_orderpriority,
      |  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
      |  CAST(count(*) AS BIGINT) AS n_items,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |    AS sum_cents
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------
  // q248 — RFM customer segmentation (quintile scoring, scale-safe)
  // ------------------------------------------------------------------

  /** q248 — the classic RFM segmentation: every customer scores 1–5 on
    * Recency (days since last order, most recent = 5), Frequency
    * (order count) and Monetary (lifetime cents), each score the
    * customer's quintile within the whole base, plus the marketing
    * segment labels the scores exist for (champion / loyal / at-risk
    * / hibernating / other — the standard grid cut).
    *
    * Scale shape: quintiles over ONE global group are exactly the
    * degenerate case group-partitioned windows handle worst (ntile
    * would pull every customer through a single task), so each
    * dimension's ranks come from [[Ranking.groupRanks]] on a
    * constant group (range-repartition + Tungsten ordinal — the
    * q214/q227 mechanism at group-count 1), and the bucket is pure
    * integer arithmetic ((rank−1)·5 div n + 1) the oracle mirrors
    * with row_number windows at its own scale. Tie-breaks by custkey
    * make every rank — and therefore every bucket — unique and
    * cross-engine identical. */
  def q248(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = Tables.orders(s, d)
      .groupBy($"o_custkey")
      .agg(max(epochDay($"o_orderdate")).as("last_day"),
        count(lit(1)).as("f"),
        sum(floor($"o_totalprice" * 100 + 0.5).cast("long")).as("m"))
    val mx = base.agg(max($"last_day").as("mxd"), count(lit(1)).as("n"))
    val rfm = base.crossJoin(broadcast(mx))
      .select($"o_custkey", $"n",
        ($"mxd" - $"last_day").cast("long").as("recency_days"), $"f", $"m")
      .withColumn("__g", lit(1))
    def score(df: DataFrame, ord: Seq[org.apache.spark.sql.Column], out: String) =
      Ranking.groupRanks(df, Seq("__g"), 8, ord: _*)
        // integer div, not IEEE: a correctly-rounded double quotient can
        // land ON the next integer and a cast would mis-bucket the row
        .select($"o_custkey", (expr("(rank - 1) * 5 div n") + 1L)
          .cast("int").as(out))
    // oldest first → the most recent customers take the top ranks = 5
    val rs = score(rfm.select($"o_custkey", $"n", $"__g", $"recency_days"),
      Seq($"recency_days".desc, $"o_custkey".asc), "r_score")
    val fs = score(rfm.select($"o_custkey", $"n", $"__g", $"f"),
      Seq($"f".asc, $"o_custkey".asc), "f_score")
    val ms = score(rfm.select($"o_custkey", $"n", $"__g", $"m"),
      Seq($"m".asc, $"o_custkey".asc), "m_score")
    rfm.select($"o_custkey", $"recency_days", $"f", $"m")
      .join(rs, "o_custkey").join(fs, "o_custkey").join(ms, "o_custkey")
      .withColumn("segment",
        when($"r_score" >= 4 && $"f_score" >= 4 && $"m_score" >= 4, "champion")
          .when($"f_score" >= 4 && $"m_score" >= 3, "loyal")
          .when($"r_score" <= 2 && $"f_score" >= 3, "at_risk")
          .when($"r_score" <= 2 && $"f_score" <= 2, "hibernating")
          .otherwise("other"))
      .select($"o_custkey", $"recency_days", $"f".as("n_orders"),
        $"m".as("cents"), $"r_score", $"f_score", $"m_score", $"segment")
      .orderBy($"o_custkey")
  }

  val q248Sql: String = {
    def bucket(ord: String) =
      s"CAST(((CAST(row_number() OVER (ORDER BY $ord, o_custkey) AS BIGINT) - 1) * 5) // (SELECT count(*) FROM base) + 1 AS INT)"
    s"""WITH base AS (
       |  SELECT o_custkey,
       |    max(CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS last_day,
       |    CAST(count(*) AS BIGINT) AS f,
       |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
       |      AS m
       |  FROM orders GROUP BY 1),
       |mx AS (SELECT max(last_day) AS mxd FROM base),
       |scored AS (
       |  SELECT o_custkey,
       |    CAST(mxd - last_day AS BIGINT) AS recency_days, f, m,
       |    ${bucket("mxd - last_day DESC")} AS r_score,
       |    ${bucket("f")} AS f_score,
       |    ${bucket("m")} AS m_score
       |  FROM base CROSS JOIN mx)
       |SELECT o_custkey, recency_days, f AS n_orders, m AS cents,
       |  r_score, f_score, m_score,
       |  CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 THEN 'champion'
       |       WHEN f_score >= 4 AND m_score >= 3 THEN 'loyal'
       |       WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
       |       WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
       |       ELSE 'other' END AS segment
       |FROM scored ORDER BY o_custkey""".stripMargin
  }

  /** q310 — ABC (Pareto-class) inventory analysis: parts rank by
    * discounted revenue, and the running revenue share cuts the
    * catalog into A (first 80% of revenue), B (next 15%) and C (the
    * long tail) — the classification purchasing actually stocks by.
    * Revenue lands exactly on the 4-decimal grid (integer 1e-4
    * units after one r4 fix); the running total rides
    * [[Ranking.groupRunningSum]] with an EMPTY group — the global
    * distributed prefix sum — so no single task ever sorts the
    * whole catalog; class tests are integer comparisons
    * (cum·100 ≤ total·80). Emits per-class part counts, revenue and
    * exact micro share.
    *
    * Scale shape: one lineitem collapse to parts, one scan-safe
    * global prefix, a 3-row rollup. The oracle keeps the
    * single-window cumulative form it is allowed at oracle scale. */
  def q310(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rev = Tables.lineitem(s, d)
      .groupBy($"l_partkey")
      .agg(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev4"))
      .select($"l_partkey",
        floor($"rev4" * 10000 + 0.5).cast("long").as("ri"))
    val tot = rev.agg(sum($"ri").as("total"))
    Ranking.groupRunningSum(rev, Seq.empty, 8, "ri",
        $"ri".desc, $"l_partkey".asc)
      .crossJoin(broadcast(tot))
      .withColumn("cum", $"run_before" + $"ri")
      .withColumn("abc_class",
        when($"cum" * 100 <= $"total" * 80, "A")
          .when($"cum" * 100 <= $"total" * 95, "B")
          .otherwise("C"))
      .groupBy($"abc_class", $"total")
      .agg(count(lit(1)).as("n_parts"), sum($"ri").as("class_rev_i4"))
      .select($"abc_class", $"n_parts", $"class_rev_i4",
        expr("(cast(class_rev_i4 as decimal(38,0)) * 1000000) div total")
          .as("share_micro"))
      .orderBy($"abc_class")
  }

  val q310Sql: String =
    """WITH rev AS (
      |  SELECT l_partkey,
      |    CAST(floor(sum(l_extendedprice * (1.0 - l_discount)) * 10000 + 0.5)
      |      AS BIGINT) AS ri
      |  FROM lineitem GROUP BY 1),
      |tot AS (SELECT CAST(sum(ri) AS BIGINT) AS total FROM rev),
      |run AS (
      |  SELECT l_partkey, ri,
      |    CAST(COALESCE(sum(ri) OVER (ORDER BY ri DESC, l_partkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS run_before
      |  FROM rev),
      |cls AS (
      |  SELECT ri,
      |    CASE WHEN (run_before + ri) * 100 <= total * 80 THEN 'A'
      |         WHEN (run_before + ri) * 100 <= total * 95 THEN 'B'
      |         ELSE 'C' END AS abc_class,
      |    total
      |  FROM run CROSS JOIN tot)
      |SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts,
      |  CAST(sum(ri) AS BIGINT) AS class_rev_i4,
      |  CAST((CAST(sum(ri) AS HUGEINT) * 1000000) // total AS BIGINT)
      |    AS share_micro
      |FROM cls GROUP BY abc_class, total
      |ORDER BY abc_class""".stripMargin

  /** q324 — Spearman rank correlation between catalog revenue and
    * volume: "do our highest-revenue parts also move the most units"
    * as ONE exact number over the whole catalog. Ranks are TOTAL-order
    * ranks tie-broken by part key (stated — integer quantities tie
    * constantly; average-rank Spearman would put fractions in the
    * pipeline, tie-broken ranks keep every intermediate a BIGINT and
    * the tie-break is deterministic in both engines). Revenue lands
    * exactly on the 4-decimal grid per row before summation; ρ =
    * 1 − 6Σd²/(n(n²−1)) computed on DECIMAL(38,0)/HUGEINT (n³ at
    * catalog scale shreds BIGINT) with one truncating micro division.
    * The diagnostic sum_d2 column is emitted as BIGINT — exact to
    * n ≈ 2×10⁶ parts; ρ itself stays on DECIMAL38 at any n.
    *
    * Scale shape: the two rank passes ride [[Ranking.seqIds]]
    * (range-repartition + Tungsten ordinal — NO global window over
    * the catalog); the d² reduction is one aggregate. The oracle
    * keeps its window form at oracle scale. */
  def q324(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val per = Tables.lineitem(s, d)
      .groupBy($"l_partkey".as("part"))
      .agg(sum(floor($"l_extendedprice" * ($"l_discount" * -1 + 1) * 10000 + 0.5)
          .cast("long")).as("rev"),
        sum($"l_quantity".cast("long")).as("qty"))
      .transform(graft.Fx.materialize)
    val r1 = Ranking.seqIds(per, 8, $"rev".asc, $"part".asc)
      .select($"part", $"seq_id".as("rank_rev"))
    val r2 = Ranking.seqIds(per, 8, $"qty".asc, $"part".asc)
      .select($"part", $"seq_id".as("rank_qty"))
    r1.join(r2, "part")
      .agg(count(lit(1)).as("n"),
        sum(expr(
          "cast(rank_rev - rank_qty as decimal(38,0)) * (rank_rev - rank_qty)"))
          .as("sd2"))
      .select($"n", $"sd2".cast("long").as("sum_d2"),
        (lit(1000000L) - expr(
          "(6 * sd2 * 1000000) div (cast(n as decimal(38,0)) * n * n - n)"))
          .as("spearman_micro"))
  }

  val q324Sql: String =
    """WITH per AS (
      |  SELECT l_partkey AS part,
      |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
      |      AS BIGINT)) AS BIGINT) AS rev,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      |  FROM lineitem GROUP BY 1),
      |r AS (
      |  SELECT part,
      |    row_number() OVER (ORDER BY rev, part) AS rank_rev,
      |    row_number() OVER (ORDER BY qty, part) AS rank_qty
      |  FROM per),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    sum(CAST(rank_rev - rank_qty AS HUGEINT) * (rank_rev - rank_qty))
      |      AS sd2
      |  FROM r)
      |SELECT n, CAST(sd2 AS BIGINT) AS sum_d2,
      |  1000000 - CAST((6 * sd2 * 1000000) //
      |    (CAST(n AS HUGEINT) * n * n - n) AS BIGINT) AS spearman_micro
      |FROM m""".stripMargin

  /** q325 — Kendall τ between the revenue and volume orderings of the
    * TOP-100 revenue parts (bounded by design, stated — Kendall is
    * pairwise-quadratic, so the operator contract is "rank stability
    * of the head", the question merchandising actually asks; the
    * catalog-wide companion is q324's Spearman, whose rank passes
    * scale). Concordance compares the same TIE-BROKEN total orders as
    * q324 ((rev, part) vs (qty, part) lexicographic), so every pair
    * is strictly concordant or discordant — τ = (C − D)/(n(n−1)/2)
    * as one truncating micro division of exact counts.
    *
    * Scale shape: TakeOrderedAndProject head selection, then a 100×99/2
    * pair join on a broadcast-sized relation. */
  def q325(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val per = Tables.lineitem(s, d)
      .groupBy($"l_partkey".as("part"))
      .agg(sum(floor($"l_extendedprice" * ($"l_discount" * -1 + 1) * 10000 + 0.5)
          .cast("long")).as("rev"),
        sum($"l_quantity".cast("long")).as("qty"))
      .orderBy($"rev".desc, $"part".asc)
      .limit(100)
      .transform(graft.Fx.materialize)
    val a = per.select($"part".as("pa"), $"rev".as("ra"), $"qty".as("qa"))
    val b = per.select($"part".as("pb"), $"rev".as("rb"), $"qty".as("qb"))
    val ltRev = ($"ra" < $"rb") || (($"ra" === $"rb") && ($"pa" < $"pb"))
    val ltQty = ($"qa" < $"qb") || (($"qa" === $"qb") && ($"pa" < $"pb"))
    a.join(b, $"pa" < $"pb")
      .select((ltRev === ltQty).cast("long").as("conc"))
      .agg(count(lit(1)).as("n_pairs"), sum($"conc").as("concordant"))
      .select($"n_pairs", $"concordant",
        ($"n_pairs" - $"concordant").as("discordant"),
        expr("((concordant - (n_pairs - concordant)) * 1000000) div n_pairs")
          .as("tau_micro"))
  }

  val q325Sql: String =
    """WITH per AS (
      |  SELECT l_partkey AS part,
      |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
      |      AS BIGINT)) AS BIGINT) AS rev,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      |  FROM lineitem GROUP BY 1
      |  ORDER BY rev DESC, part LIMIT 100),
      |pairs AS (
      |  SELECT CASE WHEN
      |    ((a.rev < b.rev) OR (a.rev = b.rev AND a.part < b.part))
      |    = ((a.qty < b.qty) OR (a.qty = b.qty AND a.part < b.part))
      |    THEN 1 ELSE 0 END AS conc
      |  FROM per a JOIN per b ON a.part < b.part)
      |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
      |  CAST(sum(conc) AS BIGINT) AS concordant,
      |  CAST(count(*) - sum(conc) AS BIGINT) AS discordant,
      |  CAST(((2 * sum(conc) - count(*)) * 1000000) // count(*) AS BIGINT)
      |    AS tau_micro
      |FROM pairs""".stripMargin

  /** q330 — ABC–XYZ inventory matrix: q310's Pareto revenue classes
    * crossed with demand-variability classes — THE two-axis grid
    * inventory policy is written on (AX = automate the reorder,
    * CZ = stock-to-order). XYZ classes are exact integer comparisons
    * of the coefficient of variation of per-day demand: CV² =
    * (n·Σx² − S²)/S², so X ⇔ 4·(n·Σx² − S²) ≤ S² (CV ≤ ½),
    * Y ⇔ CV ≤ 1, else Z — no division, no sqrt, DECIMAL(38,0)/
    * HUGEINT moments (demand days only, stated: zero-days are not
    * observations here). ABC rides the same global distributed prefix
    * as q310. Emits the 3×3 matrix with part counts and exact revenue
    * share per cell.
    *
    * Scale shape: two collapses (part×day demand, part revenue), the
    * scan-safe global prefix, a broadcast-grid join, a ≤9-row rollup. */
  def q330(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val daily = Tables.lineitem(s, d)
      .groupBy($"l_partkey", epochDay($"l_shipdate").as("day"))
      .agg(sum($"l_quantity".cast("long")).as("x"))
    val xyz = daily.groupBy($"l_partkey")
      .agg(count(lit(1)).as("nd"), sum($"x").as("sx"),
        sum(expr("cast(x as decimal(38,0)) * x")).as("sxx"))
      .withColumn("dev",
        expr("cast(nd as decimal(38,0)) * sxx - cast(sx as decimal(38,0)) * sx"))
      .withColumn("xyz_class",
        when(expr("dev * 4 <= cast(sx as decimal(38,0)) * sx"), "X")
          .when(expr("dev <= cast(sx as decimal(38,0)) * sx"), "Y")
          .otherwise("Z"))
      .select($"l_partkey", $"xyz_class")
    val rev = Tables.lineitem(s, d)
      .groupBy($"l_partkey")
      .agg(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev4"))
      .select($"l_partkey",
        floor($"rev4" * 10000 + 0.5).cast("long").as("ri"))
    val tot = rev.agg(sum($"ri").as("total"))
    val abc = Ranking.groupRunningSum(rev, Seq.empty, 8, "ri",
        $"ri".desc, $"l_partkey".asc)
      .crossJoin(broadcast(tot))
      .withColumn("cum", $"run_before" + $"ri")
      .withColumn("abc_class",
        when($"cum" * 100 <= $"total" * 80, "A")
          .when($"cum" * 100 <= $"total" * 95, "B")
          .otherwise("C"))
      .select($"l_partkey", $"abc_class", $"ri", $"total")
    abc.join(xyz, "l_partkey")
      .groupBy($"abc_class", $"xyz_class")
      .agg(count(lit(1)).as("n_parts"), sum($"ri").as("cell_rev_i4"),
        max($"total").as("__t"))
      .select($"abc_class", $"xyz_class", $"n_parts", $"cell_rev_i4",
        expr("(cast(cell_rev_i4 as decimal(38,0)) * 1000000) div __t")
          .as("share_micro"))
      .orderBy($"abc_class", $"xyz_class")
  }

  val q330Sql: String =
    """WITH daily AS (
      |  SELECT l_partkey, CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS day,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS x
      |  FROM lineitem GROUP BY 1, 2),
      |xyz AS (
      |  SELECT l_partkey,
      |    CASE
      |      WHEN (CAST(count(*) AS HUGEINT) * sum(CAST(x AS HUGEINT) * x)
      |            - CAST(sum(x) AS HUGEINT) * sum(x)) * 4
      |           <= CAST(sum(x) AS HUGEINT) * sum(x) THEN 'X'
      |      WHEN CAST(count(*) AS HUGEINT) * sum(CAST(x AS HUGEINT) * x)
      |            - CAST(sum(x) AS HUGEINT) * sum(x)
      |           <= CAST(sum(x) AS HUGEINT) * sum(x) THEN 'Y'
      |      ELSE 'Z' END AS xyz_class
      |  FROM daily GROUP BY 1),
      |rev AS (
      |  SELECT l_partkey,
      |    CAST(floor(sum(l_extendedprice * (1 - l_discount)) * 10000 + 0.5)
      |      AS BIGINT) AS ri
      |  FROM lineitem GROUP BY 1),
      |tot AS (SELECT CAST(sum(ri) AS BIGINT) AS total FROM rev),
      |abc AS (
      |  SELECT l_partkey, ri, total,
      |    CASE
      |      WHEN CAST(sum(ri) OVER (ORDER BY ri DESC, l_partkey) AS BIGINT)
      |           * 100 <= total * 80 THEN 'A'
      |      WHEN CAST(sum(ri) OVER (ORDER BY ri DESC, l_partkey) AS BIGINT)
      |           * 100 <= total * 95 THEN 'B'
      |      ELSE 'C' END AS abc_class
      |  FROM rev CROSS JOIN tot)
      |SELECT abc_class, xyz_class, CAST(count(*) AS BIGINT) AS n_parts,
      |  CAST(sum(ri) AS BIGINT) AS cell_rev_i4,
      |  CAST((CAST(sum(ri) AS HUGEINT) * 1000000) // max(total) AS BIGINT)
      |    AS share_micro
      |FROM abc JOIN xyz USING (l_partkey)
      |GROUP BY 1, 2 ORDER BY abc_class, xyz_class""".stripMargin

  /** q333 — Syntetos–Boylan demand classification: every part lands
    * in one of the four forecasting quadrants — smooth / intermittent
    * / erratic / lumpy — by average inter-demand interval (ADI) and
    * demand-size variability (CV²), the standard gate for CHOOSING a
    * forecasting method (smooth → q270's Holt, intermittent → Croston
    * class, lumpy → don't forecast, stock to service level). The
    * published cutoffs (ADI 1.32, CV² 0.49) are applied as exact
    * cross-multiplied integer comparisons — ADI ≥ 1.32 ⟺
    * 100·span ≥ 132·(n−1), CV² ≥ 0.49 ⟺ 100·(n·Σx² − S²) ≥ 49·S² on
    * DECIMAL(38,0)/HUGEINT — so no part ever flips class by a rounding
    * ulp. Parts with a single demand day are reported as their own
    * 'single' class (stated; ADI undefined).
    *
    * Scale shape: one collapse to (part, day) demand cells, one
    * per-part moment aggregate, a 5-row rollup. */
  def q333(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val daily = Tables.lineitem(s, d)
      .groupBy($"l_partkey", epochDay($"l_shipdate").as("day"))
      .agg(sum($"l_quantity".cast("long")).as("x"))
    val per = daily.groupBy($"l_partkey")
      .agg(count(lit(1)).as("n"),
        (max($"day") - min($"day")).cast("long").as("span"),
        sum($"x").as("sx"),
        sum(expr("cast(x as decimal(38,0)) * x")).as("sxx"))
      .withColumn("cv2_hi", expr(
        "100 * (cast(n as decimal(38,0)) * sxx - cast(sx as decimal(38,0)) * sx) >= 49 * cast(sx as decimal(38,0)) * sx"))
      .withColumn("adi_hi", expr("100 * span >= 132 * (n - 1)"))
      .withColumn("quadrant",
        when($"n" === 1L, "single")
          .when(!$"adi_hi" && !$"cv2_hi", "smooth")
          .when($"adi_hi" && !$"cv2_hi", "intermittent")
          .when(!$"adi_hi" && $"cv2_hi", "erratic")
          .otherwise("lumpy"))
    val tot = per.agg(count(lit(1)).as("np"))
    per.groupBy($"quadrant")
      .agg(count(lit(1)).as("n_parts"), sum($"sx").as("quadrant_qty"))
      .crossJoin(broadcast(tot))
      .select($"quadrant", $"n_parts", $"quadrant_qty",
        expr("(n_parts * 1000000) div np").as("share_micro"))
      .orderBy($"quadrant")
  }

  val q333Sql: String =
    """WITH daily AS (
      |  SELECT l_partkey, CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS day,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS x
      |  FROM lineitem GROUP BY 1, 2),
      |per AS (
      |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n,
      |    CAST(max(day) - min(day) AS BIGINT) AS span,
      |    CAST(sum(x) AS BIGINT) AS sx,
      |    100 * (CAST(count(*) AS HUGEINT) * sum(CAST(x AS HUGEINT) * x)
      |      - CAST(sum(x) AS HUGEINT) * sum(x))
      |      >= 49 * CAST(sum(x) AS HUGEINT) * sum(x) AS cv2_hi
      |  FROM daily GROUP BY 1),
      |q AS (
      |  SELECT l_partkey, sx,
      |    CASE
      |      WHEN n = 1 THEN 'single'
      |      WHEN NOT (100 * span >= 132 * (n - 1)) AND NOT cv2_hi
      |        THEN 'smooth'
      |      WHEN 100 * span >= 132 * (n - 1) AND NOT cv2_hi
      |        THEN 'intermittent'
      |      WHEN NOT (100 * span >= 132 * (n - 1)) AND cv2_hi
      |        THEN 'erratic'
      |      ELSE 'lumpy' END AS quadrant
      |  FROM per),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS np FROM q)
      |SELECT quadrant, CAST(count(*) AS BIGINT) AS n_parts,
      |  CAST(sum(sx) AS BIGINT) AS quadrant_qty,
      |  (CAST(count(*) AS BIGINT) * 1000000) // np AS share_micro
      |FROM q CROSS JOIN tot
      |GROUP BY quadrant, np ORDER BY quadrant""".stripMargin

  /** q342 — duplicate-payment audit: pairs of orders from the SAME
    * customer for nearly the same amount (within $20 on the cent
    * grid) within 90 days — the double-billing screen every payables
    * audit runs (q182's Benford audit finds fabricated amounts; this
    * finds repeated real ones; `exact_dup` flags the cent-identical
    * subset separately because it is the smoking gun). GRID-BLOCKED
    * like the interval join (q197's cell trick, on the amount axis):
    * amounts within 2000 cents sit in the same or adjacent
    * 2000-cent bucket, so side a fans out to its 3 neighboring cells
    * and the join is a pure (cust, cell) equi-join — b occupies
    * exactly ONE cell, so every qualifying pair matches exactly once
    * and no DISTINCT is needed; the tolerance and date window are
    * residual filters. Canonical a-before-b (date, then key) keeps
    * each pair reported once.
    *
    * Scale shape: candidate volume is bounded by per-(cust, $20-cell)
    * occupancy — never the customer's full order history squared; the
    * 3× fan-out is a constant. */
  def q342(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, d).select(
      $"o_custkey", $"o_orderkey",
      floor($"o_totalprice" * 100 + 0.5).cast("long").as("cents"),
      epochDay($"o_orderdate").cast("long").as("day"))
    val a = o.select($"o_custkey", $"cents".as("cents_a"),
        $"o_orderkey".as("k_a"), $"day".as("day_a"),
        explode(array(expr("cents div 2000 - 1"), expr("cents div 2000"),
          expr("cents div 2000 + 1"))).as("cell"))
    val b = o.select($"o_custkey", $"cents".as("cents_b"),
      $"o_orderkey".as("k_b"), $"day".as("day_b"),
      expr("cents div 2000").as("cell"))
    a.join(b, Seq("o_custkey", "cell"))
      .filter(($"day_b" > $"day_a" || ($"day_b" === $"day_a" && $"k_b" > $"k_a"))
        && $"day_b" - $"day_a" <= 90
        && abs($"cents_a" - $"cents_b") <= 2000)
      .select($"o_custkey", $"k_a", $"k_b", $"cents_a", $"cents_b",
        ($"day_b" - $"day_a").as("gap_days"),
        ($"cents_a" === $"cents_b").as("exact_dup"))
      .orderBy($"o_custkey", $"k_a", $"k_b")
  }

  val q342Sql: String =
    """WITH o AS (
      |  SELECT o_custkey, o_orderkey,
      |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
      |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day
      |  FROM orders),
      |a AS (
      |  SELECT o_custkey, cents AS cents_a, o_orderkey AS k_a, day AS day_a,
      |    cents // 2000 + unnest([-1, 0, 1]) AS cell
      |  FROM o),
      |b AS (
      |  SELECT o_custkey, cents AS cents_b, o_orderkey AS k_b, day AS day_b,
      |    cents // 2000 AS cell
      |  FROM o)
      |SELECT o_custkey, k_a, k_b, cents_a, cents_b,
      |  day_b - day_a AS gap_days, cents_a = cents_b AS exact_dup
      |FROM a JOIN b USING (o_custkey, cell)
      |WHERE (day_b > day_a OR (day_b = day_a AND k_b > k_a))
      |  AND day_b - day_a <= 90
      |  AND abs(cents_a - cents_b) <= 2000
      |ORDER BY o_custkey, k_a, k_b""".stripMargin

  /** q343 — supplier revenue concentration (Herfindahl–Hirschman
    * index) by month, with its month-over-month delta: the
    * concentration trend a procurement/market monitor watches (HHI
    * above 2500 points = concentrated in the DOJ convention; rising
    * deltas flag consolidation before any single share looks scary).
    * Exact: per-supplier monthly revenue on the 4-decimal
    * price·(1−disc) grid, HHI as ONE truncating micro division of
    * HUGEINT cross-products — hhi_micro = Σrev_s²·10⁶ div (Σrev_s)² —
    * and the delta a lag over the bounded month grid (stated: the
    * calendar is its size). 10⁶ micro = the full 0..10000-point HHI
    * scale × 100.
    *
    * Scale shape: one collapse of lineitem to (month, supplier) cells,
    * one month-grid aggregate, one bounded-window lag. */
  def q343(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cells = Tables.lineitem(s, d)
      .groupBy((year($"l_shipdate") * 100 + month($"l_shipdate")).cast("long")
          .as("ym"),
        $"l_suppkey")
      .agg(sum(floor($"l_extendedprice" * (lit(1) - $"l_discount") * 10000 + 0.5)
        .cast("long")).as("rev"))
    val hhi = cells.groupBy($"ym")
      .agg(count(lit(1)).as("n_suppliers"),
        expr("cast((sum(cast(rev as decimal(38,0)) * rev) * 1000000)" +
          " div (sum(cast(rev as decimal(38,0))) * sum(rev)) as bigint)")
          .as("hhi_micro"))
    hhi.withColumn("delta_micro",
        $"hhi_micro" - lag($"hhi_micro", 1).over(Window.orderBy($"ym")))
      .orderBy($"ym")
  }

  val q343Sql: String =
    """WITH cells AS (
      |  SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT) AS ym,
      |    l_suppkey,
      |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
      |      AS BIGINT)) AS BIGINT) AS rev
      |  FROM lineitem GROUP BY 1, 2),
      |hhi AS (
      |  SELECT ym, CAST(count(*) AS BIGINT) AS n_suppliers,
      |    CAST((sum(CAST(rev AS HUGEINT) * rev) * 1000000)
      |      // (sum(CAST(rev AS HUGEINT)) * sum(CAST(rev AS HUGEINT)))
      |      AS BIGINT) AS hhi_micro
      |  FROM cells GROUP BY 1)
      |SELECT ym, n_suppliers, hhi_micro,
      |  hhi_micro - lag(hhi_micro, 1) OVER (ORDER BY ym) AS delta_micro
      |FROM hhi ORDER BY ym""".stripMargin

  /** q346 — law-of-one-price audit: per-part unit-price dispersion
    * across its order lines. The same part selling at wildly different
    * unit prices is either price discrimination, a data defect, or a
    * procurement leak — the ratio max/min unit price is the standard
    * screen. Exact: unit price on a deterministic micro-cent grid
    * (cents·10⁴ div qty, truncating — qty is integral; stated), spread
    * and ratio_micro = max·10⁶ div min are pure integer ops; the
    * top-20 most dispersed parts (≥ 5 lines) ride the native bounded
    * heap, never a catalog sort.
    *
    * Scale shape: one per-part aggregate with map-side combine, a
    * k=20 heap. */
  def q346(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val up = Tables.lineitem(s, d)
      .select($"l_partkey",
        expr("(cast(floor(l_extendedprice * 100 + 0.5) as bigint) * 10000)" +
          " div cast(l_quantity as bigint)").as("up_micro"))
    val per = up.groupBy($"l_partkey")
      .agg(count(lit(1)).as("n_lines"),
        min($"up_micro").as("min_up"), max($"up_micro").as("max_up"))
      .filter($"n_lines" >= 5)
      .select($"l_partkey", $"n_lines", $"min_up", $"max_up",
        expr("(max_up * 1000000) div min_up").as("ratio_micro"))
    graft.plans.TopK.perGroup(per, 20, Seq.empty,
      Seq(graft.plans.TopK.desc("ratio_micro"), graft.plans.TopK.asc("l_partkey")))
      .orderBy($"ratio_micro".desc, $"l_partkey")
  }

  val q346Sql: String =
    """WITH up AS (
      |  SELECT l_partkey,
      |    (CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * 10000)
      |      // CAST(l_quantity AS BIGINT) AS up_micro
      |  FROM lineitem),
      |per AS (
      |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_lines,
      |    CAST(min(up_micro) AS BIGINT) AS min_up,
      |    CAST(max(up_micro) AS BIGINT) AS max_up
      |  FROM up GROUP BY 1 HAVING count(*) >= 5)
      |SELECT l_partkey, n_lines, min_up, max_up,
      |  (max_up * 1000000) // min_up AS ratio_micro
      |FROM per ORDER BY ratio_micro DESC, l_partkey LIMIT 20""".stripMargin

  /** q358 — month-over-month price indexes (Laspeyres, Paasche,
    * Fisher) over the parts both months trade: the economics readout
    * that separates "prices rose" from "the mix shifted", which
    * neither q343 (concentration trend) nor q346 (within-part
    * dispersion) answers. Per part-month the unit price is the
    * quantity-weighted mean pushed to one micro grid —
    * (Σ floor(100·extprice)·10⁶) div Σqty, a stated truncation (the
    * q346 up_micro discipline; extendedprice is NOT on the cent grid,
    * so the per-row floor is part of the semantics). Laspeyres
    * weights by LAST month's quantities, Paasche by this month's —
    * both are ratios of exact integer basket sums via one truncating
    * micro division; Fisher is their geometric mean, the query's one
    * float op (two exact-int-to-double casts, a product, a pinned
    * sqrt, r6).
    *
    * Scale shape: the corpus collapses to part-month cells in one
    * aggregate; the month-shift join and index rollup run on that
    * bounded cell grid (parts × months), shuffled once on (month,
    * part). */
  def q358(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pm = Tables.lineitem(s, d)
      .select((year($"l_shipdate") * 12 + month($"l_shipdate")).cast("long").as("mk"),
        $"l_partkey".as("p"),
        floor($"l_extendedprice" * 100).cast("long").as("cents"),
        $"l_quantity".cast("long").as("q"))
      .groupBy($"mk", $"p")
      .agg(sum($"cents").as("c"), sum($"q").as("q"))
      .select($"mk", $"p",
        expr("(cast(c as decimal(38,0)) * 1000000) div q").as("up"), $"q")
      .transform(graft.Fx.materialize) // current AND shifted side
    val cur = pm.select($"mk", $"p", $"up".as("p1"), $"q".as("q1"))
    val prev = pm.select(($"mk" + 1L).as("mk"), $"p", $"up".as("p0"), $"q".as("q0"))
    cur.join(prev, Seq("mk", "p"))
      .groupBy($"mk").agg(
        count(lit(1)).as("n_parts"),
        sum(expr("cast(p1 as decimal(38,0)) * q0")).as("ln"),
        sum(expr("cast(p0 as decimal(38,0)) * q0")).as("ld"),
        sum(expr("cast(p1 as decimal(38,0)) * q1")).as("pn"),
        sum(expr("cast(p0 as decimal(38,0)) * q1")).as("pd"))
      .filter($"ld" > 0 && $"pd" > 0)
      .select(expr("cast((mk - 1) div 12 as int)").as("y"),
        expr("cast((mk - 1) % 12 + 1 as int)").as("m"),
        $"n_parts",
        expr("(ln * 1000000) div ld").as("laspeyres_micro"),
        expr("(pn * 1000000) div pd").as("paasche_micro"))
      .withColumn("fisher", graft.Fx.r6(sqrt(
        ($"laspeyres_micro".cast("double") / 1000000.0) *
          ($"paasche_micro".cast("double") / 1000000.0))))
      .orderBy($"y", $"m")
  }

  val q358Sql: String = {
    val f = "sqrt((CAST(laspeyres_micro AS DOUBLE) / 1000000.0) * " +
      "(CAST(paasche_micro AS DOUBLE) / 1000000.0))"
    s"""WITH pm AS MATERIALIZED (
       |  SELECT year(l_shipdate) * 12 + month(l_shipdate) AS mk,
       |    l_partkey AS p,
       |    (CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS HUGEINT)
       |      * 1000000) // CAST(sum(CAST(l_quantity AS BIGINT)) AS HUGEINT) AS up,
       |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
       |  FROM lineitem GROUP BY 1, 2),
       |j AS (
       |  SELECT cur.mk, cur.up AS p1, cur.q AS q1, prv.up AS p0, prv.q AS q0
       |  FROM pm cur JOIN pm prv ON prv.mk = cur.mk - 1 AND prv.p = cur.p),
       |m AS (
       |  SELECT mk, CAST(count(*) AS BIGINT) AS n_parts,
       |    sum(CAST(p1 AS HUGEINT) * q0) AS ln, sum(CAST(p0 AS HUGEINT) * q0) AS ld,
       |    sum(CAST(p1 AS HUGEINT) * q1) AS pn, sum(CAST(p0 AS HUGEINT) * q1) AS pd
       |  FROM j GROUP BY mk
       |  HAVING sum(CAST(p0 AS HUGEINT) * q0) > 0
       |     AND sum(CAST(p0 AS HUGEINT) * q1) > 0),
       |i AS (
       |  SELECT CAST((mk - 1) // 12 AS INT) AS y,
       |    CAST((mk - 1) % 12 + 1 AS INT) AS m, n_parts,
       |    CAST((ln * 1000000) // ld AS BIGINT) AS laspeyres_micro,
       |    CAST((pn * 1000000) // pd AS BIGINT) AS paasche_micro
       |  FROM m)
       |SELECT y, m, n_parts, laspeyres_micro, paasche_micro,
       |  ${graft.Fx.sqlR6(f)} AS fisher
       |FROM i ORDER BY y, m""".stripMargin
  }

  /** q363 — arc price elasticity of demand per brand: for consecutive
    * brand-months with a material price move (|ΔP|·100 ≥ P₀, i.e.
    * ≥ 1%, stated — the midpoint formula explodes on near-zero ΔP),
    * the midpoint elasticity E = [(Q₁−Q₀)(P₁+P₀)] / [(Q₁+Q₀)(P₁−P₀)]
    * — the log-free elasticity estimator (no float logs, unlike the
    * log-log regression form), reported per brand with the share of
    * month-pairs obeying the law of demand (E < 0). q358 asks how the
    * PRICE LEVEL moved; this asks how QUANTITY responded — the
    * second half of the economics readout. Exact: prices ride q358's
    * brand-month micro grid, E is one signed truncating micro
    * division (both engines truncate toward zero — pinned by q361's
    * negative-operand precedent), and the per-brand mean is a second
    * stated truncation.
    *
    * Scale shape: one scan collapses to brand-month cells; the shift
    * join and rollup run on the bounded cell grid. */
  def q363(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bm = Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).select($"p_partkey", $"p_brand")),
        $"l_partkey" === $"p_partkey")
      .select($"p_brand".as("brand"),
        (year($"l_shipdate") * 12 + month($"l_shipdate")).cast("long").as("mk"),
        floor($"l_extendedprice" * 100).cast("long").as("cents"),
        $"l_quantity".cast("long").as("q"))
      .groupBy($"brand", $"mk")
      .agg(sum($"cents").as("c"), sum($"q").as("q"))
      .select($"brand", $"mk",
        expr("(cast(c as decimal(38,0)) * 1000000) div q").as("p"), $"q")
      .transform(graft.Fx.materialize) // current AND shifted side
    val cur = bm.select($"brand", $"mk", $"p".as("p1"), $"q".as("q1"))
    val prev = bm.select($"brand", ($"mk" + 1L).as("mk"),
      $"p".as("p0"), $"q".as("q0"))
    cur.join(prev, Seq("brand", "mk"))
      .filter(abs($"p1" - $"p0") * 100L >= $"p0")
      .select($"brand", expr(
        """((q1 - q0) * (cast(p1 as decimal(38,0)) + p0) * 1000000)
           div ((q1 + q0) * (cast(p1 as decimal(38,0)) - p0))""").as("e"))
      .groupBy($"brand")
      .agg(count(lit(1)).as("n_pairs"),
        expr("cast(sum(e) as decimal(38,0)) div count(1)").as("mean_e_micro"),
        sum(($"e" < 0L).cast("long")).as("n_demand_law"))
      .orderBy($"brand")
  }

  val q363Sql: String =
    """WITH bm AS MATERIALIZED (
      |  SELECT p.p_brand AS brand,
      |    year(l.l_shipdate) * 12 + month(l.l_shipdate) AS mk,
      |    (CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS HUGEINT)
      |      * 1000000) // CAST(sum(CAST(l.l_quantity AS BIGINT)) AS HUGEINT) AS p,
      |    CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  GROUP BY 1, 2),
      |j AS (
      |  SELECT cur.brand,
      |    ((cur.q - prv.q) * (CAST(cur.p AS HUGEINT) + prv.p) * 1000000)
      |      // ((cur.q + prv.q) * (CAST(cur.p AS HUGEINT) - prv.p)) AS e
      |  FROM bm cur JOIN bm prv
      |    ON prv.brand = cur.brand AND prv.mk = cur.mk - 1
      |  WHERE abs(cur.p - prv.p) * 100 >= prv.p)
      |SELECT brand, CAST(count(*) AS BIGINT) AS n_pairs,
      |  CAST(CAST(sum(e) AS HUGEINT) // count(*) AS BIGINT) AS mean_e_micro,
      |  CAST(sum(CASE WHEN e < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_demand_law
      |FROM j GROUP BY brand ORDER BY brand""".stripMargin

  /** q402 — cross-price elasticity of demand: for ordered brand pairs
    * (A, B) under the SAME manufacturer, the arc elasticity of A's
    * monthly quantity against B's monthly unit price across
    * consecutive months — e > 0 marks substitutes (B got pricier, A
    * sold more), e < 0 complements; q363's OWN-price readout answers
    * "how price-sensitive is A", this answers "who competes with
    * whom", which no registered query resolves. Same exactness kit as
    * q363: unit price is the micro fixed-point cents·1e6 div qty,
    * the ≥1%-price-move filter gates degenerate denominators, the arc
    * formula is one DECIMAL truncating division per month pair, the
    * per-pair mean is sum div count. Pairs are brand_a ≠ brand_b
    * within manufacturer (the substitution-plausible set, 20 ordered
    * pairs per mfr — stated).
    *
    * Scale shape: one scan collapses to the brand×month grid
    * (bounded: 25 brands × months); every join after is grid×grid
    * within (mfr, month) — output ≤ 100 pairs × months rows, then a
    * ≤ 100-row rollup. */
  def q402(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bm = Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).select($"p_partkey", $"p_brand")),
        $"l_partkey" === $"p_partkey")
      .select($"p_brand".as("brand"),
        substring($"p_brand", 7, 1).as("mfr"),
        (year($"l_shipdate") * 12 + month($"l_shipdate")).cast("long").as("mk"),
        floor($"l_extendedprice" * 100).cast("long").as("cents"),
        $"l_quantity".cast("long").as("qty"))
      .groupBy($"brand", $"mfr", $"mk")
      .agg(sum($"cents").as("c"), sum($"qty").as("q"))
      .select($"brand", $"mfr", $"mk",
        expr("(cast(c as decimal(38,0)) * 1000000) div q").as("p"), $"q")
      .transform(graft.Fx.materialize) // four grid probes
    val aCur = bm.select($"brand".as("brand_a"), $"mfr", $"mk", $"q".as("qa1"))
    val aPrv = bm.select($"brand".as("brand_a"), ($"mk" + 1L).as("mk"),
      $"q".as("qa0"))
    val bCur = bm.select($"brand".as("brand_b"), $"mfr".as("mfr_b"), $"mk",
      $"p".as("pb1"))
    val bPrv = bm.select($"brand".as("brand_b"), ($"mk" + 1L).as("mk"),
      $"p".as("pb0"))
    aCur.join(aPrv, Seq("brand_a", "mk"))
      .join(bCur, Seq("mk")).filter($"mfr" === $"mfr_b" && $"brand_a" =!= $"brand_b")
      .join(bPrv, Seq("brand_b", "mk"))
      .filter(abs($"pb1" - $"pb0") * 100L >= $"pb0")
      .select($"brand_a", $"brand_b", expr(
        """((qa1 - qa0) * (cast(pb1 as decimal(38,0)) + pb0) * 1000000)
           div ((qa1 + qa0) * (cast(pb1 as decimal(38,0)) - pb0))""").as("e"))
      .groupBy($"brand_a", $"brand_b")
      .agg(count(lit(1)).as("n_pairs"),
        expr("cast(sum(e) as decimal(38,0)) div count(1)").as("mean_e_micro"),
        sum(($"e" > 0L).cast("long")).as("n_substitute"))
      .orderBy($"brand_a", $"brand_b")
  }

  val q402Sql: String =
    """WITH bm AS MATERIALIZED (
      |  SELECT p.p_brand AS brand, substr(p.p_brand, 7, 1) AS mfr,
      |    year(l.l_shipdate) * 12 + month(l.l_shipdate) AS mk,
      |    (CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS HUGEINT)
      |      * 1000000) // CAST(sum(CAST(l.l_quantity AS BIGINT)) AS HUGEINT) AS p,
      |    CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  GROUP BY 1, 2, 3),
      |j AS (
      |  SELECT ac.brand AS brand_a, bc.brand AS brand_b,
      |    ((ac.q - ap.q) * (CAST(bc.p AS HUGEINT) + bp.p) * 1000000)
      |      // ((ac.q + ap.q) * (CAST(bc.p AS HUGEINT) - bp.p)) AS e
      |  FROM bm ac
      |  JOIN bm ap ON ap.brand = ac.brand AND ap.mk = ac.mk - 1
      |  JOIN bm bc ON bc.mk = ac.mk AND bc.mfr = ac.mfr
      |    AND bc.brand <> ac.brand
      |  JOIN bm bp ON bp.brand = bc.brand AND bp.mk = ac.mk - 1
      |  WHERE abs(bc.p - bp.p) * 100 >= bp.p)
      |SELECT brand_a, brand_b, CAST(count(*) AS BIGINT) AS n_pairs,
      |  CAST(CAST(sum(e) AS HUGEINT) // count(*) AS BIGINT) AS mean_e_micro,
      |  CAST(sum(CASE WHEN e > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_substitute
      |FROM j GROUP BY 1, 2 ORDER BY brand_a, brand_b""".stripMargin

  /** q403 — Croston's method for INTERMITTENT demand (Croston 1972):
    * the sparse-series forecaster q270's Holt cannot be — exponential
    * smoothing on a mostly-zero series decays toward zero between
    * demands and spikes on each one, while Croston smooths the demand
    * SIZES z and the inter-demand INTERVALS p separately (only on
    * demand days) and forecasts the per-day rate z/p. Series: daily
    * shipped quantity of part 1 (≈ 30 demand days across the window —
    * genuinely intermittent). Stated semantics: α = 0.2; the first
    * event initializes z₁ = q₁·1e6, p₁ = 1e6 (interval 1); later
    * events fold z' = (α·q·1e6 + (1−α)·z) div 1e6-style integer
    * fixed-point exactly as q270 (M = 1e6, truncating), with the
    * interval iₖ = dayₖ − dayₖ₋₁; the rate is one more micro division.
    * Driver-side fold over the ≤ day-calendar demand grid (the q270
    * bounded-fold pattern); oracle replays it as a recursive CTE.
    *
    * Scale shape: the corpus collapses to one part's demand-day grid
    * (bounded by the calendar); the sequential fold touches only that
    * grid. Forecasting ALL parts at once would instead ride
    * groupRunningSum-style partitioned folds — this readout pins the
    * estimator's semantics on one series. */
  def q403(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val daily = Tables.lineitem(s, d)
      .filter($"l_partkey" === 1L)
      .groupBy(epochDay($"l_shipdate").as("day"))
      .agg(sum($"l_quantity".cast("long")).as("q"))
      .orderBy($"day")
      .collect().map(r => (r.getInt(0).toLong, r.getLong(1)))
    val alpha = 200000L; val m = 1000000L
    var z = 0L; var p = 0L; var prevDay = 0L
    val rows = daily.zipWithIndex.map { case ((day, q), i) =>
      val interval = if (i == 0) 1L else day - prevDay
      if (i == 0) { z = q * m; p = m }
      else {
        z = (alpha * (q * m) + (m - alpha) * z) / m
        p = (alpha * (interval * m) + (m - alpha) * p) / m
      }
      prevDay = day
      (day, q, interval, z, p, z * m / p)
    }
    s.createDataFrame(rows.toSeq)
      .toDF("day", "qty", "interval_days", "z_micro", "p_micro", "rate_micro")
      .orderBy($"day")
  }

  val q403Sql: String =
    """WITH RECURSIVE daily AS (
      |  SELECT CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS day,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
      |  FROM lineitem WHERE l_partkey = 1 GROUP BY 1),
      |o AS (
      |  SELECT day, q, row_number() OVER (ORDER BY day) AS rn,
      |    day - lag(day) OVER (ORDER BY day) AS gap
      |  FROM daily),
      |cr(rn, day, q, iv, z, p) AS (
      |  SELECT rn, day, q, CAST(1 AS BIGINT), q * 1000000,
      |    CAST(1000000 AS BIGINT)
      |  FROM o WHERE rn = 1
      |  UNION ALL
      |  SELECT o.rn, o.day, o.q, o.gap,
      |    (200000 * (o.q * 1000000) + 800000 * cr.z) // 1000000,
      |    (200000 * (o.gap * 1000000) + 800000 * cr.p) // 1000000
      |  FROM cr JOIN o ON o.rn = cr.rn + 1)
      |SELECT CAST(day AS BIGINT) AS day, q AS qty,
      |  CAST(iv AS BIGINT) AS interval_days,
      |  CAST(z AS BIGINT) AS z_micro, CAST(p AS BIGINT) AS p_micro,
      |  CAST(CAST(z AS HUGEINT) * 1000000 // p AS BIGINT) AS rate_micro
      |FROM cr ORDER BY day""".stripMargin

  /** q375 — bullwhip ratio: the variance of monthly ORDER revenue
    * over the variance of monthly SHIPPED revenue, on the months both
    * series cover — the classic supply-chain amplification diagnostic
    * (ratio > 1: ordering is jumpier than fulfilment smooths it; the
    * cross-series companion to q341's within-series variance-ratio
    * random-walk test). Exact: order months land on the cent grid via
    * the grid-first sum; ship months sum per-row floored cents
    * (extendedprice's stated truncation); both n-scaled variances are
    * DECIMAL(38,0) forms and the ratio is one truncating micro
    * division, NULL on a degenerate (zero-variance) shipped series.
    *
    * Scale shape: two scans each collapsing to the bounded month
    * calendar, an equi-join on month, one scalar moment rollup. */
  def q375(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val om = Tables.orders(s, d)
      .groupBy((year($"o_orderdate") * 12 + month($"o_orderdate")).as("mk"))
      .agg(floor(sum($"o_totalprice") * 100 + lit(0.5)).cast("long").as("o"))
    val sm = Tables.lineitem(s, d)
      .groupBy((year($"l_shipdate") * 12 + month($"l_shipdate")).as("mk"))
      .agg(sum(floor($"l_extendedprice" * 100).cast("long")).as("sh"))
    om.join(sm, "mk")
      .agg(count(lit(1)).as("n"),
        sum($"o").as("so"), sum(expr("cast(o as decimal(38,0)) * o")).as("soo"),
        sum($"sh").as("ss"),
        sum(expr("cast(sh as decimal(38,0)) * sh")).as("sss"))
      .select($"n".as("n_months"),
        expr("n * soo - cast(so as decimal(38,0)) * so").as("vo"),
        expr("n * sss - cast(ss as decimal(38,0)) * ss").as("vs"))
      .select($"n_months",
        when($"vs" > 0, expr("(vo * 1000000) div vs")).as("bullwhip_micro"))
      .withColumn("amplifying",
        when($"bullwhip_micro".isNotNull,
          ($"bullwhip_micro" > 1000000L).cast("int")))
  }

  val q375Sql: String =
    """WITH om AS (
      |  SELECT year(o_orderdate) * 12 + month(o_orderdate) AS mk,
      |    CAST(floor(sum(o_totalprice) * 100 + 0.5) AS BIGINT) AS o
      |  FROM orders GROUP BY 1),
      |sm AS (
      |  SELECT year(l_shipdate) * 12 + month(l_shipdate) AS mk,
      |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sh
      |  FROM lineitem GROUP BY 1),
      |j AS (SELECT om.o, sm.sh FROM om JOIN sm ON om.mk = sm.mk),
      |mo AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS n,
      |    CAST(sum(o) AS HUGEINT) AS so, sum(CAST(o AS HUGEINT) * o) AS soo,
      |    CAST(sum(sh) AS HUGEINT) AS ss, sum(CAST(sh AS HUGEINT) * sh) AS sss
      |  FROM j),
      |v AS (
      |  SELECT n, n * soo - so * so AS vo, n * sss - ss * ss AS vs FROM mo)
      |SELECT CAST(n AS BIGINT) AS n_months,
      |  CASE WHEN vs > 0 THEN CAST((vo * 1000000) // vs AS BIGINT) END
      |    AS bullwhip_micro,
      |  CASE WHEN vs > 0 THEN
      |    CAST(CAST((vo * 1000000) // vs AS BIGINT) > 1000000 AS INT)
      |  END AS amplifying
      |FROM v""".stripMargin

  /** q377 — chain-ladder development factors: order cohorts (by order
    * month) "develop" as their lines ship over the following months,
    * and f_d = Σᵢ C_{i,d+1} / Σᵢ C_{i,d} over cohorts mature through
    * d+1 is the actuarial loss-triangle estimator — how much more
    * revenue a d-month-old cohort still books, the standard
    * completion-forecast machinery (here fulfilment instead of
    * claims). Exact: per-row floored cents; the cumulative triangle
    * C_{i,d} is a cohort-partitioned running sum over the COLLAPSED
    * (cohort, dev) grid; the maturity gate keeps only cohorts whose
    * d+1 column is fully observed (cohort month ≤ max ship month −
    * (d+1), stated — an immature cohort would bias f_d downward);
    * each factor is one truncating micro division of exact integer
    * column sums. Dev lags cap at 6 months, and factors pair only
    * OBSERVED adjacent cells (a cohort with an empty dev month skips
    * that factor's sum — immaterial on this data where every cell
    * holds thousands of lines; both stated).
    *
    * Scale shape: one lineitem⋈orders equi-join on orderkey (the one
    * fact-to-fact shuffle), collapsed immediately to the
    * (cohort, dev) triangle (≤ months×7 rows); the cumulative window
    * and factor joins live on that collapsed triangle. */
  /** Cumulative (cohort, dev) development triangle — shared by q377
    * (factors) and q390 (ultimate forecast). */
  private def devTriangle(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d).select($"o_orderkey",
          (year($"o_orderdate") * 12 + month($"o_orderdate")).as("cohort")),
        $"l_orderkey" === $"o_orderkey")
      .select($"cohort",
        ((year($"l_shipdate") * 12 + month($"l_shipdate")) - $"cohort")
          .cast("long").as("dev"),
        floor($"l_extendedprice" * 100).cast("long").as("cents"))
      .filter($"dev" >= 0 && $"dev" <= 6)
      .groupBy($"cohort", $"dev").agg(sum($"cents").as("inc"))
      .withColumn("cum", sum($"inc").over(
        Window.partitionBy($"cohort").orderBy($"dev")))
      .transform(graft.Fx.materialize)
  }

  private def maxShipMk(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .agg(max(year($"l_shipdate") * 12 + month($"l_shipdate")).as("mx"))
  }

  /** Maturity-gated dev→dev+1 factors off the triangle (q377's core). */
  private def devFactors(s: SparkSession, tri: DataFrame,
      maxMk: DataFrame): DataFrame = {
    import s.implicits._
    val cur = tri.select($"cohort", $"dev", $"cum")
    val nxt = tri.select($"cohort", ($"dev" - 1).as("dev"), $"cum".as("cum1"))
    cur.join(nxt, Seq("cohort", "dev"))
      .crossJoin(broadcast(maxMk))
      .filter($"cohort" <= $"mx" - ($"dev" + 1))
      .groupBy($"dev")
      .agg(count(lit(1)).as("n_cohorts"),
        sum($"cum").as("cd"), sum($"cum1").as("cd1"))
      .select($"dev", $"n_cohorts",
        when($"cd" > 0,
          expr("(cast(cd1 as decimal(38,0)) * 1000000) div cd"))
          .as("factor_micro"))
  }

  def q377(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    devFactors(s, devTriangle(s, d), maxShipMk(s, d)).orderBy($"dev")
  }

  val q377Sql: String =
    """WITH tri AS MATERIALIZED (
      |  SELECT cohort, dev, CAST(sum(cents) AS BIGINT) AS inc,
      |    CAST(sum(sum(cents)) OVER (PARTITION BY cohort ORDER BY dev)
      |      AS BIGINT) AS cum
      |  FROM (
      |    SELECT year(o.o_orderdate) * 12 + month(o.o_orderdate) AS cohort,
      |      (year(l.l_shipdate) * 12 + month(l.l_shipdate))
      |        - (year(o.o_orderdate) * 12 + month(o.o_orderdate)) AS dev,
      |      CAST(floor(l.l_extendedprice * 100) AS BIGINT) AS cents
      |    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey) t
      |  WHERE dev BETWEEN 0 AND 6
      |  GROUP BY cohort, dev),
      |mx AS (
      |  SELECT max(year(l_shipdate) * 12 + month(l_shipdate)) AS mx
      |  FROM lineitem),
      |j AS (
      |  SELECT cur.dev, cur.cum AS cd, nxt.cum AS cd1
      |  FROM tri cur
      |  JOIN tri nxt ON nxt.cohort = cur.cohort AND nxt.dev = cur.dev + 1
      |  CROSS JOIN mx
      |  WHERE cur.cohort <= mx.mx - (cur.dev + 1))
      |SELECT dev, CAST(count(*) AS BIGINT) AS n_cohorts,
      |  CASE WHEN sum(cd) > 0 THEN
      |    CAST((CAST(sum(cd1) AS HUGEINT) * 1000000) // CAST(sum(cd) AS HUGEINT)
      |      AS BIGINT)
      |  END AS factor_micro
      |FROM j GROUP BY dev ORDER BY dev""".stripMargin

  /** q380 — mean residual life of the customer reorder process:
    * MRL(t) = E[gap − t | gap > t] over pooled inter-order gaps —
    * given a customer is already t days overdue, how much LONGER
    * until they typically reorder? The reliability curve behind
    * churn-intervention timing: a memoryless (exponential) process
    * has FLAT MRL, rising MRL says "the longer away, the longer
    * still" (intervene early), falling says overdue customers are
    * about to return on their own. Complements q208 (gap moments)
    * and q271 (survival S(t)): MRL is the CONDITIONAL-mean transform
    * of the same distribution. Exact: gaps are integer day
    * differences (same-day repeats collapse, stated); each MRL(t)
    * over the stated grid t ∈ {0, 7, 14, 28, 56} is one truncating
    * micro division of exact conditional sums.
    *
    * Scale shape: per-customer ordered diffs ride a customer-
    * partitioned window (high-cardinality key — safe); the t-grid is
    * a 5-row broadcast; one conditional aggregate per t. */
  def q380(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val wc = Window.partitionBy($"o_custkey").orderBy($"day")
    val gaps = Tables.orders(s, d)
      .select($"o_custkey", graft.Fx.epochDay($"o_orderdate").as("day"))
      .distinct()
      .withColumn("gap", $"day" - lag($"day", 1).over(wc))
      .filter($"gap".isNotNull && $"gap" > 0L)
      .select($"gap")
    val grid = s.createDataFrame(Seq(0L, 7L, 14L, 28L, 56L).map(Tuple1(_)))
      .toDF("t")
    gaps.crossJoin(broadcast(grid))
      .filter($"gap" > $"t")
      .groupBy($"t")
      .agg(count(lit(1)).as("n_exceed"),
        sum($"gap" - $"t").as("resid"))
      .select($"t", $"n_exceed",
        expr("(cast(resid as decimal(38,0)) * 1000000) div n_exceed")
          .as("mrl_micro"))
      .orderBy($"t")
  }

  val q380Sql: String =
    """WITH days AS (
      |  SELECT DISTINCT o_custkey,
      |    CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS day
      |  FROM orders),
      |gaps AS (
      |  SELECT day - lag(day) OVER (PARTITION BY o_custkey ORDER BY day)
      |    AS gap
      |  FROM days),
      |g AS (SELECT gap FROM gaps WHERE gap IS NOT NULL AND gap > 0),
      |grid AS (SELECT CAST(l AS BIGINT) AS t
      |         FROM (VALUES (0), (7), (14), (28), (56)) v(l))
      |SELECT grid.t, CAST(count(*) AS BIGINT) AS n_exceed,
      |  CAST((CAST(sum(g.gap - grid.t) AS HUGEINT) * 1000000) // count(*)
      |    AS BIGINT) AS mrl_micro
      |FROM g JOIN grid ON g.gap > grid.t
      |GROUP BY grid.t ORDER BY grid.t""".stripMargin

  /** q381 — safety stock and reorder point per brand under the
    * normal-approximation service model: with daily demand mean d̄
    * and std σ_d over the DENSE ship-day calendar (zero-fill — a
    * no-sale day is real demand information, stated) and lead time
    * LT = mean order→ship lag days, safety stock ss = z·σ_d·√LT at
    * the pinned 95% service z = 1.645 and ROP = d̄·LT + ss — the
    * textbook continuous-review (s, Q) sizing. Distinct machinery
    * from the REJECTED newsvendor draft (q329: quantile selection —
    * judged a q326 duplicate): this is the moment-based normal
    * model, no quantile selection anywhere. Exactness: integer
    * moment forms throughout; d̄ and LT are exact-integer ratios;
    * σ_d and √LT are the two pinned sqrts; ss/ROP are fixed-shape
    * double arithmetic over those, r6.
    *
    * Scale shape: demand collapses to the brand×day grid (dense via
    * a generated spine crossed with the bounded brand list); lag
    * moments collapse per brand; one broadcast join stitches them. */
  def q381(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).select($"p_partkey", $"p_brand")),
        $"l_partkey" === $"p_partkey")
      .join(Tables.orders(s, d).select($"o_orderkey",
          graft.Fx.epochDay($"o_orderdate").as("oday")),
        $"l_orderkey" === $"o_orderkey")
      .select($"p_brand".as("brand"), graft.Fx.epochDay($"l_shipdate").as("sday"),
        $"l_quantity".cast("long").as("q"), $"oday")
      .transform(graft.Fx.materialize) // demand grid + lag moments + span
    val sold = li.groupBy($"brand", $"sday").agg(sum($"q").as("q"))
    val spine = li.agg(min($"sday").as("lo"), max($"sday").as("hi"))
      .select(explode(sequence($"lo", $"hi")).as("sday"))
      .crossJoin(broadcast(li.select($"brand").distinct()))
    val dem = spine.join(sold, Seq("brand", "sday"), "left_outer")
      .select($"brand", coalesce($"q", lit(0L)).as("q"))
      .groupBy($"brand")
      .agg(count(lit(1)).as("nd"), sum($"q").as("sq"),
        sum(expr("cast(q as decimal(38,0)) * q")).as("sqq"))
    // lead time from non-negative lags only (stated: the synthetic
    // data ships some lines before their order date; a negative lag
    // is a data artifact, not a lead time)
    val lt = li.select($"brand", ($"sday" - $"oday").as("lag"))
      .filter($"lag" >= 0L)
      .groupBy($"brand")
      .agg(count(lit(1)).as("nl"), sum($"lag").as("sl"))
    dem.join(lt, "brand")
      .select($"brand", $"nd".as("n_days"),
        expr("(cast(sq as decimal(38,0)) * 1000000) div nd").as("dbar_micro"),
        expr("(cast(sl as decimal(38,0)) * 1000000) div nl").as("lt_micro"),
        sqrt(expr(
          """cast(nd * sqq - cast(sq as decimal(38,0)) * sq as double)
             / cast(cast(nd as decimal(38,0)) * (nd - 1) as double)"""))
          .as("sigma"),
        ($"sl".cast("double") / $"nl".cast("double")).as("ltd"),
        ($"sq".cast("double") / $"nd".cast("double")).as("dbar"))
      .select($"brand", $"n_days", $"dbar_micro", $"lt_micro",
        graft.Fx.r6($"sigma").as("sigma_d"),
        graft.Fx.r6(lit(1.645) * $"sigma" * sqrt($"ltd")).as("safety_stock"),
        graft.Fx.r6($"dbar" * $"ltd" + lit(1.645) * $"sigma" * sqrt($"ltd"))
          .as("reorder_point"))
      .orderBy($"brand")
  }

  val q381Sql: String = {
    val sigma = "sqrt(CAST(nd * sqq - sq * sq AS DOUBLE) / CAST(nd * (nd - 1) AS DOUBLE))"
    val ltd = "CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE)"
    val dbar = "CAST(sq AS DOUBLE) / CAST(nd AS DOUBLE)"
    s"""WITH li AS MATERIALIZED (
       |  SELECT p.p_brand AS brand,
       |    CAST(l.l_shipdate AS DATE) - DATE '1970-01-01' AS sday,
       |    CAST(l.l_quantity AS BIGINT) AS q,
       |    CAST(o.o_orderdate AS DATE) - DATE '1970-01-01' AS oday
       |  FROM lineitem l
       |  JOIN part p ON l.l_partkey = p.p_partkey
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey),
       |sold AS (
       |  SELECT brand, sday, CAST(sum(q) AS BIGINT) AS q
       |  FROM li GROUP BY 1, 2),
       |spine AS (
       |  SELECT b.brand, s.sday
       |  FROM (SELECT unnest(generate_series((SELECT min(sday) FROM li),
       |                                      (SELECT max(sday) FROM li)))
       |          AS sday) s
       |  CROSS JOIN (SELECT DISTINCT brand FROM li) b),
       |dem AS (
       |  SELECT spine.brand, CAST(count(*) AS HUGEINT) AS nd,
       |    CAST(sum(COALESCE(sold.q, 0)) AS HUGEINT) AS sq,
       |    sum(CAST(COALESCE(sold.q, 0) AS HUGEINT) * COALESCE(sold.q, 0))
       |      AS sqq
       |  FROM spine LEFT JOIN sold
       |    ON spine.brand = sold.brand AND spine.sday = sold.sday
       |  GROUP BY spine.brand),
       |lt AS (
       |  SELECT brand, CAST(count(*) AS HUGEINT) AS nl,
       |    CAST(sum(sday - oday) AS HUGEINT) AS sl
       |  FROM li WHERE sday >= oday GROUP BY brand)
       |SELECT dem.brand, CAST(nd AS BIGINT) AS n_days,
       |  CAST((sq * 1000000) // nd AS BIGINT) AS dbar_micro,
       |  CAST((sl * 1000000) // nl AS BIGINT) AS lt_micro,
       |  ${graft.Fx.sqlR6(sigma)} AS sigma_d,
       |  ${graft.Fx.sqlR6(s"1.645 * $sigma * sqrt($ltd)")} AS safety_stock,
       |  ${graft.Fx.sqlR6(s"$dbar * $ltd + 1.645 * $sigma * sqrt($ltd)")}
       |    AS reorder_point
       |FROM dem JOIN lt ON dem.brand = lt.brand
       |ORDER BY dem.brand""".stripMargin
  }

  /** q394 — price stickiness per brand: how OFTEN does the realized
    * brand-month unit price move, and how long does a price spell
    * last? The menu-cost readout (Bils–Klenow): change_rate = months
    * with a price different from the previous observed month / months
    * with a predecessor, and mean spell length = months/(changes+1) —
    * q358 prices the LEVEL, q363 the RESPONSE; stickiness is the
    * FREQUENCY dimension rigidity models feed on. Exact: prices ride
    * q358's brand-month micro grid (stated truncation — a sub-micro
    * price move is stated equal), the change flag is an integer lag
    * comparison on the COLLAPSED cell grid (brand-partitioned window
    * over ≤ brands×months rows), and both readouts are truncating
    * micro divisions.
    *
    * Scale shape: one collapse to brand-month cells; lag + rollup on
    * the bounded grid. */
  def q394(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val wb = Window.partitionBy($"brand").orderBy($"mk")
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).select($"p_partkey", $"p_brand")),
        $"l_partkey" === $"p_partkey")
      .select($"p_brand".as("brand"),
        (year($"l_shipdate") * 12 + month($"l_shipdate")).cast("long").as("mk"),
        floor($"l_extendedprice" * 100).cast("long").as("cents"),
        $"l_quantity".cast("long").as("q"))
      .groupBy($"brand", $"mk")
      .agg(expr("(cast(sum(cents) as decimal(38,0)) * 1000000) div sum(q)")
        .as("p"))
      .withColumn("prev", lag($"p", 1).over(wb))
      .groupBy($"brand")
      .agg(count(lit(1)).as("n_months"),
        sum(($"prev".isNotNull && $"p" =!= $"prev").cast("long"))
          .as("n_changes"))
      .select($"brand", $"n_months", $"n_changes",
        expr("""(n_changes * 1000000) div
             greatest(n_months - 1, cast(1 as bigint))""")
          .as("change_rate_micro"),
        expr("(n_months * 1000000) div (n_changes + 1)")
          .as("mean_spell_micro"))
      .orderBy($"brand")
  }

  val q394Sql: String =
    """WITH bm AS (
      |  SELECT p.p_brand AS brand,
      |    year(l.l_shipdate) * 12 + month(l.l_shipdate) AS mk,
      |    (CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS HUGEINT)
      |      * 1000000) // CAST(sum(CAST(l.l_quantity AS BIGINT)) AS HUGEINT)
      |      AS p
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  GROUP BY 1, 2),
      |ch AS (
      |  SELECT brand, p, lag(p) OVER (PARTITION BY brand ORDER BY mk) AS prev
      |  FROM bm),
      |agg AS (
      |  SELECT brand, CAST(count(*) AS BIGINT) AS n_months,
      |    CAST(sum(CASE WHEN prev IS NOT NULL AND p <> prev THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_changes
      |  FROM ch GROUP BY brand)
      |SELECT brand, n_months, n_changes,
      |  CAST((n_changes * 1000000) // greatest(n_months - 1, 1) AS BIGINT)
      |    AS change_rate_micro,
      |  CAST((n_months * 1000000) // (n_changes + 1) AS BIGINT)
      |    AS mean_spell_micro
      |FROM agg ORDER BY brand""".stripMargin

  /** q423 — Fisher–Konieczny price-change synchronization: WHEN brands
    * reprice, do they move TOGETHER (menu-cost shocks hit everyone —
    * staggering vanishes) or on their own staggered clocks (Calvo)?
    * Per month, the fraction r_t of brands (observed in t−1 and t)
    * whose q394 unit price changed; FK = √(Var_t(r_t)/(r̄(1−r̄))) ∈
    * [0,1] — 0 when each month changes the same pooled share
    * (perfectly staggered), 1 when months are all-or-nothing
    * (perfectly synchronized). The CROSS-SECTION timing question
    * q394's per-brand frequency and q358's price level both ignore.
    * Exact: change flags are integer price-grid comparisons; r_t and
    * r̄ are stated micro truncations; deviations and their squares are
    * exact DECIMAL; the one float is the final √ ratio over exact
    * integer products, r6, NULL when r̄ is degenerate (stated).
    *
    * Scale shape: one scan collapses to the brand×month grid; change
    * flags ride a per-brand lag window over that bounded grid; the
    * index is a month-grid rollup. */
  def q423(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val wb = Window.partitionBy($"brand").orderBy($"mk")
    val monthly = Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).select($"p_partkey", $"p_brand")),
        $"l_partkey" === $"p_partkey")
      .select($"p_brand".as("brand"),
        (year($"l_shipdate") * 12 + month($"l_shipdate")).cast("long").as("mk"),
        floor($"l_extendedprice" * 100).cast("long").as("cents"),
        $"l_quantity".cast("long").as("q"))
      .groupBy($"brand", $"mk")
      .agg(expr("(cast(sum(cents) as decimal(38,0)) * 1000000) div sum(q)")
        .as("p"))
      .withColumn("prev", lag($"p", 1).over(wb))
      .filter($"prev".isNotNull)
      .groupBy($"mk")
      .agg(sum(($"p" =!= $"prev").cast("long")).as("x"),
        count(lit(1)).as("nb"))
      .withColumn("r", expr("(x * 1000000) div nb"))
      .transform(Fx.materialize)
    val tot = monthly.agg(count(lit(1)).as("t"), sum($"x").as("sx"),
        sum($"nb").as("sn"))
      .withColumn("rbar", expr("(sx * 1000000) div sn"))
    val sd = monthly.crossJoin(broadcast(tot))
      .select(($"r" - $"rbar").as("dev"))
      .agg(sum(expr("cast(dev as decimal(38,0)) * dev")).as("sd2"))
    val peak = monthly.orderBy($"r".desc, $"mk").limit(1)
      .select($"mk".as("peak_mk"), $"r".as("peak_rate_micro"))
    tot.crossJoin(broadcast(sd)).crossJoin(broadcast(peak))
      .select($"t".as("t_months"), $"sx".as("sum_changes"),
        $"sn".as("sum_pairs"), $"rbar".as("pooled_micro"),
        when($"rbar" > 0L && $"rbar" < 1000000L,
          r6(sqrt($"sd2".cast("double") / ($"t".cast("double") *
            expr("cast(rbar * (1000000 - rbar) as double)")))))
          .as("fk_index"),
        $"peak_mk", $"peak_rate_micro")
  }

  val q423Sql: String =
    s"""WITH bm AS (
       |  SELECT p.p_brand AS brand,
       |    year(l.l_shipdate) * 12 + month(l.l_shipdate) AS mk,
       |    (CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS HUGEINT)
       |      * 1000000) // CAST(sum(CAST(l.l_quantity AS BIGINT)) AS HUGEINT)
       |      AS p
       |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
       |  GROUP BY 1, 2),
       |ch AS (
       |  SELECT brand, mk, p,
       |    lag(p) OVER (PARTITION BY brand ORDER BY mk) AS prev
       |  FROM bm),
       |monthly AS MATERIALIZED (
       |  SELECT mk,
       |    CAST(sum(CASE WHEN p <> prev THEN 1 ELSE 0 END) AS BIGINT) AS x,
       |    CAST(count(*) AS BIGINT) AS nb,
       |    (CAST(sum(CASE WHEN p <> prev THEN 1 ELSE 0 END) AS BIGINT)
       |      * 1000000) // CAST(count(*) AS BIGINT) AS r
       |  FROM ch WHERE prev IS NOT NULL GROUP BY mk),
       |tot AS (
       |  SELECT CAST(count(*) AS BIGINT) AS t, CAST(sum(x) AS BIGINT) AS sx,
       |    CAST(sum(nb) AS BIGINT) AS sn,
       |    (CAST(sum(x) AS BIGINT) * 1000000) // CAST(sum(nb) AS BIGINT)
       |      AS rbar
       |  FROM monthly),
       |sd AS (
       |  SELECT sum(CAST(m.r - tot.rbar AS HUGEINT) * (m.r - tot.rbar)) AS sd2
       |  FROM monthly m CROSS JOIN tot),
       |peak AS (
       |  SELECT CAST(mk AS BIGINT) AS peak_mk, r AS peak_rate_micro
       |  FROM monthly ORDER BY r DESC, mk LIMIT 1)
       |SELECT tot.t AS t_months, tot.sx AS sum_changes, tot.sn AS sum_pairs,
       |  tot.rbar AS pooled_micro,
       |  CASE WHEN tot.rbar > 0 AND tot.rbar < 1000000 THEN
       |    ${Fx.sqlR6("sqrt(CAST(sd.sd2 AS DOUBLE) / (CAST(tot.t AS DOUBLE)" +
         " * CAST(tot.rbar * (1000000 - tot.rbar) AS DOUBLE)))")}
       |  END AS fk_index,
       |  peak.peak_mk, peak.peak_rate_micro
       |FROM tot CROSS JOIN sd CROSS JOIN peak""".stripMargin

  /** q390 — chain-ladder ULTIMATE forecast: q377 estimated how
    * cohorts develop; this completes each IMMATURE cohort to its
    * projected dev-6 revenue — ultimate = cum_L · Π_{e=L..5} f_e,
    * the triangle's actual payoff (the "how much is still coming"
    * number a revenue planner books). The completion products chain
    * on the micro grid with a stated per-step truncation
    * F_L = (f_L · F_{L+1}) div 10⁶ (F_6 = 10⁶) — the q91 iterative
    * re-rounding discipline, mirrored step-for-step by a recursive
    * CTE in the oracle; the ≤ 6-entry chain folds on the driver (a
    * bounded-grid fold, the house's stated exception). A cohort
    * whose chain lacks an estimated factor drops (stated).
    *
    * Scale shape: the shared triangle + one ≤6-row collect; the
    * per-cohort completion is a broadcast join on latest dev. */
  def q390(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tri = devTriangle(s, d)
    val mx = maxShipMk(s, d)
    val factors = devFactors(s, tri, mx)
      .filter($"factor_micro".isNotNull)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap // ≤ 6 rows
    // completion chain from each dev to 6 (stated truncation per step)
    val comp = scala.collection.mutable.Map(6L -> 1000000L)
    (0 to 5).reverse.foreach { dv =>
      for (f <- factors.get(dv.toLong); nx <- comp.get(dv + 1L))
        comp(dv.toLong) = f * nx / 1000000L
    }
    val compDf = comp.toSeq.map { case (dv, fc) => (dv, fc) }
      .toDF("ldev", "comp_micro")
    val latest = tri.groupBy($"cohort").agg(max($"dev").as("ldev"))
      .join(tri.select($"cohort", $"dev".as("ldev"), $"cum"),
        Seq("cohort", "ldev"))
      .crossJoin(broadcast(mx))
      .filter($"mx" - $"cohort" < 6L) // immature cohorts only
    latest.join(broadcast(compDf), "ldev")
      .select(expr("cast((cohort - 1) div 12 as int)").as("y"),
        expr("cast((cohort - 1) % 12 + 1 as int)").as("m"),
        $"ldev".as("latest_dev"), $"cum".as("cum_cents"),
        expr("(cast(cum as decimal(38,0)) * comp_micro) div 1000000")
          .as("ultimate_cents"))
      .orderBy($"y", $"m")
  }

  val q390Sql: String =
    """WITH RECURSIVE tri AS MATERIALIZED (
      |  SELECT cohort, dev, CAST(sum(cents) AS BIGINT) AS inc,
      |    CAST(sum(sum(cents)) OVER (PARTITION BY cohort ORDER BY dev)
      |      AS BIGINT) AS cum
      |  FROM (
      |    SELECT year(o.o_orderdate) * 12 + month(o.o_orderdate) AS cohort,
      |      (year(l.l_shipdate) * 12 + month(l.l_shipdate))
      |        - (year(o.o_orderdate) * 12 + month(o.o_orderdate)) AS dev,
      |      CAST(floor(l.l_extendedprice * 100) AS BIGINT) AS cents
      |    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey) t
      |  WHERE dev BETWEEN 0 AND 6
      |  GROUP BY cohort, dev),
      |mx AS (
      |  SELECT max(year(l_shipdate) * 12 + month(l_shipdate)) AS mx
      |  FROM lineitem),
      |fac AS (
      |  SELECT dev,
      |    (CAST(sum(cd1) AS HUGEINT) * 1000000) // CAST(sum(cd) AS HUGEINT)
      |      AS f
      |  FROM (
      |    SELECT cur.dev, cur.cum AS cd, nxt.cum AS cd1
      |    FROM tri cur
      |    JOIN tri nxt ON nxt.cohort = cur.cohort AND nxt.dev = cur.dev + 1
      |    CROSS JOIN mx
      |    WHERE cur.cohort <= mx.mx - (cur.dev + 1)) j
      |  GROUP BY dev HAVING sum(cd) > 0),
      |comp AS (
      |  SELECT CAST(6 AS BIGINT) AS ldev, CAST(1000000 AS HUGEINT) AS c
      |  UNION ALL
      |  SELECT c.ldev - 1, (fac.f * c.c) // 1000000
      |  FROM comp c JOIN fac ON fac.dev = c.ldev - 1
      |  WHERE c.ldev > 0),
      |latest AS (
      |  SELECT tri.cohort, tri.dev AS ldev, tri.cum
      |  FROM tri
      |  JOIN (SELECT cohort, max(dev) AS md FROM tri GROUP BY cohort) m
      |    ON tri.cohort = m.cohort AND tri.dev = m.md
      |  CROSS JOIN mx
      |  WHERE mx.mx - tri.cohort < 6)
      |SELECT CAST((l.cohort - 1) // 12 AS INT) AS y,
      |  CAST((l.cohort - 1) % 12 + 1 AS INT) AS m,
      |  l.ldev AS latest_dev, l.cum AS cum_cents,
      |  CAST((CAST(l.cum AS HUGEINT) * comp.c) // 1000000 AS BIGINT)
      |    AS ultimate_cents
      |FROM latest l JOIN comp ON l.ldev = comp.ldev
      |ORDER BY y, m""".stripMargin

  /** q404 — Bornhuetter–Ferguson reserving over the q377/q390 shipment
    * triangle: ultimate_BF = shipped-to-date + prior-ultimate ×
    * (unshipped share), where the unshipped share comes from the
    * chain-ladder completion factor (1 − 1/CDF = (comp − 1e6)/comp in
    * micro space) and the PRIOR ultimate is the cohort's booked order
    * value (Σ o_totalprice — the exposure the ledger already knows) ×
    * a stated ELR of 1. The actuarial complement of q390: chain-ladder
    * multiplies the observed cum (volatile for young cohorts where
    * CDF is large); BF adds the expected-unreported instead, so a
    * cohort with one early shipment doesn't project absurdly. Exact:
    * the completion chain is q390's stated per-step truncation; prior
    * cents are grid-first sums; the BF addend is one DECIMAL
    * truncating multiply-divide per cohort.
    *
    * Scale shape: the triangle collapses to (cohort, dev) cells; the
    * prior is one orders aggregate on the bounded cohort grid;
    * everything after is grid-sized joins + a driver fold over ≤ 6
    * factors. */
  def q404(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tri = devTriangle(s, d)
    val mx = maxShipMk(s, d)
    val factors = devFactors(s, tri, mx)
      .filter($"factor_micro".isNotNull)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap // ≤ 6 rows
    val comp = scala.collection.mutable.Map(6L -> 1000000L)
    (0 to 5).reverse.foreach { dv =>
      for (f <- factors.get(dv.toLong); nx <- comp.get(dv + 1L))
        comp(dv.toLong) = f * nx / 1000000L
    }
    val compDf = comp.toSeq.map { case (dv, fc) => (dv, fc) }
      .toDF("ldev", "comp_micro")
    // prior cents are GRID-FIRST sums (per-row cents, then exact long
    // sum) — a double sum-then-grid can flip a cent against DuckDB's
    // DECIMAL sum at the 0.5 boundary at large SF (q407 discipline)
    val prior = Tables.orders(s, d)
      .groupBy((year($"o_orderdate") * 12 + month($"o_orderdate")).as("cohort"))
      .agg(sum(floor($"o_totalprice" * 100 + lit(0.5)).cast("long"))
        .as("prior_cents"))
    val latest = tri.groupBy($"cohort").agg(max($"dev").as("ldev"))
      .join(tri.select($"cohort", $"dev".as("ldev"), $"cum"), Seq("cohort", "ldev"))
      .crossJoin(broadcast(mx))
      .filter($"mx" - $"cohort" < 6L) // immature cohorts only
    latest.join(broadcast(compDf), "ldev")
      .join(prior, "cohort")
      .select(expr("cast((cohort - 1) div 12 as int)").as("y"),
        expr("cast((cohort - 1) % 12 + 1 as int)").as("m"),
        $"ldev".as("latest_dev"), $"cum".as("cum_cents"), $"prior_cents",
        ($"cum" + expr(
          """(cast(prior_cents as decimal(38,0)) * (comp_micro - 1000000))
             div comp_micro""")).as("ultimate_bf_cents"))
      .orderBy($"y", $"m")
  }

  val q404Sql: String =
    """WITH RECURSIVE tri AS MATERIALIZED (
      |  SELECT cohort, dev, CAST(sum(cents) AS BIGINT) AS inc,
      |    CAST(sum(sum(cents)) OVER (PARTITION BY cohort ORDER BY dev)
      |      AS BIGINT) AS cum
      |  FROM (
      |    SELECT year(o.o_orderdate) * 12 + month(o.o_orderdate) AS cohort,
      |      (year(l.l_shipdate) * 12 + month(l.l_shipdate))
      |        - (year(o.o_orderdate) * 12 + month(o.o_orderdate)) AS dev,
      |      CAST(floor(l.l_extendedprice * 100) AS BIGINT) AS cents
      |    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey) t
      |  WHERE dev BETWEEN 0 AND 6
      |  GROUP BY cohort, dev),
      |mx AS (
      |  SELECT max(year(l_shipdate) * 12 + month(l_shipdate)) AS mx
      |  FROM lineitem),
      |fac AS (
      |  SELECT dev,
      |    (CAST(sum(cd1) AS HUGEINT) * 1000000) // CAST(sum(cd) AS HUGEINT)
      |      AS f
      |  FROM (
      |    SELECT cur.dev, cur.cum AS cd, nxt.cum AS cd1
      |    FROM tri cur
      |    JOIN tri nxt ON nxt.cohort = cur.cohort AND nxt.dev = cur.dev + 1
      |    CROSS JOIN mx
      |    WHERE cur.cohort <= mx.mx - (cur.dev + 1)) j
      |  GROUP BY dev HAVING sum(cd) > 0),
      |comp AS (
      |  SELECT CAST(6 AS BIGINT) AS ldev, CAST(1000000 AS HUGEINT) AS c
      |  UNION ALL
      |  SELECT c.ldev - 1, (fac.f * c.c) // 1000000
      |  FROM comp c JOIN fac ON fac.dev = c.ldev - 1
      |  WHERE c.ldev > 0),
      |prior AS (
      |  SELECT year(o_orderdate) * 12 + month(o_orderdate) AS cohort,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS prior_cents
      |  FROM orders GROUP BY 1),
      |latest AS (
      |  SELECT tri.cohort, tri.dev AS ldev, tri.cum
      |  FROM tri
      |  JOIN (SELECT cohort, max(dev) AS md FROM tri GROUP BY cohort) m
      |    ON tri.cohort = m.cohort AND tri.dev = m.md
      |  CROSS JOIN mx
      |  WHERE mx.mx - tri.cohort < 6)
      |SELECT CAST((l.cohort - 1) // 12 AS INT) AS y,
      |  CAST((l.cohort - 1) % 12 + 1 AS INT) AS m,
      |  l.ldev AS latest_dev, l.cum AS cum_cents, p.prior_cents,
      |  l.cum + CAST((CAST(p.prior_cents AS HUGEINT) * (comp.c - 1000000))
      |    // comp.c AS BIGINT) AS ultimate_bf_cents
      |FROM latest l
      |JOIN comp ON l.ldev = comp.ldev
      |JOIN prior p ON l.cohort = p.cohort
      |ORDER BY y, m""".stripMargin

  /** q405 — robust distribution shape per order status: Bowley's
    * quartile skewness (Q3+Q1−2·Q2)/(Q3−Q1) and Moors' octile
    * kurtosis ((E7−E5)+(E3−E1))/(Q3−Q1) — the outlier-immune
    * complements of q309's moment-based skew/kurtosis, which a single
    * mega-order can drag arbitrarily (both statistics here depend
    * only on the middle of the order-value distribution; Moors ≈ 1.23
    * for a normal). Determinism: each octile is the q31 precedent —
    * Spark `percentile` ≡ DuckDB `quantile_cont` (same linear
    * interpolation), pinned to the r4 grid BEFORE the ratios, so the
    * ratio arithmetic runs on bit-identical doubles in a fixed
    * mirrored tree; final ratios r6.
    *
    * Scale shape: one grouped exact-percentile aggregate (Spark's
    * percentile is a per-group sort-based aggregate over the 3
    * status groups — at 100 TB swap in the quantile-sketch q157 path;
    * this readout pins the exact semantics), then scalar math. */
  def q405(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    def oct(p: Double, nm: String) =
      r4(expr(s"percentile(o_totalprice, $p)")).as(nm)
    Tables.orders(s, d)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"),
        oct(0.125, "e1"), oct(0.25, "q1"), oct(0.375, "e3"),
        oct(0.5, "q2"), oct(0.625, "e5"), oct(0.75, "q3"),
        oct(0.875, "e7"))
      .select($"o_orderstatus", $"n",
        $"q1", $"q2", $"q3",
        r6(($"q3" + $"q1" - lit(2.0) * $"q2") / ($"q3" - $"q1"))
          .as("bowley_skew"),
        r6((($"e7" - $"e5") + ($"e3" - $"e1")) / ($"q3" - $"q1"))
          .as("moors_kurtosis"))
      .orderBy($"o_orderstatus")
  }

  val q405Sql: String = {
    def oct(p: String, nm: String) =
      s"${sqlR4(s"quantile_cont(o_totalprice, $p)")} AS $nm"
    s"""WITH o AS (
       |  SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       |    ${oct("0.125", "e1")}, ${oct("0.25", "q1")},
       |    ${oct("0.375", "e3")}, ${oct("0.5", "q2")},
       |    ${oct("0.625", "e5")}, ${oct("0.75", "q3")},
       |    ${oct("0.875", "e7")}
       |  FROM orders GROUP BY o_orderstatus)
       |SELECT o_orderstatus, n, q1, q2, q3,
       |  ${sqlR6("(q3 + q1 - 2.0 * q2) / (q3 - q1)")} AS bowley_skew,
       |  ${sqlR6("((e7 - e5) + (e3 - e1)) / (q3 - q1)")} AS moors_kurtosis
       |FROM o ORDER BY o_orderstatus""".stripMargin
  }

  /** q387 — generalized-entropy GE(2) inequality decomposition: how
    * much of line-revenue inequality lives BETWEEN brands vs WITHIN
    * them? GE(2) = ½(N·Σy²/S² − 1) is the half-squared-CV member of
    * the generalized-entropy family — the one inequality index that
    * decomposes additively WITHOUT logarithms (Gini does not
    * decompose; Theil needs logs; q343's HHI concentrates on shares,
    * not dispersion), so the between/within split is exact here:
    * between uses the A = Σ_g S_g²/n_g form (per-group floor
    * division, q364's decimal-sum discipline), within is the
    * difference of the two stated micro truncations — additivity
    * holds by construction. Output: total/between/within in micro
    * (×10⁶, the ½ folded into a 5·10⁵ factor) plus the between
    * share.
    *
    * Scale shape: one scan with map-side combine to per-brand
    * (n, S, Σy²); scalar arithmetic after. */
  def q387(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val per = Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).select($"p_partkey", $"p_brand")),
        $"l_partkey" === $"p_partkey")
      .select($"p_brand".as("g"),
        floor($"l_extendedprice" * 100).cast("long").as("y"))
      .groupBy($"g")
      .agg(count(lit(1)).as("ng"), sum($"y").as("sg"),
        sum(expr("cast(y as decimal(38,0)) * y")).as("yy"))
    per.agg(count(lit(1)).as("k"), sum($"ng").as("nn"), sum($"sg").as("ss"),
        sum($"yy").as("syy"),
        sum(expr(
          "cast((cast(sg as decimal(38,0)) * sg) div ng as decimal(38,0))"))
          .as("a"))
      .select($"k", $"nn".as("n_lines"),
        expr("""((cast(nn as decimal(38,0)) * syy
             - cast(ss as decimal(38,0)) * ss) * 500000)
             div (cast(ss as decimal(38,0)) * ss)""").as("ge2_total_micro"),
        expr("""((cast(nn as decimal(38,0)) * a
             - cast(ss as decimal(38,0)) * ss) * 500000)
             div (cast(ss as decimal(38,0)) * ss)""").as("ge2_between_micro"))
      .withColumn("ge2_within_micro",
        $"ge2_total_micro" - $"ge2_between_micro")
      .withColumn("between_share_micro",
        when($"ge2_total_micro" > 0, expr(
          "(ge2_between_micro * 1000000) div ge2_total_micro")))
  }

  val q387Sql: String =
    """WITH per AS (
      |  SELECT p.p_brand AS g, CAST(count(*) AS BIGINT) AS ng,
      |    CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |      AS sg,
      |    sum(CAST(CAST(floor(l.l_extendedprice * 100) AS BIGINT) AS HUGEINT)
      |      * CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS yy
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  GROUP BY 1),
      |mo AS (
      |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ng) AS HUGEINT) AS nn,
      |    CAST(sum(sg) AS HUGEINT) AS ss, CAST(sum(yy) AS HUGEINT) AS syy,
      |    CAST(sum((CAST(sg AS HUGEINT) * sg) // ng) AS HUGEINT) AS a
      |  FROM per),
      |fin AS (
      |  SELECT k, CAST(nn AS BIGINT) AS n_lines,
      |    CAST(((nn * syy - ss * ss) * 500000) // (ss * ss) AS BIGINT)
      |      AS ge2_total_micro,
      |    CAST(((nn * a - ss * ss) * 500000) // (ss * ss) AS BIGINT)
      |      AS ge2_between_micro
      |  FROM mo)
      |SELECT k, n_lines, ge2_total_micro, ge2_between_micro,
      |  ge2_total_micro - ge2_between_micro AS ge2_within_micro,
      |  CASE WHEN ge2_total_micro > 0 THEN
      |    CAST((ge2_between_micro * 1000000) // ge2_total_micro AS BIGINT)
      |  END AS between_share_micro
      |FROM fin""".stripMargin

  /** q388 — price-volume-mix bridge between the first and last ship
    * YEARS (stated endpoints): per brand trading in both, the revenue
    * delta decomposes as ΔR̂ = (p₁−p₀)·q₀ [price] + (q₁−q₀)·p₀
    * [volume] + (p₁−p₀)(q₁−q₀) [cross] — the FP&A waterfall that
    * NAMES the delta's causes, where q358's indexes only track the
    * price level and q363 only the response. Exactness: unit prices
    * land on q358's micro grid (stated truncation), quantities are
    * integers, and the three effects are integer products that sum
    * EXACTLY to ΔR̂ = p₁q₁ − p₀q₀ on that grid (the identity holds by
    * construction — an additivity a float bridge can't promise); the
    * raw cent delta rides along for reference.
    *
    * Scale shape: one collapse to brand×year cells (the scan prunes
    * to the two endpoint years at the parquet reader), a self-join on
    * brand, scalar arithmetic per brand. */
  def q388(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val years = Tables.lineitem(s, d)
      .agg(min(year($"l_shipdate")).as("y0"), max(year($"l_shipdate")).as("y1"))
    val by = Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).select($"p_partkey", $"p_brand")),
        $"l_partkey" === $"p_partkey")
      .crossJoin(broadcast(years))
      .filter(year($"l_shipdate") === $"y0" || year($"l_shipdate") === $"y1")
      .select($"p_brand".as("brand"),
        (year($"l_shipdate") === $"y1").cast("int").as("period"),
        floor($"l_extendedprice" * 100).cast("long").as("cents"),
        $"l_quantity".cast("long").as("q"))
      .groupBy($"brand", $"period")
      .agg(sum($"cents").as("c"), sum($"q").as("q"))
      .select($"brand", $"period",
        expr("(cast(c as decimal(38,0)) * 1000000) div q").as("p"),
        $"q", $"c")
      // materialized: the ≤ brand×2 grid feeds both period splits —
      // without it each split recomputes the lineitem⋈part scan
      .transform(graft.Fx.materialize)
    val p0 = by.filter($"period" === 0)
      .select($"brand", $"p".as("pp0"), $"q".as("q0"), $"c".as("c0"))
    val p1 = by.filter($"period" === 1)
      .select($"brand", $"p".as("pp1"), $"q".as("q1"), $"c".as("c1"))
    p0.join(p1, "brand")
      .select($"brand",
        expr("(pp1 - pp0) * cast(q0 as decimal(38,0))").as("price_effect"),
        expr("(q1 - q0) * cast(pp0 as decimal(38,0))").as("volume_effect"),
        expr("(pp1 - pp0) * cast(q1 - q0 as decimal(38,0))").as("cross_effect"),
        expr("pp1 * cast(q1 as decimal(38,0)) - pp0 * q0").as("delta_hat"),
        ($"c1" - $"c0").as("delta_cents"))
      .select($"brand",
        $"price_effect".cast("long").as("price_effect"),
        $"volume_effect".cast("long").as("volume_effect"),
        $"cross_effect".cast("long").as("cross_effect"),
        $"delta_hat".cast("long").as("delta_hat"),
        $"delta_cents")
      .orderBy($"brand")
  }

  val q388Sql: String =
    """WITH yr AS (
      |  SELECT min(year(l_shipdate)) AS y0, max(year(l_shipdate)) AS y1
      |  FROM lineitem),
      |by0 AS (
      |  SELECT p.p_brand AS brand,
      |    CAST(year(l.l_shipdate) = yr.y1 AS INT) AS period,
      |    CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |      AS c,
      |    CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q
      |  FROM lineitem l
      |  JOIN part p ON l.l_partkey = p.p_partkey
      |  CROSS JOIN yr
      |  WHERE year(l.l_shipdate) = yr.y0 OR year(l.l_shipdate) = yr.y1
      |  GROUP BY 1, 2),
      |pv AS (
      |  SELECT brand, period, (CAST(c AS HUGEINT) * 1000000) // q AS p, q, c
      |  FROM by0)
      |SELECT a.brand,
      |  CAST((b.p - a.p) * a.q AS BIGINT) AS price_effect,
      |  CAST((b.q - a.q) * a.p AS BIGINT) AS volume_effect,
      |  CAST((b.p - a.p) * (b.q - a.q) AS BIGINT) AS cross_effect,
      |  CAST(b.p * b.q - a.p * a.q AS BIGINT) AS delta_hat,
      |  b.c - a.c AS delta_cents
      |FROM pv a JOIN pv b ON a.brand = b.brand AND a.period = 0 AND b.period = 1
      |ORDER BY a.brand""".stripMargin

  /** q417 — Taylor's law (fluctuation scaling) across brands: does
    * the VARIANCE of daily demand scale as a power of its MEAN,
    * v ∝ m^b? The ecology-grade dispersion law: b = 1 is Poisson
    * (independent purchases), b → 2 is synchronized/bursty demand —
    * a structural readout about the WHOLE portfolio that q368's
    * per-series Fano factor (a single v/m ratio) and q346's price
    * dispersion can't see, because the law only exists ACROSS the
    * brand ensemble. Fit: ln v = ln a + b·ln m by OLS over the
    * ≤25-point brand grid. Exact lineage: per-brand daily-quantity
    * moments are exact integers (nd·Σq² − (Σq)² over the observed-day
    * grid — zero-variance brands excluded, stated); each (x, y) point
    * is ln of one exact-integer ratio (identical trees both engines);
    * only the 25-term OLS sums are engine-ordered, 1e-15 under r6.
    *
    * Scale shape: one scan collapses to brand×day cells (map-side
    * combine), one per-brand moment rollup, OLS over the bounded
    * brand grid. */
  def q417(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val daily = Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).select($"p_partkey", $"p_brand")),
        $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand".as("brand"), epochDay($"l_shipdate").as("day"))
      .agg(sum($"l_quantity".cast("long")).as("q"))
    val pts = daily.groupBy($"brand")
      .agg(count(lit(1)).as("nd"), sum($"q").as("sq"),
        sum(expr("cast(q as decimal(38,0)) * q")).as("sqq"))
      .withColumn("vnum", expr("nd * sqq - cast(sq as decimal(38,0)) * sq"))
      .filter($"vnum" > 0)
      .withColumn("x", log($"sq".cast("double") / $"nd".cast("double")))
      .withColumn("y", log($"vnum".cast("double") /
        ($"nd".cast("double") * $"nd".cast("double"))))
    pts.agg(count(lit(1)).as("k"), sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"x").as("sxx"), sum($"x" * $"y").as("sxy"))
      .withColumn("b", ($"k".cast("double") * $"sxy" - $"sx" * $"sy") /
        ($"k".cast("double") * $"sxx" - $"sx" * $"sx"))
      .select($"k".as("n_brands"), r6($"b").as("taylor_b"),
        r6(($"sy" - $"b" * $"sx") / $"k".cast("double")).as("ln_a"),
        ($"b" > lit(1.0)).cast("int").as("superpoissonian"))
  }

  val q417Sql: String =
    s"""WITH daily AS (
       |  SELECT p.p_brand AS brand,
       |    CAST(l.l_shipdate AS DATE) - DATE '1970-01-01' AS day,
       |    CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q
       |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
       |  GROUP BY 1, 2),
       |pts AS (
       |  SELECT brand, CAST(count(*) AS BIGINT) AS nd,
       |    CAST(sum(q) AS BIGINT) AS sq,
       |    sum(CAST(q AS HUGEINT) * q) AS sqq
       |  FROM daily GROUP BY 1),
       |xy AS (
       |  SELECT ln(CAST(sq AS DOUBLE) / CAST(nd AS DOUBLE)) AS x,
       |    ln(CAST(nd * sqq - CAST(sq AS HUGEINT) * sq AS DOUBLE)
       |      / (CAST(nd AS DOUBLE) * CAST(nd AS DOUBLE))) AS y
       |  FROM pts WHERE nd * sqq - CAST(sq AS HUGEINT) * sq > 0),
       |mo AS (
       |  SELECT CAST(count(*) AS BIGINT) AS k, sum(x) AS sx, sum(y) AS sy,
       |    sum(x * x) AS sxx, sum(x * y) AS sxy
       |  FROM xy),
       |f AS (
       |  SELECT k, sx, sy,
       |    (CAST(k AS DOUBLE) * sxy - sx * sy)
       |      / (CAST(k AS DOUBLE) * sxx - sx * sx) AS b
       |  FROM mo)
       |SELECT k AS n_brands, ${Fx.sqlR6("b")} AS taylor_b,
       |  ${Fx.sqlR6("(sy - b * sx) / CAST(k AS DOUBLE)")} AS ln_a,
       |  CAST(b > 1.0 AS INT) AS superpoissonian
       |FROM f""".stripMargin

  /** q427 — synthetic control with placebo inference (Abadie et al.,
    * nearest-donor variant) on the brand monthly-revenue panel: did
    * the TREATED brand's revenue move after the calendar midpoint
    * relative to what its peers predict? The counterfactual for each
    * brand is the unweighted mean of its 4 NEAREST donors — nearest
    * in pre-period trajectory (squared-distance over the zero-filled
    * brand×month cents grid, a DECIMAL integer; ties broken by brand)
    * — and the effect is the post-period gap sum. INFERENCE is
    * Abadie's permutation test run in full: EVERY brand gets the
    * identical placebo treatment, and the treated brand's rank by
    * |effect| among all brands is the exact placebo p-value's
    * numerator — the panel-counterfactual answer q281's 2×2 DiD
    * (parallel-trends assumed, no donor selection) and q288's CEM
    * (cross-sectional covariates, no time) can't give. Everything is
    * exact: the stated treated brand is the lexicographic minimum,
    * the cut is the q281 midpoint rule, and the gap is kept in
    * QUARTER-cents (4·treated − Σ₄ donors) so no division ever runs —
    * att is a pure integer sum, rank a total order.
    *
    * Scale shape: one scan collapses to the bounded brand×month grid
    * (zero-filled via a sequence explode); the donor-distance matrix
    * is brands² × months on that grid; everything downstream —
    * nearest-4 window, synth join, rank — is grid-sized. Stated
    * precondition: ≥ 5 brands in the panel (TPC-H ships 25), so every
    * unit has its full 4 donors. */
  def q427(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val raw = Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).select($"p_partkey", $"p_brand")),
        $"l_partkey" === $"p_partkey")
      .select($"p_brand".as("brand"),
        (year($"l_shipdate") * 12 + month($"l_shipdate")).cast("long").as("mk"),
        floor($"l_extendedprice" * 100).cast("long").as("cents"))
      .groupBy($"brand", $"mk").agg(sum($"cents").as("cents"))
      .transform(Fx.materialize)
    val bounds = raw.agg(min($"mk").as("m0"), max($"mk").as("m1"))
      .select($"m0", $"m1", expr("(m0 + m1) div 2").as("cut"))
    val months = bounds.select(explode(sequence($"m0", $"m1")).as("mk"), $"cut")
    val grid = raw.select($"brand").distinct()
      .crossJoin(broadcast(months))
      .join(raw, Seq("brand", "mk"), "left")
      .select($"brand", $"mk", $"cut", coalesce($"cents", lit(0L)).as("cents"))
      .transform(Fx.materialize) // pre distances AND post outcomes
    val pre = grid.filter($"mk" <= $"cut")
    val dist = pre.as("t")
      .join(pre.as("o"), $"t.mk" === $"o.mk" && $"t.brand" =!= $"o.brand")
      .select($"t.brand".as("tb"), $"o.brand".as("ob"),
        ($"t.cents" - $"o.cents").as("df"))
      .groupBy($"tb", $"ob")
      .agg(sum(expr("cast(df as decimal(38,0)) * df")).as("d2"))
    val donors = dist
      .withColumn("rn", row_number().over(
        Window.partitionBy($"tb").orderBy($"d2", $"ob")))
      .filter($"rn" <= 4).select($"tb", $"ob")
    val post = grid.filter($"mk" > $"cut")
    val synth = donors
      .join(post.select($"brand".as("ob"), $"mk", $"cents".as("oc")), "ob")
      .groupBy($"tb", $"mk").agg(sum($"oc").as("donor_cents"))
    val att = post.select($"brand".as("tb"), $"mk", $"cents")
      .join(synth, Seq("tb", "mk"))
      .groupBy($"tb")
      .agg(sum($"cents" * 4 - $"donor_cents").as("att_qcents"))
    val treated = grid.agg(min($"brand").as("tmin"))
    att
      .withColumn("abs_rank", row_number().over(
        Window.orderBy(abs($"att_qcents").desc, $"tb")))
      .crossJoin(broadcast(treated))
      .select($"tb".as("brand"), $"att_qcents", $"abs_rank",
        ($"tb" === $"tmin").cast("int").as("is_treated"))
      .orderBy($"brand")
  }

  val q427Sql: String =
    """WITH raw AS MATERIALIZED (
      |  SELECT p.p_brand AS brand,
      |    year(l.l_shipdate) * 12 + month(l.l_shipdate) AS mk,
      |    CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  GROUP BY 1, 2),
      |bounds AS (
      |  SELECT min(mk) AS m0, max(mk) AS m1, (min(mk) + max(mk)) // 2 AS cut
      |  FROM raw),
      |months AS (
      |  SELECT unnest(generate_series(m0, m1)) AS mk, cut FROM bounds),
      |grid AS MATERIALIZED (
      |  SELECT b.brand, m.mk, m.cut, COALESCE(r.cents, 0) AS cents
      |  FROM (SELECT DISTINCT brand FROM raw) b
      |  CROSS JOIN months m
      |  LEFT JOIN raw r ON r.brand = b.brand AND r.mk = m.mk),
      |pre AS (SELECT * FROM grid WHERE mk <= cut),
      |dist AS (
      |  SELECT t.brand AS tb, o.brand AS ob,
      |    sum(CAST(t.cents - o.cents AS HUGEINT) * (t.cents - o.cents)) AS d2
      |  FROM pre t JOIN pre o ON t.mk = o.mk AND t.brand <> o.brand
      |  GROUP BY 1, 2),
      |donors AS (
      |  SELECT tb, ob FROM (
      |    SELECT tb, ob,
      |      row_number() OVER (PARTITION BY tb ORDER BY d2, ob) AS rn
      |    FROM dist) r
      |  WHERE rn <= 4),
      |post AS (SELECT * FROM grid WHERE mk > cut),
      |synth AS (
      |  SELECT d.tb, p.mk, CAST(sum(p.cents) AS BIGINT) AS donor_cents
      |  FROM donors d JOIN post p ON p.brand = d.ob
      |  GROUP BY 1, 2),
      |att AS (
      |  SELECT p.brand AS tb,
      |    CAST(sum(p.cents * 4 - s.donor_cents) AS BIGINT) AS att_qcents
      |  FROM post p JOIN synth s ON s.tb = p.brand AND s.mk = p.mk
      |  GROUP BY 1),
      |tr AS (SELECT min(brand) AS tmin FROM grid)
      |SELECT a.tb AS brand, a.att_qcents,
      |  CAST(row_number() OVER (ORDER BY abs(a.att_qcents) DESC, a.tb)
      |    AS INT) AS abs_rank,
      |  CAST(a.tb = tr.tmin AS INT) AS is_treated
      |FROM att a CROSS JOIN tr
      |ORDER BY brand""".stripMargin

  /** q430 — Bradley–Terry strength from monthly brand head-to-head
    * wins: w_ij = months in which brand i's revenue strictly beat
    * brand j's on the zero-filled brand×month cents grid (ties score
    * for neither), then two MM updates (Hunter 2004)
    * s_i ← W_i / Σ_j n_ij/(s_i+s_j) from s = 1 — the PAIRED-COMPARISON
    * strength ladder that a raw win COUNT can't give (beating strong
    * opponents must count for more; W_i is blind to whom you beat,
    * which is exactly what separates two brands with equal wins over
    * different schedules). Fixed 2 rounds, stated (the q418/q422
    * fixed-iteration precedent). Exact: wins are integer grid
    * comparisons; each MM term is the stated truncation
    * (n_ij·10¹²) div (s_i+s_j) summed exactly, each update one
    * (W_i·10¹²) div denom — every strength is an integer micro at
    * every round, both engines walking identical values; brands with
    * zero wins floor at strength 0 (stated).
    *
    * Scale shape: one scan collapses to the bounded brand×month grid
    * (q427's builder); wins are a grid self-join on month; the MM
    * rounds run on the brands² pair grid — metadata-sized joins, no
    * driver fold needed. */
  def q430(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val raw = Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).select($"p_partkey", $"p_brand")),
        $"l_partkey" === $"p_partkey")
      .select($"p_brand".as("brand"),
        (year($"l_shipdate") * 12 + month($"l_shipdate")).cast("long").as("mk"),
        floor($"l_extendedprice" * 100).cast("long").as("cents"))
      .groupBy($"brand", $"mk").agg(sum($"cents").as("cents"))
      .transform(Fx.materialize)
    val bounds = raw.agg(min($"mk").as("m0"), max($"mk").as("m1"))
    val months = bounds.select(explode(sequence($"m0", $"m1")).as("mk"))
    val grid = raw.select($"brand").distinct()
      .crossJoin(broadcast(months))
      .join(raw, Seq("brand", "mk"), "left")
      .select($"brand", $"mk", coalesce($"cents", lit(0L)).as("cents"))
      .transform(Fx.materialize)
    // ordered-pair monthly duels on the bounded grid (ties drop)
    val pairs = grid.as("i")
      .join(grid.as("o"), $"i.mk" === $"o.mk" && $"i.brand" =!= $"o.brand")
      .select($"i.brand".as("bi"), $"o.brand".as("bj"),
        ($"i.cents" > $"o.cents").cast("long").as("win"),
        ($"i.cents" =!= $"o.cents").cast("long").as("decided"))
      .groupBy($"bi", $"bj")
      .agg(sum($"win").as("w"), sum($"decided").as("n"))
      .transform(Fx.materialize) // consumed by both MM rounds
    val winTot = pairs.groupBy($"bi").agg(sum($"w").as("wins"),
      sum($"n").as("comparisons"))
    def mmRound(strengths: DataFrame): DataFrame =
      pairs
        .join(strengths.select($"brand".as("bi"), $"s".as("si")), "bi")
        .join(strengths.select($"brand".as("bj"), $"s".as("sj")), "bj")
        .groupBy($"bi")
        // a 0-0 pair contributes no term (kept as 0, not filtered, so
        // every brand stays in the round — the oracle's CASE shape)
        .agg(sum(expr("""case when si + sj > 0
            then (cast(n as decimal(38,0)) * 1000000000000) div (si + sj)
            else cast(0 as decimal(38,0)) end""")).as("denom"))
        .join(winTot, "bi")
        .select($"bi".as("brand"),
          when($"denom" > 0,
            expr("cast((cast(wins as decimal(38,0)) * 1000000000000) div denom as bigint)"))
            .otherwise(lit(0L)).as("s"))
    val s0 = grid.select($"brand").distinct()
      .select($"brand", lit(1000000L).as("s"))
    val s2 = mmRound(mmRound(s0).transform(Fx.materialize))
    winTot.select($"bi".as("brand"), $"wins", $"comparisons")
      .join(s2, "brand")
      .withColumn("rank", row_number().over(
        Window.orderBy($"s".desc, $"brand")))
      .select($"brand", $"wins", $"comparisons", $"s".as("bt_micro"), $"rank")
      .orderBy($"brand")
  }

  val q430Sql: String = {
    def round(prev: String, out: String): String =
      s"""$out AS MATERIALIZED (
         |  SELECT p.bi AS brand,
         |    CASE WHEN sum(CASE WHEN si.s + sj.s > 0
         |        THEN (CAST(p.n AS HUGEINT) * 1000000000000) // (si.s + sj.s)
         |        ELSE 0 END) > 0
         |      THEN CAST((CAST(wt.wins AS HUGEINT) * 1000000000000)
         |        // sum(CASE WHEN si.s + sj.s > 0
         |          THEN (CAST(p.n AS HUGEINT) * 1000000000000) // (si.s + sj.s)
         |          ELSE 0 END) AS BIGINT)
         |      ELSE 0 END AS s
         |  FROM pairs p
         |  JOIN $prev si ON si.brand = p.bi
         |  JOIN $prev sj ON sj.brand = p.bj
         |  JOIN wt ON wt.brand = p.bi
         |  GROUP BY p.bi, wt.wins)""".stripMargin
    s"""WITH raw AS MATERIALIZED (
       |  SELECT p.p_brand AS brand,
       |    year(l.l_shipdate) * 12 + month(l.l_shipdate) AS mk,
       |    CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT))
       |      AS BIGINT) AS cents
       |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
       |  GROUP BY 1, 2),
       |bounds AS (SELECT min(mk) AS m0, max(mk) AS m1 FROM raw),
       |months AS (SELECT unnest(generate_series(m0, m1)) AS mk FROM bounds),
       |grid AS MATERIALIZED (
       |  SELECT b.brand, m.mk, COALESCE(r.cents, 0) AS cents
       |  FROM (SELECT DISTINCT brand FROM raw) b
       |  CROSS JOIN months m
       |  LEFT JOIN raw r ON r.brand = b.brand AND r.mk = m.mk),
       |pairs AS MATERIALIZED (
       |  SELECT i.brand AS bi, o.brand AS bj,
       |    CAST(sum(CASE WHEN i.cents > o.cents THEN 1 ELSE 0 END)
       |      AS BIGINT) AS w,
       |    CAST(sum(CASE WHEN i.cents <> o.cents THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n
       |  FROM grid i JOIN grid o
       |    ON i.mk = o.mk AND i.brand <> o.brand
       |  GROUP BY 1, 2),
       |wt AS MATERIALIZED (
       |  SELECT bi AS brand, CAST(sum(w) AS BIGINT) AS wins,
       |    CAST(sum(n) AS BIGINT) AS comparisons
       |  FROM pairs GROUP BY 1),
       |s0 AS MATERIALIZED (
       |  SELECT brand, CAST(1000000 AS BIGINT) AS s
       |  FROM (SELECT DISTINCT brand FROM grid) b),
       |${round("s0", "s1")},
       |${round("s1", "s2")}
       |SELECT wt.brand, wt.wins, wt.comparisons, s2.s AS bt_micro,
       |  CAST(row_number() OVER (ORDER BY s2.s DESC, wt.brand) AS INT)
       |    AS rank
       |FROM wt JOIN s2 ON s2.brand = wt.brand
       |ORDER BY wt.brand""".stripMargin
  }

  /** q438 — Mahalanobis outliers on the (quantity, price-cents) plane:
    * the 2-D generalization of q217's univariate MAD flags — a line
    * item can be unremarkable on each axis yet impossible JOINTLY
    * (tiny quantity at a bulk price), which is exactly what the
    * covariance-whitened distance d² = z·Σ⁻¹·z sees and marginal
    * z-scores cannot. Exact core: means are stated micro truncations;
    * the three covariance NUMERATORS n·Σxx−Sx² etc. are exact DECIMAL
    * integers; Σ⁻¹ is the closed-form 2×2 inverse, so
    * d² = n(n−1)·(C·dx² − 2B·dx·dy + A·dy²)/(AC−B²) is one fixed
    * double tree per row over exact-integer inputs — identical doubles
    * both engines, ordered totally by (d², orderkey, linenumber).
    * Output: the top-10 joint outliers, each carrying the shared
    * count beyond the pinned χ²(2) 5.991465 (≈ the 95% ellipse).
    * Degenerate covariance (det ≤ 0) nulls everything (stated).
    *
    * Scale shape: one moments aggregate (broadcast back), one
    * projection pass, a TakeOrdered top-10 — no shuffle beyond the
    * rollups. */
  def q438(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rows = Tables.lineitem(s, d)
      .select($"l_orderkey", $"l_linenumber",
        $"l_quantity".cast("long").as("x"),
        floor($"l_extendedprice" * 100).cast("long").as("y"))
      .transform(Fx.materialize) // moments + distance pass
    val mom = rows.agg(count(lit(1)).as("n"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum(expr("cast(x as decimal(38,0)) * x")).as("sxx"),
        sum(expr("cast(x as decimal(38,0)) * y")).as("sxy"),
        sum(expr("cast(y as decimal(38,0)) * y")).as("syy"))
      .select($"n",
        expr("(sx * 1000000) div n").as("mx_micro"),
        expr("(sy * 1000000) div n").as("my_micro"),
        expr("n * sxx - cast(sx as decimal(38,0)) * sx").as("a"),
        expr("n * sxy - cast(sx as decimal(38,0)) * sy").as("b"),
        expr("n * syy - cast(sy as decimal(38,0)) * sy").as("c"))
    val d2 = rows.crossJoin(broadcast(mom))
      .withColumn("dx", ($"x" * 1000000L - $"mx_micro").cast("double") /
        lit(1000000.0))
      .withColumn("dy", ($"y" * 1000000L - $"my_micro").cast("double") /
        lit(1000000.0))
      .withColumn("det",
        $"a".cast("double") * $"c".cast("double") -
          $"b".cast("double") * $"b".cast("double"))
      .withColumn("d2",
        when($"det" > 0.0,
          ($"n".cast("double") * ($"n" - 1L).cast("double")) *
            ($"c".cast("double") * $"dx" * $"dx" -
              lit(2.0) * $"b".cast("double") * $"dx" * $"dy" +
              $"a".cast("double") * $"dy" * $"dy") / $"det"))
      .transform(Fx.materialize) // outlier count + top-10
    // when(...).otherwise(0): a NULL d2 (degenerate covariance) must
    // count 0, matching the oracle's CASE ... ELSE 0 (a bare boolean
    // cast would propagate NULL through the sum)
    val nOut = d2.agg(
      sum(when($"d2" > lit(5.991465), lit(1L)).otherwise(lit(0L)))
        .as("n_outliers"))
    d2.orderBy($"d2".desc, $"l_orderkey", $"l_linenumber").limit(10)
      .crossJoin(broadcast(nOut))
      .select($"l_orderkey", $"l_linenumber", $"x".as("quantity"),
        $"y".as("cents"), r6($"d2").as("d2"), $"n_outliers")
      .orderBy($"d2".desc, $"l_orderkey", $"l_linenumber")
  }

  val q438Sql: String = {
    import graft.Fx.sqlR6
    s"""WITH rows0 AS (
       |  SELECT l_orderkey, l_linenumber,
       |    CAST(l_quantity AS BIGINT) AS x,
       |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS y
       |  FROM lineitem),
       |mom AS MATERIALIZED (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    (CAST(sum(x) AS BIGINT) * 1000000) // count(*) AS mx_micro,
       |    (CAST(sum(y) AS BIGINT) * 1000000) // count(*) AS my_micro,
       |    count(*) * sum(CAST(x AS HUGEINT) * x)
       |      - CAST(sum(x) AS HUGEINT) * sum(x) AS a,
       |    count(*) * sum(CAST(x AS HUGEINT) * y)
       |      - CAST(sum(x) AS HUGEINT) * sum(y) AS b,
       |    count(*) * sum(CAST(y AS HUGEINT) * y)
       |      - CAST(sum(y) AS HUGEINT) * sum(y) AS c
       |  FROM rows0),
       |d2 AS MATERIALIZED (
       |  SELECT r.l_orderkey, r.l_linenumber, r.x, r.y,
       |    CASE WHEN CAST(m.a AS DOUBLE) * CAST(m.c AS DOUBLE)
       |        - CAST(m.b AS DOUBLE) * CAST(m.b AS DOUBLE) > 0.0
       |      THEN (CAST(m.n AS DOUBLE) * CAST(m.n - 1 AS DOUBLE)) *
       |        (CAST(m.c AS DOUBLE) * dx * dx
       |          - 2.0 * CAST(m.b AS DOUBLE) * dx * dy
       |          + CAST(m.a AS DOUBLE) * dy * dy)
       |        / (CAST(m.a AS DOUBLE) * CAST(m.c AS DOUBLE)
       |          - CAST(m.b AS DOUBLE) * CAST(m.b AS DOUBLE))
       |      END AS d2
       |  FROM (
       |    SELECT r0.*, CAST(r0.x * 1000000 - m0.mx_micro AS DOUBLE)
       |        / 1000000.0 AS dx,
       |      CAST(r0.y * 1000000 - m0.my_micro AS DOUBLE) / 1000000.0 AS dy
       |    FROM rows0 r0 CROSS JOIN mom m0) r
       |  CROSS JOIN mom m),
       |nout AS (
       |  SELECT CAST(sum(CASE WHEN d2 > 5.991465 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_outliers
       |  FROM d2),
       |top AS (
       |  SELECT l_orderkey, l_linenumber, x AS quantity, y AS cents,
       |    ${sqlR6("d2")} AS d2r, nout.n_outliers
       |  FROM d2 CROSS JOIN nout
       |  ORDER BY d2.d2 DESC, l_orderkey, l_linenumber
       |  LIMIT 10)
       |SELECT l_orderkey, l_linenumber, quantity, cents, d2r AS d2,
       |  n_outliers
       |FROM top ORDER BY d2r DESC, l_orderkey, l_linenumber""".stripMargin
  }

  /** q441 — Hill estimator of the order-value tail index: α̂ = k /
    * Σᵢ₌₁..ₖ ln(x₍ᵢ₎/x₍ₖ₊₁₎) over the k = 16 largest order totals
    * (stated k; descending order statistics tie-broken by orderkey).
    * The Pareto-tail member of the EVT battery — q413's Gumbel block
    * maxima assume a thin tail, q421 prices extreme CLUSTERING, and
    * q376's VaR reads one quantile; α̂ says how fast P(X > x) decays
    * (α < 2: infinite variance, every moment-based readout upstream
    * is suspect; α > 4: effectively thin). Exact: the top-17
    * selection is a total order on the cents grid; each of the 16
    * ratios pivots by rank into one fixed ln tree (q372 discipline)
    * and α̂ is a single division, r6. A degenerate tail (all 17 equal
    * → Σ = 0) nulls α̂ (stated). Each rank row carries its own order
    * statistic plus the shared estimate (the q281 cell convention).
    *
    * Scale shape: one TakeOrdered top-17 (per-partition heaps), a
    * 17-row pivot — no full sort, no shuffle beyond the rollup. */
  def q441(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val top = Tables.orders(s, d)
      .select($"o_orderkey",
        floor($"o_totalprice" * 100).cast("long").as("cents"))
      .orderBy($"cents".desc, $"o_orderkey")
      .limit(17)
      .withColumn("rn", row_number().over(
        Window.orderBy($"cents".desc, $"o_orderkey")))
      .transform(Fx.materialize) // pivot + output rows
    val pivCols = (1 to 17).map(i =>
      max(when($"rn" === i, $"cents")).as(s"x$i"))
    val piv = top.agg(pivCols.head, pivCols.tail: _*)
    val sumLn = (1 to 16).map(i =>
      log(col(s"x$i").cast("double") / col("x17").cast("double")))
      .reduce(_ + _)
    val est = piv.select($"x17".as("threshold_cents"),
      r6(sumLn).as("sum_ln"),
      when(sumLn > 0.0, r6(lit(16.0) / sumLn)).as("alpha"))
    top.filter($"rn" <= 16).crossJoin(broadcast(est))
      .select($"rn".cast("long").as("rank"), $"o_orderkey", $"cents",
        $"threshold_cents", $"sum_ln", $"alpha")
      .orderBy($"rank")
  }

  val q441Sql: String = {
    import graft.Fx.sqlR6
    val sumLn = (1 to 16).map(i =>
      s"ln(CAST(x$i AS DOUBLE) / CAST(x17 AS DOUBLE))").mkString(" + ")
    val pivCols = (1 to 17).map(i =>
      s"max(CASE WHEN rn = $i THEN cents END) AS x$i").mkString(", ")
    s"""WITH ranked AS MATERIALIZED (
       |  SELECT o_orderkey, cents,
       |    row_number() OVER (ORDER BY cents DESC, o_orderkey) AS rn
       |  FROM (
       |    SELECT o_orderkey,
       |      CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
       |    FROM orders) t
       |  ORDER BY cents DESC, o_orderkey
       |  LIMIT 17),
       |piv AS (SELECT $pivCols FROM ranked),
       |est AS (
       |  SELECT x17 AS threshold_cents, ${sqlR6(s"($sumLn)")} AS sum_ln,
       |    CASE WHEN ($sumLn) > 0.0
       |      THEN ${sqlR6(s"16.0 / ($sumLn)")} END AS alpha
       |  FROM piv)
       |SELECT CAST(r.rn AS BIGINT) AS rank, r.o_orderkey, r.cents,
       |  est.threshold_cents, est.sum_ln, est.alpha
       |FROM ranked r CROSS JOIN est
       |WHERE r.rn <= 16
       |ORDER BY rank""".stripMargin
  }

  /** q446 — price-ending heaping audit: the distribution of order
    * totals' last two cent digits against uniform — digit-preference
    * ("charm pricing" .99s, round .00s, fraud-style favorite endings)
    * lives in the LAST digits where q182's Benford (FIRST digit, scale
    * structure) is blind by construction. Per ending e ∈ 00..99 the
    * exact count; the uniformity χ² = Σ(100·oₑ − n)²/(100·n) is one
    * double division of exact DECIMAL sums against the pinned χ²(99)
    * 5% critical 123.225221. Output: the top-10 endings by (count,
    * ending) total order, each carrying its exact share and the shared
    * verdict — heaped endings are literally the rows you read off.
    *
    * Scale shape: one scan collapses to the 100-cell ending grid;
    * everything after is grid arithmetic and a 10-row selection. */
  def q446(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // zero-filled 100-cell grid: absent endings carry (0 − E)²/E too
    val cells = s.range(100).toDF("ending")
      .join(Tables.orders(s, d)
        .select((floor($"o_totalprice" * 100).cast("long") % 100).as("ending"))
        .groupBy($"ending").agg(count(lit(1)).as("c0")),
        Seq("ending"), "left")
      .select($"ending", coalesce($"c0", lit(0L)).as("c"))
      .transform(Fx.materialize) // chi2 + top rows
    val n = cells.agg(sum($"c").as("n"))
    val chi = cells.crossJoin(broadcast(n))
      .select(expr("cast(100 * c - n as decimal(38,0)) * (100 * c - n)")
        .as("sq"), $"n")
      .groupBy($"n").agg(sum($"sq").as("ssq"))
      .select(r6($"ssq".cast("double") / (lit(100.0) * $"n".cast("double")))
        .as("chi2"),
        (($"ssq".cast("double") / (lit(100.0) * $"n".cast("double"))) >
          lit(123.225221)).cast("int").as("reject_uniform_5pct"))
    cells.orderBy($"c".desc, $"ending").limit(10)
      .crossJoin(broadcast(n)).crossJoin(broadcast(chi))
      .select($"ending", $"c".as("n_orders"),
        expr("(c * 1000000) div n").as("share_micro"),
        $"chi2", $"reject_uniform_5pct")
      .orderBy($"n_orders".desc, $"ending")
  }

  val q446Sql: String = {
    import graft.Fx.sqlR6
    s"""WITH obs AS (
       |  SELECT CAST(floor(o_totalprice * 100) AS BIGINT) % 100 AS ending,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM orders GROUP BY 1),
       |cells AS MATERIALIZED (
       |  SELECT g.ending, COALESCE(obs.c, 0) AS c
       |  FROM (SELECT unnest(generate_series(0, 99)) AS ending) g
       |  LEFT JOIN obs ON obs.ending = g.ending),
       |nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
       |chi AS (
       |  SELECT ${sqlR6(
      "CAST(sum(CAST(100 * c - n AS HUGEINT) * (100 * c - n)) AS DOUBLE) / (100.0 * CAST(n AS DOUBLE))")}
       |      AS chi2,
       |    CAST(CAST(sum(CAST(100 * c - n AS HUGEINT) * (100 * c - n))
       |      AS DOUBLE) / (100.0 * CAST(n AS DOUBLE)) > 123.225221 AS INT)
       |      AS reject_uniform_5pct
       |  FROM cells CROSS JOIN nn GROUP BY n),
       |top AS (
       |  SELECT ending, c FROM cells ORDER BY c DESC, ending LIMIT 10)
       |SELECT t.ending, t.c AS n_orders,
       |  (t.c * 1000000) // nn.n AS share_micro,
       |  chi.chi2, chi.reject_uniform_5pct
       |FROM top t CROSS JOIN nn CROSS JOIN chi
       |ORDER BY n_orders DESC, ending""".stripMargin
  }

  /** q448 — Wilcoxon signed-rank test on paired brand half-years: did
    * revenue shift between the calendar halves BRAND BY BRAND? The
    * PAIRED member of the rank-test family (q254 Mann–Whitney assumes
    * independent samples and would drown the brand effect in
    * between-brand variance; q351-family Friedman needs ≥3
    * treatments): each brand is its own control. Exact: half-revenues
    * are zero-filled cents sums, differences integers, zero
    * differences dropped (stated, standard); tied |d| get AVERAGE
    * ranks kept exact by DOUBLING (rank₂ = min_rn + max_rn of the tie
    * group — an integer where the average is a half); W₂⁺ = Σ_{d>0}
    * rank₂ has mean n(n+1)/2 and variance n(n+1)(2n+1)/6 (no tie
    * correction, stated), z is one fixed double tree against the
    * pinned 1.959964. Each brand row carries its difference and
    * doubled rank plus the shared verdict.
    *
    * Scale shape: one scan collapses to brand×half cells; ranks ride
    * a window over the BRAND grid (bounded); a 1-row rollup. */
  def q448(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val cut = Tables.lineitem(s, d)
      .select((year($"l_shipdate") * 12 + month($"l_shipdate")).cast("long")
        .as("mk"))
      .agg(expr("(min(mk) + max(mk)) div 2").as("cut"))
    val byBrand = Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).select($"p_partkey", $"p_brand")),
        $"l_partkey" === $"p_partkey")
      .select($"p_brand".as("brand"),
        (year($"l_shipdate") * 12 + month($"l_shipdate")).cast("long").as("mk"),
        floor($"l_extendedprice" * 100).cast("long").as("cents"))
      .crossJoin(broadcast(cut))
      .groupBy($"brand")
      .agg(sum(when($"mk" <= $"cut", $"cents").otherwise(lit(0L))).as("h1"),
        sum(when($"mk" > $"cut", $"cents").otherwise(lit(0L))).as("h2"))
      .select($"brand", ($"h2" - $"h1").as("dc"))
      .filter($"dc" =!= 0L)
      .withColumn("rn", row_number().over(
        Window.orderBy(abs($"dc"), $"brand")))
      .transform(Fx.materialize) // tie groups + rollup + rows
    val rank2 = byBrand.groupBy(abs($"dc").as("ad"))
      .agg((min($"rn") + max($"rn")).as("rank2"))
    val ranked = byBrand.join(rank2, abs(byBrand("dc")) === rank2("ad"))
      .select($"brand", $"dc", $"rank2")
      .transform(Fx.materialize)
    val verdict = ranked.agg(count(lit(1)).as("n"),
        sum(when($"dc" > 0L, $"rank2").otherwise(lit(0L))).as("w2_plus"))
      .select($"n", $"w2_plus",
        expr("(n * (n + 1)) div 2").as("mu2"),
        expr("cast(n as decimal(38,0)) * (n + 1) * (2 * n + 1)").as("v6"))
      .select($"n".as("n_pairs"), $"w2_plus",
        r6(($"w2_plus".cast("double") - $"mu2".cast("double")) /
          sqrt($"v6".cast("double") / lit(6.0))).as("z"),
        ((abs($"w2_plus".cast("double") - $"mu2".cast("double")) /
          sqrt($"v6".cast("double") / lit(6.0))) > lit(1.959964))
          .cast("int").as("reject_5pct"))
    ranked.crossJoin(broadcast(verdict))
      .select($"brand", $"dc".as("diff_cents"),
        $"rank2".cast("long").as("rank2"),
        $"n_pairs", $"w2_plus", $"z", $"reject_5pct")
      .orderBy($"brand")
  }

  val q448Sql: String = {
    import graft.Fx.sqlR6
    val z = "(CAST(w2_plus AS DOUBLE) - CAST(mu2 AS DOUBLE)) / sqrt(CAST(v6 AS DOUBLE) / 6.0)"
    s"""WITH cut AS (
       |  SELECT (min(mk) + max(mk)) // 2 AS cut FROM (
       |    SELECT year(l_shipdate) * 12 + month(l_shipdate) AS mk
       |    FROM lineitem) t),
       |cells AS (
       |  SELECT p.p_brand AS brand,
       |    CAST(sum(CASE WHEN year(l.l_shipdate) * 12 + month(l.l_shipdate)
       |        <= cut.cut
       |      THEN CAST(floor(l.l_extendedprice * 100) AS BIGINT)
       |      ELSE 0 END) AS BIGINT) AS h1,
       |    CAST(sum(CASE WHEN year(l.l_shipdate) * 12 + month(l.l_shipdate)
       |        > cut.cut
       |      THEN CAST(floor(l.l_extendedprice * 100) AS BIGINT)
       |      ELSE 0 END) AS BIGINT) AS h2
       |  FROM lineitem l
       |  JOIN part p ON l.l_partkey = p.p_partkey
       |  CROSS JOIN cut
       |  GROUP BY 1),
       |diffs AS MATERIALIZED (
       |  SELECT brand, h2 - h1 AS dc,
       |    row_number() OVER (ORDER BY abs(h2 - h1), brand) AS rn
       |  FROM cells WHERE h2 - h1 <> 0),
       |r2 AS (
       |  SELECT abs(dc) AS ad, min(rn) + max(rn) AS rank2
       |  FROM diffs GROUP BY 1),
       |ranked AS MATERIALIZED (
       |  SELECT d.brand, d.dc, r2.rank2
       |  FROM diffs d JOIN r2 ON abs(d.dc) = r2.ad),
       |st AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CASE WHEN dc > 0 THEN rank2 ELSE 0 END) AS BIGINT)
       |      AS w2_plus
       |  FROM ranked),
       |ver AS (
       |  SELECT n AS n_pairs, w2_plus,
       |    ${sqlR6(z)} AS z,
       |    CAST(abs($z) > 1.959964 AS INT) AS reject_5pct
       |  FROM (
       |    SELECT n, w2_plus, (n * (n + 1)) // 2 AS mu2,
       |      CAST(n AS HUGEINT) * (n + 1) * (2 * n + 1) AS v6
       |    FROM st) u)
       |SELECT r.brand, r.dc AS diff_cents, CAST(r.rank2 AS BIGINT) AS rank2,
       |  ver.n_pairs, ver.w2_plus, ver.z, ver.reject_5pct
       |FROM ranked r CROSS JOIN ver
       |ORDER BY r.brand""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("q441_hill_tail_index", q441, Some(q441Sql)),
    QueryDef("q446_price_ending_heaping", q446, Some(q446Sql)),
    QueryDef("q448_wilcoxon_signed_rank", q448, Some(q448Sql)),
    QueryDef("q438_mahalanobis_outliers", q438, Some(q438Sql)),
    QueryDef("q430_bradley_terry", q430, Some(q430Sql)),
    QueryDef("q427_synthetic_control", q427, Some(q427Sql)),
    QueryDef("q417_taylor_law", q417, Some(q417Sql)),
    QueryDef("q423_price_sync", q423, Some(q423Sql)),
    QueryDef("q358_price_index", q358, Some(q358Sql)),
    QueryDef("q363_arc_elasticity", q363, Some(q363Sql)),
    QueryDef("q402_cross_elasticity", q402, Some(q402Sql)),
    QueryDef("q403_croston", q403, Some(q403Sql)),
    QueryDef("q404_bf_reserving", q404, Some(q404Sql)),
    QueryDef("q405_robust_shape", q405, Some(q405Sql)),
    QueryDef("q375_bullwhip", q375, Some(q375Sql)),
    QueryDef("q377_chain_ladder", q377, Some(q377Sql)),
    QueryDef("q380_mean_residual_life", q380, Some(q380Sql)),
    QueryDef("q381_safety_stock", q381, Some(q381Sql)),
    QueryDef("q387_ge2_decomposition", q387, Some(q387Sql)),
    QueryDef("q388_pvm_bridge", q388, Some(q388Sql)),
    QueryDef("q390_ultimate_forecast", q390, Some(q390Sql)),
    QueryDef("q394_price_stickiness", q394, Some(q394Sql)),
    QueryDef("q346_price_dispersion", q346, Some(q346Sql)),
    QueryDef("q342_duplicate_payments", q342, Some(q342Sql)),
    QueryDef("q343_hhi_trend", q343, Some(q343Sql)),
    QueryDef("q333_demand_quadrants", q333, Some(q333Sql)),
    QueryDef("q324_spearman_rho", q324, Some(q324Sql)),
    QueryDef("q325_kendall_tau", q325, Some(q325Sql)),
    QueryDef("q330_abc_xyz_matrix", q330, Some(q330Sql)),
    QueryDef("q310_abc_analysis", q310, Some(q310Sql)),
    QueryDef("q248_rfm_segmentation", q248, Some(q248Sql)),
    QueryDef("q237_document_roundtrip", q237, Some(q237Sql), bench = true),
    QueryDef("q01_pricing_summary", q01, Some(q01Sql), bench = true),
    QueryDef("q02_filter_project", q02, Some(q02Sql)),
    QueryDef("q03_join_topk", q03, Some(q03Sql), bench = true),
    QueryDef("q04_broadcast_join_agg", q04, Some(q04Sql), bench = true),
    QueryDef("q05_snowflake_join", q05, Some(q05Sql), bench = true),
    QueryDef("q06_topk_orders", q06, Some(q06Sql)),
    QueryDef("q07_window_lag", q07, Some(q07Sql), bench = true),
    QueryDef("q08_window_topn_per_group", q08, Some(q08Sql)),
    QueryDef("q09_distinct_agg", q09, Some(q09Sql), bench = true),
    QueryDef("q10_anti_join", q10, Some(q10Sql)),
    QueryDef("q11_semi_join", q11, Some(q11Sql)),
    QueryDef("q12_union_distinct", q12, Some(q12Sql)),
    QueryDef("q13_having", q13, Some(q13Sql)),
    QueryDef("q14_conditional_agg", q14, Some(q14Sql)),
    QueryDef("q15_rollup", q15, Some(q15Sql)),
    QueryDef("q16_events_hourly", q16, Some(q16Sql)),
    QueryDef("q17_window_avg_filter", q17, Some(q17Sql)),
    QueryDef("q18_year_agg", q18, Some(q18Sql)),
    QueryDef("q19_json_extract_agg", q19, Some(q19Sql)),
    QueryDef("q24_projection_ops", q24, Some(q24Sql)),
    QueryDef("q25_avg_stddev", q25, Some(q25Sql)),
    QueryDef("q26_deterministic_sample", q26, Some(q26Sql)),
    QueryDef("q31_percentiles", q31, Some(q31Sql)),
    QueryDef("q32_ntile_cumedist", q32, Some(q32Sql)),
    QueryDef("q33_pivot", q33, Some(q33Sql)),
    QueryDef("q34_sorted_collect", q34, Some(q34Sql)),
    QueryDef("q81_range_frame_window", q81, Some(q81Sql)),
    QueryDef("q83_grid_exact_corr", q83, Some(q83Sql)),
    QueryDef("q111_full_outer_calendar", q111, Some(q111Sql)),
    QueryDef("q112_unpivot", q112, Some(q112Sql)),
    QueryDef("q115_median_per_group", q115, Some(q115Sql)),
    QueryDef("q126_trimmed_mean", q126, Some(q126Sql)),
    QueryDef("q131_snapshot_diff", q131, Some(q131Sql)),
    QueryDef("q133_window_frames", q133, Some(q133Sql)),
    QueryDef("q134_forward_fill", q134, Some(q134Sql)),
  )
}
