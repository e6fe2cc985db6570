package graft.operators

import graft.{Fx, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scan-pruning operators, round 13: the two runtime levers that
  * decide how much of a 100 TB fact table a star query actually
  * READS — dynamic partition pruning (skip whole partitions the dim
  * filter rules out) and runtime bloom-filter join pruning (skip
  * non-matching rows before the shuffle). Neither changes query
  * RESULTS, so the oracle checks semantics on the unpartitioned base
  * tables while RuntimePruningSpec pins the plan artifacts
  * (`DynamicPruningExpression` in the fact scan, measured files-read
  * shrink, `bloom_filter_might_contain` injection + measured row
  * reduction).
  *
  * Reference shape: the daily `city=…/date=…` partitioned layout the
  * reference's scraper writes its scrapes into
  * (trulia_scrape.py:182-188) is exactly the layout DPP pays off on —
  * a selective dim lookup should open only the matching partitions.
  */
object PruningQueries {
  import Fx._

  /** Months a fact row can land in (TPC-H ship dates span 1992-01 …
    * 1998-12); the partitioned fact has one directory per present ym. */
  private val DimFilterSql =
    "o_orderpriority = '1-URGENT' AND year(o_orderdate) = 1995 AND o_totalprice > 430000"

  // One partitioned materialization per (sfDir) per JVM: plan sweeps
  // call every registry fn repeatedly, and rewriting an identical
  // partitioned copy each time would turn a plan-only sweep into a
  // write benchmark. Content is a pure function of the source table,
  // so reuse is safe.
  private val factDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Materialize (once per JVM) the ym-partitioned copy of lineitem —
    * the layout a production table would already have (SURVEY K1 daily
    * sink). Returns the directory. */
  def partitionedFactDir(s: SparkSession, d: String): String =
    factDirs.getOrElseUpdate(d, {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-dpp-fact-").toFile.getAbsolutePath
      val fact = Tables.lineitem(s, d).select(
        (year(col("l_shipdate")) * 100 + month(col("l_shipdate"))).as("ym"),
        col("l_orderkey"), col("l_extendedprice"), col("l_quantity"),
        col("l_returnflag"))
      graft.sources.Sinks.partitionedParquet(fact, dir, Seq("ym"))
      dir
    })

  /** q450 — star query over a date-partitioned fact: ship-month
    * revenue for the months that saw a top-value urgent order in 1995.
    * The months are only knowable through the dim-side join (the
    * fact's `ym` carries no predicate of its own), so a naive plan
    * scans all ~83 month partitions; with dynamic partition pruning
    * the broadcast dim's build side feeds a
    * `DynamicPruningExpression` into the fact scan and only the 5–12
    * matching partitions are opened (measured in RuntimePruningSpec:
    * files-read shrink ≥ 6×). At 100 TB this is the difference
    * between scanning the table and scanning a month of it. */
  def q450(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val fact = s.read.parquet(partitionedFactDir(s, d))
    val dim = Tables.orders(s, d)
      .filter($"o_orderpriority" === "1-URGENT" &&
        year($"o_orderdate") === 1995 && $"o_totalprice" > 430000.0)
      .select((year($"o_orderdate") * 100 + month($"o_orderdate")).as("ym"))
      .distinct()
    fact.join(broadcast(dim), "ym")
      .groupBy($"ym")
      .agg(count(lit(1)).as("n_lines"),
        moneySum($"l_extendedprice").as("rev"))
      .orderBy($"ym")
  }

  val q450Sql: String =
    s"""WITH dim AS (
       |  SELECT DISTINCT year(o_orderdate)*100 + month(o_orderdate) AS ym
       |  FROM orders WHERE $DimFilterSql),
       |fact AS (
       |  SELECT year(l_shipdate)*100 + month(l_shipdate) AS ym,
       |    l_extendedprice
       |  FROM lineitem)
       |SELECT ym, count(*) AS n_lines,
       |  ${sqlMoneySum("l_extendedprice")} AS rev
       |FROM fact JOIN dim USING (ym)
       |GROUP BY ym ORDER BY ym""".stripMargin

  /** q538 — the production combination at 100× scale (r14 verdict #5):
    * DYNAMIC PARTITION PRUNING and the AQE SKEW-JOIN SPLIT protecting
    * the SAME star plan. The broadcast month dim feeds a
    * `DynamicPruningExpression` into the partitioned fact scan (open
    * only the dim-selected ym partitions — q450's lever); the
    * surviving fact rows then shuffle on a ROUTE key into a per-route
    * stats join — the consumer-key-skewed join class (one giant
    * customer / one dominant shard) that AQE's OptimizeSkewedJoin
    * splits at runtime. The testdata carries NO naturally skewed key
    * (measured: sources 25×20 uniform, 31-word near-uniform vocab,
    * l_returnflag an even 3-way split, user_id uniform), so the route
    * key makes the skew deterministically: lines with l_quantity ≤ 45
    * (~90%) route to key 0, the rest to their quantity — exactly
    * oracle-expressible, and the hot key's partition is ~40× the
    * median, the shape AQE must split. The stat side carries a MERGE
    * hint: at test scale Spark would broadcast the 6-row aggregate,
    * but at production scale the per-key side of such a join is
    * itself large (per-customer stats), so the hint pins the
    * shuffle-join shape the 100 TB plan would have — letting
    * RuntimePruningSpec assert BOTH `DynamicPruningExpression` and
    * `skew=true` on this exact registered plan. Results are
    * conf-independent (the oracle checks semantics on the
    * unpartitioned base tables). */
  def q538(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // quantity ≤ 46 (~92% of lines) routes to region 0; 47..50 spread
    // over regions 1..4 — deterministic, oracle-exact, and the hot
    // key's shuffle partition is ~40× the median.
    val routeExpr =
      "CASE WHEN l_quantity <= 46 THEN CAST(0 AS BIGINT) ELSE CAST(l_quantity - 46 AS BIGINT) END"
    val fact = s.read.parquet(partitionedFactDir(s, d))
      .withColumn("route", expr(routeExpr))
    val dim = Tables.orders(s, d)
      .filter($"o_orderpriority" === "1-URGENT" &&
        year($"o_orderdate") === 1995 && $"o_totalprice" > 430000.0)
      .select((year($"o_orderdate") * 100 + month($"o_orderdate")).as("ym"))
      .distinct()
    // NOTE: the routed side must reach the join as a PLAIN scan —
    // OptimizeSkewedJoin only matches SMJ(Sort(ShuffleQueryStage),
    // Sort(ShuffleQueryStage)); an aggregate's final HashAggregate
    // between the Sort and the stage defeats the pattern (measured
    // this round — a groupBy'd stats side was never split).
    val regions = Tables.region(s, d)
      .select($"r_regionkey".cast("long").as("route"), $"r_name")
    fact.join(broadcast(dim), "ym")
      .join(regions.hint("merge"), "route")
      .groupBy($"route", $"r_name")
      .agg(count(lit(1)).as("n_lines"),
        moneySum($"l_extendedprice").as("rev"))
      .orderBy($"route")
  }

  val q538Sql: String =
    s"""WITH dim AS (
       |  SELECT DISTINCT year(o_orderdate)*100 + month(o_orderdate) AS ym
       |  FROM orders WHERE $DimFilterSql),
       |fact AS (
       |  SELECT year(l_shipdate)*100 + month(l_shipdate) AS ym,
       |    CASE WHEN l_quantity <= 46 THEN CAST(0 AS BIGINT)
       |      ELSE CAST(l_quantity - 46 AS BIGINT) END AS route,
       |    l_extendedprice
       |  FROM lineitem)
       |SELECT f.route, r.r_name, CAST(count(*) AS BIGINT) AS n_lines,
       |  ${sqlMoneySum("f.l_extendedprice")} AS rev
       |FROM fact f JOIN dim USING (ym)
       |JOIN region r ON CAST(r.r_regionkey AS BIGINT) = f.route
       |GROUP BY f.route, r.r_name ORDER BY route""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q450_dpp_star", q450, Some(q450Sql)),
    QueryDef("q538_skew_dpp_star", q538, Some(q538Sql)))
}
