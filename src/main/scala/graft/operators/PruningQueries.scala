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
        col("l_orderkey"), col("l_extendedprice"), col("l_quantity"))
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

  val all: Seq[QueryDef] = Seq(
    QueryDef("q450_dpp_star", q450, Some(q450Sql)))
}
