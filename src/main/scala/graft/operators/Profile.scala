package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset profiling — the first thing a training-data pipeline runs
  * against a new 100 TB drop: per-column null counts, exact distinct
  * counts, and min/max, computed in ONE scan (a single aggregate with
  * multiple DISTINCT columns — Catalyst plans it as one Expand +
  * two-phase aggregate, so the table is read once no matter how many
  * columns are profiled; the per-column-UNION alternative would scan
  * the table per column).
  */
object Profile {

  /** One output row per profiled column:
    * (col_name, n_nulls, n_distinct, min_val, max_val). min/max are
    * rendered as strings AFTER aggregating on the native type (casting
    * first would compare lexicographically). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val total = count(lit(1))
    val aggs = cols.flatMap { c =>
      Seq(
        (total - count(col(c))).as(s"__nulls_$c"),
        count_distinct(col(c)).as(s"__distinct_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("col_name"),
        col(s"__nulls_$c").as("n_nulls"),
        col(s"__distinct_$c").as("n_distinct"),
        col(s"__min_$c").as("min_val"),
        col(s"__max_$c").as("max_val"))
    }
    wide.select(explode(array(stacked: _*)).as("p"))
      .select(col("p.col_name"), col("p.n_nulls"), col("p.n_distinct"),
        col("p.min_val"), col("p.max_val"))
      .orderBy(col("col_name"))
  }

  private val profCols =
    Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")

  def q80(s: SparkSession, d: String): DataFrame =
    profile(Tables.load(s, d, "customer"), profCols)

  val q80Sql: String = profCols.map { c =>
    s"""SELECT '$c' AS col_name,
       |  CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
       |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
       |  CAST(min($c) AS VARCHAR) AS min_val,
       |  CAST(max($c) AS VARCHAR) AS max_val
       |FROM customer""".stripMargin
  }.mkString("\nUNION ALL\n") + "\nORDER BY col_name"

  val all: Seq[QueryDef] = Seq(
    QueryDef("q80_profile", q80, Some(q80Sql)))
}
