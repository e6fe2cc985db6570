package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Construct probes for the r13/r14 driver-only hash divergence on
  * q457 / q463 / q495 (VERDICT r14 items #1/#2).
  *
  * Root cause, localized THIS round by a registry-wide type scan: the
  * three queries (and across all 528 oracles, ONLY they) leaked DuckDB
  * `HUGEINT` into final oracle columns — `sum()` over BIGINT returns
  * HUGEINT, which DuckDB's pandas conversion renders as float64, so
  * the driver's stringified hash compares "123.0" against Spark's
  * BIGINT "123" and mismatches while rows/schema/values all agree.
  * The fix is `CAST(... AS BIGINT)` on every affected final column
  * (landed in q457Sql / q463Sql / q495Sql); scripts/check.py now
  * fails the int-vs-float dtype class locally.
  *
  * These three probes complete the verdict's bisect protocol in the
  * driver's own environment: each exercises ONE of the constructs the
  * r14 verdict listed as suspects — with fully-cast (BIGINT-only)
  * outputs. Expected outcome in CORRECTNESS_r15: all three GREEN
  * (constructs innocent, type class guilty). If any probe comes back
  * red, its construct genuinely diverges in the driver's DuckDB and
  * COVERAGE.md's adjudication table is wrong — that outcome would be
  * visible in the artifact either way, which is the point.
  *
  * Retirement: once CORRECTNESS_r15 adjudicates (originals green +
  * probes green), these can be deleted; keep the regression note in
  * COVERAGE.md. They are nonetheless real queries — the isotonic
  * interval-mean table, the cumulative confusion grid, and the
  * co-occurrence edge list are each legitimate diagnostic outputs of
  * their parent analyses, all on bounded (≤ grid²) domains.
  */
object ProbeQueries {

  private def qualityMicro(c: org.apache.spark.sql.Column) =
    graft.functions.TextAnalysis.qualityMicro(c)

  // ------------------------------------------------------------------
  // q535 — probe: q457's `<=` interval self-join + re-grouping
  // ------------------------------------------------------------------

  /** q535 — the (i,j) interval micro-mean table that q457's isotonic
    * minimax consumes: cumulative sums over the bounded decile grid,
    * fanned out through the SAME `a.ord <= b.ord` self-join the r14
    * verdict flagged as a suspect construct, every output cast BIGINT.
    * Bounded |grid|² ≤ 121 rows at any corpus size. */
  def q535(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.orderBy($"ord")
      .rowsBetween(Window.unboundedPreceding, 0)
    val bins = Tables.documents(s, d)
      .select(qualityMicro($"text").as("qm"),
        ($"lang" === "en").cast("long").as("en"))
      .groupBy(expr("qm div 100000").as("ord"))
      .agg(count(lit(1)).as("n"), sum($"en").as("y"))
    val cum = bins
      .withColumn("cn", sum($"n").over(w))
      .withColumn("cy", sum($"y").over(w))
    cum.select($"ord".as("i"), ($"cn" - $"n").as("pn"), ($"cy" - $"y").as("py"))
      .join(cum.select($"ord".as("j"), $"cn", $"cy"), $"i" <= $"j")
      .select($"i", $"j",
        expr("((cy - py) * 1000000) div (cn - pn)").as("m_micro"))
      .orderBy($"i", $"j")
  }

  val q535Sql: String = {
    val quality = graft.functions.TextAnalysis.sqlQualityMicro("text")
    s"""WITH f AS (
       |  SELECT CAST(($quality) AS BIGINT) AS qm,
       |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS en
       |  FROM documents),
       |bins AS (
       |  SELECT qm // 100000 AS ord, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(en) AS BIGINT) AS y
       |  FROM f GROUP BY 1),
       |cum AS (
       |  SELECT ord, n, y,
       |    CAST(sum(n) OVER (ORDER BY ord
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cn,
       |    CAST(sum(y) OVER (ORDER BY ord
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cy
       |  FROM bins)
       |SELECT a.ord AS i, b.ord AS j,
       |  ((b.cy - (a.cy - a.y)) * 1000000) // (b.cn - (a.cn - a.n)) AS m_micro
       |FROM cum a JOIN cum b ON a.ord <= b.ord
       |ORDER BY i, j""".stripMargin
  }

  // ------------------------------------------------------------------
  // q536 — probe: q495's suffix frames + row_number DESC NULLS LAST
  // ------------------------------------------------------------------

  /** q536 — the cumulative ≥-threshold grid behind q495's confusion
    * table, through the TWO constructs the r14 verdict flagged:
    * `ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING` suffix frames
    * and `row_number() OVER (ORDER BY … DESC NULLS LAST)` (tie-broken
    * by bin, so total). Every output cast BIGINT/INT. ≤ 11 rows. */
  def q536(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = Window
    val wGe = W.partitionBy().orderBy($"bin")
      .rowsBetween(0, Window.unboundedFollowing)
    Tables.documents(s, d)
      .select(qualityMicro($"text").as("qm"),
        ($"lang" === "en").cast("long").as("y"))
      .groupBy(expr("qm div 100000").as("bin"))
      .agg(count(lit(1)).as("n"), sum($"y").as("pos"))
      .withColumn("n_ge", sum($"n").over(wGe))
      .withColumn("pos_ge", sum($"pos").over(wGe))
      .withColumn("rk", row_number().over(W.partitionBy()
        .orderBy($"pos_ge".desc_nulls_last, $"bin")))
      .select($"bin", $"n", $"pos", $"n_ge", $"pos_ge", $"rk".cast("int").as("rk"))
      .orderBy($"bin")
  }

  val q536Sql: String = {
    val quality = graft.functions.TextAnalysis.sqlQualityMicro("text")
    s"""WITH f AS (
       |  SELECT CAST(($quality) AS BIGINT) AS qm,
       |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
       |  FROM documents),
       |bins AS (
       |  SELECT qm // 100000 AS bin, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(y) AS BIGINT) AS pos
       |  FROM f GROUP BY 1),
       |sfx AS (
       |  SELECT bin, n, pos,
       |    CAST(sum(n) OVER (ORDER BY bin ROWS BETWEEN CURRENT ROW
       |      AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_ge,
       |    CAST(sum(pos) OVER (ORDER BY bin ROWS BETWEEN CURRENT ROW
       |      AND UNBOUNDED FOLLOWING) AS BIGINT) AS pos_ge
       |  FROM bins)
       |SELECT bin, n, pos, n_ge, pos_ge,
       |  CAST(row_number() OVER (ORDER BY pos_ge DESC NULLS LAST, bin)
       |    AS INT) AS rk
       |FROM sfx ORDER BY bin""".stripMargin
  }

  // ------------------------------------------------------------------
  // q537 — probe: q463's recursive-CTE + list-index + MATERIALIZED
  // ------------------------------------------------------------------

  /** q537 — the top-20 co-occurrence edges behind q463's TextRank
    * graph, built on the oracle side through the SAME `WITH RECURSIVE`
    * positions CTE + `ws[p]` list indexing + MATERIALIZED chain the
    * r14 verdict flagged; Spark side is the zip-of-slices explode.
    * Output (u, v, w) all VARCHAR/BIGINT, total order. */
  def q537(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ws = split($"text", " ")
    val big = Tables.documents(s, d)
      .select(explode(arrays_zip(
        slice(ws, lit(1), greatest(size(ws) - 1, lit(0))).as("l"),
        slice(ws, lit(2), greatest(size(ws) - 1, lit(0))).as("r"))).as("bg"))
      .select($"bg.l".as("u"), $"bg.r".as("v"))
      .filter($"u" =!= "" && $"v" =!= "" && $"u" =!= $"v")
    val und = big.groupBy($"u", $"v").agg(count(lit(1)).as("w"))
    und.unionByName(und.select($"v".as("u"), $"u".as("v"), $"w"))
      .groupBy($"u", $"v").agg(sum($"w").as("w"))
      .orderBy($"w".desc, $"u", $"v").limit(20)
  }

  val q537Sql: String =
    """WITH RECURSIVE t AS MATERIALIZED (
      |  SELECT string_split(text, ' ') AS ws FROM documents),
      |pos(p) AS (
      |  SELECT 1
      |  UNION ALL
      |  SELECT p + 1 FROM pos
      |  WHERE p + 1 <= (SELECT max(len(ws)) - 1 FROM t)),
      |big AS MATERIALIZED (
      |  SELECT ws[p] AS u, ws[p + 1] AS v
      |  FROM t JOIN pos ON pos.p <= len(ws) - 1),
      |bg AS (SELECT u, v FROM big
      |       WHERE u <> '' AND v <> '' AND u <> v),
      |und AS (
      |  SELECT u, v, CAST(count(*) AS BIGINT) AS w FROM bg GROUP BY 1, 2)
      |SELECT u, v, CAST(sum(w) AS BIGINT) AS w FROM (
      |  SELECT u, v, w FROM und
      |  UNION ALL SELECT v, u, w FROM und) s
      |GROUP BY 1, 2
      |ORDER BY w DESC, u, v LIMIT 20""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q535_interval_join_probe", q535, Some(q535Sql)),
    QueryDef("q536_suffix_frame_probe", q536, Some(q536Sql)),
    QueryDef("q537_recursive_chain_probe", q537, Some(q537Sql)))
}
