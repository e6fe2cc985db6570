package graft.operators

import graft.{Fx, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Econometrics / time-series-inference batch, round 13: unit-root and
  * regression-stability statistics over the calendar-bounded monthly
  * revenue grids — the family (cointegration, stationarity, Granger
  * causality, heteroscedasticity, structural stability) that sits one
  * layer above the descriptive time-series queries (q312 ACF, q443
  * PACF, q372 periodogram) and decides whether a forecasting or
  * elasticity model (q270/q280/q402) is even well-posed.
  *
  * Exactness discipline (q172/q297/q312 conventions): every series
  * lands on an integer grid first (cents → truncating kilo-dollar
  * division, both engines' `div`/`//` truncate identically), moment
  * sums accumulate exactly in BIGINT / DECIMAL(38,0) / HUGEINT, and
  * each reported statistic is either ONE truncating micro-division of
  * exact integers or a fixed-shape double pipeline whose every
  * operand is a correctly-rounded cast of an exact integer (identical
  * expression order in both engines). DECIMAL(38,0) bounds are stated
  * per query for the tested SFs; wider domains escalate to 256-bit
  * (the q297 note).
  *
  * Scale shape (shared): ONE scan collapses the fact table to the
  * ≤84-month calendar grid; every window/self-join after that runs on
  * the bounded grid (the q312 "calendar, not corpus" exemption).
  */
object EconometricsQueries {
  import Fx._

  /** Month key and exact kilo-dollar revenue: cents summed exactly,
    * then ONE truncating division onto the kilo grid. */
  private def centsK(c: org.apache.spark.sql.Column) =
    floor(c * 100 + 0.5).cast("long")

  // ------------------------------------------------------------------
  // q451 — Engle–Granger cointegration (two-step) on two segments
  // ------------------------------------------------------------------

  /** q451 — Engle–Granger two-step cointegration test between the
    * AUTOMOBILE and BUILDING monthly revenue series: step 1 fits the
    * long-run OLS y ~ a + b·x; step 2 runs the Dickey–Fuller
    * regression Δu_t = ρ·u_{t−1} on the residuals — ρ far below 0
    * means the residual mean-reverts, i.e. the two series share a
    * common stochastic trend (they are cointegrated), the condition
    * under which a price-transmission or pairs model between them is
    * well-posed; ρ ≈ 0 means the "relationship" is spurious
    * regression. Exactness: residuals are denominator-cleared
    * (u_t = D·y_t − C − B·x_t with D = nΣx²−(Σx)², B = nΣxy−ΣxΣy,
    * C = ΣyΣx²−ΣxΣxy — all DECIMAL(38,0); u ≲ 10¹⁵ at sf ≤ 0.1, and
    * ρ is scale-invariant so the cleared residual gives the same ρ as
    * the true one), the DF numerator/denominator are exact
    * DECIMAL(38,0) sums (≲10³²), and ρ is one double division of the
    * two exact integers, r6. Both series come out of ONE fact scan
    * (conditional aggregation by segment). */
  def q451(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val g = Tables.orders(s, d)
      .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
      .filter($"c_mktsegment".isin("AUTOMOBILE", "BUILDING"))
      .groupBy((year($"o_orderdate") * 100 + month($"o_orderdate")).as("ym"))
      .agg(
        sum(when($"c_mktsegment" === "AUTOMOBILE",
          centsK($"o_totalprice")).otherwise(0L)).as("xc"),
        sum(when($"c_mktsegment" === "BUILDING",
          centsK($"o_totalprice")).otherwise(0L)).as("yc"),
        sum(when($"c_mktsegment" === "AUTOMOBILE", 1L).otherwise(0L)).as("nx"),
        sum(when($"c_mktsegment" === "BUILDING", 1L).otherwise(0L)).as("ny"))
      .filter($"nx" > 0 && $"ny" > 0)
      .select($"ym", expr("xc div 100000").as("x"), expr("yc div 100000").as("y"))
    val m = g.agg(count(lit(1)).as("n"),
      sum($"x").as("sx"), sum($"y").as("sy"),
      sum(expr("cast(x as decimal(38,0)) * x")).as("sxx"),
      sum(expr("cast(x as decimal(38,0)) * y")).as("sxy"))
    val resid = g.crossJoin(broadcast(m))
      .select($"ym",
        expr("""(n * sxx - cast(sx as decimal(38,0)) * sx) * y
                - (sy * sxx - cast(sx as decimal(38,0)) * sxy)
                - (n * sxy - cast(sx as decimal(38,0)) * sy) * x""").as("u"))
      .withColumn("rn", row_number().over(Window.orderBy($"ym")))
    val pairs = resid.select(($"rn" + 1).as("rn"), $"u".as("u_prev"))
      .join(resid.select($"rn", $"u"), "rn")
    pairs
      .agg(count(lit(1)).as("n_pairs"),
        sum(expr("u_prev * (u - u_prev)")).as("num"),
        sum(expr("u_prev * u_prev")).as("den"))
      .select($"n_pairs",
        when($"den" === 0, lit(null).cast("double"))
          .otherwise(r6($"num".cast("double") / $"den".cast("double")))
          .as("rho"))
  }

  val q451Sql: String =
    """WITH g AS (
      |  SELECT year(o_orderdate)*100 + month(o_orderdate) AS ym,
      |    CAST(sum(CASE WHEN c_mktsegment = 'AUTOMOBILE'
      |      THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) ELSE 0 END)
      |      AS BIGINT) // 100000 AS x,
      |    CAST(sum(CASE WHEN c_mktsegment = 'BUILDING'
      |      THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) ELSE 0 END)
      |      AS BIGINT) // 100000 AS y,
      |    sum(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS nx,
      |    sum(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS ny
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
      |  GROUP BY 1),
      |gg AS (SELECT ym, x, y FROM g WHERE nx > 0 AND ny > 0),
      |m AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS n,
      |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
      |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
      |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
      |  FROM gg),
      |resid AS (
      |  SELECT ym,
      |    (n * sxx - sx * sx) * y - (sy * sxx - sx * sxy)
      |      - (n * sxy - sx * sy) * x AS u,
      |    row_number() OVER (ORDER BY ym) AS rn
      |  FROM gg CROSS JOIN m),
      |pairs AS (
      |  SELECT a.u AS u_prev, b.u AS u
      |  FROM resid a JOIN resid b ON b.rn = a.rn + 1),
      |agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
      |    sum(u_prev * (u - u_prev)) AS num,
      |    sum(u_prev * u_prev) AS den
      |  FROM pairs)
      |SELECT n_pairs,
      |  CASE WHEN den = 0 THEN NULL
      |    ELSE floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * 1000000 + 0.5)
      |      / 1000000 END AS rho
      |FROM agg""".stripMargin

  // ------------------------------------------------------------------
  // q452 — KPSS level-stationarity statistic on monthly revenue
  // ------------------------------------------------------------------

  /** q452 — KPSS level-stationarity statistic of the monthly total
    * revenue series (lag-0 long-run variance, stated — the classic
    * η_μ = Σ S_t² / (n · Σ e_t²) with e the demeaned series and S its
    * partial sums; the Newey–West bandwidth extension is a weighting
    * of the SAME exact building blocks). KPSS inverts the q307/q306
    * null: HERE the null is stationarity, so a LARGE η rejects — the
    * companion readout to q451 (residual unit-root) when deciding
    * whether to difference before q270/q280 smoothing. Exactness:
    * kilo-dollar grid, denominator-cleared demeaning
    * (e_t → c_t = n·x_t − Σx, BIGINT), partial sums over the bounded
    * month grid, and η_micro = (ΣS²·10⁶) div (n·Σc²) — one truncating
    * division of exact DECIMAL(38,0) integers (ΣS² ≲ 10¹⁹ at
    * sf ≤ 0.1). */
  def q452(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val g = Tables.orders(s, d)
      .groupBy((year($"o_orderdate") * 100 + month($"o_orderdate")).as("ym"))
      .agg(sum(centsK($"o_totalprice")).as("xc"))
      .select($"ym", expr("xc div 100000").as("x"))
    val st = g.agg(count(lit(1)).as("n"), sum($"x").as("sx"))
    val c = g.crossJoin(broadcast(st))
      .select($"ym", $"n", ($"n" * $"x" - $"sx").as("c"))
      .withColumn("s_part", sum($"c").over(
        Window.orderBy($"ym").rowsBetween(Window.unboundedPreceding, 0)))
    c.groupBy($"n")
      .agg(
        sum(expr("cast(s_part as decimal(38,0)) * s_part")).as("ss2"),
        sum(expr("cast(c as decimal(38,0)) * c")).as("sc2"))
      .select($"n",
        when($"sc2" === 0, lit(null).cast("long"))
          .otherwise(expr("(ss2 * 1000000) div (n * sc2)").cast("long"))
          .as("kpss_micro"))
  }

  val q452Sql: String =
    """WITH g AS (
      |  SELECT year(o_orderdate)*100 + month(o_orderdate) AS ym,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      // 100000 AS x
      |  FROM orders GROUP BY 1),
      |st AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx
      |       FROM g),
      |c AS (
      |  SELECT ym, n, n * x - sx AS c,
      |    sum(n * x - sx) OVER (ORDER BY ym
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_part
      |  FROM g CROSS JOIN st),
      |agg AS (
      |  SELECT n, sum(CAST(s_part AS HUGEINT) * s_part) AS ss2,
      |    sum(CAST(c AS HUGEINT) * c) AS sc2
      |  FROM c GROUP BY n)
      |SELECT n,
      |  CASE WHEN sc2 = 0 THEN NULL
      |    ELSE CAST((ss2 * 1000000) // (n * sc2) AS BIGINT) END AS kpss_micro
      |FROM agg""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q451_engle_granger", q451, Some(q451Sql)),
    QueryDef("q452_kpss_stationarity", q452, Some(q452Sql)))
}
