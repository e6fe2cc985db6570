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

  /** Shared monthly two-segment grid: (ym, x, y) = exact kilo-dollar
    * revenue of AUTOMOBILE / BUILDING, months where both traded, ONE
    * fact scan (conditional aggregation). */
  private def segMonthly(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
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
  }

  private val segMonthlySql: String =
    """SELECT ym, xc // 100000 AS x, yc // 100000 AS y FROM (
      |  SELECT year(o_orderdate)*100 + month(o_orderdate) AS ym,
      |    CAST(sum(CASE WHEN c_mktsegment = 'AUTOMOBILE'
      |      THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) ELSE 0 END)
      |      AS BIGINT) AS xc,
      |    CAST(sum(CASE WHEN c_mktsegment = 'BUILDING'
      |      THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) ELSE 0 END)
      |      AS BIGINT) AS yc,
      |    sum(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS nx,
      |    sum(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS ny
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
      |  GROUP BY 1) t WHERE nx > 0 AND ny > 0""".stripMargin

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
    val g = segMonthly(s, d)
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
      // materialized: consumed twice by the lag self-join (and the
      // LogicalRDD boundary tells BucketSelfJoinGuardSpec what the
      // month grid already guarantees — both sides are calendar-bounded)
      .transform(graft.Fx.materialize)
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
    s"""WITH gg AS ($segMonthlySql),
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

  // ------------------------------------------------------------------
  // q453 — Granger-causality F (lag-1 VAR row) in both directions
  // ------------------------------------------------------------------

  /** q453 — Granger-causality F statistic between the two segment
    * series, BOTH directions: does last month's AUTOMOBILE revenue
    * improve the prediction of this month's BUILDING revenue beyond
    * BUILDING's own lag (and vice versa)? Restricted model
    * y ~ a + b·y₋₁ vs unrestricted y ~ a + b·y₋₁ + c·x₋₁;
    * F = (n−3)·(RSS_r − RSS_u)/RSS_u with 1 numerator df. Distinct
    * from q357 (lead–lag cross-correlation measures association at
    * each lag; Granger asks whether the cross term adds anything OVER
    * the autoregression — a correlated pair with strong own-lag
    * dynamics can have high xcorr and F ≈ 0). Exactness: all centered
    * moments C_ab = nΣab − ΣaΣb ride DECIMAL(38,0)/HUGEINT (entries
    * ≲ 10³⁴ at sf ≤ 0.1; the q297 256-bit escalation note applies
    * beyond); RSS_r·(n·C11) = Cyy·C11 − Cy1² and
    * RSS_u·(n·det) = Cyy·det − Q (det = C11C22−C12²,
    * Q = Cy1²C22 − 2Cy1Cy2C12 + Cy2²C11) are EXACT integers, and F is
    * the fixed-shape double pipeline
    * (n−3)·(rssr·det − sseu·C11)/(sseu·C11) — identical operand order
    * in both engines, r6. Lag pairs join on the month ORDINAL (gaps
    * collapse, stated — same convention as q451's DF step). */
  def q453(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val g = segMonthly(s, d)
      .withColumn("rn", row_number().over(Window.orderBy($"ym")))
      .transform(Fx.materialize)
    val lagged = g.select(($"rn" + 1).as("rn"),
        $"x".as("xl"), $"y".as("yl"))
      .join(g.select($"rn", $"x", $"y"), "rn")
    // direction A->B: dep = y, own lag = yl, cross lag = xl;
    // direction B->A: dep = x, own lag = xl, cross lag = yl
    val dirs = lagged.select(lit("AUTO->BUILD").as("direction"),
        $"y".as("dep"), $"yl".as("own_lag"), $"xl".as("x_lag"))
      .unionByName(lagged.select(lit("BUILD->AUTO").as("direction"),
        $"x".as("dep"), $"xl".as("own_lag"), $"yl".as("x_lag")))
    dirs.groupBy($"direction")
      .agg(count(lit(1)).as("n"),
        sum($"dep").as("sy"), sum($"own_lag").as("s1"), sum($"x_lag").as("s2"),
        sum(expr("cast(dep as decimal(38,0)) * dep")).as("syy"),
        sum(expr("cast(dep as decimal(38,0)) * own_lag")).as("sy1"),
        sum(expr("cast(dep as decimal(38,0)) * x_lag")).as("sy2"),
        sum(expr("cast(own_lag as decimal(38,0)) * own_lag")).as("s11"),
        sum(expr("cast(own_lag as decimal(38,0)) * x_lag")).as("s12"),
        sum(expr("cast(x_lag as decimal(38,0)) * x_lag")).as("s22"))
      .withColumn("cyy", expr("n * syy - cast(sy as decimal(38,0)) * sy"))
      .withColumn("cy1", expr("n * sy1 - cast(sy as decimal(38,0)) * s1"))
      .withColumn("cy2", expr("n * sy2 - cast(sy as decimal(38,0)) * s2"))
      .withColumn("c11", expr("n * s11 - cast(s1 as decimal(38,0)) * s1"))
      .withColumn("c12", expr("n * s12 - cast(s1 as decimal(38,0)) * s2"))
      .withColumn("c22", expr("n * s22 - cast(s2 as decimal(38,0)) * s2"))
      .withColumn("det", expr("c11 * c22 - c12 * c12"))
      .withColumn("q3", expr(
        "cy1 * cy1 * c22 - 2 * cy1 * cy2 * c12 + cy2 * cy2 * c11"))
      .withColumn("rssr", expr("cyy * c11 - cy1 * cy1"))
      .withColumn("sseu", expr("cyy * det - q3"))
      .select($"direction", $"n",
        when($"c11" === 0 || $"det" === 0 || $"sseu" === 0,
          lit(null).cast("double"))
          .otherwise(r6(
            ($"n" - 3).cast("double") *
              ($"rssr".cast("double") * $"det".cast("double") -
                $"sseu".cast("double") * $"c11".cast("double")) /
              ($"sseu".cast("double") * $"c11".cast("double"))))
          .as("f"))
      .orderBy($"direction")
  }

  val q453Sql: String =
    s"""WITH gg AS ($segMonthlySql),
      |rk AS (SELECT x, y, row_number() OVER (ORDER BY ym) AS rn FROM gg),
      |lagged AS (
      |  SELECT b.x, b.y, a.x AS xl, a.y AS yl
      |  FROM rk a JOIN rk b ON b.rn = a.rn + 1),
      |dirs AS (
      |  SELECT 'AUTO->BUILD' AS direction, y AS dep, yl AS own_lag, xl AS x_lag
      |  FROM lagged
      |  UNION ALL
      |  SELECT 'BUILD->AUTO', x, xl, yl FROM lagged),
      |m AS (
      |  SELECT direction, CAST(count(*) AS HUGEINT) AS n,
      |    CAST(sum(dep) AS HUGEINT) AS sy,
      |    CAST(sum(own_lag) AS HUGEINT) AS s1,
      |    CAST(sum(x_lag) AS HUGEINT) AS s2,
      |    CAST(sum(CAST(dep AS HUGEINT) * dep) AS HUGEINT) AS syy,
      |    CAST(sum(CAST(dep AS HUGEINT) * own_lag) AS HUGEINT) AS sy1,
      |    CAST(sum(CAST(dep AS HUGEINT) * x_lag) AS HUGEINT) AS sy2,
      |    CAST(sum(CAST(own_lag AS HUGEINT) * own_lag) AS HUGEINT) AS s11,
      |    CAST(sum(CAST(own_lag AS HUGEINT) * x_lag) AS HUGEINT) AS s12,
      |    CAST(sum(CAST(x_lag AS HUGEINT) * x_lag) AS HUGEINT) AS s22
      |  FROM dirs GROUP BY 1),
      |k AS (
      |  SELECT direction, n,
      |    n * syy - sy * sy AS cyy, n * sy1 - sy * s1 AS cy1,
      |    n * sy2 - sy * s2 AS cy2, n * s11 - s1 * s1 AS c11,
      |    n * s12 - s1 * s2 AS c12, n * s22 - s2 * s2 AS c22
      |  FROM m),
      |f2 AS (
      |  SELECT direction, n, c11,
      |    c11 * c22 - c12 * c12 AS det,
      |    cyy * c11 - cy1 * cy1 AS rssr,
      |    cyy * (c11 * c22 - c12 * c12)
      |      - (cy1 * cy1 * c22 - 2 * cy1 * cy2 * c12 + cy2 * cy2 * c11)
      |      AS sseu
      |  FROM k)
      |SELECT direction, CAST(n AS BIGINT) AS n,
      |  CASE WHEN c11 = 0 OR det = 0 OR sseu = 0 THEN NULL
      |    ELSE floor(CAST(n - 3 AS DOUBLE)
      |      * (CAST(rssr AS DOUBLE) * CAST(det AS DOUBLE)
      |         - CAST(sseu AS DOUBLE) * CAST(c11 AS DOUBLE))
      |      / (CAST(sseu AS DOUBLE) * CAST(c11 AS DOUBLE))
      |      * 1000000 + 0.5) / 1000000 END AS f
      |FROM f2 ORDER BY direction""".stripMargin

  // ------------------------------------------------------------------
  // q454 — Breusch–Pagan heteroscedasticity LM on the volume model
  // ------------------------------------------------------------------

  /** q454 — Breusch–Pagan LM statistic for the monthly model
    * revenue ~ order count: do the residuals' SQUARES still depend on
    * volume? If yes (LM large vs χ²₁), the homoscedastic-error
    * assumption behind q172/q297-style OLS readouts fails for this
    * pair and inference needs robust errors. Construction: cleared
    * residuals u_t = D·y_t − C − B·z_t exactly as q451 (BIGINT at the
    * monthly scale), then the auxiliary regression of w = u² on z in
    * closed form — LM = n·R² = n·C_zw²/(C_zz·C_ww), computed from
    * exact DECIMAL(38,0) centered moments through the fixed-shape
    * double pipeline (C_zw² would need 256 bits; the double form is
    * deterministic on identical operands), r6. Pole: zero-variance z
    * or w → NULL. */
  def q454(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val g = Tables.orders(s, d)
      .groupBy((year($"o_orderdate") * 100 + month($"o_orderdate")).as("ym"))
      .agg(sum(centsK($"o_totalprice")).as("yc"), count(lit(1)).as("z"))
      .select($"ym", expr("yc div 100000").as("y"), $"z")
    val m = g.agg(count(lit(1)).as("n"),
      sum($"z").as("sz"), sum($"y").as("sy"),
      sum(expr("cast(z as decimal(38,0)) * z")).as("szz"),
      sum(expr("cast(z as decimal(38,0)) * y")).as("szy"))
    val aux = g.crossJoin(broadcast(m))
      .select($"n", $"z",
        expr("""(n * szz - cast(sz as decimal(38,0)) * sz) * y
                - (sy * szz - cast(sz as decimal(38,0)) * szy)
                - (n * szy - cast(sz as decimal(38,0)) * sy) * z""").as("u"))
      .select($"n", $"z", expr("(u div 1000000) * (u div 1000000)").as("w"))
    aux.groupBy($"n")
      .agg(sum($"z").as("sz"), sum($"w").as("sw"),
        sum(expr("cast(z as decimal(38,0)) * z")).as("szz"),
        sum(expr("cast(z as decimal(38,0)) * w")).as("szw"),
        sum(expr("cast(w as decimal(38,0)) * w")).as("sww"))
      .withColumn("czz", expr("n * szz - cast(sz as decimal(38,0)) * sz"))
      .withColumn("czw", expr("n * szw - cast(sz as decimal(38,0)) * sw"))
      .withColumn("cww", expr("n * sww - cast(sw as decimal(38,0)) * sw"))
      .select($"n",
        when($"czz" === 0 || $"cww" === 0, lit(null).cast("double"))
          .otherwise(r6($"n".cast("double") *
            ($"czw".cast("double") * $"czw".cast("double")) /
            ($"czz".cast("double") * $"cww".cast("double"))))
          .as("lm"))
  }

  val q454Sql: String =
    """WITH g AS (
      |  SELECT year(o_orderdate)*100 + month(o_orderdate) AS ym,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      // 100000 AS y,
      |    CAST(count(*) AS BIGINT) AS z
      |  FROM orders GROUP BY 1),
      |m AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS n,
      |    CAST(sum(z) AS HUGEINT) AS sz, CAST(sum(y) AS HUGEINT) AS sy,
      |    CAST(sum(CAST(z AS HUGEINT) * z) AS HUGEINT) AS szz,
      |    CAST(sum(CAST(z AS HUGEINT) * y) AS HUGEINT) AS szy
      |  FROM g),
      |aux AS (
      |  SELECT n, z,
      |    ((n * szz - sz * sz) * y - (sy * szz - sz * szy)
      |      - (n * szy - sz * sy) * z) AS u
      |  FROM g CROSS JOIN m),
      |aw AS (SELECT n, z, (u // 1000000) * (u // 1000000) AS w FROM aux),
      |agg AS (
      |  SELECT n, CAST(sum(z) AS HUGEINT) AS sz,
      |    CAST(sum(w) AS HUGEINT) AS sw,
      |    CAST(sum(CAST(z AS HUGEINT) * z) AS HUGEINT) AS szz,
      |    CAST(sum(CAST(z AS HUGEINT) * w) AS HUGEINT) AS szw,
      |    CAST(sum(CAST(w AS HUGEINT) * w) AS HUGEINT) AS sww
      |  FROM aw GROUP BY n),
      |k AS (
      |  SELECT n, n * szz - sz * sz AS czz, n * szw - sz * sw AS czw,
      |    n * sww - sw * sw AS cww
      |  FROM agg)
      |SELECT CAST(n AS BIGINT) AS n,
      |  CASE WHEN czz = 0 OR cww = 0 THEN NULL
      |    ELSE floor(CAST(n AS DOUBLE)
      |      * (CAST(czw AS DOUBLE) * CAST(czw AS DOUBLE))
      |      / (CAST(czz AS DOUBLE) * CAST(cww AS DOUBLE))
      |      * 1000000 + 0.5) / 1000000 END AS lm
      |FROM k""".stripMargin

  // ------------------------------------------------------------------
  // q455 — Chow structural-stability F at a known break (1998-01)
  // ------------------------------------------------------------------

  /** q455 — Chow test of the monthly revenue TREND at the known
    * breakpoint 1998-01. The TPC-H o_orderdate calendar spans
    * 1992-01..1998-08, so the break sits ~8 months from the END of
    * the series (n_post ≈ 8 — a short post-break regime, low power
    * for small shifts; the a-priori-date semantics are the point,
    * not the placement): fit y ~ a + b·t separately before/after and
    * pooled; F = ((SSE_p − SSE₁ − SSE₂)/2)/((SSE₁+SSE₂)/(n−4)) asks
    * whether one line explains both regimes. Distinct from q296
    * (binary segmentation SEARCHES for a mean-shift breakpoint) and
    * q218 (CUSUM accumulates drift): Chow tests REGRESSION-coefficient
    * stability at a date fixed a priori (a policy change, a pipeline
    * migration). Exactness: t is the pooled month ordinal; per-regime
    * SSE numerators E_g = Cyy·Cxx − Cxy² are exact DECIMAL(38,0)
    * (true SSE_g = E_g/(n_g·Cxx_g)); F is the fixed-shape double
    * pipeline over the three exact (E, n, Cxx) triples, r6. Poles:
    * a regime with < 3 months or zero time-variance → NULL. */
  def q455(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val g = Tables.orders(s, d)
      .groupBy((year($"o_orderdate") * 100 + month($"o_orderdate")).as("ym"))
      .agg(sum(centsK($"o_totalprice")).as("yc"))
      .select($"ym", expr("yc div 100000").as("y"))
      .withColumn("t", row_number().over(Window.orderBy($"ym")).cast("long"))
      .withColumn("pre", ($"ym" < 199801).cast("int"))
    def moments(pred: org.apache.spark.sql.Column) = Seq(
      sum(when(pred, 1L).otherwise(0L)),
      sum(when(pred, $"t").otherwise(0L)),
      sum(when(pred, $"y").otherwise(0L)),
      sum(when(pred, expr("cast(t as decimal(38,0)) * t")).otherwise(expr("cast(0 as decimal(38,0))"))),
      sum(when(pred, expr("cast(t as decimal(38,0)) * y")).otherwise(expr("cast(0 as decimal(38,0))"))),
      sum(when(pred, expr("cast(y as decimal(38,0)) * y")).otherwise(expr("cast(0 as decimal(38,0))"))))
    val names = Seq("n", "st", "sy", "stt", "sty", "syy")
    val cols =
      moments(lit(true)).zip(names).map { case (c, nm) => c.as(s"p_$nm") } ++
      moments($"pre" === 1).zip(names).map { case (c, nm) => c.as(s"a_$nm") } ++
      moments($"pre" === 0).zip(names).map { case (c, nm) => c.as(s"b_$nm") }
    val m = g.agg(cols.head, cols.tail: _*)
    def sse(p: String) = expr(
      s"""(${p}_n * ${p}_syy - cast(${p}_sy as decimal(38,0)) * ${p}_sy)
          * (${p}_n * ${p}_stt - cast(${p}_st as decimal(38,0)) * ${p}_st)
          - (${p}_n * ${p}_sty - cast(${p}_st as decimal(38,0)) * ${p}_sy)
            * (${p}_n * ${p}_sty - cast(${p}_st as decimal(38,0)) * ${p}_sy)""")
    def cxx(p: String) = expr(
      s"${p}_n * ${p}_stt - cast(${p}_st as decimal(38,0)) * ${p}_st")
    val k = m
      .withColumn("e_p", sse("p")).withColumn("v_p", cxx("p"))
      .withColumn("e_a", sse("a")).withColumn("v_a", cxx("a"))
      .withColumn("e_b", sse("b")).withColumn("v_b", cxx("b"))
    k.select($"a_n".cast("long").as("n_pre"), $"b_n".cast("long").as("n_post"),
      when($"a_n" < 3 || $"b_n" < 3 ||
          $"v_a" === 0 || $"v_b" === 0 || $"v_p" === 0 ||
          $"e_a" + $"e_b" === 0, lit(null).cast("double"))
        .otherwise {
          val sseP = $"e_p".cast("double") /
            ($"p_n".cast("double") * $"v_p".cast("double"))
          val sseA = $"e_a".cast("double") /
            ($"a_n".cast("double") * $"v_a".cast("double"))
          val sseB = $"e_b".cast("double") /
            ($"b_n".cast("double") * $"v_b".cast("double"))
          r6(((sseP - sseA - sseB) / 2.0) /
            ((sseA + sseB) / ($"p_n".cast("double") - 4.0)))
        }.as("f"))
  }

  val q455Sql: String = {
    def mom(pred: String, p: String) =
      s"""sum(CASE WHEN $pred THEN 1 ELSE 0 END) AS ${p}_n,
         |    sum(CASE WHEN $pred THEN t ELSE 0 END) AS ${p}_st,
         |    sum(CASE WHEN $pred THEN y ELSE 0 END) AS ${p}_sy,
         |    sum(CASE WHEN $pred THEN CAST(t AS HUGEINT) * t ELSE 0 END) AS ${p}_stt,
         |    sum(CASE WHEN $pred THEN CAST(t AS HUGEINT) * y ELSE 0 END) AS ${p}_sty,
         |    sum(CASE WHEN $pred THEN CAST(y AS HUGEINT) * y ELSE 0 END) AS ${p}_syy""".stripMargin
    def sse(p: String) =
      s"""(${p}_n * ${p}_syy - ${p}_sy * ${p}_sy)
         * (${p}_n * ${p}_stt - ${p}_st * ${p}_st)
         - (${p}_n * ${p}_sty - ${p}_st * ${p}_sy)
           * (${p}_n * ${p}_sty - ${p}_st * ${p}_sy)"""
    def cxx(p: String) = s"${p}_n * ${p}_stt - ${p}_st * ${p}_st"
    s"""WITH g AS (
       |  SELECT ym, yc // 100000 AS y,
       |    row_number() OVER (ORDER BY ym) AS t,
       |    CASE WHEN ym < 199801 THEN 1 ELSE 0 END AS pre
       |  FROM (SELECT year(o_orderdate)*100 + month(o_orderdate) AS ym,
       |          CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
       |            AS BIGINT) AS yc
       |        FROM orders GROUP BY 1) t0),
       |m AS (
       |  SELECT
       |    ${mom("TRUE", "p")},
       |    ${mom("pre = 1", "a")},
       |    ${mom("pre = 0", "b")}
       |  FROM g),
       |k AS (
       |  SELECT CAST(a_n AS BIGINT) AS n_pre, CAST(b_n AS BIGINT) AS n_post,
       |    CAST(p_n AS HUGEINT) AS pn,
       |    a_n, b_n,
       |    ${sse("p")} AS e_p, ${cxx("p")} AS v_p,
       |    ${sse("a")} AS e_a, ${cxx("a")} AS v_a,
       |    ${sse("b")} AS e_b, ${cxx("b")} AS v_b
       |  FROM m)
       |SELECT n_pre, n_post,
       |  CASE WHEN a_n < 3 OR b_n < 3 OR v_a = 0 OR v_b = 0 OR v_p = 0
       |         OR e_a + e_b = 0 THEN NULL
       |    ELSE floor(
       |      ((CAST(e_p AS DOUBLE) / (CAST(pn AS DOUBLE) * CAST(v_p AS DOUBLE))
       |        - CAST(e_a AS DOUBLE) / (CAST(a_n AS DOUBLE) * CAST(v_a AS DOUBLE))
       |        - CAST(e_b AS DOUBLE) / (CAST(b_n AS DOUBLE) * CAST(v_b AS DOUBLE)))
       |       / 2.0)
       |      / ((CAST(e_a AS DOUBLE) / (CAST(a_n AS DOUBLE) * CAST(v_a AS DOUBLE))
       |          + CAST(e_b AS DOUBLE) / (CAST(b_n AS DOUBLE) * CAST(v_b AS DOUBLE)))
       |         / (CAST(pn AS DOUBLE) - 4.0))
       |      * 1000000 + 0.5) / 1000000 END AS f
       |FROM k""".stripMargin
  }

  // ------------------------------------------------------------------
  // q456 — Ansari–Bradley rank scale test (order-value dispersion)
  // ------------------------------------------------------------------

  /** q456 — Ansari–Bradley two-sample SCALE test: do AUTOMOBILE and
    * FURNITURE order values have the same dispersion around their
    * common center? Ranks from the nearest extreme (a_i = min(r_i,
    * N+1−r_i), midranks for ties) pile LOW scores on values far from
    * the center, so a group with wider spread collects a LOWER score
    * sum — the rank-based complement to q373 (Levene works on
    * absolute deviations from group means; AB needs no moments at
    * all, which is what makes it robust to the heavy order-value
    * tail). Everything is integer: doubled midranks
    * 2r = 2·cum_before + cnt + 1 kill the ½ ties introduce, doubled
    * scores a2 = min(2r, 2(N+1)−2r), W2 = Σ_{group1} a2 exact, and
    * the tie-exact expected value E[W2] = n1·Σcnt·a2/N is one
    * truncating micro-division of DECIMAL(38,0) integers.
    *
    * Scale shape: the corpus collapses to the VALUE GRID (one groupBy
    * on the cent value), and the global rank prefix-sum is
    * [[Ranking.groupRunningSum]] — range-partitioned two-phase scan,
    * no single task ever sorts the grid (the grid of a money column
    * grows with the corpus; a global window here is exactly what
    * WindowStragglerGuardSpec's r13 extension rejects). */
  def q456(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val vals = Tables.orders(s, d)
      .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
      .filter($"c_mktsegment".isin("AUTOMOBILE", "FURNITURE"))
      .select(centsK($"o_totalprice").as("c"),
        ($"c_mktsegment" === "AUTOMOBILE").cast("long").as("g1"))
    val grid = vals.groupBy($"c")
      .agg(count(lit(1)).as("cnt"), sum($"g1").as("cnt1"))
    val ranked = Ranking.groupRunningSum(grid, Seq(), 32, "cnt", $"c")
      .withColumn("r2", lit(2L) * $"run_before" + $"cnt" + 1L)
    val tot = ranked.agg(sum($"cnt").as("nn"), sum($"cnt1").as("n1"))
    ranked.crossJoin(broadcast(tot))
      .withColumn("a2", least($"r2", lit(2L) * ($"nn" + 1L) - $"r2"))
      .groupBy($"nn", $"n1")
      .agg(sum($"cnt1" * $"a2").as("w2"),
        sum(expr("cast(cnt as decimal(38,0)) * a2")).as("sa2"))
      .select($"n1", ($"nn" - $"n1").as("n2"), $"w2",
        expr("(n1 * sa2 * 1000000) div nn").cast("long").as("e2_micro"))
  }

  val q456Sql: String =
    """WITH vals AS (
      |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c,
      |    CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END AS g1
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE c_mktsegment IN ('AUTOMOBILE', 'FURNITURE')),
      |grid AS (
      |  SELECT c, CAST(count(*) AS BIGINT) AS cnt,
      |    CAST(sum(g1) AS BIGINT) AS cnt1
      |  FROM vals GROUP BY 1),
      |rk AS (
      |  SELECT cnt, cnt1,
      |    2 * COALESCE(sum(cnt) OVER (ORDER BY c
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      + cnt + 1 AS r2
      |  FROM grid),
      |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS nn,
      |               CAST(sum(cnt1) AS BIGINT) AS n1 FROM rk),
      |sc AS (
      |  SELECT nn, n1, cnt, cnt1,
      |    least(r2, 2 * (nn + 1) - r2) AS a2
      |  FROM rk CROSS JOIN tot)
      |SELECT n1, nn - n1 AS n2,
      |  CAST(sum(cnt1 * a2) AS BIGINT) AS w2,
      |  CAST((n1 * sum(CAST(cnt AS HUGEINT) * a2) * 1000000) // nn AS BIGINT)
      |    AS e2_micro
      |FROM sc GROUP BY nn, n1""".stripMargin

  lazy val all: Seq[QueryDef] = Seq(
    QueryDef("q451_engle_granger", q451, Some(q451Sql)),
    QueryDef("q452_kpss_stationarity", q452, Some(q452Sql)),
    QueryDef("q453_granger_f", q453, Some(q453Sql)),
    QueryDef("q454_breusch_pagan", q454, Some(q454Sql)),
    QueryDef("q455_chow_break", q455, Some(q455Sql)),
    QueryDef("q456_ansari_bradley", q456, Some(q456Sql)),
    QueryDef("q459_cooks_distance", q459, Some(q459Sql)),
    QueryDef("q460_diebold_mariano", q460, Some(q460Sql)),
    QueryDef("q462_cochrane_orcutt", q462, Some(q462Sql)),
    QueryDef("q464_newey_west_ratio", q464, Some(q464Sql)),
    QueryDef("q466_pettitt_changepoint", q466, Some(q466Sql)))

  // ------------------------------------------------------------------
  // q464 — Newey-West (HAC) variance inflation ratio
  // ------------------------------------------------------------------

  /** q464 — Newey-West HAC variance-inflation ratio for the monthly
    * trend fit: S/gamma0 where S = gamma0 + 2*sum_{l=1..L}
    * (1 - l/(L+1))*gamma_l is the Bartlett-kernel long-run variance of
    * the residuals (L = 4, stated). The ratio is the factor by which
    * serially-correlated errors inflate the naive OLS variance - the
    * quantitative companion to q462 (which corrects the SLOPE, while
    * this prices the INFERENCE): ratio near 1 means homoskedastic-
    * serial-free standard errors are fine, ratio far above 1 means
    * every q172-family t-statistic is overstated by about its square
    * root. Exactness: cleared residuals v as in q459 (the clearing
    * factor cancels in the ratio); autocovariance numerators
    * gamma_l' = sum v_t*v_{t-l} are exact DECIMAL(38,0); the weights
    * cross-multiply by (L+1) so ratio_micro = ((5*gamma0' +
    * 2*sum(5-l)*gamma_l')*10^6) div (5*gamma0') is one truncating
    * division of exact integers. Pole: zero residual variance ->
    * NULL. */
  def q464(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val g = Tables.orders(s, d)
      .groupBy((year($"o_orderdate") * 100 + month($"o_orderdate")).as("ym"))
      .agg(sum(centsK($"o_totalprice")).as("yc"))
      .select($"ym", expr("yc div 100000").as("y"))
      .withColumn("t", row_number().over(Window.orderBy($"ym")).cast("long"))
    val m = g.agg(count(lit(1)).as("n"),
      sum($"t").as("st"), sum($"y").as("sy"),
      sum(expr("cast(t as decimal(38,0)) * t")).as("stt"),
      sum(expr("cast(t as decimal(38,0)) * y")).as("sty"))
    val base = g.crossJoin(broadcast(m))
      .select($"t", $"n",
        expr("""(n * stt - cast(st as decimal(38,0)) * st) * (n * y - sy)
                - (n * sty - cast(st as decimal(38,0)) * sy) * (n * t - st)""")
          .as("v"))
      .transform(Fx.materialize)
    val lags = base.select($"t", $"v")
      .join(base.select($"t", $"v".as("vl"), explode(sequence(lit(0), lit(4))).as("l"))
        .select(($"t" + $"l").as("t"), $"l", $"vl"), "t")
      .groupBy($"l").agg(sum(expr("v * vl")).as("gam"))
    lags.agg(
        sum(when($"l" === 0, $"gam")).as("g0"),
        sum(when($"l" > 0, (lit(5) - $"l") * $"gam" * 2).otherwise(expr("cast(0 as decimal(38,0))"))).as("wsum"))
      .crossJoin(broadcast(base.select($"n").limit(1)))
      .select($"n", lit(4).as("max_lag"),
        when($"g0" === 0 || $"g0".isNull, lit(null).cast("long"))
          .otherwise(expr("((5 * g0 + wsum) * 1000000) div (5 * g0)")
            .cast("long"))
          .as("hac_ratio_micro"))
  }

  val q464Sql: String =
    """WITH g0 AS (
      |  SELECT year(o_orderdate)*100 + month(o_orderdate) AS ym,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      // 100000 AS y
      |  FROM orders GROUP BY 1),
      |g AS (SELECT y, CAST(row_number() OVER (ORDER BY ym) AS BIGINT) AS t
      |      FROM g0),
      |m AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS n,
      |    CAST(sum(t) AS HUGEINT) AS st, CAST(sum(y) AS HUGEINT) AS sy,
      |    CAST(sum(CAST(t AS HUGEINT) * t) AS HUGEINT) AS stt,
      |    CAST(sum(CAST(t AS HUGEINT) * y) AS HUGEINT) AS sty
      |  FROM g),
      |base AS (
      |  SELECT t, n,
      |    (n * stt - st * st) * (n * y - sy)
      |      - (n * sty - st * sy) * (n * t - st) AS v
      |  FROM g CROSS JOIN m),
      |lags AS (
      |  SELECT l.l, sum(c.v * p.v) AS gam
      |  FROM (SELECT unnest(range(0, 5)) AS l) l
      |  JOIN base p ON TRUE
      |  JOIN base c ON c.t = p.t + l.l
      |  GROUP BY 1),
      |agg AS (
      |  SELECT
      |    sum(CASE WHEN l = 0 THEN gam END) AS g0m,
      |    sum(CASE WHEN l > 0 THEN (5 - l) * gam * 2 ELSE 0 END) AS wsum
      |  FROM lags)
      |SELECT (SELECT CAST(n AS BIGINT) FROM m) AS n, 4 AS max_lag,
      |  CASE WHEN g0m = 0 OR g0m IS NULL THEN NULL
      |    ELSE CAST(((5 * g0m + wsum) * 1000000) // (5 * g0m) AS BIGINT)
      |    END AS hac_ratio_micro
      |FROM agg""".stripMargin

  // ------------------------------------------------------------------
  // q466 — Pettitt rank-based change-point test
  // ------------------------------------------------------------------

  /** q466 — Pettitt change-point test on monthly revenue: the
    * nonparametric Mann-Whitney-family statistic
    * U_t = sum_{i<=t} sum_{j>t} sign(x_i - x_j), with the change
    * point at argmax|U_t| and K = max|U_t|. Completes the
    * change-detection triptych: q218 (CUSUM, mean-shift direction
    * over time), q296 (binary segmentation, SSE-optimal split), and
    * q455 (Chow, KNOWN date) all work on moments - Pettitt is
    * RANK-based, so one wild month cannot fake or mask a level shift
    * the way it can with squared-error statistics. All integer
    * (signs, sums over the bounded month-grid pair fan-out); argmax
    * tie-break = earliest month, stated. */
  def q466(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val g = Tables.orders(s, d)
      .groupBy((year($"o_orderdate") * 100 + month($"o_orderdate")).as("ym"))
      .agg(sum(centsK($"o_totalprice")).as("yc"))
      .select($"ym", expr("yc div 100000").as("y"))
      .withColumn("t", row_number().over(Window.orderBy($"ym")).cast("long"))
      .transform(Fx.materialize)
    val pairs = g.as("a").join(g.as("b"), $"a.t" < $"b.t")
      .select($"a.t".as("i"), $"b.t".as("j"),
        signum($"a.y" - $"b.y").cast("long").as("sg"))
    val cuts = g.select($"t".as("cut"), $"ym")
      .filter($"cut" < (select_max_t(g)))
    val u = cuts.join(pairs, $"i" <= $"cut" && $"j" > $"cut")
      .groupBy($"cut", $"ym").agg(sum($"sg").as("u_t"))
    u.orderBy(abs($"u_t").desc, $"ym").limit(1)
      .select($"ym".as("break_ym"), abs($"u_t").as("k_stat"), $"u_t")
  }

  // bounded-grid max(t): a 1-row broadcast, not a window
  private def select_max_t(g: DataFrame): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{max => fmax}
    val mx = g.agg(fmax(org.apache.spark.sql.functions.col("t"))).head().getLong(0)
    lit(mx)
  }

  val q466Sql: String =
    """WITH g0 AS (
      |  SELECT year(o_orderdate)*100 + month(o_orderdate) AS ym,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      // 100000 AS y
      |  FROM orders GROUP BY 1),
      |g AS (SELECT ym, y, CAST(row_number() OVER (ORDER BY ym) AS BIGINT) AS t
      |      FROM g0),
      |pairs AS (
      |  SELECT a.t AS i, b.t AS j,
      |    CAST(sign(a.y - b.y) AS BIGINT) AS sg
      |  FROM g a JOIN g b ON a.t < b.t),
      |cuts AS (SELECT t AS cut, ym FROM g WHERE t < (SELECT max(t) FROM g)),
      |u AS (
      |  SELECT c.cut, c.ym, CAST(sum(p.sg) AS BIGINT) AS u_t
      |  FROM cuts c JOIN pairs p ON p.i <= c.cut AND p.j > c.cut
      |  GROUP BY 1, 2)
      |SELECT ym AS break_ym, abs(u_t) AS k_stat, u_t
      |FROM u ORDER BY abs(u_t) DESC, ym LIMIT 1""".stripMargin

  // ------------------------------------------------------------------
  // q462 — Cochrane–Orcutt AR(1)-corrected trend slope
  // ------------------------------------------------------------------

  /** q462 — Cochrane–Orcutt one-step correction of the monthly trend
    * fit: estimate the residual AR(1) coefficient ρ̂ from the naive
    * OLS residuals, quasi-difference the data (y′ = y_t − ρ̂y_{t−1},
    * t′ = t − ρ̂(t−1)) and refit. When q459/q454's diagnostics show
    * serially-correlated errors, the naive slope's standard
    * inference is wrong AND the slope itself is inefficient — this is
    * the classic textbook remedy, reported as (ρ̂, naive slope,
    * corrected slope) so the drift in the slope measures how much the
    * autocorrelation was distorting the trend. Exactness: cleared
    * residuals v_t as in q459; ρ̂_micro = (Σv_{t−1}v_t·10⁶) div
    * Σv_{t−1}² is a truncating division of exact DECIMAL(38,0) sums;
    * the quasi-differenced series lives on the exact 10⁻⁶ grid
    * (Y = 10⁶·y_t − ρ̂_micro·y_{t−1} — BIGINT, the common 10⁶ factor
    * cancels in the slope), and both slopes come out of the
    * fixed-shape double pipeline on exact moments, r6. */
  def q462(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val g = Tables.orders(s, d)
      .groupBy((year($"o_orderdate") * 100 + month($"o_orderdate")).as("ym"))
      .agg(sum(centsK($"o_totalprice")).as("yc"))
      .select($"ym", expr("yc div 100000").as("y"))
      .withColumn("t", row_number().over(Window.orderBy($"ym")).cast("long"))
      .transform(Fx.materialize)
    val m = g.agg(count(lit(1)).as("n"),
      sum($"t").as("st"), sum($"y").as("sy"),
      sum(expr("cast(t as decimal(38,0)) * t")).as("stt"),
      sum(expr("cast(t as decimal(38,0)) * y")).as("sty"))
    val base = g.crossJoin(broadcast(m))
      .withColumn("cxx", expr("n * stt - cast(st as decimal(38,0)) * st"))
      .withColumn("cxy", expr("n * sty - cast(st as decimal(38,0)) * sy"))
      .withColumn("v", expr("cxx * (n * y - sy) - cxy * (n * t - st)"))
      .transform(Fx.materialize)
    val rho = base.select($"t", $"v")
      .join(base.select(($"t" + 1).as("t"), $"v".as("vp")), "t")
      .agg(sum(expr("vp * v")).as("num"), sum(expr("vp * vp")).as("den"))
      .select(when($"den" === 0, lit(null).cast("long"))
        .otherwise(expr("(num * 1000000) div den").cast("long"))
        .as("rho_micro"))
    val qd = base.select($"t", $"y")
      .join(base.select(($"t" + 1).as("t"), $"y".as("yp")), "t")
      .crossJoin(broadcast(rho))
      .filter($"rho_micro".isNotNull)
      .select(
        (lit(1000000L) * $"t" - $"rho_micro" * ($"t" - 1L)).as("tt"),
        (lit(1000000L) * $"y" - $"rho_micro" * $"yp").as("yy"))
    val m2 = qd.agg(count(lit(1)).as("n2"),
      sum($"tt").as("s1"), sum($"yy").as("s2"),
      sum(expr("cast(tt as decimal(38,0)) * tt")).as("s11"),
      sum(expr("cast(tt as decimal(38,0)) * yy")).as("s12"))
    m.crossJoin(broadcast(rho)).crossJoin(broadcast(m2))
      .withColumn("cxx", expr("n * stt - cast(st as decimal(38,0)) * st"))
      .withColumn("cxy", expr("n * sty - cast(st as decimal(38,0)) * sy"))
      .withColumn("det2", expr("n2 * s11 - cast(s1 as decimal(38,0)) * s1"))
      .withColumn("num2", expr("n2 * s12 - cast(s1 as decimal(38,0)) * s2"))
      .select($"n", $"rho_micro",
        when($"cxx" === 0, lit(null).cast("double"))
          .otherwise(r6($"cxy".cast("double") / $"cxx".cast("double")))
          .as("slope_naive"),
        when($"det2" === 0, lit(null).cast("double"))
          .otherwise(r6($"num2".cast("double") / $"det2".cast("double")))
          .as("slope_corrected"))
  }

  val q462Sql: String =
    """WITH g0 AS (
      |  SELECT year(o_orderdate)*100 + month(o_orderdate) AS ym,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      // 100000 AS y
      |  FROM orders GROUP BY 1),
      |g AS (SELECT y, CAST(row_number() OVER (ORDER BY ym) AS BIGINT) AS t
      |      FROM g0),
      |m AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS n,
      |    CAST(sum(t) AS HUGEINT) AS st, CAST(sum(y) AS HUGEINT) AS sy,
      |    CAST(sum(CAST(t AS HUGEINT) * t) AS HUGEINT) AS stt,
      |    CAST(sum(CAST(t AS HUGEINT) * y) AS HUGEINT) AS sty
      |  FROM g),
      |base AS (
      |  SELECT t, y,
      |    n * stt - st * st AS cxx, n * sty - st * sy AS cxy,
      |    (n * stt - st * st) * (n * y - sy)
      |      - (n * sty - st * sy) * (n * t - st) AS v
      |  FROM g CROSS JOIN m),
      |rho AS (
      |  SELECT CASE WHEN sum(p.v * c.v) IS NULL OR sum(p.v * p.v) = 0
      |    THEN NULL
      |    ELSE CAST((sum(p.v * c.v) * 1000000) // sum(p.v * p.v) AS BIGINT)
      |    END AS rho_micro
      |  FROM base c JOIN base p ON c.t = p.t + 1),
      |qd AS (
      |  SELECT 1000000 * c.t - r.rho_micro * (c.t - 1) AS tt,
      |    1000000 * c.y - r.rho_micro * p.y AS yy
      |  FROM base c JOIN base p ON c.t = p.t + 1
      |  CROSS JOIN rho r WHERE r.rho_micro IS NOT NULL),
      |m2 AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS n2,
      |    CAST(sum(tt) AS HUGEINT) AS s1, CAST(sum(yy) AS HUGEINT) AS s2,
      |    CAST(sum(CAST(tt AS HUGEINT) * tt) AS HUGEINT) AS s11,
      |    CAST(sum(CAST(tt AS HUGEINT) * yy) AS HUGEINT) AS s12
      |  FROM qd)
      |SELECT CAST(n AS BIGINT) AS n, rho.rho_micro,
      |  CASE WHEN n * stt - st * st = 0 THEN NULL
      |    ELSE floor(CAST(n * sty - st * sy AS DOUBLE)
      |      / CAST(n * stt - st * st AS DOUBLE) * 1000000 + 0.5) / 1000000
      |    END AS slope_naive,
      |  CASE WHEN n2 * s11 - s1 * s1 = 0 THEN NULL
      |    ELSE floor(CAST(n2 * s12 - s1 * s2 AS DOUBLE)
      |      / CAST(n2 * s11 - s1 * s1 AS DOUBLE) * 1000000 + 0.5) / 1000000
      |    END AS slope_corrected
      |FROM m CROSS JOIN rho CROSS JOIN m2""".stripMargin

  // ------------------------------------------------------------------
  // q459 — regression influence diagnostics (leverage + Cook's D)
  // ------------------------------------------------------------------

  /** q459 — influence diagnostics for the monthly revenue trend fit:
    * per month, the leverage h_t (how far the month sits in the time
    * design — ends of the sample pull hardest) and Cook's distance
    * D_t = e_t²·h_t / (p·s²·(1−h_t)²), the standard "which
    * observations OWN this regression" readout that belongs next to
    * q455 (a structural break often first appears as a run of
    * high-D months) and before trusting any q172-family slope.
    * Exactness: cleared residual v_t = Cxx·(n·y_t−Σy) − Cxy·(n·t−Σt)
    * (true e_t = v_t/(n·Cxx)) and leverage numerator
    * H_t = Cxx + (n·t−Σt)² (true h_t = H_t/(n·Cxx)) are exact
    * DECIMAL(38,0); leverage, Cook's D and the 4/n flag come through
    * the fixed-shape double pipeline on those integers, r6. */
  def q459(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val g = Tables.orders(s, d)
      .groupBy((year($"o_orderdate") * 100 + month($"o_orderdate")).as("ym"))
      .agg(sum(centsK($"o_totalprice")).as("yc"))
      .select($"ym", expr("yc div 100000").as("y"))
      .withColumn("t", row_number().over(Window.orderBy($"ym")).cast("long"))
    val m = g.agg(count(lit(1)).as("n"),
      sum($"t").as("st"), sum($"y").as("sy"),
      sum(expr("cast(t as decimal(38,0)) * t")).as("stt"),
      sum(expr("cast(t as decimal(38,0)) * y")).as("sty"))
    val base = g.crossJoin(broadcast(m))
      .withColumn("cxx", expr("n * stt - cast(st as decimal(38,0)) * st"))
      .withColumn("cxy", expr("n * sty - cast(st as decimal(38,0)) * sy"))
      .withColumn("v", expr("cxx * (n * y - sy) - cxy * (n * t - st)"))
      .withColumn("hn", expr("cxx + cast(n * t - st as decimal(38,0)) * (n * t - st)"))
      .transform(Fx.materialize)
    val sse = base.agg(sum(expr("v * v")).as("svv")).select($"svv")
    val nc = $"n".cast("double") * $"cxx".cast("double")
    val e = $"v".cast("double") / nc
    val h = $"hn".cast("double") / nc
    val s2 = ($"svv".cast("double") / (nc * nc)) / ($"n".cast("double") - 2.0)
    val dCook = e * e * h / (lit(2.0) * s2 * (lit(1.0) - h) * (lit(1.0) - h))
    base.crossJoin(broadcast(sse))
      .filter($"cxx" =!= 0 && $"n" > 2)
      .select($"ym", r6(h).as("leverage"), r6(dCook).as("cook_d"),
        (dCook > lit(4.0) / $"n".cast("double")).cast("int").as("influential"))
      .orderBy($"ym")
  }

  val q459Sql: String =
    """WITH g0 AS (
      |  SELECT year(o_orderdate)*100 + month(o_orderdate) AS ym,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      // 100000 AS y
      |  FROM orders GROUP BY 1),
      |g AS (SELECT ym, y,
      |        CAST(row_number() OVER (ORDER BY ym) AS BIGINT) AS t
      |      FROM g0),
      |m AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS n,
      |    CAST(sum(t) AS HUGEINT) AS st, CAST(sum(y) AS HUGEINT) AS sy,
      |    CAST(sum(CAST(t AS HUGEINT) * t) AS HUGEINT) AS stt,
      |    CAST(sum(CAST(t AS HUGEINT) * y) AS HUGEINT) AS sty
      |  FROM g),
      |base AS (
      |  SELECT ym, n,
      |    n * stt - st * st AS cxx,
      |    (n * stt - st * st) * (n * y - sy)
      |      - (n * sty - st * sy) * (n * t - st) AS v,
      |    (n * stt - st * st) + (n * t - st) * (n * t - st) AS hn
      |  FROM g CROSS JOIN m),
      |sse AS (SELECT sum(v * v) AS svv FROM base)
      |SELECT ym,
      |  floor(CAST(hn AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(cxx AS DOUBLE))
      |    * 1000000 + 0.5) / 1000000 AS leverage,
      |  floor(
      |    (CAST(v AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(cxx AS DOUBLE)))
      |    * (CAST(v AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(cxx AS DOUBLE)))
      |    * (CAST(hn AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(cxx AS DOUBLE)))
      |    / (2.0
      |       * ((CAST(svv AS DOUBLE) / ((CAST(n AS DOUBLE) * CAST(cxx AS DOUBLE))
      |            * (CAST(n AS DOUBLE) * CAST(cxx AS DOUBLE))))
      |          / (CAST(n AS DOUBLE) - 2.0))
      |       * (1.0 - CAST(hn AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(cxx AS DOUBLE)))
      |       * (1.0 - CAST(hn AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(cxx AS DOUBLE))))
      |    * 1000000 + 0.5) / 1000000 AS cook_d,
      |  CASE WHEN
      |    (CAST(v AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(cxx AS DOUBLE)))
      |    * (CAST(v AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(cxx AS DOUBLE)))
      |    * (CAST(hn AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(cxx AS DOUBLE)))
      |    / (2.0
      |       * ((CAST(svv AS DOUBLE) / ((CAST(n AS DOUBLE) * CAST(cxx AS DOUBLE))
      |            * (CAST(n AS DOUBLE) * CAST(cxx AS DOUBLE))))
      |          / (CAST(n AS DOUBLE) - 2.0))
      |       * (1.0 - CAST(hn AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(cxx AS DOUBLE)))
      |       * (1.0 - CAST(hn AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(cxx AS DOUBLE))))
      |    > 4.0 / CAST(n AS DOUBLE) THEN 1 ELSE 0 END AS influential
      |FROM base CROSS JOIN sse
      |WHERE cxx <> 0 AND n > 2
      |ORDER BY ym""".stripMargin

  // ------------------------------------------------------------------
  // q460 — Diebold–Mariano forecast-accuracy comparison
  // ------------------------------------------------------------------

  /** q460 — Diebold–Mariano comparison of two forecasting rules on
    * monthly revenue: naive (last month) vs seasonal-naive (same
    * month last year), squared-error loss. The loss differential
    * d_t = (y−f₁)² − (y−f₂)² has DM statistic d̄/se(d̄); reported
    * CROSS-MULTIPLIED as t²_micro = (n−1)·(Σd)²·10⁶ div
    * (n·Σd² − (Σd)²) plus sign(Σd) — exactly the integer-only square
    * of the t statistic (no sqrt crosses the engine boundary), the
    * q268/q448 convention. This is the MISSING judgement layer over
    * q331 (MASE scores one model against a benchmark; DM says whether
    * the difference between two models is real). Negative sign →
    * the naive rule wins. Evaluation months are those with BOTH
    * forecasts defined (t ≥ 13 on the month ordinal, gaps collapse —
    * stated). */
  def q460(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val g = Tables.orders(s, d)
      .groupBy((year($"o_orderdate") * 100 + month($"o_orderdate")).as("ym"))
      .agg(sum(centsK($"o_totalprice")).as("yc"))
      .select($"ym", expr("yc div 100000").as("y"))
      .withColumn("t", row_number().over(Window.orderBy($"ym")).cast("long"))
      .transform(Fx.materialize)
    val dts = g.select($"t", $"y")
      .join(g.select(($"t" + 1).as("t"), $"y".as("f1")), "t")
      .join(g.select(($"t" + 12).as("t"), $"y".as("f12")), "t")
      .select(expr(
        """cast(y - f1 as decimal(38,0)) * (y - f1)
           - cast(y - f12 as decimal(38,0)) * (y - f12)""").as("d"))
    dts.agg(count(lit(1)).as("n"), sum($"d").as("sd"),
        sum(expr("d * d")).as("sdd"))
      .select($"n",
        when($"sd" > 0, 1).when($"sd" < 0, -1).otherwise(0).as("sign"),
        when($"n" * $"sdd" - $"sd" * $"sd" === 0, lit(null).cast("long"))
          .otherwise(expr(
            "((n - 1) * sd * sd * 1000000) div (n * sdd - sd * sd)")
            .cast("long"))
          .as("t2_micro"))
  }

  val q460Sql: String =
    """WITH g0 AS (
      |  SELECT year(o_orderdate)*100 + month(o_orderdate) AS ym,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      // 100000 AS y
      |  FROM orders GROUP BY 1),
      |g AS (SELECT y, CAST(row_number() OVER (ORDER BY ym) AS BIGINT) AS t
      |      FROM g0),
      |dts AS (
      |  SELECT CAST(c.y - p1.y AS HUGEINT) * (c.y - p1.y)
      |       - CAST(c.y - p12.y AS HUGEINT) * (c.y - p12.y) AS d
      |  FROM g c JOIN g p1 ON c.t = p1.t + 1
      |           JOIN g p12 ON c.t = p12.t + 12),
      |agg AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS n, sum(d) AS sd,
      |    sum(d * d) AS sdd
      |  FROM dts)
      |SELECT CAST(n AS BIGINT) AS n,
      |  CASE WHEN sd > 0 THEN 1 WHEN sd < 0 THEN -1 ELSE 0 END AS sign,
      |  CASE WHEN n * sdd - sd * sd = 0 THEN NULL
      |    ELSE CAST(((n - 1) * sd * sd * 1000000) // (n * sdd - sd * sd)
      |      AS BIGINT) END AS t2_micro
      |FROM agg""".stripMargin
}
