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

  // ---- data-quality gates (Deequ-style constraint checking) ----------

  /** One declared constraint over a pre-aggregated metrics row:
    * `metric`/`pass` are column expressions over that single row. */
  final case class Gate(name: String, metric: org.apache.spark.sql.Column,
      threshold: Double, pass: org.apache.spark.sql.Column)

  /** Renders a 1-row metrics DataFrame into one verdict row per gate —
    * (gate, metric, threshold, passed). The expensive part (the metric
    * aggregation) is the caller's single scan; this is a constant-size
    * explode, so a 100-gate suite still reads the table once. */
  def gateReport(metrics: DataFrame, gates: Seq[Gate]): DataFrame = {
    val rows = gates.map { g =>
      struct(lit(g.name).as("gate"), g.metric.cast("double").as("metric"),
        lit(g.threshold).as("threshold"), g.pass.cast("int").as("passed"))
    }
    metrics.select(explode(array(rows: _*)).as("g"))
      .select(col("g.gate"), col("g.metric"), col("g.threshold"), col("g.passed"))
      .orderBy(col("gate"))
  }

  /** q136 — quality gates on lineitem: completeness, key uniqueness,
    * value ranges, referential integrity. Everything but the orphan
    * count is ONE aggregate pass; the orphan count is a left-anti
    * probe against the (runtime-filtered) orders key set, then a 1×1
    * cross join stitches the two metric rows together. The uniqueness
    * gate genuinely FAILS on this corpus — (l_orderkey, l_linenumber)
    * is not a key in the synthetic data — which is the point: a gate
    * suite that cannot fail verifies nothing. Pass verdicts compare
    * raw counts (never the rounded metric), so the verdict is exact. */
  def q136(s: SparkSession, d: String): DataFrame = {
    import graft.Fx.r6
    val li = Tables.lineitem(s, d)
    val m = li.agg(
      count(lit(1)).as("cnt"),
      count(col("l_shipdate")).as("ship"),
      count_distinct(struct(col("l_orderkey"), col("l_linenumber"))).as("uq"),
      min(col("l_quantity")).as("qmin"),
      max(col("l_quantity")).as("qmax"),
      max(col("l_discount")).as("dmax"))
    val orphans = li.join(Tables.orders(s, d).select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("orphans"))
    val metrics = m.crossJoin(orphans)
    gateReport(metrics, Seq(
      Gate("completeness_shipdate", r6(col("ship").cast("double") / col("cnt")),
        1.0, col("ship") === col("cnt")),
      Gate("uniqueness_order_line", r6(col("uq").cast("double") / col("cnt")),
        1.0, col("uq") === col("cnt")),
      Gate("quantity_range", r6(col("qmax")), 50.0,
        col("qmin") >= 1.0 && col("qmax") <= 50.0),
      Gate("discount_max", r6(col("dmax")), 0.1, col("dmax") <= 0.1),
      Gate("referential_orders", r6(col("orphans").cast("double")), 0.0,
        col("orphans") === 0)))
  }

  val q136Sql: String = {
    import graft.Fx.sqlR6
    s"""WITH m AS (
       |  SELECT count(*) AS cnt, count(l_shipdate) AS ship,
       |    count(DISTINCT (l_orderkey, l_linenumber)) AS uq,
       |    min(l_quantity) AS qmin, max(l_quantity) AS qmax,
       |    max(l_discount) AS dmax
       |  FROM lineitem),
       |o AS (
       |  SELECT count(*) AS orphans FROM lineitem l
       |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l.l_orderkey)),
       |g AS (SELECT * FROM m, o)
       |SELECT gate, metric, threshold, passed FROM (
       |  SELECT 'completeness_shipdate' AS gate,
       |    ${sqlR6("CAST(ship AS DOUBLE) / cnt")} AS metric,
       |    1.0 AS threshold, CAST(ship = cnt AS INT) AS passed FROM g
       |  UNION ALL SELECT 'uniqueness_order_line',
       |    ${sqlR6("CAST(uq AS DOUBLE) / cnt")}, 1.0, CAST(uq = cnt AS INT) FROM g
       |  UNION ALL SELECT 'quantity_range', ${sqlR6("qmax")}, 50.0,
       |    CAST(qmin >= 1.0 AND qmax <= 50.0 AS INT) FROM g
       |  UNION ALL SELECT 'discount_max', ${sqlR6("dmax")}, 0.1,
       |    CAST(dmax <= 0.1 AS INT) FROM g
       |  UNION ALL SELECT 'referential_orders', ${sqlR6("CAST(orphans AS DOUBLE)")},
       |    0.0, CAST(orphans = 0 AS INT) FROM g)
       |ORDER BY gate""".stripMargin
  }

  /** q207 — join-key skew profile: for each candidate join-key domain,
    * the exact numbers a shuffle planner needs — row count, distinct
    * keys, hottest-key frequency, and the self-join size Σc² (the
    * second frequency moment F2: the exact output size of a self
    * equi-join on that key, and the quantity a skew-salting decision
    * is really about). `skew` normalizes: F2·keys/n² = 1 for a
    * perfectly uniform domain, → keys for a single hot key.
    *
    * Scale shape: one groupBy per domain (map-side partial combine —
    * the shuffle carries one row per distinct key per map partition),
    * then a 1-row aggregate; domains union to a 4-row report. All
    * moments are exact integers; the one division is a fixed-shape
    * double op over them. (Bound: Σc² accumulates in int64, exact
    * while the hottest key stays under ~3·10⁹ rows — beyond that,
    * shard the domain or switch the f2 column to DECIMAL.) */
  def q207(s: SparkSession, d: String): DataFrame = {
    def dom(name: String, df: DataFrame, key: String): DataFrame =
      df.groupBy(col(key)).agg(count(lit(1)).as("c"))
        .agg(sum(col("c")).as("n_rows"), count(lit(1)).as("n_keys"),
          max(col("c")).as("max_freq"), sum(col("c") * col("c")).as("f2"))
        .select(lit(name).as("domain"), col("n_rows"), col("n_keys"),
          col("max_freq"), col("f2"),
          graft.Fx.r6(col("f2").cast("double") * col("n_keys").cast("double") /
            (col("n_rows").cast("double") * col("n_rows").cast("double")))
            .as("skew"))
    dom("events.user_id", Tables.events(s, d), "user_id")
      .unionByName(dom("lineitem.l_orderkey", Tables.lineitem(s, d), "l_orderkey"))
      .unionByName(dom("lineitem.l_partkey", Tables.lineitem(s, d), "l_partkey"))
      .unionByName(dom("orders.o_custkey", Tables.orders(s, d), "o_custkey"))
      .orderBy(col("domain"))
  }

  val q207Sql: String = {
    import graft.Fx.sqlR6
    def dom(name: String, table: String, key: String): String =
      s"""SELECT '$name' AS domain, CAST(sum(c) AS BIGINT) AS n_rows,
         |  count(*) AS n_keys, CAST(max(c) AS BIGINT) AS max_freq,
         |  CAST(sum(c * c) AS BIGINT) AS f2,
         |  ${sqlR6("CAST(sum(c * c) AS DOUBLE) * CAST(count(*) AS DOUBLE) / " +
             "(CAST(sum(c) AS DOUBLE) * CAST(sum(c) AS DOUBLE))")} AS skew
         |FROM (SELECT count(*) AS c FROM $table GROUP BY $key) t""".stripMargin
    Seq(dom("events.user_id", "events", "user_id"),
      dom("lineitem.l_orderkey", "lineitem", "l_orderkey"),
      dom("lineitem.l_partkey", "lineitem", "l_partkey"),
      dom("orders.o_custkey", "orders", "o_custkey"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY domain")
  }

  // ---- functional-dependency discovery (Metanome-style profiling) ---

  private val fdCols =
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")

  /** q289 — functional-dependency discovery over a declared column
    * set: for every ordered pair (A → B), does each A-value determine
    * exactly one B-value? The verdict per pair is exact — group by A,
    * count groups where B takes >1 distinct value — giving the
    * schema-inference readout (keys hold every FD; enum columns fail
    * against each other) a data catalog publishes. Null semantics
    * mirrored: the null A-group is its own class, countDistinct
    * ignores null Bs in both engines.
    *
    * Scale shape: one aggregate per LHS column over a materialized
    * 4-column projection — the candidate set is bounded METADATA
    * (columns), never data; each aggregate is an ordinary
    * map-side-combined groupBy on its key. No windows, no pairs of
    * rows — FD checking is grouping, which is why it scales where
    * row-pair profiling cannot. */
  def q289(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val df = graft.Fx.materialize(
      Tables.load(s, d, "orders").select(fdCols.map(col): _*))
    val perLhs = fdCols.map { lhs =>
      val rhss = fdCols.filterNot(_ == lhs)
      val g = df.groupBy(col(lhs))
        .agg(count_distinct(col(rhss.head)).as(s"__d_${rhss.head}"),
          rhss.tail.map(r => count_distinct(col(r)).as(s"__d_$r")): _*)
      val stacked = rhss.map(r => struct(lit(r).as("rhs"), col(s"__d_$r").as("nd")))
      g.select(explode(array(stacked: _*)).as("p"))
        .select(lit(lhs).as("lhs"), $"p.rhs".as("rhs"), $"p.nd".as("nd"))
        .groupBy($"lhs", $"rhs")
        .agg(count(lit(1)).as("n_groups"),
          sum(($"nd" > 1L).cast("long")).as("n_violating"))
    }
    perLhs.reduce(_ unionByName _)
      .withColumn("holds", ($"n_violating" === 0L).cast("int"))
      .orderBy($"lhs", $"rhs")
  }

  val q289Sql: String = {
    val pairs = for {
      lhs <- fdCols; rhs <- fdCols if rhs != lhs
    } yield
      s"""SELECT '$lhs' AS lhs, '$rhs' AS rhs,
         |  CAST(count(*) AS BIGINT) AS n_groups,
         |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
         |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0 AS INT) AS holds
         |FROM (SELECT $lhs, count(DISTINCT $rhs) AS nd
         |      FROM orders GROUP BY $lhs) t""".stripMargin
    pairs.mkString("", "\nUNION ALL\n", "\nORDER BY lhs, rhs")
  }

  // ---- inclusion-dependency discovery (SPIDER-style profiling) -----

  /** Candidate directed INDs (lhsTable.lhsCol ⊆ rhsTable.rhsCol): the
    * six star-schema FK edges, three reversals (do all orders have
    * lines? all parts sell? all customers order?), and two
    * cross-domain "spurious" candidates small integer domains invite —
    * l_linenumber ⊆ n_nationkey typically HOLDS by accident (1..7 fits
    * inside 0..24), the classic false positive an IND profiler must
    * surface for a human to veto, while p_size ⊆ n_nationkey fails. */
  private val indCands: Seq[(String, String, String, String)] = Seq(
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("orders", "o_orderkey", "lineitem", "l_orderkey"),
    ("part", "p_partkey", "lineitem", "l_partkey"),
    ("customer", "c_custkey", "orders", "o_custkey"),
    ("lineitem", "l_linenumber", "nation", "n_nationkey"),
    ("part", "p_size", "nation", "n_nationkey"))

  /** q354 — inclusion-dependency discovery over a declared candidate
    * grid: for each directed pair A ⊆ B, how many distinct A-values
    * are missing from B? Completes the profiling triad — q207 says how
    * keys are DISTRIBUTED, q289 which columns DETERMINE each other
    * within a table, q354 which columns REFERENCE each other across
    * tables (the discovered-FK readout a catalog publishes, and the
    * referential-integrity audit a pipeline runs after every load).
    * Exact: violation counts are integers off distinct-collapsed
    * anti-joins; standard IND semantics ignore null LHS values.
    *
    * Scale shape: each candidate is two single-column
    * distinct-collapses (column-pruned parquet scans — the only
    * columns read) + one anti-join on key-sized relations, broadcast
    * when the RHS domain is small; the candidate grid is bounded
    * METADATA, so the report is |grid| rows. Value-set hashing (the
    * SPIDER refinement) would share the collapses across candidates;
    * at 11 candidates the straightforward per-pair plan is the better
    * trade. */
  def q354(s: SparkSession, d: String): DataFrame = {
    val rows = indCands.map { case (lt, lc, rt, rc) =>
      val lhs = Tables.load(s, d, lt).select(col(lc).as("v"))
        .filter(col("v").isNotNull).distinct()
      val rhs = Tables.load(s, d, rt).select(col(rc).as("v")).distinct()
      val miss = lhs.join(rhs, Seq("v"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
      lhs.agg(count(lit(1)).as("n_distinct_lhs")).crossJoin(miss)
        .select(lit(s"$lt.$lc").as("lhs"), lit(s"$rt.$rc").as("rhs"),
          col("n_distinct_lhs"), col("n_violations"),
          (col("n_violations") === 0L).cast("int").as("holds"))
    }
    rows.reduce(_ unionByName _).orderBy(col("lhs"), col("rhs"))
  }

  val q354Sql: String = {
    val blocks = indCands.map { case (lt, lc, rt, rc) =>
      s"""SELECT '$lt.$lc' AS lhs, '$rt.$rc' AS rhs,
         |  (SELECT CAST(count(DISTINCT $lc) AS BIGINT) FROM $lt
         |   WHERE $lc IS NOT NULL) AS n_distinct_lhs,
         |  (SELECT CAST(count(*) AS BIGINT)
         |   FROM (SELECT DISTINCT $lc AS v FROM $lt WHERE $lc IS NOT NULL) t
         |   WHERE NOT EXISTS (SELECT 1 FROM $rt WHERE $rc = t.v))
         |    AS n_violations,
         |  (SELECT CAST(count(*) = 0 AS INT)
         |   FROM (SELECT DISTINCT $lc AS v FROM $lt WHERE $lc IS NOT NULL) t
         |   WHERE NOT EXISTS (SELECT 1 FROM $rt WHERE $rc = t.v)) AS holds""".stripMargin
    }
    blocks.mkString("", "\nUNION ALL\n", "\nORDER BY lhs, rhs")
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("q80_profile", q80, Some(q80Sql)),
    QueryDef("q136_quality_gates", q136, Some(q136Sql)),
    QueryDef("q207_join_key_skew", q207, Some(q207Sql)),
    QueryDef("q289_fd_discovery", q289, Some(q289Sql)),
    QueryDef("q354_inclusion_deps", q354, Some(q354Sql)))
}
