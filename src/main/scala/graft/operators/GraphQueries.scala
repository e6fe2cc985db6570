package graft.operators

import graft.{Fx, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph computation as a DataFrame LOOP (the pattern for
  * fixed-point algorithms when GraphX's Pregel is more machinery than
  * the job needs): damped PageRank, 2 iterations, over the
  * same-language adjacent-id chain graph of `documents`.
  *
  * Cross-engine determinism for iterative double math: every per-edge
  * contribution and every new rank is re-rounded onto the 1e-6 grid
  * (`Fx.r6`) BEFORE the next step consumes it. Per-node in-degree here
  * is ≤ 2, so grid-value sums stay exact in doubles and both engines
  * walk identical numbers through every iteration — un-rounded
  * iteration would accumulate engine-specific ulps that compound.
  *
  * 100 TB shape: each iteration is one join (ranks ⋈ edges, both
  * hash-partitioned by node id) + one aggregation — the same
  * partitioning reused every round; no driver-side state.
  */
object GraphQueries {
  import Fx._

  private val damp = 0.85
  private val iters = 2

  def q91(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val und = docs.select($"doc_id".as("a"), $"lang")
      .join(docs.select(($"doc_id" - 1).as("a"), $"doc_id".as("b"), $"lang".as("lang_b")),
        Seq("a"))
      .filter($"lang" === $"lang_b")
      .select($"a", $"b")
    val edges = und.union(und.select($"b".as("a"), $"a".as("b"))).cache()
    val deg = edges.groupBy($"a".as("id")).agg(count(lit(1)).as("d"))
    val nDocs = docs.count().toDouble
    var rank = docs.select($"doc_id".as("id"), r6(lit(1.0) / nDocs).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(rank.withColumnRenamed("id", "a"), "a")
        .join(deg.withColumnRenamed("id", "a"), "a")
        .select($"b".as("id"), r6($"rank" / $"d").as("contrib"))
        .groupBy($"id").agg(sum($"contrib").as("c"))
      rank = docs.select($"doc_id".as("id"))
        .join(contrib, Seq("id"), "left_outer")
        .select($"id",
          r6(lit(0.15) / nDocs + lit(damp) * coalesce($"c", lit(0.0))).as("rank"))
    }
    rank.orderBy($"id")
  }

  val q91Sql: String =
    """WITH und AS (
      |  SELECT a.doc_id AS a, b.doc_id AS b
      |  FROM documents a JOIN documents b
      |    ON b.doc_id = a.doc_id + 1 AND a.lang = b.lang),
      |edges AS (SELECT a, b FROM und UNION ALL SELECT b, a FROM und),
      |deg AS (SELECT a AS id, count(*) AS d FROM edges GROUP BY a),
      |n AS (SELECT CAST(count(*) AS DOUBLE) AS cnt FROM documents),
      |r0 AS (SELECT doc_id AS id, floor(1.0 / cnt * 1000000 + 0.5) / 1000000 AS rank
      |       FROM documents CROSS JOIN n),
      |c1 AS (SELECT e.b AS id, sum(floor(r0.rank / deg.d * 1000000 + 0.5) / 1000000) AS c
      |       FROM edges e JOIN r0 ON e.a = r0.id JOIN deg ON deg.id = e.a GROUP BY e.b),
      |r1 AS (SELECT d.doc_id AS id,
      |         floor((0.15 / cnt + 0.85 * coalesce(c1.c, 0)) * 1000000 + 0.5) / 1000000 AS rank
      |       FROM documents d CROSS JOIN n LEFT JOIN c1 ON c1.id = d.doc_id),
      |c2 AS (SELECT e.b AS id, sum(floor(r1.rank / deg.d * 1000000 + 0.5) / 1000000) AS c
      |       FROM edges e JOIN r1 ON e.a = r1.id JOIN deg ON deg.id = e.a GROUP BY e.b),
      |r2 AS (SELECT d.doc_id AS id,
      |         floor((0.15 / cnt + 0.85 * coalesce(c2.c, 0)) * 1000000 + 0.5) / 1000000 AS rank
      |       FROM documents d CROSS JOIN n LEFT JOIN c2 ON c2.id = d.doc_id)
      |SELECT id, rank FROM r2 ORDER BY id""".stripMargin

  /** q209 — k-core peeling (onion decomposition) of the part
    * co-purchase graph: nodes are parts, edges are part pairs bought
    * together in ≥ 1 order, k is the nearest-rank p25 of the initial
    * degree distribution (4·cum ≥ n rule — quantile built by OUR
    * integer-rank definition on both engines, never an engine
    * quantile builtin), and each node is labeled with the ROUND the
    * peel removed it (1..6) or 0 if it survives all six. Labeling by
    * peel round — not bare core membership — keeps the output total
    * and informative even when the graph sits near its percolation
    * threshold and the core itself collapses (this one does).
    *
    * Semantics per round i: a node alive after round i−1 is removed
    * when its degree over the surviving edge set is < k (absent from
    * the degree relation = degree 0); edges survive only with both
    * endpoints alive. Fixed 6 rounds — at convergence further rounds
    * are no-ops, so the fixed bound is exact on converged components
    * (the q91 fixed-iteration precedent).
    *
    * 100 TB shape: edges come from the bounded per-order set explode
    * (q200/q204 discipline — never a row self-join), each round is
    * degree-agg + two semi-joins on the node id's partitioning, and
    * the rounds are data-parallel peels — no driver-side graph. Each
    * round's edge/survivor frames are EAGERLY localCheckpoint-ed:
    * every frame is consumed twice (degree + filter), so uncut
    * lineage doubles per round — 2^6 copies of the base subtree blows
    * the ANALYZER'S heap before a row moves (cache alone doesn't cut
    * the logical plan; checkpointing is the iterative-algorithm
    * discipline Pregel applies internally). */
  def q209(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rounds = 6
    val lp = Tables.lineitem(s, d)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("p")).distinct()
    val e0 = lp.groupBy($"ok")
      .agg(sort_array(collect_list($"p")).as("ps"))
      .select(explode(filter(
        flatten(transform($"ps",
          a => transform($"ps", b => struct(a.as("a"), b.as("b"))))),
        pr => pr("a") < pr("b"))).as("e"))
      .select($"e.a".as("a"), $"e.b".as("b"))
      .distinct()
      .transform(graft.Fx.materialize)
    def degrees(edges: DataFrame): DataFrame =
      edges.select($"a".as("n")).unionAll(edges.select($"b".as("n")))
        .groupBy($"n").agg(count(lit(1)).as("deg"))
    val deg0 = degrees(e0).transform(graft.Fx.materialize)
    // nearest-rank p25 of the initial degrees: min d with 4·cum ≥ n
    val cells = deg0.groupBy($"deg").agg(count(lit(1)).as("c"))
    val cum = org.apache.spark.sql.expressions.Window.orderBy($"deg")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val kDf = cells
      .withColumn("cc", sum($"c").over(cum))
      .withColumn("tot", sum($"c").over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .filter($"cc" * 4 >= $"tot")
      .agg(min($"deg").as("k"))
    var alive = deg0.select($"n") // universe: nodes with ≥ 1 edge
    var edges = e0
    var labels = alive.select($"n", lit(0).as("peel_round"))
    for (i <- 1 to rounds) {
      val dg = degrees(edges)
      val survivors = alive.join(dg, Seq("n"), "left")
        .crossJoin(broadcast(kDf))
        .filter(coalesce($"deg", lit(0L)) >= $"k")
        .select($"n").transform(graft.Fx.materialize)
      val removed = alive.join(survivors, Seq("n"), "left_anti")
      labels = labels.join(removed.withColumn("r", lit(i)), Seq("n"), "left")
        .select($"n",
          when($"peel_round" === 0 && $"r".isNotNull, $"r")
            .otherwise($"peel_round").as("peel_round"))
        .transform(graft.Fx.materialize)
      edges = edges
        .join(survivors.select($"n".as("a")), Seq("a"), "left_semi")
        .join(survivors.select($"n".as("b")), Seq("b"), "left_semi")
        .transform(graft.Fx.materialize)
      alive = survivors
    }
    labels.select($"n".as("part"), $"peel_round").orderBy($"part")
  }

  val q209Sql: String = {
    val rounds = 6
    def deg(e: String) =
      s"(SELECT n, count(*) AS deg FROM (SELECT a AS n FROM $e UNION ALL SELECT b FROM $e) t GROUP BY n)"
    // MATERIALIZED: DuckDB inlines plain CTEs, so the 6-generation
    // chain would expand e0 exponentially (and re-open the parquet
    // until the fd limit dies); materialization evaluates each
    // generation once — the oracle-side analogue of the Spark loop's
    // localCheckpoint.
    val gens = (1 to rounds).map { i =>
      s"""s$i AS MATERIALIZED (
         |  SELECT s.n FROM s${i - 1} s
         |  LEFT JOIN ${deg(s"e${i - 1}")} dg ON s.n = dg.n CROSS JOIN kk
         |  WHERE coalesce(dg.deg, 0) >= kk.k),
         |e$i AS MATERIALIZED (
         |  SELECT a, b FROM e${i - 1}
         |  WHERE a IN (SELECT n FROM s$i) AND b IN (SELECT n FROM s$i))""".stripMargin
    }.mkString(",\n")
    val label = (1 to rounds).map(i =>
      s"WHEN s0.n NOT IN (SELECT n FROM s$i) THEN $i").mkString(" ")
    s"""WITH lp AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
       |e0 AS MATERIALIZED (
       |  SELECT a.p AS a, b.p AS b FROM lp a JOIN lp b
       |  ON a.ok = b.ok AND a.p < b.p GROUP BY 1, 2),
       |s0 AS MATERIALIZED (SELECT n FROM ${deg("e0")} t0),
       |cells AS (SELECT deg, count(*) AS c FROM ${deg("e0")} t1 GROUP BY deg),
       |kk AS (
       |  SELECT min(deg) AS k FROM (
       |    SELECT deg,
       |      sum(c) OVER (ORDER BY deg ROWS BETWEEN UNBOUNDED PRECEDING
       |        AND CURRENT ROW) AS cc,
       |      sum(c) OVER () AS tot
       |    FROM cells) u
       |  WHERE cc * 4 >= tot),
       |$gens
       |SELECT s0.n AS part,
       |  CASE $label ELSE 0 END AS peel_round
       |FROM s0 ORDER BY part""".stripMargin
  }

  /** q323 — label-propagation community detection (synchronous LPA,
    * Raghavan et al. 2007) on the co-purchase part graph (q209's edge
    * set): every node starts as its own label; each round it adopts
    * the most frequent label among its NEIGHBORS, ties broken to the
    * smallest label — the deterministic synchronous variant (the
    * async/random classic is not hash-checkable; sync + min-tie is,
    * and is what GraphFrames' LPA also runs). Three rounds, stopping
    * early stated (like q265's value iteration); output is the
    * community size table. Communities differ from q256's connected
    * components exactly where the graph is dense-with-bridges: LPA
    * splits what CC merges.
    *
    * Scale shape: each round is ONE edges ⋈ labels equi-join +
    * a (node, label) count + an argmax window partitioned by node
    * (high cardinality, frames bounded by degree); generations are
    * materialized so round r's plan does not nest r−1 prior joins —
    * the q209/BPE iterative discipline. */
  def q323(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val lp = Tables.lineitem(s, d)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("p")).distinct()
    val e0 = lp.groupBy($"ok")
      .agg(sort_array(collect_list($"p")).as("ps"))
      .select(explode(filter(
        flatten(transform($"ps",
          a => transform($"ps", b => struct(a.as("a"), b.as("b"))))),
        pr => pr("a") < pr("b"))).as("e"))
      .select($"e.a".as("a"), $"e.b".as("b"))
      .distinct()
    val und = e0.union(e0.select($"b".as("a"), $"a".as("b")))
      .transform(graft.Fx.materialize)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"id").orderBy($"c".desc, $"lbl".asc)
    var labels = und.select($"a".as("id")).distinct()
      .select($"id", $"id".as("lbl"))
      .transform(graft.Fx.materialize)
    for (_ <- 1 to 3) {
      labels = und
        .join(labels.select($"id".as("b"), $"lbl"), "b")
        .groupBy($"a".as("id"), $"lbl")
        .agg(count(lit(1)).as("c"))
        .withColumn("rk", row_number().over(w))
        .filter($"rk" === 1)
        .select($"id", $"lbl")
        .transform(graft.Fx.materialize)
    }
    labels.groupBy($"lbl".as("community"))
      .agg(count(lit(1)).as("n_members"), min($"id").as("min_member"))
      .orderBy($"community")
  }

  val q323Sql: String = {
    val gens = (1 to 3).map { i =>
      s"""l$i AS MATERIALIZED (
         |  SELECT id, lbl FROM (
         |    SELECT e.a AS id, l.lbl, count(*) AS c,
         |      row_number() OVER (PARTITION BY e.a
         |        ORDER BY count(*) DESC, l.lbl) AS rk
         |    FROM und e JOIN l${i - 1} l ON e.b = l.id
         |    GROUP BY e.a, l.lbl) t
         |  WHERE rk = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH lp AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
       |e0 AS MATERIALIZED (
       |  SELECT a.p AS a, b.p AS b FROM lp a JOIN lp b
       |  ON a.ok = b.ok AND a.p < b.p GROUP BY 1, 2),
       |und AS MATERIALIZED (
       |  SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0),
       |l0 AS MATERIALIZED (
       |  SELECT DISTINCT a AS id, a AS lbl FROM und),
       |$gens
       |SELECT lbl AS community, CAST(count(*) AS BIGINT) AS n_members,
       |  min(id) AS min_member
       |FROM l3 GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** q350 — degree assortativity of the co-purchase graph: the
    * Pearson correlation of endpoint degrees over the edge list
    * (Newman 2002) — do popular parts co-sell with other popular
    * parts (assortative, r > 0, retail-bundle structure) or with
    * niche ones (disassortative, r < 0, hub-and-spoke)? The ONE
    * scalar that separates those regimes, and none of the existing
    * graph readouts (triangles q109, PageRank q91, k-core q209, CC,
    * LPA q323) measures it. Exact: degrees are integers off one edge
    * pass; both edge directions contribute (the standard symmetric
    * treatment); the five moment sums ride DECIMAL(38,0) and r is
    * q178's one-sqrt pinned shape (IEEE sqrt is correctly rounded —
    * the only float op in the query).
    *
    * Scale shape: edges are per-order part pairs (≤ lines² per order,
    * order-bounded by the document-model argument); one edge shuffle
    * for degrees, one broadcast-degree join back, one scalar
    * aggregate. */
  def q350(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e0 = Tables.lineitem(s, d)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("p")).distinct()
      .groupBy($"ok")
      .agg(sort_array(collect_list($"p")).as("ps"))
      .select(explode(filter(
        flatten(transform($"ps",
          a => transform($"ps", b => struct(a.as("a"), b.as("b"))))),
        pr => pr("a") < pr("b"))).as("e"))
      .select($"e.a".as("a"), $"e.b".as("b"))
      .distinct()
      .transform(graft.Fx.materialize) // degrees AND the moment pass
    val deg = e0.select($"a".as("n")).unionAll(e0.select($"b".as("n")))
      .groupBy($"n").agg(count(lit(1)).as("deg"))
    val both = e0.unionAll(e0.select($"b".as("a"), $"a".as("b")))
      .join(deg.select($"n".as("a"), $"deg".as("x")), "a")
      .join(deg.select($"n".as("b"), $"deg".as("y")), "b")
    def d38(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val m = both.agg(count(lit(1)).as("k"),
      sum($"x").as("sx"), sum($"y").as("sy"),
      sum(d38($"x") * $"y").as("sxy"),
      sum(d38($"x") * $"x").as("sxx"), sum(d38($"y") * $"y").as("syy"))
    m.select($"k",
        (d38($"k") * $"sxy" - d38($"sx") * $"sy").as("cov_n"),
        (d38($"k") * $"sxx" - d38($"sx") * $"sx").as("vx_n"),
        (d38($"k") * $"syy" - d38($"sy") * $"sy").as("vy_n"))
      .filter($"vx_n" > 0 && $"vy_n" > 0)
      .select(expr("cast(k div 2 as bigint)").as("n_edges"),
        graft.Fx.r6($"cov_n".cast("double") /
          sqrt($"vx_n".cast("double") * $"vy_n".cast("double")))
          .as("assortativity"))
  }

  val q350Sql: String = {
    val r = "CAST(k * sxy - sx * sy AS DOUBLE) / " +
      "sqrt(CAST(k * sxx - sx * sx AS DOUBLE) * CAST(k * syy - sy * sy AS DOUBLE))"
    s"""WITH lp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
       |e0 AS (
       |  SELECT DISTINCT a.p AS a, b.p AS b
       |  FROM lp a JOIN lp b ON a.ok = b.ok AND a.p < b.p),
       |deg AS (
       |  SELECT n, CAST(count(*) AS BIGINT) AS deg
       |  FROM (SELECT a AS n FROM e0 UNION ALL SELECT b FROM e0)
       |  GROUP BY n),
       |ends AS (
       |  SELECT da.deg AS x, db.deg AS y
       |  FROM (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0) e
       |  JOIN deg da ON e.a = da.n JOIN deg db ON e.b = db.n),
       |m AS (
       |  SELECT CAST(count(*) AS HUGEINT) AS k,
       |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
       |    sum(CAST(x AS HUGEINT) * y) AS sxy,
       |    sum(CAST(x AS HUGEINT) * x) AS sxx,
       |    sum(CAST(y AS HUGEINT) * y) AS syy
       |  FROM ends)
       |SELECT CAST(k // 2 AS BIGINT) AS n_edges,
       |  ${graft.Fx.sqlR6(r)} AS assortativity
       |FROM m
       |WHERE k * sxx - sx * sx > 0 AND k * syy - sy * sy > 0""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("q350_degree_assortativity", q350, Some(q350Sql)),
    QueryDef("q91_pagerank_iterative", q91, Some(q91Sql)),
    QueryDef("q209_kcore_peel", q209, Some(q209Sql)),
    QueryDef("q323_label_propagation", q323, Some(q323Sql)))
}
