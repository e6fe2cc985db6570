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

  val all: Seq[QueryDef] = Seq(
    QueryDef("q91_pagerank_iterative", q91, Some(q91Sql)))
}
