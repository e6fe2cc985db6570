package graft.operators

import graft.{Fx, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked similarity-search queries over `embeddings`
  * (64-dim float vectors): brute-force cosine top-k, label centroids,
  * and IVF-style sign-bucketed ANN.
  */
object SimilarityQueries {
  import Fx._

  private def queriesDf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, d).filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
  }

  /** Brute-force cosine top-10 per query vector. */
  def q60(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Similarity.bruteForceTopK(queriesDf(s, d), Tables.embeddings(s, d), k = 10)
      .select($"q_id", $"vec_id", r6($"sim").as("sim"), $"rn".cast("long").as("rn"))
      .orderBy($"q_id", $"rn")
  }

  private val cosSql =
    "list_dot_product(q_vec, t_vec) / (sqrt(list_dot_product(q_vec, q_vec)) * sqrt(list_dot_product(t_vec, t_vec)))"

  val q60Sql: String =
    s"""WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS q_vec
       |           FROM embeddings WHERE vec_id < 5),
       |t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS t_vec FROM embeddings),
       |sims AS (
       |  SELECT q_id, vec_id, $cosSql AS sim
       |  FROM t, q WHERE vec_id <> q_id),
       |ranked AS (
       |  SELECT q_id, vec_id, sim,
       |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rn
       |  FROM sims)
       |SELECT q_id, vec_id, ${sqlR6("sim")} AS sim, CAST(rn AS BIGINT) AS rn
       |FROM ranked WHERE rn <= 10 ORDER BY q_id, rn""".stripMargin

  /** Per-label centroids of the leading dims + vector counts. */
  def q61(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, d)
    e.groupBy($"label")
      .agg(
        count(lit(1)).as("n_vecs"),
        r6(avg(element_at($"embedding", 1).cast("double"))).as("c1"),
        r6(avg(element_at($"embedding", 2).cast("double"))).as("c2"),
        r6(avg(element_at($"embedding", 3).cast("double"))).as("c3"),
        r6(avg(element_at($"embedding", 4).cast("double"))).as("c4"))
      .orderBy($"label")
  }

  val q61Sql: String =
    s"""SELECT label, count(*) AS n_vecs,
       |${sqlR6("avg(CAST(embedding[1] AS DOUBLE))")} AS c1,
       |${sqlR6("avg(CAST(embedding[2] AS DOUBLE))")} AS c2,
       |${sqlR6("avg(CAST(embedding[3] AS DOUBLE))")} AS c3,
       |${sqlR6("avg(CAST(embedding[4] AS DOUBLE))")} AS c4
       |FROM embeddings GROUP BY label ORDER BY label""".stripMargin

  private val ivfBits = 4

  /** IVF-style ANN: sign-bucket equi-join + per-bucket top-5. */
  def q62(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Similarity.ivfTopK(queriesDf(s, d), Tables.embeddings(s, d), k = 5, bits = ivfBits)
      .select($"q_id", $"vec_id", r6($"sim").as("sim"), $"rn".cast("long").as("rn"))
      .orderBy($"q_id", $"rn")
  }

  val q62Sql: String = {
    val qb = Similarity.sqlSignBucket("embedding", ivfBits)
    s"""WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS q_vec,
       |                  $qb AS bucket
       |           FROM embeddings WHERE vec_id < 5),
       |t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS t_vec,
       |             $qb AS bucket FROM embeddings),
       |sims AS (
       |  SELECT q_id, vec_id, $cosSql AS sim
       |  FROM t JOIN q ON t.bucket = q.bucket AND vec_id <> q_id),
       |ranked AS (
       |  SELECT q_id, vec_id, sim,
       |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rn
       |  FROM sims)
       |SELECT q_id, vec_id, ${sqlR6("sim")} AS sim, CAST(rn AS BIGINT) AS rn
       |FROM ranked WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin
  }

  /** Full-64-dim per-label centroids via the typed VectorCentroid
    * Aggregator (two-phase partial/merge), exploded to long format
    * `(label, dim, n_vecs, c)` so every dimension is a scalar column —
    * driver-hashable and mirrored in DuckDB by a per-dim average. */
  def q63(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val centroid = graft.functions.VectorCentroid.centroid(64)
    Tables.embeddings(s, d)
      .groupBy($"label")
      .agg(count(lit(1)).as("n_vecs"), centroid($"embedding").as("centroid"))
      .select($"label", $"n_vecs", posexplode($"centroid"))
      .select($"label", ($"pos" + 1).cast("long").as("dim"), $"n_vecs",
        r6($"col").as("c"))
      .orderBy($"label", $"dim")
  }

  val q63Sql: String =
    s"""SELECT e.label, CAST(d.dim AS BIGINT) AS dim, count(*) AS n_vecs,
       |  ${sqlR6("avg(CAST(e.embedding[d.dim] AS DOUBLE))")} AS c
       |FROM embeddings e, (SELECT unnest(range(1, 65)) AS dim) d
       |GROUP BY e.label, d.dim
       |ORDER BY label, dim""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q60_cosine_topk", q60, Some(q60Sql), bench = true),
    QueryDef("q61_label_centroids", q61, Some(q61Sql)),
    QueryDef("q62_ann_ivf_topk", q62, Some(q62Sql), bench = true),
    QueryDef("q63_centroids_full", q63, Some(q63Sql)),
  )
}
