package graft.operators

import graft.{QueryDef, Tables}
import graft.plans.TopK
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Descending, NullsLast, SortOrder}
import org.apache.spark.sql.functions._

/** Oracle-checked query over the NATIVE TopKPerGroup operator
  * (custom LogicalPlan/Strategy/SparkPlan, graft.plans.TopKPerGroup):
  * 3 priciest parts per brand. The sort value folds the tie-break into
  * one monotonic double (price*1e5 − partkey, exact in double range)
  * so the heap's single-ordering semantics match the oracle's
  * row_number exactly.
  */
object NativeTopKQuery {

  def q30(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val part = Tables.part(s, d)
      .withColumn("rank_v", $"p_retailprice" * 100000.0 - $"p_partkey")
    TopK.perGroup(part, 3, Seq("p_brand"),
      SortOrder(UnresolvedAttribute("rank_v"), Descending, NullsLast, Seq.empty))
      .select($"p_brand", $"p_partkey", $"p_retailprice")
      .orderBy($"p_brand", $"p_partkey")
  }

  val q30Sql: String =
    """SELECT p_brand, p_partkey, p_retailprice FROM (
      |  SELECT p_brand, p_partkey, p_retailprice,
      |    row_number() OVER (PARTITION BY p_brand
      |      ORDER BY p_retailprice * 100000.0 - p_partkey DESC) AS rn
      |  FROM part) t
      |WHERE rn <= 3 ORDER BY p_brand, p_partkey""".stripMargin

  /** Heavy-hitter bigrams PER LANGUAGE through the native TopKPerGroup
    * heap: the full bigram count relation streams through bounded
    * per-group heaps — no per-language window sort materializes the
    * whole vocabulary (the vocabulary is huge at corpus scale; k is
    * 5). Ties folded into one monotonic sort value via a count-major,
    * hash-minor composite. */
  def q90(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d).select($"lang", split($"text", " ").as("w"))
    val bigrams = docs.select($"lang",
      explode(when(size($"w") >= 2,
        transform(sequence(lit(1), size($"w") - 1),
          i => concat(element_at($"w", i), lit(" "), element_at($"w", i + 1))))
        .otherwise(array().cast("array<string>"))).as("ng"))
    val counts = bigrams.groupBy($"lang", $"ng").agg(count(lit(1)).as("n"))
    val top = TopK.perGroup(counts, 5, Seq("lang"),
      Seq(TopK.desc("n"), TopK.asc("ng")))
    top.select($"lang", $"ng", $"n").orderBy($"lang", $"n".desc, $"ng")
  }

  val q90Sql: String =
    """SELECT lang, ng, n FROM (
      |  SELECT lang, ng, n, row_number() OVER (PARTITION BY lang
      |    ORDER BY n DESC, ng) AS rn
      |  FROM (
      |    SELECT lang, ng, CAST(count(*) AS BIGINT) AS n FROM (
      |      SELECT lang, unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS ng
      |      FROM (SELECT lang, string_split(text, ' ') AS w FROM documents) t) u
      |    GROUP BY lang, ng) c) r
      |WHERE rn <= 5 ORDER BY lang, n DESC, ng""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q30_native_topk", q30, Some(q30Sql), bench = true),
    QueryDef("q90_topk_bigrams_per_lang", q90, Some(q90Sql)),
  )
}
