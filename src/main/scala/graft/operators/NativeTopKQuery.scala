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

  val all: Seq[QueryDef] = Seq(
    QueryDef("q30_native_topk", q30, Some(q30Sql), bench = true),
  )
}
