package graft

import graft.plans.TopK
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Descending, NullsLast, SortOrder}

class TopKSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def desc(colName: String): SortOrder =
    SortOrder(UnresolvedAttribute(colName), Descending, NullsLast, Seq.empty)

  test("native top-k per group matches the window-based answer") {
    val part = Tables.part(spark, "/root/testdata/sf0.01")
    val native = TopK.perGroup(part, 3, Seq("p_brand"), desc("p_retailprice"))
      .select("p_brand", "p_partkey", "p_retailprice")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // window reference answer (ties on price broken by partkey are a
    // difference in tie handling — compare on (brand, price) multiset
    // plus exact membership where prices are unique)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("p_brand")).orderBy(col("p_retailprice").desc, col("p_partkey"))
    val windowed = part.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("p_brand", "p_partkey", "p_retailprice")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // per-group sizes must match exactly
    val nativeSizes = native.groupBy(_._1).view.mapValues(_.size).toMap
    val windowSizes = windowed.groupBy(_._1).view.mapValues(_.size).toMap
    assert(nativeSizes == windowSizes)
    // and the kept price multisets must be identical per group
    val priceOf = part.collect().map(r =>
      r.getAs[Long]("p_partkey") -> r.getAs[Double]("p_retailprice")).toMap
    def prices(s: Set[(String, Long)]) =
      s.groupBy(_._1).view.mapValues(_.toSeq.map(p => priceOf(p._2)).sorted).toMap
    assert(prices(native) == prices(windowed))
  }

  test("heap keeps the true top-k under adversarial input order") {
    import spark.implicits._
    // ascending arrival: every new row evicts the current worst
    val df = (1 to 100).map(i => ("g", i)).toDF("g", "v").repartition(1)
    val top = TopK.perGroup(df, 5, Seq("g"), desc("v"))
      .collect().map(_.getInt(1)).sorted.toSeq
    assert(top == Seq(96, 97, 98, 99, 100))
  }

  test("multi-key order breaks ties deterministically") {
    import spark.implicits._
    val df = Seq(("g", 1.0, 3L), ("g", 1.0, 1L), ("g", 1.0, 2L), ("g", 0.5, 0L))
      .toDF("g", "s", "id").repartition(2)
    val top = TopK.perGroup(df, 2, Seq("g"), Seq(TopK.desc("s"), TopK.asc("id")))
      .collect().map(_.getLong(2)).sorted.toSeq
    assert(top == Seq(1L, 2L))
  }

  test("high-cardinality groups: 100k groups stream through the heap map") {
    import spark.implicits._
    val df = spark.range(400000)
      .select((col("id") % 100000).as("g"), col("id").as("v"))
    val top = TopK.perGroup(df, 2, Seq("g"), desc("v"))
    assert(top.count() == 200000L)
    val g7 = top.filter(col("g") === 7).collect().map(_.getLong(1)).sorted.toSeq
    assert(g7 == Seq(200007L, 300007L))
  }

  test("GLOBAL top-k (no group columns): partial heaps + final, matches orderBy.limit") {
    import spark.implicits._
    // many partitions so the partial pass genuinely reduces in parallel
    val df = spark.range(0, 100000, 1, 16)
      .select($"id".as("v"), pmod(xxhash64($"id"), lit(1000000)).as("score"))
    val native = TopK.perGroup(df, 7, Seq.empty, Seq(desc("score"), TopK.asc("v")))
      .orderBy($"score".desc, $"v").collect().map(r => (r.getLong(1), r.getLong(0)))
    val expected = df.orderBy($"score".desc, $"v").limit(7)
      .collect().map(r => (r.getLong(1), r.getLong(0)))
    assert(native.toSeq === expected.toSeq)
    // two heap nodes (partial + final), still no Sort below them
    val plan = TopK.perGroup(df, 7, Seq.empty, Seq(desc("score"), TopK.asc("v")))
      .queryExecution.executedPlan.toString
    assert("TopKPerGroup".r.findAllIn(plan).length === 2,
      s"expected partial+final heap pair:\n$plan")
  }

  test("physical plan uses TopKPerGroupExec with no Sort") {
    val part = Tables.part(spark, "/root/testdata/sf0.001")
    val df = TopK.perGroup(part, 3, Seq("p_brand"), desc("p_retailprice"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan.take(400))
    assert(!plan.contains("Sort "), s"no sort expected:\n${plan.take(800)}")
  }
}
