package graft

import graft.operators.{ScaleQueries, TrainingQueries}
import org.apache.spark.sql.functions._

/** Property checks for the scale-path queries (q147-q150) beyond the
  * cross-engine hash the driver verifies: sketch accuracy, Bloom
  * one-sidedness vs the exact operator, salted-join equivalence, and
  * SCD2 interval invariants.
  */
class ScaleQueriesSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("q147: HLL estimate is within 25% of exact distinct per group") {
    val rows = ScaleQueries.q147(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_distinct").toDouble
      val est = r.getAs[Double]("hll_est")
      assert(math.abs(est - exact) / exact < 0.25,
        s"priority ${r.get(0)}: est $est vs exact $exact")
    }
  }

  test("q148: bloom matches are a superset of q95 exact matches per doc") {
    import spark.implicits._
    val bloom = ScaleQueries.q148(spark, sf)
      .select($"doc_id", $"bloom_matched", $"bloom_contaminated")
    val exact = TrainingQueries.q95(spark, sf)
      .select($"doc_id", $"matched_grams", $"contaminated")
    val joined = bloom.join(exact, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("bloom_matched") >= r.getAs[Long]("matched_grams"),
        s"doc ${r.get(0)}: bloom undercounts")
      assert(r.getAs[Int]("bloom_contaminated") >= r.getAs[Int]("contaminated"))
    }
  }

  test("q149: salted join + salted sum equals the plain join aggregate") {
    import spark.implicits._
    val salted = ScaleQueries.q149(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.supplier(spark, sf), $"l_suppkey" === $"s_suppkey")
      .join(Tables.nation(spark, sf), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(Fx.r2(Fx.r4(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")))).as("rev"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted == plain)
  }

  test("q150: SCD2 intervals chain per customer and cover every order") {
    import spark.implicits._
    val rows = ScaleQueries.q150(spark, sf)
      .orderBy($"o_custkey", $"valid_from", $"first_key").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("o_custkey")).foreach { case (_, hist) =>
      // exactly one open (current) interval, and it is the last one
      assert(hist.count(_.getAs[Int]("is_current") == 1) == 1)
      assert(hist.last.getAs[Int]("is_current") == 1)
      hist.sliding(2).foreach {
        case Array(a, b) =>
          // half-open chaining: this interval ends where the next begins
          assert(a.getAs[AnyRef]("valid_to") == b.getAs[AnyRef]("valid_from"))
          // islands are maximal runs: adjacent intervals change tier
          assert(a.getAs[String]("tier") != b.getAs[String]("tier"))
        case _ => ()
      }
    }
    val nOrders = rows.map(_.getAs[Long]("n_orders")).sum
    assert(nOrders == Tables.orders(spark, sf).count())
  }
}
