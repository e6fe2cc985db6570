package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Hybrid hot/cold join: exact parity with the plain join, and the
  * plan actually differentiates — hot keys through a broadcast join,
  * cold keys through the shuffle path.
  */
class HybridJoinSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = {
    // 50k rows, ~90% on key 1 (the hot key); small side 0..1999
    val big = spark.range(0, 50000)
      .select(when(col("id") % 10 < 9, lit(1L)).otherwise(col("id") % 2000)
        .as("k"), col("id").as("payload"))
    val small = spark.range(0, 2000)
      .select(col("id").as("k"), concat(lit("dim_"), col("id")).as("v"))
    (big, small)
  }

  test("hybridJoin == plain inner join, row for row") {
    val (big, small) = fixture
    val plain = big.join(small, "k")
    val hybrid = Skew.hybridJoin(big, small, "k", hotThreshold = 1000L)
    assert(hybrid.count() === plain.count())
    assert(hybrid.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(hybrid).count() === 0)
  }

  test("plan differentiates: hot slice broadcasts, cold slice shuffles") {
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      // forbid automatic broadcasts so the only BroadcastHashJoin left
      // is the one hybridJoin asked for — proving the differentiation
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val (big, small) = fixture
      val hybrid = Skew.hybridJoin(big, small, "k", hotThreshold = 1000L)
      assert(hybrid.count() > 0)
      val plan = hybrid.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        "hot slice should ride an explicit broadcast:\n" + plan.take(800))
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        "cold slice should take the shuffle path:\n" + plan.take(800))
    } finally {
      saved match {
        case Some(v) => conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None => conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
  }

  test("no hot keys above threshold -> degenerates to the plain shuffle join") {
    val big = spark.range(0, 5000).select((col("id") % 500).as("k"), col("id").as("p"))
    val small = spark.range(0, 500).select(col("id").as("k"), lit("v").as("v"))
    val hybrid = Skew.hybridJoin(big, small, "k", hotThreshold = 1000L)
    assert(hybrid.count() === 5000)
  }
}
