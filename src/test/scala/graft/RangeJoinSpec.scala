package graft

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("bucketized range join equals the naive inequality join") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val left = (1 to 300).map(i => (i % 7L, i.toLong, rnd.nextInt(100000).toLong))
      .toDF("k", "lid", "lts")
    val right = (1 to 500).map(i => (i % 7L, 1000L + i, rnd.nextInt(100000).toLong))
      .toDF("k", "rid", "rts")
    val w = 5000L
    val fast = RangeJoin.timeRange(left, right, "k", "lts", "rts", w)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = left.join(right.withColumnRenamed("k", "k2"),
        col("k") === col("k2") && col("rts") >= col("lts") - w && col("rts") <= col("lts"))
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == naive)
    assert(naive.nonEmpty)
  }

  test("range join plans as an equi-join, not nested loop") {
    import spark.implicits._
    val left = Seq((1L, 1L, 10L)).toDF("k", "lid", "lts")
    val right = Seq((1L, 2L, 8L)).toDF("k", "rid", "rts")
    val plan = RangeJoin.timeRange(left, right, "k", "lts", "rts", 5L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"), plan.take(600))
  }
}
