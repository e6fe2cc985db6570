package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Adaptive Query Execution behaviors the 100 TB design leans on,
  * pinned so a Spark upgrade or conf drift can't silently lose them.
  * Salting (Skew.scala) is the manual fallback; AQE skew-join split is
  * the first line of defense and needs no query rewrite.
  */
class AqeSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("AQE splits a skewed sort-merge join partition (skew=true in final plan)") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // local[4] fixtures are tiny — scale the skew thresholds down so
      // the hot key trips the same code path a hot 100 GB partition would
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16k")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8k")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      // 50k rows, ~90% on key 1 → one hot shuffle partition
      val left = spark.range(0, 50000)
        .select((when(rand(7) < 0.9, lit(1L)).otherwise(col("id"))).as("k"),
          col("id").as("payload"))
      val right = spark.range(0, 2000).select(col("id").as("k"), lit("dim").as("v"))
      val joined = left.join(right, "k")
      // collect() executes THIS Dataset's queryExecution — count() would
      // run a separate aggregate execution, leaving this plan un-adapted
      assert(joined.collect().length > 0)

      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case other => other.toString
      }
      assert(finalPlan.contains("skew=true"),
        "expected AQE to mark the hot partition skewed:\n" + finalPlan.take(800))
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
