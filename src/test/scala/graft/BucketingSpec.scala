package graft

import graft.sources.Sinks

/** Bucketing evidence: two tables bucketed on the join key must join
  * without a shuffle exchange — the write-time pre-shuffle is the
  * 100 TB co-location strategy for repeated joins on the same key.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without shuffle exchanges") {
    import spark.implicits._
    val facts = (1 to 10000).map(i => (i.toLong % 500, s"f$i", i * 1.0))
      .toDF("k", "tag", "v")
    val dims = (0L until 500L).map(k => (k, s"dim$k")).toDF("k", "name")
    Seq("b_facts", "b_dims").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles.foreach(rm)
          f.delete(): Unit
        }
        rm(loc)
      }
    }
    Sinks.bucketedTable(facts, "b_facts", "k", 8)
    Sinks.bucketedTable(dims, "b_dims", "k", 8)
    // force a non-broadcast join so bucket co-location is what's tested
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_facts").join(spark.table("b_dims"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        plan.take(300))
      // the whole point: no shuffle on either side of the join
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not reshuffle:\n${plan.take(1200)}")
      assert(joined.count() == 10000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
