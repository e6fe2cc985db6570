package graft

import graft.operators.Ranking
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RankingSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random fixture: 200 rows, 3 groups, repeated
  // sort values so tie-breaks matter
  private lazy val df = (1 to 200).map { i =>
    (i.toLong, s"g${i % 3}", (i * 37) % 25)
  }.toDF("id", "grp", "v").repartition(7)

  test("seqIds equals a global row_number over the same total order") {
    val got = Ranking.seqIds(df, 5, $"v".desc, $"id")
      .select($"id", $"seq_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.withColumn("rn",
        row_number().over(Window.orderBy($"v".desc, $"id")).cast("long"))
      .select($"id", $"rn")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("groupRanks equals row_number partitioned by the group") {
    val got = Ranking.groupRanks(df, Seq("grp"), 5, $"v".asc, $"id")
      .select($"id", $"rank")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.withColumn("rn",
        row_number().over(Window.partitionBy($"grp").orderBy($"v".asc, $"id")).cast("long"))
      .select($"id", $"rn")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("groupRanks is stable across partition counts") {
    val a = Ranking.groupRanks(df, Seq("grp"), 2, $"v".asc, $"id")
      .select($"id", $"rank").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = Ranking.groupRanks(df, Seq("grp"), 11, $"v".asc, $"id")
      .select($"id", $"rank").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }

  test("null group values rank as their own class, like the window") {
    val withNulls = (1 to 40).map { i =>
      (i.toLong, if (i % 4 == 0) null else s"g${i % 3}", i * 13 % 7)
    }.toDF("id", "grp", "v").repartition(5)
    val got = Ranking.groupRanks(withNulls, Seq("grp"), 3, $"v".asc, $"id")
      .select($"id", $"rank")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = withNulls.withColumn("rn",
        row_number().over(Window.partitionBy($"grp").orderBy($"v".asc, $"id")).cast("long"))
      .select($"id", $"rn")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want) // includes the 10 null-group rows
    assert(got.size == 40)
  }

  test("no group-partitioned window appears in the groupRanks plan") {
    val plan = Ranking.groupRanks(df, Seq("grp"), 5, $"v".asc, $"id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window in plan:\n$plan")
  }

  test("groupRunningSum equals the exclusive sum window, incl. null groups, across partition counts") {
    val data = (1 to 60).map { i =>
      (i.toLong, if (i % 5 == 0) null else s"g${i % 3}", (i * 17 % 9 + 1).toLong)
    }.toDF("id", "grp", "w").repartition(7)
    val want = data.withColumn("rb",
        coalesce(sum($"w").over(Window.partitionBy($"grp").orderBy($"id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"id", $"rb")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (parts <- Seq(2, 9)) {
      val got = Ranking.groupRunningSum(data, Seq("grp"), parts, "w", $"id")
        .select($"id", $"run_before")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"parts=$parts")
      assert(got.size == 60)
    }
  }
}
