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

  /** Strategy auto-selection (round-11 directive): the window form for
    * small groups, the two-phase form once any group exceeds the
    * threshold — identical ranks either way. Strategy is asserted from
    * the PLAN (a Window node is present exactly when the window form
    * ran), not from timing. */
  test("groupRanksAuto picks window on uniform groups, two-phase on a planted whale group") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    // uniform: 40 groups x 50 rows, max group 50 <= threshold 1000
    val uniform = (1 to 2000).map(i => (i.toLong, s"g${i % 40}", i * 13 % 31))
      .toDF("id", "grp", "v").repartition(5)
    val viaAuto = Ranking.groupRanksAuto(uniform, Seq("grp"), 5,
      Seq($"v".asc, $"id"), maxGroupRowsForWindow = 1000L)
    assert(viaAuto.queryExecution.optimizedPlan
      .collect { case w: LWindow => w }.nonEmpty,
      "uniform input should take the single-shuffle window form")

    // skewed: one whale group with 5000 rows > threshold 1000
    val skewed = (1 to 6000).map { i =>
      (i.toLong, if (i <= 5000) "whale" else s"g${i % 20}", i * 13 % 31)
    }.toDF("id", "grp", "v").repartition(5)
    val autoSkew = Ranking.groupRanksAuto(skewed, Seq("grp"), 5,
      Seq($"v".asc, $"id"), maxGroupRowsForWindow = 1000L)
    assert(autoSkew.queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.nonEmpty => w
      }.isEmpty,
      "whale group must route to the two-phase form (no group window)")

    // both choices produce the window-equivalent ranks
    def ranksOf(df: org.apache.spark.sql.DataFrame) =
      df.select($"id", $"rank").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (data <- Seq(uniform, skewed)) {
      val got = ranksOf(Ranking.groupRanksAuto(data, Seq("grp"), 5,
        Seq($"v".asc, $"id"), maxGroupRowsForWindow = 1000L))
      val want = data.withColumn("rank", row_number()
          .over(Window.partitionBy($"grp").orderBy($"v".asc, $"id")).cast("long"))
        .select($"id", $"rank").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want)
    }

    // a pre-computed profile short-circuits the profiling scan
    val forced = Ranking.groupRanksAuto(uniform, Seq("grp"), 5,
      Seq($"v".asc, $"id"), maxGroupRowsForWindow = 1000L,
      profiledMaxGroupRows = Some(999999L))
    assert(forced.queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.nonEmpty => w
      }.isEmpty,
      "supplied profile must override the scan-based choice")
  }
}
