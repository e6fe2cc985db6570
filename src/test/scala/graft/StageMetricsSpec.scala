package graft

import graft.operators.StageMetrics

class StageMetricsSpec extends SparkSpec {

  test("observe metrics report rows and null counts with no extra scan (K7)") {
    import spark.implicits._
    val df = Seq(("a", Some(1)), ("b", None), ("c", Some(3))).toDF("k", "v")
    val (instrumented, obs) = StageMetrics.observed(df, "clean_stage", Some("v"))
    assert(instrumented.count() == 3)
    val m = obs.get
    assert(m("rows") == 3L)
    assert(m("nulls_v") == 1L)
  }
}
