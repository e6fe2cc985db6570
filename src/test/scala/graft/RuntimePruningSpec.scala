package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Pins Spark's two RUNTIME scan-pruning levers — the largest
  * untested 100 TB levers per the r12 verdict:
  *
  *  1. Dynamic partition pruning: q450's star join must plant a
  *     `DynamicPruningExpression` in the partitioned fact scan and
  *     measurably open only the dim-selected month partitions.
  *  2. Runtime bloom-filter join pruning (InjectRuntimeFilter): on a
  *     selective shuffle join the optimizer must inject a
  *     `bloom_filter_might_contain` prefilter on the big side and
  *     measurably cut the rows entering the shuffle.
  *
  * Both are RESULT-neutral (q450's DuckDB oracle checks semantics),
  * so these specs assert the PLAN artifacts and the measured
  * reductions — conf drift or a Spark upgrade silently losing either
  * lever fails the build.
  */
class RuntimePruningSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def finalPlan(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  /** Every physical node, unwrapping the AQE/exchange wrappers that
    * `collect` treats as leaves (QueryStageExec holds its stage plan
    * in a field, not in `children`), plus subquery plans. */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        Seq(r.child)
      case other => other.children
    }
    (p +: kids.flatMap(allNodes)) ++ p.subqueries.flatMap(allNodes)
  }

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("q450: DynamicPruningExpression reaches the fact scan and prunes files (measured)") {
    val df = graft.operators.PruningQueries.q450(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty, "q450 returned no rows at sf0.001")

    val plan = finalPlan(df.queryExecution.executedPlan)
    val factDir = graft.operators.PruningQueries.partitionedFactDir(spark, sf)
    val scans = allNodes(plan).collect {
      case f: FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains(
          new java.io.File(factDir).getName)) => f
    }
    assert(scans.nonEmpty, "no FileSourceScanExec over the partitioned fact:\n" +
      plan.toString.take(1500))
    val fact = scans.head
    assert(fact.partitionFilters.exists(
      _.find(_.isInstanceOf[
        org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression])
        .isDefined),
      s"fact scan has no DynamicPruningExpression; partitionFilters = " +
        fact.partitionFilters.mkString(", "))

    // Measured shrink: the scan must have opened only the dim-selected
    // month partitions, not all ym=… directories on disk.
    val totalParts = new java.io.File(factDir).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("ym="))
    val filesRead = fact.metrics("numFiles").value
    assert(totalParts >= 80, s"expected ~83 ym partitions, found $totalParts")
    // 1995 urgent >430k selects 5 months at sf0.001 (and each ym dir
    // holds one file at this scale) — allow slack but require ≥ 6×.
    assert(filesRead > 0 && filesRead * 6 <= totalParts,
      s"DPP did not shrink the read: $filesRead of $totalParts partitions")
  }

  test("q538: DynamicPruningExpression AND AQE skew split land in one star plan") {
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // sf0.001 fixtures are tiny — scale the skew thresholds down so
      // the hot route partition trips the same code path a hot 100 GB
      // shuffle partition would (hot key ≈ 40× the median here)
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1k",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      // a reduce partition can only split across MAP outputs: the five
      // DPP-selected ~2 KB files must not pack into one scan task
      "spark.sql.files.maxPartitionBytes" -> "2k",
      "spark.sql.files.openCostInBytes" -> "0",
      // the groupBy(flag) above the join could reuse the join's hash
      // partitioning, which makes AQE decline the split (it would add
      // a shuffle); production tuning forces the split when the skew
      // dominates — mirror that here so the assertion is on the lever
      // itself, not on AQE's cost tie-break at toy scale
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true") {
      val df = graft.operators.PruningQueries.q538(spark, sf)
      val rows = df.collect()
      assert(rows.nonEmpty, "q538 returned no rows at sf0.001")

      val plan = finalPlan(df.queryExecution.executedPlan)
      // 1. DPP reached the partitioned fact scan
      val factDir = graft.operators.PruningQueries.partitionedFactDir(spark, sf)
      val scans = allNodes(plan).collect {
        case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains(
            new java.io.File(factDir).getName)) => f
      }
      assert(scans.nonEmpty, "no FileSourceScanExec over the partitioned fact:\n" +
        plan.toString.take(1500))
      assert(scans.head.partitionFilters.exists(
        _.find(_.isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression])
          .isDefined),
        s"fact scan has no DynamicPruningExpression; partitionFilters = " +
          scans.head.partitionFilters.mkString(", "))
      // 2. the same executed plan split the hot route partition
      assert(plan.toString.contains("skew=true"),
        "expected AQE to mark the hot route partition skewed:\n" +
          plan.toString.take(2000))
    }
  }

  test("runtime bloom-filter join: injected might_contain prefilter cuts shuffle input (measured)") {
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // sf0.001 fixtures are tiny: scale the byte thresholds down so
      // the selective join trips the same injection a 100 GB scan
      // would (creation side small + selective, application side big).
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1b",
      // force a shuffle join — a broadcast join already prunes on the
      // stream side, so InjectRuntimeFilter skips broadcastable dims
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true") {
      import spark.implicits._
      val big = Tables.orders(spark, sf)
        .filter($"o_totalprice" > 490000.0)
        .select($"o_orderkey", $"o_totalprice")
      val lines = Tables.lineitem(spark, sf)
        .select($"l_orderkey", $"l_extendedprice")
      val joined = lines.join(big, $"l_orderkey" === $"o_orderkey")
        .agg(count(lit(1)).as("n"), sum($"l_extendedprice").as("rev"))

      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.toLowerCase.contains("might_contain"),
        "no bloom_filter_might_contain injected:\n" + optimized.take(1500))

      assert(joined.collect().nonEmpty)
      val plan = finalPlan(joined.queryExecution.executedPlan)
      // the injected prefilter sits in the scan/filter above lineitem:
      // compare rows surviving it against the full lineitem row count
      val lineScanOut = allNodes(plan).collect {
        case f: FileSourceScanExec
          if f.schema.fieldNames.contains("l_orderkey") => f
      }.map(_.metrics("numOutputRows").value)
      assert(lineScanOut.nonEmpty, "no lineitem scan in final plan")
      val totalLines = Tables.lineitem(spark, sf).count()
      val bloomFilters = allNodes(plan).collect {
        case f: org.apache.spark.sql.execution.FilterExec
          if f.condition.sql.toLowerCase.contains("might_contain") => f
      }
      assert(bloomFilters.nonEmpty,
        "no might_contain FilterExec in the executed plan")
      val survived = bloomFilters.map(_.metrics("numOutputRows").value).min
      // 2 orders qualify at sf0.001 → ~136 true lines; the bloom's
      // false-positive tail must still leave a ≥ 10× cut.
      assert(survived * 10 <= totalLines,
        s"bloom prefilter did not cut rows: $survived of $totalLines survived")
    }
  }
}
