package graft

/** CI form of the round-16 scan audit (r16 verdict #2): ExplainAudit
  * prints `scans=` per query, but nothing FAILED when a new query
  * re-read a table N× needlessly — the q552-first-draft class (its
  * per-rung UNION scanned `documents` four times where one pass
  * suffices) could recur silently. This sweep compiles every
  * registered query's physical plan and enforces a per-query planned
  * parquet-scan budget:
  *
  *   - queries listed in src/test/resources/scan_budgets.tsv (the
  *     inherent multi-scanners, seeded from the round-17 audit — e.g.
  *     q354's schema-wide inclusion-dependency sweep at 33 scans of 6
  *     tables, q308's per-feature drift passes, q179's independent DQ
  *     constraint probes, q91/q207's two-phase designs) may use at
  *     most their RECORDED scan count;
  *   - every other query must scan each distinct table at most once
  *     (scans ≤ distinct tables) — the `Fx.materialize` discipline
  *     for multi-consumer intermediates.
  *
  * Raising a budget (or adding a row) is a deliberate, reviewed edit
  * of the TSV, regenerable via
  * `runMain graft.ExplainAudit /root/testdata/sf0.001 budgets`.
  */
class ScanBudgetGuardSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private lazy val budgets: Map[String, Int] = {
    val in = getClass.getResourceAsStream("/scan_budgets.tsv")
    require(in != null, "scan_budgets.tsv missing from test resources")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines()
      .filterNot(l => l.startsWith("#") || l.trim.isEmpty)
      .map { l =>
        val parts = l.split("\t")
        parts(0) -> parts(1).toInt
      }.toMap
    finally src.close()
  }

  test("every registered query stays inside its planned parquet-scan budget") {
    val skip = graft.operators.StreamingQueries.all.map(_.name).toSet
    val offenders = SparkEntry.registry.filterNot(q => skip(q.name)).flatMap { q =>
      val scans = PlanAudit.parquetScanTables(q.fn(spark, sf))
      val budget = budgets.getOrElse(q.name, scans.distinct.size)
      if (scans.size > budget)
        Some(s"${q.name}: ${scans.size} planned scans (budget $budget; " +
          s"tables ${scans.groupBy(identity).map { case (t, xs) => s"$t×${xs.size}" }.mkString(",")})")
      else None
    }
    assert(offenders.isEmpty,
      "queries exceeding their scan budget (re-reading a table costs a " +
        "full extra pass at 100 TB — materialize the shared intermediate " +
        "with Fx.materialize, or deliberately whitelist in scan_budgets.tsv):\n  " +
        offenders.mkString("\n  "))
  }

  test("budget rows stay live: every whitelisted name is a registered query") {
    // a renamed/retired query must drop its TSV row, or the whitelist
    // rots into a list of names the sweep never checks
    val names = SparkEntry.registry.map(_.name).toSet
    val dead = budgets.keys.filterNot(names)
    assert(dead.isEmpty, s"stale scan_budgets.tsv rows: ${dead.mkString(", ")}")
  }

  test("positive control: the guard catches the q552-first-draft redundant-scan shape") {
    // Reconstruct the regression class this sweep exists for: a
    // per-rung UNION that re-reads `documents` once per rung instead
    // of deriving all rungs from one scan. The budget logic (unlisted
    // query → scans ≤ distinct tables) must flag it.
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def rung(w: Int) = docs.select(col("doc_id"), lit(w).as("wlen"))
    val regressed = rung(8).union(rung(16)).union(rung(32)).union(rung(64))
    val scans = PlanAudit.parquetScanTables(regressed)
    assert(scans.size === 4 && scans.distinct.size === 1,
      s"fixture did not produce the expected 4×-scan plan: $scans")
    assert(scans.size > scans.distinct.size,
      "guard predicate failed to flag the deliberately-regressed fixture")
  }
}
