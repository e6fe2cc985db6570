package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec

/** Plan-shape introspection shared by [[ExplainAudit]] (the human
  * report) and ScanBudgetGuardSpec (the CI gate): per-query
  * parquet-scan attribution from the compiled physical plan.
  */
object PlanAudit {

  /** One entry per parquet scan node in the pre-AQE physical plan
    * (entry = table name, the parquet basename): REPEATS mean the
    * query re-reads a table — N planned scans of a 100 TB table are N
    * full reads (the q552-first-draft class: its per-rung UNION form
    * scanned `documents` four times; `Fx.materialize` on the shared
    * intermediate is the standard fix). Uses `sparkPlan` (pre-AQE):
    * AQE may reuse exchanges at runtime, but every planned scan is one
    * a code change can turn real, so the budget gates the plan, not
    * the lucky runtime. Subquery expression plans are not descended
    * into (the registry's DataFrame-built queries materialize
    * one-row frames as joins, not scalar subqueries). */
  def parquetScanTables(df: DataFrame): Seq[String] =
    df.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.headOption
          .map(_.getName.stripSuffix(".parquet")).getOrElse("?")
    }
}
