package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Merge-on-read positional deletes — the "deletion vector" shape of
  * Delta/Iceberg v2, rebuilt on plain parquet: a delete marks
  * (file, row-position) pairs in a tiny side table under
  * `<table>/_deletes/` instead of rewriting immutable data files.
  *
  * Why this matters at 100 TB: copy-on-write deletes (the
  * `Sinks.deleteByKey` path) rewrite every file that contains a
  * matching row — a GDPR erasure touching 1 row per file rewrites the
  * whole table. Merge-on-read writes O(|deleted rows|) positions and
  * leaves the data files (and their backups/caches) byte-identical;
  * reads subtract the positions with one BROADCAST anti-join (the DV
  * side is keyed rows, not data — metadata-sized until compaction is
  * due). The read-time contract mirrors the lakehouse formats:
  *
  *  - positions come from the parquet scan itself
  *    (`_metadata.file_path`, `_metadata.row_index`) — stable row
  *    identity without a key column, so deletes work on keyless
  *    append-only tables too;
  *  - deletes ACCUMULATE as append-only DV files (each `deleteWhere`
  *    writes one new file; no read-modify-write of existing DV state,
  *    so concurrent appends of disjoint deletes don't conflict);
  *  - a row deleted twice is recorded once per delete but subtracts
  *    once (anti-join semantics) — re-running a delete is idempotent
  *    on the read view;
  *  - `_deletes` starts with an underscore, so Spark's file index and
  *    the DuckDB star-glob over the table directory ignore it on scans.
  *
  * [[compact]] folds the DV into fresh data files when [[stats]] says
  * the dead fraction justifies the rewrite (the OPTIMIZE decision —
  * q219's compaction-plan logic applies). Compaction writes to a NEW
  * table directory; atomically re-pointing readers is the job of a
  * commit pointer (CdcApply's markers-as-truth discipline), not of
  * this operator.
  */
object DeletionVectors {

  val DvDir = "_deletes"

  private def dvPath(tableDir: String) = s"$tableDir/$DvDir"

  private def hasDv(spark: SparkSession, tableDir: String): Boolean = {
    val d =
      if (tableDir.startsWith("file:")) new java.io.File(new java.net.URI(tableDir))
      else new java.io.File(tableDir)
    val dv = new java.io.File(d, DvDir)
    dv.isDirectory && dv.listFiles().exists(_.getName.endsWith(".parquet"))
  }

  /** Base scan with row identity attached (internal; `_file`/`_pos`
    * are dropped before rows leave [[read]]). */
  private def baseWithPos(spark: SparkSession, tableDir: String): DataFrame =
    spark.read.parquet(tableDir)
      .withColumn("_file", col("_metadata.file_path"))
      .withColumn("_pos", col("_metadata.row_index"))

  private def liveWithPos(spark: SparkSession, tableDir: String): DataFrame = {
    val base = baseWithPos(spark, tableDir)
    if (!hasDv(spark, tableDir)) base
    else {
      val dv = spark.read.parquet(dvPath(tableDir))
        .select(col("file").as("_file"), col("pos").as("_pos")).distinct()
      base.join(broadcast(dv), Seq("_file", "_pos"), "left_anti")
    }
  }

  /** The live view of the table: base files minus deleted positions.
    * One broadcast LEFT ANTI hash join when deletes exist; a plain
    * scan when none do. */
  def read(spark: SparkSession, tableDir: String): DataFrame =
    liveWithPos(spark, tableDir).drop("_file", "_pos")

  /** Merge-on-read delete: record the positions of CURRENTLY LIVE rows
    * matching `predicate` as one appended DV file. Returns the number
    * of newly deleted rows. No data file is opened for writing. */
  def deleteWhere(spark: SparkSession, tableDir: String,
      predicate: org.apache.spark.sql.Column): Long = {
    val hits = liveWithPos(spark, tableDir)
      .filter(predicate)
      .select(col("_file").as("file"), col("_pos").as("pos"))
      .cache()
    val n = hits.count()
    if (n > 0) hits.write.mode("append").parquet(dvPath(tableDir))
    hits.unpersist(blocking = false)
    n
  }

  /** Per-file dead-row accounting — the compaction trigger signal
    * (files past a dead fraction are rewrite candidates; the rest are
    * left untouched). */
  def stats(spark: SparkSession, tableDir: String): DataFrame = {
    val total = baseWithPos(spark, tableDir)
      .groupBy(col("_file").as("file")).agg(count(lit(1)).as("n_rows"))
    val dead =
      if (!hasDv(spark, tableDir))
        total.select(col("file"), lit(0L).as("n_deleted")).limit(0)
      else spark.read.parquet(dvPath(tableDir))
        .select("file", "pos").distinct()
        .groupBy("file").agg(count(lit(1)).as("n_deleted"))
    total.join(dead, Seq("file"), "left_outer")
      .select(col("file"), col("n_rows"),
        coalesce(col("n_deleted"), lit(0L)).as("n_deleted"))
      .orderBy("file")
  }

  /** Fold the DV into fresh data files at `targetDir` (copy-on-write,
    * amortized over many merge-on-read deletes). The new table has no
    * `_deletes`; the old directory is left untouched for the caller's
    * pointer swap. */
  def compact(spark: SparkSession, tableDir: String, targetDir: String,
      numFiles: Int = 0): Unit = {
    val live = read(spark, tableDir)
    val out = if (numFiles > 0) live.repartition(numFiles) else live
    out.write.mode("overwrite").parquet(targetDir)
  }
}
