package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sink operators (SURVEY §2.2): partitioned CSV/parquet, flat CSV,
  * JDBC append, JSON-lines, idempotent partition overwrite.
  */
object Sinks {

  /** K1: daily partitioned sink (`daily_scrape/{city}/{date}.csv` →
    * `dir/city=…/date=…/part-*.csv`). */
  def partitionedCsv(df: DataFrame, dir: String,
      partitions: Seq[String] = Seq("city", "date")): Unit =
    df.write.partitionBy(partitions: _*)
      .mode("append").option("header", "true").csv(dir)

  /** K1 (engine-native): parquet variant of the daily sink. */
  def partitionedParquet(df: DataFrame, dir: String,
      partitions: Seq[String] = Seq("city", "date")): Unit =
    df.write.partitionBy(partitions: _*).mode("append").parquet(dir)

  /** §4 idempotent re-run: overwrite ONLY the partitions present in
    * this batch (dynamic partition overwrite) — re-running a day's
    * ingest replaces that day instead of duplicating it (the
    * reference's blind `if_exists='append'` dup-risk, fixed). */
  def overwriteDailyPartitions(df: DataFrame, dir: String,
      partitions: Seq[String] = Seq("city", "date")): Unit =
    df.write.partitionBy(partitions: _*)
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(dir)

  /** K1-analytics: parquet laid out for FILE SKIPPING — the
    * open-format twin of the docstore V2 zone maps. Three levers, all
    * plain parquet features any engine can read:
    *  - rows sorted within files by `sortCols` → row-group min/max
    *    stats (and page-level column indexes, written by default
    *    since parquet-mr 1.11) become non-overlapping, so a range or
    *    point predicate on the sort key opens ~1 row group instead of
    *    all of them;
    *  - split bloom filters (`parquet.bloom.filter.enabled#col`) on
    *    `bloomCols` → point predicates on NON-sorted high-cardinality
    *    keys skip row groups min/max can't discriminate (every group
    *    spans most of an unsorted key's range);
    *  - a bounded row-group size so a selective read's unit of IO is
    *    small (default 1 MiB here vs parquet's 128 MiB — at 100 TB
    *    pick the real value from row width × executor memory).
    * ParquetSkippingSpec measures both skip ratios footer-by-footer
    * and pins that Spark pushes the predicates to the scan. */
  def analyticsParquet(df: DataFrame, dir: String, sortCols: Seq[String],
      bloomCols: Seq[String] = Nil, rowGroupBytes: Long = 1L << 20): Unit = {
    val sorted = df.sortWithinPartitions(sortCols.map(col): _*)
    val w0 = sorted.write
      .option("parquet.block.size", rowGroupBytes.toString)
    // dictionary off for bloom columns: parquet-mr drops the bloom
    // when a chunk is fully dictionary-encoded (the dictionary already
    // gives exact membership), so small row groups would silently
    // write no blooms at all; plain encoding makes the bloom the
    // membership structure, which is the point of this layout
    val w = bloomCols.foldLeft(w0)((acc, c) =>
      acc.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.enable.dictionary#$c", "false"))
    w.mode("overwrite").parquet(dir)
  }

  /** K2: single flat CSV (tiny parity outputs only — coalesce(1)). */
  def flatCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)

  /** K3: JDBC append, surrogate key dropped (load_save_sql.ipynb:228). */
  def jdbcAppend(df: DataFrame, url: String, table: String,
      dropCols: Seq[String] = Seq("apt_id"),
      props: java.util.Properties = new java.util.Properties()): Unit =
    df.drop(dropCols: _*).write.mode("append").jdbc(url, table, props)

  /** K4/K5: Mongo-document-shaped sink → JSON lines (zero-egress env;
    * each row becomes one document object). The DataSource V2 form of
    * this sink — full commit protocol (task temp-file isolation,
    * rename-on-commit, job `_SUCCESS`, abort sweeps) — is
    * [[graft.sources.v2.DocStoreDataSource]]; this convenience wrapper
    * stays for callers who just want files. */
  def jsonLines(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").json(dir)

  /** K6: keyed merge (upsert) into a parquet target — the engine
    * counterpart of the reference's insert-or-update document save
    * (mongo.ipynb:215-244, mongoengine `Document.save()`): rows in
    * `updates` replace existing rows with the same key, new keys are
    * inserted, untouched rows survive unchanged.
    *
    * Shape: read-merge-rewrite. Existing rows that do NOT match an
    * update key survive via a LEFT ANTI join (one key shuffle, or a
    * broadcast when the update batch is small — the usual case),
    * unioned with the updates and staged to a sibling directory first
    * (Spark cannot overwrite a path it is reading), then swapped in.
    *
    * At scale, pass `partitions`: only partitions actually present in
    * the update batch are read (semi-join partition pruning) and
    * rewritten (dynamic partition overwrite) — merge cost is
    * proportional to touched partitions, not table size.
    */
  /** The staged-swap write protocol, shared by every read-merge-rewrite
    * sink (merge, delete, SCD-2): Spark cannot overwrite a path it is
    * reading, so the frame materializes to a sibling `__staging` dir,
    * is read back, written over the target (dynamic partition
    * overwrite when asked), and the staging removed. ONE copy of the
    * protocol — the crash-recovery guarantees PipelineSpec pins for
    * the staging dir hold for every caller by construction, not by
    * manual parity. */
  private def stageAndSwap(spark: org.apache.spark.sql.SparkSession,
      dir: String, frame: DataFrame, partitions: Seq[String],
      dynamicOverwrite: Boolean): Unit = {
    val staging = new org.apache.hadoop.fs.Path(dir.stripSuffix("/") + "__staging")
    val fs = staging.getFileSystem(spark.sparkContext.hadoopConfiguration)
    frame.write.mode("overwrite").parquet(staging.toString)
    val staged = spark.read.parquet(staging.toString)
    val w = staged.write.mode("overwrite")
    if (partitions.nonEmpty && dynamicOverwrite)
      w.partitionBy(partitions: _*)
        .option("partitionOverwriteMode", "dynamic").parquet(dir)
    else if (partitions.nonEmpty)
      w.partitionBy(partitions: _*).parquet(dir)
    else
      w.parquet(dir)
    fs.delete(staging, true)
  }

  def mergeUpsert(updates: DataFrame, dir: String, key: String,
      partitions: Seq[String] = Nil): Unit = {
    val spark = updates.sparkSession
    val target = new org.apache.hadoop.fs.Path(dir)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(target)) {
      if (partitions.nonEmpty)
        updates.write.partitionBy(partitions: _*).parquet(dir)
      else updates.write.parquet(dir)
      return
    }
    val existing = spark.read.parquet(dir)
    val scoped =
      if (partitions.isEmpty) existing
      else existing.join(
        broadcast(updates.select(partitions.map(col): _*).distinct()),
        partitions, "left_semi")
    val kept = scoped.join(updates, Seq(key), "left_anti")
    val merged = kept.unionByName(updates.select(kept.columns.map(col).toSeq: _*))
    stageAndSwap(spark, dir, merged, partitions,
      dynamicOverwrite = partitions.nonEmpty)
  }

  /** Keyed hard delete (right-to-be-forgotten): remove every row whose
    * key appears in `keys`, rewriting only what must be rewritten.
    * Same read-merge-rewrite staging as [[mergeUpsert]] (Spark cannot
    * overwrite a path it is reading), same pruning contract: with
    * `partitions` + a `partitionFor` hint frame (key → partition
    * values), only partitions that can contain a deleted key are read
    * and rewritten — the erasure cost is proportional to touched
    * partitions, not table size. Idempotent: deleting absent keys is a
    * no-op rewrite.
    *
    * `keys` is a 1-column frame (the usual erasure batch is tiny →
    * broadcast anti join; a backfill-sized batch degrades gracefully
    * to a shuffle anti join under AQE). */
  def deleteByKey(spark: org.apache.spark.sql.SparkSession, dir: String,
      key: String, keys: DataFrame,
      partitions: Seq[String] = Nil,
      partitionFor: Option[DataFrame] = None): Unit = {
    val target = new org.apache.hadoop.fs.Path(dir)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(target)) return
    val existing = spark.read.parquet(dir)
    val scoped = (partitions, partitionFor) match {
      case (ps, Some(hint)) if ps.nonEmpty =>
        existing.join(broadcast(hint.select(ps.map(col): _*).distinct()),
          ps, "left_semi")
      case _ => existing
    }
    val kept = scoped.join(keys.select(col(keys.columns.head).as(key)),
      Seq(key), "left_anti")
    // Dynamic overwrite only replaces partitions that receive NEW
    // files — a partition the delete EMPTIED writes nothing and its
    // old files (with the erased keys) would survive. Compute the
    // emptied set BEFORE the swap (kept still reads the intact
    // target), then remove those directories explicitly. Bounded by
    // the erasure batch → driver-side collect is fine.
    val emptied: Array[org.apache.spark.sql.Row] =
      if (partitions.nonEmpty && partitionFor.nonEmpty)
        partitionFor.get.select(partitions.map(col): _*).distinct()
          .join(kept.select(partitions.map(col): _*).distinct(),
            partitions, "left_anti")
          .collect()
      else Array.empty
    stageAndSwap(spark, dir, kept, partitions,
      dynamicOverwrite = partitionFor.nonEmpty)
    emptied.foreach { row =>
      // Hive path escaping, via Spark's own codec: a value with ':',
      // ' ', '%', '/'… is stored escaped on disk (and null/empty as
      // the default-partition name) — a raw "col=value" path would
      // silently miss it and LEAK the erased rows.
      val seg = partitions.zipWithIndex.map { case (p, i) =>
        val v = Option(row.get(i)).map(_.toString).getOrElse("")
        val escaped =
          if (v.isEmpty) "__HIVE_DEFAULT_PARTITION__"
          else org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .escapePathName(v)
        s"${org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .escapePathName(p)}=$escaped"
      }.mkString("/")
      fs.delete(new org.apache.hadoop.fs.Path(s"${dir.stripSuffix("/")}/$seg"), true)
    }
  }

  /** SCD-2 merge (slowly-changing dimension, validity intervals): the
    * history-preserving variant of [[mergeUpsert]]. The target carries
    * `valid_from` / `valid_to` (null = current). Each update row with a
    * changed payload CLOSES the key's current row (valid_to :=
    * update's valid_from) and inserts a new current row; unchanged
    * keys and already-closed history pass through untouched. One key
    * shuffle (or broadcast for small update batches) — same
    * read-merge-rewrite staging as mergeUpsert.
    *
    * Updates must carry the same payload columns plus `valid_from`. */
  def scd2Merge(updates: DataFrame, dir: String, key: String): Unit = {
    val spark = updates.sparkSession
    val target = new org.apache.hadoop.fs.Path(dir)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fresh = updates.withColumn("valid_to",
      lit(null).cast(updates.schema("valid_from").dataType))
    if (!fs.exists(target)) {
      fresh.write.parquet(dir)
      return
    }
    val existing = spark.read.parquet(dir)
    val closedHistory = existing.filter(col("valid_to").isNotNull)
    val current = existing.filter(col("valid_to").isNull)
    val upd = broadcast(updates.select(col(key).as("__k"), col("valid_from").as("__new_from")))
    val closedNow = current.join(upd, current(key) === col("__k"))
      .withColumn("valid_to", col("__new_from"))
      .drop("__k", "__new_from")
    val stillCurrent = current.join(upd, current(key) === col("__k"), "left_anti")
    val merged = closedHistory
      .unionByName(closedNow)
      .unionByName(stillCurrent)
      .unionByName(fresh.select(closedHistory.columns.map(col).toSeq: _*))
    stageAndSwap(spark, dir, merged, Nil, dynamicOverwrite = false)
  }

  /** Small-file compaction: rewrite a parquet directory into
    * ceil(total_bytes / targetBytes) files. Streaming sinks and
    * per-batch appends accrete small files; at scale the file count —
    * not the byte count — dominates listing and task-scheduling cost,
    * so periodic compaction is routine table maintenance. Uses the same
    * staging-then-swap as [[mergeUpsert]] (Spark cannot overwrite a
    * path it is reading). Point it at one partition directory of a
    * partitioned table to compact that partition alone. */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    val target = new org.apache.hadoop.fs.Path(dir)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(target, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) total += f.getLen
    }
    val n = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    val staging = new org.apache.hadoop.fs.Path(dir.stripSuffix("/") + "__compacting")
    spark.read.parquet(dir).repartition(n)
      .write.mode("overwrite").parquet(staging.toString)
    spark.read.parquet(staging.toString)
      .write.mode("overwrite").parquet(dir)
    fs.delete(staging, true)
    n
  }

  /** Range-clustered parquet layout: repartitionByRange + in-partition
    * sort on the clustering column, so each output file owns a disjoint
    * value range and its parquet min/max footer stats actually prune —
    * a point/range predicate then skips whole files (and row groups)
    * instead of scanning a value smeared across every file. This is the
    * lakehouse "cluster by" primitive; at 100 TB it is the difference
    * between a selective query touching GBs vs the full table. */
  def rangeClusteredParquet(df: DataFrame, dir: String, clusterCol: String,
      numFiles: Int): Unit =
    df.repartitionByRange(numFiles, col(clusterCol))
      .sortWithinPartitions(clusterCol)
      .write.mode("overwrite").parquet(dir)

  /** Z-order (Morton) clustered parquet layout over TWO columns:
    * each column is scaled to an 8-bit grid (global min/max, one extra
    * aggregation pass), the bits interleaved into a z-value, and the
    * data range-partitioned + sorted on it. Unlike single-column
    * clustering ([[rangeClusteredParquet]]), file min/max stats then
    * prune for predicates on EITHER column (or both): a box query
    * touches O(perimeter) files instead of every file. Pure column
    * bit arithmetic — no UDF. */
  def zOrderedParquet(df: DataFrame, dir: String, colA: String, colB: String,
      numFiles: Int): Unit = {
    val r = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
    val (aLo, aHi, bLo, bHi) = (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    def scaled(c: String, lo: Double, hi: Double) =
      when(lit(hi) === lit(lo), lit(0))
        .otherwise(((col(c).cast("double") - lo) * 255.0 / (hi - lo)).cast("int"))
    val a8 = scaled(colA, aLo, aHi)
    val b8 = scaled(colB, bLo, bHi)
    val z = (0 until 8).map { i =>
      shiftleft(a8.bitwiseAND(1 << i), i) // bit i → position 2i
        .bitwiseOR(shiftleft(b8.bitwiseAND(1 << i), i + 1)) // bit i → 2i+1
    }.reduce(_ bitwiseOR _)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
  }

  /** Bucketed sink for co-located joins at scale: pre-shuffles by the
    * join key once at write time so repeated downstream joins on that
    * key skip their shuffle (requires saveAsTable / metastore). */
  def bucketedTable(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.bucketBy(buckets, key).sortBy(key).mode("overwrite")
      .format("parquet").saveAsTable(table)
}
