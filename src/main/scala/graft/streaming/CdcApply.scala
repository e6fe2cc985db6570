package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming CDC apply — the continuous form of the q225/q233 merge
  * pair: a stream of keyed change rows (op ∈ I/U/D) maintains an
  * exactly-once UPSERTED table on plain parquet, the bronze→silver
  * incremental-merge every lakehouse pipeline runs, built from first
  * principles (no table format in the container):
  *
  *  - **versioned state**: each micro-batch writes a complete new
  *    snapshot under `state/v<batchId>/` and then atomically swaps a
  *    `_LATEST` pointer file (write temp + rename) — readers only
  *    ever see a fully-committed version, never a half-written one
  *    (the poor man's Delta transaction log, one version per batch);
  *  - **exactly-once by batch id**: a version directory whose commit
  *    marker exists is never re-applied — Structured Streaming
  *    replays the last uncommitted batch after a crash, and the
  *    batch-id check makes that replay a no-op instead of a double
  *    apply (same contract as the JDBC delete-then-append sink);
  *  - **in-batch collapse**: multiple changes to one key within a
  *    batch resolve LAST-WINS on the change sequence column before
  *    the merge, so a batch containing I(k),U(k),D(k) nets to the
  *    delete — the standard CDC compaction rule;
  *  - **merge**: one full-outer hash join of current state with the
  *    collapsed batch (q225's shape — one shuffle, 1:1 by key).
  *
  * Scale: state rewrite per batch is the simplification a real table
  * format avoids via file-level merge-on-read; the JOIN is the same
  * either way, and partition-pruned rewrites drop in behind the same
  * API. The protocol (version + pointer + idempotent replay) is the
  * part that carries.
  */
object CdcApply {

  private def pointerFile(stateDir: String) = new java.io.File(stateDir, "_LATEST")

  /** The latest committed version, if any state exists yet. The
    * _COMMITTED markers are the source of truth — NOT the _LATEST
    * pointer: a crash can land between marker write and pointer swap,
    * and trusting the pointer there would silently serve stale state
    * (and a replayed batch would no-op without repairing it, losing
    * the batch forever). The pointer is a reader convenience only. */
  def latestVersion(stateDir: String): Option[Long] = versions(stateDir).lastOption

  /** Read the current committed state (empty schema-less None when no
    * version has committed). */
  def readState(spark: SparkSession, stateDir: String): Option[DataFrame] =
    latestVersion(stateDir).map { v =>
      spark.read.parquet(s"$stateDir/v$v/data")
    }

  /** All committed versions, ascending — each version is a complete
    * snapshot, so the directory IS the table history. */
  def versions(stateDir: String): Seq[Long] = {
    val d = new java.io.File(stateDir)
    Option(d.listFiles()).getOrElse(Array.empty).toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("v") &&
        new java.io.File(f, "_COMMITTED").isFile)
      .map(_.getName.drop(1).toLong).sorted
  }

  /** Time travel: read the state AS OF a version (must be committed).
    * Uncommitted or unknown versions fail loudly rather than serving a
    * half-written snapshot. */
  def readStateAsOf(spark: SparkSession, stateDir: String, version: Long): DataFrame = {
    require(versions(stateDir).contains(version),
      s"version $version is not committed in $stateDir (have: ${versions(stateDir).mkString(",")})")
    spark.read.parquet(s"$stateDir/v$version/data")
  }

  /** Apply ONE batch of changes idempotently. `changes` columns:
    * key, op ('I'|'U'|'D'), seq (change order), payload... — extra
    * columns are the payload. Returns true when applied, false when
    * the batch id had already committed (crash-replay no-op). */
  def applyBatch(changes: DataFrame, stateDir: String, key: String,
      batchId: Long): Boolean = {
    val spark = changes.sparkSession
    val vDir = new java.io.File(stateDir, s"v$batchId")
    val marker = new java.io.File(vDir, "_COMMITTED")
    if (marker.isFile) {
      // exactly-once: this batch already committed. Repair the reader
      // pointer if the crash landed between marker and pointer swap —
      // otherwise the replay would no-op and leave _LATEST stale.
      if (latestVersion(stateDir).contains(batchId)) writePointer(stateDir, batchId)
      return false
    }
    new java.io.File(stateDir).mkdirs()

    // in-batch collapse: last change per key wins (seq desc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(col("seq").desc)
    val collapsed = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn", "seq")

    val payloadCols = collapsed.columns.filter(c => c != key && c != "op")
    val merged = readState(spark, stateDir) match {
      case None =>
        collapsed.filter(col("op") =!= "D").drop("op")
      case Some(cur0) =>
        val ch = collapsed.withColumnRenamed(key, "__k")
        // Additive schema evolution: a change feed that GAINS a column
        // widens state with that column null-filled for history (the
        // unionByName null-fill convention); a column the feed stopped
        // sending is retained from state verbatim — the writer doesn't
        // know about it, so an update must not null it. Shared columns
        // must agree on type: silent coercion would corrupt history.
        val curPayload = cur0.columns.filterNot(_ == key).toSeq
        for (c <- curPayload.intersect(payloadCols)) {
          val (a, b) = (cur0.schema(c).dataType, collapsed.schema(c).dataType)
          require(a == b,
            s"cdc schema evolution: column '$c' type mismatch state=$a batch=$b")
        }
        val newCols = payloadCols.filterNot(curPayload.contains)
        val cur = newCols.foldLeft(cur0)((df, c) =>
          df.withColumn(c, lit(null).cast(collapsed.schema(c).dataType)))
        val allPayload = curPayload ++ newCols
        cur.join(ch, cur(key) === ch("__k"), "full_outer")
          .filter(ch("op").isNull || ch("op") =!= "D")
          .select(
            coalesce(cur(key), ch("__k")).as(key) +:
              allPayload.map(c =>
                if (payloadCols.contains(c))
                  when(ch("op").isNotNull, ch(c)).otherwise(cur(c)).as(c)
                else cur(c).as(c)): _*)
    }
    merged.write.mode("overwrite").parquet(s"${vDir.getPath}/data")
    // commit marker (the durable commit point), then the pointer swap
    java.nio.file.Files.write(marker.toPath, Array.emptyByteArray)
    writePointer(stateDir, batchId)
    true
  }

  /** Atomic reader-pointer swap (temp + rename). Purely advisory —
    * commit markers carry the truth; see [[latestVersion]]. */
  private def writePointer(stateDir: String, batchId: Long): Unit = {
    val tmp = new java.io.File(stateDir, s"_LATEST.tmp$batchId")
    java.nio.file.Files.write(tmp.toPath,
      batchId.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp.toPath, pointerFile(stateDir).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Retention: delete committed snapshots older than the last
    * `retainLast` committed versions, plus marker-less crash debris
    * strictly below the newest committed version. Each micro-batch
    * writes a COMPLETE snapshot, so without a vacuum storage grows
    * linearly in batch count — unbounded for a long-lived stream.
    *
    * Crash-safe by ordering, markers-as-truth extended to deletion:
    *  - the `_COMMITTED` marker is deleted FIRST — the version leaves
    *    the committed set atomically, so a crash mid-delete strands
    *    only invisible debris that the next vacuum sweeps;
    *  - never touches the newest committed version or anything at or
    *    above it (the in-flight batch writes under a higher id —
    *    batch ids are monotonic, so marker-less dirs BELOW the newest
    *    committed version can only be debris, never live writes);
    *  - time travel past the horizon fails loudly, not partially:
    *    [[readStateAsOf]] requires the marker, which is gone.
    *
    * Returns the version ids removed. */
  def vacuum(stateDir: String, retainLast: Int): Seq[Long] = {
    require(retainLast >= 1, s"vacuum: retainLast must be >= 1, got $retainLast")
    val committed = versions(stateDir)
    if (committed.isEmpty) return Seq.empty
    val latest = committed.last
    val drop = committed.dropRight(retainLast)
    val debris = Option(new java.io.File(stateDir).listFiles())
      .getOrElse(Array.empty).toSeq
      .filter(f => f.isDirectory && f.getName.matches("v\\d+") &&
        !new java.io.File(f, "_COMMITTED").isFile)
      .map(_.getName.drop(1).toLong)
      .filter(_ < latest)
    def rmTree(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
      f.delete(); ()
    }
    for (v <- drop) {
      val vDir = new java.io.File(stateDir, s"v$v")
      new java.io.File(vDir, "_COMMITTED").delete() // de-commit first
      rmTree(vDir)
    }
    for (v <- debris) rmTree(new java.io.File(stateDir, s"v$v"))
    (drop ++ debris).sorted
  }

  /** Continuous apply: drive a change-row stream into the state table
    * via foreachBatch, AvailableNow semantics (catch up, then stop).
    * `retainVersions` bounds on-disk history: after each applied batch
    * the vacuum keeps only that many committed snapshots (None = keep
    * everything — time travel over full history, unbounded storage). */
  def run(changes: DataFrame, stateDir: String, checkpointDir: String,
      key: String, retainVersions: Option[Int] = None): StreamingQuery =
    changes.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, stateDir, key, batchId)
        retainVersions.foreach(n => vacuum(stateDir, n))
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
