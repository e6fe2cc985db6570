package graft.sources.v2

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, StandardCopyOption}

import scala.collection.immutable.BitSet

import com.fasterxml.jackson.core.{JsonFactory, JsonToken}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.sources.Filter

/** Merge-on-read positional deletes for the DOCUMENT STORE — the same
  * deletion-vector shape [[graft.sources.DeletionVectors]] gives
  * parquet tables, rebuilt for the JSON-lines layout: a delete records
  * (part file, row position) pairs in tiny `_dv-*.json` side files
  * instead of rewriting immutable data files.
  *
  * Row identity: `pos` is the 0-based ordinal of the row among the
  * NON-EMPTY lines of its part file — the exact order
  * [[DocStoreReader]] walks, so reader-side subtraction is a counter
  * compare, no parsing of the DV beyond load.
  *
  * Contract (mirrors the parquet DV and the lakehouse formats):
  *  - deletes ACCUMULATE append-only: each [[deleteWhere]] TASK renames
  *    one new `_dv-*.json` into place (tmp + atomic rename; underscore
  *    prefix keeps it invisible to part-file scans and compaction
  *    binning); nothing is read-modify-written, so concurrent disjoint
  *    deletes don't conflict;
  *  - a position recorded twice subtracts once (set union), so
  *    re-running a delete is idempotent on the read view;
  *  - scan integration is two-level: a file whose EXACT zonemap row
  *    count equals its dead count is skipped at planning WITHOUT being
  *    opened; a partially-dead file is read with its positions
  *    subtracted in the reader. Zone-map pruning proofs stay valid
  *    under deletion because stats then describe a SUPERSET of the
  *    live rows — every "no row can match" proof over a superset holds
  *    for the subset;
  *  - [[DocStoreCompact]] is the amortization point: files with dead
  *    rows become rewrite candidates regardless of size, the rewrite
  *    drops dead lines, and the sweep GCs DV entries whose part file
  *    is gone.
  *
  * Scale shape: a delete shuffles positions (16 bytes/row), never
  * documents; DV files are metadata-sized until compaction folds them.
  * The driver holds per-file BitSets at planning — rows/8 bytes per
  * file, the same order as lakehouse DV metadata.
  */
object DocStoreDeletes {

  private val factory = new JsonFactory()

  /** Union of every `_dv-*.json`: part-file name → dead positions. */
  def load(dir: String): Map[String, BitSet] = {
    val files = Option(new File(dir).listFiles())
      .getOrElse(Array.empty[File])
      .filter(f => f.isFile && f.getName.startsWith("_dv-") &&
        f.getName.endsWith(".json"))
    val acc = scala.collection.mutable.Map.empty[String, BitSet]
    files.foreach { f =>
      parseDvFile(f).foreach { case (name, ps) =>
        acc(name) = acc.getOrElse(name, BitSet.empty) | ps
      }
    }
    acc.toMap
  }

  private[v2] def parseDvFile(f: File): Seq[(String, BitSet)] =
    try {
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try src.getLines().filter(_.nonEmpty).flatMap(parseDvLine).toList
      finally src.close()
    } catch { case _: Exception => Nil }

  private def parseDvLine(line: String): Option[(String, BitSet)] =
    try {
      val p = factory.createParser(line)
      try {
        var file: String = null
        val ps = scala.collection.mutable.ArrayBuffer.empty[Int]
        if (p.nextToken() != JsonToken.START_OBJECT) return None
        while (p.nextToken() == JsonToken.FIELD_NAME) {
          p.getCurrentName match {
            case "file" => p.nextToken(); file = p.getText
            case "pos" =>
              p.nextToken() // START_ARRAY
              while (p.nextToken() != JsonToken.END_ARRAY) ps += p.getIntValue
            case _ => p.nextToken(); p.skipChildren()
          }
        }
        if (file == null) None else Some(file -> BitSet.fromSpecific(ps))
      } finally p.close()
    } catch { case _: Exception => None }

  private[v2] def dvJsonLine(file: String, ps: Iterable[Int]): String = {
    val sb = new StringBuilder
    sb.append("{\"file\":\"").append(file).append("\",\"pos\":[")
    var first = true
    ps.foreach { p =>
      if (!first) sb.append(',')
      first = false
      sb.append(p)
    }
    sb.append("]}").toString
  }

  /** Merge-on-read delete: record the positions of CURRENTLY LIVE rows
    * matching every filter (the same `Filter` algebra the scan pushes
    * down — [[DocStoreJson.eval]] is the single evaluation authority).
    * One task per live part file; each task with hits renames its own
    * DV file into place, so only counts travel to the driver. Returns
    * the number of newly deleted rows. */
  def deleteWhere(spark: SparkSession, dir: String, filters: Seq[Filter]): Long =
    DocStoreCompact.withLock(dir) { deleteWhereLocked(spark, dir, filters) }

  private[v2] def deleteWhereLocked(spark: SparkSession, dir: String,
      filters: Seq[Filter]): Long = {
    // here eval is the AUTHORITY (no residual re-check behind it):
    // refuse any filter whose let-pass default could fire — an
    // unsupported predicate must fail loudly, not delete everything
    val bad = filters.filterNot(DocStoreJson.evaluableExactly)
    require(bad.isEmpty,
      s"deleteWhere: unsupported filter(s) ${bad.mkString(", ")} — " +
        "supported: comparisons/IN/null-tests/string-matches on " +
        "top-level fields, composed with And/Or")
    val existing = load(dir)
    val files = DocStoreCompact.liveFiles(dir).map(_.getName)
    if (files.isEmpty) return 0L
    val wanted = filters.flatMap(_.references).toSet
    val runId = java.util.UUID.randomUUID().toString.take(8)
    spark.sparkContext
      .parallelize(files.toIndexedSeq, files.length)
      .map { name =>
        val dead = existing.getOrElse(name, BitSet.empty)
        val hits = scala.collection.mutable.ArrayBuffer.empty[Int]
        val in = new java.io.BufferedReader(
          new java.io.InputStreamReader(
            new java.io.FileInputStream(new File(dir, name)),
            StandardCharsets.UTF_8))
        try {
          var pos = 0
          var line = in.readLine()
          while (line != null) {
            if (line.nonEmpty) {
              if (!dead(pos)) {
                val doc = DocStoreJson.parseLine(line, wanted)
                if (filters.forall(DocStoreJson.eval(_, doc))) hits += pos
              }
              pos += 1
            }
            line = in.readLine()
          }
        } finally in.close()
        if (hits.nonEmpty) {
          // per-ATTEMPT tmp name: speculative/zombie duplicate
          // attempts must not interleave on one tmp file before the
          // atomic rename (the rename itself is idempotent —
          // identical bytes from every attempt)
          val att = Option(org.apache.spark.TaskContext.get())
            .map(_.taskAttemptId()).getOrElse(0L)
          val tmp = new File(dir, s"_tmp-dv-$runId-a$att-$name")
          Files.write(tmp.toPath,
            (dvJsonLine(name, hits) + "\n").getBytes(StandardCharsets.UTF_8))
          Files.move(tmp.toPath, new File(dir, s"_dv-$runId-$name.json").toPath,
            StandardCopyOption.ATOMIC_MOVE)
        }
        hits.length.toLong
      }.sum().toLong
  }

  /** Per-file dead-row accounting — the docstore compaction-trigger
    * signal ([[DocStoreCompact.compact]] rewrites any file with dead
    * rows). `n_rows` comes from the exact zonemap count and is -1 for
    * files without stats (dead fraction then unknown; such files still
    * compact, they just can't plan-skip). Driver-side and file-count
    * sized — metadata, not data. */
  def stats(dir: String): Seq[(String, Long, Long)] = {
    val zm = DocStoreZonemap.load(dir)
    val dv = load(dir)
    DocStoreCompact.liveFiles(dir).toSeq.map { f =>
      val name = f.getName
      (name, zm.get(name).map(_.rows).getOrElse(-1L),
        dv.get(name).map(_.size.toLong).getOrElse(0L))
    }
  }

  /** GC: rewrite each DV file dropping entries whose part file no
    * longer exists (compacted away or vacuumed); delete DV files left
    * empty. Called from the compaction sweep (under its lock). */
  private[v2] def gc(dir: String): Unit = {
    val partNames = Option(new File(dir).listFiles())
      .getOrElse(Array.empty[File])
      .filter(f => f.isFile && f.getName.startsWith("part-"))
      .map(_.getName).toSet
    Option(new File(dir).listFiles()).getOrElse(Array.empty[File])
      .filter(f => f.isFile && f.getName.startsWith("_dv-") &&
        f.getName.endsWith(".json"))
      .foreach { f =>
        val entries = parseDvFile(f)
        val live = entries.filter { case (name, _) => partNames.contains(name) }
        // an `_dv-update-<X>` file is ALSO the commit marker of
        // `part-update-<X>.jsonl` — it must outlive its entries (which
        // reference the replaced ORIGINAL file) for as long as the
        // rewritten part file exists, or deleting it would un-commit
        // committed data
        val isLiveUpdateMarker = f.getName.startsWith("_dv-update-") &&
          partNames.contains("part-update-" +
            f.getName.stripPrefix("_dv-update-").stripSuffix(".json"))
        if (live.isEmpty && !isLiveUpdateMarker) { f.delete(); () }
        else if (live.size != entries.size) {
          val tmp = new File(dir, "_tmp-" + f.getName)
          Files.write(tmp.toPath,
            live.map { case (n, ps) => dvJsonLine(n, ps) + "\n" }
              .mkString.getBytes(StandardCharsets.UTF_8))
          Files.move(tmp.toPath, f.toPath,
            StandardCopyOption.REPLACE_EXISTING)
        }
      }
  }
}
