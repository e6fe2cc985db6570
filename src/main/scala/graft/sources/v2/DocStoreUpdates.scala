package graft.sources.v2

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, StandardCopyOption}

import scala.collection.immutable.BitSet

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.sources.Filter

/** Merge-on-read UPDATE for the document store — the last corner of
  * CRUD (insert = the V2 sink, find = the V2 scan, delete =
  * [[DocStoreDeletes]]): matching rows are rewritten into a NEW part
  * file and their old copies die by deletion vector; the original
  * data files are never opened for writing.
  *
  * ATOMICITY with only per-file renames (the markers-as-truth
  * discipline): per task,
  *
  *  1. the rewritten rows stream into `_tmp-*` files (invisible);
  *  2. `part-update-<X>.jsonl` renames into place — still INVISIBLE,
  *     because [[DocStoreCompact.liveFiles]] admits a part-update
  *     file only once its marker exists;
  *  3. `_dv-update-<X>.json` renames into place — the ONE commit
  *     point: it is simultaneously the deletion vector that kills
  *     the old copies and the marker that admits the new file, so
  *     no reader ever sees both versions or neither.
  *
  * Crash between 2 and 3 → the new file is invisible debris (swept),
  * old rows stay live. Crash after 3 → committed. The marker file
  * outlives its (stale) DV entries for as long as its part file does
  * — [[DocStoreDeletes.gc]] enforces that, or GC would un-commit
  * data.
  *
  * Update-the-update: a later updateWhere sees the REWRITTEN rows as
  * ordinary live rows (their file is a normal live part file) — the
  * semantics are always "update the currently live matches". Each
  * rewritten file gets a zone map over its rewritten rows (written
  * BEFORE the commit marker), so updated data keeps pruning without
  * waiting for a compaction.
  *
  * Mutator concurrency: like [[DocStoreDeletes.deleteWhere]] and
  * [[DocStoreCompact.compact]], the whole job runs under the
  * directory's maintenance lock — readers stay lock-free.
  *
  * Scale shape: one task per live file; only matched rows are
  * re-serialized and only they travel to the new file — the write
  * cost is O(matched), not O(table), the merge-on-read bargain.
  */
object DocStoreUpdates {

  /** Update every CURRENTLY LIVE row matching all `filters`: fields in
    * `set` are replaced (or added) with the given literal values
    * (String / Long / Int / Double / Boolean / null). Returns the
    * number of rows updated. Filters must be exactly evaluable — the
    * same authority rule as deleteWhere. */
  def updateWhere(spark: SparkSession, dir: String, filters: Seq[Filter],
      set: Map[String, Any]): Long =
    DocStoreCompact.withLock(dir) { updateWhereLocked(spark, dir, filters, set) }

  private def updateWhereLocked(spark: SparkSession, dir: String,
      filters: Seq[Filter], set: Map[String, Any]): Long = {
    val bad = filters.filterNot(DocStoreJson.evaluableExactly)
    require(bad.isEmpty,
      s"updateWhere: unsupported filter(s) ${bad.mkString(", ")} — " +
        "supported: comparisons/IN/null-tests/string-matches on " +
        "top-level fields, composed with And/Or")
    require(set.nonEmpty, "updateWhere: empty SET clause")
    set.values.foreach {
      case null | _: String | _: java.lang.Long | _: java.lang.Integer |
           _: java.lang.Double | _: java.lang.Boolean => ()
      case other => throw new IllegalArgumentException(
        s"updateWhere: unsupported SET value $other " +
          "(String/Long/Int/Double/Boolean/null)")
    }
    val existing = DocStoreDeletes.load(dir)
    val files = DocStoreCompact.liveFiles(dir).map(_.getName)
    if (files.isEmpty) return 0L
    val setNorm: Map[String, Any] = set.map {
      case (k, i: java.lang.Integer) => k -> i.longValue()
      case kv => kv
    }
    val runId = java.util.UUID.randomUUID().toString.take(8)
    spark.sparkContext
      .parallelize(files.toIndexedSeq, files.length)
      .map { name =>
        val dead = existing.getOrElse(name, BitSet.empty)
        val hits = scala.collection.mutable.ArrayBuffer.empty[Int]
        val rewritten = new StringBuilder
        val updatedDocs = Seq.newBuilder[Seq[(String, Any)]]
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
                // full parse: the row is re-serialized, not spliced
                val doc = DocStoreJson.parseLineOrdered(line)
                if (filters.forall(DocStoreJson.eval(_, doc.toMap))) {
                  hits += pos
                  // existing fields keep their position; brand-new SET
                  // fields append at the end (first-seen order, the
                  // schema-inference convention)
                  val appended = setNorm.filterNot { case (k, _) =>
                    doc.exists(_._1 == k)
                  }
                  val updated = doc.map { case (k, v) =>
                    k -> setNorm.getOrElse(k, v)
                  } ++ appended
                  updatedDocs += updated.toSeq
                  rewritten.append(serialize(updated)).append('\n')
                }
              }
              pos += 1
            }
            line = in.readLine()
          }
        } finally in.close()
        if (hits.nonEmpty) {
          // tmp names carry the TASK ATTEMPT id: with speculative
          // execution (or a zombie retry racing its replacement) two
          // attempts of the same task would otherwise interleave
          // writes into ONE shared tmp file before the atomic rename,
          // committing a corrupted part-update/DV pair; per-attempt
          // tmps make the rename the only contended step, and it is
          // idempotent (both attempts rename identical bytes)
          val att = Option(org.apache.spark.TaskContext.get())
            .map(_.taskAttemptId()).getOrElse(0L)
          val dataTmp = new File(dir, s"_tmp-update-$runId-a$att-$name")
          Files.write(dataTmp.toPath,
            rewritten.toString.getBytes(StandardCharsets.UTF_8))
          val dvTmp = new File(dir, s"_tmp-updv-$runId-a$att-$name")
          Files.write(dvTmp.toPath,
            (DocStoreDeletes.dvJsonLine(name, hits) + "\n")
              .getBytes(StandardCharsets.UTF_8))
          // zone map for the rewritten rows BEFORE visibility
          // (markers-as-truth order) — without it every update would
          // permanently widen scans, since updated files would never
          // prune again until a compaction
          statsOf(updatedDocs.result()).foreach { fs =>
            val zTmp = new File(dir, s"_tmp-updz-$runId-a$att-$name")
            Files.write(zTmp.toPath,
              (DocStoreZonemap.statsJsonLine(s"part-update-$runId-$name", fs) + "\n")
                .getBytes(StandardCharsets.UTF_8))
            Files.move(zTmp.toPath,
              new File(dir, s"_zonemap-update-$runId-$name.json").toPath,
              StandardCopyOption.ATOMIC_MOVE)
          }
          // data first (invisible without its marker), marker = commit
          Files.move(dataTmp.toPath,
            new File(dir, s"part-update-$runId-$name").toPath,
            StandardCopyOption.ATOMIC_MOVE)
          Files.move(dvTmp.toPath,
            new File(dir, s"_dv-update-$runId-$name.json").toPath,
            StandardCopyOption.ATOMIC_MOVE)
        }
        hits.length.toLong
      }.sum().toLong
  }

  /** Zone-map stats over the rewritten rows (the sink's Collector
    * semantics on parsed values): numeric top-level fields only, a
    * field absent from a doc counts as null, NaN poisons a fractional
    * range to ±∞ (unprunable), a column mixing integral and
    * fractional kinds across rows drops out (conservative — absent
    * columns never prune). None when no column qualifies. */
  private[v2] def statsOf(docs: Seq[Seq[(String, Any)]])
      : Option[DocStoreZonemap.FileStats] = {
    if (docs.isEmpty) return None
    val cols = scala.collection.mutable.LinkedHashMap
      .empty[String, DocStoreZonemap.ColStats]
    val mixed = scala.collection.mutable.Set.empty[String]
    val seen = scala.collection.mutable.Set.empty[String]
    docs.foreach(_.foreach { case (k, v) => v match {
      case _: java.lang.Long | _: java.lang.Double => seen += k
      case _ => mixed += k // non-numeric: never track
    }})
    val tracked = (seen -- mixed).toSeq
    docs.foreach { doc =>
      val m = doc.toMap
      tracked.foreach { k =>
        val prev = cols.get(k).orNull
        m.getOrElse(k, null) match {
          case l: java.lang.Long =>
            val v = l.longValue()
            if (prev == null || prev.nonNulls == 0L)
              cols(k) = DocStoreZonemap.ColStats('i', v, v, 0d, 0d,
                if (prev == null) 0L else prev.nulls, 1L)
            else if (prev.kind != 'i') mixed += k
            else cols(k) = prev.copy(iLo = math.min(prev.iLo, v),
              iHi = math.max(prev.iHi, v), nonNulls = prev.nonNulls + 1)
          case d: java.lang.Double =>
            val (lo, hi) =
              if (d.isNaN) (Double.NegativeInfinity, Double.PositiveInfinity)
              else (d.doubleValue(), d.doubleValue())
            if (prev == null || prev.nonNulls == 0L)
              cols(k) = DocStoreZonemap.ColStats('f', 0L, 0L, lo, hi,
                if (prev == null) 0L else prev.nulls, 1L)
            else if (prev.kind != 'f') mixed += k
            else cols(k) = prev.copy(fLo = math.min(prev.fLo, lo),
              fHi = math.max(prev.fHi, hi), nonNulls = prev.nonNulls + 1)
          case _ => // null or absent
            cols(k) =
              if (prev == null)
                DocStoreZonemap.ColStats('i', 0L, 0L, 0d, 0d, 1L, 0L)
              else prev.copy(nulls = prev.nulls + 1)
        }
      }
    }
    mixed.foreach(cols.remove)
    Some(DocStoreZonemap.FileStats(docs.size.toLong, cols.toMap))
  }

  /** JSON re-serialization of a parsed document, mirroring the sink's
    * conventions (escape set, non-finite doubles → null). Numeric
    * TEXT may differ from the original bytes (1e-7 vs 0.0000001) but
    * the parsed VALUE is identical — the reader is the contract, not
    * the bytes. */
  private[v2] def serialize(doc: Seq[(String, Any)]): String = {
    val sb = new StringBuilder("{")
    var first = true
    doc.foreach { case (k, v) =>
      if (!first) sb.append(',')
      first = false
      sb.append('"').append(escape(k)).append("\":")
      appendValue(sb, v)
    }
    sb.append('}').toString
  }

  private def appendValue(sb: StringBuilder, v: Any): Unit = v match {
    case null => sb.append("null"); ()
    case s: String => sb.append('"').append(escape(s)).append('"'); ()
    case l: java.lang.Long => sb.append(l.longValue()); ()
    case b: java.lang.Boolean => sb.append(b.booleanValue()); ()
    case d: java.lang.Double =>
      if (java.lang.Double.isFinite(d)) sb.append(d.doubleValue())
      else sb.append("null")
      ()
    case seq: Seq[_] =>
      sb.append('[')
      var first = true
      seq.foreach { e =>
        if (!first) sb.append(',')
        first = false
        appendValue(sb, e)
      }
      sb.append(']')
      ()
    case other => throw new UnsupportedOperationException(
      s"docstore update: cannot serialize $other")
  }

  private def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }
}
