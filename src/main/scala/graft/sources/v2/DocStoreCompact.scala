package graft.sources.v2

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, StandardCopyOption}

import com.fasterxml.jackson.core.{JsonFactory, JsonToken}

/** Small-file compaction for the document store — the maintenance
  * operation every task-parallel sink eventually needs: a 1000-task
  * write job leaves 1000 files, a month of hourly jobs leaves 720k,
  * and the scan's planning cost (and the filesystem's patience) is
  * linear in file count. Compaction bin-packs committed `part-*`
  * files up to a target size and swaps each bin for one file.
  *
  * The hard part is CRASH SAFETY with only per-file atomic renames:
  * a multi-file swap cannot be atomic, so visibility is gated by a
  * MANIFEST (markers-as-truth, the CdcApply rule):
  *
  *  1. the bin's bytes stream into a `_tmp-compact-…` file (readers
  *     never see tmp files);
  *  2. a `_compact-<id>-<bin>.json` manifest (new file name + the
  *     names it replaces) renames into place FIRST;
  *  3. the data file renames to `part-compact-<id>-<bin>.jsonl` —
  *     this single atomic rename IS the commit: the moment it exists,
  *     [[liveFiles]] hides every replaced file;
  *  4. the replaced files are deleted — pure garbage collection by
  *     then, safe to crash through.
  *
  * Crash between 2 and 3 → the manifest points at a file that does
  * not exist → void, originals stay live (the next [[compact]] sweeps
  * it). Crash between 3 and 4 → replaced files linger on disk but are
  * DEAD under the manifest rule → no duplicate rows, swept later.
  * Readers need no locks: every state of the directory reads
  * consistently.
  *
  * Zone maps survive compaction: when every member of a bin has
  * stats, the bin's merged stats (min/min, max/max, sums — an exact
  * merge) are persisted for the new file BEFORE its rename, so file
  * skipping keeps working on compacted data. Any member without
  * stats → the new file gets none → it is always scanned
  * (conservative, the zonemap contract).
  *
  * JSON-lines concatenation is byte-exact: the writer terminates
  * every line with '\n', so a compacted file is the concatenation of
  * its members' bytes — no parse, no re-serialize, no row loss. A
  * hand-dropped member missing its final newline gets one inserted
  * (checked against its last byte) so rows never fuse across a bin.
  *
  * CONCURRENCY: compaction is SINGLE-WRITER. Readers never need
  * locks (every directory state reads consistently), but two
  * concurrent compactors could interleave fatally — one's [[sweep]]
  * would see the other's just-renamed manifest with its data file not
  * yet renamed, judge it void, and delete it; when the data rename
  * then lands, the new file AND the files it replaced are all live →
  * duplicate rows. [[compact]] and [[sweep]] therefore serialize on a
  * `_compact.lock` file (atomic create-new) held for the duration; a
  * second compactor fails fast with [[ConcurrentCompactionException]]
  * instead of corrupting. A lock older than [[LockStaleMs]] is
  * presumed crash debris and broken.
  */
object DocStoreCompact {

  final class ConcurrentCompactionException(msg: String)
    extends IllegalStateException(msg)

  /** A `_compact.lock` whose mtime is older than this is crash
    * debris, not a live compactor, and is broken. Liveness is judged
    * by HEARTBEAT, not job length: the lock holder refreshes the
    * lock's mtime every [[HeartbeatMs]] for as long as its body runs,
    * so a deleteWhere/updateWhere/compact holding the lock across a
    * long Spark job never reads as stale — only a holder whose JVM
    * actually died stops beating. */
  val LockStaleMs: Long = 10 * 60 * 1000L

  /** Lock mtime refresh period — 5 beats fit in one staleness window,
    * so a single missed beat (GC pause, NFS hiccup) never breaks a
    * live lock. */
  val HeartbeatMs: Long = LockStaleMs / 5

  /** Break a lock file observed stale at `observedMtime`, by ATOMIC
    * RENAME to a unique name: of N concurrent breakers exactly one
    * move succeeds (the file exists only once), so the
    * observe-then-delete TOCTOU — where a slow breaker's delete()
    * lands AFTER the winner re-created a fresh lock and kills it,
    * admitting two mutators — cannot happen. The rename does NOT
    * serialize breaker-vs-fresh-acquirer, though: between observing
    * the stale mtime and our move, a faster breaker may have broken
    * the same stale lock and created a FRESH one — which our move
    * just displaced. The debris mtime detects that: if it differs
    * from what we observed, put the fresh lock back (or, if the slot
    * was re-filled meanwhile, leave the debris; its holder's
    * heartbeat notices the missing lock and aborts loudly) and report
    * failure. Returns true only when the broken lock was the one
    * observed, i.e. acquisition may proceed. */
  private[v2] def breakStale(dir: String, lock: File,
      observedMtime: Long): Boolean = {
    val debris = new File(dir, "_compact.lock.broken-" +
      java.util.UUID.randomUUID().toString.take(8))
    val broke =
      try {
        Files.move(lock.toPath, debris.toPath,
          StandardCopyOption.ATOMIC_MOVE)
        true
      } catch { case _: java.io.IOException => false }
    if (broke && debris.lastModified() != observedMtime) {
      try Files.move(debris.toPath, lock.toPath,
        StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.io.IOException => () }
      false
    } else {
      if (broke) debris.delete()
      broke
    }
  }

  private[v2] def withLock[A](dir: String,
      heartbeatMs: Long = HeartbeatMs)(body: => A): A = {
    val lock = new File(dir, "_compact.lock")
    def tryCreate(): Boolean =
      try { Files.createFile(lock.toPath); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    val acquired = tryCreate() || {
      val observedMtime = lock.lastModified()
      val age = System.currentTimeMillis() - observedMtime
      if (observedMtime > 0L && age > LockStaleMs)
        breakStale(dir, lock, observedMtime) && tryCreate()
      else false
    }
    if (!acquired)
      throw new ConcurrentCompactionException(
        s"$dir: another compaction holds _compact.lock " +
          "(compact/sweep are single-writer; see class doc)")
    // Identity token: the lock PATH is shared by every generation of
    // holder, so "the file exists" does not mean "OUR lock survives" —
    // a breaker could have replaced it with its own. The token makes
    // the beat (and the release below) verify ownership, not presence.
    val token = java.util.UUID.randomUUID().toString
    try Files.writeString(lock.toPath, token)
    catch { case _: java.io.IOException => () }
    def ownLock(): Boolean =
      try lock.isFile && Files.readString(lock.toPath) == token
      catch { case _: java.io.IOException => false }
    // heartbeat while the body runs (daemon thread — dies with the
    // JVM, which is exactly when beating SHOULD stop). If the lock is
    // broken out from under us (clock skew, manual deletion, the
    // displaced-fresh-lock path above), the holder must NOT keep
    // mutating silently without a lock: the beat flags the loss and
    // interrupts the holder so the mutation aborts loudly.
    val holder = Thread.currentThread()
    val lost = new java.util.concurrent.atomic.AtomicBoolean(false)
    val beat = new Thread(() => {
      try {
        var beating = true
        while (beating) {
          Thread.sleep(heartbeatMs)
          val ok = ownLock() &&
            lock.setLastModified(System.currentTimeMillis())
          if (!ok) {
            lost.set(true)
            holder.interrupt()
            beating = false
          }
        }
      } catch { case _: InterruptedException => () }
    }, s"docstore-lock-heartbeat-$dir")
    beat.setDaemon(true)
    beat.start()
    def lockLost(): Nothing =
      throw new ConcurrentCompactionException(
        s"$dir: _compact.lock lost mid-mutation (broken externally); " +
          "aborting instead of mutating unlocked")
    try {
      val r =
        try body
        catch {
          case _: InterruptedException if lost.get() => lockLost()
          case e: RuntimeException
              if lost.get() && e.getCause.isInstanceOf[InterruptedException] =>
            lockLost()
        }
      if (lost.get()) lockLost()
      r
    } finally {
      beat.interrupt()
      // release only OUR lock: if it was lost, the file now on disk
      // (if any) belongs to whoever broke ours — leave it alone
      if (!lost.get() && ownLock()) lock.delete()
      Thread.interrupted() // clear a beat-thread interrupt that landed late
      ()
    }
  }

  /** Grace period before a REPLACED (dead) file's bytes leave disk.
    * Planning-time consistency never needed locks — every directory
    * state reads consistently — but a reader that LISTED files before
    * a compaction commit and is still scanning them when GC lands
    * would hit FileNotFound mid-scan (sub-second exposure at test
    * scale, hours at 100 TB). Dead files therefore linger, hidden by
    * their manifest, until the manifest is older than this horizon;
    * only then does [[sweep]] delete file and manifest together (the
    * CdcApply retention-vacuum rule, CdcApply.vacuum). Size it above
    * the longest scan you schedule against the store; 0 = immediate
    * GC (tests, single-process use). */
  val DeadFileRetentionMs: Long = 10 * 60 * 1000L

  final case class Manifest(newFile: String, replaces: Seq[String])

  final case class Result(binsWritten: Int, filesReplaced: Int,
      manifestsSwept: Int, bytesWritten: Long)

  /** Committed, VISIBLE part files: `part-*.jsonl` minus files
    * replaced by a COMPLETED compaction (manifest present AND its new
    * file present). The single rule that makes every crash state
    * readable. */
  def liveFiles(dir: String): Array[File] = {
    val all = Option(new File(dir).listFiles()).getOrElse(Array.empty[File])
    val parts = all.filter(f => f.isFile && f.getName.startsWith("part-") &&
      f.getName.endsWith(".jsonl"))
    val partNames = parts.map(_.getName).toSet
    val dead = manifests(dir).collect {
      case m if partNames.contains(m.newFile) => m.replaces
    }.flatten.toSet
    // update-commit rule (DocStoreUpdates): a `part-update-<X>.jsonl`
    // is LIVE only once its `_dv-update-<X>.json` marker exists — the
    // marker's rename is the single commit point that simultaneously
    // kills the old copies (it IS their deletion vector) and admits
    // the rewritten ones; before it, the update is invisible debris
    val names = all.map(_.getName).toSet
    parts.filterNot { f =>
      dead.contains(f.getName) ||
        (f.getName.startsWith("part-update-") &&
          !names.contains("_dv-update-" +
            f.getName.stripPrefix("part-update-") + ".json"))
    }.sortBy(_.getName)
  }

  /** Compact `dir`: sweep prior crash debris, then bin-pack live
    * files smaller than `targetBytes` (first-fit over name order, bins
    * of ≥ 2 files only) and swap each bin for one compacted file under
    * the manifest protocol. Idempotent: a second run with the same
    * target finds nothing to do. */
  def compact(dir: String, targetBytes: Long,
      id: String = java.util.UUID.randomUUID().toString.take(8),
      retentionMs: Long = DeadFileRetentionMs): Result =
    withLock(dir) { compactLocked(dir, targetBytes, id, retentionMs) }

  private def compactLocked(dir: String, targetBytes: Long,
      id: String, retentionMs: Long): Result = {
    require(targetBytes > 0, "compact: targetBytes must be positive")
    val swept = sweepLocked(dir, retentionMs)
    val live = liveFiles(dir)
    // candidates: small files (the file-count problem) plus ANY file
    // with deletion-vector dead rows (the merge-on-read amortization
    // point — rewriting is the only way the dead bytes leave disk, and
    // the rewrite drops them so the DV entries become GC-able)
    val dv = DocStoreDeletes.load(dir)
    def hasDead(f: File): Boolean = dv.get(f.getName).exists(_.nonEmpty)
    val small = live.filter(f => f.length() < targetBytes || hasDead(f))
    // first-fit bins over name order; a swap is justified by >= 2
    // members (fewer files) or by a member with dead rows (fewer bytes)
    val bins = scala.collection.mutable.ArrayBuffer.empty[Vector[File]]
    var cur = Vector.empty[File]
    var curBytes = 0L
    for (f <- small) {
      if (cur.nonEmpty && curBytes + f.length() > targetBytes) {
        bins += cur; cur = Vector.empty; curBytes = 0L
      }
      cur = cur :+ f
      curBytes += f.length()
    }
    if (cur.nonEmpty) bins += cur
    val todo = bins.filter(bin => bin.size >= 2 || bin.exists(hasDead))
    val zm = if (todo.nonEmpty) DocStoreZonemap.load(dir)
      else Map.empty[String, DocStoreZonemap.FileStats]
    var replaced = 0
    var bytes = 0L
    todo.zipWithIndex.foreach { case (bin, k) =>
      val newName = s"part-compact-$id-$k.jsonl"
      // the id is caller-suppliable: reusing one across runs would let
      // the ATOMIC_MOVE below silently replace a COMMITTED live file
      // from the earlier run — fail instead of destroying data
      if (new File(dir, newName).exists() ||
          new File(dir, s"_compact-$id-$k.json").exists())
        throw new IllegalArgumentException(
          s"compact: id '$id' already used in $dir ($newName exists); " +
            "pick a fresh id")
      val tmp = new File(dir, s"_tmp-compact-$id-$k")
      val binDead = bin.exists(hasDead)
      var liveRows = 0L // exact, counted only on the line-filtered path
      if (!binDead) {
        // fast path: byte-exact concatenation, no parse
        val out = new java.io.FileOutputStream(tmp)
        try bin.foreach { f =>
          Files.copy(f.toPath, out)
          // byte-exact concat is only row-exact if every member ends in
          // '\n'; a hand-dropped file without one would fuse its last
          // row with the next member's first — insert the separator
          if (!endsWithNewline(f)) out.write('\n')
        }
        finally out.close()
      } else {
        // dead-purging path: stream lines, dropping DV positions (the
        // non-empty-line ordinal convention) — the compacted file is
        // born clean and its replaced files' DV entries GC on sweep
        val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
          new java.io.FileOutputStream(tmp), StandardCharsets.UTF_8))
        try bin.foreach { f =>
          val dead = dv.getOrElse(f.getName, scala.collection.immutable.BitSet.empty)
          val in = new java.io.BufferedReader(new java.io.InputStreamReader(
            new java.io.FileInputStream(f), StandardCharsets.UTF_8))
          try {
            var pos = 0
            var line = in.readLine()
            while (line != null) {
              if (line.nonEmpty) {
                if (!dead(pos)) { out.write(line); out.write('\n'); liveRows += 1 }
                pos += 1
              }
              line = in.readLine()
            }
          } finally in.close()
        }
        finally out.close()
      }
      // merged zone map BEFORE visibility (markers-as-truth order).
      // After a dead purge the row count is the EXACT live count
      // (needed by the scan's fully-dead skip); column min/max and
      // null counts remain conservative supersets — every provesEmpty
      // proof over a superset holds for the subset.
      mergedStats(bin.map(_.getName), zm)
        .map(fs => if (binDead) fs.copy(rows = liveRows) else fs)
        .foreach { fs =>
        val zf = new File(dir, s"_zonemap-compact-$id-$k.json")
        val zTmp = new File(dir, s"_tmp-compact-$id-$k.zm")
        Files.write(zTmp.toPath,
          (DocStoreZonemap.statsJsonLine(newName, fs) + "\n")
            .getBytes(StandardCharsets.UTF_8))
        Files.move(zTmp.toPath, zf.toPath, StandardCopyOption.ATOMIC_MOVE)
      }
      // manifest first: while the new file is absent it is void
      val mf = new File(dir, s"_compact-$id-$k.json")
      val mTmp = new File(dir, s"_tmp-compact-$id-$k.mf")
      Files.write(mTmp.toPath,
        manifestJson(Manifest(newName, bin.map(_.getName)))
          .getBytes(StandardCharsets.UTF_8))
      Files.move(mTmp.toPath, mf.toPath, StandardCopyOption.ATOMIC_MOVE)
      // the commit point: one atomic rename flips visibility
      Files.move(tmp.toPath, new File(dir, newName).toPath,
        StandardCopyOption.ATOMIC_MOVE)
      bytes += new File(dir, newName).length()
      // garbage collection — safe to crash anywhere in here. With a
      // retention horizon the replaced files LINGER (dead under the
      // manifest rule, invisible to planning) so in-flight readers
      // that listed them pre-commit finish their scans; a later
      // [[sweep]] deletes file + manifest together once the manifest
      // outlives the horizon.
      if (retentionMs <= 0L) bin.foreach(f => f.delete())
      replaced += bin.size
    }
    Result(todo.size, replaced, swept, bytes)
  }

  /** Remove crash debris: void manifests (new file never appeared)
    * with their tmp files, dead replaced files that a crash left
    * behind, and manifests whose cleanup completed. Returns the number
    * of manifests removed. */
  def sweep(dir: String, retentionMs: Long = DeadFileRetentionMs): Int =
    withLock(dir) { sweepLocked(dir, retentionMs) }

  private def sweepLocked(dir: String, retentionMs: Long): Int = {
    val all = Option(new File(dir).listFiles()).getOrElse(Array.empty[File])
    val partNames = all.filter(f => f.isFile && f.getName.startsWith("part-"))
      .map(_.getName).toSet
    var removed = 0
    manifestFiles(dir).foreach { mf =>
      parseManifest(mf) match {
        case Some(m) if partNames.contains(m.newFile) &&
            System.currentTimeMillis() - mf.lastModified() <= retentionMs =>
          // completed but within the reader grace period: the
          // replaced files stay on disk (hidden by this manifest) so
          // scans planned before the commit can finish. The manifest
          // must survive exactly as long as they do — deleting it
          // first would resurrect them as live duplicates.
          ()
        case Some(m) if partNames.contains(m.newFile) =>
          // completed and past the horizon: replaced files are dead —
          // delete any left, and once none remain the manifest itself
          // is done
          m.replaces.foreach(n => new File(dir, n).delete())
          mf.delete(); removed += 1
        case Some(_) | None =>
          // void (crash before the data rename) or unreadable: the
          // originals are the truth; drop the manifest. Safe only
          // because the lock guarantees no in-flight compactor — an
          // unlocked sweep here is the duplicate-rows race the class
          // doc describes.
          mf.delete(); removed += 1
      }
    }
    // orphaned tmp files from any crashed run (compaction or a
    // crashed deleteWhere task)
    all.filter(f => f.isFile && (f.getName.startsWith("_tmp-compact-") ||
        f.getName.startsWith("_tmp-dv-") ||
        f.getName.startsWith("_tmp-update-") ||
        f.getName.startsWith("_tmp-updv-") ||
        f.getName.startsWith("_tmp-updz-")))
      .foreach(_.delete())
    // uncommitted updates (data renamed, marker never landed): the
    // rows are still live in their original file — pure debris
    all.filter { f =>
      f.isFile && f.getName.startsWith("part-update-") &&
        !new File(dir, "_dv-update-" +
          f.getName.stripPrefix("part-update-") + ".json").exists()
    }.foreach(_.delete())
    // deletion-vector entries whose part file is gone (compacted away)
    DocStoreDeletes.gc(dir)
    // orphaned compaction zone maps: written BEFORE the data rename,
    // so a crash in that window (or a swept void manifest) leaves a
    // `_zonemap-compact-<id>-<k>.json` whose part file never appeared
    // — without GC these accumulate unboundedly
    all.filter { f =>
      f.isFile && f.getName.endsWith(".json") && {
        val n = f.getName
        (n.startsWith("_zonemap-compact-") &&
          !partNames.contains(
            "part-" + n.stripPrefix("_zonemap-").stripSuffix(".json") +
              ".jsonl")) ||
        (n.startsWith("_zonemap-update-") &&
          !partNames.contains(
            "part-update-" + n.stripPrefix("_zonemap-update-")
              .stripSuffix(".json")))
      }
    }.foreach(_.delete())
    removed
  }

  /** True iff `f`'s final byte is '\n' (an empty file vacuously ends a
    * line). One seek + one byte read — cheap even over many members. */
  private def endsWithNewline(f: File): Boolean = {
    val len = f.length()
    if (len == 0L) return true
    val raf = new java.io.RandomAccessFile(f, "r")
    try { raf.seek(len - 1); raf.read() == '\n' }
    finally raf.close()
  }

  /** Exact merge of member stats — None if any member lacks stats
    * (the new file then scans unconditionally, conservative). Columns
    * missing from any member, or with mismatched kinds, drop out. */
  private[v2] def mergedStats(names: Seq[String],
      zm: Map[String, DocStoreZonemap.FileStats])
      : Option[DocStoreZonemap.FileStats] = {
    val members = names.map(zm.get)
    if (members.exists(_.isEmpty)) return None
    val stats = members.flatten
    val cols = stats.map(_.cols.keySet).reduce(_ intersect _)
    val merged = cols.flatMap { c =>
      val cs = stats.map(_.cols(c))
      if (cs.map(_.kind).distinct.size != 1) None
      else Some(c -> DocStoreZonemap.ColStats(cs.head.kind,
        cs.map(_.iLo).min, cs.map(_.iHi).max,
        cs.map(_.fLo).min, cs.map(_.fHi).max,
        cs.map(_.nulls).sum, cs.map(_.nonNulls).sum))
    }.toMap
    Some(DocStoreZonemap.FileStats(stats.map(_.rows).sum, merged))
  }

  // ---- manifest serialization ---------------------------------------

  private def manifestJson(m: Manifest): String = {
    val sb = new StringBuilder
    sb.append("{\"new\":\"").append(m.newFile).append("\",\"replaces\":[")
    m.replaces.zipWithIndex.foreach { case (r, i) =>
      if (i > 0) sb.append(',')
      sb.append('"').append(r).append('"')
    }
    sb.append("]}").toString
  }

  private def manifestFiles(dir: String): Array[File] =
    Option(new File(dir).listFiles()).getOrElse(Array.empty[File])
      .filter(f => f.isFile && f.getName.startsWith("_compact-") &&
        f.getName.endsWith(".json"))
      .sortBy(_.getName)

  private def manifests(dir: String): Seq[Manifest] =
    manifestFiles(dir).toSeq.flatMap(parseManifest)

  private val factory = new JsonFactory()

  private[v2] def parseManifest(f: File): Option[Manifest] =
    try {
      val p = factory.createParser(f)
      // close in finally — liveFiles() re-parses every manifest per
      // scan planning, so an unclosed parser leaks an fd per call
      try {
        var newFile: String = null
        val repl = scala.collection.mutable.ArrayBuffer.empty[String]
        if (p.nextToken() != JsonToken.START_OBJECT) return None
        while (p.nextToken() == JsonToken.FIELD_NAME) {
          p.getCurrentName match {
            case "new" => p.nextToken(); newFile = p.getText
            case "replaces" =>
              p.nextToken() // START_ARRAY
              while (p.nextToken() != JsonToken.END_ARRAY) repl += p.getText
            case _ => p.nextToken(); p.skipChildren()
          }
        }
        if (newFile == null) None else Some(Manifest(newFile, repl.toSeq))
      } finally p.close()
    } catch { case _: Exception => None }
}
