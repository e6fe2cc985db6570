package graft

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.v2.{DocStoreCompact, DocStoreZonemap}

/** Small-file compaction for the docstore V2 connector: bin-packing,
  * the manifest-gated crash protocol (every crash state must read
  * consistently, never duplicated), merged zone maps, and idempotence.
  */
class DocStoreCompactSpec extends SparkSpec {
  import spark.implicits._

  private val fmt = "graft.sources.v2.DocStoreDataSource"

  private def writeDocs(dir: String, parts: Int): Unit =
    Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
      .repartition(parts)
      .write.format(fmt).option("path", dir).mode("append").save()

  private def readBack(dir: String) =
    spark.read.format(fmt).option("path", dir).load()
      .select($"doc_id", $"lang", $"n_chars")

  test("compact merges small files; the row multiset is unchanged") {
    val dir = Files.createTempDirectory("compact1").toString
    writeDocs(dir, parts = 4)
    writeDocs(dir, parts = 4)
    val before = readBack(dir).collect().sortBy(_.getLong(0)).toSeq
    val nBefore = DocStoreCompact.liveFiles(dir).length
    assert(nBefore >= 8, s"expected >= 8 part files, got $nBefore")

    val res = DocStoreCompact.compact(dir, targetBytes = 1L << 26, id = "t1", retentionMs = 0L)
    assert(res.binsWritten >= 1)
    assert(res.filesReplaced === nBefore)
    val nAfter = DocStoreCompact.liveFiles(dir).length
    assert(nAfter < nBefore, s"compaction did not reduce files: $nAfter")

    val after = readBack(dir).collect().sortBy(_.getLong(0)).toSeq
    assert(after === before, "row multiset changed across compaction")
  }

  test("crash window: manifest + new file + lingering old files -> no duplicates") {
    val dir = Files.createTempDirectory("compact2").toString
    writeDocs(dir, parts = 4)
    val victims = DocStoreCompact.liveFiles(dir).take(2)
    val saved = victims.map(f => f.getName -> Files.readAllBytes(f.toPath))
    val before = readBack(dir).count()

    DocStoreCompact.compact(dir, targetBytes = 1L << 26, id = "t2", retentionMs = 0L)
    // simulate a crash between the data rename and old-file deletion:
    // the replaced files reappear while the manifest + new file stand
    saved.foreach { case (name, bytes) =>
      Files.write(new File(dir, name).toPath, bytes)
    }
    val live = DocStoreCompact.liveFiles(dir).map(_.getName).toSet
    saved.foreach { case (name, _) =>
      assert(!live.contains(name), s"replaced file $name is visible again")
    }
    assert(readBack(dir).count() === before, "duplicate rows after crash replay")
    // the next compaction sweeps the lingering dead files
    DocStoreCompact.compact(dir, targetBytes = 1L << 26, id = "t2b", retentionMs = 0L)
    saved.foreach { case (name, _) =>
      assert(!new File(dir, name).exists(), s"dead file $name not swept")
    }
  }

  test("crash window: manifest without its new file is void; originals stay live") {
    val dir = Files.createTempDirectory("compact3").toString
    writeDocs(dir, parts = 2)
    val files = DocStoreCompact.liveFiles(dir)
    val before = readBack(dir).count()
    // a manifest from a run that died before the data rename
    Files.write(new File(dir, "_compact-dead-0.json").toPath,
      s"""{"new":"part-compact-dead-0.jsonl","replaces":["${files.head.getName}"]}"""
        .getBytes(StandardCharsets.UTF_8))
    assert(DocStoreCompact.liveFiles(dir).map(_.getName).toSet
      .contains(files.head.getName), "void manifest hid a live file")
    assert(readBack(dir).count() === before)
    val swept = DocStoreCompact.sweep(dir, retentionMs = 0L)
    assert(swept === 1)
    assert(!new File(dir, "_compact-dead-0.json").exists())
  }

  test("merged zone maps keep pruning correct on compacted files") {
    val dir = Files.createTempDirectory("compact4").toString
    // two jobs with DISJOINT doc_id ranges so stats have real spread
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"n_chars")
    docs.filter($"doc_id" < 100).repartition(2)
      .write.format(fmt).option("path", dir).mode("append").save()
    docs.filter($"doc_id" >= 100).repartition(2)
      .write.format(fmt).option("path", dir).mode("append").save()
    val res = DocStoreCompact.compact(dir, targetBytes = 1L << 26, id = "t4", retentionMs = 0L)
    assert(res.binsWritten >= 1)
    val live = DocStoreCompact.liveFiles(dir).map(_.getName)
    val zm = DocStoreZonemap.load(dir)
    live.foreach { n =>
      assert(zm.contains(n), s"compacted file $n lost its zone map")
    }
    // merged stats must still bound the data: a predicate outside the
    // global doc_id range proves every file empty
    val hiStats = zm(live.head).cols("doc_id")
    assert(hiStats.kind === 'i')
    val expected = docs.filter($"n_chars" > 400).count()
    val got = spark.read.format(fmt).option("path", dir).load()
      .filter($"n_chars" > 400).count()
    assert(got === expected, "filtered read wrong after compaction")
  }

  test("a second compactor fails fast while the lock is held; a stale lock is broken") {
    val dir = Files.createTempDirectory("compact6").toString
    writeDocs(dir, parts = 2)
    // a fresh lock (as if another process is mid-compact) must exclude
    Files.createFile(new File(dir, "_compact.lock").toPath)
    intercept[DocStoreCompact.ConcurrentCompactionException] {
      DocStoreCompact.compact(dir, targetBytes = 1L << 26, id = "t6", retentionMs = 0L)
    }
    intercept[DocStoreCompact.ConcurrentCompactionException] {
      DocStoreCompact.sweep(dir, retentionMs = 0L)
    }
    // age the lock past the staleness horizon: it is crash debris now
    new File(dir, "_compact.lock")
      .setLastModified(System.currentTimeMillis() - DocStoreCompact.LockStaleMs - 1000)
    val res = DocStoreCompact.compact(dir, targetBytes = 1L << 26, id = "t6b", retentionMs = 0L)
    assert(res.binsWritten >= 1, "stale lock was not broken")
    assert(!new File(dir, "_compact.lock").exists(), "lock not released")
  }

  test("a member missing its trailing newline does not fuse rows") {
    val dir = Files.createTempDirectory("compact7").toString
    writeDocs(dir, parts = 2)
    val before = readBack(dir).count()
    // strip the final '\n' from one member, as a hand-dropped file might
    val victim = DocStoreCompact.liveFiles(dir).head
    val bytes = Files.readAllBytes(victim.toPath)
    assert(bytes.last === '\n'.toByte)
    Files.write(victim.toPath, bytes.dropRight(1))
    DocStoreCompact.compact(dir, targetBytes = 1L << 26, id = "t7", retentionMs = 0L)
    assert(readBack(dir).count() === before,
      "row fused across members when a trailing newline was missing")
  }

  test("reusing a compaction id fails instead of replacing committed data") {
    val dir = Files.createTempDirectory("compact8").toString
    writeDocs(dir, parts = 2)
    DocStoreCompact.compact(dir, targetBytes = 1L << 26, id = "dup", retentionMs = 0L)
    writeDocs(dir, parts = 2) // new small files so the rerun has work
    intercept[IllegalArgumentException] {
      DocStoreCompact.compact(dir, targetBytes = 1L << 26, id = "dup", retentionMs = 0L)
    }
    assert(!new File(dir, "_compact.lock").exists(),
      "lock not released after failed compact")
  }

  test("sweep garbage-collects zone maps whose part file never appeared") {
    val dir = Files.createTempDirectory("compact9").toString
    writeDocs(dir, parts = 2)
    // a crash between the zonemap write and the data rename leaves this
    Files.write(new File(dir, "_zonemap-compact-gone-0.json").toPath,
      """{"file":"part-compact-gone-0.jsonl","rows":1,"cols":{}}"""
        .getBytes(StandardCharsets.UTF_8))
    DocStoreCompact.sweep(dir, retentionMs = 0L)
    assert(!new File(dir, "_zonemap-compact-gone-0.json").exists(),
      "orphaned compaction zone map not collected")
    // live compaction zone maps survive sweeps
    DocStoreCompact.compact(dir, targetBytes = 1L << 26, id = "t9", retentionMs = 0L)
    val liveZm = new File(dir, "_zonemap-compact-t9-0.json")
    assert(liveZm.exists())
    DocStoreCompact.sweep(dir, retentionMs = 0L)
    assert(liveZm.exists(), "live compaction zone map wrongly collected")
  }

  test("compaction is idempotent at the same target") {
    val dir = Files.createTempDirectory("compact5").toString
    writeDocs(dir, parts = 4)
    val r1 = DocStoreCompact.compact(dir, targetBytes = 1L << 26, id = "t5", retentionMs = 0L)
    assert(r1.binsWritten >= 1)
    val liveAfter = DocStoreCompact.liveFiles(dir).map(_.getName).toSeq
    val r2 = DocStoreCompact.compact(dir, targetBytes = 1L << 26, id = "t5b", retentionMs = 0L)
    assert(r2.binsWritten === 0, "second compaction found work")
    assert(DocStoreCompact.liveFiles(dir).map(_.getName).toSeq === liveAfter)
  }
}
