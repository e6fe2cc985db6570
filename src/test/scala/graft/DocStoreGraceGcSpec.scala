package graft

import java.io.File
import java.nio.file.Files

import graft.sources.v2.DocStoreCompact

/** Reader grace period for docstore GC (the CdcApply.vacuum rule
  * brought to the docstore): a compaction's replaced files must stay
  * on disk — dead under the manifest rule, invisible to planning —
  * until the manifest outlives the retention horizon, so a scan that
  * LISTED files before the commit can finish reading them. Only an
  * expired sweep deletes file and manifest together.
  */
class DocStoreGraceGcSpec extends SparkSpec {
  import spark.implicits._

  private val fmt = "graft.sources.v2.DocStoreDataSource"

  private def writeDocs(dir: String, parts: Int): Unit =
    Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text", $"lang", $"n_chars")
      .repartition(parts)
      .write.format(fmt).option("path", dir).mode("append").save()

  test("a scan planned before compaction completes within the horizon; expiry GCs file+manifest together") {
    val dir = Files.createTempDirectory("grace1").toString
    writeDocs(dir, parts = 4)
    // the in-flight reader's view: file list captured BEFORE compaction
    val planned = DocStoreCompact.liveFiles(dir)
    val expect = spark.read.format(fmt).option("path", dir).load().count()

    DocStoreCompact.compact(dir, targetBytes = 1L << 26, id = "g1",
      retentionMs = 60 * 60 * 1000L)

    // within the horizon: every pre-commit file is still on disk and
    // byte-readable — the old plan completes
    planned.foreach(f =>
      assert(f.exists(), s"replaced file ${f.getName} GC'd inside the grace period"))
    val oldPlanRows = planned.map(f =>
      Files.readAllLines(f.toPath).stream().filter(l => !l.isEmpty).count())
      .sum
    assert(oldPlanRows === expect, "pre-compaction plan no longer reads fully")
    // ... while a NEW plan sees only the compacted state, no duplicates
    assert(spark.read.format(fmt).option("path", dir).load().count() === expect)

    // a sweep inside the horizon is a no-op on the dead files AND
    // keeps the manifest (deleting it first would resurrect them)
    DocStoreCompact.sweep(dir, retentionMs = 60 * 60 * 1000L)
    planned.foreach(f =>
      assert(f.exists(), s"in-horizon sweep deleted ${f.getName}"))
    assert(new File(dir).listFiles().exists(_.getName.startsWith("_compact-g1-")),
      "in-horizon sweep dropped the masking manifest")
    assert(spark.read.format(fmt).option("path", dir).load().count() === expect)

    // simulate expiry: backdate the manifests past the horizon
    new File(dir).listFiles()
      .filter(_.getName.startsWith("_compact-g1-"))
      .foreach(m => assert(m.setLastModified(
        System.currentTimeMillis() - 2 * 60 * 60 * 1000L)))
    DocStoreCompact.sweep(dir, retentionMs = 60 * 60 * 1000L)
    planned.foreach(f =>
      assert(!f.exists(), s"expired dead file ${f.getName} not GC'd"))
    assert(!new File(dir).listFiles().exists(_.getName.startsWith("_compact-g1-")),
      "expired manifest not GC'd")
    assert(spark.read.format(fmt).option("path", dir).load().count() === expect)
  }

  test("retentionMs = 0 keeps the immediate-GC behavior") {
    val dir = Files.createTempDirectory("grace2").toString
    writeDocs(dir, parts = 4)
    val before = DocStoreCompact.liveFiles(dir)
    DocStoreCompact.compact(dir, targetBytes = 1L << 26, id = "g2",
      retentionMs = 0L)
    before.foreach(f =>
      assert(!f.exists(), s"retention 0 left replaced file ${f.getName}"))
  }
}
