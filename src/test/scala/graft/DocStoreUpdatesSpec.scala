package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._

import graft.sources.v2.{DocStoreCompact, DocStoreDeletes, DocStoreUpdates}

/** Merge-on-read updates on the docstore: the marker-gated two-file
  * commit (old copies die and new copies appear atomically under ONE
  * rename), original files never rewritten, crash windows readable,
  * compaction folds updates away.
  */
class DocStoreUpdatesSpec extends SparkSpec {
  import spark.implicits._

  private val fmt = "graft.sources.v2.DocStoreDataSource"

  private def write(dir: String, parts: Int): Unit =
    (1L to 300L).map(i => (i, s"doc$i", if (i % 3 == 0) "en" else "de", i * 10L))
      .toDF("doc_id", "text", "lang", "score")
      .repartitionByRange(parts, $"doc_id")
      .write.format(fmt).option("path", dir).mode("append").save()

  private def readBack(dir: String) =
    spark.read.format(fmt).option("path", dir).load()

  test("updateWhere rewrites matching rows only; originals untouched on disk") {
    val dir = Files.createTempDirectory("up1").toString
    write(dir, parts = 3)
    val beforeBytes = DocStoreCompact.liveFiles(dir)
      .map(f => f.getName -> f.length()).toMap

    val n = DocStoreUpdates.updateWhere(spark, dir,
      Seq(EqualTo("lang", "en")),
      Map("lang" -> "en-GB", "reviewed" -> true))
    assert(n == 100L)

    val after = readBack(dir)
    assert(after.count() == 300L, "update must not change the row count")
    assert(after.filter($"lang" === "en").count() == 0L)
    assert(after.filter($"lang" === "en-GB").count() == 100L)
    // untouched fields survive byte-for-byte semantics
    assert(after.filter($"lang" === "en-GB")
      .agg(sum($"score")).head.getLong(0) ==
      (1L to 300L).filter(_ % 3 == 0).map(_ * 10L).sum)
    // the new field exists on updated rows, null elsewhere
    assert(after.filter($"reviewed" === true).count() == 100L)
    assert(after.filter($"reviewed".isNull).count() == 200L)
    // original data files were never opened for writing
    beforeBytes.foreach { case (name, len) =>
      assert(new File(dir, name).length() == len, s"$name was rewritten")
    }
  }

  test("the marker is the commit: a part-update file without it is invisible, then swept") {
    val dir = Files.createTempDirectory("up2").toString
    write(dir, parts = 2)
    DocStoreUpdates.updateWhere(spark, dir,
      Seq(EqualTo("doc_id", 7L)), Map("text" -> "patched"))
    val marker = new File(dir).listFiles()
      .find(_.getName.startsWith("_dv-update-")).get
    val updFile = new File(dir,
      "part-update-" + marker.getName.stripPrefix("_dv-update-")
        .stripSuffix(".json"))
    assert(updFile.exists())
    // simulate the crash window: data renamed, marker never landed
    val markerBytes = Files.readAllBytes(marker.toPath)
    marker.delete()
    val rows = readBack(dir)
    assert(rows.count() == 300L)
    assert(rows.filter($"text" === "patched").count() == 0L,
      "uncommitted update visible")
    assert(rows.filter($"doc_id" === 7L && $"text" === "doc7").count() == 1L,
      "original row lost in the crash window")
    // sweep clears the debris and the store reads exactly as before
    DocStoreCompact.sweep(dir, retentionMs = 0L)
    assert(!updFile.exists(), "uncommitted update file not swept")
    assert(markerBytes.nonEmpty) // (the marker, once landed, IS a DV:
    // restoring one by hand after its part file is gone would delete
    // the old copies without their replacements — markers are
    // authoritative and must never be hand-moved across states)
    assert(readBack(dir).count() == 300L)
  }

  test("update-the-update applies to current live rows; gc keeps the live marker") {
    val dir = Files.createTempDirectory("up3").toString
    write(dir, parts = 2)
    assert(DocStoreUpdates.updateWhere(spark, dir,
      Seq(LessThanOrEqual("doc_id", 50L)), Map("score" -> 0L)) == 50L)
    assert(DocStoreUpdates.updateWhere(spark, dir,
      Seq(And(LessThanOrEqual("doc_id", 50L), EqualTo("score", 0L))),
      Map("score" -> 5L)) == 50L)
    val got = readBack(dir).filter($"doc_id" <= 50L)
      .agg(sum($"score"), count(lit(1))).head()
    assert(got.getLong(0) == 250L && got.getLong(1) == 50L)
    // the markers survive sweeps while their part files live
    DocStoreCompact.sweep(dir, retentionMs = 0L)
    assert(readBack(dir).filter($"doc_id" <= 50L && $"score" === 5L).count() == 50L,
      "sweep un-committed an update")
  }

  test("compaction folds updates away and GCs the markers") {
    val dir = Files.createTempDirectory("up4").toString
    write(dir, parts = 2)
    DocStoreUpdates.updateWhere(spark, dir,
      Seq(EqualTo("lang", "de")), Map("lang" -> "de-DE"))
    val res = DocStoreCompact.compact(dir, targetBytes = 1L << 26, id = "upc", retentionMs = 0L)
    assert(res.binsWritten >= 1)
    assert(readBack(dir).filter($"lang" === "de-DE").count() == 200L)
    assert(readBack(dir).count() == 300L)
    DocStoreCompact.sweep(dir, retentionMs = 0L)
    val leftovers = new File(dir).listFiles()
      .filter(f => f.getName.startsWith("_dv-") ||
        f.getName.startsWith("part-update-"))
    assert(leftovers.isEmpty,
      s"update debris survived compaction: ${leftovers.map(_.getName).toSeq}")
    assert(readBack(dir).filter($"lang" === "de-DE").count() == 200L)
  }

  test("updated files carry zone maps: pruning keeps working after an update") {
    val dir = Files.createTempDirectory("up6").toString
    // range-clustered so doc_id pruning is observable
    (1L to 400L).map(i => (i, s"doc$i", i * 2L))
      .toDF("doc_id", "text", "score")
      .repartitionByRange(4, $"doc_id")
      .write.format(fmt).option("path", dir).mode("append").save()
    DocStoreUpdates.updateWhere(spark, dir,
      Seq(LessThanOrEqual("doc_id", 100L)), Map("score" -> 7L))
    // the rewritten file got stats: a point probe into the untouched
    // range reads ONE file, not every file plus the update file
    val hit = readBack(dir).filter($"doc_id" === 350L)
    assert(hit.rdd.getNumPartitions == 1,
      "update widened the scan: rewritten file lacks a zone map")
    assert(hit.count() == 1L)
    // and a probe into the updated range still finds the new values
    val upd = readBack(dir).filter($"doc_id" === 50L)
    assert(upd.head().getLong(2) == 7L)
  }

  test("a SET-added field is inferred even past maxFiles plain part files") {
    val dir = Files.createTempDirectory("up6").toString
    // > maxFiles (8) plain part files: they sort BEFORE part-update-*,
    // so a head-only sample would never open the rewritten file and
    // the added field would silently vanish from the schema
    write(dir, parts = 12)
    DocStoreUpdates.updateWhere(spark, dir,
      Seq(EqualTo("doc_id", 123L)), Map("flagged" -> true))
    val schema = readBack(dir).schema
    assert(schema.fieldNames.contains("flagged"),
      s"update-added field missing from inferred schema: " +
        s"${schema.fieldNames.toSeq}")
    assert(readBack(dir).filter($"flagged" === true).count() == 1L)
  }

  test("unsupported filters and SET values are refused") {
    val dir = Files.createTempDirectory("up5").toString
    write(dir, parts = 1)
    intercept[IllegalArgumentException] {
      DocStoreUpdates.updateWhere(spark, dir,
        Seq(Not(EqualTo("lang", "en"))), Map("score" -> 1L))
    }
    intercept[IllegalArgumentException] {
      DocStoreUpdates.updateWhere(spark, dir,
        Seq(EqualTo("lang", "en")), Map("score" -> new Object))
    }
    assert(readBack(dir).count() == 300L)
  }
}
