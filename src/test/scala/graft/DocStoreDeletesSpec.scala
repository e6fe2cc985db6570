package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._

import graft.sources.v2.{DocStoreCompact, DocStoreDeletes, DocStoreZonemap}

/** Merge-on-read positional deletes on the docstore: append-only DV
  * files, reader-side subtraction, idempotent re-delete, the
  * compaction rewrite that purges dead lines, and DV GC once the
  * replaced files are gone.
  */
class DocStoreDeletesSpec extends SparkSpec {
  import spark.implicits._

  private val fmt = "graft.sources.v2.DocStoreDataSource"

  private def write(dir: String, parts: Int): Unit =
    (1L to 300L).map(i => (i, s"doc$i", if (i % 3 == 0) "en" else "de"))
      .toDF("doc_id", "text", "lang")
      .repartitionByRange(parts, $"doc_id")
      .write.format(fmt).option("path", dir).mode("append").save()

  private def readBack(dir: String) =
    spark.read.format(fmt).option("path", dir).load()

  test("deleteWhere subtracts matching rows; re-running is idempotent; no data file changes") {
    val dir = Files.createTempDirectory("dv1").toString
    write(dir, parts = 3)
    val dataBytes = DocStoreCompact.liveFiles(dir)
      .map(f => f.getName -> f.length()).toMap

    val n1 = DocStoreDeletes.deleteWhere(spark, dir, Seq(EqualTo("lang", "en")))
    assert(n1 == 100L)
    assert(readBack(dir).count() == 200L)
    assert(readBack(dir).filter($"lang" === "en").count() == 0L)

    // idempotent: the same predicate finds nothing LIVE the second time
    val n2 = DocStoreDeletes.deleteWhere(spark, dir, Seq(EqualTo("lang", "en")))
    assert(n2 == 0L, "re-delete must see only live rows")
    assert(readBack(dir).count() == 200L)

    // merge-on-read: every data file is byte-identical
    DocStoreCompact.liveFiles(dir).foreach { f =>
      assert(dataBytes(f.getName) == f.length(), s"${f.getName} was rewritten")
    }
    // and the DV side files are invisible to the part-file namespace
    assert(new File(dir).listFiles().exists(_.getName.startsWith("_dv-")))
  }

  test("deletes compose with pushed filters and projections") {
    val dir = Files.createTempDirectory("dv2").toString
    write(dir, parts = 3)
    DocStoreDeletes.deleteWhere(spark, dir, Seq(LessThan("doc_id", 50L)))
    val got = readBack(dir)
      .filter($"doc_id" < 120L).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == (50L to 119L).toSet)
  }

  test("compaction purges dead lines, corrects zonemap rows, and GCs the DV") {
    val dir = Files.createTempDirectory("dv3").toString
    write(dir, parts = 3)
    val n = DocStoreDeletes.deleteWhere(spark, dir, Seq(GreaterThan("doc_id", 250L)))
    assert(n == 50L)

    // files with dead rows are rewrite candidates regardless of size
    val res = DocStoreCompact.compact(dir, targetBytes = 1L << 26, id = "dvc", retentionMs = 0L)
    assert(res.binsWritten >= 1)
    assert(readBack(dir).count() == 250L)
    assert(readBack(dir).filter($"doc_id" > 250L).count() == 0L)

    // the rewritten file's zonemap carries the EXACT live row count
    val zm = DocStoreZonemap.load(dir)
    val live = DocStoreCompact.liveFiles(dir).map(_.getName)
    assert(live.forall(zm.contains), "compacted file lost stats")
    assert(zm.filterKeys(live.contains).values.map(_.rows).sum == 250L,
      "zonemap rows must reflect the purge")

    // replaced files are gone, so their DV entries GC on the sweep
    DocStoreCompact.sweep(dir, retentionMs = 0L)
    assert(!new File(dir).listFiles().exists(_.getName.startsWith("_dv-")),
      "DV entries for purged files must be garbage-collected")
    // stats() agrees: nothing dead anywhere
    assert(DocStoreDeletes.stats(dir).forall(_._3 == 0L))
  }

  test("a partially-dead file still zonemap-prunes correctly (superset proofs)") {
    val dir = Files.createTempDirectory("dv4").toString
    write(dir, parts = 3)
    // kill a slice in the middle file; range proofs must stay valid
    DocStoreDeletes.deleteWhere(spark, dir,
      Seq(And(GreaterThanOrEqual("doc_id", 120L), LessThan("doc_id", 140L))))
    val base = readBack(dir)
    val hit = base.filter($"doc_id" === 150L)
    assert(hit.rdd.getNumPartitions == 1, "zonemap pruning lost with a DV present")
    assert(hit.count() == 1L)
    assert(base.filter($"doc_id" === 130L).count() == 0L)
    assert(base.count() == 280L)
  }
}
