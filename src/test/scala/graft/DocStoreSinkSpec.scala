package graft

import org.apache.spark.sql.functions._

/** The DataSource V2 WRITE path for the document-store (K4/K5) sink:
  * commit protocol (temp-file isolation → rename-on-commit → job
  * `_SUCCESS`), JSON-lines fidelity (escaping, nulls, arrays), and
  * round-trip parity with Spark's own JSON reader.
  */
class DocStoreSinkSpec extends SparkSpec {
  import spark.implicits._

  private val fmt = "graft.sources.v2.DocStoreDataSource"

  test("V2 docstore write: round-trips the documents table through spark.read.json") {
    val dir = java.nio.file.Files.createTempDirectory("docstore").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
    docs.write.format(fmt).option("path", dir).mode("append").save()

    val files = new java.io.File(dir).listFiles().map(_.getName)
    assert(files.contains("_SUCCESS"), "job marker missing after commit")
    assert(!files.exists(_.startsWith("_tmp-")), "uncommitted temp files remain")
    assert(files.exists(f => f.startsWith("part-") && f.endsWith(".jsonl")))

    val back = spark.read.json(dir)
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
    assert(back.count() === docs.count())
    assert(back.exceptAll(docs).count() === 0 && docs.exceptAll(back).count() === 0)
  }

  test("V2 docstore write: escapes control characters, quotes, and non-ASCII; keeps nulls and arrays") {
    val dir = java.nio.file.Files.createTempDirectory("docstore2").toString
    val tricky = Seq(
      (1L, "he said \"hi\"\nline2\ttab\\slash", Seq(1L, 2L, 3L)),
      (2L, "café Ümläut", Seq.empty[Long]),
      (3L, null.asInstanceOf[String], Seq(42L))
    ).toDF("id", "s", "xs")
    tricky.write.format(fmt).option("path", dir).mode("append").save()
    val back = spark.read.json(dir).select($"id", $"s", $"xs")
    assert(back.count() === 3)
    val r1 = back.filter($"id" === 1).head
    assert(r1.getString(1) === "he said \"hi\"\nline2\ttab\\slash")
    assert(r1.getSeq[Long](2) === Seq(1L, 2L, 3L))
    assert(back.filter($"id" === 3).head.isNullAt(1))
  }

  test("V2 docstore write: a failed job's abort leaves PRIOR jobs' committed files intact") {
    val dir = java.nio.file.Files.createTempDirectory("docstore4").toString
    // job 1: committed append
    Seq((1L, "keep")).toDF("id", "v")
      .write.format(fmt).option("path", dir).mode("append").save()
    val committed = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.getName).toSet
    assert(committed.nonEmpty)
    // job 2: fails mid-write (throwing expression) → BatchWrite.abort
    val boom = org.apache.spark.sql.functions.udf((i: Long) =>
      if (i >= 0) throw new RuntimeException("boom") else i)
    intercept[Exception] {
      spark.range(0, 10)
        .select($"id", boom($"id").as("v"))
        .write.format(fmt).option("path", dir).mode("append").save()
    }
    val after = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.getName).toSet
    assert(after === committed,
      s"abort must not touch prior jobs' output: before=$committed after=$after")
    // and job 2's temp files are gone
    assert(!new java.io.File(dir).listFiles().exists(_.getName.startsWith("_tmp-")))
    assert(spark.read.json(dir + "/part-*.jsonl").count() === 1)
  }

  test("V2 docstore write: parallel tasks each commit one visible file") {
    val dir = java.nio.file.Files.createTempDirectory("docstore3").toString
    spark.range(0, 1000).repartition(4)
      .select($"id", concat(lit("doc_"), $"id".cast("string")).as("body"))
      .write.format(fmt).option("path", dir).mode("append").save()
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(parts.length === 4, s"expected 4 task files, got ${parts.length}")
    assert(spark.read.json(dir).count() === 1000)
  }
}
