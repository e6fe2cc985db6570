package graft.sources.v2

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** The DataSource V2 READ path of the document store: inferred-schema
  * round trip through the real scan, projection pruning reaching the
  * reader, filter pushdown reported and honored, schema-on-read over
  * heterogeneous appended jobs, and byte-exact adversarial strings
  * through writer AND reader.
  */
class V2ReadSpec extends SparkSpec {
  import spark.implicits._

  private val fmt = "graft.sources.v2.DocStoreDataSource"

  private def scanOf(df: org.apache.spark.sql.DataFrame): DocStoreScan =
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan
    }.get.asInstanceOf[DocStoreScan]

  test("V2 read: round-trips the sink's output through the native scan with inferred schema") {
    val dir = java.nio.file.Files.createTempDirectory("dsr1").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
    docs.write.format(fmt).option("path", dir).mode("append").save()

    val back = spark.read.format(fmt).load(dir)
    assert(back.schema.fieldNames.toSeq ===
      Seq("doc_id", "text", "lang", "source", "n_chars"),
      "inferred schema must keep writer field order")
    assert(back.schema("doc_id").dataType.typeName === "long")
    assert(back.schema("text").dataType.typeName === "string")
    assert(back.count() === docs.count())
    assert(back.exceptAll(docs).count() === 0 && docs.exceptAll(back).count() === 0)
  }

  test("V2 read: projection pushdown narrows the scan's read schema") {
    val dir = java.nio.file.Files.createTempDirectory("dsr2").toString
    Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
      .write.format(fmt).option("path", dir).mode("append").save()
    val projected = spark.read.format(fmt).load(dir).select($"doc_id", $"lang")
    assert(scanOf(projected).readSchema().fieldNames.toSeq === Seq("doc_id", "lang"),
      "pruneColumns did not reach the scan")
    assert(projected.distinct().count() > 0)
  }

  test("V2 read: filters push to the reader (reported in the scan) and results stay exact") {
    val dir = java.nio.file.Files.createTempDirectory("dsr3").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"lang", $"n_chars")
    docs.write.format(fmt).option("path", dir).mode("append").save()

    val q = spark.read.format(fmt).load(dir)
      .filter($"lang" === "en" && $"n_chars" > 200L)
    val desc = scanOf(q).description()
    assert(desc.contains("EqualTo(lang,en)"), desc)
    assert(desc.contains("GreaterThan(n_chars,200)"), desc)
    val want = docs.filter($"lang" === "en" && $"n_chars" > 200L)
    assert(q.count() === want.count() && want.count() > 0)
    assert(q.exceptAll(want).count() === 0)
  }

  test("V2 read: IN / IsNull / string-match filters evaluate exactly in the reader") {
    val dir = java.nio.file.Files.createTempDirectory("dsr4").toString
    Seq((1L, "alpha", "en"), (2L, null.asInstanceOf[String], "de"),
      (3L, "beta", "en"), (4L, "alphabet", null.asInstanceOf[String]))
      .toDF("id", "s", "lang")
      .write.format(fmt).option("path", dir).mode("append").save()
    val t = spark.read.format(fmt).load(dir)
    assert(t.filter($"lang".isin("en", "fr")).collect().map(_.getLong(0)).sorted
      === Array(1L, 3L))
    assert(t.filter($"s".isNull).collect().map(_.getLong(0)) === Array(2L))
    assert(t.filter($"s".startsWith("alpha")).collect().map(_.getLong(0)).sorted
      === Array(1L, 4L))
    // pushdown reported for the IN case
    val desc = scanOf(t.filter($"lang".isin("en", "fr"))).description()
    assert(desc.contains("In(lang"), desc)
  }

  test("V2 read: schema-on-read over heterogeneous appended jobs null-fills missing fields") {
    val dir = java.nio.file.Files.createTempDirectory("dsr5").toString
    Seq((1L, "old")).toDF("id", "v")
      .write.format(fmt).option("path", dir).mode("append").save()
    Seq((2L, "new", 0.5)).toDF("id", "v", "score")
      .write.format(fmt).option("path", dir).mode("append").save()
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, v STRING, score DOUBLE")
    val t = spark.read.format(fmt).schema(schema).load(dir).orderBy("id")
    val rows = t.collect()
    assert(rows.length === 2)
    assert(rows(0).isNullAt(2), "job-1 doc must null-fill the unknown field")
    assert(rows(1).getDouble(2) === 0.5)
  }

  test("V2 read: adversarial strings survive writer AND native reader byte-identically") {
    val dir = java.nio.file.Files.createTempDirectory("dsr6").toString
    val tricky = Seq(
      (1L, "he said \"hi\"\nline2\ttab\\slash"),
      (2L, "café Ümläut 中文 😀"),
      (3L, "\u0001control\u0007soup"),
      (4L, "{\"not\":\"json injection\"}"))
      .toDF("id", "s")
    tricky.write.format(fmt).option("path", dir).mode("append").save()
    val back = spark.read.format(fmt).load(dir)
    assert(back.count() === 4)
    val got = back.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = tricky.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === want)
  }
}
