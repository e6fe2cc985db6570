package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink format robustness: ORC round-trip (the second columnar
  * format besides parquet) and the three corrupt-record modes for
  * schema-on-read JSON — the knobs an ingest pipeline at scale relies
  * on to quarantine bad input instead of dying mid-job.
  */
class FormatsSpec extends SparkSpec {

  test("ORC round-trip preserves schema and values, predicate pushdown applies") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("orc").toString
    val df = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select($"l_orderkey", $"l_quantity", $"l_shipdate")
    df.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == df.schema)
    assert(back.count() == df.count())
    val filtered = back.filter($"l_quantity" > 25)
    // ORC scans support pushdown like parquet: the physical plan must
    // carry the pushed filter, not a post-scan-only Filter.
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_quantity"), plan.take(500))
    assert(filtered.count() ==
      df.filter($"l_quantity" > 25).count())
  }

  test("JSON corrupt-record modes: PERMISSIVE quarantines, DROPMALFORMED drops, FAILFAST throws") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("badjson").toString
    val lines = Seq(
      """{"id": 1, "v": "ok"}""",
      """{"id": 2, "v": """,          // truncated — malformed
      """{"id": 3, "v": "fine"}""")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "data.json"),
      lines.mkString("\n").getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("_corrupt_record", StringType)))

    val permissive = spark.read.schema(schema)
      .option("mode", "PERMISSIVE").json(dir).cache()
    assert(permissive.count() == 3)
    assert(permissive.filter($"_corrupt_record".isNotNull).count() == 1)
    assert(permissive.filter($"_corrupt_record".isNotNull)
      .select($"id").head().isNullAt(0), "corrupt row parses no fields")

    val dropped = spark.read
      .schema(StructType(schema.fields.take(2)))
      .option("mode", "DROPMALFORMED").json(dir)
    assert(dropped.count() == 2)
    assert(dropped.select(sum($"id")).head().getLong(0) == 4L)

    val failfast = intercept[org.apache.spark.SparkException] {
      spark.read.schema(StructType(schema.fields.take(2)))
        .option("mode", "FAILFAST").json(dir).collect()
    }
    assert(failfast.getMessage.contains("Malformed") ||
      failfast.getCause != null)
    permissive.unpersist()
  }
}
