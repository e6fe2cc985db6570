package graft

import java.nio.file.Files
import graft.sources.{Sinks, Sources}

/** Sources/sinks/job-runner integration tests (SURVEY §2.1-§2.2, §3.4). */
class PipelineSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("csv glob source unions daily files in one read (S5/U1)") {
    import spark.implicits._
    val dir = tmp("glob")
    Seq(("a", 1)).toDF("k", "v").write.option("header", "true").csv(s"$dir/d1")
    Seq(("b", 2)).toDF("k", "v").write.option("header", "true").csv(s"$dir/d2")
    val schema = org.apache.spark.sql.types.StructType.fromDDL("k string, v int")
    val df = Sources.csvGlob(spark, schema, s"$dir/*")
    assert(df.count() == 2)
    assert(df.agg(sum($"v")).head.getLong(0) == 3)
  }

  test("permissive csv isolates malformed rows in _corrupt_record (§4 error isolation)") {
    val dir = tmp("bad")
    Files.writeString(java.nio.file.Path.of(s"$dir/f.csv"),
      "k,v\ngood,1\nbad_row_with_no_delim_and_extra,2,3,4\n")
    val schema = org.apache.spark.sql.types.StructType.fromDDL("k string, v int")
    val df = Sources.csvPermissive(spark, schema, s"$dir/f.csv").cache()
    assert(df.count() == 2)
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 1)
  }

  test("dynamic partition overwrite makes daily re-runs idempotent (K1/§4)") {
    import spark.implicits._
    val dir = tmp("daily")
    val day1 = Seq(("austin", "2020-01-08", 100), ("woburn", "2020-01-08", 200))
      .toDF("city", "date", "price")
    Sinks.overwriteDailyPartitions(day1, dir)
    // re-run the same day with corrected data — must replace, not append
    val day1Fixed = Seq(("austin", "2020-01-08", 101), ("woburn", "2020-01-08", 201))
      .toDF("city", "date", "price")
    Sinks.overwriteDailyPartitions(day1Fixed, dir)
    val out = spark.read.parquet(dir)
    assert(out.count() == 2)
    assert(out.agg(sum($"price")).head.getLong(0) == 302)
  }

  test("mergeUpsert: updates replace matching keys, new keys insert (K6)") {
    import spark.implicits._
    val dir = tmp("merge") + "/t"
    val base = Seq((1L, "a", 100), (2L, "b", 200), (3L, "c", 300))
      .toDF("id", "name", "price")
    Sinks.mergeUpsert(base, dir, "id") // no target yet → plain write
    val batch = Seq((2L, "b2", 250), (4L, "d", 400)).toDF("id", "name", "price")
    Sinks.mergeUpsert(batch, dir, "id")
    def state() = spark.read.parquet(dir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    assert(state() == Seq((1L, "a", 100), (2L, "b2", 250), (3L, "c", 300), (4L, "d", 400)))
    // idempotency: replaying the same batch changes nothing
    Sinks.mergeUpsert(batch, dir, "id")
    assert(state() == Seq((1L, "a", 100), (2L, "b2", 250), (3L, "c", 300), (4L, "d", 400)))
  }

  test("mergeUpsert partitioned: only touched partitions rewrite (K6 at scale)") {
    import spark.implicits._
    val dir = tmp("mergep") + "/t"
    val base = Seq((1L, "austin", 100), (2L, "austin", 200), (3L, "woburn", 300))
      .toDF("id", "city", "price")
    Sinks.mergeUpsert(base, dir, "id", partitions = Seq("city"))
    val untouchedFiles = new java.io.File(s"$dir/city=woburn").listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).toSet
    Sinks.mergeUpsert(
      Seq((2L, "austin", 222), (5L, "austin", 500)).toDF("id", "city", "price"),
      dir, "id", partitions = Seq("city"))
    val got = spark.read.parquet(dir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getAs[String]("city"), r.getAs[Int]("price"))).toSeq
    assert(got == Seq((1L, "austin", 100), (2L, "austin", 222),
      (3L, "woburn", 300), (5L, "austin", 500)))
    // the woburn partition's files were not rewritten
    val after = new java.io.File(s"$dir/city=woburn").listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).toSet
    assert(after == untouchedFiles)
  }

  test("JDBC round-trip via embedded Derby (S6/K3)") {
    import spark.implicits._
    val url = "jdbc:derby:memory:graftdb;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val df = Seq((1, "a", 100), (2, "b", 200)).toDF("apt_id", "name", "price")
    Sinks.jdbcAppend(df, url, "apartments", dropCols = Seq("apt_id"), props = props)
    val back = Sources.jdbcTable(spark, url, "apartments", props)
    assert(back.columns.sorted.toSeq == Seq("name", "price"))
    assert(back.count() == 2)
    // projection pushdown path: select one column
    assert(back.select("price").as[Int].collect().sorted.toSeq == Seq(100, 200))
  }

  test("JobRunner: config-driven extract → transform → load (advanced.ipynb shape)") {
    import spark.implicits._
    val dir = tmp("cfg")
    Seq(("btc", 50000), ("eth", 3000)).toDF("sym", "usd")
      .write.option("header", "true").csv(s"$dir/crypto")
    val config =
      s"""{"data_sources": {"csv": {"CryptoMarkets": "$dir/crypto"},
         |                  "nope": {"Missing": "/does/not/matter"}}}""".stripMargin
    val loaded = scala.collection.mutable.Map[String, Long]()
    val result = JobRunner.run(
      spark, config,
      transforms = Map("CryptoMarkets" -> (df => df.filter(col("usd").cast("int") > 10000))),
      load = (name, df) => loaded(name) = df.count())
    assert(result("CryptoMarkets") == Right(1L))
    assert(result("Missing").isLeft)
    assert(loaded("CryptoMarkets") == 1L)
  }

  test("JobRunner parses the reference data_config.json shape") {
    val cfg =
      """{"data_sources": {"api": {"Pollution": "u1", "Economy": "u2"},
        |                  "csv": {"CryptoMarkets": "crypto-markets.csv"}}}""".stripMargin
    val specs = JobRunner.parseConfig(cfg)
    assert(specs.toSet == Set(
      JobRunner.SourceSpec("api", "Pollution", "u1"),
      JobRunner.SourceSpec("api", "Economy", "u2"),
      JobRunner.SourceSpec("csv", "CryptoMarkets", "crypto-markets.csv")))
  }

  test("JSON-lines sink/source round trip (K4/K5, S7 document shape)") {
    import spark.implicits._
    val dir = tmp("jsonl") + "/docs"
    val docs = Seq(("t1", "content one", "Scott"), ("t2", "content two", "Ana"))
      .toDF("title", "content", "author")
    Sinks.jsonLines(docs, dir)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "title string, content string, author string")
    val back = Sources.jsonLines(spark, schema, dir)
    assert(back.count() == 2)
    // S9-style equality find over the document sink
    assert(back.filter(col("author") === "Scott").count() == 1)
  }

  test("jsonBody parses a driver-fetched API payload (S7)") {
    val body = """[{"city": "Austin", "aqi": 42}, {"city": "Delhi", "aqi": 180}]"""
    val df = Sources.jsonBody(spark, body)
    assert(df.count() == 2)
    assert(df.filter(col("aqi") > 100).select("city").head.getString(0) == "Delhi")
  }

  test("compact rewrites a many-small-files directory, preserving rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compact").toString
    // 16 writer tasks → 16 small files
    (1 to 1000).toDF("v").repartition(16).write.mode("overwrite").parquet(dir)
    def parquetFiles = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parquetFiles == 16)
    val before = spark.read.parquet(dir).as[Int].collect().sorted.toSeq
    val n = Sinks.compact(spark, dir, targetBytes = 64L * 1024 * 1024)
    assert(n == 1 && parquetFiles == 1)
    val after = spark.read.parquet(dir).as[Int].collect().sorted.toSeq
    assert(after == before)
  }
}
