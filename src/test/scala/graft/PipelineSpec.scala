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

  test("deleteByKey: erasure removes rows, is idempotent, leaves other rows byte-identical") {
    import spark.implicits._
    val dir = tmp("del") + "/t"
    Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "v")
      .write.parquet(dir)
    def state() = spark.read.parquet(dir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    Sinks.deleteByKey(spark, dir, "id", Seq(2L, 4L).toDF("id"))
    assert(state() == Seq((1L, "a"), (3L, "c")))
    // idempotent: erasing already-absent keys is a no-op
    Sinks.deleteByKey(spark, dir, "id", Seq(2L, 99L).toDF("id"))
    assert(state() == Seq((1L, "a"), (3L, "c")))
  }

  test("deleteByKey partitioned: untouched partitions keep their files; emptied partitions VANISH") {
    import spark.implicits._
    val dir = tmp("delp") + "/t"
    val base = Seq((1L, "austin", 100), (2L, "austin", 200),
      (3L, "woburn", 300), (4L, "quincy", 400))
      .toDF("id", "city", "price")
    base.write.partitionBy("city").parquet(dir)
    val untouchedFiles = new java.io.File(s"$dir/city=woburn").listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).toSet
    // erase id 2 (austin survives with id 1) and id 4 (quincy EMPTIES)
    Sinks.deleteByKey(spark, dir, "id", Seq(2L, 4L).toDF("id"),
      partitions = Seq("city"),
      partitionFor = Some(Seq(("austin"), ("quincy")).toDF("city")))
    val got = spark.read.parquet(dir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getAs[String]("city"))).toSeq
    assert(got == Seq((1L, "austin"), (3L, "woburn")),
      s"erased keys must not survive; got $got")
    // dynamic overwrite writes nothing for an emptied partition — the
    // sink must remove the stale directory itself or id 4 leaks back
    assert(!new java.io.File(s"$dir/city=quincy").exists(),
      "emptied partition directory must be deleted (erasure leak)")
    val after = new java.io.File(s"$dir/city=woburn").listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).toSet
    assert(after == untouchedFiles, "untouched partition was rewritten")
  }

  test("deleteByKey: emptied partition with a Hive-ESCAPED value (':') is found and removed") {
    import spark.implicits._
    val dir = tmp("delesc") + "/t"
    Seq((1L, "10:30", 1), (2L, "ok", 2)).toDF("id", "hour", "v")
      .write.partitionBy("hour").parquet(dir)
    // on disk the partition is hour=10%3A30 — a raw "hour=10:30" path
    // would miss it and leak the erased row
    assert(new java.io.File(s"$dir/hour=10%3A30").exists(), "fixture not escaped?")
    Sinks.deleteByKey(spark, dir, "id", Seq(1L).toDF("id"),
      partitions = Seq("hour"), partitionFor = Some(Seq("10:30").toDF("hour")))
    assert(!new java.io.File(s"$dir/hour=10%3A30").exists(),
      "escaped emptied partition must be deleted — erased row leaked")
    val got = spark.read.parquet(dir).select("id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(2L))
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

  test("malformed CSV rows: PERMISSIVE captures, DROPMALFORMED skips, FAILFAST throws") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("badrec").toString
    java.nio.file.Files.writeString(java.nio.file.Path.of(s"$dir/data.csv"),
      "k,v\n1,10\n2,not_an_int\n3,30\n")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "k INT, v INT, _corrupt_record STRING")
    // PERMISSIVE (the 100 TB default): bad rows become nulls + the raw
    // line in _corrupt_record — the job survives and the damage is queryable
    val permissive = spark.read.schema(schema).option("header", "true")
      .option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir).cache()
    assert(permissive.count() == 3)
    assert(permissive.filter($"_corrupt_record".isNotNull).count() == 1)
    val dropped = spark.read.schema(org.apache.spark.sql.types.StructType.fromDDL(
        "k INT, v INT")).option("header", "true")
      .option("mode", "DROPMALFORMED").csv(dir)
    // collect(), not count(): count() prunes every column, so the bad
    // value is never parsed and the row never detected as malformed
    assert(dropped.collect().length == 2)
    intercept[org.apache.spark.SparkException] {
      spark.read.schema(org.apache.spark.sql.types.StructType.fromDDL(
          "k INT, v INT")).option("header", "true")
        .option("mode", "FAILFAST").csv(dir).collect()
    }
  }

  test("format matrix: parquet/orc/json/csv round-trip identical rows") {
    import spark.implicits._
    val df = Seq((1L, "a", 1.5), (2L, "b", -2.25), (3L, null.asInstanceOf[String], 0.0))
      .toDF("k", "s", "v")
    val base = java.nio.file.Files.createTempDirectory("fmt").toString
    val want = df.orderBy("k").collect().toSeq
    def roundTrip(fmt: String, opts: Map[String, String]): Unit = {
      val dir = s"$base/$fmt"
      df.write.options(opts).format(fmt).save(dir)
      val back = spark.read.options(opts).schema(df.schema).format(fmt).load(dir)
      assert(back.orderBy("k").collect().toSeq == want, s"$fmt round trip")
    }
    roundTrip("parquet", Map())
    roundTrip("orc", Map())
    roundTrip("json", Map())
    roundTrip("csv", Map("header" -> "true", "nullValue" -> " "))
  }

  test("rangeClusteredParquet: disjoint per-file ranges enable file skipping") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cluster").toString + "/t"
    val df = (1 to 10000).map(i => (i * 37 % 10000, s"row$i")).toDF("k", "s")
    Sinks.rangeClusteredParquet(df, dir, "k", numFiles = 8)
    // every file must own a k-range disjoint from every other file
    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min($"k").as("lo"), max($"k").as("hi"))
      .collect().map(r => (r.getInt(1), r.getInt(2))).sortBy(_._1)
    assert(ranges.length == 8)
    ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
      assert(hi < lo, s"file ranges overlap: $ranges")
    }
    // a selective point predicate then reads ONE file's rows
    val scan = spark.read.parquet(dir).filter($"k" === 5000)
    assert(scan.count() == df.filter($"k" === 5000).count())
  }

  test("zOrderedParquet: both dimensions prune files; single-col clustering only prunes its own") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    val grid = for (x <- 0 until 64; y <- 0 until 64) yield (x, y)
    val df = grid.toDF("x", "y")
    Sinks.zOrderedParquet(df, s"$base/z", "x", "y", numFiles = 16)
    Sinks.rangeClusteredParquet(df, s"$base/xonly", "x", numFiles = 16)
    def filesTouched(dir: String, pred: org.apache.spark.sql.Column): Long =
      spark.read.parquet(dir).filter(pred)
        .select(input_file_name()).distinct().count()
    // y-band predicate: x-clustered layout smears y across every file;
    // the z-ordered layout confines it to the files owning that band
    val yBand = $"y" >= 10 && $"y" <= 17
    val zTouched = filesTouched(s"$base/z", yBand)
    val xTouched = filesTouched(s"$base/xonly", yBand)
    assert(xTouched == 16, s"x-clustering cannot prune a y predicate, got $xTouched")
    assert(zTouched <= 8, s"z-order should bound the y-band to few files, got $zTouched")
    // and the z layout still prunes x predicates too
    assert(filesTouched(s"$base/z", $"x" >= 10 && $"x" <= 17) <= 8)
  }

  test("scd2Merge closes the current row and appends the new version") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("scd2").toString + "/dim"
    // day 1: two customers
    Sinks.scd2Merge(
      Seq((1L, "gold", 1), (2L, "silver", 1)).toDF("id", "tier", "valid_from"),
      dir, "id")
    // day 2: customer 1 upgrades
    Sinks.scd2Merge(Seq((1L, "platinum", 2)).toDF("id", "tier", "valid_from"),
      dir, "id")
    val rows = spark.read.parquet(dir)
      .orderBy("id", "valid_from")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getInt(2), if (r.isNullAt(3)) -1 else r.getInt(3))).toSeq
    assert(rows == Seq(
      (1L, "gold", 1, 2),      // closed at day 2
      (1L, "platinum", 2, -1), // current
      (2L, "silver", 1, -1)))  // untouched current
    // history query: state as of day 1
    val asOfDay1 = spark.read.parquet(dir)
      .filter($"valid_from" <= 1 && ($"valid_to".isNull || $"valid_to" > 1))
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(asOfDay1 == Seq("gold", "silver"))
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

  test("parquet schema evolution: appended columns merge, old rows read null") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evolve").toString
    Seq((1L, "a")).toDF("id", "v1").write.mode("append").parquet(dir)
    Seq((2L, "b", 9.5)).toDF("id", "v1", "v2").write.mode("append").parquet(dir)
    // default read keeps ONE file's schema (whichever is sampled);
    // mergeSchema unions them — the contract long-lived 100 TB tables
    // rely on when producers add columns
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("id", "v1", "v2"))
    val byId = merged.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).isNullAt(merged.columns.indexOf("v2")),
      "pre-evolution rows surface null for the new column")
    assert(byId(2L).getDouble(merged.columns.indexOf("v2")) == 9.5)
  }
}
