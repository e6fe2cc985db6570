package graft

import java.nio.file.Files
import graft.streaming.Streams

class StreamingSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("dailyIngest: AvailableNow file stream cleans and partitions; restart picks up only new files") {
    val src = Files.createTempDirectory("stream_src").toString
    val out = Files.createTempDirectory("stream_out").toString
    val ckpt = Files.createTempDirectory("stream_ckpt").toString
    val header = graft.operators.Cleaning.rawColumns.mkString(",")
    def listing(city: String, date: String, sqft: String, price: String) =
      s"Apt,Addr,Unit 1,$sqft,1bd,1ba,$price,$city,TX,78758,desc,details,url,$date"

    Files.writeString(java.nio.file.Path.of(s"$src/day1.csv"),
      header + "\n" + listing("austin", "2020-01-08", "500 sqft", "$850") + "\n" +
        listing("austin", "2020-01-08", "", "$900") + "\n") // empty sqft dropped
    val q1 = Streams.dailyIngest(spark, src, graft.operators.Cleaning.rawSchema, out, ckpt)
    q1.awaitTermination(60000)
    val first = spark.read.parquet(out)
    assert(first.count() == 1)
    assert(first.head.getAs[Int]("sqft") == 500)

    // second batch: only the new file is processed (checkpoint ledger)
    Files.writeString(java.nio.file.Path.of(s"$src/day2.csv"),
      header + "\n" + listing("woburn", "2020-01-09", "600-700 sqft", "$1000+") + "\n")
    val q2 = Streams.dailyIngest(spark, src, graft.operators.Cleaning.rawSchema, out, ckpt)
    q2.awaitTermination(60000)
    val all = spark.read.parquet(out).cache()
    assert(all.count() == 2)
    val woburn = all.filter(col("city") === "woburn").head
    assert(woburn.getAs[Int]("sqft") == 650)
    assert(woburn.getAs[Int]("price") == 1000)
  }

  test("foreachBatchJdbc: batch-id delete-then-append makes replays idempotent") {
    val src = Files.createTempDirectory("jdbc_src").toString
    val url = "jdbc:derby:memory:graftstream;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    Files.writeString(java.nio.file.Path.of(s"$src/batch.csv"),
      "k,v\n1,a\n2,b\n3,c\n")
    val schema = org.apache.spark.sql.types.StructType.fromDDL("k INT, v STRING")
    def run(ckpt: String): Unit = {
      val stream = spark.readStream.schema(schema).option("header", "true").csv(src)
      val q = Streams.foreachBatchJdbc(stream, url, "sink_events", props, ckpt)
      assert(q.awaitTermination(60000))
    }
    run(Files.createTempDirectory("jdbc_ckpt1").toString)
    val back1 = graft.sources.Sources.jdbcTable(spark, url, "sink_events", props)
    assert(back1.count() == 3)
    // Fresh checkpoint replays batch id 0 over the SAME table: the
    // delete-by-batch-id pass must replace, not double-append.
    run(Files.createTempDirectory("jdbc_ckpt2").toString)
    val back2 = graft.sources.Sources.jdbcTable(spark, url, "sink_events", props)
    assert(back2.count() == 3)
    assert(back2.select("batch_id").distinct().count() == 1)
  }

  test("flatMapGroupsWithState closed sessions: gap close in-batch, watermark timeout across runs") {
    import spark.implicits._
    val src = Files.createTempDirectory("sess_src").toString
    val ckpt = Files.createTempDirectory("sess_ckpt").toString
    val out = Files.createTempDirectory("sess_out").toString
    // day-1 base: a timestamp of exactly epoch 0 collides with the
    // INITIAL watermark value and is dropped as late before the
    // stateful operator ever sees it
    val baseMs = 86400000L
    def ts(min: Long) = new java.sql.Timestamp(baseMs + min * 60000L)
    def us(min: Long) = (baseMs + min * 60000L) * 1000L
    def run(): Unit = {
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "user_id LONG, event_id LONG, ts TIMESTAMP")
      val stream = spark.readStream.schema(schema).option("header", "true").csv(src)
        .withWatermark("ts", "0 seconds")
        .as[Streams.TsEvent]
      // file sink, not memory: the memory sink cannot recover from a
      // checkpoint, and run 2 must resume run 1's state
      val q = Streams.sessionizeClosed(stream, gapMinutes = 30)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(60000))
    }
    // batch 1: user 1 has two bursts 90 min apart — the second burst
    // closes the first session inside the batch; the second stays open
    Files.writeString(java.nio.file.Path.of(s"$src/b1.csv"),
      "user_id,event_id,ts\n" +
        s"1,1,${ts(0)}\n1,2,${ts(10)}\n1,3,${ts(100)}\n")
    run()
    val afterB1 = spark.read.parquet(out).as[Streams.ClosedSession].collect()
    assert(afterB1.toSeq == Seq(Streams.ClosedSession(1L, us(0), us(10), 2L)))
    // batch 2: a much-later event from ANOTHER user advances the
    // watermark past user 1's gap — the open session must close by
    // TIMEOUT, with no new user-1 event
    Files.writeString(java.nio.file.Path.of(s"$src/b2.csv"),
      "user_id,event_id,ts\n" + s"2,9,${ts(500)}\n")
    run()
    val afterB2 = spark.read.parquet(out).as[Streams.ClosedSession].collect().toSet
    assert(afterB2.contains(
      Streams.ClosedSession(1L, us(100), us(100), 1L)),
      s"timeout close missing: $afterB2")
  }

  test("left-outer stream-stream join emits the null match only after the watermark closes the window") {
    import spark.implicits._
    val src = Files.createTempDirectory("ssj_src").toString
    val ckpt = Files.createTempDirectory("ssj_ckpt").toString
    val out = Files.createTempDirectory("ssj_out").toString
    val baseMs = 86400000L
    def ts(min: Long) = new java.sql.Timestamp(baseMs + min * 60000L)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "kind STRING, id LONG, user_id LONG, ts TIMESTAMP")
    def run(): Unit = {
      def side(kind: String, idAs: String, userAs: String, tsAs: String) =
        spark.readStream.schema(schema).option("header", "true").csv(src)
          .filter(col("kind") === kind)
          .select(col("id").as(idAs), col("user_id").as(userAs), col("ts").as(tsAs))
          .withWatermark(tsAs, "0 seconds")
      val joined = side("view", "view_id", "v_user", "v_ts")
        .join(side("buy", "buy_id", "b_user", "b_ts"),
          org.apache.spark.sql.functions.expr(
            "v_user = b_user AND b_ts >= v_ts AND b_ts <= v_ts + interval 30 minutes"),
          "left_outer")
        .select(col("view_id"), col("buy_id"))
      val q = joined.writeStream.format("parquet").option("path", out)
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      assert(q.awaitTermination(60000))
    }
    // batch 1: view 1 gets a purchase, view 2 does not; view 2's
    // 30-min window is NOT yet past the watermark → only the match emits
    Files.writeString(java.nio.file.Path.of(s"$src/b1.csv"),
      "kind,id,user_id,ts\n" +
        s"view,1,7,${ts(0)}\nbuy,10,7,${ts(5)}\nview,2,7,${ts(40)}\n")
    run()
    val afterB1 = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(afterB1 == Set((1L, 10L)), s"got $afterB1")
    // batch 2: late events on BOTH sides — the query watermark is the
    // MIN across the two inputs, so the buy side must advance too for
    // view 2's window to close and the null match to emit
    Files.writeString(java.nio.file.Path.of(s"$src/b2.csv"),
      "kind,id,user_id,ts\n" +
        s"view,3,9,${ts(500)}\nbuy,11,9,${ts(500)}\n")
    run()
    val afterB2 = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(afterB2.contains((2L, -1L)), s"unmatched view not emitted: $afterB2")
  }

  test("stream-stream interval-overlap join matches batch IntervalJoin (watermark-evictable state)") {
    import spark.implicits._
    val src = Files.createTempDirectory("iv_src").toString
    val ckpt = Files.createTempDirectory("iv_ckpt").toString
    val outDir = Files.createTempDirectory("iv_out").toString
    val baseMs = 86400000L
    def ts(min: Long) = new java.sql.Timestamp(baseMs + min * 60000L)
    // random keyed intervals, length ≤ 30 min — the bounded length is
    // what lets the join condition carry an explicit start-distance
    // bound, which is what Spark needs to evict stream-stream state
    val rnd = new scala.util.Random(13)
    val ivs = (1L to 120L).map { id =>
      val s = rnd.nextInt(600).toLong
      (id, id % 4L, s, s + 1 + rnd.nextInt(29))
    }
    Files.writeString(java.nio.file.Path.of(s"$src/b1.csv"),
      "id,k,s_ts,e_ts\n" +
        ivs.map { case (id, k, s, e) => s"$id,$k,${ts(s)},${ts(e)}" }.mkString("\n"))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id LONG, k LONG, s_ts TIMESTAMP, e_ts TIMESTAMP")
    def side(sfx: String) =
      spark.readStream.schema(schema).option("header", "true").csv(src)
        .select(col("id").as(s"id$sfx"), col("k").as(s"k$sfx"),
          col("s_ts").as(s"s$sfx"), col("e_ts").as(s"e$sfx"))
        .withWatermark(s"s$sfx", "0 seconds")
    val joined = graft.streaming.StreamingIntervalJoin.overlap(
        side("_a"), side("_b"),
        "k_a", "k_b", "s_a", "e_a", "s_b", "e_b", "interval 30 minutes")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    val q = joined.writeStream.format("parquet").option("path", outDir)
      .outputMode("append").option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000))
    val streamed = spark.read.parquet(outDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch twin through the grid-blocked operator on minute ticks
    def batch(sfx: String) = ivs
      .toDF(s"id$sfx", s"k$sfx", s"s$sfx", s"e$sfx")
    val expected = graft.operators.IntervalJoin.overlap(
        batch("_a"), batch("_b"), "k_a", "k_b", "s_a", "e_a", "s_b", "e_b", 32L)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == expected,
      s"stream ${streamed.size} pairs vs batch ${expected.size}")
    assert(expected.size > 50, s"degenerate fixture: only ${expected.size} pairs")
  }

  test("StreamingIntervalJoin.micros keeps sub-millisecond precision (getTime truncates)") {
    val a = new java.sql.Timestamp(0); a.setNanos(999000) // .000999
    val b = new java.sql.Timestamp(0); b.setNanos(1000)   // .000001
    assert(a.getTime == b.getTime, "same ms — getTime can't tell them apart")
    assert(graft.streaming.StreamingIntervalJoin.micros(a) == 999L)
    assert(graft.streaming.StreamingIntervalJoin.micros(b) == 1L)
  }

  test("stateful gap sessionization matches the batch q70 semantics") {
    import spark.implicits._
    val us = 1000000L
    val events = Seq(
      Streams.Event(1L, 1L, 0L * us),
      Streams.Event(1L, 2L, 60L * us),            // same session
      Streams.Event(1L, 3L, 60L * us + 1801L * us), // new session (gap > 30min)
      Streams.Event(2L, 4L, 0L * us)).toDS()
    val out = Streams.sessionize(events).orderBy("user_id").collect()
    assert(out(0).getAs[Int]("n_sessions") == 2 && out(0).getAs[Long]("n_events") == 3)
    assert(out(1).getAs[Int]("n_sessions") == 1 && out(1).getAs[Long]("n_events") == 1)
  }

  test("windowed event counts with watermark (streaming plan compiles and runs via AvailableNow)") {
    import spark.implicits._
    val src = Files.createTempDirectory("ev_src").toString
    val ckpt = Files.createTempDirectory("ev_ckpt").toString
    Seq(
      ("2024-01-01 10:05:00", "click", 1.0),
      ("2024-01-01 10:55:00", "click", 2.0),
      ("2024-01-01 11:05:00", "view", 3.0))
      .toDF("ts_s", "event_type", "value")
      .write.mode("overwrite").option("header", "true").csv(src)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "ts_s string, event_type string, value double")
    val stream = spark.readStream.schema(schema).option("header", "true").csv(src)
      .withColumn("ts", to_timestamp(col("ts_s")))
    val q = Streams.hourlyEventCounts(stream)
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val rows = spark.sql("select * from hourly order by hour, event_type").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("n_events") == 2) // two clicks in 10:00 window
    assert(rows(1).getAs[String]("event_type") == "view")
  }

  test("dedupOnArrival emits each content fingerprint once across batches") {
    import spark.implicits._
    val src = Files.createTempDirectory("dedup_src").toString
    val ckpt = Files.createTempDirectory("dedup_ckpt").toString
    val out = Files.createTempDirectory("dedup_out").toString
    def run(): Unit = {
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id LONG, fp STRING, lang STRING")
      val stream = spark.readStream.schema(schema).option("header", "true")
        .csv(src).as[Streams.ArrivingDoc]
      val q = Streams.dedupOnArrival(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(60000))
    }
    // batch 1: fp A arrives twice (ids 2 and 1 — smallest must win), B once
    Files.writeString(java.nio.file.Path.of(s"$src/b1.csv"),
      "doc_id,fp,lang\n2,A,en\n1,A,en\n3,B,fr\n")
    run()
    val afterB1 = spark.read.parquet(out).as[Streams.ArrivingDoc]
      .collect().map(d => d.fp -> d.doc_id).toMap
    assert(afterB1 == Map("A" -> 1L, "B" -> 3L))
    // batch 2: A re-arrives (must be suppressed by state), C is new
    Files.writeString(java.nio.file.Path.of(s"$src/b2.csv"),
      "doc_id,fp,lang\n9,A,en\n4,C,de\n")
    run()
    val afterB2 = spark.read.parquet(out).as[Streams.ArrivingDoc]
      .collect().map(d => d.fp -> d.doc_id).toMap
    assert(afterB2 == Map("A" -> 1L, "B" -> 3L, "C" -> 4L),
      s"cross-batch duplicate suppressed, new fp emitted: $afterB2")
  }

  test("streaming frequent items: bucket MG summaries accumulate across batches") {
    import spark.implicits._
    val src = Files.createTempDirectory("fi_src").toString
    val ckpt = Files.createTempDirectory("fi_ckpt").toString
    def run(): Map[String, Long] = {
      val schema = org.apache.spark.sql.types.StructType.fromDDL("w STRING")
      val stream = spark.readStream.schema(schema).option("header", "true")
        .csv(src).as[String]
      val emitted = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      val q = Streams.frequentItems(stream, k = 16, buckets = 4)
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = df.select("item", "cnt").as[(String, Long)].collect()
          emitted.synchronized { emitted ++= rows }
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(60000))
      // update mode re-emits a bucket's whole summary each trigger —
      // latest emission per item is the current count
      emitted.groupBy(_._1).map { case (i, rows) => i -> rows.map(_._2).max }
    }
    Files.writeString(java.nio.file.Path.of(s"$src/b1.csv"),
      "w\n" + ("x\n" * 5) + ("y\n" * 3) + "z\n")
    val after1 = run()
    assert(after1 == Map("x" -> 5L, "y" -> 3L, "z" -> 1L), s"b1: $after1")
    // batch 2 adds to existing counters across the restart boundary
    Files.writeString(java.nio.file.Path.of(s"$src/b2.csv"),
      "w\n" + ("x\n" * 2) + ("w\n" * 4))
    // only buckets touched in batch 2 re-emit (x's and w's); y's bucket
    // is silent this trigger but its state is intact in the checkpoint
    val after2 = run()
    assert(after2("x") == 7L && after2("w") == 4L,
      s"state carried across batches: $after2")
  }

  test("streaming quantile monitor: sketch state accumulates across batches, restarts included") {
    import spark.implicits._
    val src = Files.createTempDirectory("qm_src").toString
    val ckpt = Files.createTempDirectory("qm_ckpt").toString
    def run(): Map[String, (Long, Double)] = {
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "key STRING, value DOUBLE")
      val stream = spark.readStream.schema(schema).option("header", "true")
        .csv(src).as[Streams.KeyedValue]
      val emitted = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Double)]
      val q = Streams.quantileMonitor(stream, k = 64)
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = df.select("key", "n", "p50").as[(String, Long, Double)].collect()
          emitted.synchronized { emitted ++= rows }
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      assert(q.awaitTermination(60000))
      // latest emission per key is the current summary
      emitted.groupBy(_._1).map { case (k, rs) =>
        val last = rs.maxBy(_._2); k -> (last._2, last._3)
      }
    }
    // batch 1: key a sees 1..9 (median 5), key b sees 100
    Files.writeString(java.nio.file.Path.of(s"$src/b1.csv"),
      "key,value\n" + (1 to 9).map(i => s"a,$i.0\n").mkString + "b,100.0\n")
    val after1 = run()
    assert(after1("a") == ((9L, 5.0)), s"b1 a: ${after1("a")}")
    assert(after1("b") == ((1L, 100.0)), s"b1 b: ${after1("b")}")
    // batch 2 (fresh run, checkpointed state): key a sees 11..19 —
    // exact-regime median over BOTH batches is 10th of 18 values = 10?
    // values are 1..9 and 11..19 sorted; rank ceil(0.5*18)=9 -> 9.0
    Files.writeString(java.nio.file.Path.of(s"$src/b2.csv"),
      "key,value\n" + (11 to 19).map(i => s"a,$i.0\n").mkString)
    val after2 = run()
    assert(after2("a") == ((18L, 9.0)), s"state carried across restart: ${after2("a")}")
  }

  test("late-data accounting: watermark drops are counted, not silent") {
    import spark.implicits._
    val src = Files.createTempDirectory("late_src").toString
    val ckpt = Files.createTempDirectory("late_ckpt").toString
    val out = Files.createTempDirectory("late_out").toString
    val baseMs = 86400000L
    def ts(min: Long) = new java.sql.Timestamp(baseMs + min * 60000L)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "ts TIMESTAMP, event_type STRING, value DOUBLE")
    def run(): Long = {
      val stream = spark.readStream.schema(schema).option("header", "true")
        .csv(src)
        .withWatermark("ts", "0 seconds")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("h"), col("n"))
      val q = stream.writeStream.format("parquet").option("path", out)
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      assert(q.awaitTermination(60000))
      Streams.droppedByWatermark(q)
    }
    // run 1: on-time events advance the watermark to minute 90
    Files.writeString(java.nio.file.Path.of(s"$src/b1.csv"),
      s"ts,event_type,value\n${ts(10)},view,1.0\n${ts(30)},view,1.0\n${ts(90)},view,1.0\n")
    assert(run() == 0L, "no late rows in batch 1")
    // run 2: one event below the checkpointed watermark (its window is
    // closed) and one on-time event — exactly one row must be dropped
    // AND the drop must be visible in the metrics
    Files.writeString(java.nio.file.Path.of(s"$src/b2.csv"),
      s"ts,event_type,value\n${ts(5)},view,1.0\n${ts(150)},view,1.0\n")
    val dropped = run()
    assert(dropped == 1L, s"expected 1 watermark-dropped row, got $dropped")
    // the closed [0:00,1:00) window emitted with the on-time count only
    val h0 = spark.read.parquet(out).filter(col("h") === ts(0)).collect()
    assert(h0.length == 1 && h0(0).getLong(1) == 2L,
      s"window 0 must hold the 2 on-time rows: ${h0.mkString}")
  }
}
