package graft

import graft.streaming.CdcApply
import org.apache.spark.sql.functions._

/** Streaming CDC apply: versioned-state upsert semantics, in-batch
  * last-wins collapse, exactly-once batch replay, and the streaming
  * end-to-end over a file source.
  */
class CdcApplySpec extends SparkSpec {
  import spark.implicits._

  private def state(dir: String) =
    CdcApply.readState(spark, dir).get.orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toList

  test("applyBatch: upsert/delete semantics across two batches, versioned pointer") {
    val dir = java.nio.file.Files.createTempDirectory("cdc1").toString
    val b0 = Seq((1L, "I", 1L, "a"), (2L, "I", 2L, "b"), (3L, "I", 3L, "c"))
      .toDF("k", "op", "seq", "v")
    assert(CdcApply.applyBatch(b0, dir, "k", 0L))
    assert(state(dir) === List((1L, "a"), (2L, "b"), (3L, "c")))
    assert(CdcApply.latestVersion(dir) === Some(0L))

    val b1 = Seq((2L, "U", 10L, "B"), (3L, "D", 11L, null.asInstanceOf[String]),
      (4L, "I", 12L, "d")).toDF("k", "op", "seq", "v")
    assert(CdcApply.applyBatch(b1, dir, "k", 1L))
    assert(state(dir) === List((1L, "a"), (2L, "B"), (4L, "d")))
    assert(CdcApply.latestVersion(dir) === Some(1L))
  }

  test("in-batch collapse is last-wins: I then U then D nets to absent") {
    val dir = java.nio.file.Files.createTempDirectory("cdc2").toString
    val b = Seq((1L, "I", 1L, "x"), (1L, "U", 2L, "y"), (1L, "D", 3L, "z"),
      (2L, "I", 1L, "keep"), (2L, "U", 5L, "kept2"))
      .toDF("k", "op", "seq", "v")
    assert(CdcApply.applyBatch(b, dir, "k", 0L))
    assert(state(dir) === List((2L, "kept2")))
  }

  test("replaying a committed batch id is a no-op (exactly-once)") {
    val dir = java.nio.file.Files.createTempDirectory("cdc3").toString
    val b0 = Seq((1L, "I", 1L, "a")).toDF("k", "op", "seq", "v")
    assert(CdcApply.applyBatch(b0, dir, "k", 0L))
    val b1 = Seq((1L, "U", 2L, "A2")).toDF("k", "op", "seq", "v")
    assert(CdcApply.applyBatch(b1, dir, "k", 1L))
    // crash-replay of batch 1 with different (stale) content must not apply
    val b1replay = Seq((1L, "U", 3L, "STALE")).toDF("k", "op", "seq", "v")
    assert(!CdcApply.applyBatch(b1replay, dir, "k", 1L))
    assert(state(dir) === List((1L, "A2")))
  }

  test("crash window between marker and pointer: state reads from markers, replay repairs the pointer") {
    val dir = java.nio.file.Files.createTempDirectory("cdc6").toString
    CdcApply.applyBatch(Seq((1L, "I", 1L, "a")).toDF("k", "op", "seq", "v"), dir, "k", 0L)
    CdcApply.applyBatch(Seq((2L, "I", 2L, "b")).toDF("k", "op", "seq", "v"), dir, "k", 1L)
    // simulate the crash landing after v1's _COMMITTED but before the
    // pointer swap: force the pointer back to 0
    java.nio.file.Files.write(new java.io.File(dir, "_LATEST").toPath,
      "0".getBytes("UTF-8"))
    // markers are the source of truth: reads see v1 despite the pointer
    assert(CdcApply.latestVersion(dir) === Some(1L))
    assert(state(dir) === List((1L, "a"), (2L, "b")))
    // the streaming-replay no-op repairs the pointer
    assert(!CdcApply.applyBatch(Seq((2L, "U", 9L, "STALE"))
      .toDF("k", "op", "seq", "v"), dir, "k", 1L))
    val ptr = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "_LATEST").toPath), "UTF-8").trim
    assert(ptr === "1", "replay must repair the stale pointer")
    // and the NEXT batch merges onto v1, not the stale v0
    CdcApply.applyBatch(Seq((3L, "I", 10L, "c")).toDF("k", "op", "seq", "v"), dir, "k", 2L)
    assert(state(dir) === List((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("time travel: every committed version stays readable as-of; uncommitted fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("cdc5").toString
    CdcApply.applyBatch(Seq((1L, "I", 1L, "a")).toDF("k", "op", "seq", "v"), dir, "k", 0L)
    CdcApply.applyBatch(Seq((1L, "U", 2L, "A"), (2L, "I", 3L, "b"))
      .toDF("k", "op", "seq", "v"), dir, "k", 1L)
    assert(CdcApply.versions(dir) === Seq(0L, 1L))
    val v0 = CdcApply.readStateAsOf(spark, dir, 0L).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toList
    assert(v0 === List((1L, "a")), "version 0 must show pre-update state")
    val e = intercept[IllegalArgumentException](
      CdcApply.readStateAsOf(spark, dir, 7L))
    assert(e.getMessage.contains("not committed"))
  }

  test("streaming end-to-end: file-source change feed folds into the state table") {
    val in = java.nio.file.Files.createTempDirectory("cdcin").toString
    val dir = java.nio.file.Files.createTempDirectory("cdc4").toString
    val ckpt = java.nio.file.Files.createTempDirectory("cdcck").toString
    Seq((1L, "I", 1L, "a"), (2L, "I", 2L, "b"))
      .toDF("k", "op", "seq", "v").coalesce(1)
      .write.mode("overwrite").parquet(s"$in/f0")
    Seq((1L, "U", 3L, "A"), (3L, "I", 4L, "c"), (2L, "D", 5L, null.asInstanceOf[String]))
      .toDF("k", "op", "seq", "v").coalesce(1)
      .write.mode("overwrite").parquet(s"$in/f1")
    val schema = spark.read.parquet(s"$in/f0").schema
    val changes = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$in/*")
    val q = CdcApply.run(changes, dir, ckpt, "k")
    assert(q.awaitTermination(120000), "stream did not finish")
    assert(state(dir) === List((1L, "A"), (3L, "c")))
    // a second run over the same checkpoint sees no new files: state unchanged
    val q2 = CdcApply.run(spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$in/*"), dir, ckpt, "k")
    assert(q2.awaitTermination(120000))
    assert(state(dir) === List((1L, "A"), (3L, "c")))
  }

  test("vacuum: retains last N committed versions, horizon reads fail loudly, idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("cdcv1").toString
    for (b <- 0L to 4L)
      CdcApply.applyBatch(Seq((b, "I", b, s"v$b")).toDF("k", "op", "seq", "v"),
        dir, "k", b)
    assert(CdcApply.versions(dir) === Seq(0L, 1L, 2L, 3L, 4L))
    assert(CdcApply.vacuum(dir, 2) === Seq(0L, 1L, 2L))
    assert(CdcApply.versions(dir) === Seq(3L, 4L))
    // latest state unaffected; retained history still time-travels
    assert(state(dir).map(_._1) === List(0L, 1L, 2L, 3L, 4L))
    assert(CdcApply.readStateAsOf(spark, dir, 3L).count() === 4L)
    // past the horizon: loud failure, not a partial read
    val e = intercept[IllegalArgumentException](
      CdcApply.readStateAsOf(spark, dir, 1L))
    assert(e.getMessage.contains("not committed"))
    // vacuumed snapshot dirs are actually gone from disk
    assert(!new java.io.File(dir, "v0").exists())
    // idempotent: nothing more to remove
    assert(CdcApply.vacuum(dir, 2) === Seq.empty)
    intercept[IllegalArgumentException](CdcApply.vacuum(dir, 0))
  }

  test("vacuum crash window: marker-less debris below latest is swept; in-flight dirs above latest are not") {
    val dir = java.nio.file.Files.createTempDirectory("cdcv2").toString
    for (b <- 0L to 2L)
      CdcApply.applyBatch(Seq((b, "I", b, s"v$b")).toDF("k", "op", "seq", "v"),
        dir, "k", b)
    // simulate a vacuum that crashed after de-committing v0 but before
    // deleting its data: marker gone, snapshot files stranded
    assert(new java.io.File(s"$dir/v0/_COMMITTED").delete())
    assert(new java.io.File(s"$dir/v0/data").exists())
    assert(CdcApply.versions(dir) === Seq(1L, 2L))
    // simulate an IN-FLIGHT batch above the latest committed version:
    // data written, marker not yet stamped — vacuum must not touch it
    val inflight = new java.io.File(s"$dir/v9/data")
    assert(inflight.mkdirs())
    val removed = CdcApply.vacuum(dir, 10)
    assert(removed === Seq(0L), "debris below latest swept, nothing else")
    assert(!new java.io.File(s"$dir/v0").exists())
    assert(inflight.exists(), "vacuum touched an in-flight version dir")
    assert(CdcApply.versions(dir) === Seq(1L, 2L))
  }

  test("schema evolution: feed gains a column mid-stream across a restart; old columns retained for old writers") {
    val in = java.nio.file.Files.createTempDirectory("cdcein").toString
    val dir = java.nio.file.Files.createTempDirectory("cdce").toString
    val ckpt = java.nio.file.Files.createTempDirectory("cdceck").toString
    // run 1: original (k, op, seq, v) schema
    Seq((1L, "I", 1L, "a"), (2L, "I", 2L, "b"))
      .toDF("k", "op", "seq", "v").coalesce(1)
      .write.mode("overwrite").parquet(s"$in/f0")
    val s0 = spark.read.parquet(s"$in/f0").schema
    val q1 = CdcApply.run(spark.readStream.schema(s0).parquet(s"$in/*"),
      dir, ckpt, "k")
    assert(q1.awaitTermination(120000))
    assert(state(dir) === List((1L, "a"), (2L, "b")))
    // the feed evolves: a `lang` column appears; restart the stream
    // with the widened schema over the same checkpoint (f0 is not
    // re-read — its batch already committed)
    Seq((2L, "U", 3L, "B", "en"), (3L, "I", 4L, "c", "fr"))
      .toDF("k", "op", "seq", "v", "lang").coalesce(1)
      .write.mode("overwrite").parquet(s"$in/f1")
    val s1 = spark.read.parquet(s"$in/f1").schema
    val q2 = CdcApply.run(spark.readStream.schema(s1).parquet(s"$in/*"),
      dir, ckpt, "k", retainVersions = Some(2))
    assert(q2.awaitTermination(120000))
    val rows = CdcApply.readState(spark, dir).get.orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)).orNull)).toList
    // untouched old row null-fills the new column; changed rows carry it
    assert(rows === List((1L, "a", null), (2L, "B", "en"), (3L, "c", "fr")))
    // an OLD writer (no lang column) updates k=3: v changes, the
    // column it doesn't know about is retained, not nulled
    assert(CdcApply.applyBatch(Seq((3L, "U", 5L, "C"))
      .toDF("k", "op", "seq", "v"), dir, "k", 10L))
    val rows2 = CdcApply.readState(spark, dir).get.orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)).orNull)).toList
    assert(rows2 === List((1L, "a", null), (2L, "B", "en"), (3L, "C", "fr")))
    // shared-column type drift fails loudly instead of coercing
    val bad = intercept[IllegalArgumentException](
      CdcApply.applyBatch(Seq((1L, "U", 6L, 7))
        .toDF("k", "op", "seq", "v"), dir, "k", 11L))
    assert(bad.getMessage.contains("type mismatch"))
    // retention wired through run(): history bounded to 2 versions
    assert(CdcApply.versions(dir).size <= 3) // 2 retained by run + the applyBatch above
  }
}
