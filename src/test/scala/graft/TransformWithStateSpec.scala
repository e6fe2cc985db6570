package graft

import graft.streaming.{CandidatePair, NearDupStream}
import org.apache.spark.sql.streaming.TTLConfig

/** Spark 4 transformWithState near-dup stream (NearDupStream):
  * the streaming verdict set must equal the batch Hamming-ball join
  * (TrainingQueries.q99) exactly — same bands, same pigeonhole bound,
  * different execution (RocksDB arbitrary state vs band equi-join). */
class TransformWithStateSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streaming pair set equals the batch Hamming-ball join") {
    val streamed = NearDupStream.run(spark, sf, "tws_spec_sink")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = graft.operators.TrainingQueries.q99(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty, "corpus should contain planted near-dups")
  }

  test("re-run reproducibility: a fresh run over the same data emits the same verdict set") {
    // same data, fresh sink + fresh (implicit temp) checkpoint — this
    // pins run-over-run determinism; checkpoint RECOVERY is exercised
    // by the sessions and MapState tests below, which reuse checkpoints
    val again = NearDupStream.run(spark, sf, "tws_spec_sink2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = graft.operators.TrainingQueries.q99(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == batch)
  }

  test("provider conf is restored after the run") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    NearDupStream.run(spark, sf, "tws_spec_sink3")
    assert(spark.conf.getOption(key) == before)
  }

  test("arrival-order invariance: emit-all semantics covers both orders of a dup pair") {
    import spark.implicits._
    // an exact-dup pair (hamming 0 — matches in all 4 bands, exercising
    // the cross-band DISTINCT) + one far doc; written as a parquet
    // DIRECTORY to cover the part-file streaming layout
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different content about spark engines entirely")
    ).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("tws_docs").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = NearDupStream.run(spark, tmp, "tws_spec_sink4")
      .as[CandidatePair].collect()
    assert(got.toSeq == Seq(CandidatePair(1L, 2L, 0L)))
    val batch = graft.operators.TrainingQueries.q99(spark, tmp)
      .as[CandidatePair].collect()
    assert(got.toSet == batch.toSet)
  }

  test("event-time timers close sessions when the watermark passes, across restarts") {
    import java.nio.file.Files
    import spark.implicits._
    val src = Files.createTempDirectory("tws_sess_src").toString
    val ckpt = Files.createTempDirectory("tws_sess_ckpt").toString
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, graft.streaming.NearDupStream.RocksProvider)
    try {
      val base = 86400000L // stay away from epoch-0 underflow
      def line(u: String, min: Long) =
        s"$u,${new java.sql.Timestamp(base + min * 60000L)}\n"
      def run(): Seq[graft.streaming.ClosedSession] = {
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "user STRING, ts TIMESTAMP")
        val stream = spark.readStream.schema(schema).option("header", "true")
          .csv(src).as[graft.streaming.SessionEvent]
        val emitted = scala.collection.mutable.ArrayBuffer.empty[graft.streaming.ClosedSession]
        val q = graft.streaming.TwsSessions
          .sessionize(stream, gapMs = 5 * 60000L)
          .writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .foreachBatch { (df: org.apache.spark.sql.Dataset[graft.streaming.ClosedSession], _: Long) =>
            val rows = df.collect()
            emitted.synchronized { emitted ++= rows }
            ()
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        assert(q.awaitTermination(120000))
        emitted.toSeq
      }
      // batch 1: user a has 3 events over 2 min, user b one event.
      // Watermark hasn't passed their gap yet — nothing may close.
      Files.writeString(java.nio.file.Path.of(s"$src/b1.csv"),
        "user,ts\n" + line("a", 0) + line("a", 1) + line("a", 2) + line("b", 0))
      assert(run().isEmpty, "no session may close before the watermark moves")
      // batch 2: a far-future event for c advances the watermark past
      // a's and b's (end + gap) timers — exactly those two close, with
      // the counts accumulated in batch 1's checkpointed state
      Files.writeString(java.nio.file.Path.of(s"$src/b2.csv"),
        "user,ts\n" + line("c", 60))
      val closed = run().sortBy(_.user)
      assert(closed.map(_.user) == Seq("a", "b"), s"got $closed")
      assert(closed.head == graft.streaming.ClosedSession("a", base, base + 2 * 60000L, 3L))
      assert(closed(1).n_events == 1L)
    } finally {
      prev match {
        case Some(p) => spark.conf.set(key, p)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("MapState histogram accumulates per-entry across batches and restarts") {
    import java.nio.file.Files
    import spark.implicits._
    val src = Files.createTempDirectory("tws_hist_src").toString
    val ckpt = Files.createTempDirectory("tws_hist_ckpt").toString
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, graft.streaming.NearDupStream.RocksProvider)
    try {
      def run(): Map[(String, String), Long] = {
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "source STRING, lang STRING")
        val stream = spark.readStream.schema(schema).option("header", "true")
          .csv(src).as[graft.streaming.SourcedDoc]
        val emitted = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        val q = graft.streaming.TwsHistogram.sourceLangCounts(stream)
          .writeStream.outputMode("update")
          .option("checkpointLocation", ckpt)
          .foreachBatch { (df: org.apache.spark.sql.Dataset[graft.streaming.SourceLangCount], _: Long) =>
            val rows = df.collect().map(c => (c.source, c.lang, c.n))
            emitted.synchronized { emitted ++= rows }
            ()
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        assert(q.awaitTermination(120000))
        // latest emission per (source, lang) is the running count
        emitted.groupBy(r => (r._1, r._2)).map { case (k, rs) => k -> rs.map(_._3).max }
      }
      Files.writeString(java.nio.file.Path.of(s"$src/b1.csv"),
        "source,lang\n" + "web,en\n" * 3 + "web,de\n" + "books,en\n" * 2)
      val after1 = run()
      assert(after1 == Map(("web", "en") -> 3L, ("web", "de") -> 1L,
        ("books", "en") -> 2L), s"b1: $after1")
      // batch 2 (fresh run, checkpointed RocksDB map entries): only
      // touched (source, lang) cells re-emit, counts continue
      Files.writeString(java.nio.file.Path.of(s"$src/b2.csv"),
        "source,lang\n" + "web,en\n" * 2 + "books,fr\n")
      val after2 = run()
      assert(after2(("web", "en")) == 5L && after2(("books", "fr")) == 1L,
        s"state carried: $after2")
    } finally {
      prev match {
        case Some(p) => spark.conf.set(key, p)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("initial state seeds the dedup ledger: stream matches history without replaying it") {
    import java.nio.file.Files
    import spark.implicits._
    val src = Files.createTempDirectory("tws_seed_src").toString
    val ckpt = Files.createTempDirectory("tws_seed_ckpt").toString
    // history: two near-identical docs (an in-history pair the seeded
    // stream must NOT re-derive) + stream: a third copy arriving live
    val history = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "completely different content about unrelated things")
    ).toDF("doc_id", "text")
    Files.writeString(java.nio.file.Path.of(s"$src/b1.csv"),
      "doc_id,text\n10,alpha beta gamma delta epsilon zeta eta theta\n")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING")
    val stream = spark.readStream.schema(schema).option("header", "true").csv(src)
    val emitted = scala.collection.mutable.ArrayBuffer.empty[CandidatePair]
    graft.streaming.NearDupStream.withRocksProvider(spark) {
      val q = graft.streaming.NearDupStream.pairsPlanSeeded(stream, history)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[CandidatePair], _: Long) =>
          val rows = df.collect()
          emitted.synchronized { emitted ++= rows }
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000))
    }
    // doc 10 matches BOTH history copies (hamming 0, all 4 bands →
    // distinct); the history-internal pair (1,2) must not appear
    val pairs = emitted.toSet
    assert(pairs == Set(CandidatePair(1L, 10L, 0L), CandidatePair(2L, 10L, 0L)),
      s"got $pairs")
  }

  test("TTL config plumbs through (NONE default builds a valid plan)") {
    val plan = NearDupStream.pairsPlan(
      spark.read.parquet(s"$sf/documents.parquet"),
      maxHamming = 3, ttl = TTLConfig.NONE)
    // batch frames can't execute transformWithState, but the typed
    // plan must analyze: schema is the canonical (a, b, hamming)
    assert(plan.schema.fieldNames.toSeq == Seq("a", "b", "hamming"))
  }
}
