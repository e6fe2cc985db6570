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

  test("restart with checkpoint: second AvailableNow run emits no stale pairs") {
    // same data, fresh sink + fresh (implicit temp) checkpoint: the
    // verdict set is reproducible run-over-run
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

  test("TTL config plumbs through (NONE default builds a valid plan)") {
    val plan = NearDupStream.pairsPlan(
      spark.read.parquet(s"$sf/documents.parquet"),
      maxHamming = 3, ttl = TTLConfig.NONE)
    // batch frames can't execute transformWithState, but the typed
    // plan must analyze: schema is the canonical (a, b, hamming)
    assert(plan.schema.fieldNames.toSeq == Seq("a", "b", "hamming"))
  }
}
