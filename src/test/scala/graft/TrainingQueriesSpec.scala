package graft

import graft.operators.{TpchClassics, TrainingQueries}
import org.apache.spark.sql.functions._

/** Semantics + plan-shape tests for the training-data curation tranche
  * (q92–q99) and the classic TPC-H shapes (q64–q69). Semantic tests run
  * on crafted in-memory corpora (exact expected values); plan tests pin
  * the properties the 100 TB design depends on.
  */
class TrainingQueriesSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  // ---- plan shapes ----------------------------------------------------

  test("q64 shipping-priority top-10 compiles to TakeOrderedAndProject") {
    val p = plan(TpchClassics.q64(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p.take(500))
  }

  test("q65 local-supplier-volume keeps all dims broadcast") {
    val p = plan(TpchClassics.q65(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 4,
      "supplier/customer/nation/region should all broadcast")
  }

  test("q96 packing window is partitioned by lang — no global sort partition") {
    val p = plan(TrainingQueries.q96(spark, sf))
    assert(p.contains("Window"))
    assert(!p.contains("SinglePartition"),
      "packing must parallelize across lang shards, not funnel into one task")
  }

  test("q99 candidates come from a band equi-join, never a cartesian") {
    val p = plan(TrainingQueries.q99(spark, sf))
    assert(!p.contains("Cartesian") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(600))
  }

  // ---- semantics on crafted corpora ----------------------------------

  /** Build a tiny documents frame matching the testdata schema. */
  private def docs(rows: (Long, String, String, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
  }

  private def viaTempDir(df: org.apache.spark.sql.DataFrame)(
      f: String => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("tq_spec").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    f(dir)
  }

  test("q93 repetition filter flags a boilerplate doc and passes clean text") {
    val d = docs(
      (1L, "spam spam spam spam spam spam", "en", "src1"),
      (2L, "every word here is entirely unique today", "en", "src1"))
    val out = viaTempDir(d)(TrainingQueries.q93(spark, _)).collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    // doc 1: 6 words, 1 distinct, 5 bigrams, 1 distinct bigram
    assert(byId(1L).getLong(1) == 6 && byId(1L).getLong(2) == 1)
    assert(byId(1L).getLong(3) == 5 && byId(1L).getLong(4) == 1)
    assert(byId(1L).getAs[Int]("flagged") == 1)
    // doc 2: everything distinct → nothing flagged
    assert(byId(2L).getAs[Int]("flagged") == 0)
    assert(byId(2L).getDouble(5) == 0.0 && byId(2L).getDouble(6) == 0.0)
  }

  test("q94 PII redaction masks the synthesized email and phone") {
    val d = docs((7L, "hello world", "en", "src1"))
    val row = viaTempDir(d)(TrainingQueries.q94(spark, _)).collect().head
    assert(row.getLong(1) == 1, "one email")
    assert(row.getLong(2) == 1, "one phone")
    // redacted text is strictly shorter: both matches collapse to tags
    assert(row.getLong(4) < row.getLong(3))
  }

  test("q95 decontamination: train doc sharing an 8-gram with eval is caught") {
    val shared = "one two three four five six seven eight"
    val d = docs(
      (1L, shared + " tail", "en", "src0"), // eval
      (2L, "prefix " + shared, "en", "src3"), // contaminated
      (3L, "totally different words with no overlap at all kept", "en", "src3"))
    val out = viaTempDir(d)(TrainingQueries.q95(spark, _)).collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(2L).getAs[Int]("contaminated") == 1)
    assert(byId(2L).getLong(2) >= 1, "matched_grams counts the shared shingle")
    assert(byId(3L).getAs[Int]("contaminated") == 0)
    assert(!byId.contains(1L), "eval docs are not scored")
  }

  test("q97 chunking covers every token exactly once per stride step") {
    val words = (1 to 250).map(i => s"w$i").mkString(" ")
    val d = docs((1L, words, "en", "src1"))
    val out = viaTempDir(d)(TrainingQueries.q97(spark, _))
      .orderBy("chunk_idx").collect()
    // 250 tokens → starts 1, 81, 161; the 161-chunk window (→260)
    // covers the tail, so no 4th chunk is emitted
    assert(out.length == 3)
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 81L, 161L))
    assert(out.map(_.getLong(3)).toSeq == Seq(100L, 100L, 90L))
  }

  test("q96 packing bins respect the 256-token budget boundary") {
    // 10 docs × 100 tokens each, one lang; bin = cum_before div 256:
    // cum 0,100,200→bin0; 300,400,500→bin1; 600,700→bin2; 800,900→bin3
    val text = (1 to 100).map(_ => "x").mkString(" ")
    val d = docs((1L to 10L).map(i => (i, text, "en", "src1")): _*)
    val out = viaTempDir(d)(TrainingQueries.q96(spark, _)).collect()
    assert(out.map(_.getLong(2)).sum == 10L, "all docs assigned")
    val bins = out.map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(bins(0L) == 3 && bins(1L) == 3 && bins(2L) == 2 && bins(3L) == 2)
  }

  test("q99 hamming-ball dedup finds near-identical docs via band collision") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val d = docs(
      (1L, base, "en", "src1"),
      (2L, base, "en", "src2"), // identical → hamming 0
      (3L, "completely unrelated content full of other words", "en", "src1"))
    val out = viaTempDir(d)(TrainingQueries.q99(spark, _)).collect()
    assert(out.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L
      && r.getLong(2) == 0L), "identical docs must pair at hamming 0")
    assert(!out.exists(r => r.getLong(1) == 3L || r.getLong(0) == 3L))
  }

  test("q100 keep-best dedup keeps the higher-quality member of a prefix cluster") {
    import graft.operators.CurationQueries
    val prefix = "alpha beta gamma delta epsilon"
    val d = docs(
      (1L, prefix + " x", "en", "src1"), // short → low quality
      (2L, prefix + " " + (1 to 60).map(i => s"the word$i and of").mkString(" "),
        "en", "src1"), // long, stopword-rich → high quality
      (3L, "some unrelated single document here", "en", "src1"))
    val out = viaTempDir(d)(CurationQueries.q100(spark, _)).collect()
    assert(out.length == 1, "only the 2-doc cluster is reported")
    assert(out.head.getLong(2) == 2L, "doc 2 (higher quality) is kept")
    assert(out.head.getLong(1) == 2L, "cluster size 2")
  }

  test("q102 source concentration: last cumulative share is exactly 1") {
    import graft.operators.CurationQueries
    val d = docs(
      (1L, "a b c d e f", "en", "s1"), (2L, "a b", "en", "s1"),
      (3L, "x y z", "en", "s2"))
    val out = viaTempDir(d)(CurationQueries.q102(spark, _))
      .orderBy(col("cum_share")).collect()
    assert(out.last.getDouble(4) == 1.0)
    assert(out.head.getString(0) == "s1", "biggest source ranks first")
  }

  test("q103 mixing plan gives the smallest language rate 1.0") {
    import graft.operators.CurationQueries
    val d = docs(
      (1L, (1 to 50).map(_ => "w").mkString(" "), "en", "s1"),
      (2L, "tiny doc", "fr", "s1"))
    val out = viaTempDir(d)(CurationQueries.q103(spark, _)).collect()
    val byLang = out.map(r => r.getString(0) -> r).toMap
    assert(byLang("fr").getDouble(3) == 1.0, "smallest lang keeps everything")
    assert(byLang("en").getDouble(3) < 1.0, "larger lang is downsampled")
    assert(byLang("fr").getLong(4) == byLang("fr").getLong(2),
      "planned == actual for the anchor lang")
  }

  test("q104 funnel only counts stages in causal order") {
    import spark.implicits._
    import graft.operators.EventQueries
    def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    // user 1: full funnel; user 2: click BEFORE its first view (must
    // not convert past stage 1); user 3: purchase without view/click
    val ev = Seq(
      (1L, ts(0), 1L, "view", 0.0, "{}"),
      (2L, ts(1), 1L, "click", 0.0, "{}"),
      (3L, ts(2), 1L, "purchase", 0.0, "{}"),
      (4L, ts(0), 2L, "click", 0.0, "{}"),
      (5L, ts(1), 2L, "view", 0.0, "{}"),
      (6L, ts(0), 3L, "purchase", 0.0, "{}"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventQueries.q104(spark, dir).collect()
    val stage = out.map(r => r.getLong(0) -> r.getAs[Int]("stage")).toMap
    assert(stage(1L) == 3, "user 1 completes the funnel")
    assert(stage(2L) == 1, "pre-view click must not count as stage 2")
    assert(stage(3L) == 0, "purchase without view opens no funnel")
  }

  test("q92 tf-idf ranks a doc's distinctive term above corpus-wide terms") {
    val d = docs(
      (1L, "common common zebra", "en", "src1"),
      (2L, "common words only", "en", "src1"),
      (3L, "common words again", "en", "src1"))
    val out = viaTempDir(d)(TrainingQueries.q92(spark, _)).collect()
    val doc1Top = out.filter(_.getLong(0) == 1L).minBy(_.getLong(1))
    // zebra: tf=1, df=1, score 3.0 beats common: tf=2, df=3, score 2.0
    assert(doc1Top.getString(2) == "zebra", doc1Top.toString)
  }
}
