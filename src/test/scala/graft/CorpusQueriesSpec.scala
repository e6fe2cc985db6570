package graft

import graft.functions.Checksums
import graft.operators.CorpusQueries
import org.apache.spark.sql.functions._

class CorpusQueriesSpec extends SparkSpec {

  test("luhnValid matches known card numbers and their corruptions") {
    import spark.implicits._
    // Standard Luhn test vectors (valid) + single-digit corruptions
    // (invalid): the check must catch any one-digit typo by design.
    val cases = Seq(
      ("4539578763621486", true),  // Visa test number
      ("4539578763621487", false),
      ("79927398713", true),       // canonical Luhn example
      ("79927398710", false),
      ("18", true),                // 8 + 2*1 = 10
      ("0", true),
      ("1", false),
      ("", false))                 // empty guard, not null
    val got = cases.map(_._1).toDF("s")
      .select($"s", Checksums.luhnValid($"s").as("ok"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cases.foreach { case (s, want) =>
      assert(got(s) == want, s"luhn($s) = ${got(s)}, want $want")
    }
  }

  test("span-dedup rewrite removes shared spans, keeps unique ones, stays total") {
    import spark.implicits._
    val w8a = (1 to 8).map(i => s"shared$i").mkString(" ")   // in docs 1+2
    val w8b = (1 to 8).map(i => s"only$i").mkString(" ")     // doc 1 only
    val w8c = (1 to 8).map(i => s"alone$i").mkString(" ")    // doc 2 only
    val dir = java.nio.file.Files.createTempDirectory("spandedup").toString
    Seq(
      (1L, s"$w8a $w8b", "en", "s1", 0L),
      (2L, s"$w8a $w8c", "en", "s1", 0L),
      (3L, w8a, "en", "s1", 0L))                             // all-boilerplate
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CorpusQueries.q152(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((2L, 1L, w8b)), s"doc1: ${out(1L)}")
    assert(out(2L) == ((2L, 1L, w8c)), s"doc2: ${out(2L)}")
    // every span shared → present in output with an empty rewrite
    assert(out(3L) == ((1L, 0L, "")), s"doc3: ${out(3L)}")
  }

  test("quality model: MLlib training recovers the heuristic labels (AUC)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val model = graft.ml.QualityModel.train(docs)
    val auc = graft.ml.QualityModel.auc(model, docs)
    assert(auc > 0.8, s"AUC $auc too low for a weak-label recovery")
    val (bias, weights) = graft.ml.QualityModel.freeze(model)
    assert(weights.size == CorpusQueries.modelWeights.size)
    assert(!bias.isNaN)
  }

  test("adaptive length gate: thresholds are real per-lang data values") {
    import spark.implicits._
    val out = CorpusQueries.q155(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (lang, n, p05, p95, kept) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(p05 <= p95, s"$lang: p05 $p05 > p95 $p95")
      assert(kept <= n && kept > 0, s"$lang: kept $kept of $n")
      // nearest-rank thresholds must be actual n_chars values
      val vals = Tables.documents(spark, "/root/testdata/sf0.001")
        .filter($"lang" === lang).select($"n_chars")
        .collect().map(_.getLong(0)).toSet
      assert(vals.contains(p05) && vals.contains(p95), s"$lang thresholds not data values")
    }
  }
}
