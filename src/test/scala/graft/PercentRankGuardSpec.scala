package graft

import graft.operators.CurationQueries

/** q240's degenerate guards, fixture-driven: a single-doc source must
  * not divide by zero under ANSI mode (SQL percent_rank defines the
  * 1-row partition as 0), and a NULL source must rank like the window
  * form ranks it instead of being dropped by the group-size join.
  */
class PercentRankGuardSpec extends SparkSpec {
  import spark.implicits._

  test("single-doc source and NULL source survive q240 (no ANSI divide-by-zero, no null drop)") {
    val dir = java.nio.file.Files.createTempDirectory("q240fix").toString
    val docs = Seq(
      // source "solo": exactly one doc → n-1 = 0 → guarded pct = 0
      (1L, "one lonely document here", "en", "solo", 24L),
      // NULL source with two docs → percent_rank 0 and 1
      (2L, "null source doc shorter", "en", null.asInstanceOf[String], 23L),
      (3L, "null source doc that is quite a bit longer than the other", "en",
        null.asInstanceOf[String], 58L),
      // source "b" with three docs → pct 0, 0.5, 1
      (4L, "bb one", "en", "b", 6L),
      (5L, "bb two words longer", "en", "b", 19L),
      (6L, "bb three words even longer still here", "en", "b", 37L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // must not throw (ANSI divide-by-zero on the solo source)
    val out = CurationQueries.q240(spark, dir).collect()
    // solo source: pct = 0 < 0.95 → filtered, but NOT via an exception
    assert(!out.exists(r => r.getString(0) == "solo"))
    // null source kept: its top doc has pct = 1.0 ≥ 0.95
    val nullRows = out.filter(_.isNullAt(0))
    assert(nullRows.length === 1, s"null-source top doc missing: ${out.mkString(";")}")
    assert(nullRows.head.getDouble(3) === 1.0)
    // source b: exactly its top doc survives
    assert(out.count(r => !r.isNullAt(0) && r.getString(0) == "b") === 1)
  }
}
