package graft

import graft.operators.Similarity

/** nDCG@k against hand-computed fixtures. Spec-only by design: the
  * log2 discount is a libm transcendental with no cross-engine
  * rounding guarantee, so nDCG is excluded from the DuckDB oracle set
  * (q190/q224 carry the rational stand-in metrics the driver
  * hash-checks); this spec is its correctness gate instead.
  */
class NdcgSpec extends SparkSpec {
  import spark.implicits._

  // (q_id, score, rel):
  //  query A — scores already relevance-ordered → ndcg exactly 1
  //  query B — rels in score order are [1,3,2,0]; hand-computed:
  //    DCG  = 1/1 + 7/log2(3) + 3/2 + 0        = 6.9165082750002025
  //    IDCG = 7/1 + 3/log2(3) + 1/2 + 0        = 9.392789260714373
  //    nDCG = 0.7363636171343382
  //  query C — all rels 0 → idcg 0 → ndcg NULL
  private val fixture = Seq(
    ("A", 9.0, 3), ("A", 8.0, 2), ("A", 7.0, 1), ("A", 6.0, 0),
    ("B", 9.0, 1), ("B", 8.0, 3), ("B", 7.0, 2), ("B", 6.0, 0),
    ("C", 9.0, 0), ("C", 8.0, 0)
  ).toDF("q_id", "score", "rel")

  test("ndcg@4 matches hand-computed DCG/IDCG; perfect order is 1; zero-rel is NULL") {
    val out = Similarity.ndcgAtK(fixture, k = 4).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(math.abs(out("A").getDouble(3) - 1.0) < 1e-12)
    assert(math.abs(out("B").getDouble(1) - 6.9165082750002025) < 1e-9)
    assert(math.abs(out("B").getDouble(2) - 9.392789260714373) < 1e-9)
    assert(math.abs(out("B").getDouble(3) - 0.7363636171343382) < 1e-9)
    assert(out("C").isNullAt(3) && out("C").getDouble(2) === 0.0)
  }

  test("ndcg@k truncates: items past rank k contribute to neither DCG nor IDCG") {
    // k=2 on query B: DCG = 1/1 + 7/log2(3); IDCG = 7/1 + 3/log2(3)
    val out = Similarity.ndcgAtK(fixture.filter($"q_id" === "B"), k = 2)
      .collect().head
    val l3 = math.log(3) / math.log(2)
    assert(math.abs(out.getDouble(1) - (1.0 + 7.0 / l3)) < 1e-9)
    assert(math.abs(out.getDouble(2) - (7.0 + 3.0 / l3)) < 1e-9)
  }

  test("ndcg over a real retrieval shape: ideal ordering of IVF results scores 1") {
    // rank the approximate results by their own relevance → ndcg 1
    val df = Seq(("q1", 5.0, 2), ("q1", 4.0, 1), ("q1", 3.0, 0)).toDF("q_id", "score", "rel")
    val r = Similarity.ndcgAtK(df, k = 3).collect().head
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-12)
  }
}
