package graft

import graft.operators.Similarity
import graft.operators.Similarity.{MmrCand, MmrPick}

/** Semantics of the MMR greedy core (the oracle pins cross-engine
  * exactness; this pins that the algorithm does what MMR promises). */
class MmrSpec extends SparkSpec {

  private def unit(xs: Double*): Seq[Double] = {
    val n = math.sqrt(xs.map(x => x * x).sum)
    xs.map(_ / n)
  }

  test("rank 1 is always the pure-relevance argmax") {
    val cands = Seq(
      MmrCand(10L, 0.9, unit(1, 0, 0)),
      MmrCand(11L, 0.95, unit(0, 1, 0)),
      MmrCand(12L, 0.5, unit(0, 0, 1)))
    val picks = Similarity.greedyMmr(1L, cands, k = 3, lambda = 0.7)
    assert(picks.head.vec_id == 11L)
    assert(picks.head.mmr == 0.7 * 0.95)
  }

  test("diversity penalty demotes a redundant near-copy of the first pick") {
    // b is nearly identical to a (cos ~ 1) with slightly lower rel;
    // c is orthogonal with much lower rel. Plain top-3 by rel would
    // order a, b, c — MMR at λ=0.7 must prefer c over b at rank 2.
    val a = MmrCand(1L, 0.99, unit(1, 0.001, 0))
    val b = MmrCand(2L, 0.98, unit(1, 0, 0))
    val c = MmrCand(3L, 0.60, unit(0, 1, 0))
    val picks = Similarity.greedyMmr(7L, Seq(a, b, c), k = 3, lambda = 0.7)
    assert(picks.map(_.vec_id) == Seq(1L, 3L, 2L))
  }

  test("lambda = 1 reduces to plain relevance ranking") {
    val cands = Seq(
      MmrCand(1L, 0.9, unit(1, 0, 0)),
      MmrCand(2L, 0.9, unit(1, 0.0001, 0)), // tie on rel → lower id first
      MmrCand(3L, 0.7, unit(0, 1, 0)))
    val picks = Similarity.greedyMmr(1L, cands, k = 3, lambda = 1.0)
    assert(picks.map(_.vec_id) == Seq(1L, 2L, 3L))
    assert(picks.map(_.rel) == picks.map(_.mmr))
  }

  test("distributed rerank matches the greedy core run locally per query") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val got = Similarity.mmrRerank(queries, emb, k = 4, c = 15, lambda = 0.7)
      .as[MmrPick].collect().sortBy(p => (p.q_id, p.mmr_rank)).toSeq
    // reference: rebuild candidate lists from the oracle-checked
    // brute-force top-C, then run the same greedy core single-threaded
    val cands = Similarity.bruteForceTopK(queries, emb, k = 15)
      .select($"q_id", $"vec_id", $"sim".as("rel"),
        Similarity.toDoubleArr($"embedding").as("vec"))
      .as[(Long, Long, Double, Seq[Double])].collect()
      .groupBy(_._1)
    val expected = cands.toSeq.sortBy(_._1).flatMap { case (qId, rows) =>
      Similarity.greedyMmr(qId,
        rows.map(r => MmrCand(r._2, r._3, r._4)).toSeq, k = 4, lambda = 0.7)
    }
    assert(got == expected)
  }
}
