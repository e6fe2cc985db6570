package graft

import graft.ml.PqIndex
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class PqIndexSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private val m = 4
  private val subDim = dim / m

  /** Deterministic vectors drawn from `nPatterns` distinct per-subspace
    * patterns — with k >= nPatterns the quantizer can be lossless. */
  private def patternedTargets(n: Int, nPatterns: Int) =
    spark.range(n).select($"id".as("vec_id"))
      .withColumn("embedding",
        transform(sequence(lit(0), lit(dim - 1)), i =>
          (pmod(xxhash64(pmod($"vec_id", lit(nPatterns)), i), lit(1000)).cast("double") / 500.0 - 1.0)
            .cast("float")))

  private def queries(n: Int) =
    spark.range(n).select(($"id" + 5000000L).as("q_id"))
      .withColumn("q_vec",
        transform(sequence(lit(0), lit(dim - 1)), i =>
          (pmod(xxhash64($"q_id" + 31, i), lit(1000)).cast("double") / 500.0 - 1.0)
            .cast("float")))

  private def exactDotTopK(q: org.apache.spark.sql.DataFrame,
      t: org.apache.spark.sql.DataFrame, k: Int) = {
    val joined = t.crossJoin(broadcast(q))
      .filter($"q_id" =!= $"vec_id")
      .withColumn("score", Similarity.dot(
        Similarity.toDoubleArr($"q_vec"), Similarity.toDoubleArr($"embedding")))
    graft.plans.TopK.perGroup(joined, k, Seq("q_id"),
      Seq(graft.plans.TopK.desc("score"), graft.plans.TopK.asc("vec_id")))
      .select($"q_id", $"vec_id")
  }

  test("lossless regime: k >= distinct subvector patterns makes ADC exact") {
    val t = patternedTargets(2000, nPatterns = 8).cache()
    val q = queries(4).cache()
    val idx = PqIndex.build(t, "embedding", dim, m, k = 8)
    val enc = PqIndex.encode(t, "vec_id", "embedding", idx)
    // every vector must sit exactly on a centroid: quantization error 0
    val adc = PqIndex.searchADC(enc, q, idx, k = 10)
    val exact = exactDotTopK(q, t, 10)
    // With only 8 distinct vectors, many targets tie at identical
    // scores; compare score SETS per query, not id sets.
    val adcScores = adc.select($"q_id", round($"score", 9)).distinct().collect().toSet
    val got = adc.join(exact, Seq("q_id", "vec_id")).count()
    assert(adcScores.nonEmpty)
    // ADC scores are true dot products here — the top-10 overlap can
    // differ only by ties among identical vectors.
    assert(got >= 4 * 10 - 8, s"overlap $got of 40")
    t.unpersist(); q.unpersist()
  }

  test("searchADC accepts array<double> query vectors (cast parity)") {
    val t = patternedTargets(500, nPatterns = 8).cache()
    val qF = queries(2).cache()
    val qD = qF.withColumn("q_vec", $"q_vec".cast("array<double>"))
    val idx = PqIndex.build(t, "embedding", dim, m, k = 8)
    val enc = PqIndex.encode(t, "vec_id", "embedding", idx).cache()
    val fromFloat = PqIndex.searchADC(enc, qF, idx, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fromDouble = PqIndex.searchADC(enc, qD, idx, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fromFloat == fromDouble && fromFloat.size == 10)
    t.unpersist(); qF.unpersist(); enc.unpersist()
  }

  test("clustered corpus: ADC retrieves the query's own cluster") {
    // 64 clusters with 5% noise; each query is a perturbed member of a
    // known cluster — the realistic "find my near neighbors" shape.
    // Within the winning cluster members differ only at noise level,
    // which quantization erases by design, so the meaningful metric is
    // CLUSTER recall (did the top-10 come from the query's cluster?),
    // not exact id overlap against noise-rank ordering.
    val n = 5000
    def clusterOf(id: org.apache.spark.sql.Column) = pmod(xxhash64(id), lit(64))
    val t = spark.range(n).select($"id".as("vec_id"))
      .withColumn("embedding",
        transform(sequence(lit(0), lit(dim - 1)), i => {
          val cl = clusterOf($"vec_id")
          ((pmod(xxhash64(cl, i), lit(1000)).cast("double") / 500.0 - 1.0) +
            (pmod(xxhash64($"vec_id", i), lit(1000)).cast("double") / 500.0 - 1.0) * 0.05)
            .cast("float")
        })).cache()
    // query j = member j of the corpus, re-perturbed (base id j, fresh
    // noise seed), tagged with its true cluster
    val q = spark.range(8).select(($"id" * 601 + 7).as("base"))
      .select(($"base" + 5000000L).as("q_id"), clusterOf($"base").as("q_cluster"),
        transform(sequence(lit(0), lit(dim - 1)), i => {
          val cl = clusterOf($"base")
          ((pmod(xxhash64(cl, i), lit(1000)).cast("double") / 500.0 - 1.0) +
            (pmod(xxhash64($"base" + 900000, i), lit(1000)).cast("double") / 500.0 - 1.0) * 0.05)
            .cast("float")
        }).as("q_vec")).cache()
    val idx = PqIndex.build(t, "embedding", dim, m, k = 16)
    val enc = PqIndex.encode(t, "vec_id", "embedding", idx).cache()
    assert(enc.select(size($"codes")).head.getInt(0) == m)
    val adc = PqIndex.searchADC(enc, q.select($"q_id", $"q_vec"), idx, k = 10)
    val hits = adc
      .join(q.select($"q_id", $"q_cluster"), "q_id")
      .filter(clusterOf($"vec_id") === $"q_cluster")
      .count()
    val clusterRecall = hits / 80.0
    assert(clusterRecall >= 0.8, s"cluster recall@10 $clusterRecall")
    enc.unpersist(); t.unpersist(); q.unpersist()
  }

  test("shared Index is safe under concurrent encode+search (model.copy per stage)") {
    // encode() clones each KMeansModel before setting stage-local
    // column names; two threads driving the SAME Index concurrently
    // must not leak column params across calls. Run 4 concurrent
    // encode→search pipelines and require identical results.
    val t = patternedTargets(500, nPatterns = 8).cache()
    val q = queries(2).cache()
    val idx = PqIndex.build(t, "embedding", dim, m, k = 8)
    val expected = {
      val enc = PqIndex.encode(t, "vec_id", "embedding", idx)
      PqIndex.searchADC(enc, q, idx, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val runs = Future.sequence((1 to 4).map { _ =>
      Future {
        val enc = PqIndex.encode(t, "vec_id", "embedding", idx)
        PqIndex.searchADC(enc, q, idx, k = 5)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
    })
    Await.result(runs, 120.seconds).foreach(got => assert(got == expected))
    t.unpersist(); q.unpersist()
  }

  test("codes are compact: m small ints per vector") {
    val t = patternedTargets(500, nPatterns = 8)
    val idx = PqIndex.build(t, "embedding", dim, m, k = 8)
    val enc = PqIndex.encode(t, "vec_id", "embedding", idx)
    val mx = enc.select(array_max($"codes")).agg(max("array_max(codes)")).head.getInt(0)
    assert(mx < 8)
    assert(enc.columns.toSeq == Seq("vec_id", "codes"))
  }
}
