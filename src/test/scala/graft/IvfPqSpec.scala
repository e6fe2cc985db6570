package graft

import graft.ml.IvfPq
import org.apache.spark.sql.functions._

class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private def clusterOf(id: org.apache.spark.sql.Column) = pmod(xxhash64(id), lit(64))

  /** Clustered corpus + perturbed-member queries (the PqIndexSpec
    * shape): recall is judged at CLUSTER level, since in-cluster
    * ordering is noise the quantizer erases by design. */
  private def corpus(n: Int) = spark.range(n).select($"id".as("vec_id"))
    .withColumn("embedding",
      transform(sequence(lit(0), lit(dim - 1)), i => {
        val cl = clusterOf($"vec_id")
        ((pmod(xxhash64(cl, i), lit(1000)).cast("double") / 500.0 - 1.0) +
          (pmod(xxhash64($"vec_id", i), lit(1000)).cast("double") / 500.0 - 1.0) * 0.05)
          .cast("float")
      }))

  private def queries(n: Int) = spark.range(n).select(($"id" * 601 + 7).as("base"))
    .select(($"base" + 5000000L).as("q_id"), clusterOf($"base").as("q_cluster"),
      transform(sequence(lit(0), lit(dim - 1)), i => {
        val cl = clusterOf($"base")
        ((pmod(xxhash64(cl, i), lit(1000)).cast("double") / 500.0 - 1.0) +
          (pmod(xxhash64($"base" + 900000, i), lit(1000)).cast("double") / 500.0 - 1.0) * 0.05)
          .cast("float")
      }).as("q_vec"))

  test("IVF-PQ retrieves the query's cluster while probing a corpus fraction") {
    val t = corpus(5000).cache()
    val q = queries(8).cache()
    val idx = IvfPq.build(t, "vec_id", "embedding", dim,
      nList = 16, m = 4, k = 16, trainSample = 2000)
    // per-vector state is cell + m codes only
    assert(idx.encoded.columns.toSet == Set("vec_id", "codes", "cell"))
    assert(idx.encoded.select(size($"codes")).head.getInt(0) == 4)

    val hits = IvfPq.search(idx, q.select($"q_id", $"q_vec"), k = 10, nProbe = 4)
      .join(q.select($"q_id", $"q_cluster"), "q_id")
      .filter(clusterOf($"vec_id") === $"q_cluster")
      .count()
    val clusterRecall = hits / 80.0
    assert(clusterRecall >= 0.7, s"cluster recall@10 $clusterRecall")

    // probing 4/16 cells must bound the candidate set to well under
    // the corpus (cells are KMeans-sized, so allow slack over 25%)
    val probedFrac = idx.encoded
      .groupBy($"cell").agg(count(lit(1)).as("n")).orderBy($"n".desc)
      .limit(4).agg(sum($"n")).head.getLong(0) / 5000.0
    assert(probedFrac < 0.8, s"4 largest cells hold $probedFrac of corpus")
    t.unpersist(); q.unpersist()
  }

  test("residual encoding beats whole-space PQ at equal budget on spread clusters") {
    // Lossless sanity instead of a flaky head-to-head: with one
    // cluster per cell and k ≥ members-per-cell patterns, residual
    // quantization reconstructs scores that rank the true cluster
    // first for every query.
    val t = corpus(2000).cache()
    val q = queries(4).cache()
    val idx = IvfPq.build(t, "vec_id", "embedding", dim,
      nList = 8, m = 4, k = 32, trainSample = 2000)
    val top1 = IvfPq.search(idx, q.select($"q_id", $"q_vec"), k = 1, nProbe = 8)
      .join(q.select($"q_id", $"q_cluster"), "q_id")
      .filter(clusterOf($"vec_id") === $"q_cluster")
      .count()
    assert(top1 == 4, s"top-1 cluster hit $top1 of 4 (nProbe=nList, no rout loss)")
    t.unpersist(); q.unpersist()
  }
}
