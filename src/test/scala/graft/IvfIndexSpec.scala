package graft

import graft.ml.IvfIndex
import graft.operators.Similarity

class IvfIndexSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("trained IVF: probing more cells raises recall vs brute force; full probe == exact") {
    val sf = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))

    val exact = Similarity.bruteForceTopK(queries, emb, k = 10)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val nList = 8
    val index = IvfIndex.build(emb, "embedding", nList)
    assert(index.centroids.length == nList)

    def recall(nProbe: Int): Double = {
      val got = IvfIndex.search(index, queries, k = 10, nProbe = nProbe)
        .select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (got intersect exact).size.toDouble / exact.size
    }
    val r1 = recall(1)
    val rAll = recall(nList)
    assert(rAll == 1.0, s"probing every cell must equal brute force, got $rAll")
    assert(r1 <= rAll)
    assert(r1 > 0.0, "nearest cell should contain at least some true neighbors")
  }

  test("filtered ANN: predicate pushed into the candidate scan fills k; post-filtering under-fills") {
    val sf = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val k = 10
    val nList = 8

    // ground truth: brute-force cosine among label=2 vectors only
    val exact = Similarity.bruteForceTopK(queries, emb.filter(col("label") === 2), k)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val index = IvfIndex.build(emb, "embedding", nList)
    val pushed = IvfIndex.search(index, queries, k, nProbe = nList,
      predicate = Some(col("label") === 2))
    // full probe + pushed predicate == exact filtered brute force
    val got = pushed.select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === exact,
      "full-probe filtered search must equal filtered brute force")
    // every query fills all k slots despite ~1/4 selectivity
    val fills = pushed.groupBy("q_id").count().collect().map(_.getLong(1))
    assert(fills.length === 5 && fills.forall(_ === k.toLong))

    // the contrast: post-filtering an UNFILTERED top-k under-fills
    val post = IvfIndex.search(index, queries, k, nProbe = nList)
      .join(emb.select(col("vec_id"), col("label")), "vec_id")
      .filter(col("label") === 2)
    val postFills = post.groupBy("q_id").count().collect().map(_.getLong(1))
    assert(postFills.forall(_ < k.toLong),
      s"post-filter should under-fill at ~25% selectivity, got ${postFills.toSeq}")

    // partial probe: filtered recall measured (goes to SCALE.md)
    val r1 = IvfIndex.search(index, queries, k, nProbe = 1,
        predicate = Some(col("label") === 2))
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
      .intersect(exact).size.toDouble / exact.size
    info(f"filtered recall@10: nProbe=1 $r1%.3f, nProbe=$nList 1.000")
    assert(r1 > 0.0)

    // the predicate reaches the parquet scan of the assigned side
    val plan = pushed.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("label"),
      "metadata predicate should reach the scan as a pushed filter")
  }
}
