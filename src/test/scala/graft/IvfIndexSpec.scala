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
}
