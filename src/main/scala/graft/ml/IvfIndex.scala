package graft.ml

import graft.operators.Similarity
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trained IVF (inverted-file) ANN index: a KMeans coarse quantizer
  * partitions the vector space into nList cells; search probes only the
  * nProbe cells nearest to each query.
  *
  * Scale shape (100 TB of vectors): training samples the corpus once;
  * assignment is one pass (broadcast centroids); the search join is a
  * bucket equi-join on cell id — each query meets |corpus| × nProbe /
  * nList candidates instead of the full corpus, and the candidate join
  * key (cell) is shuffle-friendly and skew-bounded by cell sizes.
  */
object IvfIndex {

  final case class Index(centroids: Array[(Int, Array[Double])], assigned: DataFrame)

  /** Train the quantizer and assign every target vector to its cell. */
  def build(targets: DataFrame, vecCol: String, nList: Int, seed: Long = 7L): Index = {
    val withVec = targets.withColumn("__v", array_to_vector(col(vecCol)))
    val model = new KMeans().setK(nList).setSeed(seed)
      .setFeaturesCol("__v").setPredictionCol("__cell")
      .fit(withVec)
    val assigned = model.transform(withVec)
      .withColumnRenamed("__cell", "cell").drop("__v")
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }
    Index(centroids, assigned)
  }

  /** For each query, its nProbe nearest cells (driver-side centroid
    * table — nList is small by construction). Cell selection runs
    * through the native TopKPerGroup heap, so no per-query window sort
    * exists anywhere on the search path. */
  private def probeCells(queries: DataFrame, qId: String, qVec: String,
      centroids: Array[(Int, Array[Double])], nProbe: Int): DataFrame = {
    val s = queries.sparkSession
    import s.implicits._
    val cdf = centroids.map { case (i, c) => (i, c.map(_.toFloat)) }
      .toSeq.toDF("cell", "centroid")
    val joined = queries.crossJoin(broadcast(cdf))
      .withColumn("cdist",
        Similarity.cosineNative(queries,
          Similarity.toDoubleArr(col(qVec)), Similarity.toDoubleArr(col("centroid"))))
    graft.plans.TopK.perGroup(joined, nProbe, Seq(qId),
      Seq(graft.plans.TopK.desc("cdist"), graft.plans.TopK.asc("cell")))
      .select(col(qId).as("p_qid"), col("cell"))
  }

  /** ANN top-k probing nProbe cells per query: candidate reduction via
    * the bounded-heap TopKPerGroup, ranking via a window over the ≤ k
    * surviving rows per query.
    *
    * `predicate` (filtered ANN): a metadata predicate over the
    * assigned-vector columns, pushed INTO the candidate scan — the
    * heap then fills its k slots with MATCHING vectors only. The
    * alternative (post-filtering an unfiltered top-k) under-fills:
    * with selectivity s, an unfiltered top-k retains only ~s·k
    * matching rows per query. Because `assigned` is a plain DataFrame,
    * the predicate reaches the parquet scan as a PushedFilter — the
    * non-matching corpus is never even decoded. */
  def search(index: Index, queries: DataFrame, k: Int, nProbe: Int,
      qId: String = "q_id", qVec: String = "q_vec",
      tId: String = "vec_id", tVec: String = "embedding",
      predicate: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val probes = probeCells(queries, qId, qVec, index.centroids, nProbe)
    val base = predicate.map(index.assigned.filter).getOrElse(index.assigned)
    val candidates = base
      .join(probes, Seq("cell"))
      .join(broadcast(queries), col(qId) === col("p_qid") && col(qId) =!= col(tId))
      .withColumn("sim",
        Similarity.cosineNative(queries,
          Similarity.toDoubleArr(col(qVec)), Similarity.toDoubleArr(col(tVec))))
    val top = graft.plans.TopK.perGroup(candidates, k, Seq(qId),
      Seq(graft.plans.TopK.desc("sim"), graft.plans.TopK.asc(tId)))
    val w = Window.partitionBy(col(qId)).orderBy(col("sim").desc, col(tId))
    top.withColumn("rn", row_number().over(w))
      .select(col(qId), col(tId), col("sim"), col("rn"))
  }
}
