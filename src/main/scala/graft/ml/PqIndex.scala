package graft.ml

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for ANN at corpus scales where even SQ8
  * vectors are too large: the vector splits into `m` subvectors, each
  * quantized to one of `k` trained centroids, so a 64-dim float32
  * embedding (256 bytes) stores as m codes (m bytes at k ≤ 256) — a
  * 32× compression at m=8 — and search never decodes: a query
  * precomputes per-subspace lookup tables (LUTs) of q_sub · centroid,
  * and a target's approximate inner product is m table lookups over
  * its codes (the "asymmetric distance computation" of Jégou et al.,
  * PAMI 2011).
  *
  * Scale shape (100 TB of vectors): training fits m small KMeans
  * models (sampled corpus, driver-bounded k·subDim centroids);
  * encoding is one map-only pass with broadcast centroids (Spark ML
  * transform — no shuffle); search broadcasts the tiny per-query LUTs
  * and streams the code table through a pure column expression into
  * the native bounded-heap TopKPerGroup. The corpus-side state that
  * search touches is codes only — the float vectors never move.
  */
object PqIndex {

  /** Trained per-subspace quantizers. `centroids(s)(c)` is the c-th
    * centroid of subspace s, as doubles. */
  final case class Index(m: Int, subDim: Int, models: Array[KMeansModel]) {
    def centroids: Array[Array[Array[Double]]] =
      models.map(_.clusterCenters.map(_.toArray))
  }

  /** 1-based slice of subspace `s` (0-based) from a vector column. */
  private def subVec(vecCol: Column, s: Int, subDim: Int): Column =
    slice(vecCol, s * subDim + 1, subDim)

  /** Fit one KMeans per subspace (k centroids each). */
  def build(targets: DataFrame, vecCol: String, dim: Int, m: Int, k: Int,
      seed: Long = 7L): Index = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    val models = (0 until m).map { s =>
      val sv = targets
        .select(array_to_vector(subVec(col(vecCol), s, subDim)).as("__v"))
      new KMeans().setK(k).setSeed(seed + s)
        .setFeaturesCol("__v").setPredictionCol("__c")
        .fit(sv)
    }.toArray
    Index(m, subDim, models)
  }

  /** Encode every target to its m-byte code word: one chained map-only
    * pass, m broadcast-centroid assignments, output
    * (idCol, codes: array<int>). */
  def encode(targets: DataFrame, idCol: String, vecCol: String,
      idx: Index): DataFrame = {
    val withCodes = (0 until idx.m).foldLeft(
      targets.select(col(idCol), col(vecCol))) { (df, s) =>
      val staged = df.withColumn(s"__v$s",
        array_to_vector(subVec(col(vecCol), s, idx.subDim)))
      // Copy before setting columns: mutating the shared model in place
      // would make Index unsafe for concurrent use and leak column
      // names across calls.
      idx.models(s).copy(org.apache.spark.ml.param.ParamMap.empty)
        .setFeaturesCol(s"__v$s").setPredictionCol(s"__c$s")
        .transform(staged).drop(s"__v$s")
    }
    withCodes.select(col(idCol),
      array((0 until idx.m).map(s => col(s"__c$s")): _*).as("codes"))
  }

  /** ADC top-k inner-product search: queries (qId, qVec) — a small,
    * broadcastable set by contract, like every query side here — get
    * driver-built LUTs lut(s)(c) = q_sub(s) · centroid(s)(c); the
    * approximate score of a target is Σ_s lut(s)(codes(s)), evaluated
    * as a pure column fold over the broadcast LUT (no UDF), reduced by
    * the native bounded heap. */
  def searchADC(encoded: DataFrame, queries: DataFrame, idx: Index, k: Int,
      qId: String = "q_id", qVec: String = "q_vec",
      tId: String = "vec_id"): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val cents = idx.centroids
    val qRows = queries
      .select(col(qId).cast("long"), col(qVec).cast("array<double>"))
      .collect()
    val luts = qRows.map { r =>
      val q = r.getSeq[Double](1).toArray
      val lut = Array.tabulate(idx.m) { s =>
        cents(s).map { c =>
          var d = 0.0
          var i = 0
          while (i < idx.subDim) { d += q(s * idx.subDim + i) * c(i); i += 1 }
          d
        }
      }
      (r.getLong(0), lut.map(_.toSeq).toSeq)
    }.toSeq
    val lutDf = luts.toDF(qId, "__lut")
    val scored = encoded.crossJoin(broadcast(lutDf))
      .filter(col(qId) =!= col(tId))
      .withColumn("score",
        aggregate(sequence(lit(0), lit(idx.m - 1)), lit(0.0),
          (acc, s) => acc +
            element_at(element_at(col("__lut"), s + 1),
              element_at(col("codes"), s + 1) + 1)))
    graft.plans.TopK.perGroup(scored, k, Seq(qId),
      Seq(graft.plans.TopK.desc("score"), graft.plans.TopK.asc(tId)))
      .select(col(qId), col(tId), col("score"))
  }

  // ---- persistence ---------------------------------------------------
  // The codebooks are the expensive artifact (m iterative KMeans fits
  // over a corpus sample); like the IVF index they persist once and
  // reopen in O(m·k·subDim) — a retrieval service must never re-train
  // per query batch. Layout: <dir>/meta (m + subDim), <dir>/model-<s>
  // (Spark ML's own KMeansModel writer, one per subspace).

  def save(idx: Index, dir: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "meta"),
      s"${idx.m} ${idx.subDim}\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    idx.models.zipWithIndex.foreach { case (mdl, s) =>
      mdl.write.overwrite().save(s"$dir/model-$s")
    }
  }

  def load(dir: String): Index = {
    val meta = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir, "meta")),
      java.nio.charset.StandardCharsets.UTF_8).trim.split(" ")
    val m = meta(0).toInt
    val models = (0 until m).map(s => KMeansModel.load(s"$dir/model-$s")).toArray
    Index(m, meta(1).toInt, models)
  }
}
