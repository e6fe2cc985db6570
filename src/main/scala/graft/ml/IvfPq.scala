package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF-PQ composed ANN (the FAISS IVFPQ architecture, Jégou et al.
  * PAMI 2011 §V): a coarse KMeans quantizer routes vectors to nList
  * cells; each vector stores only its cell id + an m-byte PQ code of
  * its RESIDUAL (vector − cell centroid). Search probes the nProbe
  * nearest cells per query and scores candidates without ever touching
  * a float vector, via the inner-product decomposition
  *
  *   q·x = q·c  +  q·(x − c)  ≈  q·c + Σ_s LUT_s[code_s]
  *
  * where q·c is exact (driver-side, nList values) and the LUTs are the
  * per-subspace dot products of q with the residual codebooks.
  *
  * Scale shape (100 TB of vectors): corpus state at rest = 1 int +
  * m bytes per vector (32× smaller than float32 at m=8, dim=64);
  * search shuffles NOTHING — candidates come from the cell equi-join
  * (|corpus|·nProbe/nList rows), scoring is a broadcast LUT join plus
  * a pure column fold, reduction is the native bounded heap. Encoding
  * residuals (not raw vectors) matters: within a cell residuals are
  * centered near zero, so the same codebook budget quantizes much
  * finer than whole-space PQ — the standard accuracy/memory trade.
  */
object IvfPq {

  final case class Index(
      coarse: Array[(Int, Array[Double])],
      pq: PqIndex.Index,
      /** (tId, cell, codes) — the only per-vector search state. */
      encoded: DataFrame)

  /** Train coarse + residual quantizers and encode the corpus.
    * `trainSample` caps the PQ training set (KMeans is iterative;
    * codebooks converge on a sample). */
  def build(targets: DataFrame, tId: String, vecCol: String, dim: Int,
      nList: Int, m: Int, k: Int, seed: Long = 7L,
      trainSample: Int = 50000): Index = {
    val s = targets.sparkSession
    import s.implicits._
    val ivf = IvfIndex.build(targets.select(col(tId), col(vecCol)), vecCol, nList, seed)
    val cdf = ivf.centroids.toSeq.toDF("cell", "__c")
    val resid = ivf.assigned.join(broadcast(cdf), "cell")
      .withColumn("__r", zip_with(
        graft.operators.Similarity.toDoubleArr(col(vecCol)), $"__c",
        (a, b) => a - b))
    val pq = PqIndex.build(resid.limit(trainSample), "__r", dim, m, k, seed)
    val encoded = PqIndex.encode(resid, tId, "__r", pq)
      .join(ivf.assigned.select(col(tId), $"cell"), tId)
    Index(ivf.centroids, pq, encoded)
  }

  /** Top-k inner-product search over codes only. Queries are a small,
    * broadcastable set by contract (as everywhere in the ANN stack). */
  def search(idx: Index, queries: DataFrame, k: Int, nProbe: Int,
      qId: String = "q_id", qVec: String = "q_vec",
      tId: String = "vec_id"): DataFrame = {
    val s = idx.encoded.sparkSession
    import s.implicits._
    val cents = idx.pq.centroids
    val qRows = queries
      .select(col(qId).cast("long"), col(qVec).cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    // Probe selection + LUT construction on the driver: nQ × nList dot
    // products, then nQ × nProbe × m × k LUT entries — all tiny.
    val probeRows = qRows.flatMap { case (qid, q) =>
      val byCell = idx.coarse.map { case (cell, c) =>
        var d = 0.0
        var i = 0
        while (i < q.length) { d += q(i) * c(i); i += 1 }
        (cell, d)
      }
      val probed = byCell.sortBy { case (cell, d) => (-d, cell) }.take(nProbe)
      val lut = Array.tabulate(idx.pq.m) { sp =>
        cents(sp).map { c =>
          var d = 0.0
          var i = 0
          while (i < idx.pq.subDim) { d += q(sp * idx.pq.subDim + i) * c(i); i += 1 }
          d
        }
      }
      probed.map { case (cell, qcDot) =>
        (qid, cell, qcDot, lut.map(_.toSeq).toSeq)
      }
    }.toSeq
    val lutDf = probeRows.toDF(qId, "cell", "__qc", "__lut")
    val m = idx.pq.m
    val scored = idx.encoded.join(broadcast(lutDf), "cell")
      .filter(col(qId) =!= col(tId))
      .withColumn("score",
        col("__qc") + aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
          (acc: Column, sp: Column) => acc +
            element_at(element_at(col("__lut"), sp + 1),
              element_at(col("codes"), sp + 1) + 1)))
    graft.plans.TopK.perGroup(scored, k, Seq(qId),
      Seq(graft.plans.TopK.desc("score"), graft.plans.TopK.asc(tId)))
      .select(col(qId), col(tId), col("score"))
  }

  // ---- persistence ---------------------------------------------------
  // The full IVFPQ artifact: coarse centroids (parquet, nList rows),
  // PQ codebooks (PqIndex.save), and the encoded code table (parquet,
  // cell-clustered — the ONLY per-vector state, 1 int + m codes each).
  // Reopen is O(nList·dim + m·k·subDim) plus a lazy parquet relation;
  // deltas fold in without touching either trained quantizer (the
  // IvfIndex.appendNew discipline; q315's centroid drift decides when
  // a re-train is genuinely due).

  def save(idx: Index, dir: String): Unit = {
    val s = idx.encoded.sparkSession
    import s.implicits._
    idx.coarse.toSeq.toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/coarse")
    PqIndex.save(idx.pq, s"$dir/pq")
    idx.encoded.repartition(col("cell"))
      .write.mode("overwrite").parquet(s"$dir/encoded")
  }

  def load(spark: org.apache.spark.sql.SparkSession, dir: String): Index = {
    val coarse = spark.read.parquet(s"$dir/coarse")
      .select(col("cell"), col("centroid")).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    Index(coarse, PqIndex.load(s"$dir/pq"), spark.read.parquet(s"$dir/encoded"))
  }

  def searchPersisted(spark: org.apache.spark.sql.SparkSession, dir: String,
      queries: DataFrame, k: Int, nProbe: Int,
      qId: String = "q_id", qVec: String = "q_vec",
      tId: String = "vec_id"): DataFrame =
    search(load(spark, dir), queries, k, nProbe, qId, qVec, tId)

  /** Fold NEW vectors into a persisted index without retraining:
    * coarse-assign by squared-Euclidean argmin (the build-time rule),
    * encode the residuals with the EXISTING codebooks, append to the
    * code table. O(|delta| · nList) + one map-only encode pass. */
  def appendNew(spark: org.apache.spark.sql.SparkSession, dir: String,
      delta: DataFrame, tId: String, vecCol: String): Unit = {
    val idx = load(spark, dir)
    import spark.implicits._
    val assigned = IvfIndex.assignNew(
      IvfIndex.Index(idx.coarse, delta), delta.select(col(tId), col(vecCol)),
      vecCol, tId)
    val cdf = idx.coarse.toSeq.toDF("cell", "__c")
    val resid = assigned.join(broadcast(cdf), "cell")
      .withColumn("__r", zip_with(
        graft.operators.Similarity.toDoubleArr(col(vecCol)), $"__c",
        (a, b) => a - b))
    PqIndex.encode(resid, tId, "__r", idx.pq)
      .join(assigned.select(col(tId), col("cell")), tId)
      .select(idx.encoded.columns.map(col).toIndexedSeq: _*)
      .repartition(col("cell"))
      .write.mode("append").parquet(s"$dir/encoded")
  }
}
