package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Planted-structure gates for the round-9 analytics: the DuckDB
  * oracle proves cross-engine EQUALITY, but equality of a wrong answer
  * is still wrong — these tests plant known structure in synthetic
  * tables (written in the driver's own parquet layouts) and pin that
  * each operator FINDS it: the changepoint lands where the jump was
  * planted, DBSCAN recovers the planted clusters and noise, the PCA
  * eigenvector points along the planted variance axis, Shapley credits
  * the channel that actually determines conversion, the seasonal
  * anomaly flag hits the planted spike, Holt–Winters goes flat on a
  * constant series.
  */
class PlantedStructureSpec extends SparkSpec {
  import spark.implicits._

  /** Write an events.parquet fixture: (day, user, type, value) rows at
    * noon UTC of each epoch-day. */
  private def eventsDir(rows: Seq[(Int, Long, String, Double)]): String = {
    val dir = Files.createTempDirectory("planted")
    rows.toDF("day", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(
        ($"day".cast("long") * 86400L + 43200L) * 1000000L))
      .withColumn("event_id", monotonically_increasing_id())
      .withColumn("props", lit("{}"))
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("events.parquet").toString)
    dir.toString
  }

  private def embeddingsDir(rows: Seq[(Long, Seq[Float], Int)]): String = {
    val dir = Files.createTempDirectory("planted-emb")
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("embeddings.parquet").toString)
    dir.toString
  }

  test("q296 localizes the planted mean shift") {
    // 40 days of purchases: 10.00/day, jumping to 100.00/day at day 21
    val rows = (1 to 40).map { d =>
      (d, d.toLong, "purchase", if (d <= 20) 10.0 else 100.0)
    }
    val out = operators.EventQueries.q296(spark, eventsDir(rows))
      .collect().map(r => (r.getInt(0), r.getLong(3))).toMap
    assert(out(1) === 20L, s"level-1 split at ${out(1)}, planted at k=20")
  }

  test("q284 flags the planted spike (and only its MA neighborhood)") {
    // 28 flat days, one 50x spike at day 15
    val rows = (1 to 28).map { d =>
      (d, d.toLong, "purchase", if (d == 15) 500.0 else 10.0)
    }
    val out = operators.EventQueries.q284(spark, eventsDir(rows))
      .select($"day".cast("long"), $"resid_micro", $"anomaly").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val flagged = out.filter(_._3 == 1).map(_._1).toSet
    assert(flagged.contains(15L), "planted spike day not flagged")
    // the spike dominates: its residual is the maximum in magnitude,
    // and the flat far field (beyond MA/weekday leakage) stays clean
    val spikeResid = out.find(_._1 == 15L).get._2
    assert(out.forall(r => math.abs(r._2) <= math.abs(spikeResid)),
      "a non-spike day out-residuals the planted spike")
  }

  test("q280 goes flat on a constant series") {
    val rows = (1 to 21).map(d => (d, d.toLong, "purchase", 25.0))
    val out = operators.EventQueries.q280(spark, eventsDir(rows)).collect()
    assert(out.forall(_.getLong(3) === 0L), "nonzero trend on constant data")
    assert(out.forall(_.getLong(4) === 0L), "nonzero seasonal on constant data")
    // after the seed row, forecast == actual, error == 0
    out.filter(!_.isNullAt(6)).foreach { r =>
      assert(r.getLong(6) === 0L, s"nonzero forecast error on day ${r.getLong(0)}")
    }
  }

  test("q276 credits the channel that determines conversion") {
    // users 1-10: click then purchase; users 11-20: view only
    val rows =
      (1L to 10L).flatMap(u => Seq((1, u, "click", 0.0), (2, u, "purchase", 1.0))) ++
        (11L to 20L).map(u => (1, u, "view", 0.0))
    val out = operators.EventQueries.q276(spark,
        eventsDir(rows.map { case (d, u, t, v) => (d, u, t, v) }))
      .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    // exact-set semantics: v({click}) = 10 conversions, every other
    // coalition 0 -> phi_click = +10/2, phi_view = -10/2 (in micro)
    assert(out("click") === 5000000L, s"click credit ${out("click")}")
    assert(out("view") === -5000000L, s"view credit ${out("view")}")
  }

  test("q277 recovers planted clusters and noise") {
    def vec(x: Double, y: Double): Seq[Float] =
      Seq(x.toFloat, y.toFloat) ++ Seq.fill(62)(0f)
    // two tight 10-point clusters (radius << eps=0.015), 5 isolated
    // noise points pairwise > eps apart and far from both clusters
    val c1 = (0 until 10).map(i => (i.toLong, vec(0.10 + 0.001 * i, 0.10), 0))
    val c2 = (0 until 10).map(i => (100L + i, vec(-0.20 + 0.001 * i, -0.20), 1))
    val noise = (0 until 5).map(i => (200L + i, vec(0.30 + 0.05 * i, -0.35), 2))
    val out = operators.SimilarityQueries.q277(spark,
        embeddingsDir(c1 ++ c2 ++ noise))
      .collect().map(r => (r.getLong(0), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    val roles = out.groupBy(_._2).map { case (k, v) => k -> v.size }
    assert(roles.getOrElse("core", 0) === 20, s"roles: $roles")
    assert(roles.getOrElse("noise", 0) === 5, s"roles: $roles")
    val clusters = out.filter(_._2 == "core").map(_._3).distinct
    assert(clusters.size === 2, s"expected 2 clusters, got $clusters")
  }

  test("q286 finds the planted variance axis") {
    // dim 5 carries 100x the variance of every other dim
    val rnd = new scala.util.Random(7)
    val rows = (0L until 200L).map { i =>
      val v = Array.fill(64)((rnd.nextDouble() - 0.5) * 0.02)
      v(4) = (rnd.nextDouble() - 0.5) * 2.0 // dim index 4 = "dim 5"
      (i, v.map(_.toFloat).toSeq, 0)
    }
    val out = operators.SimilarityQueries.q286(spark, embeddingsDir(rows))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = out.values.map(v => v.toDouble * v).sum
    val share = out(4).toDouble * out(4) / total
    assert(share > 0.95,
      f"eigenvector mass on the planted axis only $share%.3f")
  }
}
