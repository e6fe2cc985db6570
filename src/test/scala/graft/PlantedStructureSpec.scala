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

  /** Write an orders.parquet fixture with one order of `dollars(d)`
    * at noon UTC of each epoch-day d. */
  private def ordersDir(days: Range, dollars: Int => Double): String = {
    val dir = Files.createTempDirectory("planted-ord")
    days.map(d => (d.toLong, dollars(d))).toDF("day", "o_totalprice")
      .withColumn("o_orderdate", timestamp_micros(
        ($"day" * 86400L + 43200L) * 1000000L))
      .withColumn("o_orderkey", $"day")
      .select($"o_orderkey", $"o_orderdate", $"o_totalprice")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("orders.parquet").toString)
    dir.toString
  }

  private def documentsDir(rows: Seq[(Long, String, String, String, Long)]): String = {
    val dir = Files.createTempDirectory("planted-doc")
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    dir.toString
  }

  test("q340 collapses to a zero-width interval on a constant series") {
    // every resample of a constant series has the same mean: the
    // bootstrap CI must be the point mass at 50.00/day, width 0 —
    // any nonzero width would mean the draw matrix leaked randomness
    val out = operators.EventQueries.q340(spark, ordersDir(1 to 30, _ => 50.0))
      .head()
    assert(out.getLong(1) === 5000L * 1000000L, "mean off the planted constant")
    assert(out.getLong(2) === out.getLong(1) && out.getLong(3) === out.getLong(1),
      "CI must collapse to the point mass on constant data")
    assert(out.getLong(4) === 0L, "nonzero width on constant data")
  }

  test("q341 reads the planted period-2 oscillation as VR(even) = 0") {
    // alternating 10/30: every 2- and 4-period difference is exactly
    // zero (mean reversion at its strongest), while 3- and 5-period
    // differences equal the 1-period ones, so VR(odd) ≈ n-corrected
    // 1/k. A vr of 1 everywhere would mean the lag fan-out is broken.
    val out = operators.EventQueries
      .q341(spark, ordersDir(1 to 40, d => if (d % 2 == 1) 10.0 else 30.0))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(2L) === 0L, s"VR(2) = ${out(2L)}, planted 0")
    assert(out(4L) === 0L, s"VR(4) = ${out(4L)}, planted 0")
    assert(out(3L) > 250000L && out(3L) < 450000L,
      s"VR(3) = ${out(3L)}, expected ~1/3 of 10^6")
  }

  /** orders fixture with customer keys: (custkey, orderkey, dollars,
    * day). */
  private def custOrdersDir(rows: Seq[(Long, Long, Double, Int)]): String = {
    val dir = Files.createTempDirectory("planted-cord")
    rows.toDF("o_custkey", "o_orderkey", "o_totalprice", "day")
      .withColumn("o_orderdate", timestamp_micros(
        ($"day".cast("long") * 86400L + 43200L) * 1000000L))
      .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"o_orderdate")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("orders.parquet").toString)
    dir.toString
  }

  test("q342 catches planted duplicates incl. the cell-straddling pair, and only those") {
    val d = custOrdersDir(Seq(
      (1L, 10L, 500.00, 10), (1L, 11L, 500.00, 15), // exact dup, 5 days
      (2L, 20L, 100.00, 10), (2L, 21L, 119.99, 20), // near (1999c), same cell
      (3L, 30L, 19.99, 10), (3L, 31L, 40.00, 12),   // 2001c apart: NOT a pair
      (4L, 40L, 19.99, 10), (4L, 41L, 39.99, 12),   // 2000c apart, ADJACENT cells
      (5L, 50L, 500.00, 10), (5L, 51L, 500.00, 200) // exact amount, too far apart
    ))
    val got = operators.Relational.q342(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(6)))
    assert(got.toSeq === Seq((1L, 10L, 11L, true), (2L, 20L, 21L, false),
      (4L, 40L, 41L, false)),
      s"pair set ${got.toSeq} (the (4,...) pair exists only via the ±1 cell fan-out)")
  }

  /** lineitem fixture: (suppkey, month day, extendedprice). Discount 0
    * so revenue sits on the cent grid exactly. */
  private def lineitemDir(rows: Seq[(Long, Int, Double)]): String = {
    val dir = Files.createTempDirectory("planted-li")
    rows.toDF("l_suppkey", "day", "l_extendedprice")
      .withColumn("l_shipdate", timestamp_micros(
        ($"day".cast("long") * 86400L + 43200L) * 1000000L))
      .withColumn("l_discount", lit(0.0))
      .withColumn("l_orderkey", monotonically_increasing_id())
      .withColumn("l_partkey", $"l_suppkey")
      .withColumn("l_quantity", lit(1.0))
      .withColumn("l_tax", lit(0.0))
      .select($"l_orderkey", $"l_partkey", $"l_suppkey", $"l_quantity",
        $"l_extendedprice", $"l_discount", $"l_tax", $"l_shipdate")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("lineitem.parquet").toString)
    dir.toString
  }

  test("q343 reads monopoly as HHI = 10^6 and 4 equal shares as exactly 250000") {
    // month 1970-01 (days 1..20): one supplier; 1970-03 (days 60..70):
    // four suppliers with identical revenue
    val d = lineitemDir(
      (1 to 20).map(day => (7L, day, 100.0)) ++
        (0 until 4).flatMap(s => Seq((s.toLong, 60 + s, 250.0))))
    val out = operators.Relational.q343(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(out === List((197001L, 1L, 1000000L), (197003L, 4L, 250000L)),
      s"got $out")
    val delta = operators.Relational.q343(spark, d).collect()
      .find(_.getLong(0) == 197003L).get.getLong(3)
    assert(delta === -750000L, "deconcentration delta wrong")
  }

  test("q344 reads the triangular corpus exactly: vocab(k) = k, tokens(k) = k(k+1)/2") {
    // doc d = words w1..wd: word wd first occurs in doc d
    val docs = (1 to 10).map { d =>
      (d.toLong, (1 to d).map(i => s"w$i").mkString(" "), "en", "s0", d.toLong)
    }
    val out = operators.TextQueries.q344(spark, documentsDir(docs)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === (1 to 10).map(k => (k.toLong, k.toLong, (k.toLong * (k + 1)) / 2)),
      s"got ${out.toSeq}")
  }

  test("q346 reads the planted dispersed part exactly") {
    // part 9: unit prices 10.00 and 25.00 → ratio exactly 2.5e6 micro;
    // part 1: constant unit price → ratio exactly 1e6
    val d = lineitemDir(
      (1 to 5).map(day => (9L, day, if (day % 2 == 1) 10.0 else 50.0)) ++
        (1 to 5).map(day => (1L, day, 20.0)))
    // lineitemDir fixes l_partkey = l_suppkey and quantity 1; day%2
    // gives part 9 prices {10,50} → ratio 5e6
    val out = operators.Relational.q346(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(4))).toMap
    assert(out(9L) === 5000000L, s"ratio ${out(9L)}, planted 5e6")
    assert(out(1L) === 1000000L, s"constant part ratio ${out(1L)}")
  }

  test("q348 surfaces the planted emerging/receding pair; the balanced term scores exactly zero") {
    // symmetric swap: "old" lives only in the first half, "novel" only
    // in the second, "base" keeps an identical share in both — so
    // base's cross-product a·tb − b·ta is exactly zero, and old/novel
    // carry equal chi2 with opposite directions
    val docs = (1 to 40).map { i =>
      val text = if (i <= 20) "base base old" else "base base novel"
      (i.toLong, text, "en", "s0", text.length.toLong)
    }
    val out = operators.TextQueries.q348(spark, documentsDir(docs)).collect()
      .map(r => (r.getString(0), r.getLong(3), r.getString(4)))
    val byTerm = out.map(t => t._1 -> t).toMap
    assert(byTerm("novel")._3 === "emerging" && byTerm("old")._3 === "receding")
    assert(byTerm("novel")._2 === byTerm("old")._2,
      "the symmetric swap must score both drifted terms equally")
    assert(byTerm("novel")._2 > 0L)
    assert(byTerm("base")._2 === 0L,
      s"share-balanced term scored ${byTerm("base")._2}, expected exactly 0")
    assert(out.head._1 === "novel", "tie-break: novel before old at equal chi2")
  }

  test("q349 counts the planted discordant pairs exactly and gates at 3.8415") {
    // 33 paired users: 10 convert→lapse (b), 3 lapse→convert (c),
    // 5 always, 15 never; plus one user active only in period 1
    // (must drop from the paired population)
    def u(id: Long, d1: String, d2: String) = Seq(
      (1, id, d1, 1.0), (30, id, d2, 1.0))
    val rows =
      (1L to 10L).flatMap(i => u(i, "purchase", "view")) ++
        (11L to 13L).flatMap(i => u(i, "view", "purchase")) ++
        (14L to 18L).flatMap(i => u(i, "purchase", "purchase")) ++
        (19L to 33L).flatMap(i => u(i, "view", "view")) ++
        Seq((1, 99L, "purchase", 1.0)) // unpaired
    val out = operators.EventQueries.q349(spark, eventsDir(rows)).head()
    assert(out.getLong(0) === 33L, s"paired population ${out.getLong(0)}")
    assert((out.getLong(1), out.getLong(2), out.getLong(3), out.getLong(4))
      === ((15L, 5L, 10L, 3L)), "contingency cells off the plant")
    // (10-3)^2/13 = 3.769 < 3.8415 -> consistent, by 10^4-exact margin
    assert(out.getString(6) === "consistent")
    assert(out.getLong(5) === (49L * 1000000L) / 13L)
  }

  /** lineitem fixture with EXPLICIT order membership (the co-purchase
    * edge source): rows (orderkey, partkey). */
  private def orderPartsDir(rows: Seq[(Long, Long)]): String = {
    val dir = Files.createTempDirectory("planted-op")
    rows.toDF("l_orderkey", "l_partkey")
      .withColumn("l_suppkey", $"l_partkey")
      .withColumn("l_quantity", lit(1.0))
      .withColumn("l_extendedprice", lit(10.0))
      .withColumn("l_discount", lit(0.0))
      .withColumn("l_tax", lit(0.0))
      .withColumn("l_shipdate", timestamp_micros(lit(86400000000L)))
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("lineitem.parquet").toString)
    dir.toString
  }

  test("q350 reads a perfect star as assortativity exactly -1; a clique as degenerate") {
    // star: 8 two-part orders {hub=0, leaf i} — every edge joins the
    // degree-8 hub to a degree-1 leaf, the textbook r = -1 case
    val star = (1L to 8L).flatMap(i => Seq((i, 0L), (i, i)))
    val out = operators.GraphQueries.q350(spark, orderPartsDir(star)).head()
    assert(out.getLong(0) === 8L)
    assert(out.getDouble(1) === -1.0, s"star r = ${out.getDouble(1)}")
    // clique: one order with 5 parts — all degrees equal, zero
    // variance, the degenerate case is reported as NO row, not NaN
    val clique = (1L to 5L).map(p => (100L, p))
    assert(operators.GraphQueries.q350(spark, orderPartsDir(clique)).count() === 0L)
  }

  test("q312 reads the planted period-2 oscillation exactly") {
    // 40 days alternating 10.00 / 30.00: centered values c_t = ±40000
    // alternate sign, so acf_k = ±(n−k)/n exactly on the micro grid
    val d = ordersDir(1 to 40, d => if (d % 2 == 1) 10.0 else 30.0)
    val acf = operators.EventQueries.q312(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(acf(1L) === -975000L, s"lag-1 ${acf(1L)}") // −39/40
    assert(acf(2L) === 950000L, s"lag-2 ${acf(2L)}")  // +38/40
    assert(acf(7L) === -825000L, s"lag-7 ${acf(7L)}") // −33/40
  }

  test("q320 is quiet on a constant series and matches a sequential " +
    "reference fold on a planted step") {
    val flat = operators.EventQueries.q320(spark,
      ordersDir(1 to 30, _ => 50.0)).collect()
    flat.foreach { r =>
      assert(r.getLong(2) === 0L, "alarm on a constant series")
      assert(r.getLong(4) === 0L, "nonzero CUSUM on a constant series")
    }
    // step: 30 days at 121.00, then 10 at 200.00 — replay the exact
    // integer calibration + clamped fold sequentially as the reference
    val cents = (1 to 40).map(d => if (d <= 30) 12100L else 20000L)
    val n = cents.size; val mu = cents.sum / n
    val mad = cents.map(x => math.abs(x - mu)).sum / n
    val (k, h) = (mad / 2, 5 * mad)
    def chart(delta: Long => Long): (Long, Option[Long], Long) = {
      var bal = 0L; var nAl = 0L; var first = Option.empty[Long]; var mx = 0L
      for (d <- 1 to 40) {
        bal = math.max(bal + delta(cents(d - 1)), 0L)
        mx = math.max(mx, bal)
        if (bal > h) { nAl += 1; if (first.isEmpty) first = Some(d.toLong) }
      }
      (nAl, first, mx)
    }
    val expUp = chart(x => x - mu - k)
    val expDn = chart(x => mu - x - k)
    val out = operators.EventQueries.q320(spark,
        ordersDir(1 to 40, d => if (d <= 30) 121.0 else 200.0))
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)),
          r.getLong(4))).toMap
    assert(out("up") === expUp, s"up ${out("up")} vs $expUp")
    assert(out("down") === expDn, s"down ${out("down")} vs $expDn")
    assert(expUp._1 > 0L, "the planted step must trip the up chart")
  }

  test("q313 recovers exactly the planted perturbed twins") {
    // 10 docs, pairwise-disjoint vocabularies → the only candidate
    // pairs are each doc with its deterministic twin
    val docs = (0L until 10L).map { i =>
      val words = (0 until 8).map(w => s"w${i}_$w").mkString(" ")
      (i, words, "en", "srcA", words.length.toLong)
    }
    val out = operators.IndexingQueries.q313(spark, documentsDir(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length === 10, s"${out.length} pairs, planted 10")
    out.foreach { case (a, b, dist) =>
      assert(b === a + 1000000L, s"unplanted pair ($a, $b)")
      val expected = if (a % 2 == 0) 2L else 1L // 'xy' vs 'x' suffix
      assert(dist === expected, s"pair ($a, $b) dist $dist")
    }
  }

  test("q314 scores perfect retrieval at exactly MAP = 1") {
    // one-hot label directions: same-label sim 1, cross-label 0
    def oneHot(dim: Int): Seq[Float] =
      Seq.tabulate(64)(i => if (i == dim) 1f else 0f)
    val rows = for (lbl <- 0 until 3; i <- 0 until 20)
      yield ((lbl * 20 + i).toLong, oneHot(lbl), lbl)
    val out = operators.SimilarityQueries.q314(spark, embeddingsDir(rows))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.length === 3)
    out.foreach { case (lbl, nq, map) =>
      assert(nq === 4L, s"label $lbl: $nq queries")
      assert(map === 1000000L, s"label $lbl: MAP $map, not 1.0")
    }
  }

  test("q315 reads identical and flipped centroids as cos ±1") {
    def axis(dim: Int, sign: Float): Seq[Float] =
      Seq.tabulate(64)(i => if (i == dim) sign else 0f)
    val stable = (0L until 4L).map(i => (i, axis(1, 1f), 0))
    val flipped = (10L until 14L).map(i =>
      (i, axis(2, if (i % 2 == 0) 1f else -1f), 1))
    val out = operators.SimilarityQueries.q315(spark,
        embeddingsDir(stable ++ flipped))
      .collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
    assert(out(0) === 1.0, s"stable label cos ${out(0)}")
    assert(out(1) === -1.0, s"flipped label cos ${out(1)}")
  }

  test("q316 estimates the planted duplicate population exactly at J=1") {
    // 4 exact-dup pairs: J=1 pairs are captured by BOTH schemes with
    // certainty, so n1 = n2 = m = 4 and Chapman = (5·5) div 5 − 1 = 4
    val docs = (0L until 8L).map { i =>
      val pair = i / 2
      val words = (0 until 10).map(w => s"p${pair}_t$w").mkString(" ")
      (i, words, "en", "srcA", words.length.toLong)
    }
    val r = operators.DedupQueries.q316(spark, documentsDir(docs))
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((4L, 4L, 4L)))
    assert(r.getLong(3) === 4L, s"chapman ${r.getLong(3)}")
    assert(r.getLong(4) === 4L)
  }

  test("q317 jackknife pins the outlier source and the exact SE") {
    // sources A,B at 100 chars/doc, C at 400: θ̂ = 200e6 micro,
    // θ_(C) = 100e6, θ_(A) = θ_(B) = 250e6, SE = sqrt(1e16) = 1e8
    val docs = (0 until 30).map { i =>
      val src = Seq("srcA", "srcB", "srcC")(i / 10)
      val chars = if (src == "srcC") 400L else 100L
      (i.toLong, "t", "en", src, chars)
    }
    val out = operators.GovernanceQueries.q317(spark, documentsDir(docs))
      .collect().map(r => (r.getString(0),
        (r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(out("srcC") === ((100000000L, 200000000L, 1.0e8)))
    assert(out("srcA") === ((250000000L, 200000000L, 1.0e8)))
  }

  test("q323 splits bridged cliques that CC would merge") {
    // two 5-cliques joined by a single bridge edge (5—11): one
    // connected component, but LPA's neighbor majority confines each
    // clique to its own label (traced by hand: A → 1, B → 11)
    val dir = Files.createTempDirectory("planted-li")
    val rows =
      (1L to 5L).map(p => (1L, p)) ++
        (11L to 15L).map(p => (2L, p)) ++
        Seq((3L, 5L), (3L, 11L))
    rows.toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("lineitem.parquet").toString)
    val out = operators.GraphQueries.q323(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out === Map(1L -> 5L, 11L -> 5L),
      s"communities $out, planted {1: 5, 11: 5}")
  }

  test("q324/q325 read a perfectly reversed ranking as exactly -1") {
    // 10 parts: revenue strictly increases with part key, quantity
    // strictly decreases — Spearman and Kendall both exactly −1
    val dir = Files.createTempDirectory("planted-rk")
    (1L to 10L).map(p => (p, p.toDouble, 0.0, (11 - p)))
      .toDF("l_partkey", "l_extendedprice", "l_discount", "l_quantity")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("lineitem.parquet").toString)
    val sp = operators.Relational.q324(spark, dir.toString).collect().head
    assert(sp.getLong(2) === -1000000L, s"spearman ${sp.getLong(2)}")
    val kt = operators.Relational.q325(spark, dir.toString).collect().head
    assert(kt.getLong(1) === 0L, s"concordant ${kt.getLong(1)}")
    assert(kt.getLong(3) === -1000000L, s"tau ${kt.getLong(3)}")
  }

  /** lineitem.parquet fixture: (partkey, epoch-day, qty, line total,
    * discount 0) rows at noon UTC. */
  private def lineitemDir(
      rows: Seq[(Long, Int, Long, Double)],
      partBrands: Seq[(Long, String)] = Nil): String = {
    val dir = Files.createTempDirectory("planted-li2")
    rows.map { case (p, day, q, ext) => (p, day.toLong, q.toDouble, ext) }
      .toDF("l_partkey", "day", "l_quantity", "l_extendedprice")
      .withColumn("l_shipdate", timestamp_micros(
        ($"day" * 86400L + 43200L) * 1000000L))
      .withColumn("l_discount", lit(0.0))
      .select($"l_partkey", $"l_shipdate", $"l_quantity",
        $"l_extendedprice", $"l_discount")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("lineitem.parquet").toString)
    if (partBrands.nonEmpty)
      partBrands.toDF("p_partkey", "p_brand")
        .coalesce(1).write.mode("overwrite")
        .parquet(dir.resolve("part.parquet").toString)
    dir.toString
  }

  test("q326 weighted median lands on the heavy item") {
    // brand B1: qty-weighted prices 1.00×1, 2.00×1, 3.00×10 → W=12,
    // ceil(W/2)=6 falls inside the 3.00 mass
    val d = lineitemDir(
      Seq((1L, 1, 1L, 1.0), (2L, 1, 1L, 2.0), (3L, 1, 10L, 3.0)),
      partBrands = Seq((1L, "B1"), (2L, "B1"), (3L, "B1")))
    val r = operators.ScaleQueries.q326(spark, d).collect().head
    assert(r.getLong(1) === 12L)
    assert(r.getLong(2) === 300L, s"median ${r.getLong(2)} cents, planted 300")
  }

  test("q326 matches a brute-force weighted median on random data") {
    // differential check of the prefix+ceil selection rule: expand
    // every (price, qty) cell to qty unit rows, take the lower median
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 3) {
      val brands = Seq("BA", "BB", "BC")
      val rows = for {
        (b, bi) <- brands.zipWithIndex
        i <- 1 to 20
      } yield ((bi * 100 + i).toLong, 1 + rnd.nextInt(5),
        (1 + rnd.nextInt(9)).toLong, (1 + rnd.nextInt(50)).toDouble)
      val parts = rows.map(r => (r._1, brands((r._1 / 100).toInt)))
      val d = lineitemDir(rows, partBrands = parts)
      val got = operators.ScaleQueries.q326(spark, d)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      val want = rows.groupBy(r => brands((r._1 / 100).toInt))
        .map { case (b, rs) =>
          val units = rs.flatMap(r =>
            Seq.fill(r._3.toInt)(math.floor(r._4 * 100 + 0.5).toLong))
            .sorted
          b -> units((units.size + 1) / 2 - 1) // lower median, 1-based ceil
        }
      assert(got === want, s"trial $trial")
    }
  }

  test("q327 reads a one-part swap as 19/21 Jaccard") {
    // Jan top-20 = parts 1..20; Feb replaces part 20 with part 21
    val jan = (1L to 20L).map(p => (p, 15, 1L, (100 - p).toDouble))
    val feb = ((1L to 19L) :+ 21L).map(p => (p, 46, 1L, (100 - p).toDouble))
    val out = operators.ScaleQueries.q327(spark, lineitemDir(jan ++ feb))
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(0) === 197002L || r.getLong(0) === 197002L,
      s"ym ${r.getLong(0)}") // 1970-02 from epoch-day grid
    assert(r.getLong(1) === 19L && r.getLong(2) === 1L,
      s"common ${r.getLong(1)} new ${r.getLong(2)}")
    assert(r.getLong(3) === 904761L, s"jaccard ${r.getLong(3)}")
  }

  test("q328 RMST of a fully-censored cohort is exactly tau") {
    // every user spans the whole window → no churn events → S ≡ 1
    val rows = (1L to 10L).flatMap(u =>
      Seq((1, u, "purchase", 1.0), (21, u, "purchase", 1.0)))
    val r = operators.EventQueries.q328(spark, eventsDir(rows))
      .collect().head
    assert(r.getLong(0) === 10L, s"tau ${r.getLong(0)}")
    assert(r.getLong(1) === 10000000L, s"rmst ${r.getLong(1)}")
    assert(r.getLong(2) === 1000000L)
  }

  test("q330 classes constant demand X/A and spiky demand Z/C") {
    // part 1: 10 flat days, 70% of revenue → (A, X);
    // part 2: 9 quiet days + one 100-unit spike, 30% → (C, Z)
    val rows =
      (1 to 10).map(day => (1L, day, 10L, 700.0)) ++
        (1 to 9).map(day => (2L, day, 1L, 3.0)) :+ (2L, 10, 100L, 2973.0)
    val out = operators.Relational.q330(spark, lineitemDir(rows))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(out === Map(("A", "X") -> 1L, ("C", "Z") -> 1L), s"matrix $out")
  }

  test("drift lenses read two identical sources as their null values") {
    // srcA and srcB carry the SAME n_chars distribution, so each
    // source vs its complement must sit exactly at the null: KS 0,
    // CvM 0, W1 0, AUC ½ — the formula-encoding class of bug (both
    // engines computing the same wrong statistic) that oracle
    // equality cannot catch
    val dir = documentsDir(for {
      (src, off) <- Seq(("srcA", 0L), ("srcB", 100L))
      v <- 100L to 109L; rep <- 1 to 2
    } yield (off + v * 2 + rep, "t", "en", src, v))
    val ks = operators.GovernanceQueries.q181(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(ks === Map("srcA" -> 0.0, "srcB" -> 0.0), s"ks $ks")
    val cvm = operators.GovernanceQueries.q292(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(cvm === Map("srcA" -> 0L, "srcB" -> 0L), s"cvm $cvm")
    val w1 = operators.GovernanceQueries.q301(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(w1 === Map("srcA" -> 0L, "srcB" -> 0L), s"w1 $w1")
    val auc = operators.GovernanceQueries.q254(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(auc === Map("srcA" -> 0.5, "srcB" -> 0.5), s"auc $auc")
  }

  test("q274 reads a planted linear trend as exactly its slope") {
    // purchase count on day d is 2d → every pairwise slope is 2
    val rows = for (d <- 1 to 8; i <- 1 to 2 * d)
      yield (d, (d * 100 + i).toLong, "purchase", 1.0)
    val r = operators.EventQueries.q274(spark, eventsDir(rows))
      .collect().head
    assert(r.getDouble(5) === 2.0, s"slope ${r.getDouble(5)}")
    assert(r.getLong(3) === 2L * r.getLong(4),
      s"med_dy ${r.getLong(3)} != 2·med_dx ${r.getLong(4)}")
  }

  test("q265 credits the only channel on the converting path") {
    // converters: click → purchase; non-converters: view → (end).
    // Removing click kills every conversion; removing view none.
    val rows =
      (1L to 10L).flatMap(u => Seq((1, u, "click", 0.0), (2, u, "purchase", 1.0))) ++
        (11L to 20L).map(u => (1, u, "view", 0.0))
    val out = operators.EventQueries.q265(spark, eventsDir(rows))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(3)))
      .toMap
    assert(out("click") === ((500000L, 500000L)),
      s"click ${out("click")}") // base ½, all of it via click
    assert(out("view")._2 === 0L, s"view effect ${out("view")._2}")
  }

  test("q281 DiD is exactly zero when nothing changed") {
    // every user buys 10.00 in both periods — whatever the salted arm
    // split, all four cell means are equal and the DiD estimate must
    // be exactly 0 (integer cell means, no truncation residue)
    val rows = (1L to 20L).flatMap(u =>
      Seq((1, u, "purchase", 10.0), (11, u, "purchase", 10.0)))
    val out = operators.AssociationQueries.q281(spark, eventsDir(rows))
      .collect()
    assert(out.length === 4, s"${out.length} cells (an arm is empty?)")
    out.foreach { r =>
      assert(r.getLong(4) === 1000000000L,
        s"cell (${r.getInt(0)},${r.getLong(1)}) mean ${r.getLong(4)}")
      assert(r.getLong(5) === 0L, s"did ${r.getLong(5)}")
    }
  }

  test("q332 flags the homogeneous class and passes the mirrored one") {
    // global = 30 en / 20 fr; the two mixed sources sit 0.1 from it
    // (no leak at t=0.2), the all-en source exactly 0.4 (leak)
    val docs =
      (for (src <- Seq("mix1", "mix2"); i <- 1 to 20) yield {
        val lang = if (i <= 10) "en" else "fr"
        (src.hashCode.toLong * 100 + i, "t", lang, src, 120L)
      }) ++ (1 to 10).map(i => (9000L + i, "t", "en", "pure", 120L))
    val out = operators.GovernanceQueries.q332(spark, documentsDir(docs))
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getInt(4)))
      .toMap
    assert(out("mix1") === ((100000L, 0)), s"mix1 ${out("mix1")}")
    assert(out("mix2") === ((100000L, 0)), s"mix2 ${out("mix2")}")
    assert(out("pure") === ((400000L, 1)), s"pure ${out("pure")}")
  }

  test("q333 places one planted part in each demand quadrant") {
    val rows =
      (1 to 10).map(day => (1L, day, 5L, 5.0)) ++                 // smooth
        Seq(1, 6, 11, 16, 21).map(day => (2L, day, 5L, 5.0)) ++   // intermittent
        ((1 to 9).map(day => (3L, day, 1L, 1.0)) :+ (3L, 10, 100L, 100.0)) ++ // erratic
        (Seq(1, 11, 21).map(day => (4L, day, 1L, 1.0)) :+ (4L, 31, 100L, 100.0)) ++ // lumpy
        Seq((5L, 1, 7L, 7.0))                                     // single
    val out = operators.Relational.q333(spark, lineitemDir(rows))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("smooth" -> 1L, "intermittent" -> 1L,
      "erratic" -> 1L, "lumpy" -> 1L, "single" -> 1L), s"quadrants $out")
  }

  test("q334 reads identical sources as H = 0 and separation exactly") {
    // identical: every rank sum is exactly proportional → H ≡ 0
    val same = for (src <- Seq("sA", "sB"); v <- 100L to 119L)
      yield (src.hashCode.toLong * 1000 + v, "t", "en", src, v)
    val h0 = operators.GovernanceQueries.q334(spark, documentsDir(same))
      .collect().head
    assert(h0.getLong(2) === 0L, s"H ${h0.getLong(2)} on identical sources")
    assert(h0.getInt(5) === 0)
    // complete separation, 10 vs 10, no ties: H = 12/(N(N+1))·ΣR²/n
    // − 3(N+1) = 14.285714 exactly at the micro truncation
    val sep = (100L to 109L).map(v => (v, "t", "en", "lo", v)) ++
      (200L to 209L).map(v => (v, "t", "en", "hi", v))
    val h1 = operators.GovernanceQueries.q334(spark, documentsDir(sep))
      .collect().head
    assert(h1.getLong(2) === 14285714L, s"H ${h1.getLong(2)}")
    assert(h1.getLong(3) === 1000000L, "tie correction on tie-free data")
  }

  test("q309 reads a symmetric two-point distribution exactly") {
    // values alternate 0/2: skewness exactly 0, kurtosis exactly 1
    val rows = (1 to 20).map(i =>
      (i, i.toLong, "m", if (i % 2 == 0) 2.0 else 0.0))
    val r = operators.EventQueries.q309(spark, eventsDir(rows))
      .collect().head
    assert(r.getDouble(2) === 0.0, s"skewness ${r.getDouble(2)}")
    assert(r.getLong(3) === 1000000L, s"kurtosis ${r.getLong(3)}")
    assert(r.getLong(4) === -2000000L)
  }

  test("q287 reads a constant power-of-two series as zero energy") {
    // 16 flat days (no zero padding): every Haar detail is 0
    val rows = (1 to 16).map(d => (d, d.toLong, "purchase", 25.0))
    val out = operators.EventQueries.q287(spark, eventsDir(rows)).collect()
    assert(out.length === 4)
    out.foreach(r => assert(r.getLong(2) === 0L,
      s"level ${r.getInt(0)} energy ${r.getLong(2)}"))
  }

  test("q338 flags a planted transitive chain as diluted") {
    // A~B and B~C are near dups (shifted 10-word windows over a
    // 14-word sequence), but A and C share too little: CC chains all
    // three into one cluster whose min pairwise Jaccard is sub-0.6.
    // Token prefix "w" is PINNED so the 2×3 md5 banding surfaces both
    // chain edges (J≈0.67 pairs band-collide with p≈0.45 per edge —
    // the fixture is searched, then frozen; md5 makes it stable).
    val words = (1 to 14).map(i => s"w$i")
    def span(from: Int): String = words.slice(from, from + 10).mkString(" ")
    val docs = Seq(
      (1L, span(0), "en", "s", 10L),
      (2L, span(2), "en", "s", 10L),
      (3L, span(4), "en", "s", 10L),
      // far-field docs so the corpus isn't degenerate
      (10L, (100 to 112).map(i => s"zzz$i").mkString(" "), "en", "s", 10L))
    val out = operators.DedupQueries.q338(spark, documentsDir(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(4)))
    assert(out.length === 1, s"clusters ${out.toSeq}")
    val (cluster, nm, np, diluted) = out.head
    assert(cluster === 1L && nm === 3L && np === 3L,
      s"cluster shape ${out.head}")
    assert(diluted === 1, "the A~B~C chain must read as diluted")
  }

  test("q339 rescues the chained-only member") {
    // same pinned chain as the q338 gate: CC deletes B and C, but C
    // never matched the kept representative A — verified policy
    // rescues exactly it
    val words = (1 to 14).map(i => s"w$i")
    def span(from: Int): String = words.slice(from, from + 10).mkString(" ")
    val docs = Seq(
      (1L, span(0), "en", "s", 10L),
      (2L, span(2), "en", "s", 10L),
      (3L, span(4), "en", "s", 10L),
      (10L, (100 to 112).map(i => s"zzz$i").mkString(" "), "en", "s", 10L))
    val r = operators.DedupQueries.q339(spark, documentsDir(docs))
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === ((1L, 2L, 1L, 1L)), s"policies $r")
  }

  /** orders fixture with per-row priority: (day, priority, dollars). */
  private def ordersPrioDir(rows: Seq[(Int, String, Double)]): String = {
    val dir = Files.createTempDirectory("planted-ordp")
    rows.zipWithIndex
      .map { case ((d, p, v), i) => (i.toLong, d.toLong, p, v) }
      .toDF("o_orderkey", "day", "o_orderpriority", "o_totalprice")
      .withColumn("o_orderdate", timestamp_micros(
        ($"day" * 86400L + 43200L) * 1000000L))
      .select($"o_orderkey", $"o_orderdate", $"o_orderpriority", $"o_totalprice")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("orders.parquet").toString)
    dir.toString
  }

  test("q351 reads perfectly consistent blocks as Q = 2n exactly, " +
    "drops incomplete blocks, and is null on alternating ranks") {
    // 4 complete months (days 5/40/70/100), C > B > A in every one,
    // plus an INCOMPLETE May block (B and C only) that must be dropped:
    // k=3, n=4 -> R = (4, 8, 12), Q = 2n = 8 exactly, df=2 crit 5.99
    val consistent = Seq(5, 40, 70, 100).flatMap(d =>
      Seq((d, "A", 10.0), (d, "B", 20.0), (d, "C", 30.0))) ++
      Seq((130, "B", 20.0), (130, "C", 30.0))
    val out = operators.GovernanceQueries.q351(spark, ordersPrioDir(consistent))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))).toMap
    assert(out("A") === ((4L, 4L, 8000000L, 1)), s"A ${out("A")}")
    assert(out("B") === ((8L, 4L, 8000000L, 1)))
    assert(out("C") === ((12L, 4L, 8000000L, 1)))
    // alternating ranks: A and B swap winners 2-2 -> equal rank sums,
    // Q exactly 0, accept
    val alt = Seq(5, 40).flatMap(d => Seq((d, "A", 10.0), (d, "B", 20.0))) ++
      Seq(70, 100).flatMap(d => Seq((d, "A", 20.0), (d, "B", 10.0)))
    val nul = operators.GovernanceQueries.q351(spark, ordersPrioDir(alt))
      .collect().map(r => (r.getLong(3), r.getInt(4)))
    assert(nul.forall(_ === ((0L, 0))), s"null case $nul")
  }

  test("q352 scores the planted wedge pairs exactly and mutes the " +
    "over-cap hub") {
    // parts 1,2 share intermediaries 10 and 11 (deg 2 each):
    // RA(1,2) = 2 * 1/2 -> 1000000 micro, cn=2; symmetrically
    // (10,11) via {1,2}. Hub 100 sits in 66 two-part orders -> deg 66
    // > 64: its leaf pairs must receive NO score at all.
    val wedge = Seq((1L, 1L), (1L, 10L), (2L, 2L), (2L, 10L),
      (3L, 1L), (3L, 11L), (4L, 2L), (4L, 11L))
    val hub = (0 until 66).flatMap(i =>
      Seq((100L + i, 100L), (100L + i, 200L + i)))
    val out = operators.GraphQueries.q352(spark, orderPartsDir(wedge ++ hub))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((1L, 2L, 2L, 1000000L), (10L, 11L, 2L, 1000000L)),
      s"scored pairs ${out.toSeq}")
  }

  test("q353 reads the planted triangle/clique/path spectrum exactly") {
    // day 1: {1,2,3} triangle; day 2: {4,5,6,7} K4; days 3-4: path
    // 8-9-10 (deg(9)=2, no triangle; endpoints deg 1 are excluded)
    val rows =
      Seq(1L, 2L, 3L).map(u => (1, u, "view", 1.0)) ++
        Seq(4L, 5L, 6L, 7L).map(u => (2, u, "view", 1.0)) ++
        Seq(8L, 9L).map(u => (3, u, "view", 1.0)) ++
        Seq(9L, 10L).map(u => (4, u, "view", 1.0))
    val out = operators.GraphQueries.q353(spark, eventsDir(rows))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // degree 2: triangle corners (tri=1 each) + path middle (tri=0)
    assert(out(2L) === ((4L, 3L, 0.75)), s"deg-2 ${out(2L)}")
    // degree 3: the K4, every corner in 3 triangles, c = 1.0
    assert(out(3L) === ((4L, 12L, 1.0)), s"deg-3 ${out(3L)}")
    assert(out.size === 2, s"unexpected degree classes ${out.keySet}")
  }

  test("q354 counts the planted referential violations exactly, " +
    "including the spurious small-domain IND that holds by accident") {
    val dir = Files.createTempDirectory("planted-ind")
    def w(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      df.coalesce(1).write.mode("overwrite")
        .parquet(dir.resolve(s"$name.parquet").toString)
    w("nation", Seq(0, 1, 2, 3).toDF("n_nationkey"))
    w("customer", Seq((10L, 0), (11L, 1), (12L, 9)).toDF("c_custkey", "c_nationkey"))
    w("supplier", Seq((20L, 0), (21L, 3)).toDF("s_suppkey", "s_nationkey"))
    w("part", Seq((30L, 5), (31L, 99)).toDF("p_partkey", "p_size"))
    w("orders", Seq((100L, 10L), (101L, 10L), (102L, 77L)).toDF("o_orderkey", "o_custkey"))
    w("lineitem", Seq((100L, 30L, 20L, 1), (101L, 30L, 21L, 2), (999L, 30L, 20L, 1))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"))
    val out = operators.Profile.q354(spark, dir.toString)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getInt(4)))
    val expected = Seq(
      ("customer.c_custkey", 3L, 2L, 0),    // 11, 12 never order
      ("customer.c_nationkey", 3L, 1L, 0),  // nation 9 unknown
      ("lineitem.l_linenumber", 2L, 0L, 1), // SPURIOUS: {1,2} fits {0..3}
      ("lineitem.l_orderkey", 3L, 1L, 0),   // orphan line 999
      ("lineitem.l_partkey", 1L, 0L, 1),
      ("lineitem.l_suppkey", 2L, 0L, 1),
      ("orders.o_custkey", 2L, 1L, 0),      // ghost customer 77
      ("orders.o_orderkey", 3L, 1L, 0),     // order 102 has no lines
      ("part.p_partkey", 2L, 1L, 0),        // part 31 never sold
      ("part.p_size", 2L, 2L, 0),           // cross-domain candidate fails
      ("supplier.s_nationkey", 2L, 0L, 1))
    assert(out.toSeq === expected, s"IND report ${out.toSeq}")
  }

  test("q355 matches a sequential BigInt delta-method fold on planted " +
    "per-user data") {
    // arms follow the engine's salted-md5 parity — recompute it here
    // (pure JDK) so the plant controls each arm's value distribution
    def isControl(id: Long): Boolean = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id#exp1".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 2 == 0
    }
    // per user: one purchase of (base + id%3) dollars + two views ->
    // n_i = 3, x_i = 100*(base + id%3); treatment base is 2x control's
    val ids = (1L to 40L)
    val rows = ids.flatMap { id =>
      val base = if (isControl(id)) 10.0 else 20.0
      Seq((1, id, "purchase", base + (id % 3)),
        (2, id, "view", 0.0), (3, id, "view", 0.0))
    }
    // sequential reference fold (BigInt, the same stated truncations)
    def ref(arm: Seq[Long]): (BigInt, BigInt) = { // (ratio_micro, se2_e10)
      val xs = arm.map(id => BigInt(100) * (BigInt(if (isControl(id)) 10 else 20) + id % 3))
      val u = BigInt(xs.size); val sn = u * 3; val sx = xs.sum
      val sxx = xs.map(x => x * x).sum; val sxn = xs.map(_ * 3).sum
      val snn = u * 9
      val num = sn * sn * (u * sxx - sx * sx) -
        2 * sx * sn * (u * sxn - sx * sn) + sx * sx * (u * snn - sn * sn)
      val t1 = num / ((u - 1) * sn * sn)
      (sx * 1000000 / sn, t1 * BigInt(10000000000L) / (sn * sn))
    }
    val (ctl, trt) = ids.partition(isControl)
    val out = operators.AssociationQueries.q355(spark, eventsDir(rows))
      .collect().map(r => r.getString(0) ->
        (r.getLong(4), r.getLong(5), r.getInt(6))).toMap
    val (rc, sc) = ref(ctl); val (rt, st) = ref(trt)
    assert(out("control")._1 === rc.toLong && out("control")._2 === sc.toLong,
      s"control ${out("control")} vs ref ($rc, $sc)")
    assert(out("treatment")._1 === rt.toLong && out("treatment")._2 === st.toLong,
      s"treatment ${out("treatment")} vs ref ($rt, $st)")
    // the planted 2x effect must be detected
    val expectReject =
      if (BigInt(100) * (rt - rc) * (rt - rc) > BigInt(38416) * (st + sc)) 1 else 0
    assert(out("control")._3 === expectReject && expectReject === 1,
      s"verdict ${out("control")._3}")
  }

  test("q356 scores the planted target-word mixtures exactly") {
    // vocab {tea, kaffee}: cg(tea)=5 ct(tea)=4, cg(kaffee)=3 ct=0,
    // V=2, Ng=8, Nt=4 -> lr(tea) = 5*10*1e6 div (6*6) = 1388888,
    // lr(kaffee) = 1*10*1e6 div (4*6) = 416666; doc scores are exact
    // truncating means of those micro-LRs
    val docs = Seq(
      (1L, "tea tea", "en", "s", 7L),
      (2L, "tea tea", "en", "s", 7L),
      (3L, "kaffee kaffee", "de", "s", 13L),
      (4L, "tea kaffee", "de", "s", 10L))
    val out = operators.CurationQueries.q356(spark, documentsDir(docs))
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(out.toSeq === Seq((1L, 1388888L), (2L, 1388888L),
      (4L, 902777L), (3L, 416666L)), s"scores ${out.toSeq}")
  }

  test("q357 finds the planted 3-day click->purchase lead exactly") {
    // clicks spike day 10, purchases spike day 13, base 1/day over
    // days 1..20: at lag +3 the overlapping windows are IDENTICAL
    // vectors -> r = 1.0 exactly; every other lag is strictly below
    val rows = (1 to 20).flatMap { d =>
      val clicks = Seq.fill(if (d == 10) 5 else 1)((d, d.toLong, "click", 0.0))
      val buys = Seq.fill(if (d == 13) 5 else 1)((d, 1000L + d, "purchase", 1.0))
      clicks ++ buys
    }
    val out = operators.EventQueries.q357(spark, eventsDir(rows))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
    assert(out.length === 15, s"lag grid ${out.map(_._1).toSeq}")
    val byLag = out.map(t => t._1 -> t._3).toMap
    assert(byLag(3L) === 1.0, s"lag-3 r = ${byLag(3L)}")
    assert(out.find(_._1 == 3L).get._2 === 17L)
    out.filter(_._1 != 3L).foreach { case (l, _, r) =>
      assert(r.isNaN || r < 1.0, s"lag $l ties the planted lead") }
  }

  /** lineitem fixture for price indexes: (day, partkey, extprice, qty). */
  private def priceLinesDir(rows: Seq[(Int, Long, Double, Double)]): String = {
    val dir = Files.createTempDirectory("planted-px")
    rows.zipWithIndex.map { case ((d, p, ep, q), i) =>
      (i.toLong, d.toLong, p, ep, q) }
      .toDF("l_orderkey", "day", "l_partkey", "l_extendedprice", "l_quantity")
      .withColumn("l_shipdate", timestamp_micros(
        ($"day" * 86400L + 43200L) * 1000000L))
      .select($"l_orderkey", $"l_partkey", $"l_extendedprice",
        $"l_quantity", $"l_shipdate")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("lineitem.parquet").toString)
    dir.toString
  }

  test("q358 prices the planted basket shift exactly (L=1.1, P=0.875)") {
    // Jan: A 1.00/unit x2, B 3.00/unit x1; Feb: A 2.00/unit x2 (2x),
    // B 1.50/unit x2 (half) -> Laspeyres 5.5/5.0, Paasche 7/8
    val rows = Seq(
      (5, 1L, 2.00, 2.0), (5, 2L, 3.00, 1.0),
      (35, 1L, 4.00, 2.0), (35, 2L, 3.00, 2.0))
    val out = operators.Relational.q358(spark, priceLinesDir(rows)).collect()
    assert(out.length === 1, s"${out.toSeq}")
    val r = out.head
    assert((r.getInt(0), r.getInt(1), r.getLong(2)) === ((1970, 2, 2)))
    assert(r.getLong(3) === 1100000L, s"laspeyres ${r.getLong(3)}")
    assert(r.getLong(4) === 875000L, s"paasche ${r.getLong(4)}")
    val fisher = math.floor(math.sqrt(1.1 * 0.875) * 1000000 + 0.5) / 1000000
    assert(r.getDouble(5) === fisher, s"fisher ${r.getDouble(5)}")
  }

  /** orders fixture with priority AND status: (priority, status). */
  private def ordersStatusDir(rows: Seq[(String, String)]): String = {
    val dir = Files.createTempDirectory("planted-ords")
    rows.zipWithIndex.map { case ((p, st), i) => (i.toLong, p, st) }
      .toDF("o_orderkey", "o_orderpriority", "o_orderstatus")
      .withColumn("o_orderdate", timestamp_micros(lit(86400000000L)))
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("orders.parquet").toString)
    dir.toString
  }

  test("q359 detects the planted monotone dose-response and is null-" +
    "safe on a flat table") {
    // rates 1/10, 3/10, 5/10, 7/10, 9/10 across w = 1..5:
    // T = N*Swr - R*Swn = 50*95 - 25*150 = 1000, V = 50*550 - 150^2 = 5000,
    // Z^2 = T^2 N^2 / (R(N-R)V) = 1e6*2500/(25*25*5000) = 800 -> reject
    val trend = (1 to 5).flatMap { w =>
      val p = s"$w-P$w"
      Seq.fill(2 * w - 1)((p, "F")) ++ Seq.fill(10 - (2 * w - 1))((p, "O"))
    }
    val out = operators.GovernanceQueries.q359(spark, ordersStatusDir(trend))
      .collect().map(r => r.getLong(1) ->
        (r.getLong(4), r.getDouble(5), r.getInt(6))).toMap
    assert(out(1L)._1 === 100000L && out(5L)._1 === 900000L)
    assert(out(3L)._2 === 800.0, s"z2 ${out(3L)._2}")
    assert(out.values.forall(_._3 === 1), "trend not rejected")
    // flat rates -> T = 0 exactly, z2 = 0, accept
    val flat = (1 to 5).flatMap { w =>
      Seq.fill(5)((s"$w-P$w", "F")) ++ Seq.fill(5)((s"$w-P$w", "O"))
    }
    val nul = operators.GovernanceQueries.q359(spark, ordersStatusDir(flat))
      .collect().map(r => (r.getDouble(5), r.getInt(6)))
    assert(nul.forall(_ === ((0.0, 0))), s"flat case $nul")
  }

  test("q360 shatters the planted hub-and-spoke under attack") {
    // day i joins {hub 0, leaf 2i-1, leaf 2i}: hub deg 20, leaves
    // deg 2. Top-10 removal takes the hub + leaves 1..9 (id
    // tie-break), leaving pairs (11,12)..(19,20) and isolating 10.
    val rows = (1 to 10).flatMap(i =>
      Seq(0L, 2L * i - 1, 2L * i).map(u => (i, u, "view", 1.0)))
    val out = operators.GraphQueries.q360(spark, eventsDir(rows))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("full") === ((21L, 30L, 1L, 21L)), s"full ${out("full")}")
    assert(out("attacked") === ((10L, 5L, 5L, 2L)),
      s"attacked ${out("attacked")}")
  }

  test("q361 reads the planted style twins at Delta exactly 0 and the " +
    "outlier at the hand-computed milli distance") {
    // sa and sb share a style (2:1 x:y), sc inverts it; over the
    // 2-word grid: V = 222221777778, sig = 471404, z(sa,x) = 707,
    // z(sc,x) = -1414 -> Delta(sa,sb) = 0, Delta(*,sc) = 2121
    val docs = Seq(
      (1L, "x x y", "en", "sa", 5L),
      (2L, "x x y", "en", "sb", 5L),
      (3L, "y y x", "en", "sc", 5L))
    val out = operators.TextQueries.q361(spark, documentsDir(docs))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(("sa", "sb", 2L, 0L),
      ("sa", "sc", 2L, 2121L), ("sb", "sc", 2L, 2121L)),
      s"deltas ${out.toSeq}")
  }

  /** lineitem+part fixture for association audits:
    * (brand, discount, qty) one line each. */
  private def brandLinesDir(rows: Seq[(String, Double, Double)]): String = {
    val dir = Files.createTempDirectory("planted-bl")
    val brands = rows.map(_._1).distinct.sorted.zipWithIndex.toMap
    rows.zipWithIndex.map { case ((b, disc, q), i) =>
      (i.toLong, brands(b).toLong, disc, q) }
      .toDF("l_orderkey", "l_partkey", "l_discount", "l_quantity")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("lineitem.parquet").toString)
    brands.toSeq.map { case (b, k) => (k.toLong, b) }
      .toDF("p_partkey", "p_brand")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("part.parquet").toString)
    dir.toString
  }

  test("q362 flags the planted aggregation reversal in both brands") {
    // within each brand discount LIFTS quantity (slope +1e6 exactly),
    // but brand A sits at (low disc, high qty) and brand B at (high
    // disc, low qty) -> pooled cov_n = -220: the textbook reversal
    val rows = Seq(
      ("BA", 0.00, 8.0), ("BA", 0.01, 9.0),
      ("BB", 0.08, 1.0), ("BB", 0.09, 2.0))
    val out = operators.AssociationQueries.q362(spark, brandLinesDir(rows))
      .collect().map(r => r.getString(0) ->
        (r.getInt(2), r.getLong(3), r.getInt(4), r.getInt(5))).toMap
    assert(out("BA") === ((1, 1000000L, -1, 1)), s"BA ${out("BA")}")
    assert(out("BB") === ((1, 1000000L, -1, 1)), s"BB ${out("BB")}")
  }

  /** lineitem+part fixture with shipdates for the economics queries:
    * (brand, day, extendedprice, qty). */
  private def elasticityLinesDir(rows: Seq[(String, Int, Double, Double)]): String = {
    val dir = Files.createTempDirectory("planted-el")
    val brands = rows.map(_._1).distinct.sorted.zipWithIndex.toMap
    rows.zipWithIndex.map { case ((b, day, ep, q), i) =>
      (i.toLong, brands(b).toLong, day.toLong, ep, q) }
      .toDF("l_orderkey", "l_partkey", "day", "l_extendedprice", "l_quantity")
      .withColumn("l_shipdate", timestamp_micros(
        ($"day" * 86400L + 43200L) * 1000000L))
      .select($"l_orderkey", $"l_partkey", $"l_extendedprice",
        $"l_quantity", $"l_shipdate")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("lineitem.parquet").toString)
    brands.toSeq.map { case (b, k) => (k.toLong, b) }
      .toDF("p_partkey", "p_brand")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("part.parquet").toString)
    dir.toString
  }

  test("q363 prices the planted demand response at exactly -1/3 and " +
    "gates out the sub-1% price move") {
    // BX: unit price 1.00 -> 2.00, qty 10 -> 8: arc E = -1/3 exactly.
    // BY: price moves 0.4% (< 1% gate) -> no pair survives
    val rows = Seq(
      ("BX", 5, 10.00, 10.0), ("BX", 35, 16.00, 8.0),
      ("BY", 5, 10.00, 10.0), ("BY", 35, 20.08, 20.0))
    val out = operators.Relational.q363(spark, elasticityLinesDir(rows))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(("BX", 1L, -333333L, 1L)), s"${out.toSeq}")
  }

  test("q364 reads a pure weekday effect as eta2 exactly 1e6 / 0") {
    // 4 full weeks, revenue a function of day%7 ONLY: weekday (and
    // cell) explain everything; the single January month explains 0
    val d = ordersDir(1 to 28, day => 100.0 * (day % 7 + 1))
    val out = operators.EventQueries.q364(spark, d)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("weekday") === ((7L, 1000000L)), s"weekday ${out("weekday")}")
    assert(out("cell") === ((7L, 1000000L)), s"cell ${out("cell")}")
    assert(out("month") === ((1L, 0L)), s"month ${out("month")}")
  }

  test("q365 scores the planted two-clique bridge at Q = 357142 exactly") {
    // two 3-cliques joined by one bridge: LPA settles on {1,2,3} /
    // {4,5,6}; m=7, per community m_c=3, d_c=7 ->
    // contrib = (84-49)e6 div 196 = 178571, Q = 357142
    val orders = Seq((1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 4L), (2L, 5L), (2L, 6L), (3L, 3L), (3L, 4L))
    val out = operators.GraphQueries.q365(spark, orderPartsDir(orders))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.length === 2, s"${out.toSeq}")
    assert(out.forall(t => t._2 === 3L && t._3 === 3L && t._4 === 7L
      && t._5 === 178571L && t._6 === 357142L), s"${out.toSeq}")
  }

  test("q366 matches a sequential BigInt mediation fold on a planted " +
    "chain") {
    // x -> m (2x + jitter) -> y (3m + jitter dollars): most of the
    // x->y effect flows through m
    val xs = (1L to 20L).map(i => (i, i % 5 + 1, 2 * (i % 5 + 1) + i % 2))
    val rows = xs.flatMap { case (u, x, m) =>
      val yDollars = 3 * m + u % 3
      Seq.fill(x.toInt)((1, u, "view", 0.0)) ++
        Seq.fill(m.toInt)((2, u, "click", 0.0)) ++
        Seq((3, u, "purchase", yDollars.toDouble))
    }
    // independent BigInt reference with the same stated truncations
    val (us, xv, mv, yv) = (BigInt(20),
      xs.map(t => BigInt(t._2)), xs.map(t => BigInt(t._3)),
      xs.map { case (u, _, m) => BigInt(100) * (3 * m + u % 3) })
    def dot(a: Seq[BigInt], b: Seq[BigInt]) = a.zip(b).map(t => t._1 * t._2).sum
    val (sx, sm, sy) = (xv.sum, mv.sum, yv.sum)
    val cxx = us * dot(xv, xv) - sx * sx; val cxm = us * dot(xv, mv) - sx * sm
    val cmm = us * dot(mv, mv) - sm * sm; val cxy = us * dot(xv, yv) - sx * sy
    val cmy = us * dot(mv, yv) - sm * sy
    val bnum = cmy * cxx - cxy * cxm; val dnum = cxy * cmm - cmy * cxm
    val bden = cmm * cxx - cxm * cxm
    def tdiv(a: BigInt, b: BigInt) = a / b // BigInt / truncates toward zero
    val (a6, b6, c6, d6) = (tdiv(cxm * 1000000, cxx), tdiv(bnum * 1000000, bden),
      tdiv(cxy * 1000000, cxx), tdiv(dnum * 1000000, bden))
    val ind6 = tdiv(a6 * b6, BigInt(1000000))
    val prop6 = tdiv(ind6 * 1000000, c6)
    val r = operators.AssociationQueries.q366(spark, eventsDir(rows)).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)) ===
      ((20L, a6.toLong, b6.toLong, c6.toLong, d6.toLong, ind6.toLong,
        prop6.toLong)), s"got $r want ($a6 $b6 $c6 $d6 $ind6 $prop6)")
    assert(prop6 > 600000L, s"chain plant should be mostly mediated: $prop6")
  }

  test("q367 selects the planted per-arm deciles exactly") {
    def isControl(id: Long): Boolean = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id#exp1".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 2 == 0
    }
    val ids = (1L to 40L)
    def dollars(id: Long): Double =
      if (isControl(id)) 10.0 + id % 7 else 20.0 + 2 * (id % 5)
    val rows = ids.map(id => (1, id, "purchase", dollars(id)))
    // reference: value at 1-based rank ceil(q*U/10) along (y, id)
    def ref(arm: Seq[Long], q: Long): Long = {
      val sorted = arm.map(id => (100L * dollars(id).toLong, id)).sorted
      sorted(((q * arm.size + 9) / 10 - 1).toInt)._1
    }
    val (ctl, trt) = ids.partition(isControl)
    val out = operators.AssociationQueries.q367(spark, eventsDir(rows))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    (1L to 9L).foreach { q =>
      assert(out(q) === ((ref(ctl, q), ref(trt, q))),
        s"decile $q: ${out(q)} vs (${ref(ctl, q)}, ${ref(trt, q)})")
    }
  }

  test("q368 reads the planted bursty arrivals as overdispersed with " +
    "the exact Fano micro") {
    // 2 purchases at noon on 3 consecutive days: 49-hour spine, 3
    // hours of 2, 46 of 0 -> F = 552e6/288 = 1916666 micro
    val rows = (1 to 3).flatMap(d =>
      Seq((d, 10L * d, "purchase", 5.0), (d, 10L * d + 1, "purchase", 5.0)))
    val r = operators.EventQueries.q368(spark, eventsDir(rows)).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((49L, 6L, 1916666L)),
      s"$r")
    val z = math.floor((math.sqrt(2.0 * 552.0 / 6.0) - math.sqrt(95.0))
      * 1000000 + 0.5) / 1000000
    assert(r.getDouble(3) === z && r.getInt(4) === 1, s"$r vs z=$z")
  }

  test("q369 prices the planted encouragement design at LATE exactly " +
    "2000 cents") {
    def isControl(id: Long): Boolean = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id#exp1".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 2 == 0
    }
    // control: no clicks, buy 10.00; treatment: even ids click ("take")
    // and buy 30.00, odd ids don't and buy 10.00 -> whatever the arm
    // sizes, LATE = (3000-1000) cents exactly
    val rows = (1L to 40L).flatMap { id =>
      if (isControl(id)) Seq((1, id, "purchase", 10.0))
      else if (id % 2 == 0)
        Seq((1, id, "click", 0.0), (2, id, "purchase", 30.0))
      else Seq((1, id, "purchase", 10.0))
    }
    val r = operators.AssociationQueries.q369(spark, eventsDir(rows)).head()
    val (ctl, trt) = (1L to 40L).partition(isControl)
    val takers = trt.count(_ % 2 == 0).toLong
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((ctl.size.toLong, trt.size.toLong, 0L, takers)), s"$r")
    assert(r.getLong(8) === 2000L * 1000000L, s"LATE ${r.getLong(8)}")
    assert(r.getInt(7) === 0, "strong planted instrument flagged weak")
  }

  test("q370 reads the planted dispersion poles exactly (D = 1, 0.5, 0)") {
    // 'ev' spreads evenly (D=1), 'pad' covers 2 of 3 sources (D=0.5
    // exactly), 'solo' is single-source (D=0 — Juilland's defining
    // property)
    val docs = Seq(
      (1L, "ev ev solo solo", "en", "sa", 10L),
      (2L, "ev ev pad pad", "en", "sb", 10L),
      (3L, "ev ev pad pad", "en", "sc", 10L))
    val out = operators.TextQueries.q370(spark, documentsDir(docs))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("ev") === 1.0 && out("pad") === 0.5 && out("solo") === 0.0,
      s"dispersion $out")
  }

  test("q371 recovers the planted discontinuity exactly (gap = 3, " +
    "slope = 100 micro, both sides)") {
    // y = 10 + 0.0001x + 3*(x>=0): left intercept 10, right 13
    val dir = Files.createTempDirectory("planted-rd")
    val pts = Seq((-500.00, 5L), (-300.00, 7L), (-100.00, 9L),
      (100.00, 14L), (300.00, 16L), (500.00, 18L))
    pts.zipWithIndex.map { case ((bal, _), i) => (i.toLong, bal) }
      .toDF("c_custkey", "c_acctbal")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("customer.parquet").toString)
    pts.zipWithIndex.flatMap { case ((_, y), i) =>
      (1L to y).map(j => (i.toLong * 100 + j, i.toLong)) }
      .toDF("o_orderkey", "o_custkey")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("orders.parquet").toString)
    val out = operators.AssociationQueries.q371(spark, dir.toString)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(0) === ((3L, 10000000L, 100L, 3000000L)), s"left ${out(0)}")
    assert(out(1) === ((3L, 13000000L, 100L, 3000000L)), s"right ${out(1)}")
  }

  test("q372 matches a fixed-order double replica and reads a flat " +
    "series as zero") {
    // periodic plant: y depends only on day%7 over 4 full weeks
    val cosL = Seq(1.0, 0.6234898018587336, -0.2225209339563144,
      -0.900968867902419, -0.900968867902419, -0.2225209339563144,
      0.6234898018587336)
    val sinL = Seq(0.0, 0.7818314824680298, 0.9749279121818236,
      0.4338837391175581, -0.4338837391175581, -0.9749279121818236,
      -0.7818314824680298)
    def yOf(day: Int): Long = 100L * (day % 7) + 100L
    val d = ordersDir(1 to 28, day => yOf(day).toDouble)
    val r = operators.EventQueries.q372(spark, d).head()
    // replica with the SAME left-assoc operation order and literals
    val (nk, ck) = ((0 to 6).map(_ => 4L),
      (0 to 6).map(k => 4L * (100L * k + 100L)))
    val (nn, s) = (28L, ck.sum)
    val syy = (1 to 28).map(dd => BigInt(yOf(dd)) * yOf(dd)).sum
    def dot(v: Seq[Long], l: Seq[Double]) =
      (0 to 6).map(k => v(k).toDouble * l(k)).reduce(_ + _)
    val a = dot(ck, cosL) - s.toDouble / nn.toDouble * dot(nk, cosL)
    val b = dot(ck, sinL) - s.toDouble / nn.toDouble * dot(nk, sinL)
    val ss = (BigInt(nn) * syy - BigInt(s) * s).toDouble / nn.toDouble
    def r6(x: Double) = math.floor(x * 1000000 + 0.5) / 1000000
    val share = r6(2.0 * (a * a + b * b) / nn.toDouble / ss)
    assert(r.getLong(0) === 28L)
    assert(r.getDouble(1) === r6(a) && r.getDouble(2) === r6(b),
      s"(a,b) = (${r.getDouble(1)}, ${r.getDouble(2)}) vs (${r6(a)}, ${r6(b)})")
    assert(r.getDouble(3) === share, s"share ${r.getDouble(3)} vs $share")
    assert(share > 0.2, s"weekly plant share too small: $share")
    // flat series: a = b = 0 exactly, share degrades to NULL
    val flat = operators.EventQueries.q372(spark,
      ordersDir(1 to 28, _ => 500.0)).head()
    assert(flat.getDouble(1) === 0.0 && flat.getDouble(2) === 0.0)
    assert(flat.isNullAt(3), "share must be NULL on zero variance")
  }

  test("q373 matches the exact Brown-Forsythe fold and separates " +
    "planted spread regimes") {
    // wide group: 50 orders alternating 0/400 dollars; tight group:
    // 50 orders alternating 198/202 -> same medians family, wildly
    // different spread; replicate the integer formula exactly
    val wide = (1 to 50).map(i => (5, "A", if (i % 2 == 0) 0.0 else 400.0))
    val tight = (1 to 50).map(i => (5, "B", if (i % 2 == 0) 198.0 else 202.0))
    def fold(groups: Seq[Seq[Long]]): (BigInt, BigInt) = { // (wMicro, rejectable ssw)
      val k = groups.size
      val zs = groups.map { g =>
        val sorted = g.sorted
        val med = sorted(((g.size + 1) / 2) - 1) // lower median
        g.map(v => (v - med).abs)
      }
      val (nn, zt) = (BigInt(zs.map(_.size).sum), BigInt(zs.flatten.sum))
      val a = zs.map(z => BigInt(z.sum) * z.sum / z.size).sum
      val b = zs.flatten.map(z => BigInt(z) * z).sum
      val ssb = a - zt * zt / nn; val ssw = b - a
      (((nn - k) * ssb * 1000000) / ((k - 1) * ssw), ssw)
    }
    val cents = (s: Seq[(Int, String, Double)]) =>
      s.map(t => (t._3 * 100).toLong)
    val (wMicro, _) = fold(Seq(cents(wide), cents(tight)))
    val r = operators.GovernanceQueries.q373(spark,
      ordersPrioDir(wide ++ tight)).head()
    assert(r.getLong(0) === 2L && r.getLong(1) === 100L)
    assert(r.getLong(2) === wMicro.toLong, s"W ${r.getLong(2)} vs $wMicro")
    assert(r.getInt(4) === 1, "planted spread contrast not rejected")
    // identical distributions -> SSB = 0 exactly -> W = 0, accept
    val same = (1 to 50).map(i => (5, "A", if (i % 2 == 0) 100.0 else 300.0)) ++
      (1 to 50).map(i => (5, "B", if (i % 2 == 0) 100.0 else 300.0))
    val r2 = operators.GovernanceQueries.q373(spark, ordersPrioDir(same)).head()
    assert(r2.getLong(2) === 0L && r2.getInt(4) === 0, s"null case $r2")
  }

  test("q374 reads the planted monotone shift as 'increasing' with " +
    "exact doubled moments") {
    // g1 {10,20} < g2 {30,40} < g3 {50,60}: JT2 = 24, mu2 = 12,
    // var72 = 456, z = 12 / (2*sqrt(456/72))
    val inc = Seq((5, "1-L", 10.0), (5, "1-L", 20.0),
      (5, "2-M", 30.0), (5, "2-M", 40.0),
      (5, "3-H", 50.0), (5, "3-H", 60.0))
    val r = operators.GovernanceQueries.q374(spark, ordersPrioDir(inc)).head()
    val z = math.floor(12.0 / (2.0 * math.sqrt(456.0 / 72.0)) * 1000000 + 0.5) / 1000000
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((6L, 24L, 12L)), s"$r")
    assert(r.getDouble(3) === z && r.getString(4) === "increasing", s"$r vs $z")
    // reversed ordering -> JT2 = 0, 'decreasing'
    val dec = inc.map { case (d, p, v) => (d, p, 70.0 - v) }
    val r2 = operators.GovernanceQueries.q374(spark, ordersPrioDir(dec)).head()
    assert(r2.getLong(1) === 0L && r2.getString(4) === "decreasing", s"$r2")
  }

  test("q375 prices the planted variance amplification at exactly 4x") {
    val dir = Files.createTempDirectory("planted-bw")
    // orders: 100/200/300 across Jan/Feb/Mar; shipped: 150/200/250
    Seq((5L, 100.0), (40L, 200.0), (70L, 300.0)).zipWithIndex
      .map { case ((day, v), i) => (i.toLong, day, v) }
      .toDF("o_orderkey", "day", "o_totalprice")
      .withColumn("o_orderdate", timestamp_micros(
        ($"day" * 86400L + 43200L) * 1000000L))
      .select($"o_orderkey", $"o_orderdate", $"o_totalprice")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("orders.parquet").toString)
    Seq((5L, 150.0), (40L, 200.0), (70L, 250.0)).zipWithIndex
      .map { case ((day, v), i) => (i.toLong, day, v) }
      .toDF("l_orderkey", "day", "l_extendedprice")
      .withColumn("l_shipdate", timestamp_micros(
        ($"day" * 86400L + 43200L) * 1000000L))
      .select($"l_orderkey", $"l_extendedprice", $"l_shipdate")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("lineitem.parquet").toString)
    val r = operators.Relational.q375(spark, dir.toString).head()
    // vo = 3*(1+4+9)e8 - 36e8 = 6e8; vs = 1.5e8 -> ratio 4.0 exactly
    assert((r.getLong(0), r.getLong(1), r.getInt(2)) === ((3L, 4000000L, 1)),
      s"$r")
  }

  test("q376 prices the planted crash day at VaR = CVaR = 500 exactly") {
    // flat 1000/day except a 500 crash on day 11: the 20 first
    // differences are {-500, 0 x18, +500}; k = 1 at both levels
    val d = ordersDir(1 to 21, day => if (day == 11) 500.0 else 1000.0)
    val out = operators.EventQueries.q376(spark, d)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(95L) === ((20L, 1L, 500L, 500000000L)), s"95 ${out(95L)}")
    assert(out(99L) === ((20L, 1L, 500L, 500000000L)), s"99 ${out(99L)}")
  }

  test("q377 reads the planted development triangle at f0 = 1.5 exactly") {
    val dir = Files.createTempDirectory("planted-cl")
    // cohort Jan: 100 at dev0 + 50 at dev1; cohort Feb: 200 + 100
    // -> f0 = (150+300)/(100+200) = 1.5; no dev1->dev2 pairs exist
    Seq((1L, 5L), (2L, 40L))
      .toDF("o_orderkey", "day")
      .withColumn("o_orderdate", timestamp_micros(
        ($"day" * 86400L + 43200L) * 1000000L))
      .select($"o_orderkey", $"o_orderdate")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("orders.parquet").toString)
    Seq((1L, 5L, 100.0), (1L, 40L, 50.0), (2L, 40L, 200.0), (2L, 70L, 100.0))
      .toDF("l_orderkey", "day", "l_extendedprice")
      .withColumn("l_shipdate", timestamp_micros(
        ($"day" * 86400L + 43200L) * 1000000L))
      .select($"l_orderkey", $"l_extendedprice", $"l_shipdate")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("lineitem.parquet").toString)
    val out = operators.Relational.q377(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((0L, 2L, 1500000L)), s"${out.toSeq}")
  }

  test("q378 flags the planted mean-shift week on the X chart and the " +
    "planted spread week on the R chart, exactly") {
    // w0/w1: 90/110 alternating (Xbar 100, R 20); w2: flat 125 (mean
    // shift, R 0); w3: 50/150 alternating (R 100)
    def y(day: Int): Double = (day / 7, day % 7) match {
      case (2, _) => 125.0
      case (3, i) => if (i == 6) 100.0 else if (i % 2 == 0) 50.0 else 150.0
      case (_, i) => if (i == 6) 100.0 else if (i % 2 == 0) 90.0 else 110.0
    }
    val out = operators.EventQueries.q378(spark, ordersDir(0 to 27, y))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3), r.getInt(4), r.getInt(5)))
    assert(out.toSeq === Seq(
      (0L, 100000000L, 20L, 0, 0, 0), (1L, 100000000L, 20L, 0, 0, 0),
      (2L, 125000000L, 0L, 1, 0, 0), (3L, 100000000L, 100L, 0, 0, 1)),
      s"chart ${out.toSeq}")
  }

  test("q379 pages only when BOTH planted burn windows exceed their " +
    "thresholds") {
    // week 1 clean, week 2 burns at 2.4x: the fast window trips on
    // day 8 but the slow window lags until day 12 - the multi-window
    // rule must suppress days 8-11
    val rows = (1 to 14).flatMap { day =>
      val errs = if (day >= 8) 6 else 0
      (1 to errs).map(i => (day, day * 100L + i, "error", 0.0)) ++
        (1 to 10 - errs).map(i => (day, day * 100L + 50 + i, "view", 0.0))
    }
    val byDay = operators.EventQueries.q379(spark, eventsDir(rows))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3)))
      .toMap
    val days = byDay.keys.toSeq.sorted
    val paged = days.filter(d => byDay(d)._3 == 1)
    assert(paged === days.takeRight(3), s"paged $paged of $days")
    val d8 = byDay(days(7))
    assert(d8._1 === 2400000L && d8._2 === 342857L && d8._3 === 0,
      s"day8 $d8")
    val d12 = byDay(days(11))
    assert(d12._1 === 2400000L && d12._2 === 1714285L && d12._3 === 1,
      s"day12 $d12")
  }

  test("q380 reads the planted gap multiset's conditional means exactly") {
    val dir = Files.createTempDirectory("planted-mrl")
    // cust 1: days 0/10/30 (gaps 10, 20); cust 2: days 0/40 (gap 40)
    Seq((1L, 0L), (1L, 10L), (1L, 30L), (2L, 0L), (2L, 40L)).zipWithIndex
      .map { case ((c, day), i) => (i.toLong, c, day) }
      .toDF("o_orderkey", "o_custkey", "day")
      .withColumn("o_orderdate", timestamp_micros(
        ($"day" * 86400L + 43200L) * 1000000L))
      .select($"o_orderkey", $"o_custkey", $"o_orderdate")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("orders.parquet").toString)
    val out = operators.Relational.q380(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      (0L, 3L, 23333333L),  // (10+20+40)/3
      (7L, 3L, 16333333L),  // (3+13+33)/3
      (14L, 2L, 16000000L), // (6+26)/2
      (28L, 1L, 12000000L)),
      s"MRL ${out.toSeq}") // t=56: no exceedance -> no row
  }

  test("q381 sizes the planted alternating demand exactly " +
    "(sigma = sqrt(30), ROP replica)") {
    val dir = Files.createTempDirectory("planted-ss")
    Seq((1L, "BX")).toDF("p_partkey", "p_brand")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("part.parquet").toString)
    Seq((1L, 0L)).toDF("o_orderkey", "day")
      .withColumn("o_orderdate", timestamp_micros(
        ($"day" * 86400L + 43200L) * 1000000L))
      .select($"o_orderkey", $"o_orderdate")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("orders.parquet").toString)
    // ship days 0..5, qty alternating 5/15: dbar = 10, sample var 30,
    // lead times 0..5 -> LT = 2.5
    (0 to 5).map(i => (1L, 1L, if (i % 2 == 0) 5.0 else 15.0, i.toLong))
      .toDF("l_orderkey", "l_partkey", "l_quantity", "day")
      .withColumn("l_shipdate", timestamp_micros(
        ($"day" * 86400L + 43200L) * 1000000L))
      .select($"l_orderkey", $"l_partkey", $"l_quantity", $"l_shipdate")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("lineitem.parquet").toString)
    val r = operators.Relational.q381(spark, dir.toString).head()
    def r6(x: Double) = math.floor(x * 1000000 + 0.5) / 1000000
    val sigma = math.sqrt(30.0)
    val ss = 1.645 * sigma * math.sqrt(2.5)
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      (("BX", 6L, 10000000L, 2500000L)), s"$r")
    assert(r.getDouble(4) === r6(sigma) && r.getDouble(5) === r6(ss) &&
      r.getDouble(6) === r6(10.0 * 2.5 + ss), s"$r")
  }

  test("q382 reads the planted antihub geometry's k-occurrence " +
    "multiset exactly") {
    // 12 near-axis points at 2-degree steps + one orthogonal outlier:
    // the outlier lands in NO top-10 (occ 0); endpoints p1/p12 are
    // each the worst neighbor for 6 queries; v0's own list excludes
    // the two lowest-angle points -> occ multiset {0,5,6,11,12x9}
    def vec(theta: Double): Seq[Float] =
      (Seq(math.cos(theta), math.sin(theta)) ++ Seq.fill(62)(0.0))
        .map(_.toFloat)
    val near = (1 to 12).map(i =>
      (i.toLong, vec(math.toRadians(2.0 * (i - 1))), 0))
    val outlier = Seq((99L, vec(math.Pi / 2), 1))
    val r = operators.SimilarityQueries.q382(spark,
      embeddingsDir(near ++ outlier)).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((13L, 12L, 1L, 0L)), s"$r")
    // skewness replica over the derived multiset
    val cs = Seq(0L, 5L, 6L, 11L) ++ Seq.fill(9)(12L)
    val n = BigInt(cs.size); val sc = BigInt(cs.sum)
    val s2 = cs.map(c => BigInt(c) * c).sum
    val s3 = cs.map(c => BigInt(c) * c * c).sum
    val m2 = n * s2 - sc * sc
    val m3 = n * n * s3 - 3 * n * sc * s2 + 2 * sc * sc * sc
    val g1 = math.floor(m3.toDouble / (m2.toDouble * math.sqrt(m2.toDouble))
      * 1000000 + 0.5) / 1000000
    assert(r.getDouble(4) === g1, s"skew ${r.getDouble(4)} vs $g1")
  }

  test("q383 recovers a planted pure line at zero pinball loss and " +
    "matches a sequential fold on a peaked series") {
    // exact line y = 200 + 30x: the grid's b = 30 gives residuals all
    // 200 -> quantile intercept 200, loss 0
    val line = operators.EventQueries.q383(spark,
      ordersDir(0 to 20, day => 200.0 + 30.0 * day)).head()
    assert((line.getLong(0), line.getLong(1), line.getLong(2),
      line.getLong(3)) === ((30L, 200L, 21L, 0L)), s"$line")
    // peaked series: flat base + every-4th-day growing peaks; the
    // tau=0.9 fit must match an independent sequential grid fold
    def y(day: Int): Long = if (day % 4 == 0) 300L + 20L * day else 100L
    val ref = (-20 to 20).map(_ * 5L).map { b =>
      val rs = (0 to 27).map(d => y(d) - b * d).sorted
      val a = rs((9 * rs.size + 9) / 10 - 1)
      val loss = rs.map(r => if (r > a) 9 * (r - a) else a - r).sum
      (loss, b, a)
    }.min
    val out = operators.EventQueries.q383(spark,
      ordersDir(0 to 27, d => y(d).toDouble)).head()
    assert((out.getLong(0), out.getLong(1), out.getLong(3)) ===
      ((ref._2, ref._3, ref._1)), s"$out vs $ref")
  }

  test("q384 reads planted perfectly-aligned items as alpha = 8/9 " +
    "exactly and a zero-variance total as NULL") {
    // user u: u views + 2u clicks -> total 3u; V_T = 9V, items V + 4V
    // -> alpha = 2(9-5)/9 = 8/9
    val aligned = (1L to 10L).flatMap { u =>
      (1L to u).map(i => (1, u, "view", 0.0)) ++
        (1L to 2 * u).map(i => (2, u, "click", 0.0))
    }
    val r = operators.GovernanceQueries.q384(spark, eventsDir(aligned)).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((2L, 10L, 888888L)),
      s"$r")
    // anti-correlated items with constant total: V_T = 0 -> NULL
    val anti = (1L to 10L).flatMap { u =>
      (1L to (u % 2 + 1)).map(i => (1, u, "view", 0.0)) ++
        (1L to (2 - u % 2)).map(i => (2, u, "click", 0.0))
    }
    val r2 = operators.GovernanceQueries.q384(spark, eventsDir(anti)).head()
    assert(r2.isNullAt(2), s"zero-variance total must be NULL: $r2")
  }

  test("q385 reads the planted brand mixing at r = 1/3 exactly") {
    val dir = Files.createTempDirectory("planted-hom")
    // parts 1,2 brand X; 3,4 brand Y; edges X-X, Y-Y, X-Y
    Seq((1L, 1L), (1L, 2L), (2L, 3L), (2L, 4L), (3L, 2L), (3L, 3L))
      .toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("lineitem.parquet").toString)
    Seq((1L, "X"), (2L, "X"), (3L, "Y"), (4L, "Y"))
      .toDF("p_partkey", "p_brand")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("part.parquet").toString)
    val r = operators.GraphQueries.q385(spark, dir.toString).head()
    // M = 6, same = 4, sum deg^2 = 18 -> r = (24-18)/(36-18) = 1/3
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ===
      ((3L, 666666L, 333333L)), s"$r")
  }

  test("q386 separates the planted conflicted near-dup pair from the " +
    "consistent one") {
    val t1 = (1 to 10).map(i => s"alpha$i").mkString(" ")
    val t2 = (1 to 10).map(i => s"beta$i").mkString(" ")
    val docs = Seq(
      (1L, t1, "en", "s", 10L), (2L, t1, "de", "s", 10L), // conflict
      (3L, t2, "en", "s", 10L), (4L, t2, "en", "s", 10L)) // consistent
    val out = operators.DedupQueries.q386(spark, documentsDir(docs))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getInt(3)))
    assert(out.toSeq === Seq(("de", "en", 1L, 1), ("en", "en", 1L, 0)),
      s"${out.toSeq}")
  }

  test("q387 splits planted inequality into within/between exactly") {
    // same spread in both brands, equal means: ALL inequality within
    val within = Seq(("BA", 5, 1.00, 1.0), ("BA", 5, 3.00, 1.0),
      ("BB", 5, 1.00, 1.0), ("BB", 5, 3.00, 1.0))
    val r = operators.Relational.q387(spark,
      elasticityLinesDir(within)).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) === ((2L, 4L, 125000L, 0L, 125000L, 0L)),
      s"within $r")
    // flat within, different means: ALL inequality between
    val between = Seq(("BA", 5, 1.00, 1.0), ("BA", 5, 1.00, 1.0),
      ("BB", 5, 3.00, 1.0), ("BB", 5, 3.00, 1.0))
    val r2 = operators.Relational.q387(spark,
      elasticityLinesDir(between)).head()
    assert((r2.getLong(2), r2.getLong(3), r2.getLong(4), r2.getLong(5)) ===
      ((125000L, 125000L, 0L, 1000000L)), s"between $r2")
  }

  test("q388 bridges the planted year-over-year delta additively and " +
    "exactly") {
    // 1970: qty 10 @ 1.00/unit; 1971: qty 20 @ 2.00/unit
    val rows = Seq(("BX", 5, 10.00, 10.0), ("BX", 400, 40.00, 20.0))
    val r = operators.Relational.q388(spark, elasticityLinesDir(rows)).head()
    val (price, volume, cross) = (r.getLong(1), r.getLong(2), r.getLong(3))
    assert((price, volume, cross) === ((1000000000L, 1000000000L, 1000000000L)),
      s"$r")
    assert(r.getLong(4) === price + volume + cross,
      "bridge must sum exactly to delta_hat")
    assert(r.getLong(5) === 3000L, s"raw delta ${r.getLong(5)}")
  }

  test("q389 reads planted determinism as lambda = 1 and planted " +
    "independence as 0, both directions") {
    val det = Seq.fill(10)(("A", "F")) ++ Seq.fill(10)(("B", "O"))
    val r = operators.GovernanceQueries.q389(spark, ordersStatusDir(det))
      .collect().map(x => x.getString(0) -> x.getLong(4)).toMap
    assert(r("priority->status") === 1000000L && r("status->priority") === 1000000L,
      s"deterministic $r")
    val ind = Seq.fill(5)(("A", "F")) ++ Seq.fill(5)(("A", "O")) ++
      Seq.fill(5)(("B", "F")) ++ Seq.fill(5)(("B", "O"))
    val r2 = operators.GovernanceQueries.q389(spark, ordersStatusDir(ind))
      .collect().map(x => x.getString(0) -> x.getLong(4)).toMap
    assert(r2.values.forall(_ === 0L), s"independent $r2")
  }

  test("q390 completes the planted uniform triangle to ~7.00 per " +
    "immature cohort with the stated chained truncations") {
    val dir = Files.createTempDirectory("planted-ult")
    // cohorts Jan..Jul 1970, each shipping 1.00 at every dev month it
    // can observe: every factor f_d = (d+2)/(d+1) on the micro grid
    val monthDay5 = Seq(4L, 35L, 63L, 94L, 124L, 155L, 185L) // Jan..Jul 5th
    (1 to 7).map(k => (k.toLong, monthDay5(k - 1)))
      .toDF("o_orderkey", "day")
      .withColumn("o_orderdate", timestamp_micros(
        ($"day" * 86400L + 43200L) * 1000000L))
      .select($"o_orderkey", $"o_orderdate")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("orders.parquet").toString)
    (1 to 7).flatMap(k => (k to 7).map(m => (k.toLong, monthDay5(m - 1))))
      .toDF("l_orderkey", "day")
      .withColumn("l_extendedprice", lit(1.00))
      .withColumn("l_shipdate", timestamp_micros(
        ($"day" * 86400L + 43200L) * 1000000L))
      .select($"l_orderkey", $"l_extendedprice", $"l_shipdate")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("lineitem.parquet").toString)
    val out = operators.Relational.q390(spark, dir.toString)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // chained truncations: F5..F0 = 1166666, 1399999, 1749998,
    // 2333329, 3499993, 6999986 -> every ultimate lands on 699 cents
    val expect = (2 to 7).map(m => (1970, m, 7L - m, (8L - m) * 100, 699L))
    assert(out.toSeq === expect, s"${out.toSeq} vs $expect")
  }

  test("q391 dates each planted behavior 3-gram's novelty correctly") {
    val rows =
      Seq((1, 1L, "view", 0.0), (1, 1L, "view", 0.0), (1, 1L, "view", 0.0)) ++
        Seq((2, 2L, "view", 0.0), (2, 2L, "view", 0.0),
          (2, 2L, "view", 0.0), (2, 2L, "click", 0.0)) ++
        Seq((3, 3L, "view", 0.0), (3, 3L, "view", 0.0),
          (3, 3L, "click", 0.0), (3, 3L, "click", 0.0))
    val out = operators.EventQueries.q391(spark, eventsDir(rows))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // day1: {vvv} new; day2: {vvv old, vvc new}; day3: {vvc old, vcc new}
    assert(out.toSeq === Seq((1L, 1L, 1000000L), (2L, 1L, 500000L),
      (2L, 1L, 500000L)), s"${out.toSeq}")
  }

  test("q392 captures a planted perfect ranking at lift exactly 2.0 " +
    "in the top deciles") {
    // users 1..20, engagement = id, buyers = the top half: the
    // event-count ranking is a perfect model, so cumulative capture
    // is min(2d,10)/10 and lift is exactly 2.0 until saturation
    val rows = (1L to 20L).flatMap { u =>
      val base = (1 to u.toInt).map(i => (1, u, "view", 0.0))
      if (u > 10L) base :+ ((2, u, "purchase", 1.0)) else base
    }
    val out = operators.AssociationQueries.q392(spark, eventsDir(rows))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    out.foreach { case (dec, nu, nb, cap, lift) =>
      assert(nu === 2L, s"decile $dec users $nu")
      assert(nb === (if (dec <= 5) 2L else 0L), s"decile $dec buyers $nb")
      val cumB = math.min(2 * dec, 10L)
      assert(cap === cumB * 1000000L / 10L, s"decile $dec capture $cap")
      assert(lift === cumB * 20L * 1000000L / (10L * 2 * dec),
        s"decile $dec lift $lift")
    }
  }

  test("q393 reads a planted monotone series as S = C(n,2) with the " +
    "exact continuity-corrected z, and all-ties as NULL") {
    val inc = operators.EventQueries.q393(spark,
      ordersDir(1 to 15, day => 100.0 + 10.0 * day)).head()
    val z = math.floor(104.0 / math.sqrt(7350.0 / 18.0) * 1000000 + 0.5) / 1000000
    assert((inc.getLong(0), inc.getLong(1)) === ((15L, 105L)), s"$inc")
    assert(inc.getDouble(2) === z && inc.getString(3) === "increasing",
      s"$inc vs z=$z")
    val flat = operators.EventQueries.q393(spark,
      ordersDir(1 to 15, _ => 100.0)).head()
    assert(flat.getLong(1) === 0L && flat.isNullAt(2) && flat.isNullAt(3),
      s"all-ties case $flat")
  }

  test("q394 reads the planted price spell structure exactly") {
    // prices 1,1,2,2 across four months: one change, two spells
    val rows = Seq(("BX", 5, 1.00, 1.0), ("BX", 40, 1.00, 1.0),
      ("BX", 70, 2.00, 1.0), ("BX", 100, 2.00, 1.0))
    val r = operators.Relational.q394(spark, elasticityLinesDir(rows)).head()
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === (("BX", 4L, 1L, 333333L, 2000000L)), s"$r")
  }

  test("q395 localizes the planted slide's trough exactly") {
    // climb to 500 by day 5, slide to 180 by day 13 (the trough),
    // partial recovery after: DD = 320 at day 13 from peak 500
    def y(day: Int): Double =
      if (day <= 5) 100.0 * day
      else if (day <= 13) 500.0 - 40.0 * (day - 5)
      else 200.0 + 10.0 * (day - 13)
    val r = operators.EventQueries.q395(spark, ordersDir(1 to 20, y)).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === ((20L, 320L, 13L, 500L, 180L)), s"$r")
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

  // ---- round-11 gates: q396/q397/q400/q401 --------------------------

  /** lineitem fixture with returnflag/linestatus/discount for q396. */
  private def aucLineitemDir(rows: Seq[(String, String, Double)]): String = {
    val dir = Files.createTempDirectory("planted-auc")
    rows.toDF("l_returnflag", "l_linestatus", "l_discount")
      .withColumn("l_orderkey", monotonically_increasing_id())
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("lineitem.parquet").toString)
    dir.toString
  }

  test("q396 reads planted perfect separation as AUC exactly 1e6, reversal as 0, pure ties as 500000") {
    // status F: all returns at the HIGH discount -> AUC = 1
    // status O: all returns at the LOW discount -> AUC = 0
    val rows =
      (1 to 50).map(_ => ("R", "F", 0.10)) ++
        (1 to 50).map(_ => ("N", "F", 0.00)) ++
        (1 to 50).map(_ => ("R", "O", 0.00)) ++
        (1 to 50).map(_ => ("N", "O", 0.10))
    val out = operators.AssociationQueries.q396(spark, aucLineitemDir(rows))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out("F") === 1000000L, s"perfect separation: $out")
    assert(out("O") === 0L, s"perfect anti-separation: $out")
    // one shared score value: every pair is a tie -> AUC = 1/2
    val tied = (1 to 30).map(_ => ("R", "F", 0.05)) ++
      (1 to 70).map(_ => ("N", "F", 0.05))
    val t = operators.AssociationQueries.q396(spark, aucLineitemDir(tied))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(t("F") === 500000L, s"all-ties AUC: $t")
  }

  test("q397 reads a planted null effect as E-value exactly 1") {
    // every user converts in both arms -> RR = 1 -> E = 1 + sqrt(0)
    val rows = (1 to 200).map(u => (u % 30 + 1, u.toLong, "purchase", 1.0))
    val r = operators.AssociationQueries.q397(spark, eventsDir(rows)).head()
    assert(r.getDouble(4) === 1.0 && r.getDouble(5) === 1.0,
      s"null-effect E-value drifted: $r")
  }

  /** part + lineitem fixture for q400: brand b ships revenue
    * `dollars(b, yearIdx)` in each year 1992 + yearIdx. */
  private def brandYearDir(brands: Int, years: Int,
      dollars: (Int, Int) => Double): String = {
    val dir = Files.createTempDirectory("planted-brandyr")
    (1 to brands).map(b => (b.toLong, s"Brand#$b"))
      .toDF("p_partkey", "p_brand")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("part.parquet").toString)
    val rows = for (b <- 1 to brands; y <- 0 until years)
      yield (b.toLong, y, dollars(b, y))
    rows.toDF("l_partkey", "yi", "l_extendedprice")
      .withColumn("l_shipdate", timestamp_micros(
        (($"yi" * 365L + 8036L) * 86400L + 43200L) * 1000000L)) // 1992 + yi
      .withColumn("l_orderkey", monotonically_increasing_id())
      .select($"l_orderkey", $"l_partkey", $"l_extendedprice", $"l_shipdate")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("lineitem.parquet").toString)
    dir.toString
  }

  test("q400 reads a planted monotone rise as the maximal L with z > 0, a fall as minimal L with z < 0") {
    val n = 6; val k = 5
    // rising: every block ranks years 1..k in order -> L = n * sum j^2
    val up = operators.GovernanceQueries.q400(spark,
      brandYearDir(n, k, (b, y) => 100.0 + 10.0 * y + b)).head()
    val lMax = n.toLong * (1 to k).map(j => j.toLong * j).sum
    assert(up.getLong(4) === lMax, s"rising L: $up")
    assert(up.getDouble(5) > 2.0, s"rising z: $up")
    // falling: rank of year j is k+1-j -> L = n * sum j*(k+1-j)
    val dn = operators.GovernanceQueries.q400(spark,
      brandYearDir(n, k, (b, y) => 100.0 + 10.0 * (k - y) + b)).head()
    val lMin = n.toLong * (1 to k).map(j => j.toLong * (k + 1 - j)).sum
    assert(dn.getLong(4) === lMin, s"falling L: $dn")
    assert(dn.getDouble(5) < -2.0, s"falling z: $dn")
  }

  test("q401 counts a planted zig-zag as all-interior turning points and a monotone rise as none") {
    // strict alternation: every interior day is an extremum
    val zig = operators.EventQueries.q401(spark,
      ordersDir(1 to 20, d => if (d % 2 == 0) 30.0 else 10.0)).head()
    assert(zig.getLong(0) === 20L && zig.getLong(1) === 18L, s"$zig")
    assert(zig.getDouble(3) > 2.0, s"zig z: $zig")
    val mono = operators.EventQueries.q401(spark,
      ordersDir(1 to 20, d => 10.0 * d)).head()
    assert(mono.getLong(1) === 0L, s"monotone turning points: $mono")
    assert(mono.getDouble(3) < -2.0, s"monotone z: $mono")
  }

  // ---- round-11 gates: q398/q399/q402..q407 --------------------------

  test("q398 accumulates the planted hazard ladder with exact micro increments") {
    // spans: u1 t=0 death, u2 t=2 death, u3 t=4 death,
    // u4 t=8 censored (ends on the edge day), u5 t=0 censored
    val rows = Seq(
      (1, 1L, "view", 1.0),
      (1, 2L, "view", 1.0), (3, 2L, "view", 1.0),
      (1, 3L, "view", 1.0), (5, 3L, "view", 1.0),
      (2, 4L, "view", 1.0), (10, 4L, "view", 1.0),
      (10, 5L, "view", 1.0))
    val out = operators.EventQueries.q398(spark, eventsDir(rows))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // H increments: 1e6/5=200000, 1e6/3=333333, 1e6/2=500000, censor 0
    assert(out.toSeq === Seq(
      (0L, 5L, 1L, 1L, 200000L, 200000L),
      (2L, 3L, 1L, 0L, 333333L, 533333L),
      (4L, 2L, 1L, 0L, 500000L, 1033333L),
      (8L, 1L, 0L, 1L, 0L, 1033333L)), s"${out.toSeq}")
  }

  test("q399 reads a planted K4-plus-pendants as phi exactly 1.0 at the club and a star as no club") {
    // one 4-part order = K4 on parts 1..4; four pendant orders hang
    // parts 5..8 off the hubs -> hub degree 4, pendant degree 1
    val club = Seq((100L, 1L), (100L, 2L), (100L, 3L), (100L, 4L),
      (101L, 1L), (101L, 5L), (102L, 2L), (102L, 6L),
      (103L, 3L), (103L, 7L), (104L, 4L), (104L, 8L))
    val out = operators.GraphQueries.q399(spark, orderPartsDir(club))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // above k=1 sit the 4 hubs with all 6 club edges: phi = 12/12 = 1
    assert(out.toSeq === Seq((1L, 4L, 6L, 1000000L)), s"${out.toSeq}")
    // a star has one node above k=1 -> phi undefined everywhere
    val star = Seq((201L, 10L), (201L, 11L), (202L, 10L), (202L, 12L),
      (203L, 10L), (203L, 13L), (204L, 10L), (204L, 14L))
    assert(operators.GraphQueries.q399(spark, orderPartsDir(star)).count() === 0L)
  }

  test("q402 signs the planted substitute at +0.6 and the complement at exactly -1") {
    // B (Brand#12) doubles its unit price 1.00 -> 2.00 between months;
    // A's quantity rises 10 -> 15 (substitute), C's falls 10 -> 5
    // (complement); A and C keep unit price flat so only B is a
    // price-mover and survives the >=1% B-side gate
    val rows = Seq(
      ("Brand#11", 5, 10.00, 10.0), ("Brand#11", 35, 15.00, 15.0),
      ("Brand#12", 5, 10.00, 10.0), ("Brand#12", 35, 20.00, 10.0),
      ("Brand#13", 5, 10.00, 10.0), ("Brand#13", 35, 5.00, 5.0))
    val out = operators.Relational.q402(spark, elasticityLinesDir(rows))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // e(A,B) = (5*3e8*1e6) div (25*1e8) = 600000;
    // e(C,B) = (-5*3e8*1e6) div (15*1e8) = -1000000 exactly
    assert(out.toSeq === Seq(
      ("Brand#11", "Brand#12", 1L, 600000L, 1L),
      ("Brand#13", "Brand#12", 1L, -1000000L, 0L)), s"${out.toSeq}")
  }

  test("q403 folds the planted intermittent series with the exact alpha=0.2 fixed point") {
    // part 1 = second sorted brand; demands q=4@d10, 2@d12, 2@d16
    val rows = Seq(("A", 1, 1.00, 1.0),
      ("B", 10, 4.00, 4.0), ("B", 12, 2.00, 2.0), ("B", 16, 2.00, 2.0))
    val out = operators.Relational.q403(spark, elasticityLinesDir(rows))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // z: 4e6 -> .2*2e6+.8*4e6 = 3.6e6 -> .2*2e6+.8*3.6e6 = 3.28e6
    // p: 1e6 -> .2*2e6+.8*1e6 = 1.2e6 -> .2*4e6+.8*1.2e6 = 1.76e6
    // rate_3 = 3.28e12 div 1.76e6 = 1863636 (stated truncation)
    assert(out.toSeq === Seq(
      (10L, 4L, 1L, 4000000L, 1000000L, 4000000L),
      (12L, 2L, 2L, 3600000L, 1200000L, 3000000L),
      (16L, 2L, 4L, 3280000L, 1760000L, 1863636L)), s"${out.toSeq}")
  }

  test("q404 lands every immature cohort of the uniform triangle on 699 when the prior IS the ultimate") {
    val dir = Files.createTempDirectory("planted-bf")
    // q390's uniform triangle; each order books 7.00 = the true
    // ultimate, so BF and chain-ladder must agree cohort by cohort
    val monthDay5 = Seq(4L, 35L, 63L, 94L, 124L, 155L, 185L) // Jan..Jul 5th
    (1 to 7).map(k => (k.toLong, monthDay5(k - 1), 7.00))
      .toDF("o_orderkey", "day", "o_totalprice")
      .withColumn("o_orderdate", timestamp_micros(
        ($"day" * 86400L + 43200L) * 1000000L))
      .select($"o_orderkey", $"o_orderdate", $"o_totalprice")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("orders.parquet").toString)
    (1 to 7).flatMap(k => (k to 7).map(m => (k.toLong, monthDay5(m - 1))))
      .toDF("l_orderkey", "day")
      .withColumn("l_extendedprice", lit(1.00))
      .withColumn("l_shipdate", timestamp_micros(
        ($"day" * 86400L + 43200L) * 1000000L))
      .select($"l_orderkey", $"l_extendedprice", $"l_shipdate")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("lineitem.parquet").toString)
    val out = operators.Relational.q404(spark, dir.toString)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // addend(ldev) = 700*(comp-1e6) div comp fills cum to 699 exactly
    // at every maturity (99, 199, 299, 399, 499, 599)
    val expect = (2 to 7).map(m =>
      (1970, m, 7L - m, (8L - m) * 100, 700L, 699L))
    assert(out.toSeq === expect, s"${out.toSeq} vs $expect")
  }

  test("q405 keeps Bowley/Moors fixed under a planted mega-order and reads planted skew exactly") {
    val dir = Files.createTempDirectory("planted-shape")
    val vals =
      (1 to 9).map(v => ("A", v.toDouble)) ++              // symmetric
      ((1 to 8).map(v => ("B", v.toDouble)) :+ ("B", 100.0)) ++ // outlier
      Seq(1.0, 2.0, 3.0, 3.0, 3.0, 4.0, 7.0, 8.0, 9.0).map(("C", _)) // skew
    vals.zipWithIndex.map { case ((st, v), i) => (i.toLong, st, v) }
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("orders.parquet").toString)
    val out = operators.Relational.q405(spark, dir.toString)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    // A: octiles 2..8 -> bowley 0, moors ((8-6)+(4-2))/4 = 1
    assert(out("A") === ((3.0, 5.0, 7.0, 0.0, 1.0)), s"A ${out("A")}")
    // B: same middle, 9 -> 100: the quartile stats must not move
    assert(out("B") === ((3.0, 5.0, 7.0, 0.0, 1.0)), s"B ${out("B")}")
    // C: e-grid 2,3,3,3,4,7,8 -> bowley (7+3-6)/4 = 1, moors 1.25
    assert(out("C") === ((3.0, 3.0, 7.0, 1.0, 1.25)), s"C ${out("C")}")
  }

  test("q406 computes the planted blocked binary design exactly and rejects only the strong split") {
    // k=3, blocks u1{a,b,c} u2{a} u3{a,b} u4{a}:
    // Q = 2*(3*21-49)/(21-15) -> 28e6 div 6 = 4666666 < chi2_2 crit
    val weak = Seq((1, 1L, "a", 0.0), (1, 1L, "b", 0.0), (1, 1L, "c", 0.0),
      (1, 2L, "a", 0.0), (1, 3L, "a", 0.0), (1, 3L, "b", 0.0),
      (1, 4L, "a", 0.0))
    val w = operators.GovernanceQueries.q406(spark, eventsDir(weak))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4)))
    assert(w.toSeq === Seq(("a", 4L, 4L, 4666666L, 0),
      ("b", 2L, 4L, 4666666L, 0), ("c", 1L, 4L, 4666666L, 0)), s"${w.toSeq}")
    // k=2, 8 blocks all take a, half take b: Q = 16e6/4 = 4e6 > 3841459
    val strong = (1 to 8).map(u => (1, u.toLong, "a", 0.0)) ++
      (1 to 4).map(u => (1, u.toLong, "b", 0.0))
    val s = operators.GovernanceQueries.q406(spark, eventsDir(strong))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3),
        r.getInt(4)))
    assert(s.toSeq === Seq(("a", 8L, 4000000L, 1), ("b", 4L, 4000000L, 1)),
      s"${s.toSeq}")
  }

  test("q408 counts planted records exactly and moves the verdict both ways") {
    def moments(n: Int): (Long, Long) = (
      (1 to n).map(k => 1000000L / k).sum,
      (1 to n).map(k => 1000000L * (k - 1) / (k.toLong * k)).sum)
    // monotone rise: every day is a record
    val up = operators.EventQueries.q408(spark,
      ordersDir(1 to 20, d => 10.0 * d)).head()
    val (e20, v20) = moments(20)
    assert((up.getLong(0), up.getLong(1), up.getLong(2), up.getLong(3)) ===
      ((20L, 20L, e20, v20)), s"monotone $up")
    assert(up.getDouble(4) > 2.0 && up.getInt(5) === 1, s"monotone z $up")
    // constant series: ties are NOT records -> only day 1; at n=50
    // the deficit is significant (z ~ -2.06)
    val flat = operators.EventQueries.q408(spark,
      ordersDir(1 to 50, _ => 10.0)).head()
    assert(flat.getLong(1) === 1L, s"flat records $flat")
    assert(flat.getDouble(4) < -1.96 && flat.getInt(5) === 1, s"flat z $flat")
    // zig-zag never exceeds its second day: exactly two records
    val zig = operators.EventQueries.q408(spark,
      ordersDir(1 to 20, d => if (d % 2 == 0) 30.0 else 10.0)).head()
    assert(zig.getLong(1) === 2L, s"zig records $zig")
  }

  test("q409 matches a BigInt replay of the stated LB truncations and rejects planted structure") {
    // exact replica on a small series, mirroring every stated step
    val cents = Seq(100L, 500L, 200L, 800L, 300L, 900L, 400L, 700L)
    val n = cents.length
    val sr = cents.sum
    val c = cents.map(y => BigInt(n) * y - sr)
    val den = c.map(x => x * x).sum
    val expected = (1 to 7).scanLeft((0L, BigInt(0))) { case ((_, acc), k) =>
      val num = (0 until n - k).map(t => c(t) * c(t + k)).sum
      val rho = num * 1000000 / den
      val term = BigInt(n) * (n + 2) * rho * rho / (BigInt(n - k) * 1000000)
      (rho.toLong, acc + term)
    }.tail.map { case (rho, q) => (rho, q.toLong) }
    val got = operators.EventQueries.q409(spark,
      ordersDir(1 to n, d => cents(d - 1) / 100.0))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq === expected, s"${got.toSeq} vs $expected")
    // a monotone trend must reject at every m with positive rho_1
    val up = operators.EventQueries.q409(spark,
      ordersDir(1 to 30, d => 100.0 * d)).collect()
    assert(up.forall(_.getInt(4) === 1), "trend not rejected at some m")
    assert(up.head.getLong(1) > 800000L, s"rho_1 ${up.head}")
    // strict alternation: rho_1 strongly negative, still rejected
    val alt = operators.EventQueries.q409(spark,
      ordersDir(1 to 30, d => if (d % 2 == 0) 30.0 else 10.0)).collect()
    assert(alt.head.getLong(1) < -800000L && alt.head.getInt(4) === 1,
      s"alternation ${alt.head}")
  }

  test("q410 scores the planted clusters at exact silhouettes and flags only the mislabeled vector") {
    def axis(dim: Int): Seq[Float] =
      Seq.tabulate(64)(i => if (i == dim) 10f else 0f)
    // label 0: three at e0 + ONE mislabeled sitting exactly on e1;
    // label 1: three at e1 -> centroid0 = (7.5, 2.5, 0...), c1 = e1
    val rows = Seq.tabulate(3)(i => (i.toLong, axis(0), 0)) ++
      Seq((3L, axis(1), 0)) ++
      Seq.tabulate(3)(i => (4L + i, axis(1), 1))
    val out = operators.SimilarityQueries.q410(spark, embeddingsDir(rows))
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    // label 0 members: s = 1 - sqrt(12.5)/sqrt(200) = 0.75 each, the
    // planted stray: s = -1 -> mean (3*0.75 - 1)/4 = 0.3125
    assert(out(0) === ((4L, 0.3125, 1L)), s"label0 ${out(0)}")
    // label 1 sits ON its centroid: a = 0 -> s = 1 exactly
    assert(out(1) === ((3L, 1.0, 0L)), s"label1 ${out(1)}")
  }

  /** lineitem+part fixture for q411: brand -> (returned, kept). */
  private def returnsDir(rows: Seq[(String, Int, Int)]): String = {
    val dir = Files.createTempDirectory("planted-ret")
    val brands = rows.zipWithIndex
    brands.flatMap { case ((_, r, k), pk) =>
      Seq.fill(r)((pk.toLong, "R")) ++ Seq.fill(k)((pk.toLong, "N")) }
      .zipWithIndex.map { case ((pk, fl), i) => (i.toLong, pk, fl) }
      .toDF("l_orderkey", "l_partkey", "l_returnflag")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("lineitem.parquet").toString)
    brands.map { case ((b, _, _), pk) => (pk.toLong, b) }
      .toDF("p_partkey", "p_brand")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("part.parquet").toString)
    dir.toString
  }

  test("q411 BH-rejects exactly the two planted anomalous brands and nothing on a flat family") {
    // 8 baseline brands at 20/100 returns; B09 at 90/100, B10 at 0/100
    val rows = (1 to 8).map(b => (f"B$b%02d", 20, 80)) ++
      Seq(("B09", 90, 10), ("B10", 0, 100))
    val out = operators.GovernanceQueries.q411(spark, returnsDir(rows))
      .collect().map(r => r.getString(0) ->
        (r.getLong(5), r.getInt(6), r.getInt(7))).toMap
    // sorted p: B09 (z~15), B10 (z~-5.8), then the 8 baselines
    // (p~0.248 > 0.1*3/10) -> step-up stops at k = 2
    assert(out("B09")._1 === 1L && out("B09")._2 === 1, s"B09 ${out("B09")}")
    assert(out("B10")._1 === 2L && out("B10")._2 === 1, s"B10 ${out("B10")}")
    assert((1 to 8).forall(b => out(f"B$b%02d")._2 === 0),
      s"baseline rejected: $out")
    // flat family: z = 0 exactly, p = A&S erfc(0) -> r6 lands on 1.0
    val flat = operators.GovernanceQueries.q411(spark,
      returnsDir((1 to 10).map(b => (f"B$b%02d", 20, 80))))
      .collect()
    assert(flat.forall(r => r.getInt(6) === 0 && r.getDouble(4) === 1.0),
      s"flat family: ${flat.toSeq}")
  }

  test("q412 splits the planted competing risks exactly and conserves surv + cifs = 1e6") {
    // u4 converts at t=0, u1 at t=2, u5 at t=4; u2 churns at t=4;
    // u3 censored at t=9 (the observation edge)
    val rows = Seq(
      (1, 1L, "view", 1.0), (3, 1L, "purchase", 1.0),
      (1, 2L, "view", 1.0), (5, 2L, "view", 1.0),
      (1, 3L, "view", 1.0), (10, 3L, "view", 1.0),
      (1, 4L, "purchase", 1.0),
      (2, 5L, "view", 1.0), (6, 5L, "purchase", 1.0))
    val out = operators.EventQueries.q412(spark, eventsDir(rows))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(out.toSeq === Seq(
      (0L, 5L, 1L, 0L, 0L, 800000L, 200000L, 0L),
      (2L, 4L, 1L, 0L, 0L, 600000L, 400000L, 0L),
      (4L, 3L, 1L, 1L, 0L, 200000L, 600000L, 200000L),
      (9L, 1L, 0L, 0L, 1L, 200000L, 600000L, 200000L)), s"${out.toSeq}")
    assert(out.forall(r => r._6 + r._7 + r._8 === 1000000L),
      "mass not conserved")
  }

  test("q413 degenerates exactly on constant maxima and matches a double replica on a trend") {
    // constant revenue: every block maximum is 10 -> sd = 0, every
    // level collapses to the constant
    val flat = operators.EventQueries.q413(spark,
      ordersDir(1 to 90, _ => 10.0)).head()
    assert(flat.getLong(1) === 10L, s"observed $flat")
    assert(flat.getDouble(4) === 10.0 && flat.getDouble(5) === 0.0 &&
      flat.getDouble(6) === 10.0 && flat.getDouble(7) === 10.0, s"$flat")
    // trend: replicate the block maxima + MoM fit independently
    val dollars = (d: Int) => 100.0 + d
    val out = operators.EventQueries.q413(spark,
      ordersDir(1 to 90, d => dollars(d))).head()
    val maxima = (1 to 90).groupBy { d =>
      val dt = java.time.LocalDate.ofEpochDay(d.toLong)
      dt.getYear * 12 + dt.getMonthValue
    }.values.map(ds => ds.map(d => dollars(d).toLong).max).toSeq
    val n = maxima.size.toLong
    val sx = maxima.sum; val sxx = maxima.map(m => BigInt(m) * m).sum
    val mean = sx.toDouble / n.toDouble
    val sd = math.sqrt((BigInt(n) * sxx - BigInt(sx) * sx).toDouble /
      (n * (n - 1)).toDouble)
    val beta = sd * 0.7796968012336609
    val mu = mean - 0.5772156649015329 * beta
    def r6d(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(out.getLong(0) === n && out.getDouble(4) === r6d(mu), s"$out")
    assert(out.getDouble(6) ===
      r6d(mu - beta * math.log(-math.log(11.0 / 12.0))), s"rl12 $out")
    assert(out.getDouble(7) ===
      r6d(mu - beta * math.log(-math.log(119.0 / 120.0))), s"rl120 $out")
  }

  test("q414 matches a BigInt replica of the moment forms and separates planted shapes") {
    // type a: symmetric, near-normal kurtosis -> accept;
    // type b: one huge spike in zeros -> reject
    val aVals = Seq(-3.0, -1.0, -1.0, 0.0, 0.0, 0.0, 0.0, 1.0, 1.0, 3.0)
    val bVals = Seq.fill(9)(0.0) :+ 100.0
    val rows = aVals.zipWithIndex.map { case (v, i) => (i + 1, 1L, "a", v) } ++
      bVals.zipWithIndex.map { case (v, i) => (i + 1, 2L, "b", v) }
    def replica(vals: Seq[Double]): (Double, Long, Double) = {
      val x = vals.map(v => BigInt(math.floor(v).toLong))
      val n = BigInt(x.size)
      val (s1, s2, s3, s4) = (x.sum, x.map(v => v * v).sum,
        x.map(v => v * v * v).sum, x.map(v => v * v * v * v).sum)
      val a2 = n * s2 - s1 * s1
      val a3 = n * n * s3 - 3 * n * s2 * s1 + 2 * s1 * s1 * s1
      val a4 = n * n * n * s4 - 4 * n * n * s3 * s1 +
        6 * n * s2 * s1 * s1 - 3 * s1 * s1 * s1 * s1
      val skew = a2.toDouble match {
        case ad => a3.toDouble / (ad * math.sqrt(ad))
      }
      val excess = ((a4 * 1000000) / (a2 * a2)).toLong - 3000000L
      val jb = n.toDouble * (skew * skew +
        (excess.toDouble / 1000000.0) * (excess.toDouble / 1000000.0) / 4.0) / 6.0
      (skew, excess, jb)
    }
    def r6d(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val out = operators.EventQueries.q414(spark, eventsDir(rows))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getLong(3), r.getDouble(4), r.getInt(5))).toMap
    val (sa, ea, ja) = replica(aVals)
    assert(out("a") === ((r6d(sa), ea, r6d(ja), 0)), s"a: ${out("a")} vs ($sa, $ea, $ja)")
    val (sb, eb, jbb) = replica(bVals)
    assert(out("b") === ((r6d(sb), eb, r6d(jbb), 1)), s"b: ${out("b")}")
  }

  test("q415 reads a deterministic chain as zero entropy and matches a double replica on a mixed one") {
    // strict alternation: every transition is forced -> H = 0, rate 0
    val alt = (1 to 8).map(d => (d, 1L, if (d % 2 == 1) "a" else "b", 1.0))
    val z = operators.AssociationQueries.q415(spark, eventsDir(alt))
      .collect().map(r => (r.getString(0), r.getDouble(3), r.getDouble(4)))
    assert(z.toSeq === Seq(("a", 0.0, 0.0), ("b", 0.0, 0.0)), s"${z.toSeq}")
    // planted sequence a,a,b,a,b,b,b,a: from a {a:1,b:2}, from b {a:2,b:2}
    val seqTypes = Seq("a", "a", "b", "a", "b", "b", "b", "a")
    val mix = seqTypes.zipWithIndex.map { case (t, i) => (i + 1, 1L, t, 1.0) }
    def r6d(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val hA = -(1.0 / 3) * math.log(1.0 / 3) - (2.0 / 3) * math.log(2.0 / 3)
    val hB = -(2.0 / 4) * math.log(2.0 / 4) - (2.0 / 4) * math.log(2.0 / 4)
    val rate = (3.0 / 7) * hA + (4.0 / 7) * hB
    val out = operators.AssociationQueries.q415(spark, eventsDir(mix))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(3), r.getDouble(4))).toMap
    assert(out("a") === ((3L, r6d(hA), r6d(rate))), s"a ${out("a")} vs ($hA, $rate)")
    assert(out("b") === ((4L, r6d(hB), r6d(rate))), s"b ${out("b")}")
  }

  test("q416 backtests the planted exception pattern: 3/20 accepts at 95% and rejects at 99%") {
    // 40 diffs; est window (first 20) has one -100 loss -> VaR = 100
    // at BOTH levels (k = 1); test window has exactly three -150 days
    val diffs = (1 to 40).map { i =>
      if (i == 9) -100L
      else if (i == 24 || i == 29 || i == 34) -150L
      else if (i % 2 == 0) 10L else -10L
    }
    val y = diffs.scanLeft(2000L)(_ + _) // days 1..41
    val out = operators.EventQueries.q416(spark,
      ordersDir(1 to 41, d => y(d - 1).toDouble))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getInt(6))).toMap
    def lr(x: Long, n: Long, p: Double): Double = {
      def t(c: Long, q: Double) =
        if (c > 0) c.toDouble * math.log(c.toDouble / (n.toDouble * q)) else 0.0
      2.0 * (t(x, p) + t(n - x, 1.0 - p))
    }
    def r6d(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    assert(out(95L) === ((100L, 20L, 3L, r6d(lr(3, 20, 0.05)), 0)),
      s"95: ${out(95L)}")
    assert(out(99L) === ((100L, 20L, 3L, r6d(lr(3, 20, 0.01)), 1)),
      s"99: ${out(99L)}")
  }

  test("q417 recovers the planted v = m^2/4 scaling as slope exactly 2") {
    // three brands alternating {m/2, 3m/2} daily -> mean m, var m^2/4:
    // a perfect Taylor line of slope 2, intercept -ln 4
    val rows = Seq(("BA", 1.0, 3.0), ("BB", 2.0, 6.0), ("BC", 4.0, 12.0))
      .flatMap { case (b, lo, hi) =>
        (1 to 4).map(d => (b, d, 10.0, if (d % 2 == 0) hi else lo)) }
    val r = operators.Relational.q417(spark, elasticityLinesDir(rows)).head()
    def r6d(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    val pts = Seq(2.0, 4.0, 8.0).map(m =>
      (math.log(m), math.log(m * m / 4.0)))
    val k = pts.size
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val (sxx, sxy) = (pts.map(p => p._1 * p._1).sum,
      pts.map(p => p._1 * p._2).sum)
    val b = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    assert(r.getLong(0) === 3L && r.getDouble(1) === r6d(b) &&
      r.getInt(3) === 1, s"$r vs slope $b")
    assert(math.abs(r.getDouble(1) - 2.0) < 1e-5, s"slope ${r.getDouble(1)}")
    assert(math.abs(r.getDouble(2) + math.log(4.0)) < 1e-5,
      s"intercept ${r.getDouble(2)}")
  }

  /** orders+lineitem+part fixture for q418: (cust, brand) edges. */
  private def custBrandDir(edges: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("planted-hits")
    val brands = edges.map(_._2).distinct.sorted.zipWithIndex.toMap
    edges.zipWithIndex.map { case ((u, _), i) => (i.toLong + 1, u) }
      .toDF("o_orderkey", "o_custkey")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("orders.parquet").toString)
    edges.zipWithIndex.map { case ((_, b), i) =>
      (i.toLong + 1, brands(b).toLong) }
      .toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("lineitem.parquet").toString)
    brands.toSeq.map { case (b, k) => (k.toLong, b) }
      .toDF("p_partkey", "p_brand")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("part.parquet").toString)
    dir.toString
  }

  test("q418 walks the planted bipartite HITS rounds through the exact stated truncations") {
    // X bought by {1,2,3}, Y by {3} only: round 1 h = (750000,
    // 750000, 1e6); round 2 raw a_X = 2.5e6, a_Y = 1e6 -> 400000
    val out = operators.GraphQueries.q418(spark, custBrandDir(Seq(
      (1L, "X"), (2L, "X"), (3L, "X"), (3L, "Y"))))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(("X", 3L, 1000000L), ("Y", 1L, 400000L)),
      s"${out.toSeq}")
    // symmetric double star: both brands tie at 1e6
    val sym = operators.GraphQueries.q418(spark, custBrandDir(Seq(
      (1L, "X"), (2L, "X"), (3L, "Y"), (4L, "Y"))))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    assert(sym.toSeq === Seq(("X", 1000000L), ("Y", 1000000L)), s"${sym.toSeq}")
  }

  /** q419 replica: exact grid argmin with the stated pred_micro floor. */
  private def bassReplica(nts: Seq[Long]): (Long, Long, Int) = {
    val m = nts.sum
    val nprev = nts.scanLeft(0L)(_ + _).init
    val cells = for (pi <- 0L to 50L by 5L; qi <- 0L to 500L by 50L) yield {
      val sse = nts.zip(nprev).map { case (nt, np) =>
        val pred = (pi.toDouble / 1000.0 + qi.toDouble / 1000.0 *
          (np.toDouble / m.toDouble)) * (m - np).toDouble
        val pm = math.floor(pred * 1000000.0 + 0.5).toLong
        val r = BigInt(nt * 1000000L - pm); r * r
      }.sum
      (sse, pi, qi)
    }
    val (_, pi, qi) = cells.minBy(c => (c._1, c._2, c._3))
    (pi, qi, if (qi > pi) 1 else 0)
  }

  test("q419 recovers the planted diffusion regimes via the exact grid argmin") {
    def adoptRows(nts: Seq[Long]): Seq[(Int, Long, String, Double)] = {
      var uid = 0L
      nts.zipWithIndex.flatMap { case (n, day) =>
        (1L to n).map { _ => uid += 1; (day + 1, uid, "purchase", 1.0) } }
    }
    // S-curve: imitation-driven growth then saturation
    val sNts = Seq(1L, 2L, 4L, 8L, 16L, 20L, 12L, 6L, 3L, 1L)
    val (pi1, qi1, im1) = bassReplica(sNts)
    val r1 = operators.EventQueries.q419(spark, eventsDir(adoptRows(sNts))).head()
    assert((r1.getDouble(0), r1.getDouble(1), r1.getInt(4)) ===
      ((pi1.toDouble / 1000.0, qi1.toDouble / 1000.0, im1)),
      s"S-curve: $r1 vs ($pi1, $qi1)")
    assert(im1 === 1, "planted S-curve should be imitation-driven")
    // pure decay: innovation only, no installed-base effect
    val dNts = Seq(32L, 16L, 8L, 4L, 2L, 1L)
    val (pi2, qi2, im2) = bassReplica(dNts)
    val r2 = operators.EventQueries.q419(spark, eventsDir(adoptRows(dNts))).head()
    assert((r2.getDouble(0), r2.getDouble(1), r2.getInt(4)) ===
      ((pi2.toDouble / 1000.0, qi2.toDouble / 1000.0, im2)),
      s"decay: $r2 vs ($pi2, $qi2)")
  }

  test("q420 measures the planted path exactly and caps honestly at the 6-round horizon") {
    // path 1-2-3-4-5: seed 1, ecc 4, periphery 5, diameter 4
    val path5 = (1 to 4).flatMap(i =>
      Seq((100L + i, i.toLong), (100L + i, i.toLong + 1)))
    val r = operators.GraphQueries.q420(spark, orderPartsDir(path5)).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) === ((1L, 5L, 4L, 5L, 4L, 5L)), s"$r")
    // path 1..9: sweep 1 stops at the horizon (reaches 7 of 9,
    // ecc 6); sweep 2 from node 7 reaches ALL nine within 6
    val path9 = (1 to 8).flatMap(i =>
      Seq((100L + i, i.toLong), (100L + i, i.toLong + 1)))
    val c = operators.GraphQueries.q420(spark, orderPartsDir(path9)).head()
    assert((c.getLong(0), c.getLong(1), c.getLong(2), c.getLong(3),
      c.getLong(4), c.getLong(5)) === ((1L, 7L, 6L, 7L, 6L, 9L)), s"$c")
  }

  test("q421 declusters the planted exceedance bursts at theta exactly 3/5") {
    // 100 days at 10.00; spikes 101..106 on days 10,11,12,30,50,51;
    // p95 rank (95 of 100) selects 101 -> exceedances are the 5 days
    // above it, grouping into clusters {11,12} {30} {50,51}
    val spikes = Map(10 -> 101.0, 11 -> 102.0, 12 -> 103.0,
      30 -> 104.0, 50 -> 105.0, 51 -> 106.0)
    val r = operators.EventQueries.q421(spark,
      ordersDir(1 to 100, d => spikes.getOrElse(d, 10.0))).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) ===
      ((100L, 101L, 5L, 3L, 600000L, 1666666L)), s"$r")
    // isolated extremes: every exceedance its own cluster -> theta 1
    val iso = Map(10 -> 101.0, 30 -> 102.0, 50 -> 103.0, 70 -> 104.0,
      90 -> 105.0, 95 -> 106.0)
    val r2 = operators.EventQueries.q421(spark,
      ordersDir(1 to 100, d => iso.getOrElse(d, 10.0))).head()
    assert(r2.getLong(4) === 1000000L, s"iso theta $r2")
  }

  test("q422 solves the planted absorption chain exactly (prob and steps)") {
    // u1,u2: view -> purchase; u3,u4: view -> (end).
    // T: start->view = 1, view->purchase = view->end = 1/2
    val rows = Seq(
      (1, 1L, "view", 1.0), (2, 1L, "purchase", 1.0),
      (1, 2L, "view", 1.0), (2, 2L, "purchase", 1.0),
      (1, 3L, "view", 1.0), (1, 4L, "view", 1.0))
    val out = operators.EventQueries.q422(spark, eventsDir(rows))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // b(view) = 1/2, b(start) = 1/2; h(view) = 1, h(start) = 2
    assert(out.toSeq === Seq(("start", 500000L, 2000000L),
      ("view", 500000L, 1000000L)), s"${out.toSeq}")
  }

  test("q423 separates planted synchronized from staggered repricing") {
    // months on days 5/35/63/94; unit prices move together: all three
    // brands change at m2 and m4, hold at m3
    def lines(prices: Map[String, Seq[Double]]): Seq[(String, Int, Double, Double)] =
      prices.toSeq.flatMap { case (b, ps) =>
        ps.zip(Seq(5, 35, 63, 94)).map { case (p, day) => (b, day, p * 10, 10.0) } }
    val sync = operators.Relational.q423(spark, elasticityLinesDir(lines(Map(
      "BA" -> Seq(1.0, 2.0, 2.0, 3.0), "BB" -> Seq(1.0, 2.0, 2.0, 3.0),
      "BC" -> Seq(1.0, 2.0, 2.0, 3.0))))).head()
    // r_t = (1, 0, 1): all-or-nothing months
    assert((sync.getLong(0), sync.getLong(1), sync.getLong(2)) ===
      ((3L, 6L, 9L)), s"sync counts $sync")
    def replica(rs: Seq[Long], rbar: Long): Double = {
      val sd2 = rs.map(r => BigInt(r - rbar) * (r - rbar)).sum
      math.floor(math.sqrt(sd2.toDouble /
        (rs.size.toDouble * (rbar * (1000000L - rbar)).toDouble)) * 1e6 + 0.5) / 1e6
    }
    assert(sync.getDouble(4) ===
      replica(Seq(1000000L, 0L, 1000000L), 666666L), s"sync fk $sync")
    // staggered: one brand changes each month -> r_t = 1/3 always
    val stag = operators.Relational.q423(spark, elasticityLinesDir(lines(Map(
      "BA" -> Seq(1.0, 2.0, 2.0, 2.0), "BB" -> Seq(1.0, 1.0, 2.0, 2.0),
      "BC" -> Seq(1.0, 1.0, 1.0, 2.0))))).head()
    assert(stag.getDouble(4) === 0.0, s"staggered fk should be 0: $stag")
    assert(sync.getDouble(4) > 0.9, s"sync fk should be ~1: $sync")
  }

  test("q424 reads the planted vocabulary poles as beta exactly 1 and 0") {
    // all-unique words: V = N at every checkpoint -> beta = 1, flagged
    val unique = (1L to 40L).map(i =>
      (i, (1 to 5).map(j => s"w${i}_$j").mkString(" "), "en", "s", 10L))
    val u = operators.TextQueries.q424(spark, documentsDir(unique)).head()
    assert(u.getDouble(1) === 1.0 && u.getInt(4) === 1, s"unique $u")
    // closed 5-word vocabulary: V constant -> beta = 0, forecast = 5
    val closed = (1L to 40L).map(i => (i, "a b c d e", "en", "s", 9L))
    val c = operators.TextQueries.q424(spark, documentsDir(closed)).head()
    assert(c.getDouble(1) === 0.0 && c.getInt(4) === 0, s"closed $c")
    assert(c.getDouble(3) === 5.0, s"closed forecast $c")
  }

  test("q425 reproduces the planted two-neighbor geometry through the exact NN ratios") {
    def vec(pairs: (Int, Float)*): Seq[Float] = {
      val a = Array.fill(64)(0f); pairs.foreach { case (i, v) => a(i) = v }
      a.toSeq
    }
    // probe 0 sees neighbors at cos 1/sqrt(2) and 1/sqrt(5); probe 1
    // is orthogonal to everything (mu = 1, contributes ln 1 = 0)
    val rows = Seq(
      (0L, vec(0 -> 1f), 0), (1L, vec(50 -> 1f), 0),
      (100L, vec(0 -> 1f, 1 -> 1f), 1), (101L, vec(0 -> 1f, 1 -> 2f), 1))
    val r = operators.SimilarityQueries.q425(spark, embeddingsDir(rows)).head()
    val s1 = 1.0 / math.sqrt(2.0); val s2 = 1.0 / math.sqrt(5.0)
    val slm = math.log((1.0 - s2) / (1.0 - s1))
    def r6d(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(r.getLong(0) === 2L, s"probes $r")
    assert(r.getDouble(1) === r6d(slm), s"sum_ln_mu $r vs $slm")
    assert(r.getDouble(2) === r6d(2.0 / slm), s"id $r vs ${2.0 / slm}")
  }

  test("q426 reads planted rank-1 and rank-2 geometries as effective rank exactly 1 and 2") {
    def vec(pairs: (Int, Float)*): Seq[Float] = {
      val a = Array.fill(64)(0f); pairs.foreach { case (i, v) => a(i) = v }
      a.toSeq
    }
    // colinear: all variance on one axis -> erank = 1
    val r1 = operators.SimilarityQueries.q426(spark, embeddingsDir(Seq(
      (1L, vec(0 -> 1f), 0), (2L, vec(0 -> 2f), 0), (3L, vec(0 -> 3f), 0))))
      .head()
    assert(r1.getDouble(3) === 1.0, s"rank-1 $r1")
    // symmetric cross on two axes: C = diag(.5,.5) -> erank = 2
    val r2 = operators.SimilarityQueries.q426(spark, embeddingsDir(Seq(
      (1L, vec(0 -> 1f), 0), (2L, vec(0 -> -1f), 0),
      (3L, vec(1 -> 1f), 0), (4L, vec(1 -> -1f), 0)))).head()
    assert(r2.getDouble(3) === 2.0 && r2.getDouble(1) === 1.0, s"rank-2 $r2")
  }

  /** customer+nation fixture for q407: one customer per nation. */
  private def custNationDir(rows: Seq[(Long, Long, Double)]): String = {
    val dir = Files.createTempDirectory("planted-moran")
    rows.zipWithIndex.map { case ((nk, rk, bal), i) => (i.toLong, nk, bal) }
      .toDF("c_custkey", "c_nationkey", "c_acctbal")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("customer.parquet").toString)
    rows.map { case (nk, rk, _) => (nk, s"NATION$nk", rk) }
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("nation.parquet").toString)
    dir.toString
  }

  test("q407 reads planted region-aligned balances as I exactly +1 and interleaved as -1") {
    // aligned: region 0 holds the two 10.00 nations, region 1 the two
    // 20.00 nations -> every same-region pair deviates the same way
    val pos = operators.GraphQueries.q407(spark, custNationDir(Seq(
      (0L, 0L, 10.00), (1L, 0L, 10.00), (2L, 1L, 20.00), (3L, 1L, 20.00))))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(5), r.getLong(6), r.getInt(7)))
    assert(pos.toSeq === Seq((0L, 2L, 80000L, 1000000L, -333333L, 1),
      (1L, 2L, 80000L, 1000000L, -333333L, 1)), s"${pos.toSeq}")
    // interleaved: each region holds one 10.00 and one 20.00 nation
    val neg = operators.GraphQueries.q407(spark, custNationDir(Seq(
      (0L, 0L, 10.00), (1L, 0L, 20.00), (2L, 1L, 10.00), (3L, 1L, 20.00))))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(5), r.getInt(7)))
    assert(neg.toSeq === Seq((0L, -80000L, -1000000L, 0),
      (1L, -80000L, -1000000L, 0)), s"${neg.toSeq}")
  }

  test("q427 ranks the planted treatment effect first among all placebos") {
    // 6 brands, 4 months (days 5/35/63/94; cut = month 2): identical
    // flat 10.00 pre-period revenue everywhere, then BA (the stated
    // lexicographic-min treated unit) jumps to 50.00 post. BA's donors
    // (ties at d2=0 break by brand) are BB..BE at 10.00, so its gap is
    // 4·5000 − 4000 = 16000 qcents per post month × 2 = 32000. Every
    // placebo includes BA among ITS donors, picking up −4000/month.
    def lines(prices: Map[String, Seq[Double]]): Seq[(String, Int, Double, Double)] =
      prices.toSeq.flatMap { case (b, ps) =>
        ps.zip(Seq(5, 35, 63, 94)).map { case (p, day) => (b, day, p, 1.0) } }
    val flat = Seq(10.0, 10.0, 10.0, 10.0)
    val out = operators.Relational.q427(spark, elasticityLinesDir(lines(Map(
      "BA" -> Seq(10.0, 10.0, 50.0, 50.0), "BB" -> flat, "BC" -> flat,
      "BD" -> flat, "BE" -> flat, "BF" -> flat))))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        r.getInt(3)))
    assert(out.toSeq === Seq(
      ("BA", 32000L, 1, 1), ("BB", -8000L, 2, 0), ("BC", -8000L, 3, 0),
      ("BD", -8000L, 4, 0), ("BE", -8000L, 5, 0), ("BF", -8000L, 6, 0)),
      s"${out.toSeq}")
  }

  /** co-purchase fixture for q428: one lineitem row per (order, part). */
  private def coPurchaseDir(orders: Seq[(Long, Long)]): String = {
    val dir = Files.createTempDirectory("planted-truss")
    orders.toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("lineitem.parquet").toString)
    dir.toString
  }

  test("q429 hand-checks the Greenwood ladder and nulls bands past total extinction") {
    // u1 dies at t=1, u2 at t=2 (killing the whole risk set -> the
    // Greenwood term divides by zero, bands go NULL from there), u3
    // enters at the final day and is censored at t=0
    val rows = Seq((1, 1L, "view", 1.0), (2, 1L, "view", 1.0),
      (1, 2L, "view", 1.0), (2, 2L, "view", 1.0), (3, 2L, "view", 1.0),
      (9, 3L, "view", 1.0))
    val out = operators.EventQueries.q429(spark, eventsDir(rows)).collect()
    def r6d(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // t=0: n=3, d=0, c=1 -> S=1, g=0, se=0, bands [1,1]
    assert((out(0).getLong(0), out(0).getLong(1), out(0).getLong(2),
      out(0).getLong(3), out(0).getLong(4)) === ((0L, 3L, 0L, 1L, 1000000L)))
    assert(out(0).getDouble(5) === 0.0 && out(0).getDouble(6) === 1.0 &&
      out(0).getDouble(7) === 1.0, s"${out(0)}")
    // t=1: n=2, d=1 -> S=0.5, g=1e12/(2*1), se=.5*sqrt(5e11)/1e6
    val se1 = 0.5 * math.sqrt(5e11) / 1e6
    assert((out(1).getLong(1), out(1).getLong(2), out(1).getLong(4)) ===
      ((2L, 1L, 500000L)))
    assert(out(1).getDouble(5) === r6d(se1) &&
      out(1).getDouble(6) === r6d(math.max(0.0, 0.5 - 1.96 * se1)) &&
      out(1).getDouble(7) === r6d(math.min(1.0, 0.5 + 1.96 * se1)), s"${out(1)}")
    // t=2: n=1=d -> S=0, Greenwood undefined -> NULL bands
    assert((out(2).getLong(1), out(2).getLong(2), out(2).getLong(4)) ===
      ((1L, 1L, 0L)))
    assert(out(2).isNullAt(5) && out(2).isNullAt(6) && out(2).isNullAt(7),
      s"${out(2)}")
  }

  test("q430 walks the planted total order through two exact MM rounds") {
    // BA > BB > BC in every one of 4 months: w_AB=w_AC=w_BC=4. Hand
    // MM: round 1 -> (2e6, 1e6, 0); round 2 -> A: 8e12//(4e12//3e6 +
    // 4e12//2e6) = 2400000, B: 4e12//(4e12//3e6 + 4e12//1e6) = 750000.
    def lines(prices: Map[String, Seq[Double]]): Seq[(String, Int, Double, Double)] =
      prices.toSeq.flatMap { case (b, ps) =>
        ps.zip(Seq(5, 35, 63, 94)).map { case (p, day) => (b, day, p, 1.0) } }
    val out = operators.Relational.q430(spark, elasticityLinesDir(lines(Map(
      "BA" -> Seq(3.0, 3.0, 3.0, 3.0), "BB" -> Seq(2.0, 2.0, 2.0, 2.0),
      "BC" -> Seq(1.0, 1.0, 1.0, 1.0)))))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4)))
    assert(out.toSeq === Seq(
      ("BA", 8L, 8L, 2400000L, 1), ("BB", 4L, 8L, 750000L, 2),
      ("BC", 0L, 8L, 0L, 3)), s"${out.toSeq}")
  }

  test("q431 nulls on a constant series and matches a BigInt replay on a persistent wave") {
    // constant: every block variance is 0 -> ln undefined everywhere
    val const = operators.EventQueries.q431(spark,
      ordersDir(1 to 64, _ => 100.0)).collect()
    assert(const.length === 5)
    assert(const.forall(r => r.isNullAt(2) && r.isNullAt(3)), const.toSeq.toString)
    assert(const.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 64L), (2L, 32L), (4L, 16L), (8L, 8L), (16L, 4L)))
    // two poles, each pinned to an independent BigInt replay of the
    // STATED arithmetic over the planted 64-day pattern
    def r6d(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def replayH(f: Int => Long): (Seq[Double], Double) = {
      val ys = Seq(1, 2, 4, 8, 16).map { m =>
        val vs = (0 until 64 / m).map { blk =>
          (1 to 64).filter(d => (d - 1) / m == blk).map(f).sum / m
        }
        val nb = BigInt(vs.size)
        val num = nb * vs.map(v => BigInt(v) * v).sum -
          BigInt(vs.sum) * BigInt(vs.sum)
        math.log(num.toDouble / (nb * (nb - 1)).toDouble)
      }
      val slope = (-2.0 * ys(0) - ys(1) + ys(3) + 2.0 * ys(4)) / 6.931471805599453
      (ys, r6d(1.0 + slope / 2.0))
    }
    def check(f: Int => Long): Double = {
      val out = operators.EventQueries.q431(spark,
        ordersDir(1 to 64, d => f(d).toDouble)).collect()
      val (ys, h) = replayH(f)
      out.zip(ys).foreach { case (r, y) =>
        assert(r.getDouble(2) === r6d(y), s"ln_var $r vs $y")
        assert(r.getDouble(3) === h, s"hurst $r vs $h")
      }
      h
    }
    // monotone ramp: block means inherit the trend, variance barely
    // decays across scales -> persistent (H -> 1)
    val hRamp = check(d => d.toLong * 100L)
    assert(hRamp > 0.9, s"ramp should read persistent, got $hRamp")
    // triangle wave, period 32: blocks at half-period average the rise
    // against the fall, variance collapses FASTER than 1/m ->
    // anti-persistent (H < 0.5)
    val hTri = check { d =>
      val p = (d - 1) % 32
      math.min(p, 32 - p).toLong * 100L + 100L
    }
    assert(hTri < 0.5, s"triangle wave should read mean-reverting, got $hTri")
  }

  /** Build the q432 daily series from an explicit P&L (dl) sequence:
    * y(1) = 100000, y(d) = y(d-1) + dl(d). */
  private def plSeries(dls: Seq[Long]): Int => Double = {
    val y = dls.scanLeft(100000L)(_ + _)
    d => y(d - 1).toDouble
  }

  test("q432 rejects the planted exception cluster and passes the spread-out one") {
    // 80 P&L values -> est = first 40 (VaR95 = 500 at rank 2, VaR99 =
    // 1000 at rank 1), test = last 40
    val est = Seq(-1000L, -500L) ++
      (1 to 19).flatMap(_ => Seq(50L, -50L))
    val alt = (1 to 18).flatMap(_ => Seq(50L, -50L))
    // clustered: three CONSECUTIVE -600 days open the test window
    val clustered = Seq(-600L, -600L, -600L, 1800L) ++ alt
    val spread = (0 until 40).map { i =>
      if (Set(0, 13, 26)(i)) -600L
      else if (Set(1, 14, 27)(i)) 600L else 50L
    }
    assert(clustered.size === 40 && spread.size === 40)
    def term(c: Long, num: Long, den: Long): Double =
      if (c > 0) c.toDouble * math.log(num.toDouble / den.toDouble) else 0.0
    def lrInd(n00: Long, n01: Long, n10: Long, n11: Long): Double = {
      val nn = n00 + n01 + n10 + n11
      2.0 * ((term(n00, n00, n00 + n01) + term(n01, n01, n00 + n01) +
        term(n10, n10, n10 + n11) + term(n11, n11, n10 + n11)) -
        (term(n00 + n10, n00 + n10, nn) + term(n01 + n11, n01 + n11, nn)))
    }
    def r6d(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val cl = operators.EventQueries.q432(spark,
      ordersDir(1 to 81, plSeries(est ++ clustered))).collect()
    // level 95: e = 1,1,1,0...0 -> transitions (n00,n01,n10,n11) =
    // (36,0,1,2); the run is rank-one dependence -> reject
    val c95 = cl.find(_.getLong(0) == 95L).get
    assert((c95.getLong(1), c95.getLong(2), c95.getLong(3), c95.getLong(4)) ===
      ((36L, 0L, 1L, 2L)), c95.toString)
    assert(c95.getDouble(5) === r6d(lrInd(36, 0, 1, 2)) &&
      c95.getInt(6) === 1, c95.toString)
    // level 99: no exceptions at all -> lr_ind 0, nothing rejects
    val c99 = cl.find(_.getLong(0) == 99L).get
    assert((c99.getLong(1), c99.getLong(4), c99.getDouble(5), c99.getInt(6)) ===
      ((39L, 0L, 0.0, 0)), c99.toString)
    val sp = operators.EventQueries.q432(spark,
      ordersDir(1 to 81, plSeries(est ++ spread))).collect()
    // same THREE exceptions, spread out -> n11 = 0 -> independence holds
    val s95 = sp.find(_.getLong(0) == 95L).get
    assert((s95.getLong(1), s95.getLong(2), s95.getLong(3), s95.getLong(4)) ===
      ((34L, 2L, 3L, 0L)), s95.toString)
    assert(s95.getDouble(5) === r6d(lrInd(34, 2, 3, 0)) &&
      s95.getInt(6) === 0, s95.toString)
  }

  test("q433 estimates the planted universe from the marked/recaptured overlap") {
    // 10 users only in week A (days 1-7), 10 only in week B (days
    // 14-20), 5 in both; Chapman: (16*16)//6 - 1 = 41, Seber var =
    // (256*100)//252 = 101
    val rows =
      Seq((1, 1L, "view", 1.0)) ++ (2L to 10L).map(u => (2, u, "view", 1.0)) ++
      Seq((20, 11L, "view", 1.0)) ++ (12L to 20L).map(u => (15, u, "view", 1.0)) ++
      (21L to 25L).flatMap(u => Seq((3, u, "view", 1.0), (16, u, "view", 1.0)))
    val r = operators.EventQueries.q433(spark, eventsDir(rows)).head()
    def r6d(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === ((25L, 15L, 15L, 5L, 41L)), r.toString)
    assert(r.getDouble(5) === r6d(math.sqrt(101.0)), r.toString)
    assert(r.getLong(6) === 25L * 1000000L / 41L, r.toString)
  }

  /** lineitem+orders fixture for q434: (orderkey, day, discount,
    * returnflag); one lineitem per order. */
  private def cmhDir(rows: Seq[(Long, Int, Double, String)]): String = {
    val dir = Files.createTempDirectory("planted-cmh")
    rows.map { case (ok, _, disc, rf) => (ok, disc, rf) }
      .toDF("l_orderkey", "l_discount", "l_returnflag")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("lineitem.parquet").toString)
    rows.map { case (ok, day, _, _) => (ok, day.toLong) }
      .toDF("o_orderkey", "day")
      .withColumn("o_orderdate", timestamp_micros(
        ($"day" * 86400L + 43200L) * 1000000L))
      .select($"o_orderkey", $"o_orderdate")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("orders.parquet").toString)
    dir.toString
  }

  test("q434 recovers the planted common odds ratio across strata") {
    // two month strata, both with OR = 4: (a,b,c,d) = (8,2,4,4) and
    // (4,1,2,2); hand-chained micro truncations give OR_MH = 4000001
    def stratum(day: Int, okBase: Long, a: Int, b: Int, c: Int, d: Int) = {
      def mk(n: Int, disc: Double, rf: String, off: Long) =
        (0 until n).map(i => (okBase + off + i, day, disc, rf))
      mk(a, 0.10, "R", 0) ++ mk(b, 0.10, "N", 100) ++
        mk(c, 0.01, "R", 200) ++ mk(d, 0.01, "N", 300)
    }
    val or4 = operators.GovernanceQueries.q434(spark, cmhDir(
      stratum(5, 1000, 8, 2, 4, 4) ++ stratum(40, 2000, 4, 1, 2, 2)))
      .collect()
    assert(or4.length === 2)
    assert(or4.map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4))).toSeq === Seq((8L, 2L, 4L, 4L), (4L, 1L, 2L, 2L)))
    assert(or4.forall(_.getLong(5) === 4000001L), or4.toSeq.toString)
    // hand chain: dev = (8e6-6666666) + (4e6-3333333) = 2000001,
    // sv = 1 + 0 -> chi2 = (2.000001 - 0.5)^2 / 1 = 2.250003, no reject
    assert(or4.forall(r => r.getDouble(6) === 2.250003 && r.getInt(7) === 0),
      or4.toSeq.toString)
    // null-effect pole at verdict-bearing size: every stratum at
    // OR = 1, balanced margins -> dev = 0, chi2 = 0.25/sv, no reject
    val or1 = operators.GovernanceQueries.q434(spark, cmhDir(
      stratum(5, 1000, 20, 20, 20, 20) ++ stratum(40, 2000, 60, 30, 40, 20)))
      .collect()
    def r6d(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(or1.forall(_.getLong(5) === 1000000L), or1.toSeq.toString)
    // sv = V1 + V2 = 5 + 8 = 13 by the stated integer truncation
    assert(or1.forall(_.getDouble(6) === r6d(0.25 / 13.0)), or1.toSeq.toString)
    assert(or1.forall(_.getInt(7) === 0), "OR=1 must not reject")
  }

  test("q435 debiases the randomized-response rate to match a mechanism replay") {
    // 40 users, first 20 purchasers; flips replayed independently via
    // MessageDigest over the same md5 grid
    val rows = (1L to 40L).map(u =>
      (1, u, if (u <= 20L) "purchase" else "view", 1.0))
    val r = operators.GovernanceQueries.q435(spark, eventsDir(rows)).head()
    def flip(u: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$u#rr".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      if (java.lang.Long.parseLong(hex, 16) % 4 == 0) 1L else 0L
    }
    val flips = (1L to 40L).map(flip)
    val obs = (1L to 40L).map(u =>
      ((if (u <= 20L) 1L else 0L) + flips(u.toInt - 1)) % 2).sum
    val obsMicro = obs * 1000000L / 40L
    val deb = math.max(0L, math.min(1000000L, 2L * obsMicro - 500000L))
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) ===
      ((40L, flips.sum, 500000L, obsMicro, deb, math.abs(deb - 500000L))),
      s"$r vs flips=${flips.sum} obs=$obs")
  }

  test("q436 reads the planted count pattern as overdispersed and prices the zero cell") {
    // users 1-3: views only (count 0); user 4: four purchases
    // m = 1, v = 4 -> disp 4.0, r = 1/3, p = 1/4, zero_obs = 3/4
    val rows = (1L to 3L).map(u => (1, u, "view", 1.0)) ++
      (1 to 4).map(i => (i, 4L, "purchase", 1.0))
    val r = operators.EventQueries.q436(spark, eventsDir(rows)).head()
    def r6d(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6)) ===
      ((4L, 1000000L, 4000000L, 4000000L, 333333L, 250000L, 750000L)),
      r.toString)
    assert(r.getDouble(7) ===
      r6d(math.pow(333333.0 / (333333.0 + 1000000.0), 0.333333)), r.toString)
    assert(r.getDouble(8) === r6d(math.exp(-1.0)), r.toString)
    // equidispersed pole: every count 1 -> v = 0 < m, NB fit nulls
    val ones = (1L to 4L).map(u => (1, u, "purchase", 1.0))
    val p = operators.EventQueries.q436(spark, eventsDir(ones)).head()
    assert(p.getLong(2) === 0L && p.isNullAt(4) && p.isNullAt(7), p.toString)
    assert(p.getLong(6) === 0L, p.toString)
  }

  test("q437 matches a digest replay and reads near-uniform loads at both widths") {
    val docs = (1L to 200L).map(i => (i, s"w$i", "en", "s", 5L))
    val out = operators.DedupQueries.q437(spark, documentsDir(docs))
      .collect().map(r => r.getInt(0).toLong -> r).toMap
    def prefix(id: Long, k: Int): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(k)
    }
    Seq(4, 6).foreach { k =>
      val loads = (1L to 200L).groupBy(prefix(_, k)).map(_._2.size.toLong)
      val obs = loads.map(c => c * (c - 1) / 2).sum
      val d = math.pow(16, k).toLong
      val ratio =
        (BigInt(obs) * 2 * d * 1000000 / (BigInt(200) * 199)).toLong
      val r = out(k.toLong)
      assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ===
        ((200L, loads.size.toLong, loads.max, obs)), s"k=$k $r")
      assert(r.getLong(6) === ratio, s"k=$k ratio $r vs $ratio")
    }
    // at k=6 (16.7M buckets, 200 docs) collisions should be absent:
    // the uniformity read is exactly 0
    assert(out(6L).getLong(5) === 0L && out(6L).getLong(6) === 0L)
  }

  /** lineitem fixture for q438: explicit (orderkey, linenumber,
    * quantity, extendedprice). */
  private def mahaDir(rows: Seq[(Long, Int, Double, Double)]): String = {
    val dir = Files.createTempDirectory("planted-maha")
    rows.toDF("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("lineitem.parquet").toString)
    dir.toString
  }

  test("q438 surfaces the planted joint outlier and nulls on colinear data") {
    // 9 points on y = $x exactly, one at (9, $1): marginally ordinary,
    // jointly impossible. Replica: exact moments -> closed-form 2x2
    // whitened distance, the query's stated double tree.
    val pts = (1 to 9).map(i => (i.toLong, 1, i.toDouble, i.toDouble)) :+
      (100L, 1, 9.0, 1.0)
    val out = operators.Relational.q438(spark, mahaDir(pts)).collect()
    def replayD2(xs: Seq[(Long, Long)]): Seq[Double] = {
      val n = BigInt(xs.size)
      val sx = BigInt(xs.map(_._1).sum); val sy = BigInt(xs.map(_._2).sum)
      val a = n * xs.map(p => BigInt(p._1) * p._1).sum - sx * sx
      val b = n * xs.map(p => BigInt(p._1) * p._2).sum - sx * sy
      val c = n * xs.map(p => BigInt(p._2) * p._2).sum - sy * sy
      val mx = (sx * 1000000 / n).toLong; val my = (sy * 1000000 / n).toLong
      xs.map { case (x, y) =>
        val dx = (x * 1000000L - mx).toDouble / 1000000.0
        val dy = (y * 1000000L - my).toDouble / 1000000.0
        val det = a.toDouble * c.toDouble - b.toDouble * b.toDouble
        (n.toDouble * (n - 1).toDouble) *
          (c.toDouble * dx * dx - 2.0 * b.toDouble * dx * dy +
            a.toDouble * dy * dy) / det
      }
    }
    def r6d(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val d2s = replayD2(pts.map(p => (p._3.toLong, (p._4 * 100).toLong)))
    assert(out.head.getLong(0) === 100L, s"outlier not first: ${out.toSeq}")
    assert(out.head.getDouble(4) === r6d(d2s.last), out.head.toString)
    val expOut = d2s.count(_ > 5.991465)
    assert(out.forall(_.getLong(5) === expOut.toLong), out.toSeq.toString)
    // colinear pole: det = 0 -> NULL distances, zero outliers
    val col = (1 to 8).map(i => (i.toLong, 1, i.toDouble, 2.0 * i))
    val c = operators.Relational.q438(spark, mahaDir(col)).collect()
    assert(c.forall(_.isNullAt(4)) && c.forall(_.getLong(5) === 0L),
      c.toSeq.toString)
  }

  test("q439 prices MMR's diversity gain: zero on orthogonal lists, positive on clusters") {
    def vec(pairs: (Int, Float)*): Seq[Float] = {
      val a = Array.fill(64)(0f); pairs.foreach { case (i, v) => a(i) = v }
      a.toSeq
    }
    // orthogonal pole: every candidate ⊥ every other -> the MMR
    // penalty is identical for all, picks equal the relevance order,
    // both lists have pairwise distance exactly 1
    val ortho = (0L to 4L).map(i => (i, vec(i.toInt -> 1f), 0)) ++
      (0 until 20).map(j => (100L + j, vec(10 + j -> 1f), 1))
    val o = operators.SimilarityQueries.q439(spark, embeddingsDir(ortho))
      .collect()
    assert(o.length === 5)
    o.foreach { r =>
      assert(r.getDouble(1) === 1.0 && r.getDouble(2) === 1.0 &&
        r.getDouble(3) === 0.0 && r.getDouble(4) === 0.0 &&
        r.getDouble(5) === 0.0, r.toString)
    }
    // two-cluster pole: probe 0 sits between clusters A (axis 0, ids
    // 100..107) and B (axis 5, ids 200..207), all at rel = 1/√2. The
    // relevance tie-break fills the plain list from cluster A alone
    // (ILD exactly 0); MMR picks A,B then ties back to A —
    // {A,B,A,A,A} has 4 cross pairs of distance 1 -> ILD exactly 0.4.
    val cluster = (0L to 4L).map(i =>
      if (i == 0L) (0L, vec(0 -> 1f, 5 -> 1f), 0)
      else (i, vec(50 + i.toInt -> 1f), 0)) ++
      (0 until 8).map(j => (100L + j, vec(0 -> 1f), 1)) ++
      (0 until 8).map(j => (200L + j, vec(5 -> 1f), 2))
    val c = operators.SimilarityQueries.q439(spark, embeddingsDir(cluster))
      .collect().find(_.getLong(0) == 0L).get
    def r6d(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val rel = r6d(1.0 / math.sqrt(2.0))
    assert((c.getDouble(1), c.getDouble(2), c.getDouble(3), c.getDouble(4),
      c.getDouble(5)) === ((0.0, 0.4, 0.4, rel, rel)), c.toString)
  }

  /** lineitem+orders fixture for q440: (orderkey, day, extendedprice). */
  private def psiDir(rows: Seq[(Long, Int, Double)]): String = {
    val dir = Files.createTempDirectory("planted-psi")
    rows.map { case (ok, _, ext) => (ok, ext) }
      .toDF("l_orderkey", "l_extendedprice")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("lineitem.parquet").toString)
    rows.map { case (ok, day, _) => (ok, day.toLong) }
      .toDF("o_orderkey", "day")
      .withColumn("o_orderdate", timestamp_micros(
        ($"day" * 86400L + 43200L) * 1000000L))
      .select($"o_orderkey", $"o_orderdate")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("orders.parquet").toString)
    dir.toString
  }

  test("q440 reads identical months as PSI exactly 0 and a planted shift as a major band") {
    // ref month: cents 1..100, one each -> decile edges land exactly on
    // 10,20,...,90 and every bin holds 10
    val ref = (1 to 100).map(v => (v.toLong, 5, v / 100.0))
    val same = ref.map { case (ok, _, e) => (1000L + ok, 40, e) }
    val o = operators.GovernanceQueries.q440(spark, psiDir(ref ++ same))
      .collect()
    assert(o.length === 10)
    assert(o.forall(r => r.getLong(1) === 10L && r.getLong(2) === 10L))
    assert(o.forall(r => r.getDouble(5) === 0.0 && r.getInt(6) === 0),
      o.toSeq.toString)
    // shifted month: +50 cents pushes mass to the top bins -> PSI well
    // past the 0.25 action band. Replica derives cents THROUGH the
    // stated double grid (0.41 + 0.50 floors to 90, not 91 — the grid
    // semantics include that dust), then replays bins and the ln tree.
    val shifted = ref.map { case (ok, _, e) => (1000L + ok, 40, e + 0.50) }
    val s = operators.GovernanceQueries.q440(spark, psiDir(ref ++ shifted))
      .collect()
    def r6d(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val curCents = ref.map { case (_, _, e) =>
      math.floor((e + 0.50) * 100).toLong }
    val qCounts = Array.tabulate(10) { b =>
      curCents.count(c => (1 to 9).count(k => c > k * 10L) == b).toLong
    }
    val p = Array.fill(10)(11L * 1000000L / 110L)
    val q = qCounts.map(c => (c + 1L) * 1000000L / 110L)
    val psi = (0 until 10).map(i =>
      (p(i) - q(i)).toDouble / 1000000.0 *
        math.log(p(i).toDouble / q(i).toDouble)).sum
    assert(s.forall(r => r.getDouble(5) === r6d(psi) && r.getInt(6) === 2),
      s"${s.head} vs $psi (qCounts ${qCounts.toSeq})")
  }

  test("q441 reads the planted geometric tail exactly and nulls a flat one") {
    // top-17 order values 2^16..2^0 dollars: ln ratios are j*ln2, so
    // sum_ln = 136*ln2 and alpha = 16/(136*ln2) exactly through the
    // stated tree
    def r6d(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val geo = operators.Relational.q441(spark, ordersDir(1 to 20,
      d => if (d <= 17) math.pow(2.0, 17.0 - d) else 1.0)).collect()
    assert(geo.length === 16)
    assert(geo.head.getLong(2) === (1L << 16) * 100L &&
      geo.head.getLong(3) === 100L, geo.head.toString)
    val cents = (1 to 17).map(d => math.pow(2.0, 17.0 - d).toLong * 100L)
    val sumLn = (0 until 16).map(i =>
      math.log(cents(i).toDouble / cents(16).toDouble)).sum
    assert(geo.forall(r => r.getDouble(4) === r6d(sumLn) &&
      r.getDouble(5) === r6d(16.0 / sumLn)), s"${geo.head} vs $sumLn")
    // flat pole: every order identical -> sum_ln = 0, alpha NULL
    val flat = operators.Relational.q441(spark,
      ordersDir(1 to 20, _ => 500.0)).collect()
    assert(flat.forall(r => r.getDouble(4) === 0.0 && r.isNullAt(5)),
      flat.head.toString)
  }

  test("q442 reads a ramp as zero entropy and an alternation as exactly ln2/ln6") {
    def r6d(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // strictly increasing: every triple is pattern 7 -> H = 0
    val ramp = operators.EventQueries.q442(spark,
      ordersDir(1 to 30, d => d * 10.0)).collect()
    assert(ramp.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((0L, 0L), (1L, 0L), (3L, 0L), (4L, 0L), (6L, 0L), (7L, 28L)))
    assert(ramp.forall(r => r.getDouble(3) === 0.0 && r.getDouble(4) === 0.0))
    // perfect alternation: two patterns split evenly -> H = ln 2
    val alt = operators.EventQueries.q442(spark,
      ordersDir(1 to 40, d => if (d % 2 == 1) 100.0 else 200.0)).collect()
    val hit = alt.filter(_.getLong(1) > 0L)
    assert(hit.map(_.getLong(0)).toSet === Set(3L, 6L), alt.toSeq.toString)
    assert(hit.forall(_.getLong(2) === 500000L))
    val h = -2.0 * (0.5 * math.log(0.5))
    assert(alt.forall(r => r.getDouble(3) === r6d(h) &&
      r.getDouble(4) === r6d(h / 1.791759469228055)), alt.head.toString)
  }

  test("q443 walks the alternating series' exact ACF through a Durbin-Levinson replay") {
    // alternation gives exact acf_micro = trunc((-1)^k (n-k) 1e6 / n);
    // the PACF replica runs the same unrolled recursion on those values
    val out = operators.EventQueries.q443(spark,
      ordersDir(1 to 40, d => if (d % 2 == 1) 100.0 else 200.0)).collect()
    def r6d(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val rMicro = (1 to 7).map(k =>
      (BigInt(if (k % 2 == 1) -(40 - k) else 40 - k) * 1000000 / 40).toLong)
    out.zip(rMicro).foreach { case (r, m) =>
      assert(r.getLong(2) === m, s"acf $r vs $m") }
    val r = rMicro.map(_.toDouble / 1000000.0)
    val phi = Array.ofDim[Double](8, 8)
    phi(1)(1) = r(0)
    for (k <- 2 to 7) {
      val num = r(k - 1) -
        (1 until k).map(j => phi(k - 1)(j) * r(k - j - 1)).reduce(_ + _)
      val den = 1.0 -
        (1 until k).map(j => phi(k - 1)(j) * r(j - 1)).reduce(_ + _)
      phi(k)(k) = num / den
      for (j <- 1 until k)
        phi(k)(j) = phi(k - 1)(j) - phi(k)(k) * phi(k - 1)(k - j)
    }
    out.foreach { row =>
      val k = row.getLong(0).toInt
      assert(row.getDouble(3) === r6d(phi(k)(k)), s"pacf $row vs ${phi(k)(k)}")
    }
    assert(out.head.getDouble(3) === r6d(-0.975), "phi_11 must equal rho_1")
  }

  /** orders+lineitem+part fixture for q444: one order per
    * (customer, brand) purchase. */
  private def bipartiteDir(rows: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("planted-nodf")
    val brands = rows.map(_._2).distinct.sorted.zipWithIndex.toMap
    rows.zipWithIndex.map { case ((c, b), i) =>
      (i.toLong, c, brands(b).toLong) }
      .toDF("ok", "cust", "pk")
      .select($"ok".as("o_orderkey"), $"cust".as("o_custkey"))
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("orders.parquet").toString)
    rows.zipWithIndex.map { case ((_, b), i) => (i.toLong, brands(b).toLong) }
      .toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("lineitem.parquet").toString)
    brands.toSeq.map { case (b, k) => (k.toLong, b) }
      .toDF("p_partkey", "p_brand")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("part.parquet").toString)
    dir.toString
  }

  test("q444 reads perfect nesting as exactly 1e6 and disjoint tiers as 0") {
    // nested: N(C) ⊂ N(B) ⊂ N(A) -> every ordered pair fully overlaps
    val nested = (1L to 4L).map(c => (c, "A")) ++
      (1L to 2L).map(c => (c, "B")) :+ ((1L, "C"))
    val n = operators.GraphQueries.q444(spark, bipartiteDir(nested)).collect()
    assert(n.map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq ===
      Seq(("A", 4L, 1), ("B", 2L, 2), ("C", 1L, 3)))
    assert(n.forall(r => r.getLong(3) === 3L && r.getLong(4) === 1000000L),
      n.toSeq.toString)
    // disjoint tiers with distinct degrees: zero overlap everywhere
    val disjoint = (1L to 3L).map(c => (c, "A")) ++
      (4L to 5L).map(c => (c, "B")) :+ ((6L, "C"))
    val d = operators.GraphQueries.q444(spark, bipartiteDir(disjoint)).collect()
    assert(d.forall(r => r.getLong(4) === 0L), d.toSeq.toString)
    assert(d.forall(r => r.getLong(3) === 0L), "no pair should contribute")
  }

  test("q445 reads the planted gap multiset as exact hazards with the exponential benchmark") {
    // gaps {1, 2, 2, 7}: at-risk suffix 4/3/1, mean gap 3
    val rows = Seq((1, 1L), (3, 1L), (5, 1L), (1, 2L), (2, 2L),
      (1, 3L), (8, 3L)).map { case (d, u) => (d, u, "purchase", 1.0) }
    val out = operators.EventQueries.q445(spark, eventsDir(rows))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq === Seq(
      (1L, 1L, 4L, 250000L, 3000000L, 333333L),
      (2L, 2L, 3L, 666666L, 3000000L, 333333L),
      (7L, 1L, 1L, 1000000L, 3000000L, 333333L)), out.toSeq.toString)
  }

  test("q446 surfaces the planted heaped ending and rejects uniformity") {
    // 30 orders ending .99, ten one-off endings; expectations replayed
    // through the stated cents grid (the q440 float-dust lesson)
    def dollars(d: Int): Double = if (d <= 30) 9.99 else 10.0 + d / 100.0
    val out = operators.Relational.q446(spark,
      ordersDir(1 to 40, dollars)).collect()
    val endings = (1 to 40).map(d =>
      (math.floor(dollars(d) * 100) % 100).toLong)
    val counts = endings.groupBy(identity).map { case (e, g) => e -> g.size.toLong }
    val ssq = (0L to 99L).map { e =>
      val o = counts.getOrElse(e, 0L); BigInt(100 * o - 40) * (100 * o - 40)
    }.sum
    def r6d(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val chi2 = r6d(ssq.toDouble / (100.0 * 40.0))
    assert(out.head.getLong(0) === 99L && out.head.getLong(1) === 30L &&
      out.head.getLong(2) === 750000L, out.head.toString)
    assert(out.forall(r => r.getDouble(3) === chi2 && r.getInt(4) === 1),
      s"${out.head} vs $chi2")
    assert(out.length === 10)
  }

  test("q447 reads planted frequency spectra as exact Yule K values") {
    // en: freqs {3,2,1} -> K = 1e4*(14-6)/36; zh: all singletons -> 0
    val docs = Seq((1L, "a a a b b c", "en", "s", 11L),
      (2L, "w x y z", "zh", "s", 7L))
    val out = operators.TextQueries.q447(spark, documentsDir(docs))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val enK = (BigInt(8) * 10000L * 1000000L / 36).toLong // 2222222222
    assert(out.toSeq === Seq(("en", 6L, 3L, enK), ("zh", 4L, 4L, 0L)),
      out.toSeq.toString)
  }

  test("q448 ranks the planted paired shifts and rejects only the one-sided pole") {
    def lines(m4: Map[String, Double], m3: Map[String, Double] = Map()):
        Seq[(String, Int, Double, Double)] =
      m4.keys.toSeq.flatMap { b =>
        Seq((b, 5, 10.0, 1.0), (b, 35, 10.0, 1.0),
          (b, 63, m3.getOrElse(b, 10.0), 1.0), (b, 94, m4(b), 1.0))
      }
    // diffs +100 +200 +300 +400 -500 cents: doubled ranks 2..10,
    // W2+ = 20, mu2 = 15, sd = sqrt(55) -> z = 5/sqrt(55), no reject
    val mixed = operators.Relational.q448(spark, elasticityLinesDir(lines(
      Map("BA" -> 11.0, "BB" -> 12.0, "BC" -> 13.0, "BD" -> 14.0,
        "BE" -> 5.0)))).collect()
    def r6d(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(mixed.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      === Seq(("BA", 100L, 2L), ("BB", 200L, 4L), ("BC", 300L, 6L),
        ("BD", 400L, 8L), ("BE", -500L, 10L)), mixed.toSeq.toString)
    assert(mixed.forall(r => r.getLong(4) === 20L &&
      r.getDouble(5) === r6d(5.0 / math.sqrt(55.0)) && r.getInt(6) === 0),
      mixed.head.toString)
    // one-sided pole: every brand up -> W2+ = 30, z = 15/sqrt(55) > 1.96
    val up = operators.Relational.q448(spark, elasticityLinesDir(lines(
      Map("BA" -> 11.0, "BB" -> 12.0, "BC" -> 13.0, "BD" -> 14.0,
        "BE" -> 15.0)))).collect()
    assert(up.forall(r => r.getLong(4) === 30L &&
      r.getDouble(5) === r6d(15.0 / math.sqrt(55.0)) && r.getInt(6) === 1),
      up.head.toString)
  }

  test("q449 places the planted processes on the (B, M) plane exactly") {
    // metronome: gaps all 3 -> B = -1 exactly, gap pairs have zero
    // variance -> M NULL
    val metro = Seq(1, 4, 7, 10, 13).map(d => (d, 1L, "purchase", 1.0))
    val m = operators.EventQueries.q449(spark, eventsDir(metro)).head()
    assert((m.getLong(0), m.getLong(1), m.getDouble(2)) ===
      ((4L, 3000000L, -1.0)), m.toString)
    assert(m.getLong(3) === 3L && m.isNullAt(4), m.toString)
    // alternation 1,9,1,9: B = (16-20)/(16+20) = -1/9; consecutive
    // gaps perfectly anti-correlated -> M = -1 exactly
    val alt = Seq(1, 2, 11, 12, 21).map(d => (d, 1L, "purchase", 1.0))
    val a = operators.EventQueries.q449(spark, eventsDir(alt)).head()
    def r6d(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert((a.getLong(0), a.getLong(1)) === ((4L, 5000000L)), a.toString)
    assert(a.getDouble(2) === r6d(-4.0 / 36.0), a.toString)
    assert(a.getLong(3) === 3L && a.getDouble(4) === -1.0, a.toString)
  }

  test("q428 peels the planted triangle ladder in cascading rounds and keeps the K4") {
    // ladder 1..8: edges (i,i+1) and (i,i+2); long edges and the two
    // end short edges have support 1 -> round 1 drops 8 of 13, leaving
    // the interior path, which is triangle-free -> round 2 empties it.
    // The CASCADE (round 2 removing edges that had support 2 at round
    // 1) is what separates a truss from a static triangle count.
    val ladder = (1L to 7L).map(i => (i, i, i + 1)) ++
      (1L to 6L).map(i => (100L + i, i, i + 2))
    val lrows = operators.GraphQueries.q428(spark,
      coPurchaseDir(ladder.flatMap { case (ok, a, b) => Seq((ok, a), (ok, b)) }))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(lrows.toSeq === Seq((1, 13L, 6L, 5L), (2, 5L, 0L, 0L),
      (3, 0L, 0L, 0L)), s"${lrows.toSeq}")
    // K4 in one order: every edge closes 2 triangles -> stable 4-truss
    val k4 = (1L to 4L).map(p => (1L, p))
    val krows = operators.GraphQueries.q428(spark, coPurchaseDir(k4))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(krows.toSeq === Seq((1, 6L, 4L, 6L), (2, 6L, 4L, 6L),
      (3, 6L, 4L, 6L)), s"${krows.toSeq}")
  }

  /** orders-only fixture on a MONTHLY grid: one order of
    * `dollars(m)` on the 15th of month m (1..12) of 2020. Dollars in
    * multiples of 1000 land exactly on the econometrics queries' kilo
    * grid. */
  private def monthlyOrdersDir(months: Range, dollars: Int => Double): String = {
    val dir = Files.createTempDirectory("planted-mord")
    months.map(m => (m, dollars(m))).toDF("m", "o_totalprice")
      .withColumn("o_orderdate",
        to_timestamp(format_string("2020-%02d-15", $"m")))
      .withColumn("o_orderkey", $"m".cast("long"))
      .select($"o_orderkey", $"o_orderdate", $"o_totalprice")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("orders.parquet").toString)
    dir.toString
  }

  /** two-segment monthly fixture for q451: per month m, an AUTOMOBILE
    * order of x(m)·1000 dollars (custkey 1) and a BUILDING order of
    * y(m)·1000 (custkey 2). */
  private def segMonthlyDir(months: Range, x: Int => Long, y: Int => Long): String = {
    val dir = Files.createTempDirectory("planted-seg")
    months.flatMap(m => Seq((1L, m * 10L, x(m) * 1000.0, m),
        (2L, m * 10L + 1L, y(m) * 1000.0, m)))
      .toDF("o_custkey", "o_orderkey", "o_totalprice", "m")
      .withColumn("o_orderdate",
        to_timestamp(format_string("2020-%02d-15", $"m")))
      .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"o_orderdate")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("orders.parquet").toString)
    Seq((1L, "AUTOMOBILE"), (2L, "BUILDING"))
      .toDF("c_custkey", "c_mktsegment")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("customer.parquet").toString)
    dir.toString
  }

  private def r6d(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  /** orders fixture with one ROW PER ORDER on a monthly grid mapped
    * into real years: month index m (1-based) lands in
    * year0 + (m−1) div 12, month (m−1) mod 12 + 1. */
  private def perOrderMonthlyDir(year0: Int, rows: Seq[(Int, Double)]): String = {
    val dir = Files.createTempDirectory("planted-pmo")
    rows.zipWithIndex.map { case ((m, dol), i) => (i.toLong, m, dol) }
      .toDF("o_orderkey", "m", "o_totalprice")
      .withColumn("o_orderdate", to_timestamp(format_string("%04d-%02d-15",
        lit(year0) + expr("int((m - 1) div 12)"),
        expr("int((m - 1) % 12) + 1"))))
      .select($"o_orderkey", $"o_orderdate", $"o_totalprice")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("orders.parquet").toString)
    dir.toString
  }

  /** BigInt moment replay for single-regressor OLS over (t, y):
    * returns (n, E, Cxx) with E = Cyy·Cxx − Cxy², the exact SSE
    * numerator (true SSE = E/(n·Cxx)). */
  private def sseMoments(pts: Seq[(Long, Long)]): (BigInt, BigInt, BigInt) = {
    val n = BigInt(pts.size)
    val st = pts.map(p => BigInt(p._1)).sum
    val sy = pts.map(p => BigInt(p._2)).sum
    val stt = pts.map(p => BigInt(p._1) * p._1).sum
    val sty = pts.map(p => BigInt(p._1) * p._2).sum
    val syy = pts.map(p => BigInt(p._2) * p._2).sum
    val cxx = n * stt - st * st
    val e = (n * syy - sy * sy) * cxx - (n * sty - st * sy) * (n * sty - st * sy)
    (n, e, cxx)
  }

  test("q451 reads the planted cointegrated pair as rho = -12/11 and nulls the exact-multiple pole") {
    // y = 2x + e with e the period-4 pattern (+1,-1,-1,+1): Σe = 0 and
    // Σt·e = 0, so the long-run OLS is EXACTLY y = 2x and the cleared
    // residual is proportional to e. DF on e over the 11 lag pairs:
    // num = Σ e_prev·e − 11 = −1 − 11, den = 11 → rho = −12/11.
    val e = Seq(1L, -1L, -1L, 1L, 1L, -1L, -1L, 1L, 1L, -1L, -1L, 1L)
    val co = segMonthlyDir(1 to 12, m => 10L + m, m => 2L * (10L + m) + e(m - 1))
    val r = operators.EconometricsQueries.q451(spark, co).head()
    assert(r.getLong(0) === 11L, r.toString)
    assert(r.getDouble(1) === r6d(-12.0 / 11.0), r.toString)
    // pole: y exactly 3x -> residual identically 0 -> den = 0 -> NULL
    val pole = segMonthlyDir(1 to 12, m => 10L + m, m => 3L * (10L + m))
    val p = operators.EconometricsQueries.q451(spark, pole).head()
    assert(p.isNullAt(1), p.toString)
  }

  test("q452 reads alternation as small, trend as large, constant as NULL") {
    // alternation 2,4 kilo: c = ±12, S alternates -12,0 ->
    // ΣS² = 6·144, Σc² = 12·144 -> micro = 864e6 div 20736 = 41666
    val alt = monthlyOrdersDir(1 to 12,
      m => (if (m % 2 == 1) 2000.0 else 4000.0))
    val a = operators.EconometricsQueries.q452(spark, alt).head()
    assert(a.getLong(0) === 12L && a.getLong(1) === 41666L, a.toString)
    // pure trend x = m: c_t = 12t - 78, S_t = 6t(t-12); exact integer
    // replay of the statistic in BigInt below
    val tr = monthlyOrdersDir(1 to 12, m => m * 1000.0)
    val t = operators.EconometricsQueries.q452(spark, tr).head()
    val c = (1 to 12).map(tt => BigInt(12 * tt - 78))
    val sParts = c.scanLeft(BigInt(0))(_ + _).tail
    val expect = (sParts.map(s => s * s).sum * 1000000) /
      (12 * c.map(x => x * x).sum)
    assert(t.getLong(1) === expect.toLong,
      s"${t.toString} vs replayed $expect")
    assert(t.getLong(1) > 10 * a.getLong(1),
      "trend must read far less stationary than alternation")
    // pole: constant series -> zero variance -> NULL
    val const = monthlyOrdersDir(1 to 12, _ => 5000.0)
    assert(operators.EconometricsQueries.q452(spark, const).head().isNullAt(1))
  }

  test("q453 credits the true lag direction, matches the BigInt replay, and nulls the perfect fit") {
    // y follows x's LAG (plus a +-1 kick so no fit is perfect); x is
    // its own process. AUTO->BUILD must dwarf BUILD->AUTO, and both F
    // values must equal the exact-moment replay bit for bit.
    val xs = Seq(10L, 13L, 11L, 16L, 12L, 19L, 11L, 14L, 17L, 12L, 18L, 13L)
    val kick = Seq(1L, -1L, 1L, -1L, 1L, -1L, 1L, -1L, 1L, -1L, 1L)
    val ys = 20L +: (1 until 12).map(t => 2L * xs(t - 1) + kick(t - 1))
    val d = segMonthlyDir(1 to 12, m => xs(m - 1), m => ys(m - 1))
    def replayF(dep: Seq[Long], own: Seq[Long], cr: Seq[Long]): Double = {
      val n = BigInt(dep.size)
      def s(v: Seq[Long]) = v.map(BigInt(_)).sum
      def sp(a: Seq[Long], b: Seq[Long]) =
        a.zip(b).map { case (u, v) => BigInt(u) * v }.sum
      val (sy, s1, s2) = (s(dep), s(own), s(cr))
      val cyy = n * sp(dep, dep) - sy * sy
      val cy1 = n * sp(dep, own) - sy * s1
      val cy2 = n * sp(dep, cr) - sy * s2
      val c11 = n * sp(own, own) - s1 * s1
      val c12 = n * sp(own, cr) - s1 * s2
      val c22 = n * sp(cr, cr) - s2 * s2
      val det = c11 * c22 - c12 * c12
      val q3 = cy1 * cy1 * c22 - BigInt(2) * cy1 * cy2 * c12 + cy2 * cy2 * c11
      val rssr = cyy * c11 - cy1 * cy1
      val sseu = cyy * det - q3
      r6d((n - 3).toDouble *
        (rssr.toDouble * det.toDouble - sseu.toDouble * c11.toDouble) /
        (sseu.toDouble * c11.toDouble))
    }
    val dep = ys.drop(1); val ylag = ys.dropRight(1); val xlag = xs.dropRight(1)
    val out = operators.EconometricsQueries.q453(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out("AUTO->BUILD") === ((11L, replayF(dep, ylag, xlag))), out.toString)
    assert(out("BUILD->AUTO") ===
      ((11L, replayF(xs.drop(1), xlag, ylag))), out.toString)
    assert(out("AUTO->BUILD")._2 > 10 * out("BUILD->AUTO")._2,
      s"lagged-x dependence must dominate: $out")
    // pole: y_t = 3·x_{t-1} EXACTLY for t>=2 -> unrestricted SSE 0
    val ype = 20L +: (1 until 12).map(t => 3L * xs(t - 1))
    val pole = segMonthlyDir(1 to 12, m => xs(m - 1), m => ype(m - 1))
    val pr = operators.EconometricsQueries.q453(spark, pole).collect()
      .find(_.getString(0) == "AUTO->BUILD").get
    assert(pr.isNullAt(2), pr.toString)
  }

  test("q454 matches the BigInt+grid replay on the planted fan and nulls constant volume") {
    // volume z = month index; spread of the monthly total grows with z
    // (the classic heteroscedastic fan). Dollars in millions so the
    // cleared residual survives the documented 1e6 grid division.
    val zs = (1 to 12).map(_.toLong)
    val spread = Seq(1L, -1L, 2L, -2L, 3L, -3L, 4L, -4L, 5L, -5L, 6L, -6L)
    // month m: z orders totalling (1000·m + spread·m) thousand kilo
    val totalsK = (1 to 12).map(m => 1000000L * m + spread(m - 1) * 1000L * m)
    val rows = (1 to 12).flatMap { m =>
      val per = totalsK(m - 1) / zs(m - 1) // kilo per order
      val rem = totalsK(m - 1) - per * (zs(m - 1) - 1)
      (1L until zs(m - 1)).map(_ => (m, per * 1000.0)) :+ (m, rem * 1000.0)
    }
    val d = perOrderMonthlyDir(2020, rows)
    val out = operators.EconometricsQueries.q454(spark, d).head()
    // exact replay: clear residuals of y~z, truncate to the 1e6 grid,
    // square, closed-form R², same double order
    val n = BigInt(12)
    val ys = totalsK
    def s(v: Seq[Long]) = v.map(BigInt(_)).sum
    def sp(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).map { case (u, v) => BigInt(u) * v }.sum
    val (sz, sy) = (s(zs), s(ys))
    val (szz, szy) = (sp(zs, zs), sp(zs, ys))
    val dD = n * szz - sz * sz
    val bB = n * szy - sz * sy
    val cC = sy * szz - sz * szy
    val u = zs.zip(ys).map { case (z, y) => dD * y - cC - bB * z }
    val w = u.map(ui => (ui / 1000000) * (ui / 1000000)) // BigInt '/', Spark 'div', DuckDB '//' all truncate toward zero
    val sw = w.sum
    val szw = zs.zip(w).map { case (z, wi) => BigInt(z) * wi }.sum
    val sww = w.map(wi => wi * wi).sum
    val czz = dD
    val czw = n * szw - sz * sw
    val cww = n * sww - sw * sw
    val expect = r6d(n.toDouble * (czw.toDouble * czw.toDouble) /
      (czz.toDouble * cww.toDouble))
    assert(out.getLong(0) === 12L && out.getDouble(1) === expect,
      s"$out vs replay $expect")
    assert(out.getDouble(1) > 5.0,
      s"planted fan should read as strong heteroscedasticity: $out")
    // pole: one order per month -> z constant -> Czz = 0 -> NULL
    val const = perOrderMonthlyDir(2020, (1 to 12).map(m => (m, 1000000.0)))
    assert(operators.EconometricsQueries.q454(spark, const).head().isNullAt(1))
  }

  test("q455 flags the planted slope break, matches the replay, and nulls degenerate regimes") {
    // 24 months spanning 1997-1998 (break after month 12): pre slope
    // 10, post slope 50, both with an alternating ±1 kick so no SSE
    // is zero.
    def kick(t: Int) = if (t % 2 == 0) 1L else -1L
    def preY(t: Int) = 100L + 10L * t + kick(t)
    def postY(t: Int) = preY(12) + 50L * (t - 12) + kick(t)
    val break24 = perOrderMonthlyDir(1997,
      (1 to 24).map(m => (m, (if (m <= 12) preY(m) else postY(m)) * 1000.0)))
    val out = operators.EconometricsQueries.q455(spark, break24).head()
    val pts = (1 to 24).map(t =>
      (t.toLong, if (t <= 12) preY(t) else postY(t)))
    val (np, ep, vp) = sseMoments(pts)
    val (na, ea, va) = sseMoments(pts.take(12))
    val (nb, eb, vb) = sseMoments(pts.drop(12))
    def sse(e: BigInt, n: BigInt, v: BigInt) =
      e.toDouble / (n.toDouble * v.toDouble)
    val fExp = r6d(((sse(ep, np, vp) - sse(ea, na, va) - sse(eb, nb, vb)) / 2.0) /
      ((sse(ea, na, va) + sse(eb, nb, vb)) / (np.toDouble - 4.0)))
    assert(out.getLong(0) === 12L && out.getLong(1) === 12L, out.toString)
    assert(out.getDouble(2) === fExp, s"$out vs replay $fExp")
    assert(out.getDouble(2) > 100.0,
      s"planted slope break must read as a massive F: $out")
    // stable line (same slope + kick throughout) -> small F, same replay
    val stable = perOrderMonthlyDir(1997,
      (1 to 24).map(m => (m, (100L + 10L * m + kick(m)) * 1000.0)))
    val so = operators.EconometricsQueries.q455(spark, stable).head()
    assert(so.getDouble(2) < 1.0, so.toString)
    // pole: pre-regime shorter than 3 months -> NULL
    val short = perOrderMonthlyDir(1997,
      (11 to 24).map(m => (m, (100L + 10L * m + kick(m)) * 1000.0)))
    assert(operators.EconometricsQueries.q455(spark, short).head().isNullAt(2))
  }

  test("q459 pins the planted outlier as the only influential month, exact vs replay") {
    // flat line 100 kilo with one 200-kilo spike at t=12: only the
    // spike month may cross the 4/n Cook threshold
    val ys = (1 to 12).map(m => if (m == 12) 200L else 100L)
    val d = perOrderMonthlyDir(2020, (1 to 12).map(m => (m, ys(m - 1) * 1000.0)))
    val out = operators.EconometricsQueries.q459(spark, d).collect()
      .map(r => (r.getInt(0).toLong, r.getDouble(1), r.getDouble(2), r.getInt(3)))
    // exact replay of the integer + double pipeline
    val n = BigInt(12)
    val ts = (1 to 12).map(_.toLong)
    def s(v: Seq[Long]) = v.map(BigInt(_)).sum
    def sp(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).map { case (u, v) => BigInt(u) * v }.sum
    val (st, sy) = (s(ts), s(ys))
    val cxx = n * sp(ts, ts) - st * st
    val cxy = n * sp(ts, ys) - st * sy
    val vs = ts.zip(ys).map { case (t, y) =>
      cxx * (n * y - sy) - cxy * (n * t - st) }
    val hns = ts.map(t => cxx + (n * t - st) * (n * t - st))
    val svv = vs.map(v => v * v).sum
    val nc = n.toDouble * cxx.toDouble
    val s2 = (svv.toDouble / (nc * nc)) / (n.toDouble - 2.0)
    val expect = ts.indices.map { i =>
      val e = vs(i).toDouble / nc; val h = hns(i).toDouble / nc
      val cook = e * e * h / (2.0 * s2 * (1.0 - h) * (1.0 - h))
      (202000L + ts(i), r6d(h), r6d(cook), if (cook > 4.0 / 12.0) 1 else 0)
    }
    assert(out.toSeq === expect, s"${out.toSeq}\nvs\n$expect")
    assert(out.count(_._4 == 1) === 1 && out.find(_._4 == 1).get._1 === 202012L,
      s"only the planted spike month may be influential: ${out.toSeq}")
    // leverage is symmetric and maximal at the ends of a full design
    assert(out.head._2 === out.last._2 && out.head._2 > out(5)._2, out.toSeq.toString)
  }

  test("q460 prefers the planted seasonal structure and nulls the constant differential") {
    // exact 12-month pattern repeated twice: seasonal-naive is PERFECT
    // on months 13..24, naive is not -> sign +1, t2 matches the replay
    val pat = Seq(100L, 140L, 90L, 160L, 120L, 80L, 150L, 110L, 95L, 130L, 85L, 145L)
    val ys = pat ++ pat
    val d = perOrderMonthlyDir(1997, (1 to 24).map(m => (m, ys(m - 1) * 1000.0)))
    val out = operators.EconometricsQueries.q460(spark, d).head()
    val ds = (13 to 24).map { t =>
      val e1 = BigInt(ys(t - 1) - ys(t - 2)); e1 * e1 // f12 loss is 0
    }
    val (n, sd, sdd) = (BigInt(12), ds.sum, ds.map(x => x * x).sum)
    val expect = ((n - 1) * sd * sd * 1000000) / (n * sdd - sd * sd)
    assert((out.getLong(0), out.getInt(1), out.getLong(2)) ===
      ((12L, 1, expect.toLong)), s"$out vs replay $expect")
    // pole: pure linear trend -> d_t = k² − (12k)² constant -> zero
    // variance -> NULL, sign −1 (naive wins)
    val lin = perOrderMonthlyDir(1997, (1 to 24).map(m => (m, (100L + 10L * m) * 1000.0)))
    val po = operators.EconometricsQueries.q460(spark, lin).head()
    assert(po.getInt(1) === -1 && po.isNullAt(2), po.toString)
  }

  test("q461 reads the planted layout manifests exactly for all four candidate keys") {
    val dir = Files.createTempDirectory("planted-padv")
    Seq((1L, 1, "A"), (1L, 1, "A"), (2L, 1, "R"), (2L, 2, "A"), (3L, 2, "R"))
      .toDF("l_suppkey", "day", "l_returnflag")
      .withColumn("l_shipdate", timestamp_micros(
        ($"day".cast("long") * 86400L + 43200L) * 1000000L))
      .select($"l_suppkey", $"l_returnflag", $"l_shipdate")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("lineitem.parquet").toString)
    val out = operators.LakehouseQueries.q461(spark, dir.toString).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(out.toSeq === Seq(
      ("day", 2L, 5L, 3L, 2500000L, 1200000L, 500000L, 2L),
      ("month", 1L, 5L, 5L, 5000000L, 1000000L, 1000000L, 1L),
      ("returnflag", 2L, 5L, 3L, 2500000L, 1200000L, 500000L, 2L),
      ("supplier", 3L, 5L, 2L, 1666666L, 1200000L, 333333L, 3L)),
      out.toSeq.toString)
  }

  test("q462 recovers the planted positive autocorrelation and matches the replay") {
    // y = 100 + 5t + e with e in runs of three: rho-hat > 0, and the
    // corrected slope must match the BigInt+double replay exactly
    val e = Seq(10L, 10L, 10L, -10L, -10L, -10L)
    val ys = (1 to 12).map(t => 100L + 5L * t + e((t - 1) % 6))
    val d = perOrderMonthlyDir(2020, (1 to 12).map(m => (m, ys(m - 1) * 1000.0)))
    val out = operators.EconometricsQueries.q462(spark, d).head()
    // replay
    val n = BigInt(12); val ts = (1 to 12).map(_.toLong)
    def s(v: Seq[Long]) = v.map(BigInt(_)).sum
    def sp(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).map { case (u, v) => BigInt(u) * v }.sum
    val (st, sy) = (s(ts), s(ys))
    val (stt, sty) = (sp(ts, ts), sp(ts, ys))
    val cxx = n * stt - st * st; val cxy = n * sty - st * sy
    val vs = ts.zip(ys).map { case (t, y) =>
      cxx * (n * y - sy) - cxy * (n * t - st) }
    def truncDiv(a: BigInt, b: BigInt) = a / b // both engines truncate to zero
    val rho = truncDiv(vs.init.zip(vs.tail).map { case (p, c) => p * c }.sum
      * 1000000, vs.init.map(v => v * v).sum)
    val tts = (2 to 12).map(t => BigInt(1000000) * t - rho * (t - 1))
    val yys = (2 to 12).map(t =>
      BigInt(1000000) * ys(t - 1) - rho * ys(t - 2))
    val n2 = BigInt(11)
    val det2 = n2 * tts.map(x => x * x).sum - tts.sum * tts.sum
    val num2 = n2 * tts.zip(yys).map { case (a, b) => a * b }.sum -
      tts.sum * yys.sum
    assert(out.getLong(0) === 12L && out.getLong(1) === rho.toLong, out.toString)
    assert(rho > 300000, s"planted runs must read as strong positive rho: $rho")
    assert(out.getDouble(2) === r6d(cxy.toDouble / cxx.toDouble), out.toString)
    assert(out.getDouble(3) === r6d(num2.toDouble / det2.toDouble),
      s"$out vs replay ${r6d(num2.toDouble / det2.toDouble)}")
  }

  test("q464 reads planted runs as inflation, alternation as deflation, exact vs replay") {
    def ratio(ys: Seq[Long]): Long = {
      val n = BigInt(12); val ts = (1 to 12).map(_.toLong)
      def s(v: Seq[Long]) = v.map(BigInt(_)).sum
      def sp(a: Seq[Long], b: Seq[Long]) =
        a.zip(b).map { case (u, v) => BigInt(u) * v }.sum
      val (st, sy) = (s(ts), s(ys))
      val cxx = n * sp(ts, ts) - st * st
      val cxy = n * sp(ts, ys) - st * sy
      val vs = ts.zip(ys).map { case (t, y) =>
        cxx * (n * y - sy) - cxy * (n * t - st) }
      val g = (0 to 4).map(l =>
        (l.toLong, vs.drop(l).zip(vs.dropRight(l)).map { case (c, p) => c * p }.sum))
      val g0 = g.head._2
      val w = g.tail.map { case (l, gl) => BigInt(5 - l) * gl * 2 }.sum
      (((BigInt(5) * g0 + w) * 1000000) / (BigInt(5) * g0)).toLong
    }
    val runs = (1 to 12).map(t => 100L + (if (((t - 1) / 4) % 2 == 0) 10L else -10L))
    val alt = (1 to 12).map(t => 100L + (if (t % 2 == 0) 10L else -10L))
    val rRuns = operators.EconometricsQueries.q464(spark,
      perOrderMonthlyDir(2020, (1 to 12).map(m => (m, runs(m - 1) * 1000.0)))).head()
    val rAlt = operators.EconometricsQueries.q464(spark,
      perOrderMonthlyDir(2020, (1 to 12).map(m => (m, alt(m - 1) * 1000.0)))).head()
    assert(rRuns.getLong(2) === ratio(runs), s"$rRuns vs ${ratio(runs)}")
    assert(rAlt.getLong(2) === ratio(alt), s"$rAlt vs ${ratio(alt)}")
    assert(rRuns.getLong(2) > 1100000L && rAlt.getLong(2) < 900000L,
      s"runs must inflate and alternation deflate: ${rRuns.getLong(2)}, ${rAlt.getLong(2)}")
  }

  test("q465 prices the planted frequency table on the exact word2vec curve") {
    val d = documentsDir(Seq(
      (1L, "a a a a a a a a", "en", "src", 15L),
      (2L, "a a b c", "en", "src", 7L)))
    // N = 12 tokens: a=10, b=1, c=1
    val out = operators.TextQueries.q465(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    def keep(f: Long) = r6d(math.min(1.0, math.sqrt(0.001 * 12.0 / f.toDouble)))
    assert(out.toSeq === Seq(("a", 10L, keep(10)), ("b", 1L, keep(1)),
      ("c", 1L, keep(1))), out.toSeq.toString)
    assert(out.head._3 < out.last._3,
      "the frequent word must be kept with lower probability")
  }

  test("q466 puts the Pettitt break exactly at the planted level shift") {
    val ys = (1 to 12).map(t => if (t <= 6) 10L else 20L)
    val d = perOrderMonthlyDir(2020, (1 to 12).map(m => (m, ys(m - 1) * 1000.0)))
    val r = operators.EconometricsQueries.q466(spark, d).head()
    assert((r.getInt(0), r.getLong(1), r.getLong(2)) === ((202006, 36L, -36L)),
      r.toString)
  }

  test("q463 ranks the planted hub above its leaves and matches the integer replay") {
    val texts = Seq("x hub y hub z hub", "hub x q hub", "y z")
    val d = documentsDir(texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "en", "src", t.length.toLong) })
    val out = operators.TextQueries.q463(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // integer replay of the exact pipeline on the planted bigrams
    val bigrams = texts.flatMap(t => t.split(" ").sliding(2).map(a => (a(0), a(1))))
      .filter { case (u, v) => u.nonEmpty && v.nonEmpty && u != v }
    val und = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val edges = (und.toSeq ++ und.toSeq.map { case ((u, v), w) => ((v, u), w) })
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val wdeg = edges.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2).sum).toMap
    val vocab = wdeg.keySet
    var rank = vocab.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val cs = edges.toSeq
        .map { case ((u, v), w) => v -> (rank(u) * w) / wdeg(u) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      rank = vocab.map(w => w -> (150000L + (850000L * cs.getOrElse(w, 0L)) / 1000000L)).toMap
    }
    val expect = rank.toSeq.sortBy { case (w, r) => (-r, w) }.take(20)
    assert(out.toSeq === expect, s"${out.toSeq}\nvs replay\n$expect")
    assert(out.head._1 === "hub", s"hub must outrank its leaves: ${out.toSeq}")
  }

  /** customer+orders fixture keyed by segment: each (segment, dollars)
    * element becomes one customer with one order of that amount
    * (dollars < 0 → customer with NO orders). */
  private def segCustOrdersDir(rows: Seq[(String, Double)]): String = {
    val dir = Files.createTempDirectory("planted-seg2")
    val keyed = rows.zipWithIndex.map { case ((seg, dol), i) =>
      (i.toLong + 1L, seg, dol)
    }
    keyed.map { case (k, seg, _) => (k, seg) }
      .toDF("c_custkey", "c_mktsegment")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("customer.parquet").toString)
    keyed.filter(_._3 >= 0).map { case (k, _, dol) => (k, k, dol) }
      .toDF("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("o_orderdate", to_timestamp(lit("2020-06-15")))
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("orders.parquet").toString)
    dir.toString
  }

  test("q456 reproduces the hand-ranked AB scores including the midrank tie") {
    // combined sorted cents: 100, 500, 500, 900, 1300 (N=5); doubled
    // midranks 2, 5, 5, 8, 10; doubled scores min(2r, 12-2r):
    // 2, 5, 5, 4, 2. Group1 holds {500, 500, 900} -> W2 = 14;
    // Σcnt·a2 = 18 -> E2_micro = (3·18·1e6) div 5 = 10,800,000.
    val d = segCustOrdersDir(Seq(
      ("AUTOMOBILE", 5.0), ("AUTOMOBILE", 5.0), ("AUTOMOBILE", 9.0),
      ("FURNITURE", 1.0), ("FURNITURE", 13.0)))
    val r = operators.EconometricsQueries.q456(spark, d).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((3L, 2L, 14L, 10800000L)), r.toString)
  }

  test("q457's isotonic core pools the classic violation and passes monotone input through") {
    val bins = Seq((1L, 10L, 1L), (2L, 10L, 3L), (3L, 10L, 2L), (4L, 10L, 4L))
      .toDF("ord", "n", "y")
    val out = operators.CurationQueries.isotonicMicro(bins).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((1L, 100000L, 100000L), (2L, 300000L, 250000L),
      (3L, 200000L, 250000L), (4L, 400000L, 400000L)),
      s"PAVA must pool bins 2,3 to 25%: ${out.toSeq}")
    val mono = Seq((1L, 10L, 1L), (2L, 10L, 2L), (3L, 10L, 3L), (4L, 10L, 4L))
      .toDF("ord", "n", "y")
    val mout = operators.CurationQueries.isotonicMicro(mono).collect()
      .map(r => (r.getLong(2), r.getLong(3)))
    assert(mout.forall { case (raw, iso) => raw == iso },
      s"monotone input must be a fixed point: ${mout.toSeq}")
  }

  test("q552 brackets planted shared spans and caps viral digests at 8 docs") {
    // docs 1,2: 16 common words + distinct 4-word tails -> span_ge_w 16
    //   (one shared 16-window at i=1; no 32-window fits a 20-word doc);
    //   shared 8-windows are those inside the common prefix: i <= 9 -> 9.
    // docs 3,4: 8 common words + distinct 3-word tails -> span 8, one
    //   shared 8-window.
    // docs 100..109: TEN identical 8-word docs -> one viral digest;
    //   the cap keeps the 8 smallest ids -> C(8,2)=28 pairs, never 45.
    val c = (1 to 16).map(i => s"c$i").mkString(" ")
    val dd = (1 to 8).map(i => s"d$i").mkString(" ")
    val e = (1 to 8).map(i => s"e$i").mkString(" ")
    val d = documentsDir(Seq(
      (1L, s"$c a1 a2 a3 a4", "en", "s", 1L),
      (2L, s"$c b1 b2 b3 b4", "en", "s", 1L),
      (3L, s"$dd x1 y1 z1", "en", "s", 1L),
      (4L, s"$dd p1 q1 r1", "en", "s", 1L)) ++
      (100L to 109L).map(i => (i, e, "en", "s", 1L)))
    val out = operators.TrainingQueries.q552(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length === 30, s"rows: ${out.length}")
    assert(out(0) === ((1L, 2L, 16L, 9L)), out(0).toString)
    assert(out(1) === ((3L, 4L, 8L, 1L)), out(1).toString)
    val viral = out.filter(_._1 >= 100L)
    assert(viral.length === 28, s"cap broken: ${viral.length} pairs")
    assert(viral.forall(p => p._1 <= 107L && p._2 <= 107L),
      "cap must keep the 8 SMALLEST doc_ids")
  }

  test("q552 bracketing invariant: span_ge_w = max rung <= planted span length, for any span length") {
    // Property sweep over deterministic pseudo-random span lengths L:
    // two docs share EXACTLY an L-word prefix (disjoint per-doc tail
    // alphabets), so the pair must co-occur at rung W iff W <= L —
    // span_ge_w = max{rung <= L} — and the shared 8-window count is
    // exactly L-7 (only windows fully inside the common span match).
    // Covers both bracket edges (L = rung and L = rung-1) plus the
    // no-pair regime L < 8.
    val rungs = Seq(8L, 16L, 32L, 64L)
    val cases = (1 to 8).map { s =>
      ((s * 2654435761L) % 80 + 1).toInt // L in [1, 80]
    } ++ Seq(7, 8, 15, 16, 31, 32, 63, 64, 80) // pin the edges
    for (l <- cases.distinct) {
      val common = (1 to l).map(i => s"c$i").mkString(" ")
      val tailA = (1 to 5).map(i => s"a$i").mkString(" ")
      val tailB = (1 to 5).map(i => s"b$i").mkString(" ")
      val d = documentsDir(Seq(
        (1L, s"$common $tailA", "en", "s", 1L),
        (2L, s"$common $tailB", "en", "s", 1L)))
      val out = operators.TrainingQueries.q552(spark, d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      if (l < 8) assert(out.isEmpty, s"L=$l must produce no pair: ${out.toSeq}")
      else {
        val want = rungs.filter(_ <= l).max
        assert(out.toSeq === Seq((1L, 2L, want, (l - 7).toLong)),
          s"L=$l: ${out.toSeq}")
      }
    }
  }

  test("q554 blocked set join finds the planted twin, respects blocks, and verifies exactly") {
    // doc 1/2: 19 of 21 distinct tokens shared -> jac 19/23? no:
    // |A|=20, |B|=20, inter=19, union=21 -> 19/21 = 0.9047 >= 0.9.
    // doc 3 = doc 1's text in ANOTHER source -> cross-block, no pair.
    // doc 4 shares 10 of 30 union tokens with doc 1 -> 0.33, dropped
    // by the exact verify even if banding proposes it.
    val w = (1 to 20).map(i => s"w$i")
    val d = documentsDir(Seq(
      (1L, w.mkString(" "), "en", "s", 1L),
      (2L, (w.take(19) :+ "x1").mkString(" "), "en", "s", 1L),
      (3L, w.mkString(" "), "en", "t", 1L),
      (4L, (w.take(10) ++ (1 to 10).map(i => s"y$i")).mkString(" "), "en", "s", 1L)))
    val out = operators.IndexingQueries.blockedSetJoin(
        graft.Tables.documents(spark, d)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((1L, 2L, 19L, 21L)), out.toSeq.toString)
    // on this fixture the blocked join loses nothing vs the lossless
    // prefix join — the exact-verify stage makes the EMITTED rows
    // identical whenever banding recall is 1
    val exact = operators.IndexingQueries.prefixJaccardPairs(
        graft.Tables.documents(spark, d)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === exact.toSeq)
  }

  test("blockedSetJoinFast (xxhash64 family) emits the same verified pairs as the md5 family") {
    // the exact-verify tail makes the two families' OUTPUTS identical
    // whenever both bandings recall the pair — pin that on a fixture
    // with a twin pair, a cross-block decoy, a low-sim candidate, and
    // an identical-doc cluster (identical docs share every band in
    // BOTH families, so the cluster is recall-proof by construction)
    val w = (1 to 20).map(i => s"w$i")
    val ident = (1 to 12).map(i => s"v$i").mkString(" ")
    val d = documentsDir(Seq(
      (1L, w.mkString(" "), "en", "s", 1L),
      (2L, (w.take(19) :+ "x1").mkString(" "), "en", "s", 1L),
      (3L, w.mkString(" "), "en", "t", 1L),
      (4L, (w.take(10) ++ (1 to 10).map(i => s"y$i")).mkString(" "), "en", "s", 1L)) ++
      (50L to 54L).map(i => (i, ident, "en", "s", 1L)))
    val docs = graft.Tables.documents(spark, d)
    val md5Out = operators.IndexingQueries.blockedSetJoin(docs).collect().toSeq
    val fastOut = operators.IndexingQueries.blockedSetJoinFast(docs).collect().toSeq
    assert(md5Out === fastOut, s"md5=$md5Out fast=$fastOut")
    val pairs = md5Out.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"twin missing: $pairs")
    assert(pairs.filter(p => p._1 >= 50L).size === 10, // C(5,2)
      s"identical cluster pairs wrong: $pairs")
  }

  test("q556 resolves the EXACT planted span length, including past the open 64-bracket") {
    // Same planted construction as the bracketing sweep — two docs
    // share EXACTLY an L-word prefix with disjoint tail alphabets —
    // but now the assertion pins exact_span = L itself, not just the
    // rung bracket. L = 140 exercises the open-ended top bracket
    // (span_ge_w = 64, true span > 2·64); L = rung and rung-1 pin the
    // bracket edges; L = 8 the minimum.
    val rungs = Seq(8L, 16L, 32L, 64L)
    for (l <- Seq(8, 15, 16, 31, 32, 63, 64, 80, 127, 128, 140)) {
      val common = (1 to l).map(i => s"c$i").mkString(" ")
      val tailA = (1 to 5).map(i => s"a$i").mkString(" ")
      val tailB = (1 to 5).map(i => s"b$i").mkString(" ")
      val d = documentsDir(Seq(
        (1L, s"$common $tailA", "en", "s", 1L),
        (2L, s"$common $tailB", "en", "s", 1L)))
      val out = operators.TrainingQueries.q556(spark, d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
      val want = rungs.filter(_ <= l).max
      assert(out.toSeq === Seq((1L, 2L, want, (l - 7).toLong, l.toLong)),
        s"L=$l: ${out.toSeq}")
    }
  }

  test("q559 prices the swept thresholds exactly on planted near-threshold pairs") {
    // Five pairs with EXACT planted Jaccard straddling every swept θ
    // (disjoint token alphabets per pair so no cross-pair similarity):
    //   pair 1: 16/20 = 0.80  (boundary-inclusive at θ=80)
    //   pair 2: 17/20 = 0.85  (boundary-inclusive at θ=85)
    //   pair 3: 18/20 = 0.90
    //   pair 4: 24/25 = 0.96
    //   pair 5: 15/20 = 0.75  (below the sweep — must count nowhere)
    def shared(p: Int, n: Int) = (1 to n).map(i => s"p${p}s$i")
    def doc(id: Long, toks: Seq[String]) =
      (id, toks.mkString(" "), "en", "s", 1L)
    val d = documentsDir(Seq(
      doc(1, shared(1, 16) ++ Seq("p1a1", "p1a2")),
      doc(2, shared(1, 16) ++ Seq("p1b1", "p1b2")),
      doc(3, shared(2, 17) :+ "p2a1"),
      doc(4, shared(2, 17) ++ Seq("p2b1", "p2b2")),
      doc(5, shared(3, 18) :+ "p3a1"),
      doc(6, shared(3, 18) :+ "p3b1"),
      doc(7, shared(4, 24)),
      doc(8, shared(4, 24) :+ "p4b1"),
      doc(9, shared(5, 15) ++ Seq("p5a1", "p5a2", "p5a3")),
      doc(10, shared(5, 15) ++ Seq("p5b1", "p5b2"))))
    val out = operators.IndexingQueries.q559(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // the exact ruler counts the planted pairs with boundary-inclusive
    // integer comparisons — no float threshold anywhere
    assert(out.map(x => (x._1, x._2)).toSeq ===
      Seq((80L, 4L), (85L, 3L), (90L, 2L), (95L, 1L)), out.toSeq.toString)
    // structural invariants: blocked ⊆ exact (precision 1), candidate
    // volume is θ-independent, recall is the integer quotient
    for ((t, ne, nb, nc, rm) <- out) {
      assert(nb <= ne, s"θ=$t: blocked $nb > exact $ne")
      assert(nc === out.head._4, s"θ=$t: candidate volume not constant")
      assert(rm === (if (ne == 0) 1000L else nb * 1000L / ne), s"θ=$t")
    }
  }

  test("q562 incremental blocked join hash-equals recompute, including delta-induced cap-crossing") {
    // Crosses every maintenance path at a SMALL cap (4) so the
    // cap-crossing case is plantable: a base-base twin (1,2) in
    // untouched buckets, a delta-delta twin (7,17), a base-delta twin
    // (5,27), an under-cap identical cluster (100-102 base + 107
    // delta: merged size 4 = cap, all 6 pairs emitted via the merge),
    // and an OVER-CAP crossing (200-203 base = 4 docs at cap, 207
    // delta pushes the bucket to 5 > cap: the recompute emits NOTHING
    // for it and the incremental result must agree — base-alone would
    // have emitted 6 pairs).
    val w = (1 to 20).map(i => s"w$i")
    val f = (1 to 20).map(i => s"f$i")
    val g = (1 to 20).map(i => s"g$i")
    val ident = (1 to 12).map(i => s"v$i").mkString(" ")
    val viral = (1 to 12).map(i => s"u$i").mkString(" ")
    val d = documentsDir(Seq(
      (1L, w.mkString(" "), "en", "s", 1L),
      (2L, (w.take(19) :+ "x1").mkString(" "), "en", "s", 1L),
      (7L, f.mkString(" "), "en", "s", 1L),
      (17L, (f.take(19) :+ "x2").mkString(" "), "en", "s", 1L),
      (5L, g.mkString(" "), "en", "s", 1L),
      (27L, (g.take(19) :+ "x3").mkString(" "), "en", "s", 1L)) ++
      Seq(100L, 101L, 102L, 107L).map(i => (i, ident, "en", "s", 1L)) ++
      Seq(200L, 201L, 202L, 203L, 207L).map(i => (i, viral, "en", "s", 1L)))
    val docs = graft.Tables.documents(spark, d)
    def isDelta(id: org.apache.spark.sql.Column) = id % 10 === 7
    val incr = operators.IndexingQueries
      .blockedSetJoinIncr(docs, isDelta, maxBucket = 4).collect().toSeq
    val full = operators.IndexingQueries
      .blockedSetJoin(docs, maxBucket = 4).collect().toSeq
    assert(incr === full, s"incremental != recompute:\n incr=$incr\n full=$full")
    val pairs = incr.map(r => (r.getLong(0), r.getLong(1))).toSet
    for (p <- Seq((1L, 2L), (7L, 17L), (5L, 27L)))
      assert(pairs.contains(p), s"missing planted pair $p in $pairs")
    assert(pairs.filter(p => p._1 >= 100L && p._1 < 200L).size === 6,
      s"under-cap merged cluster must emit C(4,2)=6 pairs: $pairs")
    assert(!pairs.exists(_._1 >= 200L),
      s"cap-crossed bucket must emit nothing: $pairs")
  }

  test("q561 banding grid: identical-signature cluster is recall-proof in every config") {
    // 3 identical docs (J=1 pairs: identical token sets → identical
    // signatures → same bucket under EVERY banding, so all C(3,2)=3
    // pairs are caught by construction in each of the four configs)
    // plus a J=0.9 pair, a J=0.96 pair, and a J=0.8 pair that θ=0.9
    // must exclude from the exact ruler everywhere.
    val ident = (1 to 12).map(i => s"v$i").mkString(" ")
    def shared(p: Int, n: Int) = (1 to n).map(i => s"p${p}s$i")
    def doc(id: Long, toks: Seq[String]) =
      (id, toks.mkString(" "), "en", "s", 1L)
    val d = documentsDir(Seq(
      doc(5, shared(3, 18) :+ "p3a1"), // 18/20 = 0.90
      doc(6, shared(3, 18) :+ "p3b1"),
      doc(7, shared(4, 24)), // 24/25 = 0.96
      doc(8, shared(4, 24) :+ "p4b1"),
      doc(9, shared(1, 16) ++ Seq("p1a1", "p1a2")), // 16/20 = 0.80
      doc(10, shared(1, 16) ++ Seq("p1b1", "p1b2"))) ++
      (50L to 52L).map(i => (i, ident, "en", "s", 1L)))
    val out = operators.IndexingQueries.q561(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.map(x => (x._1, x._2)).toSeq ===
      Seq((2L, 6L), (3L, 4L), (4L, 3L), (6L, 2L)), out.toSeq.toString)
    for ((b, r, nCand, nPairs, nExact, rm) <- out) {
      assert(nExact === 5L, s"config ${b}x$r: exact ruler must see 5 pairs")
      assert(nPairs >= 3L && nPairs <= 5L,
        s"config ${b}x$r: identical cluster guarantees >= 3 caught, got $nPairs")
      assert(nCand >= nPairs, s"config ${b}x$r: candidates < verified pairs")
      assert(rm === nPairs * 1000L / 5L, s"config ${b}x$r: recall formula")
    }
  }

  test("q556 dyadic probe resolves long-doc spans the linear scan could not touch") {
    // (a) LONG docs, SHORT true span — the regime the r17 linear scan
    // was visibly quadratic in (it evaluated every L in [64, 3000),
    // each a full window-digest pass over ~3000-word docs; the gallop
    // stays within a few probes of span_ge_w and the whole resolution
    // is ~6 digest passes). Planted: exactly a 70-word shared prefix,
    // disjoint 2930-word tails.
    val common = (1 to 70).map(i => s"c$i").mkString(" ")
    val fillA = (1 to 2930).map(i => s"a$i").mkString(" ")
    val fillB = (1 to 2930).map(i => s"b$i").mkString(" ")
    val d1 = documentsDir(Seq(
      (1L, s"$common $fillA", "en", "s", 1L),
      (2L, s"$common $fillB", "en", "s", 1L)))
    val out1 = operators.TrainingQueries.q556(spark, d1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out1.toSeq === Seq((1L, 2L, 64L, 63L, 70L)), out1.toSeq.toString)
    // (b) near-total overlap on 1200+ word docs — the gallop clamps at
    // minL and the bisection walks down to the exact 1200.
    val big = (1 to 1200).map(i => s"c$i").mkString(" ")
    val tailA = (1 to 5).map(i => s"a$i").mkString(" ")
    val tailB = (1 to 5).map(i => s"b$i").mkString(" ")
    val d2 = documentsDir(Seq(
      (1L, s"$big $tailA", "en", "s", 1L),
      (2L, s"$big $tailB", "en", "s", 1L)))
    val out2 = operators.TrainingQueries.q556(spark, d2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out2.toSeq === Seq((1L, 2L, 64L, 1193L, 1200L)), out2.toSeq.toString)
  }

  test("q560 emits the exact keep-one-copy edit list: anchors, overlap union, disjoint intervals") {
    // x-family: doc3 = x1..x100; doc1 copies x1..x40; doc2 copies
    // x30..x85. Pairs (1,3) and (2,3) both remove from doc3 (higher
    // id) at anchors 1 and 30 — OVERLAPPING intervals [1,40]+[30,85]
    // that must union to [1,85] with n_pairs 2. Pair (1,2) shares the
    // contiguous x30..x40 (11 words) — removal in doc2 at anchor 1.
    // y-family: doc11 = y1..y60; doc4 copies y1..y20, doc6 copies
    // y40..y59 — DISJOINT removals [1,20] and [40,59] in doc11 that
    // must stay two rows. doc1/doc4/doc6 appear only as lower ids —
    // their copies are kept, so they are absent from the plan.
    val x = (1 to 100).map(i => s"x$i")
    val y = (1 to 60).map(i => s"y$i")
    def t(ws: Seq[String]) = ws.mkString(" ")
    val d = documentsDir(Seq(
      (1L, t(x.take(40) ++ (1 to 10).map(i => s"f$i")), "en", "s", 1L),
      (2L, t(x.slice(29, 85) ++ (1 to 10).map(i => s"g$i")), "en", "s", 1L),
      (3L, t(x), "en", "s", 1L),
      (4L, t(y.take(20) ++ (1 to 10).map(i => s"h$i")), "en", "s", 1L),
      (6L, t(y.slice(39, 59) ++ (1 to 10).map(i => s"k$i")), "en", "s", 1L),
      (11L, t(y), "en", "s", 1L)))
    val out = operators.TrainingQueries.q560(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq === Seq(
      (2L, 1L, 11L, 11L, 1L),
      (3L, 1L, 85L, 85L, 2L),
      (11L, 1L, 20L, 20L, 1L),
      (11L, 40L, 59L, 20L, 1L)), out.toSeq.toString)
  }

  test("q557 incremental maintenance hash-equals the full recompute on delta-crossing structure") {
    // Corpus engineered so the delta rule (doc_id % 10 = 7) crosses
    // every maintenance path: a base-base pair (1,2), a delta-delta
    // pair (7,17), a base-delta pair (5,27), and a viral 10-doc digest
    // (100..109) whose capped top-8 contains the delta doc 107 — the
    // merged-top-8 re-cap must reproduce exactly what a from-scratch
    // cap computes. The gate is row-for-row equality with q552.
    val c = (1 to 16).map(i => s"c$i").mkString(" ")
    val f = (1 to 16).map(i => s"f$i").mkString(" ")
    val g = (1 to 8).map(i => s"g$i").mkString(" ")
    val e = (1 to 8).map(i => s"e$i").mkString(" ")
    val d = documentsDir(Seq(
      (1L, s"$c a1 a2 a3 a4", "en", "s", 1L),
      (2L, s"$c b1 b2 b3 b4", "en", "s", 1L),
      (7L, s"$f a1 a2 a3 a4", "en", "s", 1L),
      (17L, s"$f b1 b2 b3 b4", "en", "s", 1L),
      (5L, s"$g x1 y1 z1", "en", "s", 1L),
      (27L, s"$g p1 q1 r1", "en", "s", 1L)) ++
      (100L to 109L).map(i => (i, e, "en", "s", 1L)))
    val full = operators.TrainingQueries.q552(spark, d).collect().toSeq
    val incr = operators.TrainingQueries.q557(spark, d).collect().toSeq
    assert(incr === full,
      s"incremental != recompute:\n  incr=$incr\n  full=$full")
    // the planted pairs all survive into the leaderboard
    val pairs = full.map(r => (r.getLong(0), r.getLong(1))).toSet
    for (p <- Seq((1L, 2L), (7L, 17L), (5L, 27L)))
      assert(pairs.contains(p), s"missing planted pair $p in $pairs")
  }

  test("q553 flags the language whose duplicates the composed pipeline collapses") {
    // aa: 8 copies of one passing text (qm 664000) -> dedup keeps doc 1
    //   only; doc 1 hashes to train. bb: 8 UNIQUE passing texts; doc 13
    //   hashes to eval (md5('13#split') % 10 = 0), so 7 reach train.
    // tot_raw 16, tot_train 8: aa repr = (1*16e6)//(8*8) = 250000 ->
    // fails four-fifths; bb repr = (7*16e6)//(8*8) = 1750000 -> passes.
    val t = "the cat and the dog of the house"
    val d = documentsDir(
      (1L to 8L).map(i => (i, t, "aa", "s", 1L)) ++
      (11L to 18L).map(i => (i, s"$t${i - 10}", "bb", "s", 1L)))
    val out = operators.GovernanceQueries.q553(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
    assert(out.toSeq === Seq(
      ("aa", 8L, 1L, 1L, 1L, 500000L, 125000L, 250000L, 1L),
      ("bb", 8L, 8L, 8L, 7L, 500000L, 875000L, 1750000L, 0L)),
      out.toSeq.toString)
  }

  test("q458 flags the planted four-fifths violation against the best group") {
    // A: 9/10 selected (rate 0.9, reference); B: 4/10 (ratio 4/9 < 0.8)
    val d = segCustOrdersDir(
      (1 to 9).map(_ => ("A", 400000.0)) ++ Seq(("A", 10.0)) ++
      (1 to 4).map(_ => ("B", 500000.0)) ++ (1 to 6).map(_ => ("B", -1.0)))
    val out = operators.GovernanceQueries.q458(spark, d).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(4), r.getLong(5), r.getInt(6)))
      .toMap
    assert(out("A") === ((10L, 9L, "A", 1000000L, 0)), out.toString)
    assert(out("B") === ((10L, 4L, "A", 444444L, 1)), out.toString)
  }

  test("q467 reads the planted separated segments as chi2 = 6.0 and nulls the one-sided pole") {
    // AUTOMOBILE months 1..3 at 1k/2k/3k, BUILDING at 4k/5k/6k: grand
    // nearest-rank median = 300000c, so the 2x2 table is (0,3 | 3,0):
    // every cell term is 81e6/54 = 1500000, chi2 = 6000000, df=1 ->
    // reject at 3841459
    val d = segMonthlyDir(1 to 3, m => m.toLong, m => m.toLong + 3L)
    val out = operators.InferenceQueries.q467(spark, d).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5)))
      .toMap
    assert(out("AUTOMOBILE") === ((0L, 3L, 6000000L, 1L, 1)), out.toString)
    assert(out("BUILDING") === ((3L, 0L, 6000000L, 1L, 1)), out.toString)
    // pole: every order at the same price -> nobody is above the
    // median, R_above = 0 -> chi2 NULL (never a division blow-up)
    val pole = operators.InferenceQueries.q467(
      spark, segMonthlyDir(1 to 2, _ => 5L, _ => 5L)).collect()
    assert(pole.length === 2 && pole.forall(r => r.isNullAt(3) && r.isNullAt(5)),
      pole.mkString(";"))
  }

  test("q468 matches the full pair-grid replay on the planted shifted series") {
    // x_i = 10+i (i=1..12), y_j = j: HL = lower median of the 144
    // exact kilo differences; Cliff's delta from the dominance counts
    val d = segMonthlyDir(1 to 12, m => 10L + m, m => m.toLong)
    val xs = (1 to 12).map(m => 10L + m)
    val ys = (1 to 12).map(_.toLong)
    val diffs = for (x <- xs; y <- ys) yield x - y
    val sorted = diffs.sorted
    val k = (diffs.size + 1) / 2
    val hl = sorted(k - 1)
    val (gt, lt) = (diffs.count(_ > 0).toLong, diffs.count(_ < 0).toLong)
    val delta = (gt - lt) * 1000000L / diffs.size
    val r = operators.InferenceQueries.q468(spark, d).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === ((144L, hl, gt, lt, delta)), s"$r vs hl=$hl")
    assert(hl === 10L, "the planted shift is exactly 10 kilo-dollars")
  }

  test("q469 reads perfect concordance as 10^6 and prices the planted tie structure") {
    val perfect = operators.InferenceQueries.q469(spark, ordersPrioDir(Seq(
      (1, "1-URGENT", 50000.0), (2, "2-HIGH", 150000.0),
      (3, "3-MEDIUM", 250000.0)))).head()
    assert((perfect.getLong(0), perfect.getLong(1), perfect.getLong(2),
      perfect.getLong(3), perfect.getLong(4)) === ((3L, 0L, 1000000L,
      1000000L, 1000000L)), perfect.toString)
    // ties on each axis: cells (1,b0):1 (1,b1):1 (2,b1):1 (2,b2):1 ->
    // C=3, D=0, gamma=1; Sx pairs-tied-doubled=4 -> Dyx = 6e6/8;
    // Sy=2 -> Dxy = 6e6/10
    val tied = operators.InferenceQueries.q469(spark, ordersPrioDir(Seq(
      (1, "1-URGENT", 50000.0), (2, "1-URGENT", 150000.0),
      (3, "2-HIGH", 150000.0), (4, "2-HIGH", 250000.0)))).head()
    assert((tied.getLong(0), tied.getLong(1), tied.getLong(2),
      tied.getLong(3), tied.getLong(4)) === ((3L, 0L, 1000000L,
      750000L, 600000L)), tied.toString)
  }

  test("q470 counts strict turns only and rejects both persistence and alternation") {
    // monotone ramp: T=0, (3T-2n+4) = -20, z2 = 400*1e7/163 = 24539877
    val mono = operators.InferenceQueries.q470(
      spark, ordersDir(1 to 12, d => d.toDouble)).head()
    assert((mono.getLong(0), mono.getLong(1), mono.getLong(2),
      mono.getInt(3), mono.getInt(4)) === ((12L, 0L, 24539877L, -1, 1)),
      mono.toString)
    // strict alternation: every interior day turns, T=10 -> z2 =
    // 100*1e7/163 = 6134969, rejected on the HIGH side
    val alt = operators.InferenceQueries.q470(
      spark, ordersDir(1 to 12, d => if (d % 2 == 1) 10.0 else 30.0)).head()
    assert((alt.getLong(0), alt.getLong(1), alt.getLong(2),
      alt.getInt(3), alt.getInt(4)) === ((12L, 10L, 6134969L, 1, 1)),
      alt.toString)
    // in-band mix: series 1,3,2,4,3,5,4,6,7,8,9,10 has exactly 6 strict
    // turns -> (3T-2n+4) = -2, z2 = 245398, not rejected
    val vals = Seq(1, 3, 2, 4, 3, 5, 4, 6, 7, 8, 9, 10).map(_.toDouble)
    val mid = operators.InferenceQueries.q470(
      spark, ordersDir(1 to 12, d => vals(d - 1))).head()
    assert((mid.getLong(0), mid.getLong(1), mid.getLong(2),
      mid.getInt(3), mid.getInt(4)) === ((12L, 6L, 245398L, -1, 0)),
      mid.toString)
  }

  test("q471 zeroes kappa at chance agreement and nulls the chance-perfect pole") {
    def doc(id: Long, nc: Long, spaces: Int) =
      (id, ("w " * spaces) + "end", "en", "src", nc)
    // one doc per 2x2 cell: po = pe = 1/2 exactly -> kappa = 0
    val chance = operators.InferenceQueries.q471(spark, documentsDir(Seq(
      doc(1, 300, 54), doc(2, 300, 0), doc(3, 100, 60), doc(4, 100, 0))))
      .head()
    assert((chance.getLong(0), chance.getLong(1), chance.getLong(2),
      chance.getLong(3), chance.getLong(4), chance.getLong(5),
      chance.getLong(6)) === ((1L, 1L, 1L, 1L, 500000L, 500000L, 0L)),
      chance.toString)
    // both raters always agree with mixed marginals -> kappa = 1
    val perfect = operators.InferenceQueries.q471(spark, documentsDir(Seq(
      doc(1, 300, 54), doc(2, 300, 60), doc(3, 100, 0), doc(4, 100, 1))))
      .head()
    assert((perfect.getLong(4), perfect.getLong(5), perfect.getLong(6))
      === ((1000000L, 500000L, 1000000L)), perfect.toString)
    // every doc passes both raters: pe = 1, the kappa pole -> NULL
    val pole = operators.InferenceQueries.q471(spark, documentsDir(Seq(
      doc(1, 300, 54), doc(2, 300, 60)))).head()
    assert(pole.getLong(4) === 1000000L && pole.isNullAt(6), pole.toString)
  }

  test("q472 prices the planted ramp and alternation exactly and nulls the constant pole") {
    // ramp y_t = t over 12 months: S_ff = S_yy = S_fy = 1210,
    // bias = 121 -> ccc = 2420e6/2541 = 952380, shift share
    // 121e6/2541 = 47619
    val ramp = operators.InferenceQueries.q472(spark,
      perOrderMonthlyDir(2020, (1 to 12).map(m => (m, m * 1000.0)))).head()
    assert((ramp.getLong(0), ramp.getLong(1), ramp.getLong(2))
      === ((11L, 952380L, 47619L)), ramp.toString)
    // alternation 10/20: S_fy = -3000 vs S_ff = S_yy = 3000, bias 100
    // -> ccc = -6000e6/6100 (truncated toward zero, both engines)
    val alt = operators.InferenceQueries.q472(spark,
      perOrderMonthlyDir(2020,
        (1 to 12).map(m => (m, if (m % 2 == 1) 10000.0 else 20000.0)))).head()
    assert((alt.getLong(0), alt.getLong(1), alt.getLong(2))
      === ((11L, -983606L, 16393L)), alt.toString)
    // constant series: every moment and the bias are zero -> NULL, not
    // a fake perfect score
    val const = operators.InferenceQueries.q472(spark,
      perOrderMonthlyDir(2020, (1 to 12).map(m => (m, 5000.0)))).head()
    assert(const.getLong(0) === 11L && const.isNullAt(1) && const.isNullAt(2),
      const.toString)
  }

  test("q473 replays the EWMA recursion and fires only outside the planted limits") {
    def purchases(vals: Seq[Double]) = eventsDir(
      vals.zipWithIndex.map { case (v, i) => (i + 1, 1L, "purchase", v) })
    // flat calibration (sigma = 0): the chart stays silent at mu and
    // fires on ANY deviation, which then decays geometrically
    val flat = operators.InferenceQueries.q473(spark,
      purchases(Seq.fill(10)(10.0) ++ Seq(10.0, 20.0, 10.0))).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getInt(4)))
    assert(flat.toSeq === Seq((11L, 1000L, 360000L, 0),
      (12L, 1200L, 590400L, 1), (13L, 1160L, 737856L, 1)), flat.toSeq.toString)
    // noisy calibration (sigma = 100c): a 30c drift stays inside the
    // ramping limit, a sustained jump crosses it
    val noisy = operators.InferenceQueries.q473(spark,
      purchases((1 to 10).map(i => if (i % 2 == 1) 9.0 else 11.0) ++
        Seq(11.5, 20.0))).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getInt(4)))
    assert(noisy.toSeq === Seq((11L, 1030L, 0), (12L, 1224L, 1)),
      noisy.toSeq.toString)
    // 10 days or fewer: calibration only, no chart rows
    assert(operators.InferenceQueries.q473(spark,
      purchases(Seq.fill(10)(10.0))).count() === 0L)
  }

  test("q474 stops at the exact pinned boundary crossings in both directions") {
    // pure-purchase stream: +287682/day crosses ln19 = 2944439 micro
    // on day 11 (10 days = 2876820 stays inside)
    val h1 = operators.InferenceQueries.q474(spark, eventsDir(
      (1 to 60).map(d => (d, 1L, "purchase", 1.0)))).head()
    assert((h1.getLong(0), h1.getString(1), h1.getLong(2), h1.getLong(3),
      h1.getLong(4)) === ((60L, "accept_h1", 11L, 3164502L, 17260920L)),
      h1.toString)
    // pure-view stream: -60625/day crosses the lower boundary on day 49
    val h0 = operators.InferenceQueries.q474(spark, eventsDir(
      (1 to 60).map(d => (d, 1L, "view", 1.0)))).head()
    assert((h0.getLong(0), h0.getString(1), h0.getLong(2), h0.getLong(3),
      h0.getLong(4)) === ((60L, "accept_h0", 49L, -2970625L, -3637500L)),
      h0.toString)
    // too little evidence: the test declines to decide
    val cont = operators.InferenceQueries.q474(spark, eventsDir(
      (1 to 5).map(d => (d, 1L, "view", 1.0)))).head()
    assert((cont.getLong(0), cont.getString(1), cont.getLong(4))
      === ((5L, "continue", -303125L)) && cont.isNullAt(2) && cont.isNullAt(3),
      cont.toString)
  }

  test("q475 flags the planted one-way flow and ignores diagonal transitions") {
    // 9 users flow view->purchase, 1 flows back, 1 repeats itself
    // (diagonal, excluded): (1-9)^2 * 1e6 / 10 = 6400000 > chi2(1)
    val d = eventsDir(
      (1 to 9).flatMap(u => Seq((1, u.toLong, "view", 1.0),
        (2, u.toLong, "purchase", 1.0))) ++
      Seq((1, 10L, "purchase", 1.0), (2, 10L, "view", 1.0),
        (1, 11L, "view", 1.0), (2, 11L, "view", 1.0)))
    val out = operators.InferenceQueries.q475(spark, d).collect()
    assert(out.length === 1, out.mkString(";"))
    val r = out.head
    assert((r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6), r.getInt(7))
      === (("purchase", "view", 1L, 9L, 6400000L, 6400000L, 1L, 1)),
      r.toString)
    // balanced flows: zero chi2, no rejection
    val bal = operators.InferenceQueries.q475(spark, eventsDir(
      (1 to 5).flatMap(u => Seq((1, u.toLong, "view", 1.0),
        (2, u.toLong, "purchase", 1.0))) ++
      (6 to 10).flatMap(u => Seq((1, u.toLong, "purchase", 1.0),
        (2, u.toLong, "view", 1.0))))).head()
    assert((bal.getLong(4), bal.getLong(5), bal.getInt(7)) === ((0L, 0L, 0)),
      bal.toString)
  }

  test("q476 is exact under k and matches the md5 replay above k") {
    def h13(v: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest((v + "#kmv").getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(13), 16)
    }
    // 200 distinct custkeys on one day: o_custkey estimates off the
    // 64th-smallest hash; o_orderdate and o_orderpriority sit in the
    // exact (< k) regime; NULL priorities are excluded, not hashed
    val dir = Files.createTempDirectory("planted-kmv")
    (1 to 200).map(k =>
        (k.toLong, if (k % 2 == 0) "1-URGENT" else null))
      .toDF("o_custkey", "o_orderpriority")
      .withColumn("o_orderdate",
        timestamp_micros(lit((86400L + 43200L) * 1000000L)))
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("orders.parquet").toString)
    val out = operators.InferenceQueries.q476(spark, dir.toString).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val kth = (1 to 200).map(k => h13(k.toString)).sorted.apply(63)
    val est = 63L * 4503599627370496L / kth
    assert(out("o_custkey") === ((est, 200L,
      math.abs(est - 200L) * 1000000L / 200L)), out.toString)
    assert(out("o_orderdate") === ((1L, 1L, 0L)), out.toString)
    assert(out("o_orderpriority") === ((1L, 1L, 0L)),
      s"NULL priorities must not be hashed: $out")
  }

  test("q477 scores the source-clumped words at exactly 1/2 and the uniform word at 0") {
    // two equal 3-token sources; x lives only in a, z only in b, y is
    // spread exactly like the corpus: DP(x) = DP(z) = 1/2, DP(y) = 0
    val d = documentsDir(Seq(
      (1L, "x x y", "en", "a", 5L), (2L, "z z y", "en", "b", 5L)))
    val out = operators.InferenceQueries.q477(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(("x", 2L, 500000L), ("z", 2L, 500000L),
      ("y", 2L, 0L)), out.toSeq.toString)
  }

  test("q478 matches the exact replay on planted volatility clustering and nulls the constant pole") {
    // calm half (100 +- 1) then volatile half (100 +- 10): squared
    // deviations cluster, rho > 0, LM = 11 * (5/6)^2 via the exact
    // integer moments replayed through the same double pipeline
    val ys = Seq(101, 99, 101, 99, 101, 99, 110, 90, 110, 90, 110, 90)
    val d = perOrderMonthlyDir(2020,
      ys.zipWithIndex.map { case (y, i) => (i + 1, y * 1000.0) })
    val es = ys.map(y => { val u = 12L * y - 1200L; u * u })
    val ps = es.zip(es.tail)
    val m = ps.size.toLong
    val (sx, sy2) = (ps.map(_._1).sum, ps.map(_._2).sum)
    val sxy = ps.map(p => p._1 * p._2).sum
    val sxx = ps.map(p => p._1 * p._1).sum
    val syy = ps.map(p => p._2 * p._2).sum
    val cxy = m * sxy - sx * sy2
    val lm = math.floor(
      (cxy.toDouble / (m * sxx - sx * sx).toDouble) *
      (cxy.toDouble / (m * syy - sy2 * sy2).toDouble) *
      m.toDouble * 1000000 + 0.5).toLong
    val r = operators.InferenceQueries.q478(spark, d).head()
    assert((r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))
      === ((11L, lm, 1, 1)), s"$r vs lm=$lm")
    assert(lm > 7000000L, s"planted clustering must reject hard, lm=$lm")
    // constant revenue: zero deviations everywhere -> NULL, sign 0
    val pole = operators.InferenceQueries.q478(spark,
      perOrderMonthlyDir(2020, (1 to 12).map(m2 => (m2, 5000.0)))).head()
    assert(pole.getLong(0) === 11L && pole.isNullAt(1) &&
      pole.getInt(2) === 0 && pole.isNullAt(3), pole.toString)
  }

  /** Independent brute-force replay of the q479 statistic (strict
    * lexicographic (value, month-index) tie-break). */
  private def hoeffD(xs: Seq[Long], ys: Seq[Long]): Long = {
    val n = xs.size
    val idx = xs.indices
    def lt(v: Seq[Long])(i: Int, j: Int) =
      v(j) < v(i) || (v(j) == v(i) && j < i)
    val r = idx.map(i => idx.count(j => lt(xs)(i, j)) + 1L)
    val sr = idx.map(i => idx.count(j => lt(ys)(i, j)) + 1L)
    val c = idx.map(i => idx.count(j => lt(xs)(i, j) && lt(ys)(i, j)).toLong)
    val d1 = idx.map(i => c(i) * (c(i) - 1)).sum
    val d2 = idx.map(i =>
      (r(i) - 1) * (r(i) - 2) * (sr(i) - 1) * (sr(i) - 2)).sum
    val d3 = idx.map(i => (r(i) - 2) * (sr(i) - 2) * c(i)).sum
    val nl = n.toLong
    30L * ((nl - 2) * (nl - 3) * d1 + d2 - 2 * (nl - 2) * d3) * 1000000L /
      (nl * (nl - 1) * (nl - 2) * (nl - 3) * (nl - 4))
  }

  test("q479 scores both monotone couplings at exactly 10^6 and matches the brute replay") {
    val mono = operators.InferenceQueries.q479(spark,
      segMonthlyDir(1 to 12, m => m.toLong, m => m.toLong)).head()
    assert(mono.getLong(4) === 1000000L, mono.toString)
    val anti = operators.InferenceQueries.q479(spark,
      segMonthlyDir(1 to 12, m => m.toLong, m => 13L - m)).head()
    assert(anti.getLong(4) === 1000000L,
      s"D sees ANY functional dependence: $anti")
    // pair-swapped permutation: partial dependence, exact brute replay
    val ys = Seq(2L, 1L, 4L, 3L, 6L, 5L, 8L, 7L, 10L, 9L, 12L, 11L)
    val mix = operators.InferenceQueries.q479(spark,
      segMonthlyDir(1 to 12, m => m.toLong, m => ys(m - 1))).head()
    assert(mix.getLong(4) === hoeffD((1 to 12).map(_.toLong), ys),
      mix.toString)
    // n = 4: the denominator vanishes -> NULL, never a blow-up
    val pole = operators.InferenceQueries.q479(spark,
      segMonthlyDir(1 to 4, m => m.toLong, m => m.toLong)).head()
    assert(pole.getLong(0) === 4L && pole.isNullAt(4), pole.toString)
  }

  /** Independent DTW replay (|.| cost, full grid). */
  private def dtwRef(xs: Seq[Long], ys: Seq[Long]): Long = {
    val n = xs.size
    val dp = Array.fill(n + 1, n + 1)(Long.MaxValue / 4)
    dp(0)(0) = 0L
    for (i <- 1 to n; j <- 1 to n)
      dp(i)(j) = math.abs(xs(i - 1) - ys(j - 1)) +
        Seq(dp(i - 1)(j), dp(i - 1)(j - 1), dp(i)(j - 1)).min
    dp(n)(n)
  }

  test("q480 warps the planted 1-month lag to near zero and matches the DP replay") {
    val ident = operators.InferenceQueries.q480(spark,
      segMonthlyDir(1 to 12, m => m + 5L, m => m + 5L)).head()
    assert((ident.getLong(0), ident.getLong(1), ident.getLong(2))
      === ((12L, 0L, 0L)), ident.toString)
    // the same bump one month apart: pointwise distance is 80, DTW
    // warps bump-to-bump
    val xs = (1 to 12).map(m => if (m == 6) 50L else 10L)
    val ys = (1 to 12).map(m => if (m == 7) 50L else 10L)
    val lag = operators.InferenceQueries.q480(spark,
      segMonthlyDir(1 to 12, m => xs(m - 1), m => ys(m - 1))).head()
    val ref = dtwRef(xs, ys)
    assert(lag.getLong(1) === ref, s"$lag vs replay $ref")
    assert(ref < xs.zip(ys).map(p => math.abs(p._1 - p._2)).sum,
      "warping must beat the pointwise alignment on a lagged bump")
  }

  test("q481 parses the planted constant and alternating chains into 2 and 3 phrases") {
    // constant: '0'*11 parses as [0][0000000000-tail] -> 2 phrases
    val const = operators.InferenceQueries.q481(spark,
      ordersDir(1 to 12, _ => 50.0)).head()
    assert((const.getLong(0), const.getLong(1), const.getLong(2),
      const.getLong(3)) === ((12L, 11L, 2L, 181818L)), const.toString)
    // alternation: '+-+-...' parses as [+][-][+-+-...-tail] -> 3
    val alt = operators.InferenceQueries.q481(spark,
      ordersDir(1 to 12, d => if (d % 2 == 1) 10.0 else 30.0)).head()
    assert((alt.getLong(0), alt.getLong(1), alt.getLong(2), alt.getLong(3))
      === ((12L, 11L, 3L, 272727L)), alt.toString)
    // single day: empty direction sequence, NULL density
    val one = operators.InferenceQueries.q481(spark,
      ordersDir(1 to 1, _ => 50.0)).head()
    assert((one.getLong(0), one.getLong(1), one.getLong(2))
      === ((1L, 0L, 0L)) && one.isNullAt(3), one.toString)
  }

  test("q482 prices the planted key cardinalities through the md5 sketch") {
    def h13(v: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest((v + "#kmv").getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(13), 16)
    }
    val dir = Files.createTempDirectory("planted-bloom")
    (1 to 200).map(i => (i.toLong, (i % 10).toLong, 1L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("lineitem.parquet").toString)
    val out = operators.InferenceQueries.q482(spark, dir.toString).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getInt(6)))
      .toMap
    val kth = (1 to 200).map(i => h13(i.toString)).sorted.apply(63)
    val est = 63L * 4503599627370496L / kth
    def sized(e: Long, bpk: Long, k: Long) = {
      val bits = e * bpk / 1000000L + 1
      (e, bits, bits / 8 + 1, k, 1)
    }
    assert(out(("l_orderkey", "fpr_1pct")) === sized(est, 9585059L, 7L),
      out.toString)
    assert(out(("l_orderkey", "fpr_0_1pct")) === sized(est, 14377578L, 10L),
      out.toString)
    assert(out(("l_partkey", "fpr_1pct")) === sized(10L, 9585059L, 7L),
      "under k the sketch is the exact count")
    assert(out(("l_suppkey", "fpr_0_1pct")) === sized(1L, 14377578L, 10L),
      out.toString)
  }

  /** Independent replay of the q483 Cucconi statistic (pooled ranks
    * tie-broken by (value, group, month index)). */
  private def cucconiRef(xs: Seq[Long], ys: Seq[Long]): Long = {
    val pooled = xs.zipWithIndex.map { case (v, i) => (v, 1, i) } ++
      ys.zipWithIndex.map { case (v, i) => (v, 2, i) }
    val ranks2 = pooled.sortBy(t => (t._1, t._2, t._3)).zipWithIndex
      .collect { case ((_, 2, _), idx) => BigInt(idx + 1) }
    val nn = BigInt(pooled.size)
    val n1 = BigInt(xs.size); val n2 = BigInt(ys.size)
    val ss2 = ranks2.map(r => r * r).sum; val s1 = ranks2.sum
    val a = 6 * ss2 - n2 * (nn + 1) * (2 * nn + 1)
    val b = 6 * (n2 * (nn + 1) * (nn + 1) - 2 * (nn + 1) * s1 + ss2) -
      n2 * (nn + 1) * (2 * nn + 1)
    val sv = (2 * nn + 1) * (8 * nn + 11)
    val r = 2 * (nn * nn - 4) - sv
    val d5 = n1 * n2 * (nn + 1) * (2 * nn + 1) * (8 * nn + 11)
    ((5 * (sv * sv * (a * a + b * b) - 2 * r * sv * (a * b)) * 1000000) /
      (2 * d5 * (sv * sv - r * r))).toLong
  }

  test("q483 rejects planted shift AND planted pure-scale, replay-exact") {
    val shift = operators.InferenceQueries.q483(spark,
      segMonthlyDir(1 to 12, m => m.toLong, m => m + 20L)).head()
    assert(shift.getLong(4) ===
      cucconiRef((1 to 12).map(_.toLong), (1 to 12).map(m => m + 20L)),
      shift.toString)
    assert(shift.getInt(5) === 1, s"pure shift must reject: $shift")
    // same center, 4x the spread: the case Mann-Whitney-style location
    // tests are blind to
    val xs = (1 to 12).map(m => 50L + (m % 3))
    val ys = (1 to 12).map(m => 26L + 4L * m)
    val scale = operators.InferenceQueries.q483(spark,
      segMonthlyDir(1 to 12, m => xs(m - 1), m => ys(m - 1))).head()
    assert(scale.getLong(4) === cucconiRef(xs, ys), scale.toString)
    assert(scale.getInt(5) === 1, s"pure scale must reject: $scale")
    // identical samples: interleaved ranks, C small, no rejection
    val same = operators.InferenceQueries.q483(spark,
      segMonthlyDir(1 to 12, m => m.toLong, m => m.toLong)).head()
    assert(same.getLong(4) ===
      cucconiRef((1 to 12).map(_.toLong), (1 to 12).map(_.toLong)) &&
      same.getInt(5) === 0, same.toString)
  }

  test("q484 takes the hand-computed nested median and zeroes on constants") {
    // values {1,2,4,8}: row high-medians {7,6,4,7}, low median = 6
    val r = operators.InferenceQueries.q484(spark,
      perOrderMonthlyDir(2020,
        Seq(1, 2, 4, 8).zipWithIndex.map { case (v, i) => (i + 1, v * 1000.0) }))
      .head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2))
      === ((4L, 6L, 6L * 1192600L)), r.toString)
    val const = operators.InferenceQueries.q484(spark,
      perOrderMonthlyDir(2020, (1 to 4).map(m => (m, 5000.0)))).head()
    assert((const.getLong(0), const.getLong(1), const.getLong(2))
      === ((4L, 0L, 0L)), const.toString)
  }

  test("q485 rejects the monotone record parade and tolerates the reverse") {
    val h = (1 to 12).map(t => 1000000L / t).sum
    val varm = h - (1 to 12).map(t => 1000000L / (t.toLong * t)).sum
    def z2(rec: Long) = {
      val diff = rec * 1000000L - h; diff * diff / varm
    }
    // strictly increasing: every day is a record
    val up = operators.InferenceQueries.q485(spark,
      ordersDir(1 to 12, d => d.toDouble)).head()
    assert((up.getLong(0), up.getLong(1), up.getLong(2), up.getLong(3),
      up.getInt(4), up.getInt(5)) === ((12L, 12L, h, z2(12), 1, 1)),
      s"$up vs h=$h z2=${z2(12)}")
    // strictly decreasing: only day 1 records — few records is only
    // weakly informative at n=12 (E[R] is already small), not rejected
    val down = operators.InferenceQueries.q485(spark,
      ordersDir(1 to 12, d => 100.0 - d)).head()
    assert((down.getLong(0), down.getLong(1), down.getLong(3),
      down.getInt(4), down.getInt(5)) === ((12L, 1L, z2(1), -1, 0)),
      down.toString)
  }

  /** Two-segment orders fixture with MULTIPLE orders per month:
    * (custkey 1=AUTOMOBILE / 2=BUILDING, month, dollars) one row per
    * order. */
  private def segOrdersDir(rows: Seq[(Long, Int, Double)]): String = {
    val dir = Files.createTempDirectory("planted-sego")
    rows.zipWithIndex.map { case ((ck, m, v), i) => (ck, i.toLong, v, m) }
      .toDF("o_custkey", "o_orderkey", "o_totalprice", "m")
      .withColumn("o_orderdate",
        to_timestamp(format_string("2020-%02d-15", $"m")))
      .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"o_orderdate")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("orders.parquet").toString)
    Seq((1L, "AUTOMOBILE"), (2L, "BUILDING"))
      .toDF("c_custkey", "c_mktsegment")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("customer.parquet").toString)
    dir.toString
  }

  test("q486 splits pure-endowment and pure-structure gaps exactly") {
    // both segments earn exactly $3000/order; AUTOMOBILE just takes
    // one more order per month -> the WHOLE 3-kilo gap is explained
    val endow = segOrdersDir((1 to 6).flatMap(m =>
      (1 to m + 1).map(_ => (1L, m, 3000.0)) ++
      (1 to m).map(_ => (2L, m, 3000.0))))
    val e = operators.InferenceQueries.q486(spark, endow).head()
    assert((e.getLong(0), e.getLong(1), e.getLong(2), e.getLong(3),
      e.getLong(4)) === ((6L, 6L, 3000000L, 3000000L, 0L)), e.toString)
    // same volumes, but AUTOMOBILE's first order each month is $15000:
    // a pure 12-kilo structure gap, zero explained
    val struct = segOrdersDir((1 to 6).flatMap(m =>
      Seq((1L, m, 15000.0)) ++ (2 to m).map(_ => (1L, m, 3000.0)) ++
      (1 to m).map(_ => (2L, m, 3000.0))))
    val u = operators.InferenceQueries.q486(spark, struct).head()
    assert((u.getLong(2), u.getLong(3), u.getLong(4))
      === ((12000000L, 0L, 12000000L)), u.toString)
  }

  test("q487 counts the planted family's crossings against the md5 replay") {
    def testFlag(key: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest((key + "#split").getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      if (java.lang.Long.parseLong(hex.take(8), 16) % 5 == 0) 1L else 0L
    }
    val prefix = "P" * 60
    val d = documentsDir(Seq(
      (1L, prefix + " alpha", "en", "a", 66L),
      (2L, prefix + " beta", "en", "a", 65L),
      (3L, prefix + " gamma", "en", "b", 66L),
      (4L, "a singleton document", "en", "a", 20L),
      (5L, "another singleton", "en", "b", 17L)))
    val kt = Seq(1L, 2L, 3L).map(i => testFlag(i.toString)).sum
    val crossing = kt * (3 - kt)
    val r = operators.InferenceQueries.q487(spark, d).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === ((1L, 3L, crossing, 0L)), s"$r vs kt=$kt")
    if (crossing == 0) assert(r.getLong(4) === 0L)
    else assert(r.getLong(4) === crossing * 1000000L / 3L, r.toString)
  }

  test("q488 prices the deterministic chain and the half-loop replay-exactly") {
    // 10 users signup -> view -> purchase: v(view) = 1e6, v(signup) = 2e6
    val chain = eventsDir((1 to 10).flatMap(u => Seq(
      (1, u.toLong, "signup", 1.0), (2, u.toLong, "view", 1.0),
      (3, u.toLong, "purchase", 1.0))))
    val out = operators.InferenceQueries.q488(spark, chain).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("signup") === ((10L, 2000000L)), out.toString)
    assert(out("view") === ((10L, 1000000L)), out.toString)
    assert(out("purchase") === ((0L, 0L)), out.toString)
    // view loops to itself half the time: v = 1e6 + v/2 truncated, 12x
    val loop = eventsDir((1 to 10).flatMap(u => Seq(
      (1, u.toLong, "view", 1.0), (2, u.toLong, "view", 1.0),
      (3, u.toLong, "purchase", 1.0))))
    var v = 0L
    for (_ <- 1 to 12) v = 1000000L + (10L * v) / 20L
    val lo = operators.InferenceQueries.q488(spark, loop).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(lo("view") === v && v > 1999000L && lo("purchase") === 0L,
      s"$lo vs replay $v")
  }

  /** BigInt replay of the q489 z² rational for one nation: per-nation
    * micro means ms, region sizes/sums via the region key list. */
  private def getisZ2(ms: Seq[Long], rks: Seq[Long], i: Int): Long = {
    val n = BigInt(ms.size)
    val sm = ms.map(BigInt(_)).sum
    val sm2 = ms.map(m => BigInt(m) * m).sum
    val w = BigInt(rks.count(_ == rks(i)))
    val srm = ms.indices.filter(j => rks(j) == rks(i)).map(j => BigInt(ms(j))).sum
    val num = (n * srm - w * sm).pow(2) * (n - 1) * 1000000
    val den = (n * sm2 - sm * sm) * (n * w - w * w)
    (num / den).toLong
  }

  test("q489 flags the planted one-nation hotspot and nulls the degenerate poles") {
    // two flat regions + a lone 1000.00 nation: its region is hot
    val ms = Seq(100000L, 100000L, 100000L, 100000L, 10000000L)
    val rks = Seq(0L, 0L, 1L, 1L, 2L)
    val d = custNationDir(Seq((0L, 0L, 10.00), (1L, 0L, 10.00),
      (2L, 1L, 10.00), (3L, 1L, 10.00), (4L, 2L, 1000.00)))
    val out = operators.InferenceQueries.q489(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(3), r.getInt(4), r.getString(5)))
    val hot = out.find(_._1 == "NATION4").get
    assert(hot === (("NATION4", getisZ2(ms, rks, 4), 1, "hot")),
      s"$hot vs ${getisZ2(ms, rks, 4)}")
    val cold0 = out.find(_._1 == "NATION0").get
    assert(cold0._2 === getisZ2(ms, rks, 0) && cold0._3 === -1,
      cold0.toString)
    // all-equal balances: zero variance -> NULL everywhere
    val flat = operators.InferenceQueries.q489(spark, custNationDir(Seq(
      (0L, 0L, 10.00), (1L, 0L, 10.00), (2L, 1L, 10.00)))).collect()
    assert(flat.forall(r => r.isNullAt(3) && r.isNullAt(5)),
      flat.mkString(";"))
    // single region: nW - W^2 = 0 -> NULL, never a blow-up
    val one = operators.InferenceQueries.q489(spark, custNationDir(Seq(
      (0L, 0L, 10.00), (1L, 0L, 20.00)))).collect()
    assert(one.forall(r => r.isNullAt(3)), one.mkString(";"))
  }

  test("q490 prices the planted length mix on the exact inspection-paradox curve") {
    val d = documentsDir(Seq(
      (1L, "x", "en", "a", 100L), (2L, "y", "en", "a", 300L),
      (3L, "p", "en", "b", 100L), (4L, "q", "en", "b", 100L),
      (5L, "r", "en", "b", 100L), (6L, "s", "en", "b", 100L)))
    val out = operators.InferenceQueries.q490(spark, d).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // source a {100, 300}: doc mean 200, token-seen mean 250, bias
    // 1.25, and the single top-decile doc holds 3/4 of the chars
    assert(out("a") === ((2L, 200000000L, 250000000L, 1250000L, 750000L)),
      out.toString)
    // source b uniform: bias exactly 1, top decile = one of four docs
    assert(out("b") === ((4L, 100000000L, 100000000L, 1000000L, 250000L)),
      out.toString)
  }

  test("q491 matches the BigInt replay of the HL terms over crafted score bins") {
    // four crafted text shapes pin four score bins (replayed through
    // the same IEEE score arithmetic)
    def qm(text: String): Long = {
      // integer replay of TextAnalysis.qualityMicro (the exact 1e-6
      // grid — no float ever enters the score)
      val toks = (text.length - text.replace(" ", "").length + 1).toLong
      val chars = text.length.toLong
      val stop = Seq("the", "and", "of").map { w =>
        val padded = s" ${text.toLowerCase} "
        val needle = s" $w "
        (padded.length - padded.replace(needle, "").length) / needle.length
      }.sum.toLong
      math.min(toks, 50L) * 8000L +
        (if (chars - toks + 1 >= 2 * toks && chars - toks + 1 <= 12 * toks)
          300000L else 0L) +
        math.min(stop, 5L) * 60000L
    }
    val zs = (1 to 5).map(i => (i.toLong, "z", "fr", "s", 1L))
    val zzs = (6 to 15).map(i =>
      (i.toLong, "zz", if (i <= 8) "en" else "fr", "s", 2L))
    val qqs = (16 to 23).map(i =>
      (i.toLong, ("qq " * 30).trim, if (i <= 19) "en" else "fr", "s", 89L))
    val hi = (24 to 27).map(i =>
      (i.toLong, ("the and of " * 20).trim, "en", "s", 219L))
    val all = zs ++ zzs ++ qqs ++ hi
    // independent replay: group by bin, HL terms with the stated
    // truncation, usable-bin filtering, df = usable - 2
    val rows = all.map(t => (qm(t._2), if (t._3 == "en") 1L else 0L))
    val byBin = rows.groupBy(_._1 / 100000).toSeq.sortBy(_._1)
    val terms = byBin.map { case (bin, rs) =>
      val n = BigInt(rs.size); val sq = rs.map(r => BigInt(r._1)).sum
      val sy = rs.map(_._2).sum
      val usable = sq > 0 && sq < n * 1000000
      val term = if (!usable) None else Some(
        ((BigInt(sy) * 1000000 - sq).pow(2) * n * 1000000 /
          (sq * (n * 1000000 - sq))).toLong)
      (bin, rs.size.toLong, sy, sq.toLong, term)
    }
    val hl = terms.flatMap(_._5).sum
    val df = terms.count(_._5.isDefined).toLong - 2
    val out = operators.InferenceQueries.q491(spark, documentsDir(all))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)),
          r.getLong(5), r.getLong(6), r.getInt(7)))
      .toMap
    assert(out.keySet === terms.map(_._1).toSet, out.toString)
    terms.foreach { case (bin, n, sy, sq, term) =>
      assert(out(bin) === ((n, sy, sq, term, hl, df, 0)),
        s"bin $bin: ${out(bin)} vs ($n,$sy,$sq,$term,$hl,$df)")
    }
    assert(df >= 1 && hl < 5991465L,
      s"crafted bins must yield a usable, non-rejected test: hl=$hl df=$df")
  }

  test("q492 reads deterministic dynamics as ratio 1 and matches the brute replay") {
    // constant: r = 0, every template matches itself-class exactly
    val const = operators.InferenceQueries.q492(spark,
      perOrderMonthlyDir(2020, (1 to 12).map(m => (m, 5000.0)))).head()
    assert((const.getLong(0), const.getLong(1), const.getLong(2))
      === ((45L, 45L, 1000000L)), const.toString)
    // strict alternation: same-parity templates match, continuation
    // always holds -> A = B = 20, ratio 1 (SampEn 0: fully predictable)
    val alt = operators.InferenceQueries.q492(spark,
      perOrderMonthlyDir(2020,
        (1 to 12).map(m => (m, if (m % 2 == 1) 10000.0 else 30000.0)))).head()
    assert((alt.getLong(0), alt.getLong(1), alt.getLong(2))
      === ((20L, 20L, 1000000L)), alt.toString)
    // noisy series: exact brute-force replay of r, B, A
    val ys = Seq(10L, 30L, 11L, 29L, 15L, 22L, 10L, 31L, 12L, 28L, 14L, 26L)
    val r = (ys.max - ys.min) / 20L
    val idx = 0 until (ys.size - 2)
    def m2(i: Int, j: Int) =
      math.max(math.abs(ys(i) - ys(j)), math.abs(ys(i + 1) - ys(j + 1))) <= r
    def m3(i: Int, j: Int) = m2(i, j) && math.abs(ys(i + 2) - ys(j + 2)) <= r
    val b = (for (i <- idx; j <- idx if j > i && m2(i, j)) yield 1).size.toLong
    val a = (for (i <- idx; j <- idx if j > i && m3(i, j)) yield 1).size.toLong
    val noisy = operators.InferenceQueries.q492(spark,
      perOrderMonthlyDir(2020,
        ys.zipWithIndex.map { case (y, i) => (i + 1, y * 1000.0) })).head()
    assert((noisy.getLong(0), noisy.getLong(1)) === ((b, a)),
      s"$noisy vs replay b=$b a=$a")
    if (b > 0) assert(noisy.getLong(2) === a * 1000000L / b)
  }

  test("q493 recall matches the full scala replay of projection + cosine ranking") {
    // two separated clusters with per-vector perturbations; queries
    // are ids 0..4 (all in cluster A)
    val dim = 64
    def vec(cluster: Int, i: Int): Seq[Float] = {
      val a = Array.fill(dim)(0.0f)
      a(0) = if (cluster == 0) 1.0f else -1.0f
      a(1 + (i % 5)) = 0.05f + 0.01f * i
      a.toSeq
    }
    val rows = (0 until 12).map(i => (i.toLong, vec(0, i), 0)) ++
      (12 until 24).map(i => (i.toLong, vec(1, i), 1))
    val d = embeddingsDir(rows)
    // replay
    val vs = rows.map(r => r._1 -> r._2.map(_.toDouble)).toMap
    def dot(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).foldLeft(0.0)((acc, p) => acc + p._1 * p._2)
    def cos(a: Seq[Double], b: Seq[Double]) =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    def proj(v: Seq[Double]): Seq[Double] =
      operators.InferenceQueries.jlSigns.map(row =>
        row.zipWithIndex.foldLeft(0.0) { case (acc, (sg, i)) =>
          if (sg > 0) acc + v(i) else acc - v(i) })
    def top10(q: Long, m: Map[Long, Seq[Double]]) =
      m.keys.filter(_ != q).toSeq
        .map(t => (t, cos(m(q), m(t))))
        .sortBy { case (t, s) => (-s, t) }.take(10).map(_._1).toSet
    val pvs = vs.map { case (k, v) => k -> proj(v) }
    val expected = (0L to 4L).map { q =>
      q -> (top10(q, vs) & top10(q, pvs)).size.toLong
    }.toMap
    val out = operators.InferenceQueries.q493(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === expected, s"$out vs replay $expected")
    assert(expected.values.sum >= 40,
      s"JL must preserve the planted cluster geometry: $expected")
  }

  test("q494 recovers the exact line and survives 5/12 corrupted points") {
    // clean line y = 3t: slope 3, intercept 0 exactly
    val clean = operators.InferenceQueries.q494(spark,
      perOrderMonthlyDir(2020, (1 to 12).map(m => (m, 3 * m * 1000.0)))).head()
    assert((clean.getLong(0), clean.getDouble(3), clean.getLong(4))
      === ((12L, 3.0, 0L)), clean.toString)
    // corrupt 5 of 12 months to a wild constant: 68% of PAIRS touch a
    // corrupted point (past Theil–Sen's breakdown), yet every clean
    // anchor's inner median and the outer median stay exactly 3
    val bad = Set(2, 5, 8, 10, 12)
    val robust = operators.InferenceQueries.q494(spark,
      perOrderMonthlyDir(2020, (1 to 12).map(m =>
        (m, if (bad(m)) 1000000.0 else 3 * m * 1000.0)))).head()
    assert((robust.getDouble(3), robust.getLong(4)) === ((3.0, 0L)),
      s"repeated median must shrug off 5/12 corruption: $robust")
  }

  test("q495 picks the separating threshold and prices both extremes exactly") {
    // 6 positives score in bin 5 ('qq'x30), 4 negatives in bin 0 ('z')
    val d = documentsDir(
      (1 to 6).map(i => (i.toLong, ("qq " * 30).trim, "en", "s", 89L)) ++
      (7 to 10).map(i => (i.toLong, "z", "fr", "s", 1L)))
    val out = operators.InferenceQueries.q495(spark, d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet === Set(0L, 500000L), out.keySet.toString)
    val lo = out(0L)
    assert((lo.getLong(1), lo.getLong(2), lo.getLong(3), lo.getLong(4))
      === ((6L, 4L, 0L, 0L)), lo.toString)
    assert(lo.getLong(5) === 0L && lo.getLong(6) === 750000L &&
      lo.isNullAt(7) && lo.getInt(8) === 0, lo.toString)
    val hi = out(500000L)
    assert((hi.getLong(1), hi.getLong(2), hi.getLong(3), hi.getLong(4))
      === ((6L, 0L, 0L, 4L)), hi.toString)
    assert((hi.getLong(5), hi.getLong(6), hi.getLong(7), hi.getInt(8),
      hi.getInt(9), hi.getInt(10)) === ((1000000L, 1000000L, 1000000L,
      1, 1, 1)), hi.toString)
    // inverted labels: the separating threshold scores J = -1, MCC < 0
    val inv = operators.InferenceQueries.q495(spark, documentsDir(
      (1 to 6).map(i => (i.toLong, ("qq " * 30).trim, "fr", "s", 89L)) ++
      (7 to 10).map(i => (i.toLong, "z", "en", "s", 1L)))).collect()
      .map(r => r.getLong(0) -> r).toMap
    val ihi = inv(500000L)
    assert(ihi.getLong(5) === -1000000L && ihi.getInt(8) === -1,
      ihi.toString)
  }

  test("q496 maps the planted boilerplate flow and ignores single-source families") {
    val prefix = "Q" * 60
    val only = "R" * 60
    val d = documentsDir(Seq(
      (1L, prefix + " one", "en", "a", 64L),
      (2L, prefix + " two", "en", "a", 64L),
      (3L, prefix + " three", "en", "b", 66L),
      (4L, only + " x", "en", "a", 62L),
      (5L, only + " y", "en", "a", 62L),
      (6L, "unique text", "en", "c", 11L)))
    val out = operators.InferenceQueries.q496(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(("a", "b", 1L, 2L)),
      s"only the a<->b family crosses sources: ${out.toSeq}")
  }

  /** Full replay of the q497 pipeline (cleared residuals on the stated
    * grids, then the fixed double pipeline). BigInt `/` truncates
    * toward zero like Spark div / DuckDB //. */
  private def resetF(ys: Seq[Long]): Option[Long] = {
    val n = ys.size; val ts = (1 to n).map(_.toLong)
    val (bn, bys) = (BigInt(n), ys.map(BigInt(_)))
    val st = ts.sum; val sy = bys.sum
    val stt = ts.map(t => BigInt(t) * t).sum
    val sty = ts.zip(bys).map { case (t, y) => y * t }.sum
    val dd = bn * stt - BigInt(st) * st
    val bb = bn * sty - BigInt(st) * sy
    val cc = sy * stt - BigInt(st) * sty
    val zs = ts.map { t =>
      val f = cc + bb * t; val f3 = f / 1000; (f3 * f3) / 1000000
    }
    val eys = ts.zip(bys).map { case (t, y) =>
      (dd * y - cc - bb * t) / 1000000 }
    val sz = zs.sum; val stz = ts.zip(zs).map { case (t, z) => z * t }.sum
    val bz = bn * stz - BigInt(st) * sz
    val cz = sz * stt - BigInt(st) * stz
    val ezs = ts.zip(zs).map { case (t, z) =>
      (dd * z - cz - bz * t) / BigInt("1000000000000") }
    val sx = eys.sum; val sy2 = ezs.sum
    val sxy = eys.zip(ezs).map(p => p._1 * p._2).sum
    val sxx = eys.map(e => e * e).sum; val syy = ezs.map(e => e * e).sum
    val cxx = bn * sxx - sx * sx; val cyy = bn * syy - sy2 * sy2
    val cxy = bn * sxy - sx * sy2
    val den = cxx * cyy - cxy * cxy
    if (cxx == 0 || cyy == 0 || den == 0) None
    else Some(math.floor((n - 3).toDouble * (cxy * cxy).toDouble /
      den.toDouble * 1000000 + 0.5).toLong)
  }

  test("q497 nulls the perfect line and rejects planted curvature, replay-exact") {
    // magnitudes sized so the stated production grids (div 10^6 /
    // 10^12) keep signal: kilo values ~ 10^7, the real-data scale
    val line = operators.InferenceQueries.q497(spark,
      perOrderMonthlyDir(2020,
        (1 to 12).map(m => (m, 10000000.0 * m * 1000)))).head()
    assert(line.getLong(0) === 12L && line.isNullAt(1) && line.isNullAt(2),
      s"a perfect line carries no curvature evidence: $line")
    val ys = (1 to 12).map(m => 10000000L * m * m)
    val quad = operators.InferenceQueries.q497(spark,
      perOrderMonthlyDir(2020,
        (1 to 12).map(m => (m, ys(m - 1) * 1000.0)))).head()
    val expect = resetF(ys)
    assert(expect.isDefined && quad.getLong(1) === expect.get &&
      quad.getInt(2) === 1,
      s"$quad vs replay $expect — quadratic growth must reject")
  }

  test("q498 prices the planted level jump and stays quiet on the continuation") {
    // est window 1997: alternating 99/101; event 1998-01..03 at 200:
    // A = 3600, SS = 1728, z2 = A^2*11*1e6 // (SS*3)
    val jump = operators.InferenceQueries.q498(spark,
      perOrderMonthlyDir(1997, (1 to 12).map(m =>
        (m, if (m % 2 == 1) 99000.0 else 101000.0)) ++
        (13 to 15).map(m => (m, 200000.0)))).head()
    val z2 = BigInt(3600).pow(2) * 11 * 1000000 / (1728 * 3)
    assert((jump.getLong(0), jump.getLong(1), jump.getLong(2),
      jump.getLong(3), jump.getInt(4), jump.getInt(5))
      === ((12L, 3L, 300L, z2.toLong, 1, 1)), s"$jump vs z2=$z2")
    // continuation: the event window looks like the estimation window
    val cont = operators.InferenceQueries.q498(spark,
      perOrderMonthlyDir(1997, (1 to 15).map(m =>
        (m, if (m % 2 == 1) 99000.0 else 101000.0)))).head()
    assert((cont.getLong(2), cont.getInt(4), cont.getInt(5))
      === ((-1L, -1, 0)), cont.toString)
    // zero pre-period variance: NULL, never a fake infinite z
    val flat = operators.InferenceQueries.q498(spark,
      perOrderMonthlyDir(1997, (1 to 15).map(m => (m, 100000.0)))).head()
    assert(flat.isNullAt(3) && flat.isNullAt(5), flat.toString)
  }

  /** Full replay of the q499 ECM pipeline (q451 clearing, div 10^8
    * residual grid, Cramer two-regressor lambda, double rescale). */
  private def ecmLambda(xs: Seq[Long], ys: Seq[Long]): Option[Long] = {
    val n = BigInt(xs.size)
    val bx = xs.map(BigInt(_)); val by = ys.map(BigInt(_))
    val sx = bx.sum; val sy = by.sum
    val sxx = bx.map(v => v * v).sum
    val sxy = bx.zip(by).map(p => p._1 * p._2).sum
    val dd = n * sxx - sx * sx
    val cc = sy * sxx - sx * sxy
    val bb = n * sxy - sx * sy
    val us = bx.zip(by).map { case (x, y) =>
      (dd * y - cc - bb * x) / 100000000 }
    val rows = (1 until xs.size).map { i =>
      (us(i - 1), bx(i) - bx(i - 1), by(i) - by(i - 1)) }
    val mm = BigInt(rows.size)
    val s1 = rows.map(_._1).sum; val s2 = rows.map(_._2).sum
    val sy0 = rows.map(_._3).sum
    val s11 = rows.map(r => r._1 * r._1).sum
    val s12 = rows.map(r => r._1 * r._2).sum
    val s22 = rows.map(r => r._2 * r._2).sum
    val s1y = rows.map(r => r._1 * r._3).sum
    val s2y = rows.map(r => r._2 * r._3).sum
    val c11 = mm * s11 - s1 * s1; val c12 = mm * s12 - s1 * s2
    val c22 = mm * s22 - s2 * s2
    val c1y = mm * s1y - s1 * sy0; val c2y = mm * s2y - s2 * sy0
    val den = c11 * c22 - c12 * c12
    if (den == 0) None
    else Some(math.floor((c22 * c1y - c12 * c2y).toDouble / den.toDouble *
      dd.toDouble / 1e8 * 1000000 + 0.5).toLong)
  }

  test("q499 recovers the planted correction speed and nulls the exact-multiple pole") {
    // cointegrated pair at production-like magnitudes: y = 2x + 100*e
    // with a period-4 stationary error — the disequilibrium dies fast
    // x must NOT be a pure ramp: a constant step makes the dx
    // regressor collinear with the intercept (singular design)
    val es = Seq(0L, 1L, 0L, -1L)
    val xs = (1 to 12).map(m => (10L + m) * 10000L + (m % 3) * 5000L)
    val ys = (1 to 12).map(m => 2 * xs(m - 1) + 100L * es((m - 1) % 4))
    val d = segMonthlyDir(1 to 12, m => xs(m - 1), m => ys(m - 1))
    val r = operators.InferenceQueries.q499(spark, d).head()
    val expect = ecmLambda(xs, ys)
    assert(expect.isDefined && r.getLong(1) === expect.get,
      s"$r vs replay $expect")
    assert(r.getLong(1) < -300000L && r.getInt(2) === 1,
      s"planted disequilibrium must correct: $r")
    // exact multiple: zero residual everywhere, singular design -> NULL
    val pole = operators.InferenceQueries.q499(spark,
      segMonthlyDir(1 to 12, m => (10L + m) * 10000L,
        m => 3L * (10L + m) * 10000L)).head()
    assert(pole.isNullAt(1) && pole.isNullAt(2), pole.toString)
  }

  test("q500 issues keep/review/drop on the planted source profiles") {
    val hiQ = "the and of " * 20
    val docs =
      // good: high quality, unique prefixes, en, uniform lengths
      (1 to 5).map(i => (i.toLong, s"doc$i $hiQ".trim, "en", "good", 225L)) ++
      // dup_review: high quality but ALL share one 60-char prefix
      (6 to 10).map(i => (i.toLong, hiQ.trim + s" tail$i", "en", "dupey",
        225L)) ++
      // bad: low quality AND one length outlier trips the bias gate
      (11 to 15).map(i => (i.toLong, s"z$i", "fr", "bad",
        if (i == 15) 100L else 1L))
    val out = operators.InferenceQueries.q500(spark, documentsDir(docs))
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(5), r.getInt(6),
          r.getString(7))).toMap
    assert(out("good")._1 === 1000000L && out("good")._2 === 0L &&
      out("good")._4 === 0 && out("good")._5 === "keep", out.toString)
    assert(out("dupey")._1 === 1000000L && out("dupey")._2 === 1000000L &&
      out("dupey")._4 === 1 && out("dupey")._5 === "review", out.toString)
    // bad: quality 0, bias = 10004*5e6/10816 > 2e6 -> two fails
    assert(out("bad")._1 === 0L &&
      out("bad")._3 === (BigInt(10004) * 5 * 1000000 / 10816).toLong &&
      out("bad")._4 === 2 && out("bad")._5 === "drop", out.toString)
  }

  test("q501 clears exact first-order mixing and flags planted second-order memory") {
    // conditionally independent: after click, view/purchase 50/50
    // regardless of what came before -> chi2 exactly 0, df = 1
    def user3(u: Long, a: String, c: String) =
      Seq((1, u, a, 1.0), (2, u, "click", 1.0), (3, u, c, 1.0))
    val fo = (1 to 5).flatMap(i => user3(i.toLong, "view", "view")) ++
      (6 to 10).flatMap(i => user3(i.toLong, "view", "purchase")) ++
      (11 to 15).flatMap(i => user3(i.toLong, "purchase", "view")) ++
      (16 to 20).flatMap(i => user3(i.toLong, "purchase", "purchase"))
    val r1 = operators.InferenceQueries.q501(spark, eventsDir(fo)).head()
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2), r1.getLong(3),
      r1.getInt(4)) === ((20L, 4L, 0L, 1L, 0)), r1.toString)
    // perfect second-order memory: the step before click decides the
    // step after -> every cell term is k/2, chi2 = 2k*1e6 = 2e7
    val so = (1 to 10).flatMap(i => user3(i.toLong, "view", "view")) ++
      (11 to 20).flatMap(i => user3(i.toLong, "purchase", "purchase"))
    val r2 = operators.InferenceQueries.q501(spark, eventsDir(so)).head()
    assert((r2.getLong(0), r2.getLong(1), r2.getLong(2), r2.getLong(3),
      r2.getInt(4)) === ((20L, 4L, 20000000L, 1L, 1)), r2.toString)
  }

  test("q502 reads the planted schedules slope- and violation-exactly") {
    def liDir(rows: Seq[(Long, Double)]): String = {
      val dir = Files.createTempDirectory("planted-qd")
      rows.toDF("l_quantity", "l_extendedprice")
        .select($"l_quantity".cast("double").as("l_quantity"),
          $"l_extendedprice")
        .coalesce(1).write.mode("overwrite")
        .parquet(dir.resolve("lineitem.parquet").toString)
      dir.toString
    }
    // clean discount: unit price (100-q) dollars at every level
    val clean = operators.InferenceQueries.q502(spark,
      liDir((1 to 5).flatMap(q =>
        Seq.fill(2)((q.toLong, q * (100.0 - q)))))).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3), r.getLong(4)))
    assert(clean.toSeq === (1 to 5).map(q =>
      (q.toLong, (100L - q) * 100000000L, -1.0e8, 0L)), clean.toSeq.toString)
    // broken schedule: units 90/80/85/70 -> one violation, median
    // pair slope = -20e8/3 per level (r6'd)
    val us = Seq(90, 80, 85, 70)
    val broken = operators.InferenceQueries.q502(spark,
      liDir((1 to 4).map(q => (q.toLong, q * us(q - 1) * 1.0)))).collect()
    val slope = math.floor(-2000000000.0 / 3 * 1000000 + 0.5) / 1000000
    assert(broken.forall(r => r.getDouble(3) == slope && r.getLong(4) == 1L),
      s"${broken.mkString(";")} vs slope $slope")
  }

  test("q503 apportions exactly 10^6 slots by the f^0.75 largest-remainder rule") {
    // f(a)=16 -> w=8e6, f(b)=1 -> w=1e6: bases 888888/111111, the one
    // spare slot goes to a's larger remainder (8e6 > 1e6)
    val d = documentsDir(Seq((1L, ("a " * 16).trim + " b", "en", "s", 33L)))
    val out = operators.InferenceQueries.q503(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(("a", 16L, 8000000L, 888889L),
      ("b", 1L, 1000000L, 111111L)), out.toSeq.toString)
    assert(out.map(_._4).sum === 1000000L, "slots must sum exactly to 10^6")
  }

  test("q504 recommends dictionary and RLE on the planted column shapes") {
    val dir = Files.createTempDirectory("planted-enc")
    (1 to 20).map(k => (k.toLong, k.toLong,
        if (k <= 10) "A" else "B", "X"))
      .toDF("o_orderkey", "o_custkey", "o_orderpriority", "o_orderstatus")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("orders.parquet").toString)
    val out = operators.InferenceQueries.q504(spark, dir.toString).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5), r.getInt(6))).toMap
    assert(out("o_custkey") === ((20L, 20L, 20L, 1000000L, 0, 0)),
      out.toString)
    assert(out("o_orderpriority") === ((20L, 2L, 2L, 10000000L, 1, 1)),
      out.toString)
    assert(out("o_orderstatus") === ((20L, 1L, 1L, 20000000L, 1, 1)),
      out.toString)
  }

  test("q505 reads a pure ramp as all-trend and a pure weekly cycle as all-seasonal") {
    // linear ramp: the centered MA reproduces y exactly, R = 0,
    // deseasonalized variance is all trend
    val ramp = operators.InferenceQueries.q505(spark,
      ordersDir(1 to 28, d => d * 10.0)).head()
    assert((ramp.getLong(0), ramp.getLong(1)) === ((22L, 1000000L)) &&
      ramp.isNullAt(2), ramp.toString)
    // zero-sum 7-periodic pattern, no trend: R = 0 again, but now the
    // detrended variance is all seasonal and the trend is undefined
    val p = Seq(6, -1, -1, -1, -1, -1, -1)
    val cyc = operators.InferenceQueries.q505(spark,
      ordersDir(1 to 28, d => 100.0 + p(d % 7))).head()
    assert((cyc.getLong(0), cyc.getLong(2)) === ((22L, 1000000L)) &&
      cyc.isNullAt(1), cyc.toString)
  }

  test("q506 scores the planted clusters at exactly 1 and nulls the no-relevant case") {
    val dim = 64
    def vec(cluster: Int, i: Int): Seq[Float] = {
      val a = Array.fill(dim)(0.0f)
      a(0) = if (cluster == 0) 1.0f else -1.0f
      a(1 + (i % 5)) = 0.05f + 0.01f * i
      a.toSeq
    }
    val rows = (0 until 12).map(i => (i.toLong, vec(0, i), 0)) ++
      (12 until 24).map(i => (i.toLong, vec(1, i), 1))
    val out = operators.InferenceQueries.q506(spark, embeddingsDir(rows))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    // every query's top-10 is its 11-mate cluster: DCG = IDCG exactly
    assert(out.toSeq === (0L to 4L).map(q => (q, 11L, 1000000L)),
      out.toSeq.toString)
    // all-distinct labels: nothing is relevant -> NULL ndcg, not 0/0
    val loner = operators.InferenceQueries.q506(spark,
      embeddingsDir((0 until 24).map(i =>
        (i.toLong, vec(i % 2, i), i)))).collect()
    assert(loner.forall(r => r.getLong(1) === 0L && r.isNullAt(4)),
      loner.mkString(";"))
  }

  test("q507 keeps exactly the planted Pareto frontier incl. tied points") {
    val qq = ("qq " * 30).trim // score 0.54
    val docs = Seq(
      (1L, qq, "en", "s", 50L),    // dominated by doc 2 (same qm, longer)
      (2L, qq, "en", "s", 40L),    // frontier
      (3L, "the", "en", "s", 30L), // frontier (0.368, shorter)
      (4L, "the", "en", "s", 60L), // dominated
      (5L, "z", "fr", "s", 20L),   // frontier (0.008, shortest)
      (6L, "z", "fr", "s", 20L),   // tied frontier point — also kept
      (7L, "ww xx", "en", "s", 35L)) // 0.316 but len 35 > 30 above it
    val out = operators.InferenceQueries.q507(spark, documentsDir(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((2L, 540000L, 40L), (3L, 368000L, 30L),
      (5L, 8000L, 20L), (6L, 8000L, 20L)), out.toSeq.toString)
  }

  test("q508 reads comonotone tails as 1 and antimonotone tails as 0") {
    val co = operators.InferenceQueries.q508(spark,
      segMonthlyDir(1 to 12, m => m.toLong, m => 2L * m)).head()
    assert((co.getLong(0), co.getLong(1), co.getLong(2), co.getLong(5),
      co.getLong(6)) === ((12L, 2L, 2L, 1000000L, 1000000L)), co.toString)
    val anti = operators.InferenceQueries.q508(spark,
      segMonthlyDir(1 to 12, m => m.toLong, m => 26L - 2L * m)).head()
    assert((anti.getLong(2), anti.getLong(4), anti.getLong(5),
      anti.getLong(6)) === ((0L, 0L, 0L, 0L)), anti.toString)
  }

  /** Mirror of the q509 five-iteration Huber fold. */
  private def huberRef(ys0: Seq[Long]): (Long, Long, Long) = {
    val ys = ys0.sorted; val n = ys.size
    val med = ys((n + 1) / 2 - 1)
    val mad = ys.map(y => math.abs(y - med)).sorted.apply((n + 1) / 2 - 1)
    val t = 1345L * mad * 1000000L / 1000L
    var mu = med * 1000000L
    for (_ <- 1 to 5)
      mu += ys.map(y => math.max(-t, math.min(t, y * 1000000L - mu))).sum / n
    (med, mad, mu)
  }

  test("q509 matches the Huber fold replay and shrugs off the planted outlier") {
    val ramp = (1 to 12).map(_.toLong)
    val r1 = operators.InferenceQueries.q509(spark,
      perOrderMonthlyDir(2020, ramp.map(m => (m.toInt, m * 1000.0)))).head()
    val (m1, d1, h1) = huberRef(ramp)
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2), r1.getLong(3))
      === ((12L, m1, d1, h1)), s"$r1 vs ($m1,$d1,$h1)")
    // one wild month: the clamp caps its pull at T while the mean
    // would fly to ~83,000 kilo
    val wild = ramp.init :+ 1000000L
    val r2 = operators.InferenceQueries.q509(spark,
      perOrderMonthlyDir(2020,
        wild.zipWithIndex.map { case (y, i) => (i + 1, y * 1000.0) })).head()
    val (_, _, h2) = huberRef(wild)
    assert(r2.getLong(3) === h2 && h2 < 9000000L,
      s"$r2 vs replay $h2 — Huber must stay near the clean months")
  }

  test("q510 brackets the planted shift with the exact Moses interval") {
    val xs = (1 to 12).map(m => 10L + m)
    val ys = (1 to 12).map(_.toLong)
    val diffs = (for (x <- xs; y <- ys) yield x - y).sorted
    val np = 144L
    val c = math.max(1L, math.floor(np / 2.0 -
      1.959964 * math.sqrt(144.0 * 25 / 12)).toLong)
    val kHi = math.min(np, np + 1 - c)
    val r = operators.InferenceQueries.q510(spark,
      segMonthlyDir(1 to 12, m => xs(m - 1), m => ys(m - 1))).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6))
      === ((12L, np, c, kHi, diffs(c.toInt - 1), diffs(71), diffs(kHi.toInt - 1))),
      s"$r vs c=$c kHi=$kHi")
    assert(r.getLong(4) > 0,
      "the planted 10-kilo shift must be significant: CI excludes 0")
  }

  test("q511 accepts a common planted OR and flags opposing strata") {
    // rows: (month, n_lines, discounted?, returned?) -> lineitem+orders
    def bdDir(strata: Seq[(Int, Long, Boolean, Boolean)]): String = {
      val dir = Files.createTempDirectory("planted-bd")
      val lines = strata.zipWithIndex.flatMap { case ((m, k, x, y), gi) =>
        (1L to k).map(j => (gi * 1000000L + j, m,
          if (x) 0.10 else 0.0, if (y) "R" else "N"))
      }
      lines.map(t => (t._1, t._3, t._4))
        .toDF("l_orderkey", "l_discount", "l_returnflag")
        .coalesce(1).write.mode("overwrite")
        .parquet(dir.resolve("lineitem.parquet").toString)
      lines.map(t => (t._1, t._2))
        .toDF("o_orderkey", "m")
        .withColumn("o_orderdate",
          to_timestamp(format_string("2020-%02d-15", $"m")))
        .select($"o_orderkey", $"o_orderdate")
        .coalesce(1).write.mode("overwrite")
        .parquet(dir.resolve("orders.parquet").toString)
      dir.toString
    }
    def cells(m: Int, a: Long, b: Long, c: Long, d: Long) = Seq(
      (m, a, true, true), (m, b, true, false),
      (m, c, false, true), (m, d, false, false))
    // both months share OR = 4: homogeneity must NOT be rejected
    val homo = operators.InferenceQueries.q511(spark, bdDir(
      cells(1, 40, 10, 10, 10) ++ cells(2, 40, 10, 10, 10))).head()
    assert(homo.getLong(0) === 2L && homo.getLong(3) === 1L &&
      homo.getInt(4) === 0, homo.toString)
    // OR = 4 vs OR = 1/16: the pooled estimate is a fiction -> flag
    val het = operators.InferenceQueries.q511(spark, bdDir(
      cells(1, 40, 10, 10, 10) ++ cells(2, 10, 40, 40, 10))).head()
    assert(het.getLong(0) === 2L && het.getInt(4) === 1,
      s"opposing strata must reject homogeneity: $het")
  }

  test("q549 credits the critical channel 100% and matches the hand-solved chain") {
    // Pole: every journey is start -> view -> purchase. Removing view
    // kills all conversion (RE = 1e6, share 100%); removing any other
    // channel changes nothing (RE = 0, share 0).
    val pole = (1L to 5L).flatMap(u =>
      Seq((0, u, "view", 1.0), (0, u, "purchase", 1.0)))
    val p = operators.AssociationQueries.q549(spark, eventsDir(pole))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p("view").getLong(4) === 1000000L, p("view").toString)
    assert(p("view").getLong(5) === 1000000L, p("view").toString)
    assert(p("click").getLong(4) === 0L && p("click").getLong(5) === 0L)
    assert(p("view").getLong(2) === 1000000L) // a_full
    assert(p("view").getLong(3) === 0L)       // a with view removed
    // Hand-solved mixed chain: 3x start->view->purchase,
    // 1x start->view->END, 1x start->click->view->purchase,
    // 1x start->click->END. a(view) = 4/5, a(click) = 2/5,
    // a_start = (4*800000 + 2*400000) div 6 = 666666;
    // remove view -> 0 (RE 1e6); remove click -> (4*800000) div 6 =
    // 533333, RE = 1e6 - 533333*1e6 div 666666 = 200000;
    // error/signup RE = 0. Shares over 1.2e6: 833333 / 166666 / 0 / 0.
    val mixed =
      (1L to 3L).flatMap(u => Seq((0, u, "view", 1.0), (0, u, "purchase", 1.0))) ++
        Seq((0, 4L, "view", 1.0)) ++
        Seq((0, 5L, "click", 1.0), (0, 5L, "view", 1.0), (0, 5L, "purchase", 1.0)) ++
        Seq((0, 6L, "click", 1.0))
    val m = operators.AssociationQueries.q549(spark, eventsDir(mixed))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(m("view").getLong(2) === 666666L, m("view").toString)
    assert((m("view").getLong(3), m("view").getLong(4), m("view").getLong(5)) ===
      ((0L, 1000000L, 833333L)), m("view").toString)
    assert((m("click").getLong(3), m("click").getLong(4), m("click").getLong(5)) ===
      ((533333L, 200000L, 166666L)), m("click").toString)
    assert((m("error").getLong(3), m("error").getLong(4), m("error").getLong(5)) ===
      ((666666L, 0L, 0L)), m("error").toString)
    assert((m("signup").getLong(3), m("signup").getLong(4), m("signup").getLong(5)) ===
      ((666666L, 0L, 0L)), m("signup").toString)
  }
}
