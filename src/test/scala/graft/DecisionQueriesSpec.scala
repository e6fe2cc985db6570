package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Planted-structure gates for the round-14 decision-layer batch: the
  * oracle proves cross-engine equality; these tests prove the
  * statistics FIND known structure — Quade's F is exactly 12 on a
  * fully monotone 3×5 plant, Fleiss κ is exactly 1 on unanimous
  * raters, Stuart–Maxwell is exactly 0 on symmetric margins and
  * matches a BigInt replay off-balance, HSD separates exactly the
  * planted distant segment, the sign test's exact binomial tail is
  * 7/64 on a 5-up-1-down plant, the permutation test matches a full
  * 256-replica md5 replay, ICC hits its 1/NULL poles, the Chinchilla
  * N* is the exact integer square root for every budget, the coverage
  * curve reads a crafted Zipf head exactly, and Matryoshka recall is
  * 0 at 16 dims / 1 at 32 dims on a prefix-blind construction.
  */
class DecisionQueriesSpec extends SparkSpec {
  import spark.implicits._

  /** orders + customer fixture: (custkey, segment) plus
    * (custkey, totalprice dollars, year). */
  private def segOrdersDir(custSeg: Seq[(Long, String)],
      orders: Seq[(Long, Double, Int)]): String = {
    val dir = Files.createTempDirectory("planted-dq")
    custSeg.toDF("c_custkey", "c_mktsegment")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("customer.parquet").toString)
    orders.toDF("o_custkey", "o_totalprice", "yr")
      .withColumn("o_orderdate",
        to_timestamp(concat($"yr".cast("string"), lit("-06-15 12:00:00"))))
      .withColumn("o_orderkey", monotonically_increasing_id())
      .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderdate")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("orders.parquet").toString)
    dir.toString
  }

  private def documentsDir(rows: Seq[(Long, String, String, String, Long)]): String = {
    val dir = Files.createTempDirectory("planted-dq-doc")
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    dir.toString
  }

  /** lineitem + part fixture: (partkey, brand) plus
    * (partkey, day-of-epoch, extendedprice dollars); discount 0. */
  private def brandLinesDir(parts: Seq[(Long, String)],
      lines: Seq[(Long, String, Double)]): String = {
    val dir = Files.createTempDirectory("planted-dq-bl")
    parts.toDF("p_partkey", "p_brand")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("part.parquet").toString)
    lines.toDF("l_partkey", "shipdate", "l_extendedprice")
      .withColumn("l_shipdate", to_timestamp(concat($"shipdate", lit(" 12:00:00"))))
      .withColumn("l_discount", lit(0.0))
      .select($"l_partkey", $"l_shipdate", $"l_extendedprice", $"l_discount")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("lineitem.parquet").toString)
    dir.toString
  }

  private def embeddingsDir(rows: Seq[(Long, Seq[Float])]): String = {
    val dir = Files.createTempDirectory("planted-dq-emb")
    rows.toDF("vec_id", "embedding")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("embeddings.parquet").toString)
    dir.toString
  }

  test("q512 reads the fully monotone 3x5 plant as F = 12 exactly") {
    // 3 year-blocks, 5 segments, identical segment order every year,
    // block ranges strictly increasing: hand-derived Quade
    // F = (n-1)B/(A-B) = 2*120/(140-120) = 12; df2 = 8, crit 3.8379
    // -> reject. T scaled by 4: (-48,-24,0,24,48).
    val segs = Seq("SA", "SB", "SC", "SD", "SE")
    val custSeg = segs.zipWithIndex.map { case (sg, i) => ((i + 1).toLong, sg) }
    val orders = for {
      (m, yi) <- Seq(10.0, 20.0, 30.0).zipWithIndex
      k <- 1 to 5
    } yield (k.toLong, k * m, 1993 + yi)
    val out = operators.DecisionQueries.q512(spark, segOrdersDir(custSeg, orders))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5)))
      .toMap
    assert(out("SA") === ((-48L, 3L, 12000000L, 8L, 1)), out.toString)
    assert(out("SE") === ((48L, 3L, 12000000L, 8L, 1)), out.toString)
    assert(out("SC")._1 === 0L, out.toString)
  }

  /** Integer replay of TextAnalysis.qualityMicro. */
  private def qMicro(text: String): Long = {
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

  test("q513 reads unanimous raters as kappa = 1 and matches the replay off-unanimity") {
    val hi = ("the and of " * 20).trim // qualityMicro = 1000000
    assert(qMicro(hi) === 1000000L)
    val lo = "z" // 8000
    // 6 docs all-positive (en, quality>=.5, len in band), 4 all-negative
    val unanimous = (1L to 6L).map(i => (i, hi, "en", "s", 219L)) ++
      (7L to 10L).map(i => (i, lo, "fr", "s", 1L))
    val u = operators.DecisionQueries.q513(spark, documentsDir(unanimous)).head()
    assert((u.getLong(3), u.getString(4)) === ((1000000L, "almost_perfect")), u.toString)
    // add two split docs (en but low quality + short) -> k=1 each;
    // BigInt replay of the closed form
    val mixed = unanimous ++ Seq((11L, lo, "en", "s", 1L), (12L, lo, "en", "s", 1L))
    val ks = mixed.map { case (_, t, l, _, nc) =>
      (if (l == "en") 1L else 0L) + (if (qMicro(t) >= 500000L) 1L else 0L) +
        (if (nc >= 100L && nc <= 500L) 1L else 0L)
    }
    val n = BigInt(ks.size); val kk = BigInt(ks.sum)
    val a = ks.map(k => BigInt(k * k + (3 - k) * (3 - k))).sum
    val num = 3 * n * (a - 3 * n) - 2 * kk * kk - 2 * (3 * n - kk) * (3 * n - kk)
    val den = 18 * n * n - 2 * kk * kk - 2 * (3 * n - kk) * (3 * n - kk)
    val m = operators.DecisionQueries.q513(spark, documentsDir(mixed)).head()
    assert(m.getLong(3) === (num * 1000000 / den).toLong, m.toString)
  }

  test("q514 is exactly 0 on symmetric margins and matches the BigInt replay off-balance") {
    val enTxt = "the and of"; val esTxt = "el la de"; val frTxt = "le les et"
    // symmetric: 3 en->es / 3 es->en and 2 en->fr / 2 fr->en
    // confusions + diagonal mass: margins coincide -> d = 0, chi2 = 0
    // (the fr flow keeps S nonsingular; a pure en<->es exchange has
    // det(S) = 0)
    val sym =
      (1L to 4L).map(i => (i, enTxt, "en", "s", 10L)) ++
      (5L to 7L).map(i => (i, esTxt, "en", "s", 10L)) ++   // en predicted es
      (8L to 10L).map(i => (i, enTxt, "es", "s", 10L)) ++  // es predicted en
      (11L to 14L).map(i => (i, esTxt, "es", "s", 10L)) ++
      (15L to 16L).map(i => (i, frTxt, "fr", "s", 10L)) ++
      (17L to 18L).map(i => (i, frTxt, "en", "s", 10L)) ++ // en predicted fr
      (19L to 20L).map(i => (i, enTxt, "fr", "s", 10L))    // fr predicted en
    val s0 = operators.DecisionQueries.q514(spark, documentsDir(sym)).head()
    assert((s0.getLong(3), s0.getLong(4), s0.getLong(5), s0.getInt(6))
      === ((0L, 0L, 0L, 0)), s0.toString)
    // off-balance: 5 en->es, 1 es->en, 2 en->fr (the fr flow keeps S
    // nonsingular — a pure en<->es exchange has det(S) = 0 since then
    // d1 = -d2 identically); replay chi2 = d'adj(S)d/det
    val off =
      (1L to 4L).map(i => (i, enTxt, "en", "s", 10L)) ++
      (5L to 9L).map(i => (i, esTxt, "en", "s", 10L)) ++
      (10L to 10L).map(i => (i, enTxt, "es", "s", 10L)) ++
      (11L to 14L).map(i => (i, esTxt, "es", "s", 10L)) ++
      (15L to 16L).map(i => (i, frTxt, "fr", "s", 10L)) ++
      (17L to 18L).map(i => (i, frTxt, "en", "s", 10L))
    val m = Map(("en", "en") -> 4L, ("en", "es") -> 5L, ("en", "fr") -> 2L,
      ("es", "en") -> 1L, ("es", "es") -> 4L, ("fr", "fr") -> 2L)
      .withDefaultValue(0L)
    val r1 = m(("en", "en")) + m(("en", "es")) + m(("en", "fr"))
    val r2 = m(("es", "en")) + m(("es", "es")) + m(("es", "fr"))
    val c1 = m(("en", "en")) + m(("es", "en")) + m(("fr", "en"))
    val c2 = m(("en", "es")) + m(("es", "es")) + m(("fr", "es"))
    val (d1, d2) = (BigInt(r1 - c1), BigInt(r2 - c2))
    val s11 = BigInt(r1 + c1 - 2 * m(("en", "en")))
    val s22 = BigInt(r2 + c2 - 2 * m(("es", "es")))
    val s12 = BigInt(-(m(("en", "es")) + m(("es", "en"))))
    val det = s11 * s22 - s12 * s12
    val chi = (s22 * d1 * d1 - 2 * s12 * d1 * d2 + s11 * d2 * d2) * 1000000 / det
    val o = operators.DecisionQueries.q514(spark, documentsDir(off)).head()
    assert((o.getLong(3), o.getLong(4), o.getLong(5))
      === ((d1.toLong, d2.toLong, chi.toLong)), o.toString)
  }

  test("q515 separates exactly the planted distant segment (zero within-variance)") {
    // three segments, constant within: SA=SB=$1.00, SC=$9.00
    // -> msw = 0; (SA,SB) equal means no reject; pairs with SC reject
    val custSeg = Seq((1L, "SA"), (2L, "SB"), (3L, "SC"))
    val orders = (1 to 4).flatMap(i => Seq(
      (1L, 1.0, 1994), (2L, 1.0, 1994), (3L, 9.0, 1994)))
    val out = operators.DecisionQueries.q515(spark, segOrdersDir(custSeg, orders))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(6), r.getInt(7))).toMap
    assert(out(("SA", "SB")) === ((0L, 0)), out.toString)
    assert(out(("SA", "SC")) === ((0L, 1)), out.toString)
    assert(out(("SB", "SC")) === ((0L, 1)), out.toString)
  }

  test("q516 exact binomial tail: 5-up-1-down gives p = 14/64, all-up rejects") {
    // second-half revenue above first for brands B1..B5, below for B6
    val parts = (1L to 6L).map(i => (i, s"B$i"))
    val lines = (1L to 6L).flatMap { i =>
      val (a, b) = if (i <= 5) (10.0, 20.0) else (20.0, 10.0)
      Seq((i, "1994-01-10", a), (i, "1996-01-10", b))
    }
    val r = operators.DecisionQueries.q516(spark, brandLinesDir(parts, lines)).head()
    // n=6, pos=5, m=1: tail = C(6,0)+C(6,1) = 7; p = 14/64 = 0.21875
    assert((r.getLong(3), r.getLong(4), r.getLong(5), r.getInt(6))
      === ((6L, 5L, 218750L, 0)), r.toString)
    val allUp = (1L to 6L).flatMap(i =>
      Seq((i, "1994-01-10", 10.0), (i, "1996-01-10", 20.0)))
    val r2 = operators.DecisionQueries.q516(spark, brandLinesDir(parts, allUp)).head()
    // pos=6, m=0: tail=1, p = 2/64 = 31250 micro, 40 <= 64 -> reject
    assert((r2.getLong(4), r2.getLong(5), r2.getInt(6)) === ((6L, 31250L, 1)),
      r2.toString)
  }

  test("q517 matches the full 256-replica md5 replay") {
    val parts = (1L to 6L).map(i => (i, s"B$i"))
    val lines = (1L to 6L).flatMap { i =>
      val (a, b) = if (i <= 4) (10.0, 10.0 + i) else (20.0 + i, 10.0)
      Seq((i, "1994-01-10", a), (i, "1996-01-10", b))
    }
    // replay: d_i on the 1e-4 grid, sign from md5 hex digit
    val deltas = (1L to 6L).map { i =>
      val (a, b) = if (i <= 4) (10.0, 10.0 + i) else (20.0 + i, 10.0)
      val d = (math.floor(b * 100 + 0.5).toLong * 100L) -
        (math.floor(a * 100 + 0.5).toLong * 100L)
      (s"B$i", d)
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex1(s: String): Char = {
      val h = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      h.charAt(0)
    }
    val tObs = deltas.map(_._2).sum
    val tPerms = (0 until 256).map { p =>
      deltas.map { case (b, d) =>
        if (hex1(s"$b#$p") < '8') d else -d
      }.sum
    }
    val nExtreme = tPerms.count(t => math.abs(t) >= math.abs(tObs)).toLong
    val out = operators.DecisionQueries.q517(spark, brandLinesDir(parts, lines)).head()
    assert((out.getLong(1), out.getLong(3), out.getLong(4))
      === ((tObs, nExtreme, (nExtreme + 1) * 1000000L / 257L)), out.toString)
  }

  test("q518 hits the ICC poles: perfect clustering = 1, no variance = NULL") {
    // each source internally constant, sources differ -> msw=0, icc=1
    val clustered = (1L to 12L).map(i =>
      (i, "x", "en", s"src${(i - 1) / 4}", 100L * (1 + (i - 1) / 4)))
    val c = operators.DecisionQueries.q518(spark, documentsDir(clustered)).head()
    assert(c.getLong(5) === 1000000L, c.toString)
    assert(c.getLong(3) === 0L, s"msw must be 0: $c")
    // every length identical -> msb = msw = 0 -> NULL
    val flat = (1L to 12L).map(i => (i, "x", "en", s"src${(i - 1) / 4}", 100L))
    val f = operators.DecisionQueries.q518(spark, documentsDir(flat)).head()
    assert(f.isNullAt(5), f.toString)
  }

  test("q519 N* is the exact integer sqrt for every budget and epochs replay exactly") {
    // corpus of 3 docs x 5 tokens = 15 tokens
    val docs = (1L to 3L).map(i => (i, "a b c d e", "en", "s", 9L))
    val out = operators.DecisionQueries.q519(spark, documentsDir(docs))
      .collect()
    assert(out.length === 6)
    out.foreach { r =>
      val e = r.getInt(0); val n = BigInt(r.getLong(1)); val dStar = r.getLong(2)
      val c = BigInt(10).pow(e)
      assert(120 * n * n <= c && 120 * (n + 1) * (n + 1) > c,
        s"n_star not the exact isqrt at 10^$e: $n")
      assert(dStar === (n * 20).toLong)
      assert(r.getLong(3) === 15L)
      assert(r.getLong(4) === (BigInt(dStar) * 1000000 / 15).toLong)
    }
  }

  test("q520 reads the crafted Zipf head exactly") {
    // frequencies a:10 b:5 c:3 d:2 + five singletons = 25 tokens, 9 words
    val text = (Seq.fill(10)("a") ++ Seq.fill(5)("b") ++ Seq.fill(3)("c") ++
      Seq.fill(2)("d") ++ Seq("e", "f", "g", "h", "i")).mkString(" ")
    val out = operators.DecisionQueries.q520(spark,
        documentsDir(Seq((1L, text, "en", "s", text.length.toLong))))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(4), r.getLong(5)))
      .toMap
    // top-5 = a,b,c,d,e -> 10+5+3+2+1 = 21 of 25
    assert(out(5L) === ((21L, 21L * 1000000L / 25L, 4L * 1000000L / 25L)),
      out.toString)
    assert(out(10L) === ((25L, 1000000L, 0L)), out.toString)
    assert(out(10000L) === ((25L, 1000000L, 0L)), out.toString)
  }

  /** orders + lineitem fixture for the header-vs-detail pair:
    * (orderkey, header dollars) and (orderkey, line extprice dollars);
    * discount and tax 0 so detail = cents(ext)·10⁴ exactly. */
  private def ordersLinesDir(orders: Seq[(Long, Double)],
      lines: Seq[(Long, Double)]): String = {
    val dir = Files.createTempDirectory("planted-dq-ol")
    orders.toDF("o_orderkey", "o_totalprice")
      .withColumn("o_custkey", $"o_orderkey")
      .withColumn("o_orderdate", to_timestamp(lit("1994-06-15 12:00:00")))
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("orders.parquet").toString)
    lines.toDF("l_orderkey", "l_extendedprice")
      .withColumn("l_discount", lit(0.0))
      .withColumn("l_tax", lit(0.0))
      .withColumn("l_shipdate", to_timestamp(lit("1994-06-20 12:00:00")))
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("lineitem.parquet").toString)
    dir.toString
  }

  test("q529 ratio estimator is EXACT on the proportional plant, expansion is not") {
    // declared n_chars = 10 * true token count for every doc: the
    // ratio Y_hat = X_tot * (sum y_s / sum x_s) telescopes to Y
    // exactly, whatever the md5 sample picked
    val docs = (1L to 60L).map { i =>
      val toks = 1 + (i % 7)
      (i, Seq.fill(toks.toInt)("ab").mkString(" "), "en", "s", 10L * toks)
    }
    val r = operators.DecisionQueries.q529(spark, documentsDir(docs)).head()
    assert(r.getLong(6) === 0L, s"ratio estimator must be exact: $r")
    // md5 replay of the expansion estimator
    val md = java.security.MessageDigest.getInstance("MD5")
    def inS(id: Long): Boolean = {
      val h = md.digest(s"$id#rs".getBytes("UTF-8")).map("%02x".format(_)).mkString
      h.charAt(0) < '4'
    }
    val ys = docs.filter(d => inS(d._1)).map(d => 1L + (d._1 % 7)).sum
    val ns = docs.count(d => inS(d._1)).toLong
    assert(r.getLong(5) === BigInt(ys) * 60 / ns, r.toString)
  }

  test("q530 Murphy decomposition: gap is exactly 0 on the two-bin plant") {
    val hi = ("the and of " * 20).trim // qualityMicro exactly 1000000
    val lo = "z"                       // 8000
    // 4 perfectly-predicted hi/en docs + 4 lo/fr docs:
    // REL = (4*8000)^2/4/8 = 3.2e7, RES = UNC = 2.5e11, gap = 0
    val docs = (1L to 4L).map(i => (i, hi, "en", "s", 219L)) ++
      (5L to 8L).map(i => (i, lo, "fr", "s", 1L))
    val r = operators.DecisionQueries.q530(spark, documentsDir(docs)).head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      === ((32000000L, 250000000000L, 250000000000L, 32000000L, 0L)),
      r.toString)
  }

  test("q531 Bland-Altman reads the planted +-1 dollar disagreement exactly") {
    // headers 11,9,21,19; details 10,10,20,20 -> d = +-1e6 micro-USD,
    // bias 0, sd = floor(1e6*sqrt(4/3)) = 1154700, none outside
    val orders = Seq((1L, 11.0), (2L, 9.0), (3L, 21.0), (4L, 19.0))
    val lines = Seq((1L, 10.0), (2L, 10.0), (3L, 20.0), (4L, 20.0))
    val r = operators.DecisionQueries.q531(spark,
      ordersLinesDir(orders, lines)).head()
    assert((r.getLong(1), r.getLong(2), r.getLong(5))
      === ((0L, 1154700L, 0L)), r.toString)
  }

  test("q532 Deming recovers the exact planted slope 2 through the fixed tree") {
    val orders = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0))
    val lines = Seq((1L, 2.0), (2L, 4.0), (3L, 6.0))
    val r = operators.DecisionQueries.q532(spark,
      ordersLinesDir(orders, lines)).head()
    assert((r.getDouble(1), r.getDouble(2)) === ((2.0, 0.0)), r.toString)
  }

  test("q533 probe radius 1 recovers the planted neighbors radius 0 cannot see") {
    // q0's true neighbors all live in the Hamming-1 bucket (dim-1 sign
    // flipped, strong dim-5 match); its OWN bucket holds only
    // negatively-aligned vectors. radius 0: 16 candidates, recall 0;
    // radius 1 adds the 12 flipped-bucket vectors: recall 1.
    def vec(first: Float, entries: (Int, Float)*): Seq[Float] = {
      val a = Array.fill(64)(0f)
      a(0) = first; a(1) = 1f; a(2) = 1f; a(3) = 1f
      entries.foreach { case (i, v) => a(i - 1) = v }
      a.toSeq
    }
    val q0 = Seq((0L, vec(1f, 5 -> 100f)))
    val otherQ = (1L to 4L).map(i => (i, vec(1f, 5 -> -1000f)))
    val inBucket = (5L to 16L).map(i => (i, vec(1f, 5 -> -(50f + i))))
    val flipped = (17L to 28L).map(i => (i, vec(-1f, 5 -> 100f)))
    val out = operators.DecisionQueries.q533(spark,
        embeddingsDir(q0 ++ otherQ ++ inBucket ++ flipped))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out((0L, 0L)) === ((16L, 0L)), out.toString)
    assert(out((0L, 1L)) === ((28L, 10L)), out.toString)
  }

  test("q534 PPS selects by size with correct multiplicity weights (no clamp)") {
    // a_src: 2 docs x 5 tokens (cum [0,10)); b_src: 6 docs x 5 tokens
    // (cum [10,40)). Positions 4,12,20,28,36 -> a once (w=0.8), b four
    // times (w=4/15 each): the HT sum 2*0.8 + 4*6*0.266666 replays to
    // 7999984 micro-docs vs truth 8 — a certainty clamp would have
    // overcounted b 3.75x
    val doc = "t1 t2 t3 t4 t5"
    val docs = (1L to 2L).map(i => (i, doc, "en", "a_src", 14L)) ++
      (3L to 8L).map(i => (i, doc, "en", "b_src", 14L))
    val out = operators.DecisionQueries.q534(spark, documentsDir(docs))
      .collect().map(r => r.getLong(0) ->
        (r.getString(2), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toMap
    assert(out(0L) === (("a_src", 800000L, 1600000L, 8L)), out.toString)
    (1L to 4L).foreach { j =>
      assert(out(j) === (("b_src", 266666L, 1599996L, 8L)), s"$j: ${out(j)}")
    }
    assert(out.values.map(_._3).sum === 7999984L)
  }

  test("q526 Dunn separates the distant group and not the identical twin (tie-exact)") {
    // SA: 30x $1.00, SB: 30x $9.00, SC: 30x $1.00 (SA's twin).
    // Doubled avg ranks: value 100 (cnt 60) -> 61; value 900 -> 151.
    // v12 = 90*91*89 - [(60^3-60)+(30^3-30)] = 486000.
    val custSeg = Seq((1L, "SA"), (2L, "SB"), (3L, "SC"))
    val orders = (1 to 30).flatMap(_ => Seq(
      (1L, 1.0, 1994), (2L, 9.0, 1994), (3L, 1.0, 1994)))
    val out = operators.DecisionQueries.q526(spark, segOrdersDir(custSeg, orders))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(4), r.getLong(5), r.getInt(6))).toMap
    assert(out(("SA", "SC")) === ((61L, 61L, 0)), out.toString)
    assert(out(("SA", "SB")) === ((61L, 151L, 1)), out.toString)
    // independent replay of the SA-SB verdict inequality
    val lhs = BigInt(90) * 90 * 3 * 89 * 30 * 30 * 1000000
    val rhs = BigInt(4) * 7879440 * 486000 * 60
    assert((lhs > rhs) === (out(("SA", "SB"))._3 == 1), s"$lhs vs $rhs")
  }

  test("q527 split bands match the md5 replay and the balanced plant passes SRM") {
    val docs = (1L to 200L).map(i => (i, "t", if (i % 2 == 0) "en" else "fr", "s", 10L))
    val md = java.security.MessageDigest.getInstance("MD5")
    def u(id: Long): Long = {
      val h = md.digest(s"$id#split".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.substring(0, 2), 16)
    }
    def split(id: Long): String = {
      val x = u(id); if (x < 204) "train" else if (x < 230) "val" else "test"
    }
    val expect = docs.groupBy(d => (d._3, split(d._1)))
      .map { case (k, v) => k -> v.size.toLong }
    val out = operators.DecisionQueries.q527(spark, documentsDir(docs))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getInt(5))).toMap
    expect.foreach { case (k, n) =>
      assert(out(k)._1 === n, s"$k: ${out(k)} vs $n")
    }
    // chi2 replay per lang
    val chi = docs.groupBy(_._3).map { case (lang, ds) =>
      val nl = BigInt(ds.size)
      val o = Seq("train", "val", "test").map(sp =>
        BigInt(ds.count(d => split(d._1) == sp)))
      val w = Seq(BigInt(204), BigInt(26), BigInt(26))
      lang -> o.zip(w).map { case (ob, wt) =>
        (ob * 256 - nl * wt) * (ob * 256 - nl * wt) * 1000000 /
          (nl * wt * 256)
      }.sum.toLong
    }
    val gotChi = operators.DecisionQueries.q527(spark, documentsDir(docs))
      .select($"lang", $"chi2_micro").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    chi.foreach { case (l, c) => assert(gotChi(l) === c, s"$l: ${gotChi(l)} vs $c") }
  }

  test("q528 Fisher exact: family-only growth gives p = 1/C(25,5) exactly") {
    // 25 brands Brand#XY (X,Y in 1..5); exactly the Brand#1* family
    // grows -> k range [0,5], observed weight C(5,5)C(20,0) = 1 is the
    // strict minimum -> p = 1/53130, reject
    val brands = for (x <- 1 to 5; y <- 1 to 5) yield s"Brand#$x$y"
    val parts = brands.zipWithIndex.map { case (b, i) => ((i + 1).toLong, b) }
    val key = parts.map { case (k, b) => b -> k }.toMap
    val lines = brands.flatMap { b =>
      val up = b.startsWith("Brand#1")
      Seq((key(b), "1994-01-10", if (up) 10.0 else 20.0),
        (key(b), "1996-01-10", if (up) 20.0 else 10.0))
    }
    val r = operators.DecisionQueries.q528(spark, brandLinesDir(parts, lines))
      .head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === ((25L, 5L, 5L, 5L)), r.toString)
    assert((r.getLong(4), r.getInt(5)) === ((1000000L / 53130L, 1)), r.toString)
    // all-grew pole: the support collapses to k = 5, p = 1
    val allUp = brands.flatMap(b => Seq(
      (key(b), "1994-01-10", 10.0), (key(b), "1996-01-10", 20.0)))
    val r2 = operators.DecisionQueries.q528(spark, brandLinesDir(parts, allUp))
      .head()
    assert((r2.getLong(4), r2.getInt(5)) === ((1000000L, 0)), r2.toString)
  }

  test("q522 Welch matches the BigInt replay; equal means 0; zero variance NULL") {
    val custSeg = Seq((1L, "AUTOMOBILE"), (2L, "HOUSEHOLD"))
    def dirOf(a: Seq[Double], h: Seq[Double]): String = segOrdersDir(custSeg,
      a.map(v => (1L, v, 1994)) ++ h.map(v => (2L, v, 1994)))
    // replay: a = (nQ - S^2) div (n^2 (n-1)); t2 = dm^2 div ((a1+a2)*1e6)
    def replay(a: Seq[Long], h: Seq[Long]): (Long, Long) = {
      def grp(xs: Seq[Long]) = {
        val n = BigInt(xs.size); val sx = BigInt(xs.sum)
        val q = xs.map(x => BigInt(x) * x).sum
        val m = sx * 1000000 / n
        val aa = (n * q - sx * sx) / (n * n * (n - 1))
        (n, m, aa)
      }
      val (n1, m1, a1) = grp(a); val (n2, m2, a2) = grp(h)
      val dm = m1 - m2
      val t2 = dm * dm / ((a1 + a2) * 1000000)
      val df = ((a1 + a2) * (a1 + a2) * 1000000 * (n1 - 1) * (n2 - 1)) /
        (a1 * a1 * (n2 - 1) + a2 * a2 * (n1 - 1))
      (t2.toLong, df.toLong)
    }
    val (t2, df) = replay(Seq(100L, 300L, 500L), Seq(1000L, 1200L, 1400L))
    val r = operators.DecisionQueries.q522(spark,
      dirOf(Seq(1.0, 3.0, 5.0), Seq(10.0, 12.0, 14.0))).head()
    assert((r.getLong(5), r.getLong(6), r.getInt(4), r.getInt(7))
      === ((t2, df, -1, 1)), r.toString)
    val eq = operators.DecisionQueries.q522(spark,
      dirOf(Seq(1.0, 3.0), Seq(1.0, 3.0))).head()
    assert((eq.getLong(5), eq.getInt(7)) === ((0L, 0)), eq.toString)
    val zv = operators.DecisionQueries.q522(spark,
      dirOf(Seq(2.0, 2.0), Seq(5.0, 5.0))).head()
    assert(zv.isNullAt(5) && zv.isNullAt(7), zv.toString)
  }

  test("q523 triangular kernel reads the crafted lengths exactly") {
    // x=100 -> 100@p100; x=150 -> 50@p100+50@p200; x=1050 -> 50@p1000
    // (p1100 outside grid); x=30 -> 70@p0 + 30@p100
    val docs = Seq((1L, "t", "en", "s", 100L), (2L, "t", "en", "s", 150L),
      (3L, "t", "en", "s", 1050L), (4L, "t", "en", "s", 30L))
    val out = operators.DecisionQueries.q523(spark, documentsDir(docs))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(out(0L) === ((70L, 70L * 1000000L / 40000L)), out.toString)
    assert(out(100L) === ((180L, 180L * 1000000L / 40000L)), out.toString)
    assert(out(200L) === ((50L, 1250L)), out.toString)
    assert(out(1000L) === ((50L, 1250L)), out.toString)
    assert(out(300L) === ((0L, 0L)) && out(900L) === ((0L, 0L)), out.toString)
  }

  test("q524 effect size matches the hand-computed large plant") {
    // SA cents {100,300}, SB {1000,1200}: ss = 20000 each, sp2 = 20000,
    // dm = -900e6 -> d2 = 8.1e17/2e10 = 40500000 (|d| = 6.36, large);
    // g2 = d2*(4*4-12)^2/(4*4-9)^2 = d2*16/49
    val custSeg = Seq((1L, "SA"), (2L, "SB"))
    val orders = Seq((1L, 1.0, 1994), (1L, 3.0, 1994),
      (2L, 10.0, 1994), (2L, 12.0, 1994))
    val r = operators.DecisionQueries.q524(spark, segOrdersDir(custSeg, orders))
      .head()
    assert((r.getInt(4), r.getLong(5), r.getLong(6), r.getString(7))
      === ((-1, 40500000L, 40500000L * 16L / 49L, "large")), r.toString)
  }

  test("q525 RBO: identical rankings score exactly 10^6; disjoint heads score 0") {
    // all vectors share the sign bucket (first 4 dims positive) ->
    // IVF candidates = all -> approx == exact -> rbo = 1e6
    def vec(entries: (Int, Float)*): Seq[Float] = {
      val a = Array.fill(64)(0f)
      a(0) = 1f; a(1) = 1f; a(2) = 1f; a(3) = 1f
      entries.foreach { case (i, v) => a(i - 1) = v }
      a.toSeq
    }
    val same = (0L to 20L).map(i => (i, vec(5 -> (i + 1).toFloat)))
    val out1 = operators.DecisionQueries.q525(spark, embeddingsDir(same))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    (0L to 4L).foreach { q =>
      assert(out1(q) === ((10L, 1000000L)), s"q$q: ${out1(q)}")
    }
    // q0's true neighbors all live OUTSIDE its sign bucket (negative
    // first dim, strong dim-5 match); in-bucket candidates all have
    // negative dim-5 alignment -> exact and IVF top-10 are disjoint
    val q0 = (0L, vec(5 -> 100f))
    val inBucket = (1L to 12L).map(i => (i, vec(5 -> -(50f + i))))
    val outBucket = (13L to 24L).map(i =>
      (i, { val v = vec(5 -> 100f).toArray; v(0) = -1f; v.toSeq }))
    val out2 = operators.DecisionQueries.q525(spark,
        embeddingsDir(Seq(q0) ++ inBucket ++ outBucket))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out2(0L) === ((0L, 0L)), out2.toString)
  }

  test("q521 Matryoshka recall: 0 on the prefix-blind plant at 16 dims, 1 at 32") {
    // queries 0..4 = orthogonal unit basis vectors e1..e5; targets
    // 5..24 relevant only to q0: d1 = 1 plus a d17 component c that
    // decreases with id. Full/32-dim ranking orders by 1/sqrt(1+c^2)
    // (ids 24..15 best); the 16-dim prefix sees every target as
    // identical (cos 1, ties by id -> ids 5..14): recall@10 = 0.
    // Dims 17..32 carry the whole signal -> 32-dim recall = 1.
    def vec(entries: (Int, Float)*): Seq[Float] = {
      val a = Array.fill(64)(0f)
      entries.foreach { case (i, v) => a(i - 1) = v }
      a.toSeq
    }
    val queries = (0 to 4).map(q => (q.toLong, vec((q + 1) -> 1f)))
    val targets = (5 to 24).map(i =>
      (i.toLong, vec(1 -> 1f, 17 -> ((25 - i) / 10.0f))))
    val out = operators.DecisionQueries.q521(spark,
        embeddingsDir(queries ++ targets))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(4))).toMap
    assert(out((0L, 16L)) === ((0L, 0L)), out.toString)   // no overlap, top1 lost
    assert(out((0L, 32L)) === ((10L, 1L)), out.toString)  // identical ranking
    // orthogonal queries: every candidate ties at cos 0 at every dims
    // level -> both rankings are the id order -> full overlap
    (1L to 4L).foreach { q =>
      assert(out((q, 16L))._1 === 10L, s"q$q: ${out((q, 16L))}")
      assert(out((q, 32L))._1 === 10L, s"q$q: ${out((q, 32L))}")
    }
  }

  test("q539 build-cost sweep counts the planted sign cells exactly at every bit width") {
    // six 8-dim vectors; negative dims placed so the three bit widths
    // disagree: v1,v2 all-positive; v3 dim1<0; v4 dim2<0; v5 dim8<0
    // (visible only at 8 bits); v6 dim3<0 (visible at 4 and 8 bits).
    // b2 cells {3:4, 2:1, 1:1}: ss=18 -> exp=(18-6)e6/6=2000000
    // b4 cells {15:3, 14:1, 13:1, 11:1}: ss=12 -> 1000000
    // b8 cells {255:2, 254:1, 253:1, 127:1, 251:1}: ss=8 -> 333333
    def v(neg: Int*): Seq[Float] =
      (1 to 8).map(i => if (neg.contains(i)) -1f else 1f)
    val d = embeddingsDir(Seq(
      (1L, v()), (2L, v()), (3L, v(1)), (4L, v(2)), (5L, v(8)), (6L, v(3))))
    val out = operators.DecisionQueries.q539(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq === Seq(
      (2L, 3L, 6L, 4L, 2000000L),
      (4L, 4L, 6L, 3L, 1000000L),
      (8L, 5L, 6L, 2L, 333333L)), out.toSeq.toString)
  }

  test("q540 TV drift clears the planted two-word denominators exactly") {
    // en "a a b" (ne=3), de "a b b" (no=3): |2*3-1*3| = |1*3-2*3| = 3
    // per word; tv = 6e6 // 18 = 333333; contrib = 3e6 // 18 = 166666.
    val d = documentsDir(Seq(
      (1L, "a a b", "en", "s", 5L), (2L, "a b b", "de", "s", 5L)))
    val out = operators.DecisionQueries.q540(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq === Seq(("a", 2L, 1L, 166666L, 333333L),
      ("b", 1L, 2L, 166666L, 333333L)), out.toSeq.toString)
  }

  test("q541 ECE/MCE reproduce the hand-computed two-bin gaps") {
    // "a b" (qm=16000, bin0) x2 (en+de), "the the the the the"
    // (qm=520000, bin5, en — 3 non-overlapping ' the ' matches):
    // bin0 dev=|32000-1e6|=968000, bin5 dev=|520000-1e6|=480000;
    // ece = 1448000 div 3 = 482666, mce = max(484000, 480000).
    val d = documentsDir(Seq(
      (1L, "a b", "en", "s", 3L), (2L, "a b", "de", "s", 3L),
      (3L, "the the the the the", "en", "s", 19L)))
    val r = operators.DecisionQueries.q541(spark, d).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((2L, 3L, 482666L, 484000L)), r.toString)
  }

  /** events.parquet fixture: (day, user, type, value) rows at noon UTC
    * of each epoch-day (PlantedStructureSpec's shape). */
  private def eventsDir(rows: Seq[(Int, Long, String, Double)]): String = {
    val dir = Files.createTempDirectory("planted-dq-ev")
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

  /** Replay of the q243/q543/q544 md5 device: first 8 hex chars of
    * md5(key) as a base-16 long. */
  private def md5Head8(key: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }

  test("q542 first-crossing days match the betGrid fold on pure and mixed streams") {
    // Pure-success plant: 20 days x 10 purchases. loge_p after day
    // index i is 10*a_p*(i+1), so every grid point rejects at day
    // ceil(2995732 / (10 a_p)) - 1 and finals are 200*a_p.
    val pure = for (d <- 0 until 20; k <- 0 until 10)
      yield (d, (d * 10 + k).toLong, "purchase", 5.0)
    val out = operators.DecisionQueries.q542(spark, eventsDir(pure))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size === 19)
    operators.DecisionQueries.betGrid.foreach { case (p, a, _) =>
      val r = out(p)
      val firstDay = (2995732L + 10 * a - 1) / (10 * a) - 1
      assert(r.getLong(1) === 200 * a, s"final p=$p")
      assert(r.getLong(3) === 1L, s"rejected p=$p")
      assert(r.getLong(4) === firstDay, s"first day p=$p")
    }
    // Mixed plant: 1 purchase + 1 view per day. The p0 = 50% point
    // earns a+b = 223144-287682 < 0 per day: never rejected, NULL day.
    val mixed = (0 until 20).flatMap(d =>
      Seq((d, d.toLong, "purchase", 5.0), (d, 100L + d, "view", 1.0)))
    val m = operators.DecisionQueries.q542(spark, eventsDir(mixed))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m(500000L).getLong(1) === -64538L * 20)
    assert(m(500000L).getLong(3) === 0L)
    assert(m(500000L).isNullAt(4))
    // and the p0 = 5% point still rejects: a+b = 363340/day.
    assert(m(50000L).getLong(4) === (2995732L + 363339L) / 363340L - 1)
  }

  test("q543 matches the exact-integer ceil-div replay over the lift grid") {
    // 40 users, one purchase each; users 1..8 get value 250 (high-value
    // converters), the rest 10. Arms replay the md5 device.
    val rows = (1L to 40L).map(u =>
      (0, u, "purchase", if (u <= 8) 250.0 else 10.0))
    val out = operators.DecisionQueries.q543(spark, eventsDir(rows))
      .collect().map(r => r.getLong(0) -> r).toMap
    val nA = (1L to 40L).count(u => md5Head8(s"$u#exp1") % 2 == 0).toLong
    val nB = 40L - nA
    val rate = 8L * 1000000L / 40L
    assert(out.keySet === Set(5L, 10L, 20L))
    Seq(5L, 10L, 20L).foreach { g =>
      val r = out(g)
      val p2 = rate * (100 + g) / 100
      val num = BigInt(7848878512225L) *
        (BigInt(rate) * (1000000 - rate) + BigInt(p2) * (1000000 - p2))
      val den = BigInt(p2 - rate) * (p2 - rate) * BigInt(10).pow(12)
      val needed = ((num + den - 1) / den).toLong
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((nA, nB, 8L)))
      assert(r.getLong(4) === rate)
      assert(r.getLong(5) === p2)
      assert(r.getLong(6) === needed, s"lift $g")
      assert(r.getLong(7) === math.min(nA, nB))
      assert(r.getLong(8) === (if (math.min(nA, nB) >= needed) 1L else 0L))
    }
    // a doubled grid halves-ish n at +20 vs +10 (sanity on monotonicity)
    assert(out(20L).getLong(6) < out(10L).getLong(6))
    assert(out(10L).getLong(6) < out(5L).getLong(6))
  }

  test("q544 reads perfect agreement as alpha = 1e6 and matches the replay off-agreement") {
    // 10 all-positive docs (en, src0 < src2, long) + 10 all-negative:
    // every pairable unit is unanimous, both values present -> sum_t = 0,
    // alpha exactly 1e6 whatever the md5 missingness masks drop.
    val agree = (1L to 10L).map(i => (i, "t", "en", "src0", 400L)) ++
      (11L to 20L).map(i => (i, "t", "de", "src5", 100L))
    val a = operators.DecisionQueries.q544(spark, documentsDir(agree)).head()
    assert(a.getLong(5) === 1000000L, a.toString)
    // Split plant: values (1, 0, 1) per doc when all raters present;
    // exact BigInt replay of alpha = 1 - sum_t*(n-1)/(2*N1*N0) under
    // the replayed masks (units with m < 2 dropped).
    val split = (1L to 30L).map(i => (i, "t", "en", "src5", 400L))
    val units = (1L to 30L).map { i =>
      val present = (1 to 3).map(r => md5Head8(s"$i#kr$r") % 5 != 0)
      val vals = Seq(1L, 0L, 1L)
      val picked = vals.zip(present).filter(_._2).map(_._1)
      (picked.size.toLong, picked.sum)
    }.filter(_._1 >= 2)
    val n = units.map(_._1).sum
    val t1 = units.map(_._2).sum
    val t0 = n - t1
    val sumT = units.map { case (m, n1) =>
      if (m == 3) n1 * (m - n1) else 2 * n1 * (m - n1)
    }.sum
    val alpha = 1000000L -
      (BigInt(sumT) * (n - 1) * 1000000 / (2 * BigInt(t1) * t0)).toLong
    val b = operators.DecisionQueries.q544(spark, documentsDir(split)).head()
    assert((b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3),
      b.getLong(4)) === ((units.size.toLong, n, t1, t0, sumT)), b.toString)
    assert(b.getLong(5) === alpha, b.toString)
  }

  /** orders.parquet fixture: (orderkey, priority, totalprice dollars). */
  private def ordersDir(rows: Seq[(Long, String, Double)]): String = {
    val dir = Files.createTempDirectory("planted-dq-ord")
    rows.toDF("o_orderkey", "o_orderpriority", "o_totalprice")
      .withColumn("o_orderdate", to_timestamp(lit("1995-06-15 12:00:00")))
      .withColumn("o_custkey", $"o_orderkey")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("orders.parquet").toString)
    dir.toString
  }

  test("q546 reads a zero-conversion design as equivalent and matches the replay") {
    // No conversions anywhere: d = 0, v = 0, zse = 0 -> CI = [0, 0]
    // inside ±2pp, equivalent = 1.
    val none = (1L to 40L).map(u => (0, u, "purchase", 10.0))
    val z = operators.DecisionQueries.q546(spark, eventsDir(none)).head()
    assert((z.getLong(4), z.getLong(6), z.getLong(9)) === ((0L, 0L, 1L)),
      z.toString)
    // q543's fixture: users 1..8 convert. Full replay of the stated
    // micro/pico grids and the one-sqrt tree.
    val rows = (1L to 40L).map(u =>
      (0, u, "purchase", if (u <= 8) 250.0 else 10.0))
    val ctl = (1L to 40L).filter(u => md5Head8(s"$u#exp1") % 2 == 0)
    val nA = ctl.size.toLong; val nB = 40L - nA
    val cA = ctl.count(_ <= 8).toLong; val cB = 8L - cA
    val d = cB * 1000000L / nB - cA * 1000000L / nA
    val v = (BigInt(cA) * (nA - cA) * BigInt(10).pow(12) /
      (BigInt(nA) * nA * nA) +
      BigInt(cB) * (nB - cB) * BigInt(10).pow(12) /
        (BigInt(nB) * nB * nB)).toLong
    val zse = math.floor(1644854 * math.sqrt(v.toDouble) / 1000000 + 0.5).toLong
    val r = operators.DecisionQueries.q546(spark, eventsDir(rows)).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((nA, cA, nB, cB)), r.toString)
    assert((r.getLong(4), r.getLong(5), r.getLong(6)) === ((d, v, zse)),
      r.toString)
    assert((r.getLong(7), r.getLong(8)) === ((d - zse, d + zse)), r.toString)
    assert(r.getLong(9) ===
      (if (20000L - math.abs(d) >= zse) 1L else 0L), r.toString)
  }

  test("q547 splits planted bigram coverage by the closed form with efficiency") {
    // "a b" shared by src0/src1 (k=2), "c d" unique to src2 (k=1):
    // phi = L/2, L/2, L; shares 25/25/50%; efficiency sums to 2L.
    val L = 232792560L
    val docs = Seq((1L, "a b", "en", "src0", 3L),
      (2L, "a b", "en", "src1", 3L), (3L, "c d", "en", "src2", 3L))
    val out = operators.DecisionQueries.q547(spark, documentsDir(docs))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out("src0") === ((1L, 0L, L / 2, 250000L)), out.toString)
    assert(out("src1") === ((1L, 0L, L / 2, 250000L)), out.toString)
    assert(out("src2") === ((1L, 1L, L, 500000L)), out.toString)
    assert(out.values.map(_._3).sum === 2 * L)
  }

  test("q548 matches the fold-replayed Winkler decomposition") {
    // One priority, keys 1..90, cents = 100*key. Replay the md5 folds,
    // the train median rank, the conformal rank, and the exact score.
    val keys = (1L to 90L)
    val rows = keys.map(k => (k, "P", k.toDouble))
    def fold(k: Long): Long = md5Head8(s"$k#conf") % 3
    val cents = keys.map(k => k -> k * 100).toMap
    val train = keys.filter(fold(_) == 0).sortBy(k => (cents(k), k))
    val med = cents(train((math.ceil(train.size * 0.5) - 1).toInt))
    val cal = keys.filter(fold(_) == 1)
      .map(k => (math.abs(cents(k) - med), k)).sorted
    val kk = math.min((9 * (cal.size + 1) + 9) / 10, cal.size)
    val qhat = cal(kk - 1)._1
    val test = keys.filter(fold(_) == 2)
      .map(k => math.abs(cents(k) - med))
    val miss = test.count(_ > qhat).toLong
    val penSum = test.map(e => 20L * math.max(0L, e - qhat)).sum
    val meanPen = BigInt(penSum) * 1000000 / test.size
    val meanScore =
      (BigInt(2L * qhat) * test.size + penSum) * 1000000 / test.size
    val r = operators.DecisionQueries.q548(spark, ordersDir(rows)).head()
    assert(r.getString(0) === "P")
    assert((r.getLong(1), r.getLong(2)) === ((qhat, 2 * qhat)), r.toString)
    assert((r.getLong(3), r.getLong(4)) === ((test.size.toLong, miss)),
      r.toString)
    assert(r.getLong(5) === meanPen.toLong, r.toString)
    assert(r.getLong(6) === meanScore.toLong, r.toString)
  }

  test("q550 sits exactly on the four-fifths boundary and flags below it") {
    // en 5/10 selected (ref, 50%), fr 4/10 (impact exactly 800000 —
    // the boundary PASSES: 5*4*10 < 4*5*10 is false), de 3/10
    // (impact 600000 — fails).
    val hi = ("the and of " * 20).trim // qualityMicro = 1e6
    val lo = "z"                       // 8000
    def grp(lang: String, base: Long, nHi: Int, nLo: Int) =
      (1 to nHi).map(i => (base + i, hi, lang, "s", 219L)) ++
        (1 to nLo).map(i => (base + nHi + i, lo, lang, "s", 1L))
    val docs = grp("en", 0L, 5, 5) ++ grp("fr", 100L, 4, 6) ++
      grp("de", 200L, 3, 7)
    val out = operators.GovernanceQueries.q550(spark, documentsDir(docs))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet === Set("en", "fr", "de"))
    assert(out("en").getString(4) === "en")
    assert((out("en").getLong(5), out("en").getLong(6)) === ((1000000L, 0L)))
    assert((out("fr").getLong(3), out("fr").getLong(5), out("fr").getLong(6))
      === ((400000L, 800000L, 0L)), out("fr").toString)
    assert((out("de").getLong(5), out("de").getLong(6)) === ((600000L, 1L)),
      out("de").toString)
  }

  test("q551 reads the planted token-length ladder exactly at every grid point") {
    // docs of exactly 10 / 40 / 100 tokens: at L=32 lost = 8+68 = 76
    // of 150 (506666 micro), 2/3 docs truncated; at L=64 lost = 36
    // (240000), 1/3 docs; at L=96 lost = 4 (26666); at L=128 zeros.
    def words(n: Int) = Seq.fill(n)("w").mkString(" ")
    val docs = Seq((1L, words(10), "en", "s", 19L),
      (2L, words(40), "en", "s", 79L), (3L, words(100), "en", "s", 199L))
    val out = operators.DecisionQueries.q551(spark, documentsDir(docs))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet === Set(32L, 64L, 96L, 128L))
    def check(l: Long, nt: Long, tl: Long, lm: Long, tm: Long): Unit = {
      val r = out(l)
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)) === ((3L, nt, 150L, tl, lm, tm)),
        r.toString)
    }
    check(32L, 2L, 76L, 506666L, 666666L)
    check(64L, 1L, 36L, 240000L, 333333L)
    check(96L, 1L, 4L, 26666L, 333333L)
    check(128L, 0L, 0L, 0L, 0L)
  }

  test("q545 scores a hand-built confusion matrix exactly") {
    // en: tp=5 fp=3 fn=0; fr: tp=3 fp=0 fn=2; de: tp=0 fp=0 fn=1
    // (one doc predicted unknown); one zh doc predicted en charges fp
    // to en only (open-set penalty); es never appears -> 3 classes.
    val docs =
      (1L to 5L).map(i => (i, "the and of", "en", "s", 10L)) ++
        Seq((6L, "the the the", "fr", "s", 11L),
          (7L, "the the the", "fr", "s", 11L)) ++
        (8L to 10L).map(i => (i, "le les et", "fr", "s", 9L)) ++
        Seq((11L, "xyz", "de", "s", 3L), (12L, "the", "zh", "s", 3L))
    val out = operators.DecisionQueries.q545(spark, documentsDir(docs))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet === Set("en", "fr", "de"))
    val en = out("en")
    assert((en.getLong(1), en.getLong(2), en.getLong(3), en.getLong(4)) ===
      ((5L, 3L, 0L, 5L)), en.toString)
    assert((en.getLong(5), en.getLong(6), en.getLong(7)) ===
      ((625000L, 1000000L, 10000000L / 13L)), en.toString)
    val fr = out("fr")
    assert((fr.getLong(5), fr.getLong(6), fr.getLong(7)) ===
      ((1000000L, 600000L, 750000L)), fr.toString)
    val de = out("de")
    assert(de.isNullAt(5) && de.getLong(6) === 0L && de.getLong(7) === 0L,
      de.toString)
    // macro = (769230 + 750000 + 0) div 3; accuracy = 8e6 div 11
    assert(en.getLong(8) === (769230L + 750000L) / 3L, en.toString)
    assert(en.getLong(9) === 8000000L / 11L, en.toString)
  }
}
