package graft

import graft.operators.{Dedup, EventQueries, GovernanceQueries, LakehouseQueries}
import org.apache.spark.sql.functions._

/** Round-7 batch: lakehouse maintenance (compaction / zone maps),
  * entity resolution (edit-1 blocking), robust change detection
  * (CUSUM), and agreement statistics (kappa) — property tests on the
  * factored operator cores plus invariant checks on the query outputs
  * over the sf0.001 testdata.
  */
class LakehouseErSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // ---- edit-1 deletion-neighborhood blocking ------------------------

  test("edit1Pairs equals brute-force levenshtein<=1 on a trap vocab") {
    // substitution (cat/cot), deletion (cat/at), insertion (cat/cart),
    // distance-2 same-length trap sharing deletions (ab/ba share "a"
    // and "b"), equal-prefix distance-2 (cold/colts), and an isolate.
    val vocab = Seq("cat", "cot", "at", "cart", "ab", "ba",
      "cold", "colts", "zyzzyva").toDF("w")
    val got = Dedup.edit1Pairs(vocab, "w")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val brute = vocab.as("x").crossJoin(vocab.as("y"))
      .filter($"x.w" < $"y.w" && levenshtein($"x.w", $"y.w") <= 1)
      .select($"x.w", $"y.w")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == brute)
    assert(got.contains(("cat", "cot")) && got.contains(("at", "cat")) &&
      got.contains(("cart", "cat")))
    assert(!got.contains(("ab", "ba")) && !got.contains(("cold", "colts")))
  }

  // ---- next-fit compaction bins -------------------------------------

  test("nextFitBins: contiguous bins, bounded overflow, all files kept") {
    val target = 100L
    val files = (1 to 40).map { i =>
      (s"p${i % 3}", i.toLong, (i * 37L) % 90 + 5)
    }.toDF("part", "fid", "bytes")
    val packed = LakehouseQueries
      .nextFitBins(files, "part", "fid", "bytes", target)
    assert(packed.count() == 40) // nothing dropped or duplicated
    val bins = packed.groupBy($"part", $"bin")
      .agg(sum($"bytes").as("bb"), max($"bytes").as("mb"))
      .collect()
    // next-fit guarantee: a bin exceeds the target by less than its
    // own largest member (the straddling file)
    bins.foreach { r =>
      assert(r.getLong(2) < target + r.getLong(3),
        s"bin ${r.get(0)}/${r.get(1)} overfilled: ${r.getLong(2)}")
    }
    // bin ids contiguous from 0 within every partition
    packed.groupBy($"part")
      .agg(min($"bin").as("lo"), max($"bin").as("hi"),
        countDistinct($"bin").as("nb"))
      .collect().foreach { r =>
        assert(r.getLong(1) == 0L && r.getLong(2) == r.getLong(3) - 1)
      }
  }

  // ---- CUSUM change point -------------------------------------------

  test("cusumChangePoint finds a planted level shift") {
    // 20 days at level 10, then 20 days at level 30: the CUSUM of
    // (n - median) walks most-negative exactly at the last low day.
    val daily = ((1 to 20).map(dd => ("a", dd.toLong, 10L)) ++
      (21 to 40).map(dd => ("a", dd.toLong, 30L))).toDF("typ", "day", "n")
    val row = EventQueries.cusumChangePoint(daily).collect()
    assert(row.length == 1)
    val r = row.head
    assert(r.getAs[Long]("change_day") == 20L)
    assert(r.getAs[Long]("cusum") < 0) // downward excursion before rise
    assert(r.getAs[Long]("peak_abs") == math.abs(r.getAs[Long]("cusum")))
    assert(r.getAs[Long]("n_days") == 40L)
  }

  test("cusumChangePoint is flat-zero on a constant series") {
    val daily = (1 to 15).map(dd => ("b", dd.toLong, 7L))
      .toDF("typ", "day", "n")
    val r = EventQueries.cusumChangePoint(daily).collect().head
    assert(r.getAs[Long]("peak_abs") == 0L) // no excursion at all
    assert(r.getAs[Long]("change_day") == 1L) // earliest-day tie rule
  }

  // ---- Cohen's kappa -------------------------------------------------

  test("kappaByGroup: perfect, chance-level, and degenerate cases") {
    val labeled = (
      (1 to 30).map(i => ("perfect", i % 3, i % 3)) ++ // identical raters
        // constant-but-different raters: agree 0, chance 0 -> kappa 0
        (1 to 30).map(_ => ("disjoint", 0, 1)) ++
        // both constant same label: N^2 == chance -> NULL
        (1 to 30).map(_ => ("degenerate", 2, 2))
      ).toDF("g", "la", "lb")
    val out = GovernanceQueries.kappaByGroup(labeled, "g", "la", "lb", 0 to 2)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out("perfect").contains(1.0))
    assert(out("disjoint").contains(0.0))
    assert(out("degenerate").isEmpty)
  }

  // ---- query-output invariants on testdata ---------------------------

  test("q220: clustered layout prunes at least as well as natural") {
    val rows = LakehouseQueries.q220(spark, sf)
      .select($"scheme", $"pred_id", $"skip_pct").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val preds = rows.keys.map(_._2).toSet
    assert(preds.size == 6)
    preds.foreach { p =>
      assert(rows(("clustered", p)) >= rows(("natural", p)),
        s"pred $p: clustered ${rows(("clustered", p))} < " +
          s"natural ${rows(("natural", p))}")
    }
    // the audited windows lie inside the data's date range, so the
    // clustered layout must actually skip something somewhere
    assert(preds.exists(p => rows(("clustered", p)) > 0.5))
  }

  test("q224 scorecard bounds: hit1/nq <= mrr <= hit10/nq") {
    val r = operators.SimilarityQueries.all
      .find(_.name == "q224_retrieval_scorecard").get
      .fn(spark, sf).collect().head
    val nq = r.getAs[Long]("n_q").toDouble
    val mrr = r.getAs[Double]("mrr")
    assert(nq > 0)
    assert(r.getAs[Long]("n_hit1") <= r.getAs[Long]("n_hit5"))
    assert(r.getAs[Long]("n_hit5") <= r.getAs[Long]("n_hit10"))
    assert(mrr >= r.getAs[Long]("n_hit1") / nq - 1e-6)
    assert(mrr <= r.getAs[Long]("n_hit10") / nq + 1e-6)
  }
}
