package graft

import graft.operators.{CurationQueries, GovernanceQueries}
import org.apache.spark.sql.functions._

/** Invariant (property-style) checks for the statistical planning
  * primitives, on randomized inputs — the oracles pin cross-engine
  * equality on the testdata; these pin the MATH for arbitrary data. */
class DriftApportionSpec extends SparkSpec {

  private val rnd = new scala.util.Random(7)

  test("apportionment: house size and quota rule hold on random inputs") {
    import spark.implicits._
    for (trial <- 1 to 5) {
      val groups = 2 + rnd.nextInt(12)
      val k = 10L + rnd.nextInt(5000)
      val counts = (1 to groups)
        .map(g => (f"g$g%02d", 1L + rnd.nextInt(100000)))
        .toDF("key", "n")
      val seats = CurationQueries.apportion(counts, k, "key")
        .join(counts, "key")
        .crossJoin(broadcast(counts.agg(sum($"n").as("total"))))
        .collect()
      val houseSize = seats.map(_.getAs[Long]("seats")).sum
      assert(houseSize == k, s"trial $trial: house $houseSize != $k")
      seats.foreach { r =>
        val quota = r.getAs[Long]("n").toDouble * k / r.getAs[Long]("total")
        val s = r.getAs[Long]("seats")
        assert(s >= math.floor(quota).toLong && s <= math.ceil(quota).toLong,
          s"trial $trial: quota rule violated for ${r.getAs[String]("key")}: seats=$s quota=$quota")
      }
    }
  }

  test("KS drift: statistic in [0,1]; a uniquely-valued source vs different rest is 1") {
    import spark.implicits._
    // two sources with DISJOINT value ranges: each sees the other as
    // 'rest', so max CDF gap = 1 for both
    val docs = ((1 to 50).map(i => ("a", i.toLong)) ++
      (1 to 50).map(i => ("b", 1000L + i))).toDF("source", "n_chars")
    val ks = GovernanceQueries.ksDrift(docs).collect()
    ks.foreach { r =>
      val v = r.getAs[Double]("ks")
      assert(v >= 0.0 && v <= 1.0)
      assert(v == 1.0, s"disjoint supports must give ks=1, got $v for ${r.get(0)}")
    }
  }

  test("KS drift: source drawn identically to the rest scores near 0, far below a shifted source") {
    import spark.implicits._
    // same discrete distribution for 'same' and the background; a
    // shifted distribution for 'drift'
    val bg = (1 to 300).map(i => ("bg" + i % 3, (i % 20).toLong))
    val same = (1 to 100).map(i => ("same", (i % 20).toLong))
    val drift = (1 to 100).map(i => ("drift", (i % 20 + 10).toLong))
    val docs = (bg ++ same ++ drift).toDF("source", "n_chars")
    val ks = GovernanceQueries.ksDrift(docs).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("ks")).toMap
    assert(ks("drift") > ks("same") + 0.2,
      s"shifted source must dominate: $ks")
  }
}
