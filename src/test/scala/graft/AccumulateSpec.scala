package graft

import graft.operators.Accumulate
import org.apache.spark.sql.functions._

/** Clamped running balance: the distributed two-phase parallel prefix
  * over the clamp semigroup must equal a sequential fold exactly. */
class AccumulateSpec extends SparkSpec {
  import spark.implicits._

  private def seqFold(deltas: Seq[Long], lo: Option[Long], hi: Option[Long],
      z0: Long): Seq[Long] =
    deltas.scanLeft(z0) { (z, d) =>
      var v = z + d
      lo.foreach(l => if (v < l) v = l)
      hi.foreach(h => if (v > h) v = h)
      v
    }.tail

  private def check(rows: Seq[(String, Long, Long)], lo: Option[Long],
      hi: Option[Long], z0: Long, parts: Int): Unit = {
    val df = rows.toDF("g", "ord", "delta")
    val got = Accumulate.clampedRunningBalance(
        df, Seq("g"), parts, "delta", lo, hi, z0, $"ord")
      .select($"g", $"ord", $"balance")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
      val sortedRs = rs.sortBy(_._2)
      sortedRs.map(_._2).zip(seqFold(sortedRs.map(_._3), lo, hi, z0))
        .map { case (ord, bal) => (g, ord) -> bal }
    }
    assert(got == want)
  }

  test("matches the sequential fold on random multi-group data, multi-partition") {
    val rnd = new scala.util.Random(7)
    val rows = for (g <- Seq("a", "b", "c"); i <- 1 to 200)
      yield (g, i.toLong, rnd.nextInt(21).toLong - 10)
    // parts = 8 forces every group to span several partitions: carry
    // composition across chunks is exercised, not just the local fold
    check(rows, Some(0L), Some(25L), 10L, parts = 8)
  }

  test("pegging: all-positive saturates at hi, all-negative at lo") {
    val up = (1 to 50).map(i => ("u", i.toLong, 5L))
    val down = (1 to 50).map(i => ("d", i.toLong, -5L))
    check(up ++ down, Some(0L), Some(12L), 0L, parts = 4)
  }

  test("one-sided and unbounded clamps") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 150).map(i => ("g", i.toLong, rnd.nextInt(9).toLong - 4))
    check(rows, Some(0L), None, 0L, parts = 5)    // floor only
    check(rows, None, Some(10L), 0L, parts = 5)   // cap only
    check(rows, None, None, 3L, parts = 5)        // plain running sum + z0
  }

  test("clamp semigroup composition is associative and order-preserving") {
    // (f1 then f2) then f3 == f1 then (f2 then f3), applied to many z
    val rnd = new scala.util.Random(3)
    def randTriple() = (rnd.nextInt(11).toLong - 5,
      if (rnd.nextBoolean()) Some(rnd.nextInt(10).toLong - 5) else None,
      if (rnd.nextBoolean()) Some(rnd.nextInt(10).toLong + 2) else None)
    def mk(t: (Long, Option[Long], Option[Long])): graft.plans.ClampBuf = {
      val b = new graft.plans.ClampBuf
      b.composeWith(t._1, t._2.isDefined, t._2.getOrElse(0L),
        t._3.isDefined, t._3.getOrElse(0L))
      b
    }
    def compose(x: graft.plans.ClampBuf, y: graft.plans.ClampBuf) = {
      val b = new graft.plans.ClampBuf
      b.composeWith(x.a, x.hasLo, x.lo, x.hasHi, x.hi)
      b.composeWith(y.a, y.hasLo, y.lo, y.hasHi, y.hi)
      b
    }
    for (_ <- 1 to 200) {
      val Seq(t1, t2, t3) = Seq.fill(3)(randTriple())
        .map(t => t.copy(_3 = t._3.map(h => math.max(h, t._2.getOrElse(h)))))
      val left = compose(compose(mk(t1), mk(t2)), mk(t3))
      val right = compose(mk(t1), compose(mk(t2), mk(t3)))
      for (z <- -20L to 20L) {
        val seq3 = Seq(t1, t2, t3).foldLeft(z) { (acc, t) =>
          var v = acc + t._1
          t._2.foreach(l => if (v < l) v = l)
          t._3.foreach(h => if (v > h) v = h)
          v
        }
        assert(left.apply(z) == seq3, s"left-assoc vs sequential at z=$z")
        assert(right.apply(z) == seq3, s"right-assoc vs sequential at z=$z")
      }
    }
  }

  test("null group rows are preserved as their own class") {
    val df = Seq((Some("a"), 1L, 5L), (None, 1L, 5L), (None, 2L, 5L))
      .toDF("g", "ord", "delta")
    val got = Accumulate.clampedRunningBalance(
        df, Seq("g"), 2, "delta", Some(0L), Some(7L), 0L, $"ord")
      .select($"g", $"ord", $"balance")
      .orderBy($"ord").collect()
    assert(got.length == 3)
    val nulls = got.filter(_.isNullAt(0)).map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(nulls == Map(1L -> 5L, 2L -> 7L))
  }
}
