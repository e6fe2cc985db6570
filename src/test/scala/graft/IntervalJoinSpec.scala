package graft

import graft.operators.IntervalJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.util.Random

class IntervalJoinSpec extends SparkSpec {

  /** Random keyed intervals; the naive O(n²) overlap join is the
    * ground truth the grid-blocked join must reproduce EXACTLY —
    * including pairs far longer than the grain (multi-cell
    * intersections must still match once, via the first-overlap-cell
    * predicate, not once per shared cell). */
  private def corpus(seed: Int, n: Int, maxLen: Int): Seq[(Long, Long, Long, Long)] = {
    val rnd = new Random(seed)
    (1L to n).map { id =>
      val k = rnd.nextInt(3).toLong
      val s = rnd.nextInt(1000).toLong
      (id, k, s, s + rnd.nextInt(maxLen).toLong)
    }
  }

  private def naive(l: DataFrame, r: DataFrame): Set[(Long, Long)] =
    l.join(r, col("ka") === col("kb") &&
        col("sa") <= col("eb") && col("sb") <= col("ea"))
      .select(col("ida"), col("idb"))
      .collect().map(row => (row.getLong(0), row.getLong(1))).toSet

  private def blocked(l: DataFrame, r: DataFrame, grain: Long): Seq[(Long, Long)] =
    IntervalJoin.overlap(l, r, "ka", "kb", "sa", "ea", "sb", "eb", grain)
      .select(col("ida"), col("idb"))
      .collect().map(row => (row.getLong(0), row.getLong(1))).toSeq

  test("grid-blocked overlap join == naive join, with zero duplicate pairs") {
    import spark.implicits._
    val left = corpus(1, 120, 40).toDF("ida", "ka", "sa", "ea")
    val right = corpus(2, 120, 40).toDF("idb", "kb", "sb", "eb")
    for (grain <- Seq(7L, 32L, 1000L)) {
      val got = blocked(left, right, grain)
      assert(got.size == got.toSet.size,
        s"grain=$grain emitted duplicate pairs — first-overlap-cell dedup broken")
      assert(got.toSet == naive(left, right), s"grain=$grain pair set mismatch")
    }
  }

  test("intervals spanning many cells (len >> grain) still match exactly once") {
    import spark.implicits._
    // long intervals: every pair shares MANY cells; grain much smaller
    // than typical length is the stress case for the dedup predicate
    val left = corpus(3, 60, 400).toDF("ida", "ka", "sa", "ea")
    val right = corpus(4, 60, 400).toDF("idb", "kb", "sb", "eb")
    val got = blocked(left, right, 16L)
    assert(got.size == got.toSet.size, "duplicate pairs under heavy cell sharing")
    assert(got.toSet == naive(left, right))
  }

  test("overlapCapped == overlap when no cell exceeds the cap, and skips only hot cells") {
    import spark.implicits._
    val left = corpus(5, 120, 40).toDF("ida", "ka", "sa", "ea")
    val right = corpus(6, 120, 40).toDF("idb", "kb", "sb", "eb")
    // cap far above occupancy → identical to the uncapped join
    val loose = IntervalJoin.overlapCapped(left, right,
        "ka", "kb", "sa", "ea", "sb", "eb", 32L, maxPerCell = 10000)
      .select(col("ida"), col("idb"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose == naive(left, right), "high cap must not change results")
  }

  test("degenerate hot cell: capped join completes and the overflow side-channel reports it") {
    import spark.implicits._
    // 500 identical intervals on one key — the quadratic worst case
    // (125k pairs uncapped); a second, cold key must survive the cap
    val hot = (1L to 500L).map(i => (i, 7L, 100L, 110L))
    val cold = Seq((900L, 8L, 100L, 110L), (901L, 8L, 105L, 120L))
    val l = (hot ++ cold).toDF("ida", "ka", "sa", "ea")
    val r = (hot.map { case (i, k, s, e) => (i + 10000, k, s, e) } ++
      cold.map { case (i, k, s, e) => (i + 10000, k, s, e) })
      .toDF("idb", "kb", "sb", "eb")
    val got = IntervalJoin.overlapCapped(l, r,
        "ka", "kb", "sa", "ea", "sb", "eb", 32L, maxPerCell = 50)
      .select(col("ida"), col("idb"))
      .collect().map(row => (row.getLong(0), row.getLong(1))).toSet
    // hot key fully skipped, cold key's pairs all present
    assert(got == Set((900L, 10900L), (900L, 10901L), (901L, 10900L), (901L, 10901L)),
      s"expected only cold-key pairs, got ${got.size} pairs")
    val overflow = IntervalJoin.overflowCells(l, "ka", "sa", "ea", 32L, 50)
      .collect().map(row => (row.getLong(0), row.getLong(2)))
    assert(overflow.toSeq == Seq((7L, 500L)), "hot cell must surface in the side-channel")
  }

  test("selfOverlap == two-sided overlap on the same set (one materialized explode)") {
    import spark.implicits._
    val ivs = corpus(7, 150, 40)
    val twoSided = blocked(
        ivs.toDF("ida", "ka", "sa", "ea"), ivs.toDF("idb", "kb", "sb", "eb"), 16L)
      .toSet
    val self = IntervalJoin.selfOverlap(ivs.toDF("id", "k", "s", "e"), "k", "s", "e", 16L)
      .select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(self.size == self.toSet.size, "duplicate pairs from the self join")
    assert(self.toSet == twoSided)
  }

  test("touching endpoints match (closed intervals) and disjoint keys never join") {
    import spark.implicits._
    val l = Seq((1L, 0L, 10L, 20L), (2L, 1L, 10L, 20L)).toDF("ida", "ka", "sa", "ea")
    val r = Seq((9L, 0L, 20L, 30L), (8L, 0L, 21L, 30L)).toDF("idb", "kb", "sb", "eb")
    val got = blocked(l, r, 8L).toSet
    // [10,20] ∩ [20,30] = {20} → match; [10,20] ∩ [21,30] = ∅; key 1 has no partner
    assert(got == Set((1L, 9L)))
  }
}
