package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded time-range join: for each left row, all right rows with the
  * same key and `right.ts ∈ [left.ts − window, left.ts]`.
  *
  * A naive inequality join plans as BroadcastNestedLoopJoin — O(|L|·|R|)
  * per key and a broadcast of a whole side. The scalable form
  * bucketizes time by the window size: a qualifying right row is always
  * in the left row's bucket or the one before, so replicating each
  * right row into (bucket, bucket+1) turns the range join into an
  * equi-join on (key, bucket) — hash-partitionable, 2× data expansion,
  * exact after the residual range filter.
  */
object RangeJoin {

  /** @param windowMicros range width in microseconds
    * @param lTs/rTs      µs-epoch long columns */
  def timeRange(left: DataFrame, right: DataFrame, key: String,
      lTs: String, rTs: String, windowMicros: Long): DataFrame = {
    val lb = left.withColumn("__b", floor(col(lTs) / windowMicros))
    val rb = right
      .withColumn("__rb0", floor(col(rTs) / windowMicros))
      .withColumn("__b", explode(array(col("__rb0"), col("__rb0") + 1)))
      .drop("__rb0")
    lb.join(rb.withColumnRenamed(key, "__rkey"),
        col(key) === col("__rkey") && lb("__b") === rb("__b"))
      .filter(col(rTs) >= col(lTs) - windowMicros && col(rTs) <= col(lTs))
      .drop("__b", "__rkey")
  }
}

/** Interval-OVERLAP equi-join: pairs of rows whose closed integer
  * intervals [s, e] intersect (and whose keys match), without a
  * BroadcastNestedLoopJoin and without a post-join dedup shuffle.
  *
  * Grid blocking: each interval replicates into every grain-cell it
  * covers, turning the overlap predicate into an equi-join on
  * (key, cell). Two overlapping intervals share every cell their
  * intersection touches — which would duplicate the pair — so the join
  * keeps a match ONLY in the cell containing `max(lS, rS)` (the first
  * cell of the intersection, which always exists and is unique). The
  * result is exact with no `distinct`.
  *
  * Costs/contract: replication factor is ⌈len/grain⌉ + 1 per row, so
  * pick `grain` ≥ the typical interval length (2× data for the
  * typical case, like [[RangeJoin.timeRange]]). Bounds must be
  * non-negative integers (epoch days/seconds/micros < 2^52 — cell ids
  * come from a double `floor`); left/right must not share column
  * names.
  */
object IntervalJoin {

  /** Replicate each row into the grain-cells its [s, e] covers — the
    * ONE definition of the cell math, shared by both join forms and
    * the overflow monitor. */
  private def withCells(df: DataFrame, s: String, e: String, cell: String,
      grain: Long): DataFrame =
    df.withColumn(cell,
      explode(sequence(floor(col(s) / grain).cast("long"),
        floor(col(e) / grain).cast("long"))))

  /** The equi-join + first-overlap-cell predicate, shared by plain and
    * capped forms so the dedup rule can never drift between them. */
  private def joinCells(lc: DataFrame, rc: DataFrame,
      lKey: String, rKey: String,
      lS: String, lE: String, rS: String, rE: String,
      grain: Long): DataFrame =
    lc.join(rc,
        col(lKey) === col(rKey) && col("__lcell") === col("__rcell") &&
          col(lS) <= col(rE) && col(rS) <= col(lE) &&
          floor(greatest(col(lS), col(rS)) / grain).cast("long") === col("__lcell"))
      .drop("__lcell", "__rcell")

  def overlap(left: DataFrame, right: DataFrame,
      lKey: String, rKey: String,
      lS: String, lE: String, rS: String, rE: String,
      grain: Long): DataFrame = {
    require(grain > 0, s"grain must be positive, got $grain")
    joinCells(withCells(left, lS, lE, "__lcell", grain),
      withCells(right, rS, rE, "__rcell", grain),
      lKey, rKey, lS, lE, rS, rE, grain)
  }

  /** [[overlap]] with a degenerate-cell guard: a (key, cell) whose
    * occupancy exceeds `maxPerCell` on EITHER side is skipped entirely
    * (its pairs are NOT emitted — the first-overlap-cell predicate
    * means a skipped pair has no second chance, exactly the LSH
    * bucket-cap contract of `Dedup.candidatePairs`). Guards the
    * quadratic blow-up of a hot cell — thousands of concurrent
    * intervals on one key — at 100 TB.
    *
    * Cost of the guard: ZERO extra shuffles. The occupancy count is an
    * unordered window over (key, cell) — the exact partitioning the
    * join itself shuffles to — so Catalyst reuses the join's exchange
    * and the guard adds only a per-partition sort. Pair monitoring
    * goes through [[overflowCells]]. */
  /** Self-overlap: all overlapping pairs WITHIN one interval set. The
    * naive route calls [[overlap]] with the same relation twice, which
    * plans two scans and two cell-explodes of the same data; here the
    * cell relation materializes ONCE (eager localCheckpoint) and joins
    * itself with renamed columns — at 100 TB that halves the scan and
    * explode work. Pair order / self-pairs are NOT filtered (the
    * caller applies its own id ordering, like the q197 line-item
    * ordering), so output columns are `<c>_a` / `<c>_b` for every
    * input column. */
  def selfOverlap(df: DataFrame, key: String, s: String, e: String,
      grain: Long): DataFrame = {
    require(grain > 0, s"grain must be positive, got $grain")
    val cells = withCells(df, s, e, "__cell", grain).transform(graft.Fx.materialize)
    def side(sfx: String, cellName: String) =
      cells.select(df.columns.toSeq.map(c => col(c).as(s"$c$sfx")) :+
        col("__cell").as(cellName): _*)
    joinCells(side("_a", "__lcell"), side("_b", "__rcell"),
      s"${key}_a", s"${key}_b",
      s"${s}_a", s"${e}_a", s"${s}_b", s"${e}_b", grain)
  }

  def overlapCapped(left: DataFrame, right: DataFrame,
      lKey: String, rKey: String,
      lS: String, lE: String, rS: String, rE: String,
      grain: Long, maxPerCell: Int): DataFrame = {
    require(grain > 0, s"grain must be positive, got $grain")
    def capped(df: DataFrame, key: String, s: String, e: String, cell: String) =
      withCells(df, s, e, cell, grain)
        .withColumn("__n" + cell,
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col(key), col(cell))))
        .filter(col("__n" + cell) <= maxPerCell)
        .drop("__n" + cell)
    joinCells(capped(left, lKey, lS, lE, "__lcell"),
      capped(right, rKey, rS, rE, "__rcell"),
      lKey, rKey, lS, lE, rS, rE, grain)
  }

  /** Monitoring side-channel for [[overlapCapped]]: the (key, cell)s
    * one side would skip, with their occupancy — log or persist next
    * to the join so capped coverage is visible, never silent. */
  def overflowCells(df: DataFrame, key: String, s: String, e: String,
      grain: Long, maxPerCell: Int): DataFrame =
    withCells(df, s, e, "__cell", grain)
      .groupBy(col(key), col("__cell").as("cell"))
      .agg(count(lit(1)).as("n_intervals"))
      .filter(col("n_intervals") > maxPerCell)
}
