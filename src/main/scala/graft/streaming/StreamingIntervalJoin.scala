package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Stream-stream interval-OVERLAP join — the streaming twin of
  * `operators.IntervalJoin` (StreamingSpec pins pair-set parity with
  * the batch operator).
  *
  * Spark's state-watermark analyzer accepts inequality terms ONLY over
  * watermarked event-time columns, so the exact overlap predicate
  * `lS <= rE && rS <= lE` (which references the non-watermarked END
  * columns) cannot live in the join condition. The streamable
  * decomposition needs one contract: a BOUNDED interval length. Then
  *
  *   overlap ⇒ |rS − lS| ≤ maxLen,
  *
  * and that coarse bound — watermarked starts only — IS the join
  * condition, giving the state-store eviction Spark needs (per-side
  * state is bounded by the watermark horizon + maxLen). The exact
  * overlap runs as a TYPED residual filter over the coarse matches:
  * opaque to predicate pushdown, so the optimizer cannot fold it back
  * into the join condition and re-break the analyzer.
  *
  * Cost vs batch: candidates are start-proximate pairs instead of
  * cell-cohabitant pairs — coarser by ~maxLen/typicalLen, the price of
  * incremental emission. For batch corpora use `IntervalJoin.overlap`.
  */
object StreamingIntervalJoin {

  /** @param left/right  streaming frames, each already carrying
    *                     `withWatermark` on its START column
    * @param maxLenExpr   SQL interval literal bounding BOTH sides'
    *                     interval lengths, e.g. "interval 30 minutes"
    *                     — violating rows silently miss matches, so
    *                     enforce/clamp upstream
    * @param lS/lE/rS/rE  timestamp column names (starts watermarked) */
  def overlap(left: DataFrame, right: DataFrame,
      lKey: String, rKey: String,
      lS: String, lE: String, rS: String, rE: String,
      maxLenExpr: String): DataFrame = {
    val joined = left.join(right, expr(
      s"$lKey = $rKey AND $rS >= $lS - $maxLenExpr AND $rS <= $lS + $maxLenExpr"))
    // exact overlap as an opaque typed filter (see scaladoc)
    val (liS, liE, riS, riE) =
      (joined.schema.fieldIndex(lS), joined.schema.fieldIndex(lE),
        joined.schema.fieldIndex(rS), joined.schema.fieldIndex(rE))
    joined.filter((r: Row) =>
      !r.isNullAt(liS) && !r.isNullAt(liE) && !r.isNullAt(riS) && !r.isNullAt(riE) &&
        micros(r.getTimestamp(liS)) <= micros(r.getTimestamp(riE)) &&
        micros(r.getTimestamp(riS)) <= micros(r.getTimestamp(liE)))
  }

  /** Full µs-precision instant: `getTime` alone truncates to the
    * millisecond, which would admit pairs whose endpoints share a ms
    * but do NOT overlap at Spark's native µs timestamp precision. */
  private[graft] def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
}
