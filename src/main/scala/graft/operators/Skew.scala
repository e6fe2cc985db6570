package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for 100 TB-scale shuffles. AQE's skew-join
  * splitting handles sort-merge cases adaptively; these explicit forms
  * cover aggregation skew and the broadcast-averse cases AQE can't
  * rewrite.
  */
object Skew {

  /** Salted equi-join: the skewed (big) side gets a random-but-
    * deterministic salt in [0, n); the small side is replicated n ways
    * so every salted key finds its match. Result == plain join, but the
    * hot key's rows spread over n tasks. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, n: Int): DataFrame = {
    val salted = big.withColumn("__salt", pmod(hash(col(key), monotonically_increasing_id()), lit(n)))
    val replicated = small.withColumn("__salt", explode(sequence(lit(0), lit(n - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (partial + final) aggregation with salting: phase 1
    * aggregates (key, salt) — spreading a hot key over n partitions —
    * phase 2 merges the partials. `partialAggs` must be algebraic
    * (sum/count/min/max) so merge == re-aggregate. */
  def saltedSum(df: DataFrame, key: String, valueCol: String, n: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(col(key), monotonically_increasing_id()), lit(n)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))

  /** Range-partition a frame by a sortable key before writing — bounds
    * file sizes per partition when key distribution is known-skewed. */
  def writePartitionedByRange(df: DataFrame, key: String, numPartitions: Int): DataFrame =
    df.repartitionByRange(numPartitions, col(key))

  /** Hybrid hot/cold equi-join — the differentiated-join pattern for
    * power-law keys where salting is wasteful: detect the hot keys
    * (frequency above `hotThreshold` on the big side), then
    *
    *  - **hot slice**: big-side hot rows join the small side's hot
    *    rows via BROADCAST — a hot key's rows never shuffle at all,
    *    which beats salting (salting still shuffles every row, just
    *    spread over n salts);
    *  - **cold slice**: everything else takes the normal shuffle path
    *    with near-uniform keys (the skew is gone by construction).
    *
    * Result == plain inner join (spec-pinned), requiring only that
    * the small side's HOT-KEY rows fit in a broadcast — not the whole
    * small side, which is what makes this work when `small` is itself
    * too big to broadcast outright. The hot-key relation (keys above
    * threshold) is tiny by the power-law premise and broadcasts into
    * both semi/anti splits, so the plan adds one aggregation over the
    * big side and zero extra shuffles of row data. */
  def hybridJoin(big: DataFrame, small: DataFrame, key: String,
      hotThreshold: Long): DataFrame = {
    val hotKeys = big.groupBy(col(key))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > hotThreshold)
      .select(col(key))
    val bigHot = big.join(broadcast(hotKeys), Seq(key), "left_semi")
    val bigCold = big.join(broadcast(hotKeys), Seq(key), "left_anti")
    val smallHot = small.join(broadcast(hotKeys), Seq(key), "left_semi")
    val hot = bigHot.join(broadcast(smallHot), Seq(key))
    val cold = bigCold.join(small, Seq(key))
    hot.unionByName(cold)
  }
}
