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
}
