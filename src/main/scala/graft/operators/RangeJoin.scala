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
