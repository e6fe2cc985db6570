package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Scale-safe ranking: global sequence ids and within-group ranks
  * WITHOUT `row_number() OVER (...)` windows.
  *
  * A global window serializes the corpus through one task; a window
  * partitioned by a low-cardinality group (5 market segments, 20
  * sources) sends terabytes through a handful of tasks at 100 TB. The
  * two-pass shape here (same idiom as IndexingQueries.q167) instead
  * range-repartitions on the sort key — a total order across the
  * partition INDEX — sorts within partitions, and `zipWithIndex`es:
  * the only driver traffic is one row-count per partition. Ranks are
  * a pure function of the total order, so they are deterministic
  * regardless of where the sampled range boundaries land.
  */
object Ranking {

  /** Append a global 1-based `seq_id` along `order`. `order` MUST be a
    * total order (include a unique tie-break column) — equal sort keys
    * would otherwise take arbitrary ids. */
  def seqIds(df: DataFrame, parts: Int, order: Column*): DataFrame = {
    val sorted = df.repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
    val withId = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    val schema = StructType(sorted.schema.fields :+
      StructField("seq_id", LongType, nullable = false))
    sorted.sparkSession.createDataFrame(withId, schema)
  }

  /** Append a 1-based `rank` within each `groupCols` class along
    * `innerOrder` (which must totally order rows WITHIN a group).
    * Groups are forced contiguous by prefixing them to the global sort
    * key, so `rank = seq_id − min(seq_id of group) + 1`; the per-group
    * minima are a bounded aggregate (one row per group) broadcast back
    * onto the ids. Contract: the group domain is bounded (segments,
    * sources, languages) — it rides a broadcast join. */
  def groupRanks(df: DataFrame, groupCols: Seq[String], parts: Int,
      innerOrder: Column*): DataFrame = {
    val order = groupCols.map(col) ++ innerOrder
    val ids = seqIds(df, parts, order: _*)
    val mins = ids.groupBy(groupCols.map(col): _*)
      .agg(min(col("seq_id")).as("__g0"))
    ids.join(broadcast(mins), groupCols)
      .withColumn("rank", col("seq_id") - col("__g0") + 1L)
      .drop("__g0", "seq_id")
  }
}
