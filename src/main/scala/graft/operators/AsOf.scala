package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the most recent right
  * row with `right.ts <= left.ts` in the same key group.
  *
  * Spark has no native as-of join; the scalable composition (preference
  * (a) from the build contract) is union + running `last(_, ignoreNulls)`
  * window: one shuffle on the key, a single sort per partition, no
  * range-explosion join and no per-key driver loop. Right rows sort
  * before left rows at equal timestamps, giving `<=` semantics.
  */
object AsOf {

  /** @param valueCols right-side columns to carry to the matched left row
    * @return left rows + `asof_<col>` matched values (null if no prior right row) */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      idCol: String, valueCols: Seq[String]): DataFrame = {
    val lTagged = left
      .withColumn("__side", lit(1))
      .withColumn("__oid", col(idCol))
    val rBase = right
      .select((Seq(key, ts, idCol) ++ valueCols).distinct.map(col): _*)
      .withColumn("__side", lit(0))
      .withColumn("__oid", col(idCol))
    val rTagged = valueCols.foldLeft(rBase) { (d, c) =>
      d.withColumn(s"__v_$c", col(c))
    }.drop(valueCols.filterNot(Seq(key, ts, idCol).contains): _*)
    val lAligned = valueCols.foldLeft(lTagged)((d, c) =>
      d.withColumn(s"__v_$c", lit(null).cast(right.schema(c).dataType)))
    val rAligned = left.columns.filterNot(Set(key, ts, idCol)).foldLeft(rTagged)((d, c) =>
      d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val unioned = lAligned.unionByName(rAligned.select(lAligned.columns.toIndexedSeq.map(col): _*))
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"), col("__oid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = valueCols.foldLeft(unioned)((d, c) =>
      d.withColumn(s"asof_$c", last(col(s"__v_$c"), ignoreNulls = true).over(w)))
    matched.filter(col("__side") === 1)
      .drop((Seq("__side", "__oid") ++ valueCols.map(c => s"__v_$c")): _*)
  }

  /** As-of join with a match tolerance (pandas `merge_asof(tolerance=)`
    * semantics): a prior right row older than `tolerance` (same units
    * as the `ts` column) is treated as NO match — its carried values
    * null out and `asof_matched` reports 0. Same single-shuffle
    * union+window plan as [[asofJoin]]; the tolerance test is a pure
    * post-window column mask, so the scale shape is unchanged. */
  def asofJoinTolerance(left: DataFrame, right: DataFrame, key: String,
      ts: String, idCol: String, valueCols: Seq[String],
      tolerance: Column): DataFrame = {
    val r = right.withColumn("__rts", col(ts))
    val joined = asofJoin(left, r, key, ts, idCol, valueCols :+ "__rts")
    val ok = col("asof___rts").isNotNull &&
      col("asof___rts") >= col(ts) - tolerance
    val masked = valueCols.foldLeft(joined)((d, c) =>
      d.withColumn(s"asof_$c", when(ok, col(s"asof_$c"))))
    masked.withColumn("asof_matched", ok.cast("int")).drop("asof___rts")
  }
}
