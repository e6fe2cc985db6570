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

  /** Union both sides into one relation: right rows carry `__side = 0`
    * and ALL their value columns in ONE `__vrow` struct (left rows
    * carry a typed null struct). The match is therefore row-ATOMIC by
    * construction: a window picks whole structs, so a null in one
    * value column of the matched row can never splice that column in
    * from a DIFFERENT right row (pandas merge_asof matches rows, not
    * columns — and `last(_, ignoreNulls)` per column would).
    *
    * The single sort (ts, __side, __oid) puts a right row BEFORE a
    * left row at equal timestamps — backward (`<=`) semantics for the
    * preceding frame; the following frame over the same sort is
    * therefore strictly-later (`>`), which is exactly what
    * [[asofJoinNearest]] needs (an equal-ts right row is distance 0
    * through the backward branch). */
  private def unionAligned(left: DataFrame, right: DataFrame, key: String,
      ts: String, idCol: String, valueCols: Seq[String]): DataFrame = {
    val vrowType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType)))
    val lAligned = left
      .withColumn("__side", lit(1))
      .withColumn("__oid", col(idCol))
      .withColumn("__vrow", lit(null).cast(vrowType))
    val rTagged = right
      .select((Seq(key, ts, idCol) ++ valueCols).distinct.map(col): _*)
      .withColumn("__side", lit(0))
      .withColumn("__oid", col(idCol))
      .withColumn("__vrow", struct(valueCols.map(col): _*))
      .drop(valueCols.filterNot(Seq(key, ts, idCol).contains): _*)
    val rAligned = left.columns.filterNot(Set(key, ts, idCol)).foldLeft(rTagged)((d, c) =>
      d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    lAligned.unionByName(rAligned.select(lAligned.columns.toIndexedSeq.map(col): _*))
  }

  /** Expand the matched struct into `asof_<col>` columns + cleanup. */
  private def expand(matched: DataFrame, m: Column,
      valueCols: Seq[String]): DataFrame =
    valueCols.foldLeft(matched)((d, c) => d.withColumn(s"asof_$c", m.getField(c)))
      .filter(col("__side") === 1)
      .drop("__side", "__oid", "__vrow", "__m")

  /** @param valueCols right-side columns to carry to the matched left row
    * @return left rows + `asof_<col>` matched values (null if no prior right row) */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      idCol: String, valueCols: Seq[String]): DataFrame = {
    val unioned = unionAligned(left, right, key, ts, idCol, valueCols)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"), col("__oid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    expand(unioned.withColumn("__m", last(col("__vrow"), ignoreNulls = true).over(w)),
      col("__m"), valueCols)
  }

  /** Forward as-of join (pandas `merge_asof(direction='forward')`):
    * for each left row, the EARLIEST right row with `right.ts >=
    * left.ts` in the same key group. Same single-shuffle union+window
    * plan, mirrored: the sort flips sides at ties (left before right,
    * so an equal-ts right row is inside the following frame — `>=`
    * inclusive) and the frame looks forward with `first`. */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
      ts: String, idCol: String, valueCols: Seq[String]): DataFrame = {
    val unioned = unionAligned(left, right, key, ts, idCol, valueCols)
    val w = Window.partitionBy(col(key))
      // __side: left = 1, right = 0 → (1 - __side) sorts left first
      .orderBy(col(ts), lit(1) - col("__side"), col("__oid"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    expand(unioned.withColumn("__m", first(col("__vrow"), ignoreNulls = true).over(w)),
      col("__m"), valueCols)
  }

  /** Nearest as-of join (pandas `merge_asof(direction='nearest')`):
    * the right row minimizing |right.ts − left.ts|; equidistant →
    * backward wins (pandas tie rule). ONE shuffle and ONE sort: both
    * directions ride the same sorted partition — backward via the
    * preceding frame (equal-ts lands here, distance 0), forward via
    * the following frame (strictly later by construction). Adds
    * `asof_dist` (same units as `ts`; null when the key group has no
    * right row at all). */
  def asofJoinNearest(left: DataFrame, right: DataFrame, key: String,
      ts: String, idCol: String, valueCols: Seq[String]): DataFrame = {
    val r = right.withColumn("__rts", col(ts))
    val vcs = valueCols :+ "__rts"
    val unioned = unionAligned(left, r, key, ts, idCol, vcs)
    val ord = Seq(col(ts), col("__side"), col("__oid"))
    val wb = Window.partitionBy(col(key)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col(key)).orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val withBF = unioned
      .withColumn("__b", last(col("__vrow"), ignoreNulls = true).over(wb))
      .withColumn("__f", first(col("__vrow"), ignoreNulls = true).over(wf))
    val bts = col("__b").getField("__rts")
    val fts = col("__f").getField("__rts")
    val bd = col(ts) - bts
    val fd = fts - col(ts)
    val useB = bts.isNotNull && (fts.isNull || bd <= fd)
    val chosen = withBF.withColumn("__m", when(useB, col("__b")).otherwise(col("__f")))
    expand(chosen, col("__m"), valueCols)
      .withColumn("asof_dist", when(useB, bd).otherwise(when(fts.isNotNull, fd)))
      .drop("__b", "__f")
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
