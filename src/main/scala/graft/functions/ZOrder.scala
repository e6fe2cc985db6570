package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout: interleave the bits of several join/
  * filter keys into one sort key, so range-partitioned + sorted files
  * are simultaneously clustered on EVERY participating column — the
  * lakehouse file-skipping technique (Delta/Iceberg `OPTIMIZE ZORDER`)
  * that makes parquet row-group min/max pruning effective for
  * multi-column predicates at 100 TB (a plain sort clusters only its
  * leading column; predicates on the second column then touch every
  * file).
  *
  * The z-value is pure integer bit arithmetic (shift/and/or), built
  * from codegen'd Spark builtins — identical arithmetic is expressible
  * in DuckDB SQL, so the computation itself is oracle-checkable
  * (q146).
  */
object ZOrder {

  /** Morton code of `cols` (cast to long, low `bits` bits each,
    * column 0 owns the most-significant interleave slot). Total output
    * bits = cols.size * bits, must fit a signed long. Values are
    * masked to `bits`, so callers should pre-scale/clamp negatives. */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty && cols.size * bits <= 63,
      s"z-value needs 1+ columns and <= 63 total bits, got ${cols.size} x $bits")
    val n = cols.size
    val terms = for {
      b <- 0 until bits
      (c, i) <- cols.zipWithIndex
    } yield shiftleft(
      shiftright(c.cast("long"), b).bitwiseAND(lit(1L)),
      b * n + (n - 1 - i))
    terms.reduce(_.bitwiseOR(_))
  }

  /** The same arithmetic as a DuckDB SQL expression (for oracles). */
  def zValueSql(cols: Seq[String], bits: Int): String = {
    val n = cols.size
    val terms = for {
      b <- 0 until bits
      (c, i) <- cols.zipWithIndex
    } yield s"(((CAST($c AS BIGINT) >> $b) & 1) << ${b * n + (n - 1 - i)})"
    terms.mkString("(", " | ", ")")
  }

  /** Write `df` z-ordered on `keyCols`: range-partition by z-value
    * into `numFiles` output tasks, sort within each, write parquet.
    * Each file then covers a compact z-range — a compact hyper-
    * rectangle neighborhood in key space — so min/max stats on ALL
    * key columns are tight and a reader filtering on any of them
    * skips most files. One full shuffle (the range exchange), same
    * cost class as any global sort. */
  def writeZOrdered(df: DataFrame, dir: String, keyCols: Seq[String],
      bits: Int = 16, numFiles: Int = 8): Unit =
    df.withColumn("__z", zValue(keyCols.map(col), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
}
