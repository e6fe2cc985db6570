package graft

import graft.functions.ZOrder

class ZOrderSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  /** Reference Morton code, bit-by-bit. */
  private def refZ(xs: Seq[Long], bits: Int): Long = {
    val n = xs.size
    var z = 0L
    for (b <- 0 until bits; i <- xs.indices)
      z |= ((xs(i) >> b) & 1L) << (b * n + (n - 1 - i))
    z
  }

  test("zValue matches the reference interleave on random pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val data = Seq.fill(500)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = data.toDF("x", "y")
      .select($"x", $"y", ZOrder.zValue(Seq($"x", $"y"), 16).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    data.foreach { case (x, y) =>
      assert(got((x, y)) == refZ(Seq(x, y), 16), s"($x, $y)")
    }
  }

  test("zValue is monotone in each coordinate within a fixed other") {
    // Not globally monotone (that's the point of interleaving), but
    // fixing y, increasing x must increase z — a basic sanity of the
    // bit placement.
    val zs = (0L until 100L).map(x => refZ(Seq(x, 37L), 16))
    assert(zs == zs.sorted && zs.distinct.size == zs.size)
  }

  test("z-ordered files bound BOTH keys; lexicographic sort does not") {
    import spark.implicits._
    val n = 1 << 14
    // keys decorrelated: x is the high bits, y the reversed low bits
    val df = spark.range(n).select(
      ($"id" / 128).cast("long").as("x"),
      pmod($"id" * 37L, lit(128L)).cast("long").as("y"))
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    ZOrder.writeZOrdered(df, s"$dir/z", Seq("x", "y"), bits = 7, numFiles = 8)
    df.repartitionByRange(8, $"x", $"y").sortWithinPartitions("x", "y")
      .write.mode("overwrite").parquet(s"$dir/lex")

    def avgSpan(path: String, c: String): Double = {
      val spans = spark.read.parquet(path)
        .withColumn("f", input_file_name())
        .groupBy($"f").agg((max(col(c)) - min(col(c))).as("span"))
        .collect().map(_.getAs[Long]("span").toDouble)
      spans.sum / spans.length
    }
    // Lexicographic layout: x is tightly bounded per file but y spans
    // its whole domain in every file. Z-order bounds both.
    val zY = avgSpan(s"$dir/z", "y")
    val lexY = avgSpan(s"$dir/lex", "y")
    assert(zY < lexY / 1.5, s"z-order y-span $zY not tighter than lex $lexY")
    val zX = avgSpan(s"$dir/z", "x")
    assert(zX < (n / 128) * 0.8, s"z-order x-span $zX not bounded")
  }
}
