package graft

import scala.jdk.CollectionConverters._
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

/** Open-format file skipping (the r12 verdict's directive #7): plain
  * parquet written through `Sinks.analyticsParquet` must carry the
  * three skip structures — row-group min/max stats made selective by
  * sorting, page column indexes, and split bloom filters — and the
  * spec MEASURES the row-group skip ratio footer-by-footer instead of
  * trusting the writer options. This is the open-format twin of
  * V2ZonemapSpec: the docstore connector proves zone-map pruning on
  * the bespoke format, this proves it on the format every engine
  * reads.
  */
class ParquetSkippingSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private lazy val dir: String = {
    val d = java.nio.file.Files
      .createTempDirectory("graft-skip-").toFile.getAbsolutePath
    // one file, many small row groups: sorted by ship date (range
    // probes), bloom on the NON-sorted order key (point probes that
    // min/max can't discriminate — every group spans most of the key
    // range once the file is date-ordered)
    graft.sources.Sinks.analyticsParquet(
      Tables.lineitem(spark, sf)
        .select("l_orderkey", "l_shipdate", "l_extendedprice")
        .coalesce(1),
      d, sortCols = Seq("l_shipdate"), bloomCols = Seq("l_orderkey"),
      rowGroupBytes = 16 * 1024)
    d
  }

  private def openReader(): (ParquetFileReader, Seq[org.apache.parquet.hadoop.metadata.BlockMetaData]) = {
    val file = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(
      new Path(file.getAbsolutePath), spark.sessionState.newHadoopConf()))
    (r, r.getFooter.getBlocks.asScala.toSeq)
  }

  test("sorted column: row-group min/max stats are selective and column indexes exist") {
    val (r, blocks) = openReader()
    try {
      assert(blocks.size >= 6,
        s"need multiple row groups to measure skipping, got ${blocks.size}")
      def shipChunk(b: org.apache.parquet.hadoop.metadata.BlockMetaData) =
        b.getColumns.asScala.find(_.getPath.toDotString == "l_shipdate").get
      // column index present (page-level zone maps)
      assert(r.readColumnIndex(shipChunk(blocks.head)) != null,
        "no column index written for the sorted column")
      // row-group [min,max] of the sort column: probe ONE mid-file
      // day-range — only the group(s) actually holding it may overlap
      val ranges = blocks.map { b =>
        val st = shipChunk(b).getStatistics
        (st.genericGetMin.asInstanceOf[Number].longValue,
          st.genericGetMax.asInstanceOf[Number].longValue)
      }
      val probe = ranges(ranges.size / 2)._1 // a value inside one group
      val overlapping = ranges.count { case (lo, hi) => lo <= probe && probe <= hi }
      assert(overlapping * 3 <= blocks.size,
        s"min/max skipping too weak: $overlapping of ${blocks.size} groups " +
          s"overlap a point probe on the SORT column (file not sorted?)")
    } finally r.close()
  }

  test("bloom filter on the non-sorted key prunes row groups a point lookup would read") {
    val (r, blocks) = openReader()
    try {
      def keyChunk(b: org.apache.parquet.hadoop.metadata.BlockMetaData) =
        b.getColumns.asScala.find(_.getPath.toDotString == "l_orderkey").get
      // a MID-RANGE key: its ~4 line rows scatter across the
      // date-sorted file and its value sits inside nearly every
      // group's [min,max] span, so min/max CANNOT skip — only the
      // bloom can (an extreme key would let min/max win vacuously)
      val probeKey = Tables.lineitem(spark, sf)
        .selectExpr("percentile_approx(l_orderkey, 0.5) AS k")
        .collect().head.getLong(0)
      var present = 0; var pruned = 0; var minMaxPruned = 0
      blocks.foreach { b =>
        val chunk = keyChunk(b)
        val bf = r.getBloomFilterDataReader(b).readBloomFilter(chunk)
        assert(bf != null, "no bloom filter written for l_orderkey")
        if (bf.findHash(bf.hash(probeKey))) present += 1 else pruned += 1
        val st = chunk.getStatistics
        val lo = st.genericGetMin.asInstanceOf[Number].longValue
        val hi = st.genericGetMax.asInstanceOf[Number].longValue
        if (probeKey < lo || probeKey > hi) minMaxPruned += 1
      }
      // the bloom must beat min/max on this layout, and prune most
      // groups outright (≥ 2/3 — FP rate default ~1%)
      assert(pruned * 3 >= blocks.size * 2,
        s"bloom pruned only $pruned of ${blocks.size} row groups")
      assert(pruned > minMaxPruned,
        s"bloom ($pruned) should prune more groups than min/max " +
          s"($minMaxPruned) for a point key on a non-sorted column")
      assert(present >= 1, "bloom lost the groups that DO hold the key")
    } finally r.close()
  }

  test("Spark reads the layout with filters pushed and returns exact rows") {
    import spark.implicits._
    val probeKey = Tables.lineitem(spark, sf)
      .select("l_orderkey").orderBy("l_orderkey").limit(1)
      .collect().head.getLong(0)
    val read = spark.read.parquet(dir).filter($"l_orderkey" === probeKey)
    val explained = read.queryExecution.executedPlan.toString
    assert(explained.contains("PushedFilters") &&
      explained.contains("l_orderkey"),
      "equality filter not pushed to the parquet scan")
    val got = read.select($"l_extendedprice").as[Double].collect().sorted
    val want = Tables.lineitem(spark, sf)
      .filter($"l_orderkey" === probeKey)
      .select($"l_extendedprice").as[Double].collect().sorted
    assert(got.sameElements(want), "skip-layout read returned different rows")
  }
}
