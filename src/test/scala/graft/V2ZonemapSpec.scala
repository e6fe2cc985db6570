package graft

import graft.sources.v2.DocStoreZonemap
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._

/** File-level zone maps on the docstore V2 connector: stats written at
  * job commit, files skipped at scan planning, always conservatively. */
class V2ZonemapSpec extends SparkSpec {
  import spark.implicits._

  private val fmt = "graft.sources.v2.DocStoreDataSource"

  /** Range-clustered write: 4 tasks, disjoint doc_id ranges per file. */
  private def writeClustered(dir: String): Unit =
    (1L to 400L).map(i => (i, s"doc$i", (i % 97).toDouble / 10.0))
      .toDF("doc_id", "text", "score")
      .repartitionByRange(4, $"doc_id")
      .write.format(fmt).option("path", dir).mode("append").save()

  test("commit writes a zonemap before _SUCCESS; stats round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("zm").toString
    writeClustered(dir)
    val zmFiles = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("_zonemap-"))
    assert(zmFiles.length == 1)
    val zm = DocStoreZonemap.load(dir)
    assert(zm.size == 4)
    // ranges are disjoint and cover 1..400 with correct bounds
    val ranges = zm.values.map(fs => (fs.cols("doc_id").iLo, fs.cols("doc_id").iHi)).toSeq.sorted
    assert(ranges.head._1 == 1L && ranges.last._2 == 400L)
    assert(ranges.sliding(2).forall { case Seq((_, h), (l, _)) => h < l; case _ => true })
    assert(zm.values.forall(_.cols("score").kind == 'f'))
    assert(zm.values.map(_.rows).sum == 400L)
  }

  test("point and range predicates prune to the overlapping files only") {
    val dir = java.nio.file.Files.createTempDirectory("zm").toString
    writeClustered(dir)
    def scan(df: org.apache.spark.sql.DataFrame) =
      (df.rdd.getNumPartitions, df.collect().map(_.getLong(0)).toSet)
    val base = spark.read.format(fmt).option("path", dir).load()
    val (p1, r1) = scan(base.filter($"doc_id" === 42L))
    assert(p1 == 1 && r1 == Set(42L))
    val (p2, r2) = scan(base.filter($"doc_id" > 390L))
    assert(p2 == 1 && r2 == (391L to 400L).toSet)
    val (p3, r3) = scan(base.filter($"doc_id" < 0L))
    assert(p3 == 0 && r3.isEmpty)
    // unprunable predicate (string column): all files scanned, correct rows
    val (p4, r4) = scan(base.filter($"text" === "doc7"))
    assert(p4 == 4 && r4 == Set(7L))
  }

  test("appends from a second job union their zonemaps; legacy files never prune") {
    val dir = java.nio.file.Files.createTempDirectory("zm").toString
    writeClustered(dir)
    (401L to 500L).map(i => (i, s"doc$i", 0.5)).toDF("doc_id", "text", "score")
      .coalesce(1)
      .write.format(fmt).option("path", dir).mode("append").save()
    val base = spark.read.format(fmt).option("path", dir).load()
    val hit = base.filter($"doc_id" === 450L)
    assert(hit.rdd.getNumPartitions == 1)
    assert(hit.collect().map(_.getLong(0)).toSet == Set(450L))
    // strip the zonemaps: scans widen back to every file, results equal
    new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("_zonemap-")).foreach(_.delete())
    val noZm = spark.read.format(fmt).option("path", dir).load()
      .filter($"doc_id" === 450L)
    assert(noZm.rdd.getNumPartitions == 5)
    assert(noZm.collect().map(_.getLong(0)).toSet == Set(450L))
  }

  test("a fully-deleted file is skipped at planning without being read") {
    val dir = java.nio.file.Files.createTempDirectory("zmdv").toString
    writeClustered(dir) // 4 files, disjoint doc_id ranges, exact zonemap rows
    val base = spark.read.format(fmt).option("path", dir).load()
    assert(base.rdd.getNumPartitions == 4)

    // delete every row of the file that holds doc_id 1..100
    val n = graft.sources.v2.DocStoreDeletes.deleteWhere(spark, dir,
      Seq(LessThanOrEqual("doc_id", 100L)))
    assert(n == 100L)

    val after = spark.read.format(fmt).option("path", dir).load()
    // the fully-dead file contributes NO input partition — it is
    // dropped at planning via zonemap-rows == dead-count, never opened
    assert(after.rdd.getNumPartitions == 3,
      "fully-deleted file was not planning-skipped")
    assert(after.count() == 300L)
    assert(after.agg(min($"doc_id")).head.getLong(0) == 101L)

    // zone-map pruning still composes with the DV skip: a predicate
    // into the dead range reads nothing at all
    val none = after.filter($"doc_id" === 50L)
    assert(none.rdd.getNumPartitions == 0 && none.count() == 0L)
  }

  test("provesEmpty is conservative: nulls, NaN, cross-kind, Or/And") {
    import DocStoreZonemap._
    val fs = FileStats(10, Map(
      "a" -> ColStats('i', 5, 9, 0, 0, nulls = 0, nonNulls = 10),
      "n" -> ColStats('i', 0, 0, 0, 0, nulls = 10, nonNulls = 0),
      "x" -> ColStats('f', 0, 0, Double.NegativeInfinity, Double.PositiveInfinity,
        nulls = 0, nonNulls = 10)))
    assert(provesEmpty(fs, EqualTo("a", 4L)))
    assert(!provesEmpty(fs, EqualTo("a", 5L)))
    assert(provesEmpty(fs, GreaterThan("a", 9L)))
    assert(!provesEmpty(fs, GreaterThan("a", 8L)))
    assert(provesEmpty(fs, In("a", Array(1L, 2L))))
    assert(!provesEmpty(fs, In("a", Array(1L, 7L))))
    assert(provesEmpty(fs, IsNotNull("n")))
    assert(provesEmpty(fs, IsNull("a")))
    // NaN-poisoned fractional range never prunes
    assert(!provesEmpty(fs, EqualTo("x", 1e18)))
    // cross-kind (double literal on integral column) never prunes
    assert(!provesEmpty(fs, EqualTo("a", 4.0)))
    // unknown column never prunes
    assert(!provesEmpty(fs, EqualTo("zz", 1L)))
    assert(provesEmpty(fs, Or(EqualTo("a", 1L), EqualTo("a", 2L))))
    assert(!provesEmpty(fs, Or(EqualTo("a", 1L), EqualTo("a", 7L))))
    assert(provesEmpty(fs, And(EqualTo("a", 7L), EqualTo("a", 1L))))
  }
}
